package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Connected components over an edge DataFrame via alternating
 * large-star / small-star (Kiveris et al., "Connected Components in
 * MapReduce and Beyond") — the Spark-native replacement for the
 * reference's O(N²)-greedy `scaffold` clustering
 * (`/root/reference/src/index/sbt.rs:344-455`). We match cluster
 * assignments, not tree shape (SURVEY.md §2.4 Q7).
 *
 * Scale design:
 *  - provably convergent in O(log n) rounds on any graph (vs min-label
 *    propagation's O(diameter) — adversarial dup chains are real at web
 *    scale);
 *  - every round is two shuffles (groupBy min + join), partitioned by
 *    node id; AQE coalesces as components collapse;
 *  - `localCheckpoint` per round cuts the lineage chain (on a cluster this
 *    becomes a checkpoint-table write, giving partition-exact resume).
 */
object ConnectedComponents extends org.apache.spark.internal.Logging {

  /**
   * @param edges two Long columns `src`, `dst` (undirected, dups ok).
   * @return DataFrame (id: Long, component: Long) — component = min node
   *         id reachable; covers only nodes appearing in `edges`.
   */
  def run(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // The initial checkpoint drags the caller's WHOLE upstream plan with
    // it (sketching, banding, confirm at corpus scale) — it must run
    // under the session's own parallelism and AQE settings.
    var e = edges.select($"src", $"dst").where($"src" =!= $"dst")
      .select(least($"src", $"dst").as("src"), greatest($"src", $"dst").as("dst"))
      .distinct()
      .localCheckpoint(true)

    // From here on, per-round data (the edge set) is orders of magnitude
    // smaller than the corpus, but each round is a chain of tiny shuffles:
    // under AQE every query stage materializes as its own job, so a round
    // costs 4-6 driver scheduling barriers — a pure serial term that
    // dominates the pipeline's scaling efficiency. Run the loop with AQE
    // off and a small fixed shuffle width (one pipelined job per round);
    // restore the session confs after. On a real cluster with huge edge
    // sets, callers raise spark.sql.shuffle.partitions before the loop.
    val conf = spark.conf
    val aqeBefore = conf.get("spark.sql.adaptive.enabled", "true")
    val partsBefore = conf.get("spark.sql.shuffle.partitions", "200")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.shuffle.partitions",
      math.min(8, partsBefore.toInt).max(1).toString)
    try {

    var iter = 0
    var converged = false
    var lastSig: (Long, Long) = (-1L, -1L)
    val wSrc = org.apache.spark.sql.expressions.Window.partitionBy($"src")
    while (!converged && iter < maxIter) {
      // ---- large-star: for every node u, connect its larger neighbors to
      //      m = min(Γ(u) ∪ {u}). The per-neighborhood minimum is a WINDOW
      //      over the same src-partitioning the rows need anyway — one
      //      shuffle instead of the groupBy+join-back formulation's two.
      val bidir = e.union(e.select($"dst".as("src"), $"src".as("dst")))
      val ls = bidir
        .withColumn("m", least($"src", min($"dst").over(wSrc)))
        .where($"dst" > $"src")
        .select($"dst".as("src"), $"m".as("dst"))
        .where($"src" =!= $"dst")

      // ---- small-star: orient u > v; connect all smaller neighbors and u
      //      to m = min neighbor (same window trick; the (src, m) rows are
      //      emitted per-row with duplicates — the terminal distinct dedups)
      val dir = ls.select(greatest($"src", $"dst").as("src"), least($"src", $"dst").as("dst"))
        .withColumn("m", min($"dst").over(wSrc))
      val ss = dir.select($"dst".as("src"), $"m".as("dst"))
        .union(dir.select($"src", $"m".as("dst")))
        .where($"src" =!= $"dst")
        .select(least($"src", $"dst").as("src"), greatest($"src", $"dst").as("dst"))
        .distinct()
        .localCheckpoint(true)

      // order-independent edge-set signature (bit_xor avoids ANSI overflow)
      val sig = ss.agg(count(lit(1)), coalesce(bit_xor(xxhash64($"src", $"dst")), lit(0L)))
        .as[(Long, Long)].first()
      converged = sig == lastSig
      lastSig = sig
      e = ss
      iter += 1
      logWarning(s"[cc] round $iter edges=${sig._1} sig=${sig._2} converged=$converged")
    }
    require(converged || maxIter == 0, s"connected components did not converge in $maxIter rounds")

    // After convergence the edge set is a star stored canonically as
    // (src = component min, dst = member).
    val labels = e.select($"dst".as("id"), $"src".as("component"))
      .union(e.select($"src".as("id"), $"src".as("component")))
      .groupBy($"id").agg(min($"component").as("component"))
    labels.localCheckpoint(true)

    } finally {
      conf.set("spark.sql.adaptive.enabled", aqeBefore)
      conf.set("spark.sql.shuffle.partitions", partsBefore)
    }
  }

  /**
   * Label every node in `nodes` (single Long column `id`, caller
   * guarantees distinct): nodes absent from any edge become singleton
   * components (component = own id). The label side is a materialized
   * edge-endpoint set — much smaller than `nodes` — so the join is left
   * to AQE, which broadcasts it from runtime statistics (static
   * auto-broadcast stays off: sizes derived from UDF plans are garbage).
   */
  def labelAll(nodes: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val lbl = run(edges, maxIter)
    nodes.select($"id")
      .join(lbl, Seq("id"), "left")
      .select($"id", coalesce($"component", $"id").as("component"))
  }
}
