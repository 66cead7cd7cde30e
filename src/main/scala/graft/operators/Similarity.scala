package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Murmur3

/**
 * Similarity search over an embedding column (`ARRAY<FLOAT>`).
 *
 * Two paths, per the build brief:
 *  - brute-force cosine top-k — the exactness baseline (quadratic; fine at
 *    validation scale, and the correct confirm kernel at any scale);
 *  - random-hyperplane LSH (sign-bit SimHash over fixed pseudo-random
 *    hyperplanes) — the scale path: bucket equi-grouping replaces the
 *    crossJoin, exactly as MinHash banding replaces the reference's
 *    linear scan (`/root/reference/src/index/linear.rs:25-45`).
 *
 * All cosine math is done in double after an explicit element cast, and
 * scores are rounded to 6 digits so results are stable across engines and
 * summation orders.
 */
object Similarity {

  import org.apache.spark.sql.graft.Bridge
  import graft.functions.expressions.DotProduct

  /** Native codegen'd dot product (no per-row intermediate arrays). */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Cosine similarity column between two ARRAY<DOUBLE> columns. */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / sqrt(dot(a, a) * dot(b, b)), 6)

  /** Cosine from a precomputed dot and per-side squared norms — hoists the
    * norm computation out of the pair loop (it is per-vector, not
    * per-pair; identical value and therefore identical rounding). */
  private def cosineWithNorms(dotCol: Column, na: Column, nb: Column): Column =
    round(dotCol / sqrt(na * nb), 6)

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** All pairs (id < id) with cosine ≥ minCos — brute force. */
  def bruteForcePairs(df: DataFrame, idCol: String, vecCol: String, minCos: Double): DataFrame = {
    val withNorm = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", dot(col("v"), col("v")))
    val a = withNorm.select(col("id").as("a"), col("v").as("va"), col("nrm").as("na"))
    val b = withNorm.select(col("id").as("b"), col("v").as("vb"), col("nrm").as("nb"))
    a.crossJoin(b).where(col("a") < col("b"))
      .withColumn("cos", cosineWithNorms(dot(col("va"), col("vb")), col("na"), col("nb")))
      .where(col("cos") >= minCos)
      .select(col("a"), col("b"), col("cos"))
  }

  /** Top-k neighbors per id — brute force baseline. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val withNorm = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", dot(col("v"), col("v")))
    val a = withNorm.select(col("id").as("vec_id"), col("v").as("va"), col("nrm").as("na"))
    val b = withNorm.select(col("id").as("neighbor"), col("v").as("vb"), col("nrm").as("nb"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("neighbor"))
    a.crossJoin(b).where(col("vec_id") =!= col("neighbor"))
      .withColumn("cos", cosineWithNorms(dot(col("va"), col("vb")), col("na"), col("nb")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("vec_id"), col("neighbor"), col("cos"), col("rk"))
  }

  /**
   * Sign-bit bucket keys from `nPlanes` fixed pseudo-random hyperplanes
   * (components derived from murmur3(plane, dim) — deterministic, no
   * broadcast needed). Emits `nTables` independent keys (rotated plane
   * sets) to trade buckets for recall. With `probe = true` each table
   * additionally emits the `nPlanes` keys at Hamming distance 1 from the
   * row's own key (symmetric multi-probe): two rows then collide in a
   * table whenever their sign patterns differ in ≤ 2 planes — the recall
   * booster that makes near-threshold pairs (where each plane agrees with
   * only moderate probability) reachable without exploding the table
   * count. Keys per row = nTables × (1 + nPlanes·probe).
   */
  def hyperplaneKeys(vec: Column, dim: Int, nPlanes: Int, nTables: Int,
      seed: Long = 42L, probe: Boolean = false): Column = {
    // plane components precomputed once (driver) and closed over — a tiny
    // deterministic broadcast; ±1 components from murmur low bits
    val planes: Array[Array[Array[Double]]] =
      Array.tabulate(nTables, nPlanes, dim) { (t, p, i) =>
        if ((Murmur3.hash64(s"$t:$p:$i", seed) & 1L) == 0L) 1.0 else -1.0
      }
    val perTable = if (probe) nPlanes + 1 else 1
    val f = udf((v: Seq[Float]) => {
      if (v == null) Array.emptyLongArray
      else {
        val out = new Array[Long](nTables * perTable)
        var t = 0
        while (t < nTables) {
          var key = 0L
          var p = 0
          while (p < nPlanes) {
            val comp = planes(t)(p)
            var dot = 0.0
            var i = 0
            val n = math.min(v.length, comp.length)
            while (i < n) { dot += comp(i) * v(i); i += 1 }
            if (dot > 0) key |= (1L << p)
            p += 1
          }
          out(t * perTable) = key * nTables + t // tag table index into the key
          var q = 1
          while (q < perTable) { // 1-bit probe keys
            out(t * perTable + q) = (key ^ (1L << (q - 1))) * nTables + t
            q += 1
          }
          t += 1
        }
        out
      }
    })
    f(vec)
  }

  /**
   * LSH-bucketed near-dup pairs: bucket equi-grouping + exact cosine
   * confirm (the 100-TB path; crossJoin never happens).
   *
   * `nPlanes = 0` (default) sizes the key width from the table:
   * k = max(4, ⌈log₂(n/16)⌉), keeping expected bucket occupancy bounded
   * (~16·(k+1) with probing) as n grows — at 10⁹ rows this yields k ≈ 26,
   * i.e. buckets stay small and candidate volume stays near-linear, while
   * multi-probe + 12 tables holds recall ≥ ~0.95 at cos 0.45 (measured
   * 1.0 at validation scale, asserted in QueriesSpec).
   */
  def lshPairs(df: DataFrame, idCol: String, vecCol: String, minCos: Double,
      dim: Int, nPlanes: Int = 0, nTables: Int = 12, maxBucket: Int = 512): DataFrame = {
    val k = if (nPlanes > 0) nPlanes
      else math.max(4, math.ceil(math.log(math.max(df.count(), 2L) / 16.0) / math.log(2)).toInt)
    val keyed = df.select(col(idCol).cast("long").as("id"),
      explode(hyperplaneKeys(col(vecCol), dim, k, nTables, probe = true)).as("bandKey"))
    val cands = Lsh.candidatePairs(keyed, maxBucket)
    val va = df.select(col(idCol).cast("long").as("a"), asDouble(col(vecCol)).as("va"))
      .withColumn("na", dot(col("va"), col("va")))
    val vb = df.select(col(idCol).cast("long").as("b"), asDouble(col(vecCol)).as("vb"))
      .withColumn("nb", dot(col("vb"), col("vb")))
    cands.join(va, "a").join(vb, "b")
      .withColumn("cos", cosineWithNorms(dot(col("va"), col("vb")), col("na"), col("nb")))
      .where(col("cos") >= minCos)
      .select(col("a"), col("b"), col("cos"))
  }
}
