package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * The registered operator surface: every entry is one operator family from
 * SURVEY.md §2 (or a training-data-pipeline extension, per the build
 * brief), exercised as a query over the driver's parquet tables at
 * `sfDir`, with a DuckDB oracle where the semantics are SQL-expressible.
 *
 * Naming: `qNN` relational core (Catalyst built-ins: scan/filter/agg/join/
 * window/top-k/set ops), `dNN` deduplication family, `tNN` text analysis,
 * `eNN` embedding similarity, `mNN` multimodal corpus, `stNN` streaming,
 * `smNN` sourmash signature compatibility.
 *
 * Column names are aliased identically in the Spark plan and the oracle
 * SQL (the driver's compare sorts columns by name before hashing values).
 * Aggregates of doubles whose value depends on summation order are
 * avoided in oracle'd queries (counts, min/max, and sums of integral
 * doubles only) — fp-order-sensitive scores are `round`ed to 6 digits.
 */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Widen a small scan to the session's parallelism before heavy per-row
    * derivation (gram explode + hash, sketching, pairwise kernels). The
    * driver's tables are single one-row-group parquet files, so every scan
    * arrives as ONE task no matter the split conf (guide §2.5:
    * unsplittable input → repartition right after the read) and the
    * expensive kernel downstream runs near-serial on a 32-core session.
    * Rebalancing costs one exchange of the raw rows — a few hundred KB,
    * orders of magnitude below the kernel work it parallelizes.
    * Scale-adaptive: sized off the optimizer's size estimate — above
    * ~8 MB/core the scan splits naturally into ≥ cores tasks and the
    * input is returned unchanged, so no extra exchange appears at
    * production scale. Value-neutral: every consumer is an aggregation /
    * join / keyed window, none order- or partition-sensitive. */
  private def spread(s: SparkSession, df: DataFrame): DataFrame = {
    val par = s.sparkContext.defaultParallelism
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est < BigInt(par.toLong * (8L << 20))) df.repartition(par) else df
  }

  /** Cached table row count — the sandbox stand-in for catalog statistics.
    * ANN queries size key widths / cell counts from the row count; a
    * count-per-invocation is an extra job each call (round-3 VERDICT
    * nit), so the first count per (dir, table) is memoized for the JVM's
    * lifetime. Sound here because the driver's tables are immutable
    * inputs; a catalog-backed deployment reads the same number from table
    * statistics (ANALYZE/auto-stats) instead. */
  private val rowCountCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def tableRows(s: SparkSession, dir: String, name: String): Long =
    rowCountCache.computeIfAbsent(s"$dir/$name", _ => t(s, dir, name).count())

  // ---------------------------------------------------------------- derived tables
  //
  // Sketch-family queries are not directly SQL-expressible (murmur3-based
  // kernels), but their CONFIRM/GROUP/CLUSTER logic is. Each query dumps
  // its kernel-derived intermediate (sketches, band keys, edges) to a
  // fixed parquet path; the query reads the dump back (a persisted
  // intermediate — the sketch UDF runs once, not once per consumer) and
  // the DuckDB oracle replicates everything downstream of the kernel from
  // the same file via read_parquet. Oracle SQL hardcodes the sf0.01 path —
  // the scale the driver's correctness gate runs at.

  private val derivedRoot = "/tmp/graft_derived"
  private def derivedDir(d: String): String =
    s"$derivedRoot/${new java.io.File(d).getName}"

  private val dumpedPaths = scala.collection.concurrent.TrieMap.empty[String, Unit]

  /** Write `df` once per (sfDir, name) per JVM; read the parquet back.
    * `files > 0` bounds the dump's part-file count via a write-side
    * repartition AFTER the (possibly spread-widened) kernel computes:
    * a small dump with many re-reading consumers (the sketch/band index
    * tables — d12 alone scans them five times) otherwise pays per-file
    * open + task-scheduling overhead on every probe once the kernel
    * write goes 32-wide (guide §6: small files hurt twice). The
    * bounding exchange moves only the dump's own bytes (≤ ~1 MB for the
    * index tables here); a production deployment sizes dump files to
    * 128 MB-1 GB with the same knob. */
  private def dumpDerived(s: SparkSession, d: String, name: String,
      files: Int = 0)(df: => DataFrame): DataFrame = {
    val path = s"${derivedDir(d)}/$name.parquet"
    dumpedPaths.getOrElseUpdate(path, {
      val out = df
      (if (files > 0) out.repartition(files) else out)
        .write.mode("overwrite").parquet(path)
    })
    s.read.parquet(path)
  }

  /** The events table re-laid-out partitioned by event date (written once
    * per (sfDir, JVM), the dumpDerived discipline): q12's pruned-scan
    * input. Read back, `event_date` is a partition DIRECTORY column —
    * it never occupies file bytes and a literal filter on it prunes at
    * planning time. */
  private[graft] def partitionedEvents(s: SparkSession, d: String): DataFrame = {
    val path = s"${derivedDir(d)}/events_by_date.parquet"
    dumpedPaths.getOrElseUpdate(path,
      t(s, d, "events")
        .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
        // cluster by the partition column before the partitioned write:
        // the single-file scan otherwise makes ONE task write all ~30
        // date directories serially (guide §6: distribution-mode=hash —
        // same rows, same one-file-per-dir layout, ~30-way parallel)
        .repartition(col("event_date"))
        .write.mode("overwrite").partitionBy("event_date").parquet(path))
    s.read.parquet(path)
  }

  /** A one-row-per-date dimension (the star-schema date_dim), derived
    * deterministically from events and dumped once per (sfDir, JVM):
    * q13's broadcast side. `date_key` is DATE — the partitioned fact's
    * inferred partition-column type, so the DPP join key needs no cast. */
  private[graft] def dateDim(s: SparkSession, d: String): DataFrame =
    dumpDerived(s, d, "date_dim") {
      t(s, d, "events")
        .select(to_date(col("ts")).as("date_key")).distinct()
        .withColumn("dow", dayofweek(col("date_key")))
        .withColumn("is_weekend", col("dow") === 1 || col("dow") === 7)
    }

  /** Oracle-side path for a derived table (driver gate runs at sf0.01);
    * Spark writes a directory of part files — glob them. */
  private def oraclePath(name: String): String =
    s"'$derivedRoot/sf0.01/$name.parquet/*.parquet'"

  /** Memoized (min, max) event timestamp per sfDir — st01/st03/st04 each
    * ran this scan per query (round-4 VERDICT polish item). */
  private val tsRangeCache =
    new java.util.concurrent.ConcurrentHashMap[String, (java.sql.Timestamp, java.sql.Timestamp)]()
  private def eventsTsRange(s: SparkSession, d: String): (java.sql.Timestamp, java.sql.Timestamp) =
    tsRangeCache.computeIfAbsent(d, _ => {
      val r = t(s, d, "events")
        .agg(min(col("ts").cast("timestamp")), max(col("ts").cast("timestamp"))).head()
      (r.getTimestamp(0), r.getTimestamp(1))
    })

  /**
   * Stage every streaming query's micro-batch files ONCE per (sfDir, JVM)
   * — the `dumpDerived` pattern applied to the stream scaffolding (the
   * file-source batches are deterministic functions of the events table,
   * so st01/st03/st04 re-running the split/coalesce/sentinel writes per
   * query was pure fixed cost; st03 and st04 even share the same halves).
   * Queries COPY the staged files into their own source dir (cheap FS
   * copy) and stamp mtimes there — the file source orders batches by
   * mtime, which must be per-query-run, not per-staging.
   */
  private def stagedStreamBatches(s: SparkSession, d: String): java.nio.file.Path = {
    val dir = java.nio.file.Paths.get(s"${derivedDir(d)}/stream_batches")
    dumpedPaths.getOrElseUpdate(dir.toString, {
      import java.nio.file.{Files, StandardCopyOption}
      val events = t(s, d, "events")
      val schema = events.schema
      val (minTs, maxTs) = eventsTsRange(s, d)
      val cutoff = new java.sql.Timestamp((minTs.getTime + maxTs.getTime) / 2)
      Files.createDirectories(dir)
      def stage(df: DataFrame, name: String): Unit = {
        val tmp = Files.createTempDirectory(s"stage_$name")
        try {
          df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val part = tmp.toFile.listFiles()
            .filter(_.getName.endsWith(".parquet")).head
          Files.move(part.toPath, dir.resolve(name), StandardCopyOption.REPLACE_EXISTING)
        } finally { // drop the _SUCCESS/.crc litter, not just the part file
          // Best-effort recursive cleanup: a failed write can leave a
          // non-empty _temporary tree, and a throw from this finally
          // would mask the original write failure
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
            f.delete(): Unit
          }
          try rm(tmp.toFile)
          catch { case scala.util.control.NonFatal(_) => }
        }
      }
      def tsLit(ms: Long) =
        lit(new java.sql.Timestamp(ms)).cast(schema("ts").dataType)
      // m09's dumps are a staging input (st07 reads the delta slice) —
      // materialize them BEFORE the parallel region below, sequentially
      val newImgs = m09Parts(s, d)._1.where(col("nw"))
        .select(col("image_id"), col("phash"))
      val delta = t(s, d, "documents").where(col("doc_id") % 5 === 0)
      val train = t(s, d, "documents").where(col("doc_id") % 43 =!= 0)
      // All 12 staged batch files are independent tiny coalesce(1) write
      // jobs; run them from a small driver pool so the next job's tasks
      // back-fill the idle session instead of queueing behind each
      // serial job's commit (guide §2.6 — measured ~0.1 s of driver+
      // commit latency per staged file when serial). Job submission is
      // thread-safe; every write lands in its own temp dir and is moved
      // to a distinct file name.
      val work: Seq[(DataFrame, String)] = Seq(
        // session halves at the midpoint cutoff (st03 + st04 share these)
        (events.where(col("ts").cast("timestamp") < cutoff), "b1.parquet"),
        (events.where(col("ts").cast("timestamp") >= cutoff), "b2.parquet"),
        // st03 per-user closing sentinel batch
        (events.select(col("user_id")).distinct()
          .withColumn("event_id", lit(-1L))
          .withColumn("ts", tsLit(maxTs.getTime + 24L * 3600 * 1000))
          .withColumn("event_type", lit("__sentinel"))
          .withColumn("value", lit(0.0)).withColumn("props", lit(""))
          .select(schema.fieldNames.toIndexedSeq.map(col): _*), "st03_sent.parquet"),
        // st05 delta-document micro-batches (the incremental-dedup
        // probe's arriving "new" docs, split to exercise composition)
        (delta.where(col("doc_id") % 10 === 0), "st05_b1.parquet"),
        (delta.where(col("doc_id") % 10 =!= 0), "st05_b2.parquet"),
        // st06 arriving-training-doc micro-batches (d16's TRAIN side)
        (train.where(col("doc_id") % 2 === 0), "st06_b1.parquet"),
        (train.where(col("doc_id") % 2 =!= 0), "st06_b2.parquet"),
        // st07 arriving-image micro-batches: m09's OWN dumped delta
        // slice (`nw`), split by a second hash — reading the dump makes
        // stream-input == m09-input hold by construction
        (newImgs.where(pmod(xxhash64(concat(col("image_id"), lit("|s"))),
          lit(2)) === 0), "st07_b1.parquet"),
        (newImgs.where(pmod(xxhash64(concat(col("image_id"), lit("|s"))),
          lit(2)) =!= 0), "st07_b2.parquet")) ++
        // st01 watermark sentinels: 3 h / 4 h beyond max event time
        Seq(3, 4).map(hrs => (events.limit(1)
          .withColumn("ts", tsLit(maxTs.getTime + hrs * 3600 * 1000L))
          .withColumn("event_type", lit("__sentinel")),
          s"st01_s$hrs.parquet")) ++
        // st04 single-key watermark sentinels (24 h advances the
        // watermark, 25 h guarantees a DATA batch runs with it applied)
        Seq(24, 25).map(hrs => (events.limit(1)
          .withColumn("user_id", lit(-1L))
          .withColumn("ts", tsLit(maxTs.getTime + hrs * 3600L * 1000))
          .select(schema.fieldNames.toIndexedSeq.map(col): _*),
          s"st04_s$hrs.parquet"))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      try {
        work.map { case (df, name) =>
          pool.submit(new Runnable { def run(): Unit = stage(df, name) })
        }.foreach(_.get()) // propagate the first failure, if any
      } finally pool.shutdown()
    })
    dir
  }

  /** Copy a staged batch file into a streaming source dir with a
    * controlled mtime offset (the file source orders batches by mtime). */
  private def copyBatch(src: java.nio.file.Path, inDir: java.nio.file.Path,
      name: String, mtimeOffsetMs: Long): Unit = {
    val dst = inDir.resolve(name)
    java.nio.file.Files.copy(src, dst,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dst.toFile.setLastModified(System.currentTimeMillis() + mtimeOffsetMs)
  }

  /** Run `body` with a session conf key temporarily overridden, restored
    * defensively after (the CC loop's conf-restore pattern). Only sound
    * around work that EXECUTES inside `body` (dump materializations,
    * stream runs) — a returned lazy plan executes after the restore. */
  private def withConf[T](s: SparkSession, key: String, value: String)(body: => T): T = {
    val prev = s.conf.getOption(key)
    s.conf.set(key, value)
    try body finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  /** Run a streaming query's `body` with stream-scoped conf, restored
    * after (both values are pinned into the stream's checkpoint at start,
    * so they only affect the scoped query):
    *
    *  - `spark.sql.shuffle.partitions` lowered — the state stores
    *    allocate one instance per shuffle partition PER MICRO-BATCH, a
    *    fixed cost the tiny validation streams pay 3-5× per query at
    *    width 32. At production scale a stream sizes this to its state,
    *    not 8.
    *  - `spark.sql.streaming.noDataMicroBatches.enabled=false` — the
    *    engine otherwise appends an extra NO-DATA micro-batch (a full
    *    plan + state-store lifecycle + sink-commit round) after every
    *    watermark advance, purely to emit/evict EARLIER than the next
    *    data batch would. Every st-query's emission is DATA-batch-driven
    *    by construction, so those extra batches change wall time only,
    *    never the output: st01/st04 stage a SECOND, later sentinel
    *    precisely so a data batch runs with the already-advanced
    *    watermark (closing every real window / firing every timeout
    *    wall); st02's dedup and st08's inner join emit on row arrival
    *    (their watermarks only bound state); st03 closes sessions on
    *    per-user sentinel ROWS (NoTimeout — a no-data batch is a no-op);
    *    st05-st07 are stateless foreachBatch probes with no watermark at
    *    all. At production scale re-enabling them is a latency knob
    *    (sub-batch emission), not a correctness one. */
  private def withStreamConf[T](s: SparkSession, n: Int)(body: => T): T =
    withConf(s, "spark.sql.shuffle.partitions", n.toString) {
      withConf(s, "spark.sql.streaming.noDataMicroBatches.enabled", "false") {
        body
      }
    }

  /** Corpus size for multimodal queries, scaled off the sf dir name. */
  def corpusRows(dir: String): Long =
    if (dir.contains("sf0.1")) 20000L
    else if (dir.contains("sf0.01")) 5000L
    else 1000L

  // ================================================================ q: relational core

  private val relational: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S2-style scan: projection + predicate, pushed to parquet
    "q01_filter_project" -> { (s, d) =>
      t(s, d, "lineitem")
        .where(col("l_returnflag") === "R" && col("l_quantity") > 30.0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
    },
    // partial-aggregation groupBy (map-side combine)
    "q02_agg_group" -> { (s, d) =>
      t(s, d, "lineitem").groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity")).as("sum_qty"),
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_shipdate")).as("max_ship"),
          countDistinct(col("l_orderkey")).as("n_orders"))
    },
    // broadcast-able dimension join + agg
    "q03_join_agg" -> { (s, d) =>
      t(s, d, "orders").join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
    },
    // multi-way star join (region ⋈ nation ⋈ customer ⋈ orders)
    "q04_star_join" -> { (s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_orders"), countDistinct(col("c_custkey")).as("n_custs"))
    },
    // window function: top-2 orders per customer (deterministic tie-break)
    "q05_window_topk" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 2)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
    },
    // global top-N (TakeOrderedAndProject)
    "q06_global_topn" -> { (s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },
    // semi + anti joins (EXISTS / NOT EXISTS)
    "q07_semi_anti_join" -> { (s, d) =>
      val bigOrders = t(s, d, "orders").where(col("o_totalprice") > 400000.0)
      val c = t(s, d, "customer")
      val withBig = c.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), lit("has_big").as("bucket"))
      val withoutBig = c.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), lit("no_big").as("bucket"))
      withBig.union(withoutBig)
    },
    // set operation: distinct union
    "q08_union_distinct" -> { (s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .union(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct()
    },
    // time-bucketed aggregation over the events stream table
    "q09_events_hourly" -> { (s, d) =>
      t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
    },
    // PARTITION-PRUNED SCAN — the third scan-cost lever next to q01's
    // predicate pushdown and q10's bucketing, and the dominant one at
    // 100 TB: a date-partitioned layout turns "two days of a 30-day
    // corpus" from a full scan into reading 2/30 of the directories,
    // decided at PLANNING time (static PartitionFilters — the scan never
    // lists, opens, or footers the other 28 days). The partitioned
    // write is the once-per-corpus layout cost (the Iceberg-shaped
    // posture: partition spec = to_date(ts)); the spec asserts the
    // pruned plan shape (PartitionFilters non-empty, event_date absent
    // from ReadSchema, partition count 2).
    "q12_partition_pruned_scan" -> { (s, d) =>
      partitionedEvents(s, d)
        .where(col("event_date").isin("2024-01-05", "2024-01-06"))
        .groupBy(col("event_date").cast("string").as("event_date"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"),
          max(col("value")).as("max_value"))
    },
    // DYNAMIC partition pruning — q12's planning-time prune needs the
    // dates as literals; the production star-join shape doesn't have
    // them (the filter lives on a DIMENSION attribute — here "weekend"
    // — and only the join knows which fact partitions survive). DPP
    // closes that gap at RUNTIME: the broadcast of the filtered dim is
    // REUSED as a pruning predicate on the fact scan's partition
    // column, so the fact side still reads 8 of 30 day directories
    // even though no date literal appears anywhere in the query. The
    // dim carries an explicit broadcast hint — it is model-sized by
    // construction (one row per date), and the hint is what lets DPP
    // fire under the session's disabled static-broadcast threshold
    // (reuseBroadcastOnly, the default). Spec asserts the
    // dynamicpruningexpression on the scan and re-asks the full-scan
    // question in-engine.
    "q13_dpp_star_join" -> { (s, d) =>
      val fact = partitionedEvents(s, d)
      // the weekend filter as dow COMPARISONS, not the bare boolean
      // column: PartitionPruning only fires on a "likely selective"
      // predicate shape (comparisons/In/...), and a bare boolean
      // attribute — or `=== true`, which BooleanSimplification strips
      // first — is not one
      val dim = dateDim(s, d).where(col("dow") === 1 || col("dow") === 7)
      fact.join(broadcast(dim.select(col("date_key"))),
          fact("event_date") === col("date_key"))
        .groupBy(col("event_date").cast("string").as("event_date"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"),
          max(col("value")).as("max_value"))
    },
    // bucketed co-located join: both sides written bucketBy the join key,
    // so the join plans with ZERO exchanges — at 100 TB this turns the
    // recurring fact-to-fact join from the dominant shuffle into a local
    // merge per bucket (the table write amortizes across every later join)
    "q10_bucketed_join" -> { (s, d) =>
      val leaf = new java.io.File(d).getName
      def ensure(name: String, df: => DataFrame, key: String): String = {
        val tbl = s"graft_${leaf}_$name".replace(".", "_")
        if (!s.catalog.tableExists(tbl)) {
          // the in-memory catalog forgets tables across sessions but the
          // warehouse directory persists — clear a stale location first
          val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
          val loc = new java.io.File(wh, tbl)
          if (loc.exists()) {
            def rm(f: java.io.File): Unit = {
              if (f.isDirectory) f.listFiles().foreach(rm)
              f.delete()
            }
            rm(loc)
          }
          // pre-partition by the bucket expression (same hash family as
          // bucketBy) so the 16 bucket files write in parallel — the
          // single-file scan otherwise writes all 16 from one task
          df.repartition(16, col(key))
            .write.bucketBy(16, key).sortBy(key).mode("overwrite").saveAsTable(tbl)
        }
        tbl
      }
      val o = ensure("orders_b", t(s, d, "orders"), "o_custkey")
      val c = ensure("customer_b", t(s, d, "customer"), "c_custkey")
      // force the merge join (at validation scale the planner would
      // broadcast the small side and never exercise the bucketed path;
      // at 100 TB both sides are fact-scale and merge is the plan):
      // bucketed on both sides ⇒ NO exchange before the join (a
      // per-bucket sort remains while buckets span multiple files)
      s.table(o).join(s.table(c).hint("merge"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_orders"), max(col("o_totalprice")).as("max_price"))
    },
    // salted two-phase aggregation: a heavily-skewed groupBy key (few
    // distinct event types over many rows) is salted into 16 subkeys for
    // the partial pass, then re-aggregated — no single reducer ever sees
    // a whole hot key's rows. Sums run in DECIMAL so the two-phase
    // regrouping is exact (a double sum would be summation-order-
    // sensitive and could diverge from the oracle).
    "q11_salted_skew_agg" -> { (s, d) =>
      val salted = t(s, d, "events")
        .withColumn("salt", pmod(xxhash64(col("event_id")), lit(16)))
        .groupBy(col("event_type"), col("salt"))
        .agg(count(lit(1)).as("pn"),
          sum(col("value").cast("decimal(18,2)")).as("psum"))
      salted.groupBy(col("event_type"))
        .agg(sum(col("pn")).as("n"),
          // exact decimal sum, rendered as double for the compare
          sum(col("psum")).cast("decimal(18,2)").cast("double").as("sum_value"))
    })

  private val relationalOracles: Map[String, String] = Map(
    "q01_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 30.0""".stripMargin,
    "q02_agg_group" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  sum(l_quantity) AS sum_qty, min(l_shipdate) AS min_ship,
        |  max(l_shipdate) AS max_ship, count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q03_join_agg" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q04_star_join" ->
      """SELECT r_name, count(*) AS n_orders, count(DISTINCT c_custkey) AS n_custs
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q05_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 2""".stripMargin,
    "q06_global_topn" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q07_semi_anti_join" ->
      """SELECT c_custkey, c_name, 'has_big' AS bucket FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |UNION ALL
        |SELECT c_custkey, c_name, 'no_big' AS bucket FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)""".stripMargin,
    "q08_union_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
    "q09_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  count(*) AS n, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q10_bucketed_join" ->
      """SELECT c_nationkey, count(*) AS n_orders, max(o_totalprice) AS max_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey""".stripMargin,
    "q11_salted_skew_agg" ->
      """SELECT event_type, count(*) AS n,
        |  sum(value::DECIMAL(18,2))::DOUBLE AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,
    // the oracle scans the UNPARTITIONED source with the equivalent date
    // predicate — equality proves the partitioned re-layout is lossless
    // and the pruned scan answers exactly the full-scan question
    "q12_partition_pruned_scan" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS event_date, event_type,
        |  count(*) AS n, count(DISTINCT user_id) AS n_users,
        |  max(value) AS max_value
        |FROM events
        |WHERE strftime(ts, '%Y-%m-%d') IN ('2024-01-05', '2024-01-06')
        |GROUP BY 1, 2""".stripMargin,
    // the dim rebuilt from raw events with DuckDB's own calendar
    // (isodow 6/7 = Spark dayofweek 7/1); no date literal anywhere —
    // the weekend ATTRIBUTE does the filtering, as in the engine
    "q13_dpp_star_join" ->
      """WITH dim AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS date_key FROM events
        |  ),
        |wk AS (SELECT date_key FROM dim WHERE isodow(date_key) IN (6, 7))
        |SELECT strftime(e.ts, '%Y-%m-%d') AS event_date, e.event_type,
        |  count(*) AS n, count(DISTINCT e.user_id) AS n_users,
        |  max(e.value) AS max_value
        |FROM events e JOIN wk ON CAST(e.ts AS DATE) = wk.date_key
        |GROUP BY 1, 2""".stripMargin)

  // ================================================================ d: dedup family

  private val dedup: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup: content-hash groupBy (the exact-dup pre-aggregation stage)
    "d01_exact_dedup" -> { (s, d) =>
      t(s, d, "documents")
        .groupBy(md5(encode(col("text"), "UTF-8")).as("text_md5"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_id"))
    },
    // exact n-gram Jaccard within source blocks (blocked pairwise dedup).
    // High-document-frequency grams are dropped BEFORE the self-join: a
    // boilerplate gram appearing in every doc of a source would otherwise
    // produce |docs|² rows in its join group — the classic web-scale
    // stopword blowup. Jaccard is therefore over the rare-gram sets
    // (df ≤ 64 — the same hot-group bound as the LSH bucket cap; a gram
    // in more docs than that is boilerplate, not evidence), consistently
    // in sizes and intersection (and mirrored in the oracle). The df
    // filter reuses the (source, gram) partitioning of its own groupBy,
    // so it costs no extra shuffle over the join.
    "d02_ngram_jaccard" -> { (s, d) =>
      val dfMax = 64
      // spread: the 3-gram explode+hash kernel below is the dominant cost
      // and would otherwise run inside the single scan task (guide §2.5)
      val docs = spread(s, t(s, d, "documents")).where(length(col("text")) >= 3)
      // grams are hashed to 8-byte longs BEFORE any shuffle: every
      // downstream exchange/join keys on (source, gh) instead of carrying
      // 3-char strings — smaller shuffle rows and long-compare joins. The
      // jaccard value is identical unless two distinct grams collide in
      // 64 bits (~10⁴ distinct 3-grams → P ≈ 1e-11; the hash-match
      // oracle gate would surface a collision as a value diff). The hash
      // sits INSIDE the lambda so array_distinct dedups primitive longs
      // (hash-set fast path) instead of 3-char strings — the gramHashes
      // idiom; xxhash64 of the same substring, so the values are
      // unchanged and only a WITHIN-doc cross-gram collision (absorbed
      // into the same ~1e-11 budget) could differ from distinct-then-hash.
      val allGrams = docs.select(col("doc_id"), col("source"),
          explode(expr("array_distinct(transform(sequence(1, length(text)-2), i -> xxhash64(substring(text, i, 3))))")).as("gh"))
      // df-filter as a WINDOW over (source, gh) — the oracle's own
      // QUALIFY formulation and the Lsh.candidatePairsCapped idiom: ONE
      // explode pass + one exchange instead of a groupBy branch joined
      // back against a second full explode of the same scan (guide §2.4;
      // measured: the two explode branches each cost ~17-20 task-seconds
      // at sf0.1). The window's (source, gh) partitioning and sort are
      // exactly what the self-join below needs, so the join adds no
      // exchange or sort on either side.
      val wdf = Window.partitionBy(col("source"), col("gh"))
      // materialized once (the dumpDerived discipline): the rare-gram
      // table has THREE consumers below (sizes + both self-join sides),
      // and exchange reuse cannot deduplicate this subtree (the lambda-
      // bearing explode defeats plan canonicalization — measured: each
      // consumer re-ran the full explode+window pass). The dump runs
      // under the 64k AQE minPartitionSize scope (see embPairs): the
      // window stage reads ~7 MB of shuffle but carries the df-count
      // compute, and the default 1m floor coalesced it to 6 tasks
      // (measured 10 task-seconds → ~1.7 s wall at sf0.1).
      val grams = withConf(s,
          "spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k") {
        dumpDerived(s, d, "d02_grams", files = 1) {
          allGrams.withColumn("df", count(lit(1)).over(wdf))
            .where(col("df") <= dfMax)
            .select(col("doc_id"), col("source"), col("gh"))
        }
      }
      val sizes = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      // The self-join runs OUTSIDE the scoped conf (it executes at sink
      // time), so its width is pinned with explicit join-key repartitions
      // instead: the dump is tens of KB, and byte-based AQE coalescing
      // ran the pair-expansion join in ONE task (measured 1.2 s
      // task-time) while its CPU amplification is ~10³ per shuffle byte.
      // A user repartition is never coalesced; it IS the exchange the
      // join would insert (same key, so ENSURE_REQUIREMENTS adds
      // nothing), and both sides share one width so the SMJ stays
      // co-partitioned under any session conf. The (a, b) rollup's
      // map-side partial aggregation rides IN the widened join stage, so
      // it parallelizes with it; the rollup exchange itself is left to
      // the planner (a user repartition there would be a barrier below
      // which the partial agg cannot push, shuffling raw pair incidences
      // instead of per-task counts). Skew is bounded by construction
      // (df ≤ 64 caps every join group), so forgoing AQE skew-split here
      // loses nothing.
      val par2 = s.sparkContext.defaultParallelism
      val g1 = grams.select(col("doc_id").as("a"), col("source"), col("gh"))
        .repartition(par2, col("source"), col("gh"))
      val g2 = grams.select(col("doc_id").as("b"), col("source"), col("gh"))
        .repartition(par2, col("source"), col("gh"))
      val common = g1.join(g2, Seq("source", "gh"))
        .where(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
      common
        .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
        .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
        .withColumn("jac", round(col("c") * lit(1.0) / (col("na") + col("nb") - col("c")), 6))
        .where(col("jac") >= 0.8)
        .select(col("a"), col("b"), col("jac"))
    })

  private val dedupOracles: Map[String, String] = Map(
    "d01_exact_dedup" ->
      """SELECT md5(text) AS text_md5, count(*) AS n_docs, min(doc_id) AS canonical_id
        |FROM documents GROUP BY 1""".stripMargin,
    "d02_ngram_jaccard" ->
      """WITH pos AS (
        |  SELECT doc_id, source, text, unnest(range(1, length(text)-1)) AS i
        |  FROM documents WHERE length(text) >= 3
        |), all_grams AS (
        |  SELECT DISTINCT doc_id, source, substr(text, i::INT, 3) AS gram FROM pos
        |), grams AS (
        |  SELECT doc_id, source, gram FROM all_grams
        |  QUALIFY count(*) OVER (PARTITION BY source, gram) <= 64
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM grams GROUP BY 1
        |), common AS (
        |  SELECT g1.doc_id a, g2.doc_id b, count(*) c
        |  FROM grams g1 JOIN grams g2
        |    ON g1.gram = g2.gram AND g1.source = g2.source AND g1.doc_id < g2.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT a, b, round(c*1.0/(sa.n+sb.n-c), 6) AS jac FROM common
        |JOIN sizes sa ON sa.doc_id = common.a
        |JOIN sizes sb ON sb.doc_id = common.b
        |WHERE round(c*1.0/(sa.n+sb.n-c), 6) >= 0.8""".stripMargin)

  // ================================================================ t: text analysis

  private def toks(c: Column): Column = filter(split(c, " "), x => x =!= "")

  private val text: Map[String, (SparkSession, String) => DataFrame] = Map(
    // token counting (whitespace tokenizer)
    "t01_token_count" -> { (s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        size(toks(col("text"))).as("n_tokens"),
        length(col("text")).as("n_chars_m"))
    },
    // quality scoring: structural ratios, 6-digit stable rounding
    "t02_quality_score" -> { (s, d) =>
      val df = t(s, d, "documents")
        .withColumn("n_tokens", size(toks(col("text"))))
        .withColumn("n_chars_m", length(col("text")))
        .withColumn("n_stop", size(filter(toks(col("text")),
          x => x === "the" || x === "a")))
      df.select(col("doc_id"), col("n_tokens"), col("n_stop"),
        round(col("n_stop") * lit(1.0) / col("n_tokens"), 6).as("stop_ratio"),
        round(col("n_chars_m") * lit(1.0) / col("n_tokens"), 6).as("avg_tok_len"))
    },
    // language id: deterministic marker-token argmax (n-gram heuristic family)
    "t03_lang_id" -> { (s, d) =>
      val tk = toks(col("text"))
      def cnt(ws: Seq[String]) =
        size(filter(tk, x => ws.map(w => x === w).reduce(_ || _)))
      t(s, d, "documents").select(col("doc_id"), col("lang"),
          cnt(Seq("the", "a", "and", "of")).as("s_en"),
          cnt(Seq("der", "die", "das", "und")).as("s_de"),
          cnt(Seq("le", "la", "et", "les")).as("s_fr"),
          cnt(Seq("el", "los", "y", "las")).as("s_es"))
        .withColumn("predicted",
          when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr") &&
            col("s_en") >= col("s_es") && col("s_en") > 0, "en")
            .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_es") &&
              col("s_de") > 0, "de")
            .when(col("s_fr") >= col("s_es") && col("s_fr") > 0, "fr")
            .when(col("s_es") > 0, "es")
            .otherwise("unknown"))
    },
    // LM-quality scoring, CCNet-style: per-doc mean unigram log-probability
    // under the corpus' own unigram model — the standard "train a cheap LM
    // on the corpus, keep the head of the score distribution" quality
    // filter. Two aggregations: the vocabulary (a dimension table even at
    // web scale — AQE broadcasts it into the token join from runtime
    // stats), then the per-doc mean. The global token total rides on the
    // vocabulary agg as an unpartitioned window over the tiny vocab frame
    // — no separate count job, no driver scalar.
    "t06_unigram_logprob" -> { (s, d) =>
      // no spread: the whitespace explode is too cheap to amortize the
      // widening exchange, and `tokens` has two consumers that would
      // each rerun it (measured +0.2-0.3 s with spread at sf0.1)
      val tokens = t(s, d, "documents")
        .select(col("doc_id"), explode(toks(col("text"))).as("w"))
      val vocab = tokens.groupBy(col("w")).agg(count(lit(1)).as("df"))
        .withColumn("lp",
          log(col("df")) - log(sum(col("df")).over(Window.partitionBy())))
      tokens.join(vocab.select(col("w"), col("lp")), "w")
        .groupBy(col("doc_id")).agg(
          count(lit(1)).as("n_tokens"),
          round(sum(col("lp")) / count(lit(1)), 6).as("avg_logprob"))
    },
    // BPE-ish regex tokenization (the GPT-2 pre-tokenizer family,
    // ASCII-simplified): contractions | space?+letter-run | space?+digit-
    // run | space?+punct-run | residual whitespace. Pure per-row codegen'd
    // regex — no shuffle, embarrassingly parallel at any scale. The
    // BPE-per-word fertility ratio is the standard tokenizer-cost signal
    // a training pipeline budgets by.
    "t07_bpe_tokens" -> { (s, d) =>
      val bpeRe = "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+|\\s+"
      // the corpus is pure lowercase word soup (fertility would be
      // identically 1.0), so a fixed mixed-token suffix — mirrored in
      // the oracle — exercises every branch: contraction split,
      // digit-runs, punctuation-runs ("it's test-case 3.14 x42" is 4
      // whitespace tokens but 10 BPE-ish tokens)
      val aug = concat(col("text"), lit(" it's test-case 3.14 x42"))
      // no spread: the single regexp_count pass is cheaper than the
      // widening exchange at this scale (measured +0.1 s with spread)
      t(s, d, "documents").select(col("doc_id"),
          regexp_count(aug, lit(bpeRe)).as("n_bpe"),
          size(filter(split(aug, " "), x => x =!= "")).as("n_ws"))
        .withColumn("fertility",
          round(col("n_bpe") * lit(1.0) / greatest(col("n_ws"), lit(1)), 6))
    },
    // PII detection/redaction stats: the corpus carries no PII, so a
    // deterministic augmentation (derived purely from doc_id, mirrored
    // in the oracle) plants synthetic emails/phones first — the operator
    // under test is the detect/redact pass, which is again pure per-row
    // codegen'd regex work with no shuffle.
    "t08_pii_redact" -> { (s, d) =>
      val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val phoneRe = "555-[0-9]{4}"
      val aug = concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact me at user"), col("doc_id").cast("string"),
            lit("@example.com now"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" call 555-0"),
            lpad((col("doc_id") % 100).cast("string"), 3, "0")))
          .otherwise(lit("")))
      spread(s, t(s, d, "documents")).select(col("doc_id"), aug.as("aug"))
        .select(col("doc_id"),
          regexp_count(col("aug"), lit(emailRe)).as("n_emails"),
          regexp_count(col("aug"), lit(phoneRe)).as("n_phones"),
          length(col("aug")).as("raw_len"),
          length(regexp_replace(regexp_replace(col("aug"), emailRe, "[EMAIL]"),
            phoneRe, "[PHONE]")).as("redacted_len"))
    },
    // Deterministic stratified sampling — the data-mixing primitive: an
    // exact per-(lang, source) quota drawn by ranking on md5(doc_id), a
    // seed-free order both engines reproduce bit-for-bit (hex strings
    // compare identically). One shuffle on the stratum key; quotas are
    // exact, re-runs and retries select the same rows. At 10^12 rows a
    // handful of strata makes the in-stratum sort the skew surface — the
    // production variant pre-filters on a per-stratum hash threshold
    // (from a broadcast counts agg) to oversample ~quota rows before
    // this exact ranking; the q11 salting pattern applies unchanged.
    "t09_stratified_sample" -> { (s, d) =>
      val w = Window.partitionBy(col("lang"), col("source"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      t(s, d, "documents").select(col("doc_id"), col("lang"), col("source"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
    },
    // TOKEN-BUDGET MIXING — t09's companion data-mixing primitive: fill a
    // per-(lang, source) TOKEN budget greedily by quality (stopword-ratio
    // rank, the t02 signal; CCNet buckets by exactly this family of
    // scores), i.e. "give me the best 120 tokens of every shard". One
    // running-sum window per (lang, source) group — a web-scale mix is
    // computed per shard precisely so the global sort this would
    // otherwise need parallelizes into thousands of independent groups
    // (here 5 langs × 20 sources; a coarser grouping at scale would swap
    // the exact rank for a quality-histogram cutoff — two parallel
    // passes — at the cost of an approximate budget edge). Ordering is
    // deterministic: the quality key is one IEEE division identical in
    // both engines, ties broken by doc_id.
    "t10_token_budget_mix" -> { (s, d) =>
      val base = t(s, d, "documents").select(
        col("doc_id"), col("lang"), col("source"),
        size(toks(col("text"))).as("n_tokens"),
        size(filter(toks(col("text")), x => x === "the" || x === "a")).as("n_stop"))
      val w = Window.partitionBy(col("lang"), col("source"))
        .orderBy((col("n_stop") * lit(1.0) / col("n_tokens")).desc, col("doc_id"))
      base.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .where(col("cum_tokens") <= 120)
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_tokens"), col("cum_tokens"))
    },
    // QUALITY-PERCENTILE CUTOFF — the scale path t10's scaladoc promises
    // for COARSE strata (few groups → a per-group total order would
    // serialize): two fully parallel passes instead of a sort. Pass 1
    // aggregates each lang's exact P75 quality (Spark's `percentile` —
    // map-side partial agg); pass 2 broadcasts the tiny cutoff table
    // back and filters. Keeps the top quality quartile per language with
    // no window and no per-group ordering anywhere in the plan. The
    // interpolated cutoff is computed from identical IEEE doubles in
    // both engines (lower + (upper−lower)·frac), so the >= boundary is
    // exact cross-engine — the oracle's hash gate proves it per run.
    "t11_quality_cutoff" -> { (s, d) =>
      val scored = t(s, d, "documents").select(col("doc_id"), col("lang"),
          size(toks(col("text"))).as("n_tokens"),
          size(filter(toks(col("text")), x => x === "the" || x === "a")).as("n_stop"))
        .withColumn("q", col("n_stop") * lit(1.0) / col("n_tokens"))
      val cuts = scored.groupBy(col("lang"))
        .agg(expr("percentile(q, 0.75)").as("cut"))
      scored.join(broadcast(cuts), "lang")
        .where(col("q") >= col("cut"))
        .select(col("doc_id"), col("lang"),
          round(col("q"), 6).as("quality"), round(col("cut"), 6).as("cutoff"))
    },
    // INTRA-DOCUMENT REPETITION — the Gopher/MassiveText repetition-filter
    // family (Rae et al. 2021 §A1.1: duplicate n-gram and top-n-gram
    // fractions), the per-row complement of d13's CORPUS-level repeated
    // spans: a doc that repeats ITSELF is low-quality even when nothing
    // else in the corpus shares its text. Everything here is higher-order
    // array functions over the row's own token array — per-row codegen,
    // ZERO shuffle at any scale (the 100-TB form is a map-only pass). The
    // nested-lambda counts are O(n·distinct) per row, bounded by the same
    // doc-length cap the sketch tier already assumes (4096 chars). The
    // synthetic corpus has no newlines, so the paper's duplicate-LINE
    // rules instantiate at their n-gram members (top 2-gram, dup 3-gram —
    // 3 because it is the shortest order this corpus actually repeats
    // within documents, so the dup-fraction path is exercised, not
    // vacuously zero).
    "t12_doc_repetition" -> { (s, d) =>
      // spread: the per-row quadratic membership counts below are the
      // whole cost of this zero-shuffle query (guide §2.5)
      val base = spread(s, t(s, d, "documents"))
        .select(col("doc_id"), toks(col("text")).as("ws"))
        .withColumn("n_words", size(col("ws")))
      // grams hash to longs IN the lambda (the d-family gram-kernel
      // idiom): the quadratic membership counts below then compare
      // primitives, not strings. 64-bit collisions are ignorable at
      // ≤10² grams/doc (the d02 precedent, same exact-string oracle).
      val bigrams = when(col("n_words") >= 2,
        transform(sequence(lit(0), col("n_words") - 2),
          i => xxhash64(concat_ws(" ", element_at(col("ws"), i + 1),
            element_at(col("ws"), i + 2)))))
        .otherwise(array().cast("array<bigint>"))
      val grams3 = when(col("n_words") >= 3,
        transform(sequence(lit(0), col("n_words") - 3),
          i => xxhash64(array_join(slice(col("ws"), i + 1, lit(3)), " "))))
        .otherwise(array().cast("array<bigint>"))
      base.withColumn("bg", bigrams).withColumn("g3", grams3)
        .withColumn("top_bigram_n",
          coalesce(array_max(transform(array_distinct(col("bg")),
            g => size(filter(col("bg"), x => x === g)))), lit(0)))
        .withColumn("n_dup_g3",
          size(filter(col("g3"),
            x => size(filter(col("g3"), y => y === x)) >= 2)))
        .select(col("doc_id"), col("n_words"),
          size(array_distinct(col("ws"))).as("n_distinct_words"),
          round(size(array_distinct(col("ws"))) * lit(1.0) /
            greatest(col("n_words"), lit(1)), 6).as("distinct_frac"),
          col("top_bigram_n"), col("n_dup_g3"),
          round(col("n_dup_g3") * lit(1.0) /
            greatest(col("n_words") - 2, lit(1)), 6).as("dup_g3_frac"))
    },
    // KMV (bottom-k) CARDINALITY ESTIMATION — sourmash's own sketch shape
    // (the k smallest distinct hash values, src/lib.rs:192-245's bottom-k
    // mode) reused as the classic distinct-count estimator a corpus tier
    // runs per shard/source: est = (k−1)·H/h_k where h_k is the k-th
    // smallest distinct hash in a space of size H (Bar-Yossef et al.
    // 2002). Registered as a CALIBRATION AUDIT (the d15/e06 discipline):
    // estimate vs exact distinct char-8-gram count per source with the
    // relative error made measurable — mean |err| ≈ 4% at k=256, the
    // 1/√k regime. The hash is md5's leading 52 bits, replicable in
    // DuckDB digit-by-digit, so the oracle re-derives the ENTIRE
    // estimator — ranking, kth-hash fraction, estimate — from raw text.
    "t13_cardinality_kmv" -> { (s, d) =>
      // spread: the char-8-gram explode runs twice (sketch + exact audit
      // side) and dominates; both sides parallelize off one rebalance
      kmvCardinality(spread(s, t(s, d, "documents")), kmvK)
    },
    // TF-IDF SALIENT TERMS — the term-weighting family (keyword
    // extraction / topic tagging, the signal a curation tier uses for
    // domain mixing and index routing): per document, the top-3 terms by
    // tf·idf with the smooth-idf form idf = ln((N+1)/(df+1)) + 1 (the
    // sklearn default — never divides by zero, never goes negative).
    // Scale shape: two column-pruned corpus scans but only THREE
    // exchanges, none corpus-wide in payload — (1) the (doc_id, term) tf
    // aggregation (map-side partial combine collapses in-doc repeats
    // before the shuffle), (2) the df count over PER-ROW-DISTINCT tokens
    // (array_distinct inside the row, so the exchange keys on the term
    // alone with map-side combine — no doc_id-keyed re-shuffle on this
    // side), whose output is vocabulary-sized (a dimension table at any
    // corpus scale — broadcast back by hint), and (3) the per-doc top-k
    // window, which runs on the tf table with WindowGroupLimit pruning
    // rows past rank 3 BEFORE the sort within each partition. df counts
    // per-ROW distinct terms (rows = documents under the table contract
    // of one row per doc_id; the oracle and spec replicate the per-row
    // formulation literally, so the gate is contract-independent). Ranking
    // uses the ROUNDED score in both engines so a 1-ulp ln() divergence
    // cannot flip an order; ties break on the term string (total order —
    // deterministic cross-engine).
    "t14_tfidf_terms" -> { (s, d) =>
      val docs = t(s, d, "documents")
      val n = tableRows(s, d, "documents")
      val tf = docs.select(col("doc_id"), explode(toks(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfT = docs.select(explode(array_distinct(toks(col("text")))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
        .withColumn("idf", log((lit(n) + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0))
      val scored = tf.join(broadcast(dfT), "term")
        .withColumn("score", round(col("tf") * col("idf"), 6))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      scored.withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("term"),
          col("tf"), col("df"), col("score"))
    })

  /** t13's estimator body; `k` is a parameter so the spec can drive the
    * degenerate branch (fewer distinct values than k → the sketch IS the
    * exact set and the estimate must equal the exact count). */
  private[graft] val kmvK = 256
  private[graft] def kmvCardinality(docs: DataFrame, k: Int): DataFrame = {
    // The production side is the SKETCH alone: [[graft.functions
    // .BottomKAgg]] reduces raw gram occurrences — duplicates and all,
    // no distinct pre-pass, no per-group sort — into one ≤k sorted
    // distinct buffer per (source, map partition) BEFORE the exchange
    // (ObjectHashAggregate partial), so at 100 TB the estimator costs
    // one exchange of k-bounded sketches regardless of corpus size.
    // The exact-distinct side is the AUDIT's calibration cost — the
    // heavyweight distinct a pipeline pays once to pick k, then drops.
    val occurrences = docs.select(col("source"),
      explode(when(length(col("text")) >= 8,
        transform(sequence(lit(1), length(col("text")) - 7),
          i => col("text").substr(i, lit(8))))
        .otherwise(array().cast("array<string>"))).as("gram"))
    val sketch = occurrences
      .select(col("source"), md5(col("gram")).as("h"))
      .groupBy(col("source"))
      .agg(graft.functions.BottomKAgg.bottomK(col("h"), k).as("bk"))
      .select(col("source"), element_at(col("bk"), -1).as("kth"),
        size(col("bk")).as("n_in"))
    val exact = occurrences.distinct()
      .groupBy(col("source")).agg(count(lit(1)).as("exact_distinct"))
    // the kth hash's leading 13 hex digits as an exact 52-bit integer in
    // a double (< 2^53, so conv→cast is exact); u = hv/2^52 is the
    // fraction of the hash space covered by the k smallest values
    val hv = conv(substring(col("kth"), 1, 13), 16, 10).cast("double")
    exact.join(sketch, "source")
      .withColumn("est_distinct",
        when(col("n_in") < k, round(col("exact_distinct") * lit(1.0), 3))
          .otherwise(round(lit((k - 1).toDouble) * pow(lit(2.0), lit(52.0)) / hv, 3)))
      .select(col("source"), col("exact_distinct"), col("est_distinct"),
        round(abs(col("est_distinct") - col("exact_distinct")) /
          col("exact_distinct"), 6).as("rel_err"))
  }

  private val textOracles: Map[String, String] = Map(
    // full KMV replica from raw text: the 8-gram explode, the distinct
    // set, md5 ranking (fixed-width lowercase hex, so lexicographic
    // order IS numeric order in both engines), the kth hash's leading
    // 52 bits rebuilt digit-by-digit as exact powers of two, and the
    // (k−1)/u estimate — a wrong rank, a biased hash slice, or a
    // fraction off by one nibble all fail the hash gate
    "t13_cardinality_kmv" ->
      """WITH g AS (
        |  SELECT DISTINCT source,
        |    unnest(list_transform(range(1, CAST(len(text) AS BIGINT) - 6),
        |      i -> substr(text, CAST(i AS INT), 8))) AS gram
        |  FROM documents),
        |h AS (SELECT source, md5(gram) AS h FROM g),
        |r AS (SELECT source, h,
        |        row_number() OVER (PARTITION BY source ORDER BY h) AS rk
        |      FROM h),
        |b AS (SELECT source, max(h) AS kth, count(*) AS n_in
        |      FROM r WHERE rk <= 256 GROUP BY 1),
        |e AS (SELECT source, count(*) AS exact_distinct FROM g GROUP BY 1),
        |v AS (SELECT source, n_in,
        |        list_sum(list_transform(range(13), i ->
        |          (strpos('0123456789abcdef', substr(kth, CAST(i + 1 AS INT), 1)) - 1)
        |            * 2.0 ** (4 * (12 - i)))) AS hv
        |      FROM b),
        |s AS (SELECT e.source, e.exact_distinct,
        |        CASE WHEN v.n_in < 256 THEN round(e.exact_distinct * 1.0, 3)
        |             ELSE round(255.0 * (2.0 ** 52) / v.hv, 3) END AS est_distinct
        |      FROM e JOIN v USING (source))
        |SELECT source, exact_distinct, est_distinct,
        |  round(abs(est_distinct - exact_distinct) / exact_distinct, 6) AS rel_err
        |FROM s""".stripMargin,
    // full tf·idf replica from raw text: same tokenizer, same smooth-idf
    // formula, ranking on the ROUNDED score with term-string tiebreak —
    // a wrong df, a wrong N, or a divergent ln() all fail the hash gate.
    // df counts per-ROW distinct terms (list_distinct before unnest),
    // mirroring the Spark side's array_distinct formulation exactly —
    // the two agree under ANY input, not just unique doc_ids
    "t14_tfidf_terms" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x != '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfr AS (
        |  SELECT unnest(list_distinct(
        |    list_filter(string_split(text, ' '), x -> x != ''))) AS term
        |  FROM documents),
        |dfq AS (SELECT term, count(*) AS df FROM dfr GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |sc AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
        |    round(tf.tf * (ln((n.n + 1.0) / (dfq.df + 1.0)) + 1.0), 6) AS score
        |  FROM tf JOIN dfq USING (term) CROSS JOIN n),
        |rr AS (SELECT doc_id, term, tf, df, score,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY score DESC, term) AS rk
        |       FROM sc)
        |SELECT doc_id, rk, term, tf, df, score FROM rr WHERE rk <= 3""".stripMargin,
    "t12_doc_repetition" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x != '') AS ws
        |  FROM documents),
        |b AS (SELECT doc_id, ws, len(ws) AS n_words FROM w),
        |g AS (
        |  SELECT doc_id, n_words, ws,
        |    CASE WHEN n_words >= 2 THEN
        |      list_transform(range(1, n_words), i -> ws[i] || ' ' || ws[i+1])
        |    ELSE [] END AS bg,
        |    CASE WHEN n_words >= 3 THEN
        |      list_transform(range(1, n_words - 1),
        |        i -> array_to_string(ws[i:i+2], ' '))
        |    ELSE [] END AS g3
        |  FROM b),
        |m AS (
        |  SELECT doc_id, n_words,
        |    len(list_distinct(ws)) AS n_distinct_words,
        |    coalesce(list_max(list_transform(list_distinct(bg),
        |      g2 -> len(list_filter(bg, x -> x = g2)))), 0) AS top_bigram_n,
        |    len(list_filter(g3,
        |      x -> len(list_filter(g3, y -> y = x)) >= 2)) AS n_dup_g3
        |  FROM g)
        |SELECT doc_id, n_words, n_distinct_words,
        |  round(n_distinct_words * 1.0 / greatest(n_words, 1), 6) AS distinct_frac,
        |  top_bigram_n, n_dup_g3,
        |  round(n_dup_g3 * 1.0 / greatest(n_words - 2, 1), 6) AS dup_g3_frac
        |FROM m""".stripMargin,
    // the doubled '' is a single quote inside the DuckDB string literal;
    // RE2 and Java regex agree on every construct used here
    "t07_bpe_tokens" ->
      """WITH aug AS (
        |  SELECT doc_id, text || ' it''s test-case 3.14 x42' AS aug
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(aug,
        |    '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+|\s+')) AS n_bpe,
        |  len(list_filter(string_split(aug, ' '), x -> x != '')) AS n_ws,
        |  round(len(regexp_extract_all(aug,
        |      '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+|\s+')) * 1.0 /
        |    greatest(len(list_filter(string_split(aug, ' '), x -> x != '')), 1),
        |    6) AS fertility
        |FROM aug""".stripMargin,
    "t08_pii_redact" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |    text ||
        |    CASE WHEN doc_id % 7 = 0
        |      THEN ' contact me at user' || doc_id || '@example.com now'
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 11 = 0
        |      THEN ' call 555-0' || lpad(CAST(doc_id % 100 AS VARCHAR), 3, '0')
        |      ELSE '' END AS aug
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(aug, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(aug, '555-[0-9]{4}')) AS n_phones,
        |  length(aug) AS raw_len,
        |  length(regexp_replace(regexp_replace(aug,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
        |    '555-[0-9]{4}', '[PHONE]', 'g')) AS redacted_len
        |FROM aug""".stripMargin,
    "t09_stratified_sample" ->
      """SELECT doc_id, lang, source, rk FROM (
        |  SELECT doc_id, lang, source,
        |    row_number() OVER (PARTITION BY lang, source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 3""".stripMargin,
    "t10_token_budget_mix" ->
      """WITH b AS (
        |  SELECT doc_id, lang, source,
        |    len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tokens,
        |    len(list_filter(string_split(text, ' '),
        |        x -> x = 'the' OR x = 'a')) AS n_stop
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang, source, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY lang, source
        |      ORDER BY n_stop*1.0/n_tokens DESC, doc_id) AS cum_tokens
        |  FROM b)
        |SELECT doc_id, lang, source, n_tokens, cum_tokens FROM r
        |WHERE cum_tokens <= 120""".stripMargin,
    "t11_quality_cutoff" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tokens,
        |    len(list_filter(string_split(text, ' '),
        |        x -> x = 'the' OR x = 'a')) AS n_stop
        |  FROM documents),
        |s AS (SELECT doc_id, lang, n_stop*1.0/n_tokens AS q FROM b),
        |c AS (SELECT lang, quantile_cont(q, 0.75) AS cut FROM s GROUP BY lang)
        |SELECT s.doc_id, s.lang, round(s.q, 6) AS quality,
        |  round(c.cut, 6) AS cutoff
        |FROM s JOIN c USING (lang) WHERE s.q >= c.cut""".stripMargin,
    "t01_token_count" ->
      """SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tokens,
        |  length(text) AS n_chars_m
        |FROM documents""".stripMargin,
    "t02_quality_score" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tokens,
        |    length(text) AS n_chars_m,
        |    len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS n_stop
        |  FROM documents)
        |SELECT doc_id, n_tokens, n_stop,
        |  round(n_stop*1.0/n_tokens, 6) AS stop_ratio,
        |  round(n_chars_m*1.0/n_tokens, 6) AS avg_tok_len
        |FROM b""".stripMargin,
    "t03_lang_id" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split(text,' '), x -> x IN ('the','a','and','of'))) AS s_en,
        |    len(list_filter(string_split(text,' '), x -> x IN ('der','die','das','und'))) AS s_de,
        |    len(list_filter(string_split(text,' '), x -> x IN ('le','la','et','les'))) AS s_fr,
        |    len(list_filter(string_split(text,' '), x -> x IN ('el','los','y','las'))) AS s_es
        |  FROM documents)
        |SELECT doc_id, lang, s_en, s_de, s_fr, s_es,
        |  CASE
        |    WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
        |    WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
        |    WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
        |    WHEN s_es > 0 THEN 'es'
        |    ELSE 'unknown' END AS predicted
        |FROM b""".stripMargin,
    "t06_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x != '')) AS w
        |  FROM documents),
        |vocab AS (SELECT w, count(*) AS df FROM toks GROUP BY 1),
        |lp AS (
        |  SELECT w, ln(df) - ln(sum(df) OVER ()) AS lp FROM vocab)
        |SELECT t.doc_id, count(*) AS n_tokens,
        |  round(sum(l.lp) / count(*), 6) AS avg_logprob
        |FROM toks t JOIN lp l USING (w)
        |GROUP BY 1""".stripMargin)

  // ================================================================ d: sketch dedup on documents
  //
  // The murmur3/minhash/simhash KERNELS are not SQL-expressible, but every
  // stage downstream of them is: each query dumps its kernel output
  // (sketches / band keys) as a derived table and the DuckDB oracle
  // independently replicates the bucketing, capping, pair generation,
  // combined-denominator Jaccard, Hamming confirm, and connected
  // components from that dump. The kernels themselves are golden- and
  // property-tested in KernelSpec/ExpressionsSpec.

  import graft.core.{MinHash, SketchConfig, Shingles}
  import graft.functions.GraftFunctions
  import graft.operators.{ConnectedComponents, Lsh, Similarity}

  private val docSketch = SketchConfig(num = 128, ksize = 4)

  /** Published sourmash angular similarity 1 − 2·acos(ρ)/π from a dot
    * product and the two squared norms ([[graft.core.MinHash.angularSimilarity]]
    * is the kernel twin). ρ is clamped to [−1, 1] like the kernel — fp
    * round-up past 1.0 on identical/proportional sketches would turn
    * acos into NaN. Rounded to 6 places (single-operation fp, oracle-safe). */
  private[graft] def angularSimCol(dot: Column, n2a: Column, n2b: Column): Column =
    round(lit(1.0) - lit(2.0) * acos(
        least(lit(1.0), greatest(lit(-1.0), dot / sqrt(n2a * n2b))))
      / lit(math.Pi), 6)

  /** Distinct char-4-grams of pre-normalized text `(doc_id, nt)` — the
    * same shingle universe [[graft.core.Shingles.charShingleHashes]]
    * sketches. Texts shorter than the gram width contribute their whole
    * string as the single gram, mirroring the kernel, so no candidate
    * endpoint silently vanishes from the d15 audit (an empty `nt` yields
    * an empty sketch and can never be an LSH candidate). */
  private[graft] def auditGrams(normed: DataFrame): DataFrame =
    normed.where(length(col("nt")) >= 1)
      .select(col("doc_id"), explode(when(length(col("nt")) >= 4, expr(
          "array_distinct(transform(sequence(1, length(nt)-3), i -> substring(nt, i, 4)))"))
        .otherwise(array(col("nt")))).as("gram"))

  /** [[auditGrams]]' production twin with the hash INSIDE the lambda
    * (the gramHashes idiom): array_distinct dedups primitive longs
    * instead of 4-char strings, and no gram string survives the stage
    * that makes it. Same xxhash64 over the same substrings, so it equals
    * `auditGrams → xxhash64(gram)` row-for-row unless two distinct grams
    * of ONE doc collide in 64 bits (≲ 1e-13 per doc here; the oracle
    * distincts exact strings, so the hash gate would surface one) —
    * QueriesSpec pins the equivalence on the hostile short-text corpus. */
  private[graft] def auditGramHashes(normed: DataFrame): DataFrame =
    normed.where(length(col("nt")) >= 1)
      .select(col("doc_id"), explode(when(length(col("nt")) >= 4, expr(
          "array_distinct(transform(sequence(1, length(nt)-3), i -> xxhash64(substring(nt, i, 4))))"))
        .otherwise(array(xxhash64(col("nt"))))).as("gh"))

  /** (doc_id, source, mins, simhash) — written once, read by d03–d08 and
    * the d12/st05 index probes; `files = 1` keeps the much-re-read index
    * a single part file while the sketch kernel still computes 32-wide. */
  private def docSketches(s: SparkSession, d: String): DataFrame =
    dumpDerived(s, d, "doc_sketches", files = 1) {
      // spread: the MinHash/SimHash sketch kernels are the cost here, and
      // the single-file scan would run them in one task (guide §2.5)
      spread(s, t(s, d, "documents")).select(col("doc_id"), col("source"),
        GraftFunctions.captionMinhash(col("text"), docSketch).as("mins"),
        GraftFunctions.captionSimhash(col("text"), docSketch.ksize).as("simhash"))
    }

  /** (id, bandKey) — the exploded MinHash LSH band table over doc_id. */
  private def docBanded(s: SparkSession, d: String): DataFrame =
    dumpDerived(s, d, "doc_banded", files = 1) {
      Lsh.explodeBands(
        docSketches(s, d).select(col("doc_id").as("id"),
          GraftFunctions.minhashBands(col("mins"), bands = 16, rowsPerBand = 8).as("bk")),
        "id", "bk", sourceTag = 11)
    }

  /** LSH candidate pairs over the banded dump — itself dumped once per
    * (sfDir, JVM): five queries consume the same pair set (d03/d04/d12/
    * d14/d15), and the bucket-size window over the exploded band table is
    * the expensive step; re-running it per consumer was pure repeat work. */
  private def docCandidates(s: SparkSession, d: String): DataFrame =
    // 64k minPartitionSize scope (see embPairs): the bucket window +
    // in-bucket pair generation read ~1 MB of banded shuffle but carry
    // the pair-expansion compute, so the default byte floor ran them in
    // ONE task (measured 0.8 s single-task at sf0.1); inert at scale.
    withConf(s, "spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k") {
      dumpDerived(s, d, "doc_candidates") {
        Lsh.candidatePairs(docBanded(s, d), maxBucket = 64)
      }
    }

  /** (doc_id, cluster) — the ≥0.5-Jaccard-confirmed near-dup clustering,
    * dumped once per (sfDir, JVM): d06 returns it verbatim and d11 keys
    * its keep-rule off it (the confirm joins and the iterative CC loop
    * previously ran twice per verify run). */
  private def docClusterLabels(s: SparkSession, d: String): DataFrame =
    dumpDerived(s, d, "doc_cluster_labels") {
      val sk = docSketches(s, d)
      val edges = docCandidates(s, d)
        .join(sk.select(col("doc_id").as("a"), col("mins").as("mins_a")), "a")
        .join(sk.select(col("doc_id").as("b"), col("mins").as("mins_b")), "b")
        .where(GraftFunctions.jaccard(col("mins_a"), col("mins_b"), docSketch) >= 0.5)
        .select(col("a").as("src"), col("b").as("dst"))
      ConnectedComponents
        .labelAll(t(s, d, "documents").select(col("doc_id").as("id")), edges)
        .select(col("id").as("doc_id"), col("component").as("cluster"))
    }

  /** The cluster-keyed split assignment shared by d22 (the published
    * split table) and d23 (the stability audit of that same rule): ONE
    * definition so the audit can never drift from the table it audits.
    * Cluster ids are non-negative min-member doc_ids, so `pmod` matches
    * DuckDB's `%` in the oracles. */
  private[graft] def clusterSplitRule(c: Column): Column =
    when(pmod(c, lit(10)) === 0, lit("val"))
      .when(pmod(c, lit(10)) === 1, lit("test"))
      .otherwise(lit("train"))

  /** DuckDB replica of [[Lsh.candidatePairsCapped]] over the band dump. */
  private def candSql: String =
    s"""bnd AS (SELECT id, bandKey FROM read_parquet(${oraclePath("doc_banded")})),
       |keep AS (SELECT bandKey FROM bnd GROUP BY bandKey HAVING count(*) BETWEEN 2 AND 64),
       |cand AS (
       |  SELECT DISTINCT x.id AS a, y.id AS b
       |  FROM bnd x JOIN keep USING (bandKey) JOIN bnd y USING (bandKey)
       |  WHERE x.id < y.id)""".stripMargin

  /** DuckDB replica of the combined-denominator Jaccard confirm
    * (reference semantics, num=128) over candidate pairs. */
  private def jacSql: String =
    s"""sk AS (SELECT doc_id, mins FROM read_parquet(${oraclePath("doc_sketches")})),
       |uni AS (
       |  SELECT c.a, c.b,
       |    unnest(list_distinct(list_concat(sa.mins, sb.mins))) AS m,
       |    sa.mins AS ma, sb.mins AS mb
       |  FROM cand c
       |  JOIN sk sa ON sa.doc_id = c.a
       |  JOIN sk sb ON sb.doc_id = c.b),
       |rk AS (
       |  SELECT a, b, list_contains(ma, m) AND list_contains(mb, m) AS in_both,
       |    row_number() OVER (PARTITION BY a, b ORDER BY (m < 0), m) AS r
       |  FROM uni),
       |jac AS (
       |  SELECT a, b,
       |    round(count(*) FILTER (WHERE in_both) * 1.0 / greatest(count(*), 1), 6) AS jac_est
       |  FROM rk WHERE r <= 128 GROUP BY a, b)""".stripMargin

  private val docDedup: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MinHash + LSH banding: candidate pair generation (bucket equi-grouping)
    "d03_minhash_lsh_pairs" -> { (s, d) => docCandidates(s, d) },
    // candidate confirm with reference-semantics Jaccard estimate
    "d04_minhash_jaccard_dedup" -> { (s, d) =>
      val sk = docSketches(s, d)
      docCandidates(s, d)
        .join(sk.select(col("doc_id").as("a"), col("mins").as("mins_a")), "a")
        .join(sk.select(col("doc_id").as("b"), col("mins").as("mins_b")), "b")
        .withColumn("jac_est", round(GraftFunctions.jaccard(col("mins_a"), col("mins_b"), docSketch), 6))
        .where(col("jac_est") >= 0.5)
        .select(col("a"), col("b"), col("jac_est"))
    },
    // SimHash near-dup pairs: 5-of-8 joint band keys (C(8,5)=56 ~46-bit
    // keys; pigeonhole guarantees any pair within Hamming 3 shares ≥ 1
    // key) + Hamming confirm ≤ 3 — Manku et al.'s canonical 64-bit
    // near-dup threshold (WWW'07 §3 uses k=3 for 8B web pages). The
    // original single 8-bit blocks (256 values per band) saturated the
    // heat cap as the corpus grew — measured at 5000 docs: 141 hot
    // buckets (max 1805), losing 10,316/11,357 pairs at the old ≤ 7
    // contract and 75/257 at ≤ 3; the 40-value-bit joints read 0 hot
    // buckets / max 5 / 6.6k candidate mass at the same scale, and the
    // old ≤ 7 zone was mostly background anyway (h=4..7 carries 11k
    // pairs vs 257 at ≤ 3 — not near-dups at 64-bit simhash scale).
    // Oracle brute-forces ALL doc-pair Hammings from the sketch dump —
    // equality re-proves the radius-3 guarantee on data (the m08/m09
    // discipline); QueriesSpec re-asserts it at 5000 docs.
    "d05_simhash_dedup" -> { (s, d) =>
      val sk = docSketches(s, d)
      val banded = Lsh.explodeBands(
        sk.select(col("doc_id").as("id"),
          GraftFunctions.fingerprintJointBands(col("simhash"), 5).as("bk")),
        "id", "bk", sourceTag = 12)
      Lsh.candidatePairs(banded, maxBucket = 64)
        .join(sk.select(col("doc_id").as("a"), col("simhash").as("sh_a")), "a")
        .join(sk.select(col("doc_id").as("b"), col("simhash").as("sh_b")), "b")
        .withColumn("hamming", GraftFunctions.hamming64(col("sh_a"), col("sh_b")))
        .where(col("hamming") <= 3)
        .select(col("a"), col("b"), col("hamming"))
    },
    // near-dup clusters: confirmed edges → connected components
    "d06_doc_clusters" -> { (s, d) => docClusterLabels(s, d) },
    // SCALED-mode sketches end-to-end — the reference's second sketch mode
    // (`/root/reference/src/lib.rs:198,206`): an unsigned max_hash cutoff
    // instead of bottom-k. scaled=4 → max_hash = 2^62; at num=0 the merge
    // never truncates, so the reference's combined-denominator Jaccard
    // degenerates to plain |A∩B|/|A∪B| — the oracle replicates BOTH the
    // cutoff (pure unsigned comparison, SQL-expressible since 2^62 > 0)
    // and the Jaccard from the raw murmur shingle dump.
    "d09_scaled_sketch" -> { (s, d) =>
      val scaledCfg = graft.core.SketchConfig(num = 0, ksize = 5,
        maxHash = graft.core.SketchConfig.scaledToMaxHash(4L))
      docShingles(s, d) // materialize the shingle dump the oracle reads
      val sk = udf((text: String) =>
        MinHash.sketchHashes(Shingles.charShingleHashes(text, 5, 42L), scaledCfg))
      val scaled = t(s, d, "documents").select(col("doc_id"), sk(col("text")).as("mins"))
      docCandidates(s, d)
        .join(scaled.select(col("doc_id").as("a"), col("mins").as("ma")), "a")
        .join(scaled.select(col("doc_id").as("b"), col("mins").as("mb")), "b")
        .select(col("a"), col("b"),
          size(col("ma")).cast("long").as("na"),
          size(col("mb")).cast("long").as("nb"),
          round(GraftFunctions.jaccard(col("ma"), col("mb"), scaledCfg), 6).as("jac_scaled"))
    },
    // canonical-representative selection — the pipeline step AFTER
    // clustering in a dedup tier: keep exactly ONE doc per near-dup
    // cluster (most tokens, then lowest doc_id — deterministic) and
    // report the cluster with its member count. Cost shape at scale:
    // the d06 label table + one hash-partitioned window over the
    // cluster key; no all-pairs, no extra shuffle beyond the label join.
    "d11_canonical_keep" -> { (s, d) =>
      val docs = t(s, d, "documents")
      val labeled = docClusterLabels(s, d)
      val scored = docs.select(col("doc_id"),
        size(toks(col("text"))).cast("long").as("n_tokens"))
      val byCluster = Window.partitionBy(col("cluster"))
      val pick = Window.partitionBy(col("cluster"))
        .orderBy(col("n_tokens").desc, col("doc_id"))
      labeled.join(scored, "doc_id")
        .withColumn("n_members", count(lit(1)).over(byCluster))
        .withColumn("rk", row_number().over(pick))
        .where(col("rk") === 1)
        .select(col("cluster"), col("doc_id").as("keep_id"),
          col("n_members"), col("n_tokens").as("keep_tokens"))
    },
    // incremental (delta-vs-corpus) dedup — the daily-ingest pattern at
    // 100 TB: the corpus' exploded band table is a PERSISTED index (here
    // the shared doc_banded dump stands in for it); a new batch probes it
    // with a plain hash join on bandKey, so the corpus is never
    // re-sketched or re-shuffled — cost is O(delta + touched buckets).
    // doc_id % 5 == 0 stands in for the delta. Oversize index buckets are
    // dropped by the same heat cap as d03 (64). Decision per new doc: its
    // best existing near-dup (max confirmed Jaccard, tie lowest corpus
    // id) at >= 0.5. Within-delta duplicates are the batch self-dedup's
    // job (d03/d04 over the delta), not this probe's.
    "d12_incremental_dedup" -> { (s, d) =>
      val sk = docSketches(s, d)
      val bands = docBanded(s, d)
      val newB = bands.where(col("id") % 5 === 0)
        .select(col("id").as("new_id"), col("bandKey"))
      val oldB = bands.where(col("id") % 5 =!= 0)
        .select(col("id").as("old_id"), col("bandKey"))
      val keep = oldB.groupBy("bandKey")
        .agg(count(lit(1)).as("n")).where(col("n") <= 64).select("bandKey")
      val cands = newB.join(keep, "bandKey").join(oldB, "bandKey")
        .select(col("new_id"), col("old_id")).distinct()
      val scored = cands
        .join(sk.select(col("doc_id").as("new_id"), col("mins").as("mins_n")), "new_id")
        .join(sk.select(col("doc_id").as("old_id"), col("mins").as("mins_o")), "old_id")
        .withColumn("jac_est",
          round(GraftFunctions.jaccard(col("mins_n"), col("mins_o"), docSketch), 6))
        .where(col("jac_est") >= 0.5)
      val pick = Window.partitionBy(col("new_id"))
        .orderBy(col("jac_est").desc, col("old_id"))
      scored.withColumn("rk", row_number().over(pick)).where(col("rk") === 1)
        .select(col("new_id"), col("old_id").as("dup_of"), col("jac_est"))
    },
    // repeated-span flagging — the MassiveText/C4 "remove spans that
    // recur across the corpus" rule at 8-token-gram granularity (exact
    // sentence repetition never happens in web text after trafilatura;
    // shared n-gram spans between near-dup pages do): per doc, how many
    // of its token 8-grams appear in ≥ 2 distinct documents. Scale
    // shape: the gram STRING dies in the same stage that makes it
    // (xxhash64 right after the explode) — every shuffle carries (long,
    // long); the doc-frequency side is a two-stage distinct agg. An
    // 8-byte key merges distinct grams at ~n²/2⁶⁴, one-sided toward
    // over-flagging — the dedup-pipeline-safe direction.
    "d13_repeated_ngram_spans" -> { (s, d) =>
      val docs = t(s, d, "documents")
      val ts = toks(col("text"))
      val grams = when(size(ts) >= 8,
        transform(sequence(lit(0), size(ts) - 8),
          i => array_join(slice(ts, i + 1, lit(8)), " ")))
        .otherwise(array().cast("array<string>"))
      // spread: the 8-token gram build + explode dominates; only the gram
      // branch is widened — the final left-join scan stays narrow
      val g = spread(s, docs).select(col("doc_id"), explode(grams).as("gram"))
        .select(col("doc_id"), xxhash64(col("gram")).as("gh"))
      val freq = g.groupBy("gh").agg(countDistinct(col("doc_id")).as("nd"))
      val perDoc = g.join(freq, "gh")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup"))
      docs.select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup"))
    },
    // containment-based subset-dup detection — sourmash's asymmetric
    // containment semantic (count_common / |A|, /root/reference/src/
    // index.rs:146-160) applied to the dedup tier: a doc QUOTED inside a
    // longer doc scores low Jaccard but high containment, so the Jaccard
    // confirms (d04) miss it by design. Same LSH candidate set, same
    // codegen'd kernel family; both directions reported.
    "d14_containment_dedup" -> { (s, d) =>
      val sk = docSketches(s, d)
      docCandidates(s, d)
        .join(sk.select(col("doc_id").as("a"), col("mins").as("mins_a")), "a")
        .join(sk.select(col("doc_id").as("b"), col("mins").as("mins_b")), "b")
        .withColumn("cont_ab",
          round(GraftFunctions.containment(col("mins_a"), col("mins_b")), 6))
        .withColumn("cont_ba",
          round(GraftFunctions.containment(col("mins_b"), col("mins_a")), 6))
        .where(greatest(col("cont_ab"), col("cont_ba")) >= 0.8)
        .select(col("a"), col("b"), col("cont_ab"), col("cont_ba"))
    },
    // ESTIMATOR CALIBRATION AUDIT: for every LSH candidate pair, the
    // sketch-estimated Jaccard (128-min combined denominator — the
    // reference's `compare` semantics the whole dedup tier trusts) next
    // to the EXACT distinct-4-gram Jaccard over the same normalized
    // text, plus the absolute error. This is the evaluation harness a
    // production tier runs on a sample before committing to a sketch
    // width: the d04/m01 thresholds are only meaningful if the estimator
    // is calibrated at the operating point. Exact counting is confined
    // to candidate pairs (grams join against the candidate endpoints —
    // never all-pairs), so the audit costs O(candidates), not O(n²).
    "d15_sketch_error_audit" -> { (s, d) =>
      val sk = docSketches(s, d)
      // collapse-THEN-trim matches Shingles.normalizeText exactly: the
      // collapse turns any leading/trailing whitespace run (\n, \t, …)
      // into a single space, which the space-stripping trim then removes
      // (trim-first would leave non-space leading whitespace behind as a
      // retained space — a gram universe captionMinhash never sketches)
      // spread: normalization + the distinct-4-gram explode is the cost
      val normed = spread(s, t(s, d, "documents")).select(col("doc_id"),
        trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("nt"))
      // distinct char-4-grams hashed to longs so the pair joins never
      // carry strings (auditGrams pins the universe rule in the spec;
      // auditGramHashes is its hash-inside-the-lambda production twin)
      val grams = auditGramHashes(normed)
      val sizes = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val cands = docCandidates(s, d)
      val common = cands
        .join(grams.select(col("doc_id").as("a"), col("gh")), "a")
        .join(grams.select(col("doc_id").as("b"), col("gh")), Seq("b", "gh"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
      cands
        .join(sk.select(col("doc_id").as("a"), col("mins").as("mins_a")), "a")
        .join(sk.select(col("doc_id").as("b"), col("mins").as("mins_b")), "b")
        .withColumn("jac_est",
          round(GraftFunctions.jaccard(col("mins_a"), col("mins_b"), docSketch), 6))
        .join(common, Seq("a", "b"), "left")
        .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
        .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
        .withColumn("jac_exact", round(
          coalesce(col("c"), lit(0L)) * lit(1.0) /
            (col("na") + col("nb") - coalesce(col("c"), lit(0L))), 6))
        .withColumn("abs_err", round(abs(col("jac_est") - col("jac_exact")), 6))
        .select(col("a"), col("b"), col("jac_est"), col("jac_exact"), col("abs_err"))
    },
    // BENCHMARK DECONTAMINATION — the cross-corpus training-pipeline op
    // (remove/flag training docs that overlap a held-out eval set, the
    // GPT-3/Llama 13-gram protocol): a deterministic slice of the corpus
    // (doc_id % 43 = 0, ~2%) plays the eval benchmark; every TRAIN doc is
    // scored by the fraction of its distinct char-13-grams that appear
    // anywhere in the eval set. The scale shape differs from every dNN
    // above: the eval side is small and the train side is the 100-TB
    // corpus, so the gram-membership join is a BROADCAST hash join on
    // 8-byte gram hashes (no shuffle of the train grams beyond the per-doc
    // rollup); at eval sets too large to broadcast exactly, the same plan
    // swaps the hash set for a Bloom filter of eval grams (false-positive
    // overlap inflates scores conservatively — flagged docs are dropped
    // anyway). Grams are xxhash64'd before the join (d02's documented
    // collision bound applies; the oracle joins exact strings, so the
    // hash gate would surface a collision as a value diff).
    "d16_decontaminate" -> { (s, d) => deconOverlap(s, d) },
    // d16's CAN'T-BROADCAST twin: when the eval suite's gram set is too
    // large to broadcast exactly, the production shape is a BLOOM
    // PREFILTER (built distributed via graft_bloom_agg — Spark's own
    // runtime-filter aggregate, one binary row, never a driver collect)
    // reaching every train partition as a scalar subquery, followed by
    // an exact SHUFFLE join that only the surviving grams pay for. Bloom
    // filters have no false negatives and the exact join kills the false
    // positives, so the output is PROVABLY identical to d16 — it shares
    // d16's oracle — while the shuffle carries (true hits + fpp·rest)
    // instead of the whole 100-TB gram stream. The SHUFFLE_HASH hint
    // pins the at-scale plan (AQE would broadcast the toy eval side and
    // make the prefilter pointless at sf0.01).
    "d17_decontaminate_bloom" -> { (s, d) =>
      graft.functions.GraftExtensions.register(s)
      deconGrams(s, d).createOrReplaceTempView("decon_grams")
      // bloom sized from table statistics (the memoized row-count
      // stand-in): eval slice ≈ rows/43, ~300 distinct grams each. An
      // overestimate only lowers FPP; Spark caps the filter's numBits.
      val est = math.max(16384L, tableRows(s, d, "documents") * 7L)
      s.sql(
        s"""WITH eg AS (SELECT DISTINCT gh FROM decon_grams WHERE ev),
          |bloom AS (SELECT graft_bloom_agg(gh, CAST($est AS BIGINT)) AS bf FROM eg),
          |tg AS (SELECT doc_id, gh FROM decon_grams WHERE NOT ev),
          |per_doc AS (SELECT doc_id, count(*) AS n_grams FROM tg GROUP BY doc_id),
          |survivors AS (
          |  SELECT doc_id, gh FROM tg
          |  WHERE graft_might_contain((SELECT bf FROM bloom), gh)),
          |hits AS (
          |  SELECT /*+ SHUFFLE_HASH(eg) */ s.doc_id, count(*) AS n_hit
          |  FROM survivors s JOIN eg ON s.gh = eg.gh GROUP BY s.doc_id)
          |SELECT p.doc_id, p.n_grams, h.n_hit,
          |  round(h.n_hit * 1.0D / p.n_grams, 6) AS overlap,
          |  round(h.n_hit * 1.0D / p.n_grams, 6) >= 0.5 AS contaminated
          |FROM per_doc p JOIN hits h ON p.doc_id = h.doc_id""".stripMargin)
    },
    // THE CURATION MANIFEST — the whole training-set funnel as ONE
    // declarative plan, reporting surviving docs + token mass per stage:
    // raw → quality gate (t02's signals) → eval split (the d16 holdout
    // leaves the training set) → decontamination (d16's flags) →
    // near-dup canonical keep (d06's clusters + d11's keep rule, ranked
    // among the docs still alive at this stage). This is the per-release
    // report a production corpus ships with; composing it as one plan
    // means Catalyst shares the scans/joins and the whole funnel is a
    // single pass + one cluster window + one global conditional agg —
    // per-stage sums are of integral token counts, so the report is
    // bit-deterministic at any parallelism.
    "d18_curation_manifest" -> { (s, d) =>
      val base = t(s, d, "documents").select(col("doc_id"),
        size(toks(col("text"))).cast("long").as("n_tokens"),
        size(filter(toks(col("text")), x => x === "the" || x === "a")).as("n_stop"))
      val contam = deconOverlap(s, d).where(col("contaminated"))
        .select(col("doc_id"), lit(true).as("contam"))
      val funnel = base
        .join(broadcast(contam), Seq("doc_id"), "left")
        .join(docClusterLabels(s, d), "doc_id")
        .withColumn("q_ok", col("n_tokens") >= 20 &&
          col("n_stop") * lit(1.0) / col("n_tokens") >= 0.05)
        .withColumn("s3", col("q_ok") && !(col("doc_id") % 43 === 0))
        .withColumn("s4", col("s3") && !coalesce(col("contam"), lit(false)))
      val keepRank = Window.partitionBy(col("cluster"))
        .orderBy(col("s4").desc, col("n_tokens").desc, col("doc_id"))
      funnel.withColumn("rk", row_number().over(keepRank))
        .agg(
          count(lit(1)).as("raw_d"), sum(col("n_tokens")).as("raw_t"),
          count(when(col("q_ok"), 1)).as("q_d"),
          coalesce(sum(when(col("q_ok"), col("n_tokens"))), lit(0L)).as("q_t"),
          count(when(col("s3"), 1)).as("s3_d"),
          coalesce(sum(when(col("s3"), col("n_tokens"))), lit(0L)).as("s3_t"),
          count(when(col("s4"), 1)).as("s4_d"),
          coalesce(sum(when(col("s4"), col("n_tokens"))), lit(0L)).as("s4_t"),
          count(when(col("s4") && col("rk") === 1, 1)).as("s5_d"),
          coalesce(sum(when(col("s4") && col("rk") === 1, col("n_tokens"))), lit(0L)).as("s5_t"))
        .select(expr(
          """stack(5,
            |  'raw', raw_d, raw_t,
            |  'quality', q_d, q_t,
            |  'eval_split', s3_d, s3_t,
            |  'decontaminated', s4_d, s4_t,
            |  'near_dedup', s5_d, s5_t) AS (stage, n_docs, n_tokens)""".stripMargin))
    },
    // CORPUS-LEVEL TEMPLATE/BOILERPLATE STRIP — CCNet-style "line dedup"
    // re-expressed for unstructured text: each document is cut into
    // NON-overlapping 8-token segments (the "lines"); a segment whose
    // document frequency reaches 3 is template boilerplate, and every
    // document is REWRITTEN without its boilerplate segments (the
    // sub-8-token tail always survives — too short to template-match).
    // Contrast d13, which reports overlapping-gram duplication stats but
    // never rewrites. Scale shape: the exploded shuffle carries only
    // (doc_id, i, xxhash64) longs — text never rides an exploded exchange;
    // it moves exactly once, in the final doc-keyed join against the
    // per-doc drop lists (tiny: only boilerplate-hit docs have a row, and
    // AQE runtime-broadcasts that side), and the rewrite is a per-row
    // array expression. doc-frequency count and drop-list are two
    // aggregations over the same segment rows — dumped once per (sfDir,
    // JVM) like [[deconGrams]], so the 100-TB text scan + explode runs
    // once, not once per consumer; the reread is three longs per segment.
    "d19_boilerplate_strip" -> { (s, d) =>
      val docs = t(s, d, "documents")
      val ts = toks(col("text"))
      val segRows = dumpDerived(s, d, "d19_segments") {
        val segHashes = when(size(ts) >= 8,
          transform(sequence(lit(0), (size(ts) / 8).cast("int") - 1),
            i => xxhash64(array_join(slice(ts, i * 8 + 1, lit(8)), " "))))
          .otherwise(array().cast("array<long>"))
        // spread: tokenization + segment hashing per row (guide §2.5)
        spread(s, docs).select(col("doc_id"), posexplode(segHashes).as(Seq("i", "gh")))
      }
      val boiler = segRows.groupBy("gh")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .where(col("nd") >= 3).select("gh")
      val drops = segRows.join(boiler, "gh")
        .groupBy("doc_id").agg(collect_set(col("i")).as("drops"))
      val nseg = (size(col("ts")) / 8).cast("int")
      val keptIdx = when(nseg >= 1,
        filter(sequence(lit(0), nseg - 1), i => !array_contains(col("drops"), i)))
        .otherwise(array().cast("array<int>"))
      val cleanArr = concat(
        flatten(transform(keptIdx, i => slice(col("ts"), i * 8 + 1, lit(8)))),
        slice(col("ts"), nseg * 8 + 1, size(col("ts")) - nseg * 8))
      docs.join(drops, Seq("doc_id"), "left")
        .select(col("doc_id"), ts.as("ts"),
          coalesce(col("drops"), array().cast("array<int>")).as("drops"))
        .select(col("doc_id"),
          nseg.cast("long").as("n_seg"),
          size(col("drops")).cast("long").as("n_drop"),
          size(cleanArr).cast("long").as("clean_n"),
          array_join(cleanArr, " ").as("clean_text"))
    },
    // DEDUP-PRESSURE PROVENANCE MATRIX — the curation report a shard
    // owner reads before deciding what to drop: every ≥0.5-Jaccard
    // confirmed near-dup pair (the d04 edge set, same dumps, same
    // kernel) attributed to its UNORDERED source pair, with the pair
    // count and the number of distinct documents involved. A hot
    // (sa, sa) diagonal cell means a self-duplicating shard (re-crawl /
    // template farm); a hot off-diagonal cell means two shards covering
    // the same underlying content — drop one, not both. Scale shape:
    // the confirm output is already tiny relative to the corpus (it IS
    // the duplicate mass), so both aggregations and the final join run
    // on edge-sized data; sources ride along from the sketch dump — no
    // extra corpus scan, no new shuffle wider than the edge set.
    "d20_dedup_pressure" -> { (s, d) =>
      val sk = docSketches(s, d)
      val p = docCandidates(s, d)
        .join(sk.select(col("doc_id").as("a"), col("mins").as("mins_a"),
          col("source").as("src_a")), "a")
        .join(sk.select(col("doc_id").as("b"), col("mins").as("mins_b"),
          col("source").as("src_b")), "b")
        .where(GraftFunctions.jaccard(col("mins_a"), col("mins_b"), docSketch) >= 0.5)
        .select(least(col("src_a"), col("src_b")).as("sa"),
          greatest(col("src_a"), col("src_b")).as("sb"),
          col("a"), col("b"))
      val np = p.groupBy("sa", "sb").agg(count(lit(1)).as("n_pairs"))
      val nd = p.select(col("sa"), col("sb"),
          explode(array(col("a"), col("b"))).as("docu"))
        .groupBy("sa", "sb").agg(countDistinct(col("docu")).as("n_docs"))
      np.join(nd, Seq("sa", "sb"))
        .select(col("sa"), col("sb"), col("n_pairs"), col("n_docs"))
    },
    // CLUSTER-DILUTION AUDIT — the pre-drop check on the CLUSTERING step
    // itself, completing the audit family (d15 audits the sketch
    // estimator, e06 the ANN index, t13 the cardinality sketch; nothing
    // audited the transitive closure). Connected components over
    // pairwise-confirmed edges is known to over-merge through chains
    // (A~B~C with A≁C): before a tier drops all-but-one doc per cluster
    // it reads exactly this report — per multi-member cluster, the edge
    // density (1.0 = clique: every member pairwise-confirmed; → 2/n =
    // bare chain) and the weakest confirmed link (min edge Jaccard — how
    // thin the thread holding the cluster together is). Scale shape: the
    // confirmed edge set is duplicate-mass-sized; the label join is
    // edge-keyed (AQE broadcasts the edge side), member counts are one
    // agg over the label table, and both final groupBys key on the
    // cluster id — nothing here rivals the dedup that produced the input.
    // Note rounding cannot desync this from d06's unrounded ≥ 0.5 edge
    // filter: jac_est is k/n with n ≤ 128 (combined denominator), so
    // |k/n − 0.5| ≥ 1/256 whenever it isn't exactly 0.5 — round-to-6
    // never flips the threshold.
    "d21_cluster_dilution" -> { (s, d) =>
      val labels = docClusterLabels(s, d)
      val sk = docSketches(s, d)
      val edges = docCandidates(s, d)
        .join(sk.select(col("doc_id").as("a"), col("mins").as("mins_a")), "a")
        .join(sk.select(col("doc_id").as("b"), col("mins").as("mins_b")), "b")
        .withColumn("jac_est",
          round(GraftFunctions.jaccard(col("mins_a"), col("mins_b"), docSketch), 6))
        .where(col("jac_est") >= 0.5)
        .select(col("a"), col("jac_est"))
      val mem = labels.groupBy("cluster")
        .agg(count(lit(1)).as("n_members"))
        .where(col("n_members") >= 2)
      // both edge endpoints share a cluster by construction (the closure
      // was built from this edge set) — labeling by `a` alone suffices
      val ec = edges.join(labels.withColumnRenamed("doc_id", "a"), "a")
        .groupBy("cluster")
        .agg(count(lit(1)).as("n_edges"), min(col("jac_est")).as("min_jac"))
      mem.join(ec, "cluster")
        .select(col("cluster"), col("n_members"), col("n_edges"),
          round(col("n_edges") * lit(2.0) /
            (col("n_members") * (col("n_members") - lit(1))), 6).as("density"),
          col("min_jac"))
    },
    // LEAKAGE-FREE TRAIN/VAL/TEST SPLIT — the curation step AFTER dedup
    // that per-document splitting gets wrong: a val doc whose near-twin
    // sits in train measures memorization, not generalization. The split
    // key is the CLUSTER, not the doc — every member of a near-dup
    // cluster lands in the same split by construction, so no confirmed
    // near-dup pair can straddle the train/eval boundary (the same
    // reasoning as d16's decontamination, applied to the corpus' own
    // splits). The assignment rule (cluster % 10 → 0=val, 1=test, else
    // train; cluster ids are non-negative min-doc_ids, so % matches
    // DuckDB's) is the deterministic stand-in for production
    // hash(cluster)-mod-buckets — same shape, SQL-replicable. Scale
    // shape: a per-row CASE over the d06 label table — zero new
    // shuffles, zero new scans; the oracle re-derives the ENTIRE chain
    // (closure included) independently.
    "d22_cluster_safe_split" -> { (s, d) =>
      docClusterLabels(s, d)
        .withColumn("split", clusterSplitRule(col("cluster")))
    },
    // SPLIT STABILITY UNDER CORPUS GROWTH — the failure mode d22's rule
    // has over TIME: cluster ids are min-member doc_ids, so when the
    // corpus grows, a new doc can BRIDGE two previously-separate clusters
    // (their members inherit the smaller min → different split bucket) or
    // push an LSH bucket past the heat cap (losing a candidate edge →
    // a cluster splits). Either way a doc that was in val/test can
    // silently move to train — eval contamination across refreshes. This
    // audit re-runs the ENTIRE d06 chain (band → cap → confirm → CC →
    // split) on the first-80%% prefix of the corpus (cutoff = 4n/5 over
    // doc_id — the deterministic stand-in for "the previous snapshot")
    // and reports, per prefix doc, the cluster + split under both
    // corpora and whether the doc leaked across the boundary. Scale
    // shape: the prefix chain rides the SAME sketch/band dumps (a filter
    // on the banded table IS the banding of the prefix corpus — band
    // keys are per-doc), so the marginal cost is one more bucket window
    // + confirm join + CC loop on 80% of the edge mass; nothing
    // re-sketches. The oracle re-derives BOTH recursive closures
    // independently.
    "d23_split_stability" -> { (s, d) =>
      val cutoff = tableRows(s, d, "documents") * 4 / 5
      val sk = docSketches(s, d)
      val preEdges = Lsh.candidatePairs(
          docBanded(s, d).where(col("id") < cutoff), maxBucket = 64)
        .join(sk.select(col("doc_id").as("a"), col("mins").as("mins_a")), "a")
        .join(sk.select(col("doc_id").as("b"), col("mins").as("mins_b")), "b")
        .where(GraftFunctions.jaccard(col("mins_a"), col("mins_b"), docSketch) >= 0.5)
        .select(col("a").as("src"), col("b").as("dst"))
      val preLabels = ConnectedComponents.labelAll(
          t(s, d, "documents").select(col("doc_id").as("id"))
            .where(col("id") < cutoff), preEdges)
        .select(col("id").as("doc_id"), col("component").as("cluster_pre"))
      docClusterLabels(s, d)
        .select(col("doc_id"), col("cluster").as("cluster_full"))
        .join(preLabels, "doc_id")
        .withColumn("split_pre", clusterSplitRule(col("cluster_pre")))
        .withColumn("split_full", clusterSplitRule(col("cluster_full")))
        .withColumn("leaked", col("split_pre") =!= col("split_full"))
        .select(col("doc_id"), col("cluster_pre"), col("cluster_full"),
          col("split_pre"), col("split_full"), col("leaked"))
    })

  /** Distinct char-13-grams of (doc_id, text) rows, xxhash64'd to 8-byte
    * keys — the shared shingle kernel of the decontamination family
    * (d16/d17/d18/st06). The hash moves INSIDE the lambda so
    * array_distinct runs on primitive longs (hash-set fast path) instead
    * of 13-char strings (pairwise-compare path — measured 6× slower on
    * this corpus' ~500-gram docs); distinct-then-hash and
    * hash-then-distinct differ only on a within-doc 64-bit collision
    * (~10⁻¹⁰ here; the oracle distincts exact strings, so the hash gate
    * would surface one). */
  private[graft] def gramHashes(docs: DataFrame): DataFrame =
    docs.where(length(col("text")) >= 13)
      .select(col("doc_id"),
        explode(expr("array_distinct(transform(sequence(1, length(text)-12), i -> xxhash64(substring(text, i, 13))))")).as("gh"))

  /** [[gramHashes]] over the documents table with the deterministic
    * eval-slice marker (doc_id % 43 — the held-out "benchmark" at ~2% of
    * the corpus). Dumped once per (sfDir, JVM): d16/d17/d18 all consume
    * this table, so the explode+hash pass runs once, not three times
    * (the docCandidates sharing pattern). */
  private def deconGrams(s: SparkSession, d: String): DataFrame =
    dumpDerived(s, d, "decon_grams") {
      // the explode multiplies rows ~300× — if the scan arrives narrower
      // than the session (one small parquet file here), everything
      // downstream runs near-serial. [[spread]] widens BEFORE the explode
      // (a shuffle of the small input, 1/300th of the post-explode bytes);
      // at scale the scan already splits and spread is a no-op.
      gramHashes(spread(s, t(s, d, "documents")))
        .withColumn("ev", col("doc_id") % 43 === 0)
    }

  /** Per-doc eval-gram overlap score via the broadcast membership join —
    * the confirm shared by d16 (one-shot) and st06 (per micro-batch);
    * per-doc independence is what makes the two provably equal.
    * `evalGrams` must be the distinct eval gh set with a `hit` marker. */
  private[graft] def deconScore(grams: DataFrame, evalGrams: DataFrame): DataFrame =
    grams.join(broadcast(evalGrams), Seq("gh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .where(col("n_hit") > 0)
      .withColumn("overlap", round(col("n_hit") * lit(1.0) / col("n_grams"), 6))
      .withColumn("contaminated", col("overlap") >= 0.5)
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        col("overlap"), col("contaminated"))

  /** d16's body (also feeds d18's funnel). */
  private def deconOverlap(s: SparkSession, d: String): DataFrame = {
    val docs = deconGrams(s, d)
    deconScore(docs.where(!col("ev")),
      docs.where(col("ev")).select(col("gh")).distinct()
        .withColumn("hit", lit(1L)))
  }

  private val docDedupOracles: Map[String, String] = Map(
    "d03_minhash_lsh_pairs" ->
      s"""WITH $candSql
         |SELECT a, b FROM cand""".stripMargin,
    "d04_minhash_jaccard_dedup" ->
      s"""WITH $candSql,
         |$jacSql
         |SELECT a, b, jac_est FROM jac WHERE jac_est >= 0.5""".stripMargin,
    // simhash bucketing replicated from the fingerprint alone: 8-bit
    // pigeonhole blocks, bucket cap, pair gen, Hamming confirm — all in SQL
    // brute-force ALL doc-pair Hammings from the dumped sketches —
    // equality with the banded path re-proves the 5-of-8 joint-key
    // radius-3 recall guarantee on data (a banded miss OR a heat-cap
    // loss on a true pair would show up as a missing row here)
    "d05_simhash_dedup" ->
      s"""WITH s AS (SELECT doc_id, simhash
         |  FROM read_parquet(${oraclePath("doc_sketches")})),
         |ham AS (
         |  SELECT sa.doc_id AS a, sb.doc_id AS b,
         |    bit_count(xor(sa.simhash, sb.simhash)) AS hamming
         |  FROM s sa JOIN s sb ON sa.doc_id < sb.doc_id)
         |SELECT a, b, hamming FROM ham WHERE hamming <= 3""".stripMargin,
    // scaled-mode replica: the unsigned max_hash=2^62 cutoff over the raw
    // shingle dump (h in [0, 2^62] in signed terms since 2^62 > 0), then
    // plain set Jaccard over the LSH-gated candidate pairs
    "d09_scaled_sketch" ->
      s"""WITH $candSql,
         |hh AS (
         |  SELECT DISTINCT doc_id, h FROM read_parquet(${oraclePath("t04_shingles")})
         |  WHERE pos IS NOT NULL),
         |sc AS (SELECT doc_id, h FROM hh WHERE h >= 0 AND h <= 4611686018427387904),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sc GROUP BY 1),
         |cm AS (
         |  SELECT c.a, c.b, count(*) AS cnt
         |  FROM cand c
         |  JOIN sc x ON x.doc_id = c.a
         |  JOIN sc y ON y.doc_id = c.b AND y.h = x.h
         |  GROUP BY 1, 2)
         |SELECT c.a, c.b,
         |  coalesce(sa.n, 0) AS na, coalesce(sb.n, 0) AS nb,
         |  round(coalesce(cm.cnt, 0) * 1.0 /
         |    greatest(coalesce(sa.n, 0) + coalesce(sb.n, 0) - coalesce(cm.cnt, 0), 1), 6) AS jac_scaled
         |FROM cand c
         |LEFT JOIN sizes sa ON sa.doc_id = c.a
         |LEFT JOIN sizes sb ON sb.doc_id = c.b
         |LEFT JOIN cm ON cm.a = c.a AND cm.b = c.b""".stripMargin,
    // connected components via recursive transitive closure (small graph)
    "d06_doc_clusters" ->
      s"""WITH RECURSIVE $candSql,
         |$jacSql,
         |edges AS (SELECT a, b FROM jac WHERE jac_est >= 0.5),
         |und AS (SELECT a AS u, b AS v FROM edges UNION SELECT b, a FROM edges),
         |reach(u, v) AS (
         |  SELECT u, v FROM und
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
         |comp AS (SELECT u AS doc_id, least(u, min(v)) AS cluster FROM reach GROUP BY u)
         |SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster
         |FROM documents d LEFT JOIN comp c USING (doc_id)""".stripMargin,
    // the d06 closure extended with the keep rule: per-cluster argmax by
    // token count (tie: lowest doc_id), member counts from a window
    "d11_canonical_keep" ->
      s"""WITH RECURSIVE $candSql,
         |$jacSql,
         |edges AS (SELECT a, b FROM jac WHERE jac_est >= 0.5),
         |und AS (SELECT a AS u, b AS v FROM edges UNION SELECT b, a FROM edges),
         |reach(u, v) AS (
         |  SELECT u, v FROM und
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
         |comp AS (SELECT u AS doc_id, least(u, min(v)) AS cluster FROM reach GROUP BY u),
         |lab AS (
         |  SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster,
         |    len(list_filter(string_split(d.text, ' '), x -> x != ''))::BIGINT AS n_tokens
         |  FROM documents d LEFT JOIN comp c USING (doc_id)),
         |ranked AS (
         |  SELECT cluster, doc_id, n_tokens,
         |    count(*) OVER (PARTITION BY cluster) AS n_members,
         |    row_number() OVER (PARTITION BY cluster ORDER BY n_tokens DESC, doc_id) AS rk
         |  FROM lab)
         |SELECT cluster, doc_id AS keep_id, n_members, n_tokens AS keep_tokens
         |FROM ranked WHERE rk = 1""".stripMargin,
    // delta-vs-index probe replica: the band dump split by the same
    // delta rule, index-side bucket cap, pair gen, combined-denominator
    // Jaccard confirm (shared jacSql), per-new-doc argmax
    "d12_incremental_dedup" ->
      s"""WITH bnd AS (SELECT id, bandKey FROM read_parquet(${oraclePath("doc_banded")})),
         |newb AS (SELECT id, bandKey FROM bnd WHERE id % 5 = 0),
         |oldb AS (SELECT id, bandKey FROM bnd WHERE id % 5 <> 0),
         |keep AS (SELECT bandKey FROM oldb GROUP BY bandKey HAVING count(*) <= 64),
         |cand AS (
         |  SELECT DISTINCT n.id AS a, o.id AS b
         |  FROM newb n JOIN keep USING (bandKey) JOIN oldb o USING (bandKey)),
         |$jacSql,
         |best AS (
         |  SELECT a, b, jac_est,
         |    row_number() OVER (PARTITION BY a ORDER BY jac_est DESC, b) AS rk2
         |  FROM jac WHERE jac_est >= 0.5)
         |SELECT a AS new_id, b AS dup_of, jac_est FROM best WHERE rk2 = 1""".stripMargin,
    // the repeated-span rule replicated on the gram STRINGS (the Spark
    // side keys on xxhash64 — identical counts absent 64-bit collisions,
    // which the oracle would catch as a hash mismatch)
    "d13_repeated_ngram_spans" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS ts
        |  FROM documents),
        |idx AS (
        |  SELECT doc_id, ts, unnest(generate_series(1, greatest(len(ts) - 7, 0))) AS i
        |  FROM tok),
        |g AS (SELECT doc_id, list_aggregate(ts[i:i+7], 'string_agg', ' ') AS gram FROM idx),
        |fr AS (SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY gram),
        |agg AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_grams,
        |    sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup
        |  FROM g JOIN fr USING (gram) GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.n_grams, 0)::BIGINT AS n_grams,
        |  coalesce(a.n_dup, 0)::BIGINT AS n_dup
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,
    // asymmetric containment replica over the candidate dump: plain
    // value-set intersection over each side's own sketch length
    // (count_common / |A| — index.rs:146-160; no combined-denominator
    // re-truncation here, unlike jacSql)
    "d14_containment_dedup" ->
      s"""WITH $candSql,
         |sk AS (SELECT doc_id, mins FROM read_parquet(${oraclePath("doc_sketches")})),
         |co AS (
         |  SELECT c.a, c.b,
         |    CASE WHEN len(sa.mins) = 0 THEN 0.0 ELSE
         |      round(len(list_intersect(sa.mins, sb.mins)) * 1.0 / len(sa.mins), 6)
         |    END AS cont_ab,
         |    CASE WHEN len(sb.mins) = 0 THEN 0.0 ELSE
         |      round(len(list_intersect(sa.mins, sb.mins)) * 1.0 / len(sb.mins), 6)
         |    END AS cont_ba
         |  FROM cand c JOIN sk sa ON sa.doc_id = c.a JOIN sk sb ON sb.doc_id = c.b)
         |SELECT a, b, cont_ab, cont_ba FROM co
         |WHERE greatest(cont_ab, cont_ba) >= 0.8""".stripMargin,
    // estimator audit: jac_est replicated from the sketch dump (jacSql),
    // jac_exact re-counted from the raw text's distinct 4-grams — two
    // independent paths meeting at the same pair rows
    "d15_sketch_error_audit" ->
      s"""WITH $candSql,
         |$jacSql,
         |nt AS (
         |  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
         |  FROM documents),
         |grams AS (
         |  SELECT DISTINCT doc_id, substr(nt, i::INT, 4) AS gram
         |  FROM (SELECT doc_id, nt, unnest(range(1, length(nt)-2)) AS i
         |        FROM nt WHERE length(nt) >= 4)
         |  UNION ALL
         |  SELECT doc_id, nt AS gram FROM nt WHERE length(nt) BETWEEN 1 AND 3),
         |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
         |cmn AS (
         |  SELECT c.a, c.b, count(*) AS c
         |  FROM cand c
         |  JOIN grams ga ON ga.doc_id = c.a
         |  JOIN grams gb ON gb.doc_id = c.b AND gb.gram = ga.gram
         |  GROUP BY 1, 2),
         |ex AS (
         |  SELECT j.a, j.b, j.jac_est,
         |    round(coalesce(cm.c, 0) * 1.0 /
         |      (sa.n + sb.n - coalesce(cm.c, 0)), 6) AS jac_exact
         |  FROM jac j
         |  LEFT JOIN cmn cm ON cm.a = j.a AND cm.b = j.b
         |  JOIN sizes sa ON sa.doc_id = j.a
         |  JOIN sizes sb ON sb.doc_id = j.b)
         |SELECT a, b, jac_est, jac_exact,
         |  round(abs(jac_est - jac_exact), 6) AS abs_err FROM ex""".stripMargin,
    // decontamination replicated on exact gram STRINGS (the Spark side
    // joins on xxhash64 of the same grams — a collision would flip n_hit
    // and fail this hash gate)
    "d16_decontaminate" ->
      """WITH docs AS (
        |  SELECT doc_id, text, (doc_id % 43 = 0) AS ev FROM documents
        |  WHERE length(text) >= 13),
        |pos AS (
        |  SELECT doc_id, text, ev, unnest(range(1, length(text)-11)) AS i
        |  FROM docs),
        |grams AS (
        |  SELECT DISTINCT doc_id, ev, substr(text, i::INT, 13) AS gram FROM pos),
        |eg AS (SELECT DISTINCT gram FROM grams WHERE ev),
        |hits AS (
        |  SELECT doc_id, count(*) AS n_grams,
        |    count(*) FILTER (WHERE gram IN (SELECT gram FROM eg)) AS n_hit
        |  FROM grams WHERE NOT ev GROUP BY 1)
        |SELECT doc_id, n_grams, n_hit,
        |  round(n_hit*1.0/n_grams, 6) AS overlap,
        |  round(n_hit*1.0/n_grams, 6) >= 0.5 AS contaminated
        |FROM hits WHERE n_hit > 0""".stripMargin,
    // the whole funnel replicated: closure clusters (d11's fragments),
    // decontamination flags (d16's fragments), quality gate, and the
    // per-cluster keep rank — one independent SQL pass over the same
    // tables/dumps
    "d18_curation_manifest" ->
      s"""WITH RECURSIVE $candSql,
         |$jacSql,
         |edges AS (SELECT a, b FROM jac WHERE jac_est >= 0.5),
         |und AS (SELECT a AS u, b AS v FROM edges UNION SELECT b, a FROM edges),
         |reach(u, v) AS (
         |  SELECT u, v FROM und
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
         |comp AS (SELECT u AS doc_id, least(u, min(v)) AS cluster FROM reach GROUP BY u),
         |dd AS (SELECT doc_id, text, (doc_id % 43 = 0) AS ev FROM documents
         |  WHERE length(text) >= 13),
         |pos AS (SELECT doc_id, text, ev, unnest(range(1, length(text)-11)) AS i FROM dd),
         |grams AS (SELECT DISTINCT doc_id, ev, substr(text, i::INT, 13) AS gram FROM pos),
         |eg AS (SELECT DISTINCT gram FROM grams WHERE ev),
         |hits AS (
         |  SELECT doc_id, count(*) AS n_grams,
         |    count(*) FILTER (WHERE gram IN (SELECT gram FROM eg)) AS n_hit
         |  FROM grams WHERE NOT ev GROUP BY 1),
         |flags AS (SELECT doc_id FROM hits WHERE round(n_hit*1.0/n_grams, 6) >= 0.5),
         |b AS (
         |  SELECT doc_id,
         |    len(list_filter(string_split(text, ' '), x -> x != ''))::BIGINT AS n_tokens,
         |    len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a')) AS n_stop
         |  FROM documents),
         |f AS (
         |  SELECT b.doc_id, b.n_tokens, coalesce(c.cluster, b.doc_id) AS cluster,
         |    (b.n_tokens >= 20 AND b.n_stop*1.0/b.n_tokens >= 0.05) AS q_ok,
         |    (b.doc_id % 43 = 0) AS is_eval,
         |    (b.doc_id IN (SELECT doc_id FROM flags)) AS contam
         |  FROM b LEFT JOIN comp c USING (doc_id)),
         |f2 AS (
         |  SELECT *, (q_ok AND NOT is_eval) AS s3,
         |    (q_ok AND NOT is_eval AND NOT contam) AS s4 FROM f),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY cluster
         |    ORDER BY s4 DESC, n_tokens DESC, doc_id) AS rk FROM f2)
         |SELECT 'raw' AS stage, count(*)::BIGINT AS n_docs,
         |  sum(n_tokens)::BIGINT AS n_tokens FROM r
         |UNION ALL SELECT 'quality', count(*) FILTER (WHERE q_ok),
         |  coalesce(sum(n_tokens) FILTER (WHERE q_ok), 0) FROM r
         |UNION ALL SELECT 'eval_split', count(*) FILTER (WHERE s3),
         |  coalesce(sum(n_tokens) FILTER (WHERE s3), 0) FROM r
         |UNION ALL SELECT 'decontaminated', count(*) FILTER (WHERE s4),
         |  coalesce(sum(n_tokens) FILTER (WHERE s4), 0) FROM r
         |UNION ALL SELECT 'near_dedup', count(*) FILTER (WHERE s4 AND rk = 1),
         |  coalesce(sum(n_tokens) FILTER (WHERE s4 AND rk = 1), 0) FROM r""".stripMargin,
    // independent rebuild from exact gram STRINGS (the Spark side groups
    // on xxhash64 longs — the d13 posture: a divergence would surface as
    // a hash-gate failure); the rewrite is re-derived with window-free
    // list ops + an ordered string_agg
    "d19_boilerplate_strip" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS ts
        |  FROM documents),
        |seg AS (
        |  SELECT doc_id, ts, unnest(generate_series(0, len(ts)//8 - 1)) AS i
        |  FROM tok WHERE len(ts) >= 8),
        |g AS (SELECT doc_id, i,
        |    list_aggregate(ts[i*8+1:i*8+8], 'string_agg', ' ') AS gram FROM seg),
        |fr AS (SELECT gram FROM (
        |    SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY gram)
        |  WHERE nd >= 3),
        |dr AS (SELECT doc_id, i FROM g JOIN fr USING (gram)),
        |keep AS (
        |  SELECT g.doc_id, g.i, g.gram FROM g
        |  LEFT JOIN dr ON g.doc_id = dr.doc_id AND g.i = dr.i
        |  WHERE dr.doc_id IS NULL),
        |body AS (
        |  SELECT doc_id, string_agg(gram, ' ' ORDER BY i) AS kept,
        |    count(*)::BIGINT AS n_kept
        |  FROM keep GROUP BY doc_id),
        |base AS (
        |  SELECT doc_id, len(ts)//8 AS n_seg, len(ts) - (len(ts)//8)*8 AS tail_n,
        |    array_to_string(ts[(len(ts)//8)*8+1:], ' ') AS tail
        |  FROM tok)
        |SELECT b.doc_id,
        |  b.n_seg::BIGINT AS n_seg,
        |  (b.n_seg - coalesce(o.n_kept, 0))::BIGINT AS n_drop,
        |  (coalesce(o.n_kept, 0)*8 + b.tail_n)::BIGINT AS clean_n,
        |  concat_ws(' ', nullif(o.kept, ''), nullif(b.tail, '')) AS clean_text
        |FROM base b LEFT JOIN body o USING (doc_id)""".stripMargin,
    // provenance attribution replicated over the same band + sketch
    // dumps d04 uses; sources come from the documents table itself
    "d20_dedup_pressure" ->
      s"""WITH $candSql,
         |$jacSql,
         |src AS (SELECT doc_id, source FROM documents),
         |p AS (
         |  SELECT least(x.source, y.source) AS sa,
         |    greatest(x.source, y.source) AS sb, j.a, j.b
         |  FROM jac j
         |  JOIN src x ON x.doc_id = j.a
         |  JOIN src y ON y.doc_id = j.b
         |  WHERE j.jac_est >= 0.5),
         |np AS (SELECT sa, sb, count(*)::BIGINT AS n_pairs FROM p GROUP BY sa, sb),
         |nd AS (SELECT sa, sb, count(DISTINCT docu)::BIGINT AS n_docs
         |  FROM (SELECT sa, sb, unnest([a, b]) AS docu FROM p) GROUP BY sa, sb)
         |SELECT sa, sb, n_pairs, n_docs FROM np JOIN nd USING (sa, sb)""".stripMargin,
    // the d06 recursive closure extended with the dilution statistics:
    // per-cluster member count, confirmed-edge count, edge density
    // (2E / n(n−1)) and the weakest confirmed link
    "d21_cluster_dilution" ->
      s"""WITH RECURSIVE $candSql,
         |$jacSql,
         |edges AS (SELECT a, b, jac_est FROM jac WHERE jac_est >= 0.5),
         |und AS (SELECT a AS u, b AS v FROM edges UNION SELECT b, a FROM edges),
         |reach(u, v) AS (
         |  SELECT u, v FROM und
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
         |comp AS (SELECT u AS doc_id, least(u, min(v)) AS cluster FROM reach GROUP BY u),
         |lab AS (
         |  SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster
         |  FROM documents d LEFT JOIN comp c USING (doc_id)),
         |mem AS (
         |  SELECT cluster, count(*)::BIGINT AS n_members FROM lab GROUP BY cluster
         |  HAVING count(*) >= 2),
         |ec AS (
         |  SELECT la.cluster, count(*)::BIGINT AS n_edges,
         |    min(e.jac_est) AS min_jac
         |  FROM edges e JOIN lab la ON la.doc_id = e.a GROUP BY la.cluster)
         |SELECT m.cluster, m.n_members, ec.n_edges,
         |  round(ec.n_edges * 2.0 / (m.n_members * (m.n_members - 1)), 6) AS density,
         |  ec.min_jac
         |FROM mem m JOIN ec USING (cluster)""".stripMargin,
    // the d06 recursive closure extended with the cluster-keyed split
    // rule — the oracle re-derives closure AND assignment, so a single
    // doc splitting away from its cluster fails the hash gate
    "d22_cluster_safe_split" ->
      s"""WITH RECURSIVE $candSql,
         |$jacSql,
         |edges AS (SELECT a, b FROM jac WHERE jac_est >= 0.5),
         |und AS (SELECT a AS u, b AS v FROM edges UNION SELECT b, a FROM edges),
         |reach(u, v) AS (
         |  SELECT u, v FROM und
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
         |comp AS (SELECT u AS doc_id, least(u, min(v)) AS cluster FROM reach GROUP BY u),
         |lab AS (
         |  SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster
         |  FROM documents d LEFT JOIN comp c USING (doc_id))
         |SELECT doc_id, cluster,
         |  CASE WHEN cluster % 10 = 0 THEN 'val'
         |       WHEN cluster % 10 = 1 THEN 'test'
         |       ELSE 'train' END AS split
         |FROM lab""".stripMargin,
    // BOTH closures re-derived from scratch: the full-corpus chain (the
    // d06 replica) AND the prefix chain — re-banding via a doc_id filter
    // on the band dump, re-capping bucket sizes on the FILTERED table
    // (bucket membership is corpus-dependent — the point of the audit),
    // re-confirming, re-closing transitively — then the split rule on
    // both cluster ids. A doc whose leak flag is wrong in either
    // direction fails the hash gate.
    "d23_split_stability" ->
      s"""WITH RECURSIVE $candSql,
         |$jacSql,
         |edges AS (SELECT a, b FROM jac WHERE jac_est >= 0.5),
         |und AS (SELECT a AS u, b AS v FROM edges UNION SELECT b, a FROM edges),
         |reach(u, v) AS (
         |  SELECT u, v FROM und
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
         |comp AS (SELECT u AS doc_id, least(u, min(v)) AS cluster FROM reach GROUP BY u),
         |lab AS (
         |  SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster
         |  FROM documents d LEFT JOIN comp c USING (doc_id)),
         |nq AS (SELECT (count(*) * 4) // 5 AS cut FROM documents),
         |bndp AS (SELECT id, bandKey FROM bnd, nq WHERE id < cut),
         |keepp AS (SELECT bandKey FROM bndp GROUP BY bandKey HAVING count(*) BETWEEN 2 AND 64),
         |candp AS (
         |  SELECT DISTINCT x.id AS a, y.id AS b
         |  FROM bndp x JOIN keepp USING (bandKey) JOIN bndp y USING (bandKey)
         |  WHERE x.id < y.id),
         |unip AS (
         |  SELECT c.a, c.b,
         |    unnest(list_distinct(list_concat(sa.mins, sb.mins))) AS m,
         |    sa.mins AS ma, sb.mins AS mb
         |  FROM candp c
         |  JOIN sk sa ON sa.doc_id = c.a
         |  JOIN sk sb ON sb.doc_id = c.b),
         |rkp AS (
         |  SELECT a, b, list_contains(ma, m) AND list_contains(mb, m) AS in_both,
         |    row_number() OVER (PARTITION BY a, b ORDER BY (m < 0), m) AS r
         |  FROM unip),
         |jacp AS (
         |  SELECT a, b,
         |    round(count(*) FILTER (WHERE in_both) * 1.0 / greatest(count(*), 1), 6) AS jac_est
         |  FROM rkp WHERE r <= 128 GROUP BY a, b),
         |edgesp AS (SELECT a, b FROM jacp WHERE jac_est >= 0.5),
         |undp AS (SELECT a AS u, b AS v FROM edgesp UNION SELECT b, a FROM edgesp),
         |reachp(u, v) AS (
         |  SELECT u, v FROM undp
         |  UNION
         |  SELECT r.u, e.v FROM reachp r JOIN undp e ON r.v = e.u),
         |compp AS (SELECT u AS doc_id, least(u, min(v)) AS cluster FROM reachp GROUP BY u),
         |labp AS (
         |  SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster
         |  FROM (SELECT doc_id FROM documents, nq WHERE doc_id < cut) d
         |  LEFT JOIN compp c USING (doc_id)),
         |paired AS (
         |  SELECT p.doc_id, p.cluster AS cluster_pre, f.cluster AS cluster_full,
         |    CASE WHEN p.cluster % 10 = 0 THEN 'val'
         |         WHEN p.cluster % 10 = 1 THEN 'test'
         |         ELSE 'train' END AS split_pre,
         |    CASE WHEN f.cluster % 10 = 0 THEN 'val'
         |         WHEN f.cluster % 10 = 1 THEN 'test'
         |         ELSE 'train' END AS split_full
         |  FROM labp p JOIN lab f USING (doc_id))
         |SELECT doc_id, cluster_pre, cluster_full, split_pre, split_full,
         |  (split_pre <> split_full) AS leaked
         |FROM paired""".stripMargin)

  /** d17's output is provably d16's (bloom = prefilter only: no false
    * negatives; false positives die in the exact join) — same oracle. */
  private val deconBloomOracle: Map[String, String] =
    Map("d17_decontaminate_bloom" -> docDedupOracles("d16_decontaminate"))

  // ================================================================ t04: winnowing fingerprints
  //
  // The murmur shingle hashes are dumped; the oracle replicates the
  // winnowing itself (window-min with rightmost tie-break + consecutive-
  // pick dedup, Schleimer et al.) with SQL window functions — an
  // independent implementation of the selection logic.

  /** Murmur shingle stream (k=5, seed 42) over every document — dumped so
    * the t04 winnowing and d09 scaled-cutoff oracles can replicate their
    * selection logic independently from the same kernel output. */
  private def docShingles(s: SparkSession, d: String): DataFrame =
    // stays 32-wide: bounding to one file was tried and measured SLOWER
    // (+0.4 s) — the single-task parquet encode of the ~2.5M-row shingle
    // stream costs more than the 32 small write commits it saves
    dumpDerived(s, d, "t04_shingles") {
      val sh = udf((text: String) => Shingles.charShingleHashes(text, 5, 42L))
      spread(s, t(s, d, "documents"))
        .select(col("doc_id"), posexplode_outer(sh(col("text"))).as(Seq("pos", "h")))
    }

  private val fingerprints: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t04_winnow_fingerprint" -> { (s, d) =>
      // dump the murmur shingle stream — the oracle winnows it independently
      docShingles(s, d)
      val fp = udf((text: String) =>
        Shingles.winnow(Shingles.charShingleHashes(text, 5, 42L), 8))
      // spread stays here: the winnow UDF re-hashes every 5-gram per row
      // (same murmur work as the shingle kernel), so a single-task scan
      // serializes it (measured +0.5 s without spread)
      spread(s, t(s, d, "documents"))
        .withColumn("fps", fp(col("text")))
        .select(col("doc_id"), size(col("fps")).as("n_fps"),
          // unsigned-decimal rendering of the first fingerprint
          udf((a: Seq[Long]) => if (a.isEmpty) "" else java.lang.Long.toUnsignedString(a.head))
            .apply(col("fps")).as("first_fp"))
    },
    // the suffix-array kernel as a driver-gated query: exact longest
    // common substring over the LSH candidate pairs. 120-char prefixes
    // keep the oracle's substring-set replication quadratic in 120, not
    // in document length; the pair set is the d03 dump (itself
    // oracle-verified)
    "t05_substring_pairs" -> { (s, d) =>
      // docCandidates is itself a dumpDerived("doc_candidates") — the
      // oracle reads that dump directly; no second byte-identical copy
      val pairs = docCandidates(s, d)
      val docs = t(s, d, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 120).as("tp"))
      pairs
        .join(docs.select(col("doc_id").as("a"), col("tp").as("ta")), "a")
        .join(docs.select(col("doc_id").as("b"), col("tp").as("tb")), "b")
        .select(col("a"), col("b"),
          GraftFunctions.captionLcs(col("ta"), col("tb")).cast("long").as("lcs_len"))
        .withColumn("substr_hit", col("lcs_len") >= 20)
    })

  private val fingerprintOracles: Map[String, String] = Map(
    // winnow(w=8): per window start, pick the rightmost-tie minimum (by
    // unsigned value); dedup consecutive picks by position; short streams
    // (< 8 hashes) yield their single global min. Encoded as one HUGEINT
    // key = u * 2^20 + (2^20-1-pos) so min(key) = (min u, max pos).
    "t04_winnow_fingerprint" ->
      s"""WITH h AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN h < 0 THEN h::HUGEINT + 18446744073709551616
         |         ELSE h::HUGEINT END AS u
         |  FROM read_parquet(${oraclePath("t04_shingles")})
         |  WHERE pos IS NOT NULL),
         |k AS (SELECT doc_id, pos, u, u * 1048576 + (1048575 - pos) AS key FROM h),
         |len AS (SELECT doc_id, count(*) AS n FROM h GROUP BY doc_id),
         |win AS (
         |  SELECT doc_id, pos,
         |    min(key) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS mkey,
         |    count(*) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wn
         |  FROM k),
         |picks AS (
         |  SELECT doc_id, pos, 1048575 - (mkey % 1048576) AS pick_pos,
         |    mkey // 1048576 AS pick_u,
         |    lag(1048575 - (mkey % 1048576)) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_pos
         |  FROM win WHERE wn = 8),
         |dedup AS (
         |  SELECT doc_id, pos, pick_pos, pick_u FROM picks
         |  WHERE prev_pos IS NULL OR pick_pos <> prev_pos),
         |long_docs AS (
         |  SELECT dedup.doc_id, count(*) AS n_fps,
         |    arg_min(pick_u, pos)::VARCHAR AS first_fp
         |  FROM dedup JOIN len USING (doc_id)
         |  WHERE len.n > 8 GROUP BY dedup.doc_id),
         |short_docs AS (
         |  SELECT h.doc_id, 1 AS n_fps, min(u)::VARCHAR AS first_fp
         |  FROM h JOIN len USING (doc_id) WHERE len.n <= 8 GROUP BY h.doc_id),
         |fp AS (SELECT * FROM long_docs UNION ALL SELECT * FROM short_docs)
         |SELECT d.doc_id, coalesce(fp.n_fps, 0) AS n_fps,
         |  coalesce(fp.first_fp, '') AS first_fp
         |FROM documents d LEFT JOIN fp USING (doc_id)""".stripMargin,
    // exact LCS re-derived independently: a common substring of length L
    // exists iff the DISTINCT substring sets of the two prefixes
    // intersect at length L — max(length) over the set intersection IS
    // the longest common substring. The engine's suffix array is never
    // consulted.
    "t05_substring_pairs" ->
      s"""WITH cand AS (SELECT a, b FROM read_parquet(${oraclePath("doc_candidates")})),
        |docs AS (SELECT doc_id, substring(text, 1, 120) AS tp FROM documents),
        |pa AS (SELECT c.a, c.b, da.tp AS ta, db.tp AS tb
        |       FROM cand c JOIN docs da ON da.doc_id = c.a
        |       JOIN docs db ON db.doc_id = c.b),
        |ia AS (SELECT a, b, ta, unnest(range(1, length(ta)+1))::INT AS i FROM pa),
        |sa AS (SELECT DISTINCT a, b, substring(ta, i, l) AS s
        |       FROM (SELECT a, b, ta, i,
        |             unnest(range(1, length(ta)-i+2))::INT AS l FROM ia)),
        |ib AS (SELECT a, b, tb, unnest(range(1, length(tb)+1))::INT AS i FROM pa),
        |sb AS (SELECT DISTINCT a, b, substring(tb, i, l) AS s
        |       FROM (SELECT a, b, tb, i,
        |             unnest(range(1, length(tb)-i+2))::INT AS l FROM ib)),
        |shared AS (SELECT sa.a, sa.b, max(length(sa.s)) AS lcs
        |           FROM sa JOIN sb ON sa.a = sb.a AND sa.b = sb.b AND sa.s = sb.s
        |           GROUP BY 1, 2)
        |SELECT c.a, c.b, COALESCE(sh.lcs, 0) AS lcs_len,
        |       COALESCE(sh.lcs, 0) >= 20 AS substr_hit
        |FROM cand c LEFT JOIN shared sh ON sh.a = c.a AND sh.b = c.b""".stripMargin)

  // ================================================================ e: embedding similarity

  private val embeddings: Map[String, (SparkSession, String) => DataFrame] = Map(
    // brute-force cosine top-k (exactness baseline)
    "e01_knn_bruteforce" -> { (s, d) => bruteTopK(s, d) },
    // embedding near-dup pairs, brute force
    "e02_embedding_pairs" -> { (s, d) =>
      // spread: same single-task-crossJoin disease as e01 (see bruteTopK)
      Similarity.bruteForcePairs(spread(s, t(s, d, "embeddings")),
        "vec_id", "embedding", minCos = 0.45)
    },
    // the scale path: random-hyperplane LSH buckets (multi-probe,
    // data-adaptive key width) + exact confirm. nRows comes from the
    // memoized table-statistics stand-in (one footer-cheap count per
    // table per JVM) so lshPairs never re-scans to size the key width.
    "e03_embedding_lsh_pairs" -> { (s, d) => embPairs(s, d) },
    // the cell-partitioned ANN variant: IVF with a Lloyd-trained coarse
    // quantizer (deterministic sample init), nProbe-cell search, exact
    // in-cell rerank. The trained codebook is dumped; the oracle
    // re-derives assignment, probing, and rerank from the raw table +
    // that codebook
    "e04_ivf_topk" -> { (s, d) => ivfTopK(s, d) },
    // ANN RECALL AUDIT — the evaluation harness a production ANN tier
    // runs before trusting an index: per-query-point recall@5 of the IVF
    // search (e04, read from its shared dump) against an independently
    // recomputed brute-force ground truth. The oracle re-derives the
    // brute-force side from the raw table (e04's own oracle already
    // re-derives the IVF side from the dumped codebook), so the recall
    // arithmetic is checked against ground truth, not against the thing
    // under audit. Exhaustive ground truth is confined to the audit —
    // at 10^9 rows a production tier samples query points; here the
    // table IS the sample.
    "e06_ann_recall" -> { (s, d) =>
      val bf = bruteTopK(s, d) // shared dump with e01 — the O(n²) pass runs once
      val iv = ivfTopK(s, d) // shared dump: computed once per (sfDir, JVM)
      bf.as("bf").join(iv.as("iv"),
          col("bf.vec_id") === col("iv.vec_id") &&
            col("bf.neighbor") === col("iv.neighbor"), "left")
        .groupBy(col("bf.vec_id").as("vec_id"))
        .agg(count(col("iv.neighbor")).as("n_hits"))
        .withColumn("recall_at_5", round(col("n_hits") / lit(5.0), 6))
    },
    // embedding-cosine near-DUP CLUSTERING — the dedup form of e02/e03
    // (pairs are evidence; dedup needs a partition of the table). Edges
    // come from the SCALE path (hyperplane LSH + exact confirm, the same
    // operator e03 gates at recall 1.0 against the brute-force oracle);
    // the cluster tail is the shared large-star/small-star CC. At 100 TB
    // this is the shape that runs: no all-pairs anywhere, one bucket
    // shuffle for candidates, min-label components.
    "e05_embedding_dedup" -> { (s, d) =>
      val edges = embPairs(s, d).select(col("a").as("src"), col("b").as("dst"))
      val nodes = t(s, d, "embeddings").select(col("vec_id").as("id"))
      ConnectedComponents.labelAll(nodes, edges)
        .select(col("id").as("vec_id"), col("component").as("cluster"))
    },
    // SEMANTIC dedup (SemDeDup) — the third embedding-dedup shape next to
    // e02/e03's pair evidence and e05's transitive clusters: partition by
    // the k-means cells e04 already trains, prune within each cell, keep
    // the member farthest from its centroid (boundary diversity survives,
    // the redundant cluster core is dropped). Semantics, determinism, and
    // the per-cell (never all-pairs) cost bound are documented on
    // [[Similarity.semanticDedup]]. The oracle re-derives home cells,
    // centroid-cos ranking, and the earlier-neighbor dominance rule from
    // the dumped codebook + the raw table.
    "e07_semantic_dedup" -> { (s, d) =>
      val (codebook, assign) = ivfModel(s, d)
      Similarity.semanticDedup(t(s, d, "embeddings"), "vec_id", "embedding",
          codebook, assign, minCos = 0.4)
        .select(col("id").as("vec_id"), col("cell"), col("ccos"),
          col("rk"), col("keep"))
    },
    // IVF-PQ with asymmetric distance (ADC) — the third ANN shape next to
    // e03's hyperplane LSH and e04's flat IVF, and the one that actually
    // runs at 10⁹ rows: the search side holds m-BYTE CODES (here m=8, a
    // 32× payload compression at dim 64/f32), never candidate vectors.
    // Candidates reuse e04's materialized cell assignment (the Lloyd
    // rounds + assignment flops run once per sweep across e04/e06/e07/
    // e08); the per-subspace codebooks are dumped and the oracle
    // re-derives ENCODING, ADC, and ranking from that dump + the raw
    // table — the engine's quantizer is never consulted. e06's audit
    // pattern (recall vs exact ground truth) is applied to PQ in the
    // spec, where the quantization error is measured, not assumed.
    "e08_pq_adc_topk" -> { (s, d) =>
      val (_, assign) = ivfModel(s, d)
      val (cbLit, codes) = pqModel(s, d)
      Similarity.ivfPqTopK(normalizedEmb(s, d), "vec_id", "embedding",
        assign, codes, cbLit, m = pqM, ks = pqKs, subDim = pqSubDim, k = 5)
    },
    // TWO-STAGE RETRIEVAL: ADC shortlist → EXACT RE-RANK — the production
    // ANN shape (FAISS's refine step): the PQ index returns a cheap
    // approximate top-20 shortlist from 8-byte codes, then ONLY those
    // 20·n candidate rows join back to the full vectors for an exact
    // cosine, and the final top-5 is ranked on the exact score. This
    // completes the retrieval ladder (brute → LSH → IVF → IVF-PQ →
    // PQ+rerank) with its memory/compute contract: the full vectors are
    // touched O(shortlist), never O(candidates), and quantization error
    // affects RECALL of the shortlist only, never the final ordering —
    // if the true neighbor survives the shortlist, exact re-ranking puts
    // it first (the spec measures exactly this against brute-force
    // ground truth). Both the approximate (adc) and exact (cos) scores
    // are emitted so the quantization gap stays observable per pair.
    "e09_pq_rerank_topk" -> { (s, d) =>
      val (_, assign) = ivfModel(s, d)
      val (cbLit, codes) = pqModel(s, d)
      val v = normalizedEmb(s, d)
      val shortlist = Similarity.ivfPqTopK(v, "vec_id", "embedding",
        assign, codes, cbLit, m = pqM, ks = pqKs, subDim = pqSubDim, k = 20)
      val qv = v.select(col("vec_id"), col("embedding").as("qe"))
      val nv = v.select(col("vec_id").as("neighbor"), col("embedding").as("ne"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos").desc, col("neighbor"))
      shortlist.join(nv, "neighbor").join(qv, "vec_id")
        .withColumn("cos", round(Similarity.dot(col("qe"), col("ne")), 6))
        .withColumn("rrk", row_number().over(w))
        .where(col("rrk") <= 5)
        .select(col("vec_id"), col("neighbor"), col("adc"),
          col("cos"), col("rrk"))
    })

  /** PQ geometry for the 64-dim embeddings table: the standard PQ8×8 —
    * 8 subspaces × 8 dims, 256 centroids each (8 bits/subspace = m bytes
    * per vector). A coarser ks=16 probe measurably failed here: with
    * 0.5 bits/dim the reconstruction error flattens every ADC toward
    * ‖q‖² ≈ 1 and planted near-dups drown in quantization noise (5/7
    * pair recall); at 8 bits/subspace the spec's recall gate holds. */
  private val pqM = 8
  private val pqKs = 256
  private val pqSubDim = 8

  /** L2-normalized embeddings: PQ quantizes in L2, but the dedup tier's
    * ground truth is COSINE — over unit vectors ‖q−x‖² = 2 − 2·cos(q,x),
    * so the ADC ranking becomes monotone in cosine and the e04/e02 gates
    * apply apples-to-apples (the standard cosine-metric PQ posture).
    * Zero vectors pass through unnormalized. */
  private def normalizedEmb(s: SparkSession, d: String): DataFrame = {
    val e0 = transform(col("embedding"), x => x.cast("double"))
    spread(s, t(s, d, "embeddings"))
      .select(col("vec_id"), e0.as("e0"),
        sqrt(Similarity.dot(e0, e0)).as("nrm"))
      .select(col("vec_id"),
        when(col("nrm") === 0.0, col("e0"))
          .otherwise(transform(col("e0"), x => x / col("nrm"))).as("embedding"))
  }

  /** The trained PQ model over the NORMALIZED table: per-subspace
    * codebooks (dumped — the e08 oracle's sole model input) + the encoded
    * corpus (dumped — the persisted compressed inverted file; encode runs
    * once per (sfDir, JVM), not per consumer). */
  private def pqModel(s: SparkSession, d: String): (Column, DataFrame) = {
    val codebook = dumpDerived(s, d, "e08_pq_codebook")(
      Similarity.pqTrain(normalizedEmb(s, d), "vec_id", "embedding",
        m = pqM, ks = pqKs, subDim = pqSubDim))
    val cbLit = Similarity.pqCodebookLiteral(codebook, pqM, pqKs, pqSubDim)
    val codes = dumpDerived(s, d, "e08_codes", files = 1)(
      normalizedEmb(s, d).select(col("vec_id").as("id"),
        Similarity.pqEncodeCol(col("embedding"), cbLit, pqM, pqKs, pqSubDim).as("codes")))
    (cbLit, codes)
  }

  /** The e04 IVF top-k pipeline, final result dumped once per (sfDir,
    * JVM) — e04 returns it and e06 audits it against brute force.
    *
    * Cell count scales with the table (≈ n/16 rows per cell, like
    * FAISS's nlist sizing); the 8-cell probe is then a fixed scan
    * fraction (~n/4). Tiny tables degenerate toward brute force —
    * correct: IVF only pays past ~10³ rows per cell budget. Row count
    * comes from the memoized table-statistics stand-in. Lloyd rounds
    * carry a fixed per-round job latency that dominates at toy scale;
    * the round-4 sweep showed the assignment fixpoint is reached by
    * round 3 on tables this small (the 1e-12 early stop in ivfTrain
    * fires there), so below 10^4 rows the cap is 3. The oracle is
    * round-count-agnostic: it replicates the search from whatever
    * codebook was dumped. Bounded tables train DRIVER-LOCAL (one
    * collect job, zero per-round latency — the FAISS sample-in-memory
    * posture); the table-statistics row count is what proves
    * boundedness. A 10⁹-row table instead sets trainSampleMod to make
    * the sample bounded. The inverted file is MATERIALIZED (parquet)
    * before search — the assignment flop pass runs once, not once per
    * search-side consumer. */
  /** Brute-force cosine top-k (quadratic BY DESIGN — the exactness
    * baseline), dumped once per (sfDir, JVM): e01 returns it and the e06
    * recall audit reads it as ground truth, so the O(n²) pass runs once
    * per sweep instead of twice. The e01 oracle still re-derives it from
    * the raw table. */
  private def bruteTopK(s: SparkSession, d: String): DataFrame =
    dumpDerived(s, d, "e01_topk", files = 1)(
      // spread: the quadratic pair kernel inherits the left side's
      // partitioning — a single-file scan would run all n² dots in ONE
      // task (measured 4.9 s of 5.3 at sf0.1); widened it fans across
      // the session (guide §2.5)
      Similarity.bruteForceTopK(spread(s, t(s, d, "embeddings")),
        "vec_id", "embedding", k = 5))

  /** The trained IVF (codebook, home/probe assignment), each dumped once
    * per (sfDir, JVM) — shared by e04's search, e06's audit, and e07's
    * semantic-dedup prune so the Lloyd rounds and the assignment flop
    * pass run once per sweep however many consumers read them. */
  private def ivfModel(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    // spread: the n×nCells assignment flop pass inherits the scan's
    // single partition otherwise (train collects — unaffected)
    val emb = spread(s, t(s, d, "embeddings"))
    val nRows = tableRows(s, d, "embeddings")
    val nCells = math.max(4, math.min(32, (nRows / 16).toInt))
    val lloydIters = if (nRows < 10000L) 3 else 5
    val codebook = dumpDerived(s, d, "e04_centroids")(
      Similarity.ivfTrain(emb, "vec_id", "embedding", nCells = nCells,
        dim = 64, iters = lloydIters, collectTrain = nRows <= 100000L))
    val assign = dumpDerived(s, d, "e04_assign")(
      Similarity.ivfAssign(emb, "vec_id", "embedding", codebook,
        nProbe = math.min(8, nCells)))
    (codebook, assign)
  }

  private[graft] def ivfTopK(s: SparkSession, d: String,
      dumpResult: Boolean = true): DataFrame = {
    val emb = t(s, d, "embeddings")
    val (_, assign) = ivfModel(s, d)
    val search = Similarity.ivfSearch(emb, "vec_id", "embedding", assign, k = 5)
    // dumpResult=false returns the live search plan (spec plan probes);
    // the registered query dumps so e04 and the e06 audit share one run
    if (dumpResult) dumpDerived(s, d, "e04_topk", files = 1)(search) else search
  }

  /** Hyperplane-LSH near-dup pairs over the embeddings table, dumped once
    * per (sfDir, JVM): e03 returns the pair set and e05 clusters it (the
    * full band/bucket/cosine-confirm pass previously ran twice).
    *
    * The dump materializes under a lowered AQE
    * `coalescePartitions.minPartitionSize`: the bucket pair-expansion and
    * cosine-confirm stages amplify CPU per shuffle BYTE by orders of
    * magnitude (8-byte keys in, vector dot products out), so the default
    * byte-based floor (1m) coalesces their ~1-9 MB shuffle reads to 1-8
    * tasks and serializes the kernel (measured: 2.8 s single-task pair
    * gen + 7 s/8-task confirm at sf0.1; -1.0 s wall with 64k). The knob
    * is inert at production scale by construction: AQE's target is
    * max(totalBytes/parallelism, minPartitionSize), so it only bites
    * when a shuffle is smaller than cores × 1 MB. */
  private def embPairs(s: SparkSession, d: String): DataFrame =
    withConf(s, "spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k") {
      dumpDerived(s, d, "emb_pairs", files = 1) {
        // spread: the hyperplane-key kernel + band explode would otherwise
        // run inside the single scan task (guide §2.5)
        Similarity.lshPairs(spread(s, t(s, d, "embeddings")), "vec_id", "embedding",
          minCos = 0.45, dim = 64, nRows = tableRows(s, d, "embeddings"))
      }
    }

  /** Shared IVF-PQ derivation CTEs for the e08/e09 oracles: normalized
    * vectors, IVF cell assignment from the dumped centroids, PQ encode
    * from the dumped codebooks, candidate generation (8-probe), ADC, and
    * the `rr` rank over it. ONE copy — a future change to the search
    * derivation cannot drift between the ADC query and its re-rank
    * extension. Use right after `WITH`; consumers read `rr`
    * (vec_id, neighbor, adc, rk) and `v` (vec_id, normalized e). */
  private def pqAdcCtes: String =
    s"""vr AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |v AS (SELECT vec_id, CASE WHEN list_dot_product(e, e) = 0 THEN e
       |        ELSE list_transform(e, x -> x / sqrt(list_dot_product(e, e)))
       |      END AS e FROM vr),
       |ivf AS (SELECT cell, cv::DOUBLE[] AS ce
       |        FROM read_parquet(${oraclePath("e04_centroids")})),
       |pq AS (SELECT m, code, cv::DOUBLE[] AS c
       |       FROM read_parquet(${oraclePath("e08_pq_codebook")})),
       |cscored AS (
       |  SELECT vr.vec_id AS id, ivf.cell,
       |    round(list_dot_product(vr.e, ivf.ce) /
       |      sqrt(list_dot_product(vr.e, vr.e) * list_dot_product(ivf.ce, ivf.ce)), 6) AS csim
       |  FROM vr CROSS JOIN ivf),
       |cranked AS (
       |  SELECT id, cell,
       |    row_number() OVER (PARTITION BY id ORDER BY csim DESC, cell) AS crk
       |  FROM cscored),
       |sq AS (
       |  SELECT v.vec_id, pq.m, pq.code,
       |    list_sum(list_transform(range(1, 9),
       |      i -> (v.e[pq.m * 8 + i] - pq.c[i]) * (v.e[pq.m * 8 + i] - pq.c[i]))) AS d2
       |  FROM v CROSS JOIN pq),
       |codes AS (
       |  SELECT vec_id, m, code FROM (
       |    SELECT vec_id, m, code,
       |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, code) AS r
       |    FROM sq) WHERE r = 1),
       |members AS (SELECT cell, id AS neighbor FROM cranked WHERE crk = 1),
       |probes AS (SELECT id AS vec_id, cell FROM cranked WHERE crk <= 8),
       |cand AS (
       |  SELECT p.vec_id, mb.neighbor
       |  FROM probes p JOIN members mb ON p.cell = mb.cell AND p.vec_id <> mb.neighbor),
       |parts AS (
       |  SELECT cd.vec_id, cd.neighbor, pq.m,
       |    list_sum(list_transform(range(1, 9),
       |      i -> (qv.e[pq.m * 8 + i] - pq.c[i]) * (qv.e[pq.m * 8 + i] - pq.c[i]))) AS d2
       |  FROM cand cd
       |  JOIN v qv ON qv.vec_id = cd.vec_id
       |  JOIN codes k ON k.vec_id = cd.neighbor
       |  JOIN pq ON pq.m = k.m AND pq.code = k.code),
       |scoredq AS (
       |  SELECT vec_id, neighbor, round(sum(d2), 6) AS adc
       |  FROM parts GROUP BY vec_id, neighbor),
       |rr AS (
       |  SELECT vec_id, neighbor, adc,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY adc, neighbor) AS rk
       |  FROM scoredq)""".stripMargin

  private val embeddingOracles: Map[String, String] = Map(
    "e01_knn_bruteforce" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |pairs AS (
        |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor,
        |    round(list_dot_product(a.e, b.e) /
        |      sqrt(list_dot_product(a.e, a.e) * list_dot_product(b.e, b.e)), 6) AS cos
        |  FROM v a JOIN v b ON a.vec_id <> b.vec_id),
        |ranked AS (
        |  SELECT vec_id, neighbor, cos,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor) AS rk
        |  FROM pairs)
        |SELECT vec_id, neighbor, cos, rk FROM ranked WHERE rk <= 5""".stripMargin,
    "e02_embedding_pairs" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
        |SELECT a.vec_id AS a, b.vec_id AS b,
        |  round(list_dot_product(a.e, b.e) /
        |    sqrt(list_dot_product(a.e, a.e) * list_dot_product(b.e, b.e)), 6) AS cos
        |FROM v a JOIN v b ON a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.e, b.e) /
        |  sqrt(list_dot_product(a.e, a.e) * list_dot_product(b.e, b.e)), 6) >= 0.45""".stripMargin,
    // e03's gate is the SAME exact-pair set as the brute-force oracle:
    // the multi-probe LSH path must reach recall 1.0 at validation scale
    // (any missed pair fails the row-count/hash compare)
    "e03_embedding_lsh_pairs" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
        |SELECT a.vec_id AS a, b.vec_id AS b,
        |  round(list_dot_product(a.e, b.e) /
        |    sqrt(list_dot_product(a.e, a.e) * list_dot_product(b.e, b.e)), 6) AS cos
        |FROM v a JOIN v b ON a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.e, b.e) /
        |  sqrt(list_dot_product(a.e, a.e) * list_dot_product(b.e, b.e)), 6) >= 0.45""".stripMargin,
    // full IVF replica from the raw table + the dumped trained codebook:
    // nearest-centroid assignment (crk=1 = home cell), 8-cell probing
    // (mirrors the engine's nProbe = min(8, nCells); nCells > 8 at the
    // sf0.01 gate scale), exact rerank within probed cells, top-5
    "e04_ivf_topk" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |cv AS (SELECT cell, cv::DOUBLE[] AS ce
        |       FROM read_parquet(${oraclePath("e04_centroids")})),
        |scored AS (
        |  SELECT v.vec_id AS id, cv.cell,
        |    round(list_dot_product(v.e, cv.ce) /
        |      sqrt(list_dot_product(v.e, v.e) * list_dot_product(cv.ce, cv.ce)), 6) AS csim
        |  FROM v CROSS JOIN cv),
        |ranked AS (
        |  SELECT id, cell,
        |    row_number() OVER (PARTITION BY id ORDER BY csim DESC, cell) AS crk
        |  FROM scored),
        |members AS (SELECT cell, id AS neighbor FROM ranked WHERE crk = 1),
        |probes AS (SELECT id AS vec_id, cell FROM ranked WHERE crk <= 8),
        |cand AS (
        |  SELECT p.vec_id, m.neighbor,
        |    round(list_dot_product(a.e, b.e) /
        |      sqrt(list_dot_product(a.e, a.e) * list_dot_product(b.e, b.e)), 6) AS cos
        |  FROM probes p JOIN members m ON p.cell = m.cell AND p.vec_id <> m.neighbor
        |  JOIN v a ON a.vec_id = p.vec_id JOIN v b ON b.vec_id = m.neighbor),
        |rr AS (
        |  SELECT vec_id, neighbor, cos,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor) AS rk
        |  FROM cand)
        |SELECT vec_id, neighbor, cos, rk FROM rr WHERE rk <= 5""".stripMargin,
    // recall audit: the brute-force ground truth is RE-DERIVED from the
    // raw table (e01's derivation); only the audited IVF side reads the
    // dump (whose own oracle re-derives it from the dumped codebook)
    "e06_ann_recall" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |pairs AS (
        |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor,
        |    round(list_dot_product(a.e, b.e) /
        |      sqrt(list_dot_product(a.e, a.e) * list_dot_product(b.e, b.e)), 6) AS cos
        |  FROM v a JOIN v b ON a.vec_id <> b.vec_id),
        |ranked AS (
        |  SELECT vec_id, neighbor,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor) AS rk
        |  FROM pairs),
        |bf AS (SELECT vec_id, neighbor FROM ranked WHERE rk <= 5),
        |iv AS (SELECT vec_id, neighbor
        |       FROM read_parquet(${oraclePath("e04_topk")}))
        |SELECT bf.vec_id, count(iv.neighbor) AS n_hits,
        |  round(count(iv.neighbor) / 5.0, 6) AS recall_at_5
        |FROM bf LEFT JOIN iv
        |  ON iv.vec_id = bf.vec_id AND iv.neighbor = bf.neighbor
        |GROUP BY bf.vec_id""".stripMargin,
    // full SemDeDup replica from the raw table + the dumped codebook:
    // home-cell assignment exactly as e04's (round-6 csim, crk = 1), the
    // per-cell (centroid-cos asc, id) rank, and the earlier-neighbor
    // dominance drop rule — every engine-side decision re-derived
    "e07_semantic_dedup" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |cv AS (SELECT cell, cv::DOUBLE[] AS ce
        |       FROM read_parquet(${oraclePath("e04_centroids")})),
        |scored AS (
        |  SELECT v.vec_id AS id, cv.cell,
        |    round(list_dot_product(v.e, cv.ce) /
        |      sqrt(list_dot_product(v.e, v.e) * list_dot_product(cv.ce, cv.ce)), 6) AS csim
        |  FROM v CROSS JOIN cv),
        |homed AS (
        |  SELECT id, cell, csim,
        |    row_number() OVER (PARTITION BY id ORDER BY csim DESC, cell) AS crk
        |  FROM scored),
        |items AS (
        |  SELECT id, cell, csim AS ccos,
        |    row_number() OVER (PARTITION BY cell ORDER BY csim ASC, id) AS rk
        |  FROM homed WHERE crk = 1),
        |drops AS (
        |  SELECT DISTINCT a.id
        |  FROM items a JOIN items b ON a.cell = b.cell AND b.rk < a.rk
        |  JOIN v va ON va.vec_id = a.id JOIN v vb ON vb.vec_id = b.id
        |  WHERE round(list_dot_product(va.e, vb.e) /
        |    sqrt(list_dot_product(va.e, va.e) * list_dot_product(vb.e, vb.e)), 6) >= 0.4)
        |SELECT i.id AS vec_id, i.cell, i.ccos, i.rk,
        |  CASE WHEN d.id IS NULL THEN 1 ELSE 0 END AS keep
        |FROM items i LEFT JOIN drops d ON d.id = i.id""".stripMargin,
    // full IVF-PQ replica from the raw table + the two dumps: home/probe
    // cells exactly as e04's (dumped IVF codebook), PQ codes re-derived
    // per (vector, subspace) as the argmin of the squared L2 against the
    // dumped per-subspace codebook (ties to the lowest code — the
    // engine's strict-< rule), ADC = Σ over subspaces of the exact query
    // subvector against the candidate's quantized subvector, top-5 by
    // (round-6 adc asc, neighbor). The engine's quantizer/encoder is
    // never consulted — a wrong argmin, a transposed subspace, or a
    // ranking-order defect all fail the hash gate.
    "e08_pq_adc_topk" ->
      s"""WITH $pqAdcCtes
        |SELECT vec_id, neighbor, adc, rk FROM rr WHERE rk <= 5""".stripMargin,
    // the e08 derivation extended two stages: rk <= 20 shortlist, exact
    // cosine re-score over the normalized vectors, re-rank on the exact
    // score — a wrong shortlist, a wrong exact dot, or an unstable
    // re-rank all fail the hash gate
    "e09_pq_rerank_topk" ->
      s"""WITH $pqAdcCtes,
        |short AS (SELECT vec_id, neighbor, adc FROM rr WHERE rk <= 20),
        |rer AS (
        |  SELECT sh.vec_id, sh.neighbor, sh.adc,
        |    round(list_dot_product(qv.e, nv.e), 6) AS cos
        |  FROM short sh
        |  JOIN v qv ON qv.vec_id = sh.vec_id
        |  JOIN v nv ON nv.vec_id = sh.neighbor),
        |rr2 AS (
        |  SELECT vec_id, neighbor, adc, cos,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY cos DESC, neighbor) AS rrk
        |  FROM rer)
        |SELECT vec_id, neighbor, adc, cos, rrk FROM rr2 WHERE rrk <= 5""".stripMargin,
    // independent clustering replica: exact brute-force edge set (the
    // same gate e03 passes at recall 1.0) closed transitively, min-id
    // component labels, absent vectors as singletons — the d06 pattern
    // over the embedding modality
    "e05_embedding_dedup" ->
      """WITH RECURSIVE ve AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |edges AS (
        |  SELECT a.vec_id AS a, b.vec_id AS b
        |  FROM ve a JOIN ve b ON a.vec_id < b.vec_id
        |  WHERE round(list_dot_product(a.e, b.e) /
        |    sqrt(list_dot_product(a.e, a.e) * list_dot_product(b.e, b.e)), 6) >= 0.45),
        |und AS (SELECT a AS u, b AS w FROM edges UNION SELECT b, a FROM edges),
        |reach(u, w) AS (
        |  SELECT u, w FROM und
        |  UNION
        |  SELECT r.u, e.w FROM reach r JOIN und e ON r.w = e.u),
        |comp AS (SELECT u AS vec_id, least(u, min(w)) AS cluster FROM reach GROUP BY u)
        |SELECT em.vec_id, coalesce(c.cluster, em.vec_id) AS cluster
        |FROM embeddings em LEFT JOIN comp c USING (vec_id)""".stripMargin)

  // ================================================================ m: multimodal corpus

  import graft.operators.DedupPipeline
  import graft.sources.{AudioFingerprint, ImageCodec, SyntheticCorpus, SyntheticMedia, VideoContainer, WavCodec}

  /** Row count for the video/audio corpora — 5× smaller than the image
    * corpus (rows are ~20-30 KB vs ~3 KB). */
  def mediaRows(dir: String): Long = math.max(200L, corpusRows(dir) / 5)

  /** (image_id, cluster, cluster_size) — the flagship pipeline's cluster
    * labels, dumped once per (sfDir, JVM): m01 returns the table verbatim
    * and m11 keys its keep rule off it (the docClusterLabels sharing
    * pattern — the edge build + CC loop run once, not per consumer). The
    * edge set + id map are ALSO dumped so the oracle can replicate the
    * clustering tail (connected components + representative relabel)
    * independently via a recursive transitive closure. */
  private def m01Clusters(s: SparkSession, d: String): DataFrame =
    dumpDerived(s, d, "m01_clusters") {
      val corpus = SyntheticCorpus.corpus(s, corpusRows(d)).toDF()
      val cache = new graft.operators.CacheHandle()
      val (idmap0, edges0) = DedupPipeline.edges(corpus, cache = cache)
      val idmap = dumpDerived(s, d, "m01_idmap")(idmap0)
      val edges = dumpDerived(s, d, "m01_edges")(edges0)
      cache.release()
      DedupPipeline.clustersFromEdges(idmap, edges)
    }

  private val multimodal: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the flagship pipeline as a registered operator (north_rule; body
    // shared with m11 via [[m01Clusters]]).
    "m01_corpus_dedup_clusters" -> { (s, d) => m01Clusters(s, d) },
    // per-cluster CANONICAL KEEP on the image modality — d11's rule moved
    // onto the flagship's clusters, with the criterion an image tier
    // actually applies: keep the least-degraded copy (raw ppm, then
    // lossless png, then re-quantized ppmq, then lossy jpg), break ties
    // by the larger payload, then lowest image_id (total order — the
    // window pick is deterministic). Scale shape: the image BYTES never
    // move — the keep rule reads a 3-column metadata dump (id, fmt,
    // payload length) joined to the label table, then ONE window over
    // the cluster key; the canonical-drop itself is then an id-list
    // semi-join against the source table, never a byte shuffle.
    "m11_image_canonical_keep" -> { (s, d) =>
      val meta = dumpDerived(s, d, "m11_meta")(
        SyntheticCorpus.corpus(s, corpusRows(d)).toDF()
          .select(col("image_id"), col("fmt"),
            length(col("bytes")).cast("long").as("n_bytes")))
      val fmtRank = when(col("fmt") === "ppm", 0)
        .when(col("fmt") === "png", 1)
        .when(col("fmt") === "ppmq", 2)
        .otherwise(3)
      val pick = Window.partitionBy(col("cluster"))
        .orderBy(col("fmt_rank"), col("n_bytes").desc, col("image_id"))
      m01Clusters(s, d).join(meta, "image_id")
        .withColumn("fmt_rank", fmtRank)
        .withColumn("rk", row_number().over(pick))
        .where(col("rk") === 1)
        .select(col("cluster"), col("image_id").as("keep_id"),
          col("cluster_size").as("n_members"),
          col("fmt").as("keep_fmt"), col("n_bytes").as("keep_bytes"))
    },
    // CROSS-MODAL CONSISTENCY PROFILE — the label-noise report a
    // captioning/CLIP tier reads after dedup: per multi-member near-dup
    // cluster, how many DISTINCT captions and perceptual hashes its
    // members carry. n_captions = 1 means the cluster's caption is safe
    // to keep verbatim on the canonical copy; n_captions > 1 flags
    // caption drift inside visually-duplicate content (the caption/
    // capsub/capedit dup kinds by construction here; alt-text rewrites
    // in the wild) where a tier must PICK a canonical caption rather
    // than trust any one row. min/max caption length localizes the
    // truncation signature (capsub) vs the rewrite signature (capedit).
    // Scale shape: the labels are filtered to multi-member clusters
    // (duplicate-mass-sized, ~5% here) BEFORE the metadata join, so the
    // join and both aggregations run on dup-mass data; the metadata dump
    // carries (id, caption, phash) only — image bytes never shuffle
    // (the m11 discipline).
    "m12_caption_consistency" -> { (s, d) =>
      val caps = dumpDerived(s, d, "m12_caps")(
        SyntheticCorpus.corpus(s, corpusRows(d)).toDF()
          .select(col("image_id"), col("caption"), col("phash")))
      m01Clusters(s, d).where(col("cluster_size") >= 2)
        .join(caps, "image_id")
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_members"),
          countDistinct(col("caption")).as("n_captions"),
          countDistinct(col("phash")).as("n_phashes"),
          min(length(col("caption"))).as("min_cap_len"),
          max(length(col("caption"))).as("max_cap_len"))
        .withColumn("cap_consistent", col("n_captions") === 1)
    },
    // binary-column decode + feature extraction (multimodal plumbing;
    // decode for non-PPM formats is the clearly-marked stub fallback)
    "m02_image_decode_stats" -> { (s, d) =>
      val stats = udf((bytes: Array[Byte], fmt: String) =>
        ImageCodec.decode(bytes, fmt) match {
          case Some(dec) =>
            var sum = 0L
            var i = 0
            while (i < dec.rgb.length) { sum += (dec.rgb(i) & 0xff); i += 1 }
            (dec.w, dec.h, sum / dec.rgb.length)
          case None => (-1, -1, -1L) // stub path: undecodable format
        })
      SyntheticCorpus.corpus(s, corpusRows(d)).toDF()
        .withColumn("st", stats(col("bytes"), col("fmt")))
        .groupBy(col("fmt"))
        .agg(count(lit(1)).as("n"),
          min(col("st._3")).as("min_mean_px"),
          max(col("st._3")).as("max_mean_px"),
          countDistinct(col("phash")).as("n_phash"))
    },
    // multimodal RESIZE: decode → nearest-neighbor 8×8 grayscale
    // thumbnail (ImageCodec.thumbnail — integer BT.601 luma, platform-
    // deterministic) → per-format stats over the grids. The thumbnail is
    // the standard pre-embedding normalization step; like m02, the
    // per-row work is inherently JVM decode+resample (a UDF by nature),
    // and the oracle is the regression-frozen constant table
    // OracleDerivationSpec re-derives on every test run.
    "m04_thumbnail_stats" -> { (s, d) =>
      val thumb = udf((bytes: Array[Byte], fmt: String) =>
        ImageCodec.decode(bytes, fmt) match {
          case Some(dec) =>
            val g = ImageCodec.thumbnail(dec, 8)
            (g.sum.toLong / g.length, g.min.toLong, g.max.toLong,
              g.mkString(","))
          case None => (-1L, -1L, -1L, "") // stub path: undecodable format
        })
      SyntheticCorpus.corpus(s, corpusRows(d)).toDF()
        .withColumn("th", thumb(col("bytes"), col("fmt")))
        .groupBy(col("fmt"))
        .agg(count(lit(1)).as("n"),
          min(col("th._1")).as("min_mean_luma"),
          max(col("th._1")).as("max_mean_luma"),
          min(col("th._2")).as("min_luma"),
          max(col("th._3")).as("max_luma"),
          countDistinct(col("th._4")).as("n_grids"))
    },
    // multimodal FRAME-SAMPLE: k=4 uniform frames per clip via header
    // arithmetic on the seekable GVI1 container — per-row cost is
    // O(k·frameBytes) regardless of clip length (VideoContainer scaladoc
    // has the 100-TB byte-range argument). Per-clip work is inherently
    // JVM decode (a UDF by nature, like m02/m04); everything around it is
    // a narrow map + one partial-aggregated groupBy on a 3-value key.
    // Oracle: regression-frozen constants, re-derived by
    // OracleDerivationSpec on every test run.
    "m05_frame_sample" -> { (s, d) =>
      val k = 4
      val stats = udf((bytes: Array[Byte]) =>
        VideoContainer.header(bytes) match {
          case Some(hd) =>
            val means = VideoContainer.sampleIndices(hd.nframes, k).map { i =>
              val fr = VideoContainer.frame(bytes, hd, i)
              var sum = 0L; var j = 0
              while (j < fr.length) { sum += (fr(j) & 0xff); j += 1 }
              sum / fr.length
            }
            // clip fingerprint over the sampled trajectory: frame count +
            // the k means — the cheap pre-embedding dedup key for video
            val fp = graft.core.Murmur3.hash64(
              means.mkString(","), hd.nframes.toLong)
            (means.sum / means.length, means.min, means.max, fp)
          case None => (-1L, -1L, -1L, 0L) // undecodable container
        })
      SyntheticMedia.videos(s, mediaRows(d)).toDF()
        .withColumn("st", stats(col("bytes")))
        .groupBy(col("fps"))
        .agg(count(lit(1)).as("n"),
          min(col("st._1")).as("min_mean_luma"),
          max(col("st._1")).as("max_mean_luma"),
          countDistinct(col("st._4")).as("n_clip_fp"))
    },
    // multimodal AUDIO decode + feature extraction: real RIFF/WAVE chunk
    // walk (WavCodec — handles foreign chunks, returns None per-row on
    // non-PCM16 input so a corpus scan never fails per-job), then
    // RMS/peak/zero-crossing stats grouped by sample rate. Same frozen-
    // constant oracle discipline as m02/m04/m05.
    "m06_audio_stats" -> { (s, d) =>
      val stats = udf((bytes: Array[Byte]) =>
        WavCodec.decode(bytes) match {
          case Some(w) =>
            var sumSq = 0.0; var peak = 0L; var zc = 0L
            var i = 0
            var prevNeg = false
            while (i < w.samples.length) {
              val v = w.samples(i).toLong
              sumSq += v.toDouble * v
              if (math.abs(v) > peak) peak = math.abs(v)
              val neg = v < 0
              if (i > 0 && neg != prevNeg) zc += 1
              prevNeg = neg
              i += 1
            }
            (math.sqrt(sumSq / w.samples.length).toLong, peak, zc)
          case None => (-1L, -1L, -1L) // undecodable/non-PCM16 input
        })
      SyntheticMedia.audios(s, mediaRows(d)).toDF()
        .withColumn("st", stats(col("bytes")))
        .groupBy(col("sample_rate"))
        .agg(count(lit(1)).as("n"),
          min(col("st._1")).as("min_rms"),
          max(col("st._1")).as("max_rms"),
          max(col("st._2")).as("max_peak"),
          sum(col("st._3")).as("sum_zero_cross"))
    },
    // VIDEO near-dup pairs: the frame-sample primitive composed into a
    // dedup tier. Per clip: k=4 sampled-frame phashes (header arithmetic,
    // O(k) per row — the ONLY per-row kernel work) → the flagship's
    // radius-2 Manku joint keys (C(6,4)=15 ~44-bit keys: any frame pair
    // within Hamming 2 shares ≥ 1 key by pigeonhole — GUARANTEED
    // candidacy) over ONE bucket shuffle with the Lsh hot-bucket cap →
    // k×k min-Hamming confirm ≤ 2. Catches the injected trim/renoise/
    // refps republications (measured: dup pairs sit at Hamming ≤ 1; the
    // random background floor is 8 — QueriesSpec asserts recall 1.0 vs
    // ground truth AT TWO SCALES). Why joint keys and not single 8-bit
    // blocks: structured frame phashes cluster, so single-block buckets
    // blow the heat cap as the corpus grows — measured at 4000 clips,
    // 444 of 739 single-block buckets were hot and 197 of 400 true dup
    // pairs lost ALL candidacy (recall 0.51); the 44-bit joints read 0
    // hot buckets / max 12 / recall 1.0 at the same scale. Scale shape:
    // never all-pairs; candidates are bucket-local; the confirm joins a
    // k-row-per-clip table, not clip payloads. The oracle brute-forces
    // ALL clip-pair min-Hammings from the phash dump — equality
    // re-proves the banding recall guarantee on data (the m08/m09
    // oracle discipline).
    "m07_clip_neardup_pairs" -> { (s, d) =>
      val k = 4
      val phashes = udf((bytes: Array[Byte]) =>
        VideoContainer.header(bytes) match {
          case Some(hd) =>
            VideoContainer.sampleIndices(hd.nframes, k).zipWithIndex.map {
              case (fi, slot) =>
                val g = VideoContainer.frame(bytes, hd, fi)
                // gray → rgb triplicate: BT.601 luma of (g,g,g) is g, so
                // phash64's weighting is exact on grayscale frames
                val rgb = new Array[Byte](g.length * 3)
                var j = 0
                while (j < g.length) {
                  rgb(3 * j) = g(j); rgb(3 * j + 1) = g(j); rgb(3 * j + 2) = g(j)
                  j += 1
                }
                (slot, ImageCodec.phash64(rgb, hd.w, hd.h))
            }.toSeq
          case None => Seq.empty[(Int, Long)]
        })
      val ph = dumpDerived(s, d, "m07_frame_phash")(
        graft.sources.SyntheticMedia.videos(s, mediaRows(d)).toDF()
          .select(col("video_id"), explode(phashes(col("bytes"))).as("fp"))
          .select(col("video_id"), col("fp._1").as("slot"), col("fp._2").as("phash")))
      bandMinHamPairs(ph, "video_id", "phash",
        GraftFunctions.fingerprintBandsHamming2, sourceTag = 13, maxHam = 2)
    },
    // resumable pipeline: checkpoint/lineage table (north_rule); returns
    // the per-stage lineage metrics of a checkpointed flagship run
    "m03_checkpointed_lineage" -> { (s, d) =>
      val root = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
      val n = math.min(corpusRows(d), 2000L)
      val corpus = SyntheticCorpus.corpus(s, n).toDF()
      val fp = graft.operators.Lineage.fingerprint("synthetic", n.toString, "42")
      graft.operators.Lineage.checkpointedClusters(
        s, corpus, graft.operators.DedupConfig(), root, fp).count()
      // stage names + row counts are deterministic for the fixed corpus;
      // n_partitions depends on the session's parallelism — excluded
      new graft.operators.Lineage(s, root).lineage()
        .select(col("stage"), col("rows_out"))
    },
    // IMAGE-side decontamination — d16's twin for the image modality:
    // flag training images whose phash sits within Hamming ≤ 2 of any
    // image in a held-out eval slice (~2%, deterministic id-hash split).
    // Never all-pairs: both sides key on the flagship's radius-2 Manku
    // joints (C(6,4)=15 four-block ~44-bit keys — ANY ham ≤ 2 pair
    // shares ≥ 1 key by pigeonhole, so candidate recall is GUARANTEED,
    // not probabilistic), the eval key table broadcasts (15 keys × the
    // eval slice), and the Hamming confirm runs before the pair-dedup
    // shuffle so only true matches pay an exchange. The oracle
    // brute-forces ALL eval×train Hamming pairs from the dumped phashes
    // in SQL — i.e. it independently re-proves the pigeonhole recall
    // guarantee on real data, not just the banded path's own output.
    "m08_image_decontaminate" -> { (s, d) =>
      val ph = dumpDerived(s, d, "m08_phashes")(
        SyntheticCorpus.corpus(s, corpusRows(d)).toDF()
          .select(col("image_id"), col("phash"),
            (pmod(xxhash64(col("image_id")), lit(43)) === 0).as("ev")))
      val keyed = ph.select(col("image_id"), col("phash"), col("ev"),
        explode(GraftFunctions.fingerprintBandsHamming2(col("phash"))).as("bk"))
      val evalKeys = keyed.where(col("ev"))
        .select(col("bk"), col("image_id").as("eval_id"), col("phash").as("eval_phash"))
      keyed.where(!col("ev"))
        .join(broadcast(evalKeys), "bk")
        .withColumn("ham", GraftFunctions.hamming64(col("phash"), col("eval_phash")))
        .where(col("ham") <= 2)
        .select(col("image_id"), col("eval_id"), col("ham"))
        .distinct()
        .groupBy(col("image_id"))
        .agg(count(lit(1)).as("n_eval_matches"),
          min(col("ham")).as("min_ham"),
          min(col("eval_id")).as("first_eval_id"))
    },
    // INCREMENTAL image near-dup probe — the d12/st05 delta-vs-index
    // relationship replayed on the IMAGE modality: newly ingested images
    // (a deterministic ~1/7 hash split standing in for the arriving
    // slice) probe the PERSISTED corpus band index; the corpus itself is
    // never re-banded or re-shuffled per delta. Candidacy uses the same
    // radius-2 Manku joint keys as m08 (ham ≤ 2 recall GUARANTEED by
    // pigeonhole), confirm is the codegen'd 64-bit Hamming kernel. The
    // oracle brute-forces ALL new×corpus pairs from the dumped phashes —
    // equality re-proves the banding recall guarantee on data, exactly
    // as m08's does.
    "m09_incremental_image_neardup" -> { (s, d) =>
      val (ph, corpusBands) = m09Parts(s, d)
      probeImageBands(ph.where(col("nw"))
        .select(col("image_id"), col("phash")), corpusBands)
    },
    // AUDIO near-dup pairs — the last modality of the dedup matrix
    // (text d03-d05, image m01, video m07, audio here). Per row: the
    // RIFF/WAVE decode feeds the Haitsma-Kalker-style energy-delta
    // fingerprint at 2 window offsets (slot 2 pairs with the corpus's
    // 2-block `atrim` head cut EXACTLY, the m07 k-frame idiom for
    // alignment) → joint 3-of-8 band keys (C(8,3)=56 24-bit keys: any
    // pair within Hamming 5 shares ≥ 1 key by pigeonhole — GUARANTEED
    // candidacy) over ONE bucket shuffle with the shared Lsh hot-bucket
    // cap → slot×slot min-Hamming confirm ≤ 5. Measured separation on
    // ground truth (AudioFingerprintSpec): dups ≤ 2 (atrim/regain
    // exactly 0 — the fingerprint is gain-invariant by construction),
    // random floor min 17 / median 28; at 4000 rows the joints read 0
    // hot buckets (max 4) and 570 coincidence candidates — single 8-bit
    // blocks at the same scale had 294 hot buckets losing 6 of 400 true
    // pairs. Scale shape identical to m07: never all-pairs, candidates
    // bucket-local, confirm joins a 2-row-per-audio fingerprint table,
    // never audio payloads. The oracle brute-forces ALL audio-pair
    // min-Hammings from the fp dump — equality re-proves the banding
    // recall guarantee on data (the m08/m09 oracle discipline).
    "m10_audio_neardup_pairs" -> { (s, d) =>
      val hop = SyntheticMedia.ENV_HOP
      val fps = udf((bytes: Array[Byte]) =>
        WavCodec.decode(bytes) match {
          case Some(w) => Seq(0, 2).map(o =>
            (o, AudioFingerprint.energyDelta64(w.samples, hop, o)))
          case None => Seq.empty[(Int, Long)] // undecodable input
        })
      val fp = dumpDerived(s, d, "m10_audio_fp")(
        SyntheticMedia.audiosDedup(s, mediaRows(d)).toDF()
          .select(col("audio_id"), explode(fps(col("bytes"))).as("f"))
          .select(col("audio_id"), col("f._1").as("slot"), col("f._2").as("fp")))
      bandMinHamPairs(fp, "audio_id", "fp",
        GraftFunctions.fingerprintJointBands(_, 3), sourceTag = 14, maxHam = 5)
    })

  /** Shared m07/m10 confirm tail: a per-row fingerprint table (several
    * rows per id — frame or offset slots) → guaranteed-radius banding →
    * the shared Lsh heat cap (NO pre-distinct: the bucket window +
    * candidatePairs' array_distinct subsume it in ONE shuffle of the
    * band table; the cap therefore counts slot multiplicity — harsher
    * on hot buckets, the protective direction) → slot×slot min-Hamming
    * confirm ≤ maxHam. `bands` must guarantee candidacy at radius ≥
    * maxHam (pigeonhole), so recall is structural, not probabilistic. */
  private def bandMinHamPairs(fp: DataFrame, idCol: String, fpCol: String,
      bands: Column => Column, sourceTag: Int, maxHam: Int): DataFrame = {
    val banded = Lsh.explodeBands(
      fp.select(col(idCol).as("id"), bands(col(fpCol)).as("bk")),
      "id", "bk", sourceTag = sourceTag)
    Lsh.candidatePairs(banded, maxBucket = 64)
      .join(fp.select(col(idCol).as("a"), col(fpCol).as("fa")), "a")
      .join(fp.select(col(idCol).as("b"), col(fpCol).as("fb")), "b")
      .groupBy(col("a"), col("b"))
      .agg(min(GraftFunctions.hamming64(col("fa"), col("fb"))).as("min_hamming"))
      .where(col("min_hamming") <= maxHam)
  }

  /** m09/st07 shared sides, each dumped once per (sfDir, JVM): the tagged
    * phash table (nw = the arriving delta slice) and the PERSISTED corpus
    * band index the delta probes — at production scale the index is the
    * artifact an ingest pipeline maintains; here the dump makes the batch
    * probe and its streaming twin read the identical static side. */
  private def m09Parts(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val ph = dumpDerived(s, d, "m09_phashes")(
      SyntheticCorpus.corpus(s, corpusRows(d)).toDF()
        .select(col("image_id"), col("phash"),
          (pmod(xxhash64(col("image_id")), lit(7)) === 0).as("nw")))
    val corpusBands = dumpDerived(s, d, "m09_corpus_bands")(
      ph.where(!col("nw"))
        .select(col("image_id").as("old_id"), col("phash").as("old_phash"),
          explode(GraftFunctions.fingerprintBandsHamming2(col("phash"))).as("bk"))
        .select(col("bk"), col("old_id"), col("old_phash")))
    (ph, corpusBands)
  }

  /** One delta slice of images probed against the persisted corpus band
    * index: band → candidate join on the key → Hamming confirm → per-new-
    * image rollup. Batching-independent by construction (each decision
    * reads only the static index), which is what makes the st07 streaming
    * union provably equal m09's one-shot answer. */
  private def probeImageBands(newImgs: DataFrame, corpusBands: DataFrame): DataFrame =
    newImgs.select(col("image_id"), col("phash"),
        explode(GraftFunctions.fingerprintBandsHamming2(col("phash"))).as("bk"))
      .join(corpusBands, "bk")
      .withColumn("ham", GraftFunctions.hamming64(col("phash"), col("old_phash")))
      .where(col("ham") <= 2)
      .select(col("image_id"), col("old_id"), col("ham")).distinct()
      .groupBy(col("image_id"))
      .agg(count(lit(1)).as("n_matches"), min(col("ham")).as("min_ham"),
        min(col("old_id")).as("first_dup_id"))

  /**
   * Regression-frozen oracle constants for the fixed synthetic corpus
   * (seed 42). These are DERIVED values, not hand-authored:
   * `OracleDerivationSpec` re-derives both tables from
   * `SyntheticCorpus`+`DedupConfig` on every test run and fails with the
   * freshly derived literals when the corpus or config changes — update
   * them from that failure message. The oracle SQL below is GENERATED
   * from these constants, so test and oracle share one source of truth.
   */
  // m02 @ n=5000: (fmt, n, min_mean_px, max_mean_px, n_phash)
  val m02Expected: Seq[(String, Long, Long, Long, Long)] = Seq(
    ("jpg", 32L, 100L, 150L, 32L),
    ("png", 30L, 104L, 152L, 30L),
    ("ppm", 4865L, 87L, 169L, 4749L),
    ("ppmq", 73L, 97L, 160L, 73L))
  // m04 @ n=5000: (fmt, n, min_mean_luma, max_mean_luma, min_luma,
  // max_luma, n_grids) — same regression-frozen derivation rule as m02
  val m04Expected: Seq[(String, Long, Long, Long, Long, Long, Long)] = Seq(
    ("jpg", 32L, 96L, 165L, 30L, 227L, 32L),
    ("png", 30L, 101L, 164L, 22L, 243L, 30L),
    ("ppm", 4865L, 71L, 177L, 4L, 251L, 4774L),
    ("ppmq", 73L, 88L, 163L, 21L, 229L, 73L))

  // m05 @ n=1000 clips: (fps, n, min_mean_luma, max_mean_luma, n_clip_fp)
  // — same regression-frozen derivation rule as m02/m04
  val m05Expected: Seq[(Int, Long, Long, Long, Long)] = Seq(
    (10, 329L, 69L, 188L, 326L),
    (24, 307L, 59L, 179L, 302L),
    (30, 364L, 67L, 188L, 352L))
  // m06 @ n=1000 rows: (sample_rate, n, min_rms, max_rms, max_peak,
  // sum_zero_cross) — same regression-frozen derivation rule
  val m06Expected: Seq[(Int, Long, Long, Long, Long, Long)] = Seq(
    (8000, 340L, 4543L, 9343L, 18081L, 342753L),
    (16000, 325L, 4537L, 9307L, 18035L, 181442L),
    (44100, 335L, 4742L, 9310L, 17889L, 77722L))

  // m03 @ n=2000: (stage, rows_out)
  // candidates = 1108 under the radius-2 Manku fingerprint keys at
  // joint cap 4 (round 5; the old 16-bit block keys produced 9722 — the
  // 44-bit joints admit ~9x fewer coincidence pairs while FIXING the
  // recall the block keys silently lost at scale; near_edges unchanged)
  val m03Expected: Seq[(String, Long)] = Seq(
    ("sketches", 2000L), ("exact_tagged", 2000L), ("exact_edges", 11L),
    ("candidates", 1108L), ("near_edges", 90L), ("clusters", 2000L))

  /** Shared closure-replica CTE prefix for every oracle that re-derives
    * the flagship clustering tail from the m01 edge/idmap dumps (m01,
    * m11, m12): recursive transitive closure over the edge set, min-id
    * component labels, singletons via coalesce-to-vid, min-image_id
    * relabel + component sizes. ONE copy — a future closure-rule change
    * cannot drift between its three consumers. Use right after `WITH
    * RECURSIVE` and follow with the consumer's own CTEs/SELECT over
    * `lbl` (image_id, component) and `named` (component, cluster,
    * cluster_size). */
  private def m01ClosureCtes: String =
    s"""ed AS (SELECT src, dst FROM read_parquet(${oraclePath("m01_edges")}) WHERE src <> dst),
       |und AS (SELECT src AS u, dst AS v FROM ed UNION SELECT dst, src FROM ed),
       |reach(u, v) AS (
       |  SELECT u, v FROM und
       |  UNION
       |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
       |comp AS (SELECT u AS id, least(u, min(v)) AS component FROM reach GROUP BY u),
       |nodes AS (SELECT image_id, vid FROM read_parquet(${oraclePath("m01_idmap")})),
       |lbl AS (
       |  SELECT n.image_id, coalesce(c.component, n.vid) AS component
       |  FROM nodes n LEFT JOIN comp c ON c.id = n.vid),
       |named AS (
       |  SELECT component, min(image_id) AS cluster, count(*) AS cluster_size
       |  FROM lbl GROUP BY component)""".stripMargin

  private val multimodalOracles: Map[String, String] = Map(
    // deterministic decode statistics of the fixed synthetic corpus
    // (n=5000, seed 42): one row per container format incl. the real
    // PNG/JPEG decode paths — constants derived per m02Expected above
    "m02_image_decode_stats" ->
      ("SELECT * FROM (VALUES\n" +
        m02Expected.map { case (f, n, mn, mx, np) =>
          s"  ('$f', $n, $mn, $mx, $np)" }.mkString(",\n") +
        "\n) AS t(fmt, n, min_mean_px, max_mean_px, n_phash)"),
    "m04_thumbnail_stats" ->
      ("SELECT * FROM (VALUES\n" +
        m04Expected.map { case (f, n, mnm, mxm, mn, mx, ng) =>
          s"  ('$f', $n, $mnm, $mxm, $mn, $mx, $ng)" }.mkString(",\n") +
        "\n) AS t(fmt, n, min_mean_luma, max_mean_luma, min_luma, max_luma, n_grids)"),
    "m05_frame_sample" ->
      ("SELECT * FROM (VALUES\n" +
        m05Expected.map { case (f, n, mn, mx, nf) =>
          s"  ($f, $n, $mn, $mx, $nf)" }.mkString(",\n") +
        "\n) AS t(fps, n, min_mean_luma, max_mean_luma, n_clip_fp)"),
    "m06_audio_stats" ->
      ("SELECT * FROM (VALUES\n" +
        m06Expected.map { case (r, n, mn, mx, pk, zc) =>
          s"  ($r, $n, $mn, $mx, $pk, $zc)" }.mkString(",\n") +
        "\n) AS t(sample_rate, n, min_rms, max_rms, max_peak, sum_zero_cross)"),
    // brute-force ALL clip-pair min-Hammings from the dumped per-(clip,
    // slot) frame phashes — equality with the banded path re-proves the
    // radius-2 Manku key recall guarantee on data (a banded miss OR a
    // heat-cap loss on a true pair would show up as a missing row here)
    "m07_clip_neardup_pairs" ->
      s"""WITH ph AS (SELECT video_id, phash
         |  FROM read_parquet(${oraclePath("m07_frame_phash")})),
         |ham AS (
         |  SELECT pa.video_id AS a, pb.video_id AS b,
         |    min(bit_count(xor(pa.phash, pb.phash))) AS min_hamming
         |  FROM ph pa JOIN ph pb ON pa.video_id < pb.video_id
         |  GROUP BY 1, 2)
         |SELECT a, b, min_hamming FROM ham WHERE min_hamming <= 2""".stripMargin,
    // image decontamination brute-forced: EVERY eval×train phash pair's
    // Hamming distance from the dump — independently re-proving the
    // radius-2 Manku keys' pigeonhole recall guarantee (a banded miss
    // would show up as a missing row here)
    "m08_image_decontaminate" ->
      s"""WITH p AS (SELECT image_id, phash, ev
         |  FROM read_parquet(${oraclePath("m08_phashes")})),
         |pairs AS (
         |  SELECT t.image_id, e.image_id AS eval_id,
         |    bit_count(xor(t.phash, e.phash)) AS ham
         |  FROM p t JOIN p e ON e.ev AND NOT t.ev)
         |SELECT image_id, count(*) AS n_eval_matches, min(ham) AS min_ham,
         |  min(eval_id) AS first_eval_id
         |FROM pairs WHERE ham <= 2 GROUP BY image_id""".stripMargin,
    // brute-force new×corpus Hamming replica from the dumped phashes —
    // banded-output equality re-proves the radius-2 key recall guarantee
    "m09_incremental_image_neardup" ->
      s"""WITH p AS (SELECT image_id, phash, nw
         |  FROM read_parquet(${oraclePath("m09_phashes")})),
         |pairs AS (
         |  SELECT n.image_id, c.image_id AS old_id,
         |    bit_count(xor(n.phash, c.phash)) AS ham
         |  FROM p n JOIN p c ON n.nw AND NOT c.nw)
         |SELECT image_id, count(*) AS n_matches, min(ham) AS min_ham,
         |  min(old_id) AS first_dup_id
         |FROM pairs WHERE ham <= 2 GROUP BY image_id""".stripMargin,
    // brute-force ALL audio-pair min-Hammings from the dumped per-
    // (audio, slot) energy-delta fingerprints — equality with the banded
    // path re-proves the 3-of-8 joint-key recall guarantee on data
    "m10_audio_neardup_pairs" ->
      s"""WITH fp AS (SELECT audio_id, fp
         |  FROM read_parquet(${oraclePath("m10_audio_fp")})),
         |ham AS (
         |  SELECT fa.audio_id AS a, fb.audio_id AS b,
         |    min(bit_count(xor(fa.fp, fb.fp))) AS min_hamming
         |  FROM fp fa JOIN fp fb ON fa.audio_id < fb.audio_id
         |  GROUP BY 1, 2)
         |SELECT a, b, min_hamming FROM ham WHERE min_hamming <= 5""".stripMargin,
    // clustering tail replicated as a recursive transitive closure over
    // the dumped edge set, then min-image_id relabel + component sizes
    "m01_corpus_dedup_clusters" ->
      s"""WITH RECURSIVE
         |$m01ClosureCtes
         |SELECT l.image_id, nm.cluster, nm.cluster_size
         |FROM lbl l JOIN named nm USING (component)""".stripMargin,
    // the m01 closure extended with the least-degraded keep rule: fmt
    // preference CASE, payload-length tie-break, window argmin — the
    // oracle re-derives closure AND pick, so a wrong fmt rank or an
    // unstable tie-break fails the hash gate
    "m11_image_canonical_keep" ->
      s"""WITH RECURSIVE
         |$m01ClosureCtes,
         |meta AS (SELECT image_id, fmt, n_bytes FROM read_parquet(${oraclePath("m11_meta")})),
         |ranked AS (
         |  SELECT nm.cluster, l.image_id, nm.cluster_size, m.fmt, m.n_bytes,
         |    row_number() OVER (PARTITION BY nm.cluster ORDER BY
         |      CASE m.fmt WHEN 'ppm' THEN 0 WHEN 'png' THEN 1
         |                 WHEN 'ppmq' THEN 2 ELSE 3 END,
         |      m.n_bytes DESC, l.image_id) AS rk
         |  FROM lbl l JOIN named nm USING (component)
         |  JOIN meta m USING (image_id))
         |SELECT cluster, image_id AS keep_id, cluster_size AS n_members,
         |  fmt AS keep_fmt, n_bytes AS keep_bytes
         |FROM ranked WHERE rk = 1""".stripMargin,
    // the m01 closure re-derived from the edge dump, joined to the
    // (id, caption, phash) metadata dump: distinct-caption / distinct-
    // phash counts per multi-member cluster — a wrong closure, a lost
    // member, or a miscounted variant all fail the hash gate
    "m12_caption_consistency" ->
      s"""WITH RECURSIVE
         |$m01ClosureCtes,
         |caps AS (SELECT image_id, caption, phash
         |  FROM read_parquet(${oraclePath("m12_caps")}))
         |SELECT nm.cluster, count(*) AS n_members,
         |  count(DISTINCT cp.caption) AS n_captions,
         |  count(DISTINCT cp.phash) AS n_phashes,
         |  min(length(cp.caption)) AS min_cap_len,
         |  max(length(cp.caption)) AS max_cap_len,
         |  count(DISTINCT cp.caption) = 1 AS cap_consistent
         |FROM lbl l JOIN named nm USING (component)
         |JOIN caps cp USING (image_id)
         |WHERE nm.cluster_size >= 2
         |GROUP BY nm.cluster""".stripMargin)

  // ================================================================ st: structured streaming
  //
  // SOURCE SEAM: every st* query stages mtime-ordered parquet batches into
  // a temp dir and reads them through the FILE source with
  // maxFilesPerTrigger=1 — test scaffolding that makes micro-batch
  // boundaries, watermark advancement, and state hand-off deterministic
  // and oracle-checkable in this sandbox. The seam is exactly the
  // `readStream` line: a production deployment swaps
  // `readStream.schema(...).parquet(dir)` for its real unbounded source
  // (`format("kafka")` + the same `ts` watermark, or a rate/socket source)
  // and every transform downstream of that line — watermarking, windowed
  // aggregation, dropDuplicatesWithinWatermark, flatMapGroupsWithState —
  // is unchanged, because none of them reference the source shape. The
  // sentinel batches exist only to close windows/state deterministically
  // at end-of-input; a true unbounded stream closes them by, simply,
  // having more data.

  private val streaming: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the q09 aggregation re-expressed as a Structured Streaming query:
    // readStream → watermark + window → APPEND mode to a parquet file sink
    // (the scale pattern — state is evicted as the watermark passes each
    // window; nothing accumulates on the driver). A finite file stream
    // never advances the watermark past its last window, so two sentinel
    // files (3h/4h beyond max event time, one per micro-batch via
    // maxFilesPerTrigger=1) push the watermark over every real window;
    // sentinel rows are filtered from the result.
    "st01_stream_hourly" -> { (s, d) =>
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val schema = t(s, d, "events").schema
      val staged = stagedStreamBatches(s, d)
      val inDir = Files.createTempDirectory("st01_in")
      val outDir = Files.createTempDirectory("st01_out").toString
      val ckpt = Files.createTempDirectory("st01_ckpt").toString
      // batches 1-2: the real events via the staged halves (their union
      // is the full table; staging also makes this robust to the input
      // being a parquet DIRECTORY — a raw Files.copy of a directory-shaped
      // table would silently stage an empty batch); batches 3-4: the
      // staged watermark sentinels
      copyBatch(staged.resolve("b1.parquet"), inDir, "b1.parquet", 0L)
      copyBatch(staged.resolve("b2.parquet"), inDir, "b2.parquet", 30000L)
      copyBatch(staged.resolve("st01_s3.parquet"), inDir, "b3.parquet", 60000L)
      copyBatch(staged.resolve("st01_s4.parquet"), inDir, "b4.parquet", 120000L)
      withStreamConf(s, 8) {
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(inDir.toString)
          .withColumn("ts", col("ts").cast("timestamp"))
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("window.start").cast("timestamp_ntz").as("hour_start"),
            col("event_type"), col("n"))
          .writeStream.outputMode("append").format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable()
        q.stop()
      }
      s.read.parquet(outDir).where(col("event_type") =!= "__sentinel")
    },
    // STREAM-STREAM interval join — the one Structured Streaming join
    // shape the st-family didn't cover (st05/06/07 are stream-STATIC):
    // two live streams (views, purchases) joined per user under a
    // 2-hour attribution window, both sides watermarked so the
    // symmetric hash join's buffered state evicts as event time
    // advances (state is bounded by watermark + window, not stream
    // length — the property that makes this runnable forever). Inner
    // join + time constraint means every emitted match is final (no
    // retraction), so the union over micro-batches provably equals the
    // batch interval join the oracle runs. The time-ordered staged
    // halves keep every row ahead of the min-of-sources watermark:
    // nothing is late, so completeness is exact, not best-effort.
    "st08_stream_stream_join" -> { (s, d) =>
      import java.nio.file.Files
      val schema = t(s, d, "events").schema
      val staged = stagedStreamBatches(s, d)
      val inDir = Files.createTempDirectory("st08_in")
      val outDir = Files.createTempDirectory("st08_out").toString
      val ckpt = Files.createTempDirectory("st08_ckpt").toString
      copyBatch(staged.resolve("b1.parquet"), inDir, "b1.parquet", 0L)
      copyBatch(staged.resolve("b2.parquet"), inDir, "b2.parquet", 30000L)
      withStreamConf(s, 8) {
        // two independent sources over the same staged files, each
        // filtered to its event type (each readStream call is its own
        // source with its own offsets; the global watermark is the MIN
        // across both, so neither side can evict state the other still
        // needs)
        def src(tpe: String, idAs: String, tsAs: String) =
          s.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(inDir.toString)
            .where(col("event_type") === tpe)
            .select(col("user_id"), col("event_id").as(idAs),
              col("ts").cast("timestamp").as(tsAs))
            .withWatermark(tsAs, "1 hour")
        val views = src("view", "view_id", "vts")
        val purchases = src("purchase", "purchase_id", "pts")
        val q = views.join(purchases,
            views("user_id") === purchases("user_id") &&
              col("pts") >= col("vts") &&
              col("pts") <= col("vts") + expr("INTERVAL 2 HOURS"))
          .select(views("user_id"), col("view_id"), col("purchase_id"))
          .writeStream.outputMode("append").format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable()
        q.stop()
      }
      s.read.parquet(outDir)
    })

  /** Streaming DEDUP — the stateful streaming analog of the engine's core
    * operator: `dropDuplicatesWithinWatermark` keyed on (user_id,
    * event_type) with a 1-hour event-time watermark, append mode to a
    * file sink. State evicts as the watermark passes (bounded memory at
    * scale); within one replay of the finite input this is exactly
    * distinct-by-key, which the batch oracle checks. Only the key columns
    * are emitted — the surviving row's other fields depend on arrival
    * order, which a distributed dedup deliberately does not promise. */
  private val streamingDedup: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st02_stream_dedup" -> { (s, d) =>
      import java.nio.file.Files
      val events = t(s, d, "events")
      val schema = events.schema
      val outDir = Files.createTempDirectory("st02_out").toString
      val ckpt = Files.createTempDirectory("st02_ckpt").toString
      withStreamConf(s, 8) {
        val q = s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(d)
          .withColumn("ts", col("ts").cast("timestamp"))
          .withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark("user_id", "event_type")
          .select(col("user_id"), col("event_type"))
          .writeStream.outputMode("append").format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable()
        q.stop()
      }
      s.read.parquet(outDir)
    },
    // CUSTOM STATE — `flatMapGroupsWithState` (the brief's named API):
    // gap-based sessionization with a per-user open-session state struct
    // carried ACROSS micro-batches. The input is split into two
    // time-ordered batches (sessions straddle the boundary, so the state
    // hand-off is genuinely exercised) plus a far-future per-user
    // sentinel batch that closes every open session (st01's watermark-
    // sentinel pattern applied to state closure); the sentinel's own
    // session never closes and is never emitted.
    "st03_stream_sessions" -> { (s, d) =>
      import java.nio.file.Files
      import s.implicits._
      val schema = t(s, d, "events").schema
      val staged = stagedStreamBatches(s, d)
      val inDir = Files.createTempDirectory("st03_in")
      val outDir = Files.createTempDirectory("st03_out").toString
      val ckpt = Files.createTempDirectory("st03_ckpt").toString
      copyBatch(staged.resolve("b1.parquet"), inDir, "b1.parquet", 0L)
      copyBatch(staged.resolve("b2.parquet"), inDir, "b2.parquet", 60000L)
      copyBatch(staged.resolve("st03_sent.parquet"), inDir, "b3.parquet", 120000L)
      withStreamConf(s, 8) {
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(inDir.toString)
          .select(col("user_id"),
            unix_micros(col("ts").cast("timestamp")).as("tsu"))
          .as[(Long, Long)]
          .groupByKey(_._1)
          .flatMapGroupsWithState(
            org.apache.spark.sql.streaming.OutputMode.Append(),
            org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())(
            Queries.sessionize)
          .toDF("user_id", "start_us", "end_us", "n_events")
          .select(col("user_id"),
            timestamp_micros(col("start_us")).cast("timestamp_ntz").as("session_start"),
            timestamp_micros(col("end_us")).cast("timestamp_ntz").as("session_end"),
            col("n_events"))
          .writeStream.outputMode("append").format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable()
        q.stop()
      }
      s.read.parquet(outDir)
    },
    // WATERMARK-DRIVEN STATE CLOSURE — `EventTimeTimeout`: the production
    // fix for st03's caveat (a NoTimeout session of a user who stops
    // emitting stays open until someone injects a per-user sentinel).
    // Here each open session is walled with setTimeoutTimestamp(last +
    // gap) and the ENGINE closes it once the global watermark passes the
    // wall. The only test scaffolding left is ONE far-future event for a
    // single synthetic key in a final batch — the watermark is global, so
    // one row advances it for every user at once (vs st03's one sentinel
    // PER user); that key's own session is filtered from the result.
    "st04_stream_sessions_evt" -> { (s, d) =>
      import java.nio.file.Files
      import s.implicits._
      val schema = t(s, d, "events").schema
      val staged = stagedStreamBatches(s, d)
      val inDir = Files.createTempDirectory("st04_in")
      val outDir = Files.createTempDirectory("st04_out").toString
      val ckpt = Files.createTempDirectory("st04_ckpt").toString
      val sentinelUid = -1L // synthetic user ids are non-negative
      copyBatch(staged.resolve("b1.parquet"), inDir, "b1.parquet", 0L)
      copyBatch(staged.resolve("b2.parquet"), inDir, "b2.parquet", 60000L)
      // staged one-row, one-key sentinels: b3 (+24 h) pushes the watermark
      // past every wall (maxTs + 24h - 1h delay > any last-event + 8h
      // gap); b4 (+25 h) makes the timeout firing deterministic by
      // construction — the watermark b3 advanced is APPLIED in the next
      // batch, and while the engine's no-data micro-batch normally
      // provides one, that is a trigger-policy behavior: a second, later
      // sentinel guarantees a DATA batch runs with the advanced watermark,
      // firing every wall inside work processAllAvailable provably waits
      // for
      copyBatch(staged.resolve("st04_s24.parquet"), inDir, "b3.parquet", 120000L)
      copyBatch(staged.resolve("st04_s25.parquet"), inDir, "b4.parquet", 180000L)
      withStreamConf(s, 8) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(inDir.toString)
        .withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        // the watermarked ATTRIBUTE itself must be in the fMGWS input's
        // schema (the analyzer checks attribute metadata, not just the
        // plan node), so `ts` rides along next to its micros rendering
        .select(col("user_id"), unix_micros(col("ts")).as("tsu"), col("ts"))
        .as[(Long, Long, java.sql.Timestamp)]
        .groupByKey(_._1)
        .flatMapGroupsWithState(
          org.apache.spark.sql.streaming.OutputMode.Append(),
          org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout())(
          Queries.sessionizeEvt)
        .toDF("user_id", "start_us", "end_us", "n_events")
        .select(col("user_id"),
          timestamp_micros(col("start_us")).cast("timestamp_ntz").as("session_start"),
          timestamp_micros(col("end_us")).cast("timestamp_ntz").as("session_end"),
          col("n_events"))
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
      }
      s.read.parquet(outDir).where(col("user_id") =!= sentinelUid)
    },
    // STREAMING incremental dedup — d12's continuous-ingest twin and the
    // shape a 100 TB tier actually runs for daily/hourly document
    // arrivals: a `foreachBatch` stream-static probe of each micro-batch
    // of NEW documents against the persisted corpus band index (sketch →
    // band → hash-join on bandKey → Jaccard confirm → per-doc argmax),
    // appending decisions to the sink. The corpus is never re-sketched or
    // re-shuffled; per batch the cost is O(batch + touched buckets).
    // Stateless by design — each new doc's decision depends only on the
    // static index, so no watermark or state store is involved and
    // exactly-once comes from foreachBatch's batchId-idempotent append.
    // Two micro-batches prove the probe is batch-composable; the result
    // equals d12's one-shot batch answer (the shared oracle SQL).
    "st05_stream_incr_dedup" -> { (s, d) =>
      import java.nio.file.Files
      val docs = t(s, d, "documents")
      // static side: the persisted corpus index, heat-capped like d03/d12
      val corpusBands = docBanded(s, d).where(col("id") % 5 =!= 0)
        .select(col("id").as("old_id"), col("bandKey"))
      val keepB = corpusBands.groupBy("bandKey")
        .agg(count(lit(1)).as("n")).where(col("n") <= 64).select("bandKey")
      val corpusKept = corpusBands.join(keepB, "bandKey")
      val corpusSk = docSketches(s, d).where(col("doc_id") % 5 =!= 0)
        .select(col("doc_id").as("old_id"), col("mins").as("mins_o"))
      val staged = stagedStreamBatches(s, d)
      val inDir = Files.createTempDirectory("st05_in")
      val outDir = Files.createTempDirectory("st05_out").toString
      val ckpt = Files.createTempDirectory("st05_ckpt").toString
      copyBatch(staged.resolve("st05_b1.parquet"), inDir, "b1.parquet", 0L)
      copyBatch(staged.resolve("st05_b2.parquet"), inDir, "b2.parquet", 60000L)
      withStreamConf(s, 8) {
        val q = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(inDir.toString)
          .writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            // same kernel, bands, tag as the persisted index build
            // (spread: the sketch kernel would run single-task per batch)
            val sk = spread(s, batch).select(col("doc_id").as("new_id"),
              GraftFunctions.captionMinhash(col("text"), docSketch).as("mins_n"))
            val banded = Lsh.explodeBands(
              sk.select(col("new_id").as("id"),
                GraftFunctions.minhashBands(col("mins_n"), bands = 16,
                  rowsPerBand = 8).as("bk")),
              "id", "bk", sourceTag = 11)
              .select(col("id").as("new_id"), col("bandKey"))
            val cands = banded.join(corpusKept, "bandKey")
              .select("new_id", "old_id").distinct()
            val pick = Window.partitionBy(col("new_id"))
              .orderBy(col("jac_est").desc, col("old_id"))
            cands.join(sk, "new_id").join(corpusSk, "old_id")
              .withColumn("jac_est", round(
                GraftFunctions.jaccard(col("mins_n"), col("mins_o"), docSketch), 6))
              .where(col("jac_est") >= 0.5)
              .withColumn("rk", row_number().over(pick)).where(col("rk") === 1)
              .select(col("new_id"), col("old_id").as("dup_of"), col("jac_est"))
              // batchId-keyed overwrite = the idempotent append: a
              // micro-batch replayed from the checkpoint after a partial
              // commit rewrites ITS OWN directory instead of appending
              // duplicate decision rows
              .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
            ()
          }
          .option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable()
        q.stop()
      }
      // partition discovery surfaces batch_id; it is sink bookkeeping,
      // not part of the decision schema
      s.read.parquet(outDir).select("new_id", "dup_of", "jac_est")
    },
    // streaming decontamination — d16's continuous-ingest twin (the
    // st05↔d12 relationship replayed on the decontamination tier):
    // training docs ARRIVE as micro-batches and are scored against the
    // PERSISTED eval-gram index (built once, broadcast into every
    // batch's membership join). The per-doc overlap is independent of
    // batching, so the union of per-batch outputs provably equals d16's
    // one-shot answer — st06 shares d16's oracle, and the spec asserts
    // the set equality. Exactly-once via batchId-keyed idempotent
    // overwrite, same as st05.
    "st06_stream_decontaminate" -> { (s, d) =>
      import java.nio.file.Files
      val docs = t(s, d, "documents")
      val evalGrams = dumpDerived(s, d, "decon_eval_grams")(
        deconGrams(s, d).where(col("ev")).select(col("gh")).distinct())
        .withColumn("hit", lit(1L))
      val staged = stagedStreamBatches(s, d)
      val inDir = Files.createTempDirectory("st06_in")
      val outDir = Files.createTempDirectory("st06_out").toString
      val ckpt = Files.createTempDirectory("st06_ckpt").toString
      copyBatch(staged.resolve("st06_b1.parquet"), inDir, "b1.parquet", 0L)
      copyBatch(staged.resolve("st06_b2.parquet"), inDir, "b2.parquet", 60000L)
      withStreamConf(s, 8) {
        val q = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(inDir.toString)
          .writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            // spread: a micro-batch is one staged file → one partition;
            // the 13-gram kernel would run single-task per batch
            deconScore(gramHashes(spread(s, batch)), evalGrams)
              .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
            ()
          }
          .option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable()
        q.stop()
      }
      s.read.parquet(outDir)
        .select("doc_id", "n_grams", "n_hit", "overlap", "contaminated")
    },
    // streaming image near-dup ingest — m09's continuous-ingest twin on
    // the IMAGE modality (the st05↔d12 relationship, third instance):
    // newly ingested images ARRIVE as micro-batches and probe the
    // PERSISTED corpus band index. Each image's verdict reads only the
    // static index, so the union of per-batch outputs provably equals
    // m09's one-shot answer — st07 shares m09's brute-force Hamming
    // oracle, and the spec asserts the set equality. Exactly-once via
    // batchId-keyed idempotent overwrite, same as st05/st06.
    "st07_stream_image_neardup" -> { (s, d) =>
      import java.nio.file.Files
      val (ph, corpusBands) = m09Parts(s, d)
      val schema = ph.select(col("image_id"), col("phash")).schema
      val staged = stagedStreamBatches(s, d)
      val inDir = Files.createTempDirectory("st07_in")
      val outDir = Files.createTempDirectory("st07_out").toString
      val ckpt = Files.createTempDirectory("st07_ckpt").toString
      copyBatch(staged.resolve("st07_b1.parquet"), inDir, "b1.parquet", 0L)
      copyBatch(staged.resolve("st07_b2.parquet"), inDir, "b2.parquet", 60000L)
      withStreamConf(s, 8) {
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(inDir.toString)
          .writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            probeImageBands(batch, corpusBands)
              .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
            ()
          }
          .option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable()
        q.stop()
      }
      s.read.parquet(outDir)
        .select("image_id", "n_matches", "min_ham", "first_dup_id")
    })

  /** Session gap (micros): a quiet period longer than this closes the
    * session. 8 h fits the synthetic events' inter-event spacing. */
  private val sessionGapUs: Long = 8L * 3600 * 1000000

  /** Open-session state carried across micro-batches. */
  final case class SessionState(start: Long, last: Long, n: Long)

  /** `flatMapGroupsWithState` handler: fold this batch's (sorted) event
    * times into the open session, emitting every session that CLOSES
    * (next event further than the gap). Batches arrive time-ordered
    * (file source by mtime), events within a batch are sorted here; ties
    * and duplicates extend the current session. */
  /** The session fold BOTH handlers delegate to — the merge/close rule
    * lives in exactly one place so st03 and st04 cannot silently diverge.
    * Sorts this batch's event times, folds them into the open session,
    * and returns (sessions closed by a > gap quiet period, final open
    * state). Out-of-order rows (possible ACROSS micro-batches within the
    * watermark allowance) extend BOTH ends: since the watermark delay
    * (1 h) is far below the gap (8 h), any row the engine did not drop as
    * late necessarily lands within gap of the open session, so the merge
    * branch is always the correct one and start must track the earliest
    * event, not the first seen. */
  private def foldSessions(user: Long, times: Array[Long],
      st0: Option[SessionState])
      : (Seq[(Long, Long, Long, Long)], Option[SessionState]) = {
    java.util.Arrays.sort(times)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    var st = st0
    var i = 0
    while (i < times.length) {
      val ts = times(i)
      st match {
        case None => st = Some(SessionState(ts, ts, 1L))
        case Some(cur) if ts - cur.last <= sessionGapUs =>
          st = Some(SessionState(math.min(cur.start, ts),
            math.max(cur.last, ts), cur.n + 1))
        case Some(cur) =>
          out += ((user, cur.start, cur.last, cur.n))
          st = Some(SessionState(ts, ts, 1L))
      }
      i += 1
    }
    (out.toSeq, st)
  }

  def sessionize(user: Long, rows: Iterator[(Long, Long)],
      state: org.apache.spark.sql.streaming.GroupState[SessionState])
      : Iterator[(Long, Long, Long, Long)] = {
    val (closed, st) = foldSessions(user, rows.map(_._2).toArray, state.getOption)
    st.foreach(state.update)
    closed.iterator
  }

  /** [[sessionize]]'s production closure path — `EventTimeTimeout`:
    * instead of injecting a per-user sentinel event to flush open
    * sessions (st03's NoTimeout workaround), the open session is WALLED
    * with `setTimeoutTimestamp(last + gap)`, and the engine calls the
    * handler with `hasTimedOut` once the event-time WATERMARK passes that
    * wall — so sessions of users who simply stop emitting close on their
    * own as the rest of the stream advances time. Late rows beyond the
    * watermark are dropped by the engine before the handler, which is
    * what guarantees `last + gap > watermark` (gap ≫ watermark delay)
    * and keeps `setTimeoutTimestamp` legal. */
  def sessionizeEvt(user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
      state: org.apache.spark.sql.streaming.GroupState[SessionState])
      : Iterator[(Long, Long, Long, Long)] = {
    if (state.hasTimedOut) {
      val cur = state.get
      state.remove()
      Iterator.single((user, cur.start, cur.last, cur.n))
    } else {
      val (closed, st) = foldSessions(user, rows.map(_._2).toArray, state.getOption)
      st.foreach { cur =>
        state.update(cur)
        // the GroupState timeout API is millisecond-precision; the wall
        // rounds DOWN, which can only close a session marginally early
        // relative to exact micros — never extend it past the gap
        state.setTimeoutTimestamp((cur.last + sessionGapUs) / 1000L)
      }
      closed.iterator
    }
  }

  private val streamingOracles: Map[String, String] = Map(
    // the streaming probe's decisions must equal d12's one-shot batch
    // answer — same index, same kernel, same rule, shared oracle SQL
    "st05_stream_incr_dedup" -> docDedupOracles("d12_incremental_dedup"),
    // streaming decontamination provably equals the one-shot d16 (per-doc
    // overlap is batching-independent) — same oracle
    "st06_stream_decontaminate" -> docDedupOracles("d16_decontaminate"),
    // streaming image ingest probe equals m09's one-shot answer (each
    // verdict reads only the persisted index) — same brute-force oracle
    "st07_stream_image_neardup" -> multimodalOracles("m09_incremental_image_neardup"),
    "st01_stream_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,
    // the batch interval join: the streaming inner join's emitted-match
    // union must equal it exactly (inner + time constraint = no
    // retraction, nothing late under the staged time-ordered halves)
    "st08_stream_stream_join" ->
      """WITH v AS (SELECT user_id, event_id AS view_id, ts AS vts
        |           FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id, event_id AS purchase_id, ts AS pts
        |      FROM events WHERE event_type = 'purchase')
        |SELECT v.user_id, v.view_id, p.purchase_id
        |FROM v JOIN p ON v.user_id = p.user_id
        |WHERE p.pts >= v.vts AND p.pts <= v.vts + INTERVAL 2 HOUR""".stripMargin,
    "st02_stream_dedup" ->
      "SELECT DISTINCT user_id, event_type FROM events",
    // batch gaps-and-islands replica of the stateful sessionization: a
    // > 8h quiet period starts a new session (ties/duplicates continue —
    // mirrored by the handler's `<= gap` branch)
    "st03_stream_sessions" ->
      """WITH l AS (
        |  SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM events),
        |m AS (
        |  SELECT user_id, ts,
        |    CASE WHEN prev IS NULL OR ts - prev > INTERVAL '8 hours'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM l),
        |g AS (
        |  SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |       count(*) AS n_events
        |FROM g GROUP BY user_id, sid""".stripMargin,
    // the EventTimeTimeout variant computes the SAME partition of events
    // into sessions — closure mechanics (watermark wall vs sentinel)
    // must not change the result
    "st04_stream_sessions_evt" ->
      """WITH l AS (
        |  SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM events),
        |m AS (
        |  SELECT user_id, ts,
        |    CASE WHEN prev IS NULL OR ts - prev > INTERVAL '8 hours'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM l),
        |g AS (
        |  SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |       count(*) AS n_events
        |FROM g GROUP BY user_id, sid""".stripMargin)

  // ================================================================ sm: sourmash signature compatibility (reference fixtures)

  import graft.operators.SignatureSearch
  import graft.sources.{FinchJson, SignatureJson}

  /** Reference fixture root (read-only); queries degrade to empty results
    * when absent so the surface stays runnable anywhere. */
  private val refData = "/root/reference/tests/data"
  private def refExists: Boolean = new java.io.File(refData).isDirectory

  private val sourmash: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1/S2: signature JSON scan + flatten + md5 recompute check
    "sm01_signature_load" -> { (s, _) =>
      if (!refExists) s.emptyDataFrame.select()
      else SignatureJson.read(s, s"$refData/genome-s10+s11.sig")
        .withColumn("md5_recomputed",
          SignatureJson.computeMd5sum(col("ksize"), col("mins")))
        .select(col("name"), col("ksize"), col("is_protein"), col("num"),
          col("md5sum"), col("md5_recomputed"),
          (col("md5sum") === col("md5_recomputed")).as("md5_ok"),
          size(col("mins")).as("n_mins"))
    },
    // Q1/Q2/Q3: linear search with the v5 fixture's golden thresholds
    "sm02_linear_search" -> { (s, _) =>
      if (!refExists) s.emptyDataFrame.select()
      else {
        val db = SignatureJson.read(s, s"$refData/.sbt.v5/*")
          .where(col("md5sum") =!= lit("")) // leaf sigs only
        val cfg = graft.core.SketchConfig(num = 500, ksize = 31)
        val query = db.where(col("filename") === "SRR2060939_1.fastq.gz")
          .select(col("mins")).head().getSeq[Long](0).toArray
        val combos = Seq(("similarity", 0.5), ("similarity", 0.1),
          ("containment", 0.5), ("containment", 0.1))
        combos.map { case (mode, thr) =>
          SignatureSearch.linear(db, query, cfg, thr, mode)
            .agg(count(lit(1)).as("n_matches"))
            .select(lit(mode).as("mode"), lit(thr).as("threshold"), col("n_matches"))
        }.reduce(_ union _)
      }
    },
    // Q4/Q5 as a persisted index: build the inverted hash index (the
    // saved-SBT analog), search through it, reproduce the same golden
    // counts as the linear scan — the posting pre-filter is exact
    "sm05_indexed_search" -> { (s, _) =>
      if (!refExists) s.emptyDataFrame.select()
      else {
        val db = SignatureJson.read(s, s"$refData/.sbt.v5/*")
          .where(col("md5sum") =!= lit(""))
        val cfg = graft.core.SketchConfig(num = 500, ksize = 31)
        val query = db.where(col("filename") === "SRR2060939_1.fastq.gz")
          .select(col("mins")).head().getSeq[Long](0).toArray
        val idx = s"${derivedDir("sm")}/sig_hash_index.parquet"
        SignatureSearch.buildIndex(db, idx)
        val combos = Seq(("similarity", 0.5), ("similarity", 0.1),
          ("containment", 0.5), ("containment", 0.1))
        combos.map { case (mode, thr) =>
          SignatureSearch.indexed(db, idx, query, cfg, thr, mode)
            .agg(count(lit(1)).as("n_matches"))
            .select(lit(mode).as("mode"), lit(thr).as("threshold"), col("n_matches"))
        }.reduce(_ union _)
      }
    },
    // S6: serialize → reparse round-trip (writer correctness as a query)
    "sm03_signature_roundtrip" -> { (s, _) =>
      if (!refExists) s.emptyDataFrame.select()
      else {
        import s.implicits._
        val orig = SignatureJson.read(s, s"$refData/genome-s10+s11.sig")
        val json = SignatureJson.toJson(orig).select(col("json")).as[String].head()
        val tmp = java.nio.file.Files.createTempDirectory("sig_rt")
        val f = tmp.resolve("rt.sig")
        java.nio.file.Files.writeString(f, json)
        val reread = SignatureJson.read(s, f.toString)
        orig.select(col("name"), col("ksize"), col("is_protein"),
            col("md5sum"), col("mins")).as("o")
          .join(reread.select(col("name"), col("ksize"), col("is_protein"),
            col("md5sum").as("md5_rt"), col("mins").as("mins_rt")).as("r"),
            Seq("name", "ksize", "is_protein"))
          .select(col("name"), col("ksize"), col("is_protein"),
            (col("md5sum") === col("md5_rt")).as("md5_ok"),
            (col("mins") === col("mins_rt")).as("mins_ok"))
      }
    },
    // K8: finch interop — From<MinHashKmers> over a deterministic
    // finch-format fixture; the oracle re-derives the conversion from the
    // same JSON file independently (DuckDB read_json)
    "sm06_finch_import" -> { (s, _) =>
      val path = s"${derivedDir("sm")}/finch_demo.json"
      FinchJson.writeDemoFixture(path)
      FinchJson.toMinHash(FinchJson.read(s, path))
        .select(col("name"), col("num").cast("long").as("num"),
          col("ksize").cast("long").as("ksize"), col("seed"), col("max_hash"),
          size(col("mins")).cast("long").as("n_mins"),
          element_at(col("mins"), 1).as("first_min"),
          element_at(col("mins"), size(col("mins"))).as("last_min"),
          expr("aggregate(abunds, 0L, (acc, x) -> acc + x)").as("sum_abund"))
    },
    // ABUNDANCE-WEIGHTED comparison (published sourmash
    // `similarity(ignore_abundance=False)` = angular similarity
    // 1 − 2·acos(ρ)/π, ρ the cosine over the sparse hash→abundance
    // vectors; the reference tracks abundances with merge quirks but
    // stops short of the weighted compare — completed here like
    // scaledToMaxHash completes --scaled).
    // DataFrame formulation: explode (hash, abund), inner-join on common
    // hashes for the dot product (missing hashes contribute 0), per-
    // sketch norms over the FULL abundance vector; pairs sharing no hash
    // are omitted. The kernel twin is MinHash.angularSimilarity
    // (KernelSpec/FinchSpec golden); the oracle re-derives everything
    // from the raw finch JSON independently.
    // Sketch DOWNSAMPLING — the `search --scaled` re-truncation the
    // reference promises ("downsample query to this scaled factor",
    // src/sourmash.yml:71-76) and drops (src/lib.rs:593-601):
    // scaledToMaxHash completes the factor conversion, MinHash.downsample
    // the prefix cut (keep mins <= max_hash UNSIGNED, num -> 0). The
    // genome fixture's four sketches are downsampled at two scaled
    // factors; the oracle filters the fixture JSON's mins independently.
    "sm08_downsample" -> { (s, _) =>
      if (!refExists) s.emptyDataFrame.select()
      else {
        val db = SignatureJson.read(s, s"$refData/genome-s10+s11.sig")
        // factors chosen to CUT this fixture (its bottom-500 mins all sit
        // below 2^64/1000, so small factors would be no-ops): 200k keeps
        // 2-10 mins per sketch, 2M keeps 0-2 (incl. genuinely empty
        // results — null first/last)
        Seq(200000L, 2000000L).map { scaled =>
          val mh = graft.core.SketchConfig.scaledToMaxHash(scaled)
          db.select(col("name"), col("ksize"), col("is_protein"),
              lit(scaled).as("scaled"), lit(mh).as("max_hash"),
              graft.functions.GraftFunctions.downsampleMins(col("mins"), mh).as("dmins"))
            .select(col("name"), col("ksize"), col("is_protein"),
              col("scaled"), col("max_hash"),
              size(col("dmins")).as("n_mins"),
              when(size(col("dmins")) > 0, element_at(col("dmins"), 1))
                .as("first_min"),
              when(size(col("dmins")) > 0,
                element_at(col("dmins"), size(col("dmins")))).as("last_min"))
        }.reduce(_ union _)
      }
    },
    "sm07_abund_similarity" -> { (s, _) =>
      val path = s"${derivedDir("sm")}/finch_demo.json"
      FinchJson.writeDemoFixture(path)
      val sk = FinchJson.toMinHash(FinchJson.read(s, path))
        .select(col("name"), explode(arrays_zip(col("mins"), col("abunds"))).as("h"))
        .select(col("name"), col("h.mins").as("u"), col("h.abunds").as("ab"))
      val norms = sk.groupBy(col("name")).agg(sum(col("ab") * col("ab")).as("n2"))
      val dots = sk.as("x").join(sk.as("y"),
          col("x.u") === col("y.u") && col("x.name") < col("y.name"))
        .groupBy(col("x.name").as("a"), col("y.name").as("b"))
        .agg(sum(col("x.ab") * col("y.ab")).as("dot"))
      dots.join(norms.select(col("name").as("a"), col("n2").as("n2a")), "a")
        .join(norms.select(col("name").as("b"), col("n2").as("n2b")), "b")
        .select(col("a"), col("b"),
          angularSimCol(col("dot"), col("n2a"), col("n2b")).as("angular_sim"))
    })

  /**
   * Literal oracles for the fixed reference fixtures: the expected rows
   * are constants derived INDEPENDENTLY of the engine — md5sums are the
   * fixture's own stored values (reference-computed), sm02's counts are
   * the reference's golden test expectations
   * (`/root/reference/src/index/sbt.rs:526-590`), and sm04's scores were
   * recomputed from the fixture JSON with a standalone implementation of
   * the combined-denominator compare. m03's stage rows are deterministic
   * for the fixed synthetic corpus (n=2000, seed 42).
   */
  private val sourmashOracles: Map[String, String] = Map(
    "sm01_signature_load" ->
      """SELECT * FROM (VALUES
        |  ('s10+s11', 21, true,  500, '93d5d09abf399740a4506310680eb62c', '93d5d09abf399740a4506310680eb62c', true, 500),
        |  ('s10+s11', 21, false, 500, '8a619747693c045afde376263841806b', '8a619747693c045afde376263841806b', true, 500),
        |  ('s10+s11', 30, true,  500, '819dd371bf41739a1b158582d5a04b45', '819dd371bf41739a1b158582d5a04b45', true, 500),
        |  ('s10+s11', 30, false, 500, '19ac462374cc8af809416aa72cbdb8d3', '19ac462374cc8af809416aa72cbdb8d3', true, 500)
        |) AS t(name, ksize, is_protein, num, md5sum, md5_recomputed, md5_ok, n_mins)""".stripMargin,
    "sm02_linear_search" ->
      """SELECT * FROM (VALUES
        |  ('similarity',  0.5, 1), ('similarity',  0.1, 2),
        |  ('containment', 0.5, 2), ('containment', 0.1, 4)
        |) AS t(mode, threshold, n_matches)""".stripMargin,
    "sm05_indexed_search" ->
      """SELECT * FROM (VALUES
        |  ('similarity',  0.5, 1), ('similarity',  0.1, 2),
        |  ('containment', 0.5, 2), ('containment', 0.1, 4)
        |) AS t(mode, threshold, n_matches)""".stripMargin,
    "sm03_signature_roundtrip" ->
      """SELECT * FROM (VALUES
        |  ('s10+s11', 21, true,  true, true), ('s10+s11', 21, false, true, true),
        |  ('s10+s11', 30, true,  true, true), ('s10+s11', 30, false, true, true)
        |) AS t(name, ksize, is_protein, md5_ok, mins_ok)""".stripMargin,
    "sm04_search_topn" ->
      """SELECT * FROM (VALUES
        |  ('SRR2060939_1.fastq.gz', 1.0),
        |  ('SRR2060939_2.fastq.gz', 0.356),
        |  ('SRR2255622_1.fastq.gz', 0.086)
        |) AS t(filename, score)""".stripMargin,
    // K8 finch conversion re-derived INDEPENDENTLY from the fixture JSON:
    // num = entry count, ksize = first kmer's length, seed/max_hash are
    // the from.rs constants, mins = unsigned-distinct hashes with counts
    // merged — the engine-side SketchBuilder insertion is not consulted
    "sm06_finch_import" ->
      """WITH sk AS (
        |  SELECT unnest(sketches) AS s
        |  FROM read_json('/tmp/graft_derived/sm/finch_demo.json',
        |    columns = {sketches: 'STRUCT(name VARCHAR, seqLength BIGINT,
        |      numValidKmers BIGINT, comment VARCHAR,
        |      hashes STRUCT(hash HUGEINT, kmer VARCHAR, count BIGINT,
        |      extra_count BIGINT)[])[]'})),
        |ent AS (
        |  SELECT s.name AS name, len(s.hashes) AS num,
        |         length(s.hashes[1].kmer) AS ksize, unnest(s.hashes) AS h
        |  FROM sk),
        |g AS (
        |  SELECT name, num, ksize, CAST(h.hash AS HUGEINT) AS u,
        |         SUM(h.count) AS a
        |  FROM ent
        |  WHERE h.count > 0 -- from.rs loops `count` times: 0 adds nothing
        |  GROUP BY 1, 2, 3, 4),
        |agg AS (
        |  SELECT name, num, ksize, COUNT(*) AS n_mins, MIN(u) AS first_u,
        |         MAX(u) AS last_u, CAST(SUM(a) AS BIGINT) AS sum_abund
        |  FROM g GROUP BY 1, 2, 3)
        |SELECT name, num, ksize, CAST(42 AS BIGINT) AS seed,
        |       CAST(0 AS BIGINT) AS max_hash, n_mins,
        |       CAST(CASE WHEN first_u > 9223372036854775807
        |            THEN first_u - 18446744073709551616 ELSE first_u END AS BIGINT) AS first_min,
        |       CAST(CASE WHEN last_u > 9223372036854775807
        |            THEN last_u - 18446744073709551616 ELSE last_u END AS BIGINT) AS last_min,
        |       sum_abund
        |FROM agg""".stripMargin,
    // downsample re-derived INDEPENDENTLY from the fixture JSON: the two
    // max_hash constants are the published-sourmash float conversion
    // round(2^64/scaled) computed by hand (scaled=100 -> the f64-rounded
    // ...520, scaled=1000 -> ...552 — see SketchConfig.scaledToMaxHash),
    // and the cut is a plain unsigned filter over the fixture's mins —
    // the engine's prefix-cut binary search is never consulted
    "sm08_downsample" ->
      """WITH raw AS (
        |  SELECT name, unnest(signatures) AS mh
        |  FROM read_json('/root/reference/tests/data/genome-s10+s11.sig',
        |    columns = {name: 'VARCHAR',
        |      signatures: 'STRUCT(ksize BIGINT, num BIGINT, molecule VARCHAR,
        |        md5sum VARCHAR, mins UBIGINT[])[]'})),
        |sk AS (SELECT name, mh.ksize AS ksize,
        |         lower(mh.molecule) = 'protein' AS is_protein, mh.mins AS mins
        |       FROM raw),
        |ex AS (SELECT name, ksize, is_protein, unnest(mins) AS u FROM sk),
        |params AS (SELECT * FROM (VALUES (200000, 92233720368548),
        |                                 (2000000, 9223372036855)) p(scaled, max_hash)),
        |e AS (SELECT ex.name, ex.ksize, ex.is_protein, p.scaled, p.max_hash,
        |        ex.u
        |      FROM ex CROSS JOIN params p),
        |agg AS (SELECT name, ksize, is_protein, scaled, max_hash,
        |          COUNT(*) AS n_mins, CAST(MIN(u) AS BIGINT) AS first_min,
        |          CAST(MAX(u) AS BIGINT) AS last_min
        |        FROM e WHERE u <= CAST(max_hash AS UBIGINT)
        |        GROUP BY name, ksize, is_protein, scaled, max_hash),
        |base AS (SELECT s.name, s.ksize, s.is_protein, p.scaled, p.max_hash
        |         FROM sk s CROSS JOIN params p)
        |SELECT b.name, b.ksize, b.is_protein, b.scaled, b.max_hash,
        |  COALESCE(a.n_mins, 0) AS n_mins, a.first_min, a.last_min
        |FROM base b LEFT JOIN agg a
        |  USING (name, ksize, is_protein, scaled, max_hash)""".stripMargin,
    // angular similarity re-derived from the raw finch JSON: dup-hash
    // counts merge (SUM ... GROUP BY u), zero-count entries drop, dot
    // over common hashes, norms over each full abundance vector
    "sm07_abund_similarity" ->
      """WITH sk AS (
        |  SELECT unnest(sketches) AS s
        |  FROM read_json('/tmp/graft_derived/sm/finch_demo.json',
        |    columns = {sketches: 'STRUCT(name VARCHAR, seqLength BIGINT,
        |      numValidKmers BIGINT, comment VARCHAR,
        |      hashes STRUCT(hash HUGEINT, kmer VARCHAR, count BIGINT,
        |      extra_count BIGINT)[])[]'})),
        |ent AS (
        |  SELECT s.name AS name, unnest(s.hashes) AS h FROM sk),
        |g AS (
        |  SELECT name, CAST(h.hash AS HUGEINT) AS u, SUM(h.count) AS ab
        |  FROM ent WHERE h.count > 0 GROUP BY 1, 2),
        |norm AS (SELECT name, SUM(ab * ab) AS n2 FROM g GROUP BY 1),
        |dot AS (
        |  SELECT x.name AS a, y.name AS b, SUM(x.ab * y.ab) AS d
        |  FROM g x JOIN g y ON x.u = y.u AND x.name < y.name
        |  GROUP BY 1, 2)
        |SELECT a, b,
        |       round(1 - 2 * acos(least(1, greatest(-1, d / sqrt(nx.n2 * ny.n2)))) / pi(), 6) AS angular_sim
        |FROM dot
        |JOIN norm nx ON nx.name = dot.a
        |JOIN norm ny ON ny.name = dot.b""".stripMargin,
    // stage rows derived per m03Expected (see the scaladoc there)
    "m03_checkpointed_lineage" ->
      ("SELECT * FROM (VALUES\n" +
        m03Expected.map { case (st, n) => s"  ('$st', $n)" }.mkString(",\n") +
        "\n) AS t(stage, rows_out)"))

  // ================================================================ agg + sql surface

  private val aggAndSql: Map[String, (SparkSession, String) => DataFrame] = Map(
    // K6/K7 merge as a Spark aggregation: chunk-level sketches roll up to
    // the whole-document sketch (map-side combine; recombination property)
    "d07_sharded_sketch_merge" -> { (s, d) =>
      val cfg = docSketch
      val chunkSize = 100
      // shard each doc into fixed-size char chunks, sketch each chunk;
      // chunk sketches are dumped — the oracle replicates the merge
      // (bottom-128 of the distinct unsigned-sorted union) in SQL
      val chunkSketches = dumpDerived(s, d, "d07_chunk_sketches") {
        t(s, d, "documents").select(col("doc_id"),
            posexplode(expr(s"transform(sequence(0, int(floor((length(text)-1)/$chunkSize))), i -> substring(text, i*$chunkSize + 1, $chunkSize))"))
              .as(Seq("chunk_idx", "chunk")))
          .select(col("doc_id"), col("chunk_idx"),
            graft.functions.GraftFunctions.captionMinhash(col("chunk"), cfg).as("mins"))
      }
      // NOTE: chunk sketches use the same shingler; merging chunk sketches
      // equals sketching the set-union of chunk shingles (not of the whole
      // undivided text — k-grams crossing chunk borders differ), so the
      // roll-up is verified against the union-of-chunks sketch
      chunkSketches.groupBy(col("doc_id"))
        .agg(graft.functions.MinHashAgg.minhashMerge(col("mins"), cfg).as("merged"))
        .select(col("doc_id"), size(col("merged")).as("n_mins"),
          udf((a: Seq[Long]) => if (a.isEmpty) "" else java.lang.Long.toUnsignedString(a.head))
            .apply(col("merged")).as("first_min"))
    },
    // K6 ABUNDANCE-merge quirk surface — the reference's `merge` with
    // abundance handling (/root/reference/src/lib.rs:307-403) driven
    // end-to-end: each document is split into two halves, each half
    // sketched WITH abundance tracking (bottom-128), and the halves are
    // merged pairwise through MinHash.mergeWithAbundance. Two reference
    // quirks become observable columns the oracle must reproduce:
    //  (1) mins are re-truncated to num but abunds are NOT
    //      (lib.rs:400, the reference's own "TODO: reduce this one too")
    //      → n_abunds > n_mins whenever the union exceeds 128;
    //  (2) the merge of two UNTRACKED sketches still yields an abundance
    //      vector — empty, but present (lib.rs:392-400)
    //      → untracked_abunds_present / untracked_n_abunds.
    // The pairwise (not folded) formulation is deliberate: quirk (1)
    // makes a multi-way fold order-dependent (the intermediate's abunds
    // outrun its mins), so only the reference's own binary merge shape
    // has a deterministic oracle.
    "d10_abund_merge" -> { (s, d) =>
      val cfg = docSketch // num=128, ksize=4; tracking set by the UDF
      val halves = dumpDerived(s, d, "d10_half_sketches") {
        t(s, d, "documents").select(col("doc_id"),
            posexplode(expr("transform(sequence(0, 1), i -> substring(text, i * int(ceil(length(text)/2.0)) + 1, int(ceil(length(text)/2.0))))"))
              .as(Seq("half", "chunk")))
          .select(col("doc_id"), col("half"),
            graft.functions.GraftFunctions.captionMinhashAbund(col("chunk"), cfg).as("sk"))
          .select(col("doc_id"), col("half"),
            col("sk._1").as("mins"), col("sk._2").as("abunds"))
      }
      val a = halves.where(col("half") === 0)
        .select(col("doc_id"), col("mins").as("mins_a"), col("abunds").as("ab_a"))
      val b = halves.where(col("half") === 1)
        .select(col("doc_id"), col("mins").as("mins_b"), col("abunds").as("ab_b"))
      val localCfg = cfg
      val mergeUdf = udf((ma: Seq[Long], aa: Seq[Long], mb: Seq[Long], ab: Seq[Long]) => {
        val (m, abm) = graft.core.MinHash.mergeWithAbundance(
          ma.toArray, aa.toArray, mb.toArray, ab.toArray, localCfg)
        // quirk (2): the same merge with tracking OFF on both sides
        val (mu, abu) = graft.core.MinHash.mergeWithAbundance(
          ma.toArray, null, mb.toArray, null, localCfg)
        (m, abm, java.util.Arrays.equals(mu, m), abu != null, abu.length)
      })
      a.join(b, "doc_id")
        .withColumn("r", mergeUdf(col("mins_a"), col("ab_a"), col("mins_b"), col("ab_b")))
        .select(col("doc_id"),
          size(col("r._1")).as("n_mins"),
          size(col("r._2")).as("n_abunds"),
          expr("aggregate(r._2, 0L, (acc, x) -> acc + x)").as("sum_abund"),
          udf((m: Seq[Long]) =>
            if (m.isEmpty) "" else java.lang.Long.toUnsignedString(m.head))
            .apply(col("r._1")).as("first_min"),
          col("r._3").as("untracked_same_mins"),
          col("r._4").as("untracked_abunds_present"),
          col("r._5").as("untracked_n_abunds"))
    },
    // Q8 top-N report: threshold + orderBy + limit over linear search
    "sm04_search_topn" -> { (s, _) =>
      if (!refExists) s.emptyDataFrame.select()
      else {
        val db = SignatureJson.read(s, s"$refData/.sbt.v5/*")
        val cfg = graft.core.SketchConfig(num = 500, ksize = 31)
        val query = db.where(col("filename") === "SRR2060939_1.fastq.gz")
          .select(col("mins")).head().getSeq[Long](0).toArray
        SignatureSearch.linear(db, query, cfg, 0.08, "similarity")
          .orderBy(col("score").desc, col("filename"))
          .limit(3)
          .select(col("filename"), round(col("score"), 6).as("score"))
      }
    },
    // SQL surface: the custom kernels as registered Catalyst functions.
    // Gated by the d03 LSH candidate set — a within-source all-pairs join
    // grows quadratically with block size (the d02 boilerplate blowup one
    // scale-up later); the SQL functions are demonstrated on the bucketed
    // candidates instead, exactly as a 100-TB run would drive them.
    "d08_sql_jaccard" -> { (s, d) =>
      graft.functions.GraftExtensions.register(s)
      docSketches(s, d).createOrReplaceTempView("doc_sketches")
      docCandidates(s, d).createOrReplaceTempView("doc_candidates")
      s.sql(
        """SELECT c.a, c.b,
          |  round(graft_jaccard(sa.mins, sb.mins, 128), 6) AS jac,
          |  round(graft_containment(sa.mins, sb.mins), 6) AS containment
          |FROM doc_candidates c
          |JOIN doc_sketches sa ON sa.doc_id = c.a
          |JOIN doc_sketches sb ON sb.doc_id = c.b
          |WHERE graft_jaccard(sa.mins, sb.mins, 128) >= 0.5""".stripMargin)
    })

  private val aggAndSqlOracles: Map[String, String] = Map(
    "d07_sharded_sketch_merge" ->
      s"""WITH c AS (SELECT doc_id, mins FROM read_parquet(${oraclePath("d07_chunk_sketches")})),
         |docs AS (SELECT DISTINCT doc_id FROM c),
         |e AS (SELECT DISTINCT doc_id, unnest(mins) AS m FROM c),
         |r AS (SELECT doc_id, m,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY (m < 0), m) AS rk
         |  FROM e),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_mins,
         |    arg_min(CASE WHEN m < 0 THEN (m::HUGEINT + 18446744073709551616)::VARCHAR
         |                 ELSE m::VARCHAR END, rk) AS first_min
         |  FROM r WHERE rk <= 128 GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(a.n_mins, 0) AS n_mins,
         |  coalesce(a.first_min, '') AS first_min
         |FROM docs d LEFT JOIN agg a USING (doc_id)""".stripMargin,
    // abundance-merge replica from the dumped half sketches: union of
    // (hash → summed count) per doc in unsigned order; the quirk pair is
    // encoded structurally — n_mins caps at 128 (LEAST) while n_abunds is
    // the FULL union size, and the untracked columns are the constants
    // the reference's always-Some(abunds) branch produces. A "fixed"
    // implementation (truncating abunds with mins, or returning None)
    // flips n_abunds / untracked_abunds_present and fails the hash.
    "d10_abund_merge" ->
      s"""WITH h AS (SELECT doc_id, half, mins, abunds
         |           FROM read_parquet(${oraclePath("d10_half_sketches")})),
         |e AS (SELECT doc_id, unnest(mins) AS m, unnest(abunds) AS ab FROM h),
         |g AS (SELECT doc_id, m,
         |        CASE WHEN m < 0 THEN m::HUGEINT + 18446744073709551616
         |             ELSE m::HUGEINT END AS u,
         |        SUM(ab) AS a
         |      FROM e GROUP BY doc_id, m),
         |agg AS (SELECT doc_id, COUNT(*) AS n_union,
         |          CAST(SUM(a) AS BIGINT) AS sum_abund,
         |          arg_min(CASE WHEN m < 0
         |                       THEN (m::HUGEINT + 18446744073709551616)::VARCHAR
         |                       ELSE m::VARCHAR END, u) AS first_min
         |        FROM g GROUP BY doc_id),
         |docs AS (SELECT DISTINCT doc_id FROM h)
         |SELECT d.doc_id,
         |  COALESCE(LEAST(a.n_union, 128), 0) AS n_mins,
         |  COALESCE(a.n_union, 0) AS n_abunds,
         |  COALESCE(a.sum_abund, 0) AS sum_abund,
         |  COALESCE(a.first_min, '') AS first_min,
         |  true AS untracked_same_mins,
         |  true AS untracked_abunds_present,
         |  0 AS untracked_n_abunds
         |FROM docs d LEFT JOIN agg a USING (doc_id)""".stripMargin,
    // full replica over the LSH-gated candidates: bucketing/caps/pair-gen
    // from the band dump (candSql), combined-denominator jaccard (num=128,
    // jacSql) + one-sided containment from the sketch dump
    "d08_sql_jaccard" ->
      s"""WITH $candSql,
         |$jacSql,
         |cont AS (
         |  SELECT c.a, c.b,
         |    len(list_intersect(sa.mins, sb.mins)) * 1.0 / greatest(len(sa.mins), 1) AS ct
         |  FROM cand c
         |  JOIN sk sa ON sa.doc_id = c.a
         |  JOIN sk sb ON sb.doc_id = c.b)
         |SELECT jac.a, jac.b, round(jac.jac_est, 6) AS jac, round(cont.ct, 6) AS containment
         |FROM jac JOIN cont ON jac.a = cont.a AND jac.b = cont.b
         |WHERE jac.jac_est >= 0.5""".stripMargin)

  // ================================================================ assembled

  val all: Map[String, (SparkSession, String) => DataFrame] =
    relational ++ dedup ++ text ++ docDedup ++ fingerprints ++ embeddings ++
      multimodal ++ streaming ++ streamingDedup ++ sourmash ++ aggAndSql

  val oracles: Map[String, String] =
    relationalOracles ++ dedupOracles ++ textOracles ++ embeddingOracles ++
      streamingOracles ++ docDedupOracles ++ deconBloomOracle ++
      fingerprintOracles ++ aggAndSqlOracles ++ multimodalOracles ++
      sourmashOracles
}
