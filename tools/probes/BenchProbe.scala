package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.SyntheticCorpus

/** Dev-only stage profiler for the flagship pipeline. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "60000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "33554432")
      // shuffle spill on tmpfs: on a real cluster every executor brings its
      // own local disks (shuffle bandwidth scales with cluster size); a
      // single shared virtual disk in local mode is an artificial serial
      // resource that would understate multi-executor scaling
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) {
          val d = new java.io.File("/dev/shm/graft-spark"); d.mkdirs()
          d.getAbsolutePath
        } else System.getProperty("java.io.tmpdir"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val cfg = DedupConfig()
    val corpus = SyntheticCorpus.corpus(spark, n).toDF()
    if (sys.env.get("SPARK_GRAFT_FULL_ONLY").contains("1")) {
      // tiny warmup to JIT kernels, then the timed end-to-end run only
      SyntheticCorpus.corpus(spark, 2000L).toDF()
        .write.format("noop").mode("overwrite").save()
      time("full clusters") {
        DedupPipeline.clusters(corpus, cfg).write.format("noop").mode("overwrite").save()
      }
      spark.stop()
      return
    }
    time("gen only (noop)") {
      corpus.write.format("noop").mode("overwrite").save()
    }
    val sk = DedupPipeline.sketches(corpus, cfg).persist()
    time("sketches (materialize)") { sk.count() }
    val (reps, exactEdges) = DedupPipeline.exactDedup(sk)
    val repIds = reps.select(col("rep").as("image_id"))
    val skReps = sk.join(repIds, Seq("image_id"), "left_semi").persist()
    time("exact dedup + semi") { skReps.count() }
    val cands = DedupPipeline.candidates(skReps, cfg).persist()
    time("lsh candidates") { cands.count() }
    val near = DedupPipeline.confirm(cands, skReps, cfg).select(col("a"), col("b")).persist()
    time("confirm") { near.count() }
    // keep edges in vid space: exactEdges carries image_id strings (hash
    // them once), near already carries vids (do NOT re-hash — double
    // hashing would orphan every near edge from the node set)
    val edges = exactEdges
      .select(xxhash64(col("a")).as("src"), xxhash64(col("b")).as("dst"))
      .union(near.select(col("a").as("src"), col("b").as("dst")))
    val nodes = sk.select(xxhash64(col("image_id")).as("id"))
    time("connected components") {
      ConnectedComponents.labelAll(nodes, edges, cfg.ccMaxIter)
        .write.format("noop").mode("overwrite").save()
    }
    time("full clusters") {
      DedupPipeline.clusters(corpus, cfg).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
