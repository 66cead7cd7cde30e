package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.SyntheticCorpus
import graft.functions.GraftFunctions._

/** Dev-only: confirm-stage breakdown. */
object BenchProbe2 {
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[probe2] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val cfg = DedupConfig()
    val corpus = SyntheticCorpus.corpus(spark, n).toDF()
    val sk = DedupPipeline.sketches(corpus, cfg).persist()
    sk.count()
    val cands = DedupPipeline.candidates(sk, cfg).persist()
    println("[probe2] n_cands = " + cands.count())
    val a = sk.select(col("image_id").as("a"), col("cap_mins").as("cap_a"),
      col("img_mins").as("img_a"), col("cap_simhash").as("sh_a"),
      col("phash").as("ph_a"), col("cap_norm").as("cn_a"))
    val b = sk.select(col("image_id").as("b"), col("cap_mins").as("cap_b"),
      col("img_mins").as("img_b"), col("cap_simhash").as("sh_b"),
      col("phash").as("ph_b"), col("cap_norm").as("cn_b"))
    time("join only") {
      println("joined rows = " + cands.join(a, "a").join(b, "b").count())
    }
    val joined = cands.join(a, "a").join(b, "b").persist()
    joined.count()
    time("img_sim udf on joined") {
      joined.withColumn("img_sim", jaccard(col("img_a"), col("img_b"), cfg.imgSketch))
        .agg(sum(col("img_sim"))).collect()
    }
    time("all scores") {
      DedupPipeline.confirm(cands, sk, cfg).count()
    }
    joined.explain("formatted")
    spark.stop()
  }
}
