package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._
import graft.functions.GraftFunctions._
import graft.sources.SyntheticCorpus

/** Dev-only: candidate-pair volume per LSH source (flood diagnosis). */
object BenchProbe4 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "300000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = DedupConfig()
    val sk = DedupPipeline.sketches(SyntheticCorpus.corpus(spark, n).toDF(), cfg).persist()
    sk.count()
    def srcCount(name: String, banded: org.apache.spark.sql.DataFrame, cap: Int): Unit = {
      val (keptB, dropped, maxB) = Lsh.bucketStats(banded, cap)
      val pairs = Lsh.candidatePairs(banded, cap).count()
      println(f"[probe4] $name%-10s pairs=$pairs%10d buckets>=2=$keptB%9d dropped=$dropped%6d maxBucket=$maxB%8d")
    }
    srcCount("caption", Lsh.explodeBands(sk.select(col("vid").as("id"),
      minhashBands(col("cap_mins"), cfg.capBands, cfg.capRowsPerBand, cfg.capSketch.seed).as("bk")),
      "id", "bk", 1), cfg.maxBucket)
    srcCount("image", Lsh.explodeBands(sk.select(col("vid").as("id"),
      minhashBands(col("img_mins"), cfg.imgBands, cfg.imgRowsPerBand, cfg.imgSketch.seed).as("bk")),
      "id", "bk", 2), cfg.maxBucket)
    srcCount("phash", Lsh.explodeBands(sk.select(col("vid").as("id"),
      fingerprintBands(col("phash"), cfg.fpBands).as("bk")), "id", "bk", 3), cfg.fpMaxBucket)
    srcCount("simhash", Lsh.explodeBands(sk.select(col("vid").as("id"),
      fingerprintBands(col("cap_simhash"), cfg.fpBands).as("bk")), "id", "bk", 4), cfg.fpMaxBucket)
    spark.stop()
  }
}
