package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage wall timing of the decontamination family's
  * building blocks (used to localize unexpected per-query bench cost;
  * not part of the library surface). Reuses the SAME kernels the
  * registered queries run ([[Queries.gramHashes]]/[[Queries.deconScore]])
  * so the timings correspond to the real stages. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "33554432")
      .config("spark.ui.enabled", "false")
      .appName("devprobe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(label: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($r)")
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    time("scan count")(docs.count())
    val grams = Queries.gramHashes(docs)
      .withColumn("ev", col("doc_id") % 43 === 0)
    time("gram explode count")(grams.count())
    time("gram explode count again")(grams.count())
    time("dump write")(grams.write.mode("overwrite")
      .parquet("/tmp/probe_decon.parquet"))
    val dumped = spark.read.parquet("/tmp/probe_decon.parquet")
    val eg = dumped.where(col("ev")).select(col("gh")).distinct()
      .withColumn("hit", lit(1L))
    time("eval distinct count")(eg.count())
    val scored = Queries.deconScore(dumped.where(!col("ev")), eg)
    time("score")(scored.write.format("noop").mode("overwrite").save())
    time("score again")(scored.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
