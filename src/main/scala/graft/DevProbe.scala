package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage wall timing of a query's building blocks
  * (used to localize unexpected per-query bench cost; not part of the
  * library surface). */
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
    val grams = docs.where(length(col("text")) >= 13)
      .select(col("doc_id"),
        explode(expr("array_distinct(transform(sequence(1, length(text)-12), i -> xxhash64(substring(text, i, 13))))")).as("gh"))
    time("gram explode count")(grams.count())
    time("gram explode count again")(grams.count())
    val withEv = grams.withColumn("ev", col("doc_id") % 43 === 0)
    time("dump write")(withEv.write.mode("overwrite")
      .parquet("/tmp/probe_decon.parquet"))
    val dumped = spark.read.parquet("/tmp/probe_decon.parquet")
    val eg = dumped.where(col("ev")).select(col("gh")).distinct()
      .withColumn("hit", lit(1L))
    time("eval distinct count")(eg.count())
    val scored = dumped.where(!col("ev"))
      .join(broadcast(eg), Seq("gh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .where(col("n_hit") > 0)
    time("score")(scored.write.format("noop").mode("overwrite").save())
    time("score again")(scored.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
