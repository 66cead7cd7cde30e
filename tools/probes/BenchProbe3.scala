package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import graft.operators._
import graft.sources.SyntheticCorpus
import scala.collection.mutable

/** Dev-only: per-stage wall/task-time accounting for the flagship run. */
object BenchProbe3 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "300000").toLong
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

    case class St(name: String, wallMs: Long, taskMs: Long, tasks: Int)
    val stages = mutable.ArrayBuffer[St]()
    var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(0L)
        stages += St(si.name.takeWhile(_ != '\n').take(60), wall,
          si.taskMetrics.executorRunTime, si.numTasks)
      }
    })

    val t0 = System.nanoTime()
    DedupPipeline.clusters(SyntheticCorpus.corpus(spark, n).toDF())
      .write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"[probe3] cpus=$cpus n=$n total=$total%.1f s jobs=$jobs stages=${stages.size}")
    println(f"[probe3] sum stage wall = ${stages.map(_.wallMs).sum / 1e3}%.1f s; " +
      f"sum task time = ${stages.map(_.taskMs).sum / 1e3}%.1f core-s")
    stages.sortBy(-_.wallMs).take(20).foreach { s =>
      println(f"[probe3]   ${s.wallMs}%6d ms wall ${s.taskMs}%8d ms task ${s.tasks}%4d tasks  ${s.name}")
    }
    spark.stop()
  }
}
