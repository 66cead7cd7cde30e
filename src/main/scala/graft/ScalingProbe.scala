package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{ConnectedComponents, DedupConfig, DedupPipeline}
import graft.sources.SyntheticCorpus

/** TEMPORARY diagnostics: wall time (and optional per-phase breakdown) of
  * the flagship pipeline at several parallelism levels, to locate the
  * serial/non-scaling terms behind the scaling-efficiency gate. Not part
  * of the library surface. */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "600000").toLong
    val partsOverride = sys.env.getOrElse("SPARK_GRAFT_PARTS", "0").toInt
    val phases = sys.env.get("SPARK_GRAFT_PHASES").contains("1")
    // either a list of local[N] core counts, or full master strings
    // (';'-separated, e.g. "local-cluster[4,1,6144];local-cluster[1,1,6144]")
    val masters: Seq[(String, Int)] = sys.env.get("SPARK_GRAFT_MASTERS") match {
      case Some(ms) => ms.split(";").toSeq.map { m =>
        // total cores: local[N] = N; local-cluster[W,C,mem] = W*C
        val nums = "\\d+".r.findAllIn(m).map(_.toInt).toSeq
        val cores =
          if (m.startsWith("local-cluster") && nums.length >= 2) nums(0) * nums(1)
          else nums.headOption.getOrElse(
            throw new IllegalArgumentException(
              s"ScalingProbe: cannot infer a core count from master '$m'"))
        (m, cores)
      }
      case None => sys.env.getOrElse("SPARK_GRAFT_CPUS_LIST", "16,4").split(",").toSeq
        .map(c => (s"local[$c]", c.toInt))
    }
    val appClasses = classOf[graft.sources.ImageRow].getProtectionDomain
      .getCodeSource.getLocation.getPath

    for ((master, cpus) <- masters) {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val spark = SparkSession.builder()
        .master(master)
        .config("spark.executor.memory", "6g")
        .config("spark.executor.extraClassPath", appClasses)
        .appName(s"scaling-probe-$cpus")
        .config("spark.sql.shuffle.partitions",
          (if (partsOverride > 0) partsOverride else cpus).toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "33554432")
        .config("spark.local.dir",
          if (new java.io.File("/dev/shm").isDirectory) {
            val d = new java.io.File("/dev/shm/graft-spark"); d.mkdirs()
            d.getAbsolutePath
          } else System.getProperty("java.io.tmpdir"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")

      // stage-level accounting: wall vs summed task time exposes serial
      // bottlenecks (sum(task)/wall ≈ cores ⇒ parallel; ≪ ⇒ serialized)
      if (sys.env.get("SPARK_GRAFT_STAGES").contains("1")) {
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
            val taskSum = si.taskMetrics.executorRunTime / 1000.0
            val gc = si.taskMetrics.jvmGCTime / 1000.0
            val cpu = si.taskMetrics.executorCpuTime / 1e9
            if (wall > 0.3)
              println(f"  stage ${si.stageId}%4d tasks=${si.numTasks}%4d wall=$wall%7.2f run=$taskSum%8.2f cpu=$cpu%8.2f gc=$gc%6.2f  ${si.name.takeWhile(_ != '\n').take(60)}")
          }
        })
      }

      // warmup
      SyntheticCorpus.corpus(spark, 2000L).toDF()
        .write.format("noop").mode("overwrite").save()

      def phase(name: String)(body: => Unit): Double = {
        val p0 = System.nanoTime()
        body
        val sec = (System.nanoTime() - p0) / 1e9
        println(f"  phase $name%-16s $sec%8.2f s")
        sec
      }

      val genParts = if (partsOverride > 0) partsOverride else 0
      val t0 = System.nanoTime()
      if (phases) {
        val cfg = DedupConfig()
        val corpus = SyntheticCorpus.corpus(spark, n, genParts).toDF()
        phase("gen")(corpus.write.format("noop").mode("overwrite").save())
        val tagged = DedupPipeline.exactDedupWindowed(
          DedupPipeline.sketches(corpus, cfg)).persist()
        phase("sketch+window")(tagged.count())
        val skReps = tagged.where(col("image_id") === col("rep"))
        val cands = DedupPipeline.candidates(skReps, cfg).persist()
        phase("lsh-candidates")(println(s"  cands=${cands.count()}"))
        val near = DedupPipeline.confirm(cands, skReps, cfg)
          .select(col("a").as("src"), col("b").as("dst")).persist()
        phase("confirm")(println(s"  near=${near.count()}"))
        val edges = tagged.where(col("image_id") =!= col("rep"))
          .select(col("vid").as("src"), xxhash64(col("rep")).as("dst"))
          .union(near)
        val lbl = ConnectedComponents.run(edges, cfg.ccMaxIter)
        phase("cc")(lbl.count())
        val idmap = tagged.select(col("image_id"), col("vid"))
        // relabel from the labels already computed — clustersFromEdges
        // would re-run the whole CC loop and double-count it here
        phase("relabel") {
          val labels = lbl.select(col("id").as("vid"), col("component"))
          val w = org.apache.spark.sql.expressions.Window.partitionBy(col("component"))
          idmap.join(labels, Seq("vid"), "left")
            .select(col("image_id"),
              coalesce(col("component"), col("vid")).as("component"))
            .withColumn("cluster", min(col("image_id")).over(w))
            .withColumn("cluster_size", count(lit(1)).over(w))
            .select(col("image_id"), col("cluster"), col("cluster_size"))
            .write.format("noop").mode("overwrite").save()
        }
      } else {
        val cache = new graft.operators.CacheHandle()
        DedupPipeline.clusters(SyntheticCorpus.corpus(spark, n, genParts).toDF(), cache = cache)
          .write.format("noop").mode("overwrite").save()
        cache.release()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"== master=$master n=$n wall=$wall%.2f s")
      spark.stop()
    }
  }
}
