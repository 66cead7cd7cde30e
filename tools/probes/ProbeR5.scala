package graft

// Temporary round-5 diagnosis probe (not part of the library surface):
// why do ~9% of capedit pairs go undetected at n=100k when 100% are
// caught at n=2000? Classifies each missed ground-truth pair as
// candidate-stage loss vs confirm-stage loss and prints the phash-block
// bucket heat that explains it.
object ProbeR5 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators._
    import graft.sources.SyntheticCorpus
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "33554432")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = 100000L
    val cfg = DedupConfig()
    val corpus = SyntheticCorpus.corpus(spark, n).toDF()
    val sk = DedupPipeline.sketches(corpus, cfg)
    val tagged = DedupPipeline.exactDedupWindowed(sk).persist()
    val skReps = tagged.where(col("image_id") === col("rep"))
    val cands = DedupPipeline.candidates(skReps, cfg).persist()

    val gt = SyntheticCorpus.groundTruth(spark, n).toDF()
      .where(col("kind") === "capedit")
      .select(xxhash64(col("dup_id")).as("v1"), xxhash64(col("src_id")).as("v2"),
        col("dup_id"), col("src_id"))
      .withColumn("a", least(col("v1"), col("v2")))
      .withColumn("b", greatest(col("v1"), col("v2"))).persist()
    println(s"capedit gt pairs: ${gt.count()}")

    val inCand = gt.join(cands, Seq("a", "b"), "left_semi")
    println(s"in candidates: ${inCand.count()}")
    val missedCand = gt.join(cands, Seq("a", "b"), "left_anti").persist()
    println(s"NOT in candidates: ${missedCand.count()}")

    // of the candidate pairs, which fail confirm?
    val scored = DedupPipeline.scores(
      gt.select(col("a"), col("b")).join(cands, Seq("a", "b"), "left_semi"),
      skReps, cfg, lcsAll = true).persist()
    val notEdge = scored.where(!DedupPipeline.edgeRule(cfg))
    println(s"candidate but FAILS confirm: ${notEdge.count()}")
    notEdge.select("a", "b", "img_sim", "cap_sim", "ph_ham", "sh_ham",
      "cap_contain", "cap_lcs").show(10, false)

    // missed-at-candidate pairs: phash hamming + which block collides
    val ph = sk.select(col("vid"), col("phash"))
    val missedPh = missedCand
      .join(ph.select(col("vid").as("v1"), col("phash").as("p1")), "v1")
      .join(ph.select(col("vid").as("v2"), col("phash").as("p2")), "v2")
      .withColumn("ham", bit_count(col("p1").bitwiseXOR(col("p2"))))
    println("missed-pair phash hamming distribution:")
    missedPh.groupBy("ham").count().orderBy("ham").show(20)

    // FALSE-MERGE hunt: confirm edges whose endpoints belong to different
    // ground-truth components (any such edge fuses two expected clusters)
    val gtAll = SyntheticCorpus.groundTruth(spark, n).toDF()
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    gtAll.collect().foreach { row =>
      val (d, s) = (row.getString(0), row.getString(1))
      val (ra, rb) = (find(d), find(s))
      if (ra != rb) { val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra); parent(hi) = lo }
    }
    val comp = spark.sparkContext.broadcast(
      (0L until n).map(i => s"img_$i").map(id => id -> find(id)).toMap)
    val vid2id = tagged.select(col("vid"), col("image_id")).as[(Long, String)]
      .collect().toMap
    val v2i = spark.sparkContext.broadcast(vid2id)
    val allScores = DedupPipeline.scores(cands, skReps, cfg, lcsAll = true)
      .where(DedupPipeline.edgeRule(cfg)).persist()
    val bad = allScores.filter(r => {
      val ia = v2i.value(r.getAs[Long]("a")); val ib = v2i.value(r.getAs[Long]("b"))
      comp.value(ia) != comp.value(ib)
    })
    println(s"FALSE confirm edges: ${bad.count()}")
    val rules = DedupPipeline.edgeRules(cfg)
    bad.select((Seq(col("a"), col("b"), col("img_sim"), col("cap_sim"),
        col("ph_ham"), col("sh_ham"), col("cap_contain"), col("cap_lcs")) ++
        rules.map { case (nm, c) => c.as(nm) }): _*).show(30, false)

    // TRUE-pair score distributions per kind (what floors can we afford?)
    val gtScored = DedupPipeline.scores(
      gtAll.select(xxhash64(col("dup_id")).as("v1"), xxhash64(col("src_id")).as("v2"),
          col("kind"))
        .select(least(col("v1"), col("v2")).as("a"),
          greatest(col("v1"), col("v2")).as("b"), col("kind")),
      skReps, cfg, lcsAll = true)
    println("TRUE pair score stats per kind:")
    gtScored.groupBy("kind").agg(
      count(lit(1)).as("n"),
      min(col("img_sim")).as("min_img"), expr("percentile(img_sim, 0.05)").as("p5_img"),
      max(col("ph_ham")).as("max_ph"), expr("percentile(ph_ham, 0.95)").as("p95_ph"),
      min(col("cap_sim")).as("min_cap"), min(col("cap_lcs")).as("min_lcs"),
      min(col("cap_contain")).as("min_cont"), max(col("sh_ham")).as("max_sh"))
      .orderBy("kind").show(20, false)
    println("FALSE edge img_sim distribution:")
    bad.agg(max(col("img_sim")).as("max_img"),
      expr("percentile(img_sim, 0.99)").as("p99_img"),
      min(col("ph_ham")).as("min_ph"), max(col("cap_lcs")).as("max_lcs"),
      max(col("cap_sim")).as("max_cap"), max(col("cap_contain")).as("max_cont"),
      min(col("sh_ham")).as("min_sh")).show(false)

    // PROPOSED rule set: every non-image rule corroborated by at least
    // minimal pixel agreement (img_sim > 0 = >= 1 shared shingle) or a
    // near-exact phash where the true kinds guarantee one
    def proposed: org.apache.spark.sql.Column = {
      val imgAny = col("img_sim") > 0.0
      (col("img_sim") >= 0.35) ||
      (col("cap_sim") >= 0.92 && (imgAny || col("ph_ham") <= 3)) ||
      (col("ph_ham") <= 3 && col("cap_sim") >= 0.3 && imgAny) ||
      (col("sh_ham") <= 3 && col("cap_sim") >= 0.8 && (imgAny || col("ph_ham") <= 3)) ||
      (col("cap_lcs") >= 20 && col("cap_contain") >= 0.9 && col("img_sim") >= 0.15) ||
      (col("cap_lcs") >= 30 && col("ph_ham") <= 3 && imgAny)
    }
    val badP = allScores.where(proposed).filter(r => {
      val ia = v2i.value(r.getAs[Long]("a")); val ib = v2i.value(r.getAs[Long]("b"))
      comp.value(ia) != comp.value(ib)
    })
    println(s"PROPOSED rules: false edges = ${badP.count()}")
    badP.select(col("a"), col("b"), col("img_sim"), col("cap_sim"), col("ph_ham"),
      col("sh_ham"), col("cap_contain"), col("cap_lcs")).show(20, false)
    println("PROPOSED rules: per-kind recall on true candidate pairs:")
    gtScored.withColumn("hit", when(proposed, 1L).otherwise(0L))
      .groupBy("kind").agg(count(lit(1)).as("n"), sum(col("hit")).as("hits"))
      .orderBy("kind").show(20, false)

    // 3-block joint key heat under the Manku scheme
    val blocks = skReps.select(explode(graft.functions.GraftFunctions
      .fingerprintBandsHamming(col("phash"))).as("bk"))
      .groupBy("bk").count()
    println("phash 3-block joint bucket size distribution (top):")
    blocks.orderBy(col("count").desc).show(10)
    println(s"joint buckets over maxBucket=${cfg.maxBucket}: " +
      blocks.where(col("count") > cfg.maxBucket).count() +
      " carrying " + blocks.where(col("count") > cfg.maxBucket)
        .agg(coalesce(sum(col("count")), lit(0L))).head().getLong(0) + " entries " +
      s"of ${blocks.agg(sum(col("count"))).head().getLong(0)} total")
    spark.stop()
  }
}
