package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.SketchConfig
import graft.operators.{SignatureSearch, SparkTestSession}
import graft.sources.{FinchJson, SignatureJson}

/** End-to-end drive of the assembled `search` CLI (the reference's entry
  * point, main.rs:166-268) on the v5 fixture: flag parse → load →
  * search → report/CSV/save-matches, reproducing the sm04 golden top-3. */
class SearchCliSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val refData = "/root/reference/tests/data"
  private def assumeFixtures(): Unit =
    assume(new java.io.File(refData).isDirectory, "reference fixtures not present")

  test("parse: full flag surface incl. positionals") {
    val cfg = SearchCli.parse(Array(
      "--traverse-directory", "-q", "--threshold", "0.08", "--best-only",
      "-n", "5", "--containment", "--ignore-abundance", "--scaled", "1000",
      "-o", "/tmp/x.csv", "--save-matches", "/tmp/m", "-k", "31",
      "query.sig", "db1.sig", "db2"))
    assert(cfg.traverseDirectory && cfg.quiet && cfg.bestOnly &&
      cfg.containment && cfg.ignoreAbundance)
    assert(cfg.threshold === 0.08 && cfg.numResults === 5 &&
      cfg.scaled === 1000L && cfg.ksize === 31)
    assert(cfg.output === Some("/tmp/x.csv") && cfg.saveMatches === Some("/tmp/m"))
    assert(cfg.query === "query.sig" && cfg.databases === Seq("db1.sig", "db2"))
    intercept[IllegalArgumentException](SearchCli.parse(Array("--nope", "q", "d")))
    intercept[IllegalArgumentException](SearchCli.parse(Array("onlyquery")))
  }

  test("main on the v5 fixture reproduces the sm04 top-3; CSV parses; saved matches reload") {
    assumeFixtures()
    spark // force the session so main() adopts it instead of building one
    // stage the extension-less v5 leaves as *.sig under a temp root (two
    // nesting levels — exercises --traverse-directory's recursive lookup)
    val dbRoot = Files.createTempDirectory("cli_db")
    val nested = Files.createDirectories(dbRoot.resolve("nested"))
    val leaves = new java.io.File(s"$refData/.sbt.v5").listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("internal"))
    assert(leaves.length === 7)
    leaves.zipWithIndex.foreach { case (f, i) =>
      val dst = (if (i % 2 == 0) dbRoot else nested).resolve(f.getName + ".sig")
      Files.copy(f.toPath, dst)
    }
    val query = s"$refData/.sbt.v5/60f7e23c24a8d94791cc7a8680c493f9" // SRR2060939_1
    val csvDir = Files.createTempDirectory("cli_csv").toString + "/report.csv"
    val saveDir = Files.createTempDirectory("cli_save").toString

    SearchCli.main(Array(
      "--threshold", "0.08", "-n", "3", "-k", "31", "--traverse-directory",
      "-o", csvDir, "--save-matches", saveDir,
      query, dbRoot.toString))

    // CSV: upstream fieldnames, sm04's golden top-3 in score order
    val csv = spark.read.option("header", "true").csv(csvDir)
      .select(col("filename"), round(col("similarity").cast("double"), 3).as("s"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(csv.toSeq === Seq(
      ("SRR2060939_1.fastq.gz", 1.0),
      ("SRR2060939_2.fastq.gz", 0.356),
      ("SRR2255622_1.fastq.gz", 0.086)))

    // saved matches: loadable signature JSON, one per match above threshold
    val saved = SignatureJson.read(spark, s"$saveDir/*.sig")
    assert(saved.count() === 3)
    assert(saved.select("filename").collect().map(_.getString(0)).toSet ===
      Set("SRR2060939_1.fastq.gz", "SRR2060939_2.fastq.gz", "SRR2255622_1.fastq.gz"))
    // and the saved sketches re-search identically (round-trip integrity)
    val q500 = SignatureJson.read(spark, query)
      .select(col("mins")).head().getSeq[Long](0).toArray
    val again = SignatureSearch.linear(saved, q500,
      SketchConfig(num = 500, ksize = 31), 0.08, "similarity")
    assert(again.count() === 3)
  }

  test("--best-only main path prints a single row (and --scaled cuts both sides)") {
    assumeFixtures()
    spark
    val query = s"$refData/.sbt.v5/60f7e23c24a8d94791cc7a8680c493f9"
    val csvDir = Files.createTempDirectory("cli_best").toString + "/best.csv"
    SearchCli.main(Array(
      "--threshold", "0.5", "--best-only", "-k", "31", "-q",
      "-o", csvDir, query, s"$refData/.sbt.v5/60f7e23c24a8d94791cc7a8680c493f9"))
    val rows = spark.read.option("header", "true").csv(csvDir).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("filename") === "SRR2060939_1.fastq.gz")
  }

  test("--scaled + abundance mode: db abundances are cut in parallel with mins") {
    // regression: the --scaled path rewrote db `mins` but left
    // `abundances` full-length, so abundance-mode scoring crashed on the
    // length mismatch for any sketch the cut actually shortened
    def sig(name: String, mins: Seq[String], abunds: Seq[String]): String =
      s"""[{"class":"sourmash_signature","email":"","hash_function":"0.murmur64",""" +
        s""""filename":"$name.sig","name":"$name","license":"CC0","signatures":[""" +
        s"""{"num":0,"ksize":21,"seed":42,"max_hash":"9223372036854775808",""" +
        s""""md5sum":"deadbeef","mins":[${mins.mkString(",")}],""" +
        s""""abundances":[${abunds.mkString(",")}],"molecule":"DNA"}],"version":0.4}]"""
    val dir = Files.createTempDirectory("cli_scaled_abund")
    Files.writeString(dir.resolve("q.sig"),
      sig("q", Seq("10", "200000"), Seq("3", "7")))
    // 9e18 > maxHash(scaled=4) = 4611686018427387904 -> the cut shortens
    // this sketch; pre-fix: IllegalArgumentException in the score UDF
    Files.writeString(dir.resolve("db.sig"),
      sig("db", Seq("10", "200000", "9000000000000000000"), Seq("2", "5", "9")))
    val (results, _) = SearchCli.search(spark, SearchCli.parse(Array(
      "--threshold", "0.01", "--scaled", "4", "-k", "21",
      dir.resolve("q.sig").toString, dir.resolve("db.sig").toString)))
    val rows = results.select("name", "score").collect()
    assert(rows.length === 1 && rows.head.getString(0) === "db")
    val score = rows.head.getDouble(1)
    // surviving vectors (3,7) vs (2,5): cos ≈ 0.9997 → angular ≈ 0.984
    assert(score > 0.97, s"near-identical surviving (min, abund) pairs should score ~1, got $score")
  }

  test("indexed abundance search forwards query abundances (== linear, != flat)") {
    // the round-4 ADVICE medium: indexed() silently scored with flat
    // abundances. Pin: indexed == linear with real abunds, and real
    // abunds genuinely change scores vs flat.
    val path = Files.createTempDirectory("cli_finch").toString + "/demo.json"
    FinchJson.writeDemoFixture(path)
    val db = FinchJson.toMinHash(FinchJson.read(spark, path))
      .withColumn("filename", col("name"))
      .withColumn("md5sum", col("name"))
    val q = db.orderBy("name").select("mins", "abunds").head()
    val qm = q.getSeq[Long](0).toArray
    val qa = q.getSeq[Long](1).toArray
    assert(qa.exists(_ > 1L)) // the fixture genuinely tracks multiplicities
    val cfg = SketchConfig(num = 0)
    val idx = Files.createTempDirectory("cli_idx").toString + "/idx.parquet"
    SignatureSearch.buildIndex(db, idx)
    def scores(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
      df.select(col("name"), round(col("score"), 9).as("s"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val lin = scores(SignatureSearch.linear(db, qm, cfg, 0.01, "abundance", qa))
    val ind = scores(SignatureSearch.indexed(db, idx, qm, cfg, 0.01, "abundance", qa))
    assert(lin.nonEmpty && lin === ind)
    val flat = scores(SignatureSearch.linear(db, qm, cfg, 0.01, "abundance", null))
    assert(lin !== flat, "flat-abundance scores should differ from tracked ones")
  }
}
