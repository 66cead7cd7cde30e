package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{MinHash, SketchConfig, Shingles}
import graft.operators.SparkTestSession

class AggSqlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("MinHashMergeAgg: chunk sketches roll up to the union sketch (K6/K7 recombination)") {
    import spark.implicits._
    val cfg = SketchConfig(num = 64, ksize = 4)
    val docs = Seq(
      (1L, Seq("the quick brown fox", " jumps over the lazy", " dog in the morning sun")),
      (2L, Seq("completely different content here", " with more words to shingle")))
    val rows = docs.flatMap { case (id, chunks) => chunks.map(c => (id, c)) }
    val chunkSketches = rows.toDF("doc_id", "chunk")
      .select($"doc_id", GraftFunctions.captionMinhash($"chunk", cfg).as("mins"))
    val merged = chunkSketches.groupBy($"doc_id")
      .agg(MinHashAgg.minhashMerge($"mins", cfg).as("merged"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    docs.foreach { case (id, chunks) =>
      val unionHashes = chunks.flatMap(c => Shingles.charShingleHashes(c, 4, 42L)).toArray
      val expect = MinHash.sketchHashes(unionHashes, cfg).toList
      assert(merged(id) === expect, s"doc $id")
    }
  }

  test("SQL surface: graft_jaccard/containment/band_keys usable from spark.sql") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val cfg = SketchConfig(num = 32, ksize = 3)
    Seq(("x", "the quick brown fox jumps over the lazy dog by the river bend"),
        ("y", "the quick brown fox jumped over the lazy dog by the river bend"))
      .toDF("id", "text")
      .select($"id", GraftFunctions.captionMinhash($"text", cfg).as("mins"))
      .createOrReplaceTempView("sqlspec_sketches")
    val row = spark.sql(
      """SELECT graft_jaccard(a.mins, b.mins, 32) AS jac,
        |  graft_containment(a.mins, b.mins) AS cont,
        |  size(graft_band_keys(a.mins, 8, 4)) AS nbands
        |FROM sqlspec_sketches a JOIN sqlspec_sketches b
        |ON a.id = 'x' AND b.id = 'y'""".stripMargin).head()
    assert(row.getDouble(0) > 0.5 && row.getDouble(0) < 1.0)
    assert(row.getDouble(1) > 0.5)
    assert(row.getInt(2) === 8)

    // graft_angular: kernel golden (sm07's hand-computed case) + the
    // flat-abundance identity (all-ones abunds of a self-pair → 1.0)
    val ang = spark.sql(
      """SELECT round(graft_angular(array(2L, 5L, 9L), array(3L, 2L, 1L),
        |                           array(2L, 5L, 7L), array(1L, 4L, 2L)), 9) AS s,
        |       graft_angular(a.mins, array_repeat(1L, size(a.mins)),
        |                     a.mins, array_repeat(1L, size(a.mins))) AS self
        |FROM sqlspec_sketches a WHERE a.id = 'x'""".stripMargin).head()
    val angExp = 1.0 - 2.0 * math.acos(11.0 / math.sqrt(294.0)) / math.Pi
    assert(math.abs(ang.getDouble(0) - math.rint(1e9 * angExp) / 1e9) < 1e-12)
    assert(math.abs(ang.getDouble(1) - 1.0) < 1e-12)

    // graft_downsample: unsigned prefix cut at scaled->maxHash, and the
    // kernel-twin equivalence on a sketch that wraps past 2^63
    val ds = spark.sql(
      // scaled=2 -> max_hash = 2^63: keeps the wrapped Long.MinValue
      // (= 2^63 unsigned) and drops -2 (= 2^64-2)
      """SELECT graft_downsample(array(1L, 9L, 9223372036854775807L,
        |                              -9223372036854775808L, -2L), 2) AS cut,
        |       graft_downsample(a.mins, 1) AS keep_all
        |FROM sqlspec_sketches a WHERE a.id = 'x'""".stripMargin).head()
    assert(ds.getSeq[Long](0) ===
      Seq(1L, 9L, Long.MaxValue, Long.MinValue))
    val minsX = spark.sql("SELECT mins FROM sqlspec_sketches WHERE id = 'x'")
      .head().getSeq[Long](0)
    assert(ds.getSeq[Long](1) === minsX) // scaled=1 keeps every hash
  }

  test("S3 compressed-input analog: gzipped signature JSON reads transparently") {
    val ref = "/root/reference/tests/data/genome-s10+s11.sig"
    assume(new java.io.File(ref).isFile)
    val tmp = java.nio.file.Files.createTempDirectory("siggz")
    val gz = tmp.resolve("genome.sig.gz")
    val in = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(ref))
    val out = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(gz))
    out.write(in); out.close()
    val df = graft.sources.SignatureJson.read(spark, gz.toString)
    assert(df.count() === 4)
  }
}
