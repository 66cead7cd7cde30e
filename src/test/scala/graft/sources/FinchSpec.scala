package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Murmur3, SketchBuilder, SketchConfig, U64}
import graft.operators.SparkTestSession

/** K8 finch interop: `From<MinHashKmers>` semantics
  * (`/root/reference/src/from.rs:5-27`). */
class FinchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("addHashWithCount == count repeated addHash calls (differential)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 50) {
      val cfg = SketchConfig(num = 1 + rnd.nextInt(20), ksize = 21,
        trackAbundance = true)
      val a = new SketchBuilder(cfg)
      val b = new SketchBuilder(cfg)
      for (_ <- 0 until 60) {
        val h = if (rnd.nextBoolean()) rnd.nextLong() else rnd.nextInt(30).toLong
        val c = rnd.nextInt(4).toLong // includes 0: reference loops 0 times
        a.addHashWithCount(h, c)
        var i = 0L
        while (i < c) { b.addHash(h); i += 1 }
      }
      assert(a.result().toSeq === b.result().toSeq, s"trial $trial mins")
      assert(a.abundances().toSeq === b.abundances().toSeq, s"trial $trial abunds")
    }
  }

  test("convertEntries: num/ksize/seed quirks and duplicate-hash merge") {
    val entries = Seq(
      (Murmur3.hash64("AAA", 42L), "AAACCCGGGTTTAAACCCGGG", 3L),
      (Murmur3.hash64("CCC", 42L), "CCCGGGTTTAAACCCGGGTTT", 2L),
      (Murmur3.hash64("AAA", 42L), "AAACCCGGGTTTAAACCCGGG", 4L)) // dup
    val (num, ksize, mins, abunds) = FinchJson.convertEntries(entries)
    assert(num === 3)   // values.len() — dup still counted (from.rs:10)
    assert(ksize === 21) // first kmer's length (from.rs:11)
    assert(mins.length === 2) // dup hash merged
    // unsigned-sorted
    assert(mins.sliding(2).forall { case Array(x, y) => U64.lt(x, y); case _ => true })
    val idx = mins.indexOf(Murmur3.hash64("AAA", 42L))
    assert(abunds(idx) === 7L) // 3 + 4 merged
  }

  test("convertEntries raises on an empty sketch (from.rs:11 panics)") {
    intercept[IllegalArgumentException] { FinchJson.convertEntries(Seq.empty) }
  }

  test("fixture reads end-to-end; decoy kmer/hashSeed ignored; unsigned order") {
    val dir = java.nio.file.Files.createTempDirectory("finchspec")
    val path = s"$dir/finch_demo.json"
    FinchJson.writeDemoFixture(path)
    val out = FinchJson.toMinHash(FinchJson.read(spark, path))
      .orderBy(col("name")).collect()
    assert(out.length === 3)
    val a = out(0); val b = out(1); val c = out(2)
    assert(a.getAs[String]("name") === "finch_a")
    assert(c.getAs[String]("name") === "finch_c")
    // finch_c: 5 overlap-range kmers (counts 3..7) + 4 own (count 2)
    assert(c.getSeq[Long](c.fieldIndex("mins")).length === 9)
    assert(c.getSeq[Long](c.fieldIndex("abunds")).sum === (3L + 4 + 5 + 6 + 7) + 4 * 2L)
    // ksize = 21 from the kmers, NOT the file's top-level kmer=31;
    // seed = 42 hardcoded, NOT the file's hashSeed=9999
    Seq(a, b, c).foreach { r =>
      assert(r.getAs[Int]("ksize") === 21)
      assert(r.getAs[Long]("seed") === 42L)
      assert(r.getAs[Long]("max_hash") === 0L)
      assert(!r.getAs[Boolean]("is_protein"))
      val mins = r.getSeq[Long](r.fieldIndex("mins"))
      assert(mins.sliding(2).forall(s => s.length < 2 || U64.lt(s(0), s(1))))
      // hashes must be the real murmur3 of the kmers (authentic fixture)
      assert(mins.nonEmpty)
    }
    assert(a.getAs[Int]("num") === 8)
    assert(a.getSeq[Long](a.fieldIndex("mins")).length === 8)
    assert(b.getAs[Int]("num") === 7)          // dup + zero-count entries still counted
    assert(b.getSeq[Long](b.fieldIndex("mins")).length === 5) // dup merged, count-0 dropped
    assert(b.getSeq[Long](b.fieldIndex("abunds")).sum === 5 * 5L + 2L)

    // abundance-weighted comparison golden (sm07's kernel twin): b and c
    // share kmers 12-14 only (15 is zero-count in b, so NOT common):
    // dot = 5*3 + 5*4 + 5*5 = 60; |b|^2 = 4*25 + 49 = 149;
    // |c|^2 = 9+16+25+36+49 + 4*4 = 151
    val sim = graft.core.MinHash.angularSimilarity(
      b.getSeq[Long](b.fieldIndex("mins")).toArray,
      b.getSeq[Long](b.fieldIndex("abunds")).toArray,
      c.getSeq[Long](c.fieldIndex("mins")).toArray,
      c.getSeq[Long](c.fieldIndex("abunds")).toArray)
    val expectedBc = 1.0 - 2.0 * math.acos(60.0 / math.sqrt(149.0 * 151.0)) / math.Pi
    assert(math.abs(sim - expectedBc) < 1e-12)
    // a shares nothing with b or c
    assert(graft.core.MinHash.angularSimilarity(
      a.getSeq[Long](a.fieldIndex("mins")).toArray,
      a.getSeq[Long](a.fieldIndex("abunds")).toArray,
      b.getSeq[Long](b.fieldIndex("mins")).toArray,
      b.getSeq[Long](b.fieldIndex("abunds")).toArray) === 0.0)
  }

  test("abundance search mode: strict-threshold angular scores over the fixture") {
    val dir = java.nio.file.Files.createTempDirectory("finchsearch")
    val path = s"$dir/finch_demo.json"
    FinchJson.writeDemoFixture(path)
    val db = FinchJson.toMinHash(FinchJson.read(spark, path))
      .withColumnRenamed("abunds", "abundances")
    val q = db.where(col("name") === "finch_b").head()
    val qm = q.getSeq[Long](q.fieldIndex("mins")).toArray
    val qa = q.getSeq[Long](q.fieldIndex("abundances")).toArray
    val hits = graft.operators.SignatureSearch.linear(
        db, qm, graft.core.SketchConfig(num = 0, ksize = 21), 0.1, "abundance", qa)
      .select(col("name"), col("score")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // self scores 1.0; c shares kmers 12-14 (sm07's golden); a is
    // disjoint (score 0, excluded by the strict threshold)
    assert(hits.keySet === Set("finch_b", "finch_c"))
    assert(math.abs(hits("finch_b") - 1.0) < 1e-12)
    assert(math.abs(hits("finch_c") -
      (1.0 - 2.0 * math.acos(60.0 / math.sqrt(149.0 * 151.0)) / math.Pi)) < 1e-12)
  }
}
