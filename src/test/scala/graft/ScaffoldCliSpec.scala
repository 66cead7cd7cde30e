package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.MinHash
import graft.operators.SparkTestSession
import graft.sources.{Nodegraph, SignatureJson}

/** End-to-end drive of the assembled `scaffold` CLI (the reference's
  * other subcommand, main.rs:156-164 → sbt.rs:344-455) on the v5
  * fixture, asserting the properties the reference pins (leaf count
  * survives, sbt.rs:593-601) plus the ones our completion adds:
  * positional-tree validity, the no-false-prune Bloom invariant of the
  * persisted internal nodes, byte-stable determinism, and a
  * differential check of the Spark posting-join pair commons against
  * the exact kernel. */
class ScaffoldCliSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val refData = "/root/reference/tests/data"
  private def assumeFixtures(): Unit =
    assume(new java.io.File(refData).isDirectory, "reference fixtures not present")

  test("parse: positional + flags") {
    val cfg = ScaffoldCli.parse(Array("a.sbt.json", "-o", "/tmp/out", "-q"))
    assert(cfg.sbtPath === "a.sbt.json" && cfg.output === Some("/tmp/out") && cfg.quiet)
    intercept[IllegalArgumentException](ScaffoldCli.parse(Array.empty[String]))
    intercept[IllegalArgumentException](
      ScaffoldCli.parse(Array("a.sbt.json", "b.sbt.json")))
  }

  test("primesBelow matches the v5 fixture's internal nodegraph tables") {
    assert(ScaffoldCli.primesBelow(100000L, 4).toSeq ===
      Seq(99991L, 99989L, 99971L, 99961L))
  }

  test("primesBelow: exhausted candidate range errors instead of hanging") {
    // tablesize 10 has primes {7,5,3,2} below it — asking for 4 succeeds,
    // 5 must fail fast; tiny tablesizes must not spin the odd-walk forever
    assert(ScaffoldCli.primesBelow(10L, 4).toSeq === Seq(7L, 5L, 3L, 2L))
    assert(ScaffoldCli.primesBelow(3L, 1).toSeq === Seq(2L))
    intercept[IllegalArgumentException](ScaffoldCli.primesBelow(10L, 5))
    intercept[IllegalArgumentException](ScaffoldCli.primesBelow(2L, 1))
  }

  test("v5 fixture: scaffold preserves leaves, builds a valid persisted tree") {
    assumeFixtures()
    val out = Files.createTempDirectory("scaffold_out").toString
    val s = ScaffoldCli.run(spark,
      ScaffoldCli.Config(s"$refData/v5.sbt.json", Some(out), quiet = true))
    assert(s.nLeaves === 7) // the reference's own assertion (sbt.rs:600)

    val desc = ScaffoldCli.readDesc(s.descPath)
    val origDesc = ScaffoldCli.readDesc(s"$refData/v5.sbt.json")
    // same leaf SET, repositioned
    assert(desc.leaves.map(_._2).toSet === origDesc.leaves.map(_._2).toSet)
    assert(desc.factoryArgs === origDesc.factoryArgs)

    // positional arithmetic: every leaf's ancestor chain (p-1)/2 ends at 0
    // and passes only through internal positions
    val internals = {
      import com.fasterxml.jackson.databind.ObjectMapper
      val root = new ObjectMapper().readTree(
        new String(Files.readAllBytes(Paths.get(s.descPath)), "UTF-8"))
      val it = root.path("nodes").fields()
      val b = Set.newBuilder[Long]
      while (it.hasNext) b += it.next().getKey.toLong
      b.result()
    }
    assert(internals.size === s.nInternal)
    for ((pos, _, _, _) <- desc.leaves) {
      var p = pos
      while (p != 0) {
        p = (p - 1) / 2
        assert(internals.contains(p), s"ancestor $p of leaf $pos not internal")
      }
    }

    // no-false-prune: every internal OXLI nodegraph answers get()==1 for
    // every hash of every leaf below it (sbt.rs:249-251's guarantee,
    // here persisted — the part the reference stubs)
    val leafMins: Map[Long, Array[Long]] = desc.leaves.map { case (pos, f, _, _) =>
      pos -> SignatureJson.read(spark, s"${desc.storagePath}/$f")
        .where(org.apache.spark.sql.functions.col("sketch_idx") === 0)
        .select("mins").head().getSeq[Long](0).toArray
    }.toMap
    def leavesBelow(p: Long): Seq[Long] =
      if (leafMins.contains(p)) Seq(p)
      else if (p > desc.leaves.map(_._1).max) Nil
      else leavesBelow(2 * p + 1) ++ leavesBelow(2 * p + 2)
    for (ip <- internals) {
      val ng = Nodegraph.fromPath(s"${desc.storagePath}/internal.$ip")
      val below = leavesBelow(ip)
      assert(below.nonEmpty)
      for (lp <- below; h <- leafMins(lp))
        assert(ng.get(h) === 1, s"internal $ip misses hash $h of leaf $lp")
    }

    // min_n_below metadata = smallest sketch below (sbt.rs:201,247)
    {
      import com.fasterxml.jackson.databind.ObjectMapper
      val root = new ObjectMapper().readTree(
        new String(Files.readAllBytes(Paths.get(s.descPath)), "UTF-8"))
      for (ip <- internals) {
        val got = root.path("nodes").path(ip.toString)
          .path("metadata").path("min_n_below").asLong()
        val want = leavesBelow(ip).map(leafMins(_).length.toLong).min
        assert(got === want, s"min_n_below at $ip")
      }
    }

    // description keys appear in ascending positional order (a SortedSet
    // .map-to-String would silently re-sort fragments by text)
    {
      val txt = new String(Files.readAllBytes(Paths.get(s.descPath)), "UTF-8")
      val keyRe = """"(\d+)": \{""".r
      val keys = keyRe.findAllMatchIn(txt).map(_.group(1).toLong).toSeq
      val (nodeKeys, leafKeys) = keys.splitAt(s.nInternal)
      assert(nodeKeys === nodeKeys.sorted, s"node key order: $nodeKeys")
      assert(leafKeys === leafKeys.sorted, s"leaf key order: $leafKeys")
    }

    // deterministic: a second run writes byte-identical description
    val out2 = Files.createTempDirectory("scaffold_out2").toString
    ScaffoldCli.run(spark,
      ScaffoldCli.Config(s"$refData/v5.sbt.json", Some(out2), quiet = true))
    assert(new String(Files.readAllBytes(Paths.get(s"$out2/scaffold.sbt.json")), "UTF-8")
      === new String(Files.readAllBytes(Paths.get(s.descPath)), "UTF-8"))

    // self-composition: the persisted scaffold is itself a loadable SBT
    // description — scaffold(scaffold(x)) still carries the 7 leaves
    val out3 = Files.createTempDirectory("scaffold_out3").toString
    val s3 = ScaffoldCli.run(spark,
      ScaffoldCli.Config(s.descPath, Some(out3), quiet = true))
    assert(s3.nLeaves === 7)
  }

  test("Spark posting-join pair commons == exact kernel count_common") {
    assumeFixtures()
    val desc = ScaffoldCli.readDesc(s"$refData/v5.sbt.json")
    val leafPaths = desc.leaves.map(l => s"${desc.storagePath}/${l._2}")
    val db = SignatureJson.readAnyFiles(spark, leafPaths, keepPath = true)
      .where(org.apache.spark.sql.functions.col("sketch_idx") === 0)
    import org.apache.spark.sql.functions._
    val short = db.withColumn("src_path",
      element_at(split(col("src_path"), "/"), -1))
    val sparkCommons = ScaffoldCli.pairCommons(short.select("src_path", "mins"))

    val mins: Map[String, Array[Long]] = short.select("src_path", "mins").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    val files = mins.keys.toSeq.sorted
    for (i <- files.indices; j <- (i + 1) until files.length) {
      val (a, b) = (files(i), files(j))
      val kernel = MinHash.countCommon(mins(a), mins(b)).toLong
      assert(sparkCommons.getOrElse((a, b), 0L) === kernel, s"pair ($a,$b)")
    }
    // the fixture genuinely overlaps somewhere, or this test proves nothing
    assert(sparkCommons.values.exists(_ > 0L))
  }
}
