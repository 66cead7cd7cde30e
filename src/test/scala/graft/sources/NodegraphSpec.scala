package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/**
 * Reference-fixture parity for the OXLI nodegraph reader — ports the
 * reference's own test layer (`/root/reference/src/index/nodegraph.rs:236-321`):
 * golden tablesizes + membership, byte-exact save/load round-trip, and the
 * child-union-equals-parent recombination test. The SBT-root test derives
 * its goldens independently: a Bloom filter can have no false negatives,
 * so every leaf hash of the v5 tree must be present in the root node.
 */
class NodegraphSpec extends AnyFunSuite {

  private val data = "/root/reference/tests/data"
  private def available = new java.io.File(s"$data/internal.0").isFile

  test("LongBitSet: random set/get/byte round-trip; past-2^31 indices work") {
    val rnd = new scala.util.Random(7)
    // a tablesize just past the Int.MaxValue bit ceiling java.util.BitSet
    // could address — the class this bitset exists to replace
    val n = Int.MaxValue.toLong + 1000L
    val bs = LongBitSet.empty(n)
    val picks = Array.fill(200)(math.abs(rnd.nextLong()) % n) :+ (n - 1) :+ 0L
    picks.foreach(bs.set)
    assert(picks.forall(bs.get))
    assert(bs.cardinality() === picks.distinct.length.toLong)
    // small-set byte round-trip at the awkward sizes (word-aligned,
    // byte-aligned, neither), including the OXLI size/8+1 padding shape
    for (bits <- Seq(1L, 7L, 8L, 63L, 64L, 65L, 1000L)) {
      val sm = LongBitSet.empty(bits)
      (0L until bits by math.max(1L, bits / 7)).foreach(sm.set)
      val nBytes = (bits / 8 + 1).toInt
      val back = LongBitSet.fromLittleEndianBytes(bits, sm.toByteArray(nBytes))
      assert(back === sm, s"bits=$bits")
    }
    // and/or cardinalities against an independent model
    val a = LongBitSet.empty(512L); val b = LongBitSet.empty(512L)
    val sa = Set(1L, 100L, 200L, 511L); val sb = Set(100L, 300L, 511L)
    sa.foreach(a.set); sb.foreach(b.set)
    assert(a.andCardinality(b) === (sa & sb).size.toLong)
    assert(a.orCardinality(b) === (sa | sb).size.toLong)
    intercept[IllegalArgumentException](LongBitSet.empty(0L))
  }

  test("golden load: tablesizes and membership (nodegraph.rs:303-321)") {
    assume(available)
    val ng = Nodegraph.fromPath(s"$data/internal.0")
    assert(ng.tableSizes.toSeq == Seq(99991L, 99989L, 99971L, 99961L))
    assert(ng.get(1877811740L) == 0) // the one golden absent hash
    // first golden present hashes from the reference test
    for (h <- Seq(1877811749L, 1339603207230L, 5641354835174L, 10502027926594L,
        11550845136154L, 12183113567732L, 14062071191653L, 14580861632266L,
        18722876140337L, 20714320729467L, 22732389403804L, 24134363957219L,
        30606147678309L, 30841792132441L, 31130970675642L))
      assert(ng.get(h) == 1, s"hash $h should be present")
  }

  test("byte-exact save/load round-trip (nodegraph.rs:255-277)") {
    assume(available)
    val orig = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$data/internal.0"))
    val ng = Nodegraph.fromBytes(orig)
    assert(ng.toBytes.sameElements(orig))
  }

  test("recombination: union of children equals parent (nodegraph.rs:279-301)") {
    assume(available)
    val parent = Nodegraph.fromPath(s"$data/internal.0")
    val ng = Nodegraph.empty(Array(99991L, 99989L, 99971L, 99961L), 1)
    ng.update(Nodegraph.fromPath(s"$data/internal.1"))
    ng.update(Nodegraph.fromPath(s"$data/internal.2"))
    assert(ng.tables.toSeq == parent.tables.toSeq)
  }

  test("count/get property: inserted hashes are members (nodegraph.rs:236-243)") {
    val ng = Nodegraph.empty(Array(10L), 3)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val h = rnd.nextLong()
      ng.count(h)
      assert(ng.get(h) == 1)
    }
  }

  test("count() tracks occupied_bins per newly set bit and serializes it") {
    val ng = Nodegraph.empty(Array(97L, 89L), 3)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 100) ng.count(rnd.nextLong())
    val setBits = ng.tables.map(_.cardinality().toLong).sum
    assert(ng.occupiedBins === setBits, "one increment per newly set bit across ALL tables")
    assert(ng.occupiedBins > 0)
    val rt = Nodegraph.fromBytes(ng.toBytes)
    assert(rt.occupiedBins === ng.occupiedBins, "n_occupied no longer serializes as 0")
    // reference quirk: update() does NOT adjust occupied_bins (nodegraph.rs:85-88)
    val before = ng.occupiedBins
    val other = Nodegraph.empty(Array(97L, 89L), 3)
    other.count(12345L)
    ng.update(other)
    assert(ng.occupiedBins === before)
  }

  test("fromBytes rejects a forged header whose tablesize overruns the buffer") {
    val ng = Nodegraph.empty(Array(97L, 89L), 3)
    ng.count(42L)
    val bytes = ng.toBytes
    assert(Nodegraph.fromBytes(bytes).tableSizes.toSeq === Seq(97L, 89L))
    // header: OXLI(4) ver(1) ht_type(1) ksize(4) ntables(1) occupied(8),
    // then the first table's size as a little-endian long at offset 19.
    // Forge it to a multi-GB claim: the old (size/8+1).toInt wrapped this
    // negative and threw NegativeArraySizeException; the guard must fail
    // fast with the explicit range message instead
    val forged = bytes.clone()
    val bb = java.nio.ByteBuffer.wrap(forged).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(19, 30000000000L)
    val e = intercept[IllegalArgumentException](Nodegraph.fromBytes(forged))
    assert(e.getMessage.contains("claims a table"))
    // and a claim that merely overruns the (small) remaining buffer
    bb.putLong(19, 100000L)
    val e2 = intercept[IllegalArgumentException](Nodegraph.fromBytes(forged))
    assert(e2.getMessage.contains("claims a table"))
  }

  test("SBT v5 root bloom has no false negatives over all leaf hashes") {
    assume(new java.io.File(s"$data/.sbt.v5/internal.0").isFile)
    val spark = graft.operators.SparkTestSession.spark
    val root = Nodegraph.fromPath(s"$data/.sbt.v5/internal.0")
    val leaves = SignatureJson.read(spark, s"$data/.sbt.v5/*")
      .where(col("ksize") === 31 && col("md5sum") =!= "")
      .select(col("mins")).collect().flatMap(_.getSeq[Long](0))
    assert(leaves.length >= 3000, s"expected >= 3000 leaf hashes, got ${leaves.length}")
    val missing = leaves.filterNot(h => root.get(h) == 1)
    assert(missing.isEmpty, s"${missing.length} leaf hashes absent from root bloom")
  }
}
