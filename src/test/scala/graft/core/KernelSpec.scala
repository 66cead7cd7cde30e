package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Stage-0 kernel parity tests (SURVEY.md §5 layers 1, 3, 4).
  * Property tests use seeded randoms (deterministic across runs). */
class KernelSpec extends AnyFunSuite {

  /** Run `body` across `n` seeded random trials. */
  private def trials(n: Int)(body: Random => Unit): Unit =
    (0 until n).foreach(i => body(new Random(42L + i)))

  /** Mixed-density hash generator: small dense values force collisions,
    * full-range values exercise unsigned ordering (high bit set). */
  private def genHashes(r: Random): List[Long] = {
    val n = r.nextInt(60)
    List.fill(n)(if (r.nextBoolean()) r.nextInt(1000).toLong else r.nextLong())
  }

  private def unsignedSorted(xs: Seq[Long]): List[Long] =
    xs.sortBy(x => BigInt(java.lang.Long.toUnsignedString(x))).toList

  // ---- golden-value tests (reference test vectors) -------------------

  test("murmur3_x64_128 low64 golden vector ACG/42 (reference tests/test.rs:3-6)") {
    assert(Murmur3.hash64("ACG", 42L) === 1731421407650554201L)
  }

  test("murmur3 handles all tail lengths and offsets") {
    val data = Array.tabulate[Byte](40)(i => (i * 7 + 3).toByte)
    val hs = (0 to 40).map(n => Murmur3.hash64(data, 0, n, 42L))
    assert(hs.distinct.size === hs.size)
    val slice = java.util.Arrays.copyOfRange(data, 5, 29)
    assert(Murmur3.hash64(slice, 0, 24, 7L) === Murmur3.hash64(data, 5, 24, 7L))
  }

  // ---- unsigned-64 helpers ------------------------------------------

  test("unsigned sort matches BigInt order") {
    trials(50) { r =>
      val xs = genHashes(r)
      assert(U64.sortUnsigned(xs.toArray).toList === unsignedSorted(xs))
    }
  }

  test("sortedDistinct / intersectSize / mergeUnion agree with Set semantics") {
    trials(50) { r =>
      val xs = genHashes(r); val ys = genHashes(r)
      val a = U64.sortedDistinct(xs.toArray)
      val b = U64.sortedDistinct(ys.toArray)
      assert(a.toSet === xs.toSet)
      assert(a.toList === unsignedSorted(xs.distinct))
      assert(U64.intersectSize(a, b) === (xs.toSet & ys.toSet).size)
      assert(U64.mergeUnion(a, b).toSet === (xs.toSet | ys.toSet))
    }
  }

  // ---- add_hash semantics -------------------------------------------

  test("bottom-k addHash keeps the num smallest distinct hashes (any insert order)") {
    trials(50) { r =>
      val xs = genHashes(r)
      val num = 1 + r.nextInt(8)
      val sb = new SketchBuilder(SketchConfig(num = num, maxHash = 0L))
      xs.foreach(sb.addHash)
      assert(sb.result().toList === unsignedSorted(xs.distinct).take(num))
    }
  }

  test("scaled addHash keeps every distinct hash <= maxHash unsigned") {
    trials(50) { r =>
      val xs = genHashes(r)
      val mh = 1L + r.nextInt(500)
      val sb = new SketchBuilder(SketchConfig(num = 0, maxHash = mh))
      xs.foreach(sb.addHash)
      assert(sb.result().toList === unsignedSorted(xs.distinct.filter(x => U64.le(x, mh))))
    }
  }

  test("batch sketchHashes ≡ sequential addHash (both modes)") {
    trials(80) { r =>
      val xs = genHashes(r)
      val mh = if (r.nextBoolean()) 0L else 1L + r.nextInt(600)
      val cfg = SketchConfig(num = if (mh != 0) 7 else 1 + r.nextInt(6), maxHash = mh).normalized
      val sb = new SketchBuilder(cfg)
      xs.foreach(sb.addHash)
      assert(MinHash.sketchHashes(xs.toArray, cfg).toList === sb.result().toList)
    }
  }

  test("abundance tracking counts duplicate inserts") {
    val sb = new SketchBuilder(SketchConfig(num = 3, trackAbundance = true))
    Seq(5L, 3L, 5L, 9L, 3L, 3L, 100L, 5L).foreach(sb.addHash)
    assert(sb.result().toList === List(3L, 5L, 9L))
    assert(sb.abundances().toList === List(3L, 3L, 1L))
  }

  // ---- comparison kernel --------------------------------------------

  test("merge truncates to num in bottom-k mode (reference lib.rs:392-400)") {
    val m = MinHash.merge(Array(1L, 5L, 9L), Array(2L, 5L, 11L), SketchConfig(num = 4))
    assert(m.toList === List(1L, 2L, 5L, 9L))
  }

  test("intersection_size uses the combined-sketch denominator (reference lib.rs:464-499)") {
    val cfg = SketchConfig(num = 4)
    val a = Array(1L, 4L, 8L, 20L)
    val b = Array(2L, 4L, 8L, 30L)
    // combined = first 4 of union {1,2,4,8,20,30} = {1,2,4,8}
    // common  = A∩B = {4,8}; ∩ combined = {4,8}
    assert(MinHash.intersectionSize(a, b, cfg) === ((2L, 4L)))
    assert(MinHash.compare(a, b, cfg) === 0.5)
  }

  test("bottom-k truncation can drop common hashes from the numerator") {
    val cfg = SketchConfig(num = 2)
    // combined = {1,2}; A∩B = {50} but 50 ∉ combined → common = 0
    assert(MinHash.intersectionSize(Array(1L, 50L), Array(2L, 50L), cfg) === ((0L, 2L)))
  }

  test("compare properties: identity=1, symmetry, range [0,1]") {
    trials(50) { r =>
      val cfg = SketchConfig(num = r.nextInt(9))
      val a = MinHash.sketchHashes((1L :: genHashes(r)).toArray, cfg)
      val b = MinHash.sketchHashes((2L :: genHashes(r)).toArray, cfg)
      val s = MinHash.compare(a, b, cfg)
      assert(s >= 0.0 && s <= 1.0)
      assert(MinHash.compare(b, a, cfg) === s)
      assert(MinHash.compare(a, a, cfg) === 1.0)
    }
  }

  test("scaled-mode compare = plain Jaccard; containment of subset = 1") {
    trials(50) { r =>
      val cfg = SketchConfig(num = 0, maxHash = 400L)
      val xs = List.fill(1 + r.nextInt(40))(r.nextInt(300).toLong)
      val ys = List.fill(1 + r.nextInt(40))(r.nextInt(300).toLong)
      val a = MinHash.sketchHashes(xs.toArray, cfg)
      val b = MinHash.sketchHashes(ys.toArray, cfg)
      val jac = (xs.toSet & ys.toSet).size.toDouble /
        math.max(1, (xs.toSet | ys.toSet).size).toDouble
      assert(MinHash.compare(a, b, cfg) === jac)
      assert(MinHash.containment(a, MinHash.merge(a, b, cfg)) === 1.0)
    }
  }

  test("recombination: merge(sketch(a), sketch(b)) == sketch(a ++ b) (SURVEY §5.3)") {
    trials(50) { r =>
      val cfg = SketchConfig(num = r.nextInt(9))
      val xs = genHashes(r); val ys = genHashes(r)
      val m = MinHash.merge(
        MinHash.sketchHashes(xs.toArray, cfg),
        MinHash.sketchHashes(ys.toArray, cfg), cfg)
      assert(m.toList === MinHash.sketchHashes((xs ++ ys).toArray, cfg).toList)
    }
  }

  // ---- tokenizers ----------------------------------------------------

  test("DNA canonical k-mers: sequence and its revcomp sketch identically") {
    val seq = "ACGTTAGCCAGTTTTAAACCGGGT".getBytes
    val rc = Shingles.revcomp(seq)
    val cfg = SketchConfig(num = 500, ksize = 5)
    val h1 = MinHash.sketchHashes(Shingles.dnaKmerHashes(seq, 5, 42L, force = false), cfg)
    val h2 = MinHash.sketchHashes(Shingles.dnaKmerHashes(rc, 5, 42L, force = false), cfg)
    assert(h1.toList === h2.toList)
    assert(h1.nonEmpty)
  }

  test("DNA invalid character raises unless force") {
    val seq = "ACGTNACGT".getBytes
    assertThrows[Shingles.InvalidDnaException] {
      Shingles.dnaKmerHashes(seq, 3, 42L, force = false)
    }
    // valid windows: ACG,CGT (before N) + ACG,CGT (after N) = 4
    assert(Shingles.dnaKmerHashes(seq, 3, 42L, force = true).length === 4)
  }

  test("ACG canonical hash goes through murmur golden path") {
    // canonical(ACG) = min(ACG, revcomp(ACG)=CGT) = ACG → golden murmur value
    val hs = Shingles.dnaKmerHashes("ACG".getBytes, 3, 42L, force = false)
    assert(hs.toList === List(1731421407650554201L))
  }

  test("protein 6-frame translation produces hashes; lowercase input uppercased") {
    val seq = "ACGTTAGCCAGTTTTAAACCGGGT"
    val hs = Shingles.proteinKmerHashes(seq.getBytes, 9, 42L)
    val hsLower = Shingles.proteinKmerHashes(seq.toLowerCase.getBytes, 9, 42L)
    assert(hs.nonEmpty)
    assert(hs.toList === hsLower.toList)
  }

  test("simhash: identical inputs → distance 0; disjoint inputs differ") {
    val a = Shingles.simhash64(Shingles.charShingleHashes("the quick brown fox jumps", 3, 42L))
    val b = Shingles.simhash64(Shingles.charShingleHashes("the quick brown fox jumps", 3, 42L))
    val c = Shingles.simhash64(Shingles.charShingleHashes("zzz completely different 12345", 3, 42L))
    assert(java.lang.Long.bitCount(a ^ b) === 0)
    assert(java.lang.Long.bitCount(a ^ c) > 10)
  }

  test("byte shingles: stride subsampling is a subset of stride-1 shingles") {
    val bytes = Array.tabulate[Byte](100)(i => (i * 31 + 7).toByte)
    val all = Shingles.byteShingleHashes(bytes, 8, 1, 42L)
    val strided = Shingles.byteShingleHashes(bytes, 8, 4, 42L)
    assert(strided.toSet.subsetOf(all.toSet))
    assert(strided.length === 24)
  }

  test("winnowing: picks are real hashes, cover every window, dedupe consecutive") {
    trials(30) { r =>
      val hs = Array.fill(5 + r.nextInt(60))(r.nextLong())
      val w = 2 + r.nextInt(6)
      val picks = Shingles.winnow(hs, w)
      assert(picks.nonEmpty)
      assert(picks.toSet.subsetOf(hs.toSet))
      // guarantee: every window of w consecutive hashes contains >= 1 pick
      if (hs.length >= w) {
        val pickSet = picks.toSet
        (0 to hs.length - w).foreach { s0 =>
          assert(hs.slice(s0, s0 + w).exists(pickSet.contains),
            s"window at $s0 uncovered")
        }
      }
    }
  }

  test("winnowing is substring-stable: shared fingerprints for shared content") {
    val a = Shingles.charShingleHashes("the quick brown fox jumps over the lazy dog near a river", 5, 42L)
    val b = Shingles.charShingleHashes("PREFIX the quick brown fox jumps over the lazy dog SUFFIX", 5, 42L)
    val fa = Shingles.winnow(a, 4).toSet
    val fb = Shingles.winnow(b, 4).toSet
    assert((fa & fb).nonEmpty)
  }

  test("normalizeText collapses whitespace and lowercases") {
    assert(Shingles.normalizeText("  Hello\t WORLD\n ") === "hello world")
    assert(Shingles.tokenize("a  b\tc").toList === List("a", "b", "c"))
  }

  test("mergeWithAbundance: sums common, carries one-sided (lib.rs:307-403)") {
    val cfg = SketchConfig(num = 0)
    val (m, ab) = MinHash.mergeWithAbundance(
      Array(1L, 3L, 5L), Array(2L, 1L, 4L),
      Array(3L, 6L), Array(10L, 1L), cfg)
    assert(m.toList === List(1L, 3L, 5L, 6L))
    assert(ab.toList === List(2L, 11L, 4L, 1L))
  }

  test("mergeWithAbundance quirk: mins truncated to num, abunds NOT (lib.rs:400)") {
    val cfg = SketchConfig(num = 3)
    val (m, ab) = MinHash.mergeWithAbundance(
      Array(1L, 3L, 5L), Array(2L, 1L, 4L),
      Array(3L, 6L), Array(10L, 1L), cfg)
    assert(m.toList === List(1L, 3L, 5L))
    assert(ab.toList === List(2L, 11L, 4L, 1L)) // longer than mins, as in the reference
  }

  test("mergeWithAbundance quirk: result has an (empty) abundance vector even untracked") {
    val (m, ab) = MinHash.mergeWithAbundance(
      Array(1L, 2L), null, Array(2L, 4L), null, SketchConfig(num = 0))
    assert(m.toList === List(1L, 2L, 4L))
    assert(ab.isEmpty)
  }

  test("mergeWithAbundance quirk: mixed tracking lags self's abundance cursor (lib.rs:358-367)") {
    // only `a` tracks abundances: the common-hash branch consumes NEITHER
    // cursor (the reference's nested `if let` short-circuits), so a's
    // second abundance entry is silently dropped
    val (m, ab) = MinHash.mergeWithAbundance(
      Array(1L, 2L), Array(5L, 7L), Array(2L), null, SketchConfig(num = 0))
    assert(m.toList === List(1L, 2L))
    assert(ab.toList === List(5L))
  }

  test("mergeWithAbundance mins agree with merge() on random sketches") {
    trials(30) { r =>
      val cfg = SketchConfig(num = 1 + r.nextInt(20))
      val a = U64.sortedDistinct(Array.fill(r.nextInt(30))(r.nextLong()))
      val b = U64.sortedDistinct(Array.fill(r.nextInt(30))(r.nextLong()))
      val (m, _) = MinHash.mergeWithAbundance(
        a, Array.fill(a.length)(1L), b, Array.fill(b.length)(1L), cfg)
      assert(m.toList === MinHash.merge(a, b, cfg).toList)
    }
  }

  test("mergeWithAbundance (both tracked) matches a map-union model") {
    trials(40) { r =>
      val num = r.nextInt(25) // 0 = unbounded
      val cfg = SketchConfig(num = num)
      def mk(): (Array[Long], Array[Long]) = {
        val m = U64.sortedDistinct(Array.fill(r.nextInt(25))(r.nextLong() >>> r.nextInt(40)))
        (m, m.map(_ => 1L + r.nextInt(9).toLong))
      }
      val (a, aa) = mk()
      val (b, ba) = mk()
      val (mins, abunds) = MinHash.mergeWithAbundance(a, aa, b, ba, cfg)
      // model: map-union with summed multiplicities, unsigned-sorted
      val model = (a.zip(aa) ++ b.zip(ba)).groupBy(_._1)
        .map { case (h, vs) => h -> vs.map(_._2).sum }
      val sortedKeys = U64.sortedDistinct(model.keys.toArray)
      val wantMins = if (num > 0 && sortedKeys.length >= num) sortedKeys.take(num) else sortedKeys
      assert(mins.toList === wantMins.toList)
      // quirk: abunds cover the FULL union, untruncated
      assert(abunds.toList === sortedKeys.map(model).toList)
    }
  }

  test("angularSimilarity: 1 - 2*acos(cos)/pi over sparse hash->abundance vectors") {
    // hand-computed: common hashes {2,5}: dot = 3*1 + 2*4 = 11;
    // |a|^2 = 9+4+1 = 14, |b|^2 = 1+16+4 = 21 -> cos = 11/sqrt(294);
    // published sourmash then applies the angular transform
    def angular(cos: Double): Double = 1.0 - 2.0 * math.acos(cos) / math.Pi
    val got = MinHash.angularSimilarity(
      Array(2L, 5L, 9L), Array(3L, 2L, 1L),
      Array(2L, 5L, 7L), Array(1L, 4L, 2L))
    assert(math.abs(got - angular(11.0 / math.sqrt(294.0))) < 1e-12)
    // symmetric; self-similarity 1; disjoint 0; empty 0
    val got2 = MinHash.angularSimilarity(
      Array(2L, 5L, 7L), Array(1L, 4L, 2L),
      Array(2L, 5L, 9L), Array(3L, 2L, 1L))
    assert(math.abs(got - got2) < 1e-15)
    assert(math.abs(MinHash.angularSimilarity(
      Array(1L, 4L), Array(2L, 3L), Array(1L, 4L), Array(2L, 3L)) - 1.0) < 1e-12)
    assert(MinHash.angularSimilarity(
      Array(1L), Array(2L), Array(3L), Array(4L)) === 0.0)
    assert(MinHash.angularSimilarity(
      Array.empty[Long], Array.empty[Long], Array(3L), Array(4L)) === 0.0)
    // unsigned order: Long.MinValue (= 2^63 as u64) sorts AFTER positives,
    // and the merge walk must still find it as common
    val hi = Long.MinValue
    assert(math.abs(MinHash.angularSimilarity(
      Array(7L, hi), Array(1L, 2L), Array(7L, hi), Array(1L, 2L)) - 1.0) < 1e-12)
  }

  test("scaledToMaxHash: round(2^64/scaled) as u64 (completes the reference's dropped param)") {
    assert(SketchConfig.scaledToMaxHash(0L) === 0L)
    assert(SketchConfig.scaledToMaxHash(1L) === -1L) // u64::MAX
    assert(SketchConfig.scaledToMaxHash(2L) === Long.MinValue) // 2^63
    // upstream sourmash rounding: int(round(2**64/1000)) = ...552, not ⌊⌋ ...551
    assert(SketchConfig.scaledToMaxHash(1000L) === 18446744073709552L)
    // bit-parity with upstream's f64 division where it DIVERGES from the
    // exact rational: 2^64/100 = 184467440737095516.16 exactly, but the
    // f64 quotient quantizes (ulp 32) to ...520 — check_compatible needs
    // equality with imported sourmash sketches, so we must match the float
    assert(SketchConfig.scaledToMaxHash(100L) === 184467440737095520L)
    assert(SketchConfig.scaledToMaxHash(3L) === 6148914691236516864L) // not exact ...517205
    assert(SketchConfig.scaledToMaxHash(100000L) === 184467440737096L)
    assert(SketchConfig.scaledToMaxHash(10000000L) === 1844674407371L)
    assert(SketchConfig.maxHashToScaled(SketchConfig.scaledToMaxHash(1000L)) === 1000L)
    assert(SketchConfig.maxHashToScaled(SketchConfig.scaledToMaxHash(100L)) === 100L)
    assert(SketchConfig.maxHashToScaled(SketchConfig.scaledToMaxHash(2L)) === 2L)
    // every kept hash under scaled=1000 is <= maxHash (sampling property)
    val mh = SketchConfig.scaledToMaxHash(1000L)
    val cfg = SketchConfig(num = 0, maxHash = mh)
    val hs = Array.tabulate(5000)(i => Murmur3.hash64(s"tok$i", 42L))
    val kept = MinHash.sketchHashes(hs, cfg)
    kept.foreach(h => assert(U64.le(h, mh)))
    // expected keep rate ~ 1/1000
    assert(kept.length <= 30, s"kept ${kept.length} of 5000 at scaled=1000")
  }

  test("downsample: unsigned prefix cut, abunds parallel, num->0 semantics") {
    // newMaxHash = 0 means "not scaled": identity
    val mins = Array(1L, 5L, 9L, Long.MaxValue, Long.MinValue, -2L) // unsigned ascending
    val ab = Array(10L, 20L, 30L, 40L, 50L, 60L)
    assert(MinHash.downsample(mins, ab, 0L)._1 === mins)
    // cut below 2^63: drops the wrapped (negative-signed) tail
    val (m1, a1) = MinHash.downsample(mins, ab, 9L)
    assert(m1 === Array(1L, 5L, 9L)) // boundary value KEPT (<=, reference rule)
    assert(a1 === Array(10L, 20L, 30L))
    // cut ABOVE 2^63 (unsigned): keeps Long.MinValue (= 2^63), drops -2
    val (m2, a2) = MinHash.downsample(mins, ab, Long.MinValue)
    assert(m2 === Array(1L, 5L, 9L, Long.MaxValue, Long.MinValue))
    assert(a2 === Array(10L, 20L, 30L, 40L, 50L))
    // untracked input stays untracked
    assert(MinHash.downsample(mins, null, 9L)._2 === null)
    // empty sketch
    assert(MinHash.downsample(Array.empty[Long], null, 9L)._1.isEmpty)
    // defining property: downsampling a finer scaled sketch to a coarser
    // factor IS re-sketching the stream at the coarser factor (the
    // --scaled promise: the search may downsample the query instead of
    // re-reading the sequence)
    val rnd = new scala.util.Random(4242)
    for (_ <- 0 until 20) {
      val hs = Array.fill(2000)(rnd.nextLong())
      val fine = SketchConfig.scaledToMaxHash(4L)
      val coarse = SketchConfig.scaledToMaxHash(64L)
      val fineSk = MinHash.sketchHashes(hs, SketchConfig(num = 0, maxHash = fine))
      val direct = MinHash.sketchHashes(hs, SketchConfig(num = 0, maxHash = coarse))
      assert(MinHash.downsample(fineSk, null, coarse)._1 === direct)
    }
  }
}
