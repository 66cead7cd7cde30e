package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The energy-delta audio fingerprint (Haitsma-Kalker family) behind the
  * m10 audio near-dup query, measured against the melodic dedup corpus's
  * ground truth — kernel-level separation evidence for the thresholds the
  * query pins (the m07 pattern: dup Hamming vs the random floor). */
class AudioFingerprintSpec extends AnyFunSuite {

  private val n = 1000L
  private val nb = SyntheticMedia.nBase(n)
  private val hop = SyntheticMedia.ENV_HOP
  private val slots = Seq(0, 2) // offset 2 pairs with the 2-block `atrim` cut

  private lazy val fps: Map[String, Seq[Long]] =
    (0L until n).map { id =>
      val row = SyntheticMedia.genAudioDedup(id, n)
      val w = WavCodec.decode(row.bytes).get
      row.audio_id -> slots.map(AudioFingerprint.energyDelta64(w.samples, hop, _))
    }.toMap

  private def minHam(a: String, b: String): Int =
    (for (x <- fps(a); y <- fps(b)) yield java.lang.Long.bitCount(x ^ y)).min

  private lazy val labels: Seq[(String, String, String)] =
    (nb until n).map { id =>
      val (s, k) = SyntheticMedia.audioDupPlan(id, nb)
      (s"aud_$id", s"aud_$s", k)
    }

  test("gain invariance: regain dup fingerprints are near-identical; atrim matches exactly at the offset slot") {
    labels.foreach { case (d, s, k) =>
      val h = minHam(d, s)
      k match {
        case "atrim" =>
          // trimmed@slot0 vs source@slot2 cover byte-identical samples
          assert(java.lang.Long.bitCount(fps(d).head ^ fps(s)(1)) === 0, s"$d vs $s")
        case "regain" => assert(h <= 2, s"$d vs $s: ham $h")
        case _ => () // renoise measured below
      }
    }
  }

  test("dup pairs separate from the random floor (thresholds the m10 query pins)") {
    val byKind = labels.map { case (d, s, k) => (k, minHam(d, s)) }
    val dupMax = byKind.map(_._2).max
    info(s"dup min-Hamming max by kind: " +
      byKind.groupBy(_._1).map { case (k, v) => s"$k=${v.map(_._2).max}" }.mkString(", "))
    // the m10 confirm threshold (5 = the 3-of-8 joint-key pigeonhole
    // radius) must cover every injected dup kind
    assert(dupMax <= 5, s"a dup pair exceeds the banding pigeonhole bound: $dupMax")

    val rng = new scala.util.Random(7)
    val ids = fps.keys.toArray.sorted
    val dupSet = labels.map { case (d, s, _) => Set(d, s) }.toSet
    val rand = Iterator.continually {
      (ids(rng.nextInt(ids.length)), ids(rng.nextInt(ids.length)))
    }.filter { case (a, b) => a != b && !dupSet.contains(Set(a, b)) }
      .take(2000).toSeq
    val rh = rand.map { case (a, b) => minHam(a, b) }.sorted
    info(s"random floor: min=${rh.head} p1=${rh(rh.size / 100)} median=${rh(rh.size / 2)}")
    // random pairs sit far above the confirm threshold (5): the envelope
    // bits are iid-ish across rows, so the floor is near 64/2
    assert(rh.head > 5, s"random pair inside the confirm threshold: ${rh.head}")
  }

  // ---------------- exact kernel properties (scalacheck)

  import org.scalacheck.{Gen, Prop, Test => SCTest}

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(200)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"$name: ${r.status}")
  }

  // arbitrary signals, 2..24 windows of a small hop, half-range samples
  // so a 2x gain cannot clip
  private val hopGen = Gen.choose(4, 32)
  private def samplesGen(hopV: Int): Gen[Array[Short]] =
    Gen.choose(2 * hopV, 24 * hopV).flatMap(n =>
      Gen.containerOfN[Array, Short](n,
        Gen.choose((Short.MinValue / 2).toShort, (Short.MaxValue / 2).toShort)))

  test("property: exact power-of-two gain never changes the fingerprint") {
    // energies scale by exactly 4, so every unsigned comparison is
    // preserved bit-for-bit — the discrete core of gain invariance
    // (arbitrary-factor invariance is approximate via PCM rounding and
    // is measured on ground truth above)
    check("gain", Prop.forAll(hopGen.flatMap(h => samplesGen(h).map((h, _)))) {
      case (h, s) =>
        val doubled = s.map(v => (v * 2).toShort)
        AudioFingerprint.energyDelta64(s, h, 0) ==
          AudioFingerprint.energyDelta64(doubled, h, 0)
    })
  }

  test("property: a k-window head trim equals the offset-k fingerprint") {
    // the slot-alignment identity the atrim dup kind relies on, for ANY
    // signal and ANY window-aligned cut (not just the corpus's k=2)
    val gen = for {
      h <- hopGen
      s <- samplesGen(h)
      k <- Gen.choose(0, s.length / h - 2)
    } yield (h, s, k)
    check("trim", Prop.forAll(gen) { case (h, s, k) =>
      AudioFingerprint.energyDelta64(s.drop(k * h), h, 0) ==
        AudioFingerprint.energyDelta64(s, h, k)
    })
  }
}
