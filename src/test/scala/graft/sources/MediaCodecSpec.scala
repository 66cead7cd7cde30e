package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.nio.{ByteBuffer, ByteOrder}

/** The seekable video container and the RIFF/WAVE codec behind the
  * m05/m06 multimodal queries. */
class MediaCodecSpec extends AnyFunSuite {

  // ---------------- video container

  private def mkFrames(n: Int, w: Int, h: Int): Seq[Array[Byte]] =
    (0 until n).map(f => Array.tabulate(w * h)(i => ((f * 31 + i) & 0xff).toByte))

  test("video round-trip: header fields and every frame byte-exact") {
    val frames = mkFrames(7, 8, 6)
    val bytes = VideoContainer.encode(8, 6, 24, frames)
    val hd = VideoContainer.header(bytes).get
    assert((hd.w, hd.h, hd.fps, hd.nframes) === ((8, 6, 24, 7)))
    for (i <- 0 until 7)
      assert(VideoContainer.frame(bytes, hd, i).sameElements(frames(i)), s"frame $i")
  }

  test("video header rejects bad magic, truncation, and length mismatch") {
    val bytes = VideoContainer.encode(8, 6, 24, mkFrames(3, 8, 6))
    assert(VideoContainer.header(bytes.take(19)) === None)
    assert(VideoContainer.header(bytes.dropRight(1)) === None)
    assert(VideoContainer.header(bytes ++ Array[Byte](0)) === None)
    val badMagic = bytes.clone(); badMagic(0) = 'X'
    assert(VideoContainer.header(badMagic) === None)
    assert(VideoContainer.header(Array.emptyByteArray) === None)
    assert(VideoContainer.header(null) === None)
  }

  test("sampleIndices: midpoint rule is in-bounds, strictly increasing, degenerates at k >= n") {
    for (n <- 1 to 40; k <- 1 to 8) {
      val idx = VideoContainer.sampleIndices(n, k)
      assert(idx.length === math.min(n, k), s"n=$n k=$k")
      assert(idx.forall(i => i >= 0 && i < n), s"n=$n k=$k: ${idx.mkString(",")}")
      assert(idx.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
        s"n=$n k=$k not strictly increasing: ${idx.mkString(",")}")
    }
    assert(VideoContainer.sampleIndices(5, 9).sameElements(Array(0, 1, 2, 3, 4)))
    // uniformity anchor: k=4 of n=32 lands at the quartile midpoints
    assert(VideoContainer.sampleIndices(32, 4).sameElements(Array(4, 12, 20, 28)))
  }

  // ---------------- WAV

  test("wav round-trip: PCM16 samples, rate, channels byte-exact") {
    val samples = Array.tabulate(500)(i => ((i * 131 - 31000) % 32768).toShort)
    val w = WavCodec.decode(WavCodec.encodePcm16(samples, 16000)).get
    assert(w.sampleRate === 16000)
    assert(w.channels === 1)
    assert(w.samples.sameElements(samples))
    assert(w.nSamples === 500)
    assert(math.abs(w.durationSec - 500.0 / 16000) < 1e-12)
  }

  test("wav decode walks past foreign chunks (LIST before data, odd-size pad)") {
    val samples = Array.tabulate(100)(i => (i * 7).toShort)
    val canonical = WavCodec.encodePcm16(samples, 8000)
    // splice a 5-byte (odd → padded) LIST chunk between "fmt " and "data"
    val head = canonical.take(36)            // RIFF..WAVE + fmt chunk
    val tail = canonical.drop(36)            // data chunk
    val junk = ByteBuffer.allocate(8 + 6).order(ByteOrder.LITTLE_ENDIAN)
    junk.put("LIST".getBytes("US-ASCII")).putInt(5)
    junk.put(Array[Byte]('j', 'u', 'n', 'k', '!', 0)) // 5 bytes + pad
    val spliced = head ++ junk.array() ++ tail
    val w = WavCodec.decode(spliced).get
    assert(w.sampleRate === 8000)
    assert(w.samples.sameElements(samples))
  }

  test("wav decode returns None on garbage, truncation, and non-PCM format codes") {
    val samples = Array.tabulate(50)(i => i.toShort)
    val good = WavCodec.encodePcm16(samples, 8000)
    assert(WavCodec.decode("not a wav at all".getBytes) === None)
    assert(WavCodec.decode(good.take(30)) === None)   // truncated inside fmt
    assert(WavCodec.decode(null) === None)
    val nonPcm = good.clone(); nonPcm(20) = 3         // fmt code 3 = float
    assert(WavCodec.decode(nonPcm) === None)
    // declared chunk size larger than the buffer → None, not a throw
    val lying = good.clone()
    ByteBuffer.wrap(lying, 40, 4).order(ByteOrder.LITTLE_ENDIAN).putInt(1 << 24)
    assert(WavCodec.decode(lying) === None)
  }

  test("stereo interleave decodes with the declared channel count") {
    val inter = Array.tabulate(200)(i => (if (i % 2 == 0) i else -i).toShort)
    val w = WavCodec.decode(WavCodec.encodePcm16(inter, 44100, channels = 2)).get
    assert(w.channels === 2)
    assert(w.nSamples === 100)
    assert(w.samples.sameElements(inter))
  }

  // ---------------- synthetic generators

  test("genVideo/genAudio are pure functions of id and within size budget") {
    for (id <- Seq(0L, 1L, 17L, 950L, 999L)) { // tail ids are dup clips
      val a = SyntheticMedia.genVideo(id, 1000L)
      val b = SyntheticMedia.genVideo(id, 1000L)
      assert(a.bytes.sameElements(b.bytes) && a.title == b.title)
      assert(a.nframes >= 6 && a.nframes <= 32) // trim dups may reach 6
      assert(a.bytes.length <= VideoContainer.HEADER + 32 * 32 * 32)
      val hd = VideoContainer.header(a.bytes).get
      assert((hd.nframes, hd.fps) === ((a.nframes, a.fps)))
      val x = SyntheticMedia.genAudio(id); val y = SyntheticMedia.genAudio(id)
      assert(x.bytes.sameElements(y.bytes))
      val w = WavCodec.decode(x.bytes).get
      assert(w.sampleRate === x.sample_rate && w.nSamples === x.n_samples)
    }
  }

  test("video dup kinds relate to their source exactly as advertised") {
    val n = 1000L
    val nb = SyntheticMedia.nBase(n)
    var seen = Set.empty[String]
    for (id <- nb until n) {
      val (src, kind) = SyntheticMedia.dupPlan(id, nb)
      val dup = SyntheticMedia.genVideo(id, n)
      val orig = SyntheticMedia.genVideo(src, n)
      val dh = VideoContainer.header(dup.bytes).get
      val oh = VideoContainer.header(orig.bytes).get
      kind match {
        case "trim" =>
          assert(dh.nframes === oh.nframes - 2)
          // dup frame f == source frame f+2, byte-exact
          for (f <- 0 until math.min(3, dh.nframes))
            assert(VideoContainer.frame(dup.bytes, dh, f)
              .sameElements(VideoContainer.frame(orig.bytes, oh, f + 2)))
        case "renoise" =>
          assert(dh.nframes === oh.nframes && dh.fps === oh.fps)
          assert(!dup.bytes.sameElements(orig.bytes)) // noise differs
        case "refps" =>
          assert(dh.fps !== oh.fps)
          // payload identical: frames byte-exact
          for (f <- 0 until math.min(3, dh.nframes))
            assert(VideoContainer.frame(dup.bytes, dh, f)
              .sameElements(VideoContainer.frame(orig.bytes, oh, f)))
      }
      seen += kind
    }
    assert(seen === Set("trim", "renoise", "refps")) // all kinds exercised
  }
}
