package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/**
 * Seekable single-file video container ("GVI1") for the multimodal
 * frame-sample primitive.
 *
 * Layout (big-endian):
 * {{{
 *   magic "GVI1" | w:i32 | h:i32 | fps:i32 | nframes:i32 | nframes × (w·h) gray bytes
 * }}}
 *
 * The design point is SEEKABILITY: [[header]] reads 20 bytes and
 * [[frame]] is one `arraycopy` at `HEADER + idx·w·h` — so sampling k
 * frames from an n-frame clip costs O(k·frameBytes), independent of clip
 * length. That is the shape that survives 100 TB: against an object
 * store the same arithmetic becomes k byte-range GETs (never a full-file
 * scan), and against a parquet binary cell (this sandbox) it bounds the
 * per-row CPU to the sampled frames. A container that required scanning
 * to frame i (inter-frame delta coding with no index) would make
 * frame-sampling O(duration) — the difference between pricing a sample
 * job by frames-read and pricing it by corpus size.
 */
object VideoContainer {

  val HEADER = 20
  private val MAGIC = 0x47564931 // "GVI1"

  final case class Header(w: Int, h: Int, fps: Int, nframes: Int) {
    def frameBytes: Int = w * h
  }

  def encode(w: Int, h: Int, fps: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(_.length == w * h),
      s"every frame must be w*h=${w * h} gray bytes")
    val out = ByteBuffer.allocate(HEADER + frames.length * w * h)
      .order(ByteOrder.BIG_ENDIAN)
    out.putInt(MAGIC).putInt(w).putInt(h).putInt(fps).putInt(frames.length)
    frames.foreach(out.put)
    out.array()
  }

  /** Parse the 20-byte header; None on bad magic, non-positive dims, or a
    * byte length inconsistent with `nframes·w·h` (cheap: uses `.length`,
    * never scans the payload). */
  def header(bytes: Array[Byte]): Option[Header] = {
    if (bytes == null || bytes.length < HEADER) return None
    val in = ByteBuffer.wrap(bytes, 0, HEADER).order(ByteOrder.BIG_ENDIAN)
    if (in.getInt() != MAGIC) return None
    val (w, h, fps, n) = (in.getInt(), in.getInt(), in.getInt(), in.getInt())
    if (w <= 0 || h <= 0 || fps <= 0 || n <= 0) return None
    if (bytes.length != HEADER + n.toLong * w * h) return None
    Some(Header(w, h, fps, n))
  }

  /** Frame `idx` (0-based) as a fresh gray-byte array — one positioned
    * copy, no scan of preceding frames. */
  def frame(bytes: Array[Byte], hd: Header, idx: Int): Array[Byte] = {
    require(idx >= 0 && idx < hd.nframes, s"frame $idx of ${hd.nframes}")
    val out = new Array[Byte](hd.frameBytes)
    System.arraycopy(bytes, HEADER + idx * hd.frameBytes, out, 0, hd.frameBytes)
    out
  }

  /** k frame indices, uniform by the midpoint rule: index i ↦
    * ⌊(2i+1)·n / 2k⌋ — deterministic, strictly increasing for k ≤ n
    * (consecutive midpoints differ by n/k ≥ 1), covers the clip without
    * favoring its ends. k ≥ n degenerates to all frames. */
  def sampleIndices(nframes: Int, k: Int): Array[Int] =
    if (k >= nframes) Array.range(0, nframes)
    else Array.tabulate(k)(i => ((2L * i + 1) * nframes / (2L * k)).toInt)
}

/**
 * Real RIFF/WAVE PCM16 codec (no external libs — the RIFF chunk grammar
 * is trivial). [[decode]] is a proper chunk walk: it requires the
 * RIFF/WAVE envelope, locates `fmt ` and `data` wherever they sit, and
 * SKIPS unknown chunks (LIST/INFO/fact/cue…) with the spec's even-byte
 * padding — so WAVs from arbitrary encoders parse, not just our own.
 * Returns None (never throws) on anything that is not PCM16, so a
 * corpus-scale scan degrades per-row, not per-job.
 */
object WavCodec {

  final case class Wav(sampleRate: Int, channels: Int, samples: Array[Short]) {
    def nSamples: Int = samples.length / channels
    def durationSec: Double = nSamples.toDouble / sampleRate
  }

  /** Canonical 44-byte-header mono PCM16 little-endian WAV. */
  def encodePcm16(samples: Array[Short], sampleRate: Int, channels: Int = 1): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0, "ragged interleave")
    val dataBytes = samples.length * 2
    val out = ByteBuffer.allocate(44 + dataBytes).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1) // PCM
    out.putShort(channels.toShort)
    out.putInt(sampleRate)
    out.putInt(sampleRate * channels * 2) // byte rate
    out.putShort((channels * 2).toShort)  // block align
    out.putShort(16)                      // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    samples.foreach(out.putShort)
    out.array()
  }

  def decode(bytes: Array[Byte]): Option[Wav] = {
    if (bytes == null || bytes.length < 12) return None
    val in = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); in.get(b); new String(b, "US-ASCII")
    }
    if (tag() != "RIFF") return None
    in.getInt() // declared RIFF size; real files lie, trust the buffer
    if (tag() != "WAVE") return None
    var rate = -1; var channels = -1; var bits = -1; var fmtCode = -1
    var data: Array[Short] = null
    while (in.remaining() >= 8) {
      val id = tag()
      val size = in.getInt()
      if (size < 0 || size > in.remaining()) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val p = in.position()
          fmtCode = in.getShort() & 0xffff
          channels = in.getShort() & 0xffff
          rate = in.getInt()
          in.position(p + size)
          bits = ByteBuffer.wrap(bytes, p + 14, 2)
            .order(ByteOrder.LITTLE_ENDIAN).getShort() & 0xffff
        case "data" =>
          if (size % 2 != 0) return None
          data = new Array[Short](size / 2)
          var i = 0
          while (i < data.length) { data(i) = in.getShort(); i += 1 }
        case _ =>
          in.position(in.position() + size) // skip unknown chunk
      }
      if (size % 2 == 1 && in.remaining() > 0) in.get() // RIFF pad byte
    }
    if (fmtCode != 1 || bits != 16 || rate <= 0 || channels <= 0 || data == null) None
    else if (data.length % channels != 0) None
    else Some(Wav(rate, channels, data))
  }
}

/**
 * Windowed-energy-delta audio fingerprint — the Haitsma-Kalker family
 * (ISMIR 2002): bit i encodes the SIGN of the energy difference between
 * adjacent fixed-hop windows. Sign-of-delta is invariant to any uniform
 * gain change (energies scale together) and robust to low-level additive
 * noise whenever the signal's loudness envelope dominates the deltas
 * (the m10 corpus guarantees this by construction; a stationary signal
 * would make the bits noise-driven — see [[SyntheticMedia]]).
 *
 * Head trims are handled the way [[VideoContainer]] frame sampling
 * handles them for video in m07: each row emits fingerprints at several
 * WINDOW OFFSETS (slots), and a trim of k·hop samples makes
 * `fingerprint(trimmed, 0) == fingerprint(source, k)` exactly, because
 * the surviving samples and their window grid are byte-identical.
 */
object AudioFingerprint {

  /** Deterministic window-pairing table for a given usable-window count
    * `m`: bit i compares windows `i mod m` and a murmur-selected partner
    * (never itself). A CHAINED adjacent-delta scheme (bit i = E(i+1) >
    * E(i)) is the textbook form but is structurally biased: for iid
    * window energies, consecutive delta signs ALTERNATE with probability
    * 2/3 (the classic runs statistic), so 8-bit key blocks land on
    * 0x55/0xAA at ~5× the uniform rate and LSH buckets go hot as the
    * corpus grows — measured at 4000 rows: 294 of 1,922 single-block
    * buckets past the heat cap, costing 6 of 400 true dup pairs their
    * candidacy. Murmur-paired windows make the bits iid-ish, so band-key
    * mass stays uniform at any scale. The pairing depends only on
    * (i, m), preserving the trim identity and gain invariance. */
  private val partnerCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Int], Array[Int])]()
  private def partners(m: Int): (Array[Int], Array[Int]) =
    partnerCache.computeIfAbsent(m, _ => {
      val a = Array.tabulate(64)(i => i % m)
      val b = Array.tabulate(64) { i =>
        val off = 1 + java.lang.Long.remainderUnsigned(
          graft.core.Murmur3.hash64(s"fpp:$i", m.toLong), (m - 1).toLong).toInt
        (i % m + off) % m
      }
      (a, b)
    })

  /** 64-bit fingerprint of `samples` at window offset `offsetWindows`:
    * window w = samples [w·hop, (w+1)·hop); bit i set iff
    * E(partnerB(i)) > E(partnerA(i)) over the m usable windows (pairing
    * per [[partners]] — wraparound keeps every bit data-driven for short
    * signals rather than padding constant bits, so two unrelated short
    * rows don't collide on padding). Returns 0 for signals with fewer
    * than 2 usable windows. */
  def energyDelta64(samples: Array[Short], hop: Int, offsetWindows: Int): Long = {
    val nwin = samples.length / hop
    val m = nwin - offsetWindows
    if (m < 2) return 0L
    val e = new Array[Long](m)
    var w = 0
    while (w < m) {
      val base = (offsetWindows + w) * hop
      var s = 0L
      var j = 0
      while (j < hop) {
        val v = samples(base + j).toLong
        s += v * v
        j += 1
      }
      e(w) = s
      w += 1
    }
    val (pa, pb) = partners(m)
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (e(pb(i)) > e(pa(i))) fp |= (1L << i)
      i += 1
    }
    fp
  }
}
