package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** One synthetic clip: opaque seekable container bytes + typed metadata
  * (the multimodal-column contract: binary payload, queryable header). */
final case class VideoRow(
    video_id: String,
    bytes: Array[Byte],
    w: Int,
    h: Int,
    fps: Int,
    nframes: Int,
    title: String)

/** One synthetic audio row: RIFF/WAVE PCM16 bytes + typed metadata. */
final case class AudioRow(
    audio_id: String,
    bytes: Array[Byte],
    sample_rate: Int,
    n_samples: Int)

/**
 * Deterministic synthetic video/audio corpora (seed 42 via
 * [[SyntheticCorpus.Prg]]) for the multimodal frame-sample and
 * audio-decode primitives.
 *
 * Same scale design as [[SyntheticCorpus]]: every row is a pure function
 * of its `id`, so generation is a narrow `map` over `spark.range(n)` —
 * no shuffle, no driver loop, linear in rows and executors.
 *
 * Videos animate the image generator's low-frequency field: each 4×4
 * gray cell gets a per-clip velocity and drifts linearly across frames
 * (clamped), then bilinear-upsamples to 32×32 with per-frame noise — so
 * frame means move over a clip and frame-sampling has signal to measure.
 * Audio is two summed sines (per-row frequencies/amplitudes) plus noise,
 * synthesized with `StrictMath.sin` so the samples are bit-identical on
 * every JVM/platform (java.lang.Math.sin may use platform intrinsics).
 */
object SyntheticMedia {

  import SyntheticCorpus.Prg

  val W = 32
  val H = 32
  val DUP_FRACTION = 0.1
  private val FPS = Array(10, 24, 30)
  private val RATES = Array(8000, 16000, 44100)

  /** Video dup kinds, each a realistic re-publication of a source clip:
    *  - `trim`    — first 2 frames cut (re-edited upload: different
    *                container bytes, shifted sampling grid)
    *  - `renoise` — same scene, fresh per-pixel noise (re-capture /
    *                re-encode: every frame differs byte-wise)
    *  - `refps`   — identical frames at a different fps label
    *                (retimed remux: header differs, payload identical) */
  private val dupKinds = Array("trim", "renoise", "refps")

  def nBase(nTotal: Long): Long =
    math.max(1L, (nTotal * (1.0 - DUP_FRACTION)).toLong)

  /** Dup plan for a dup row id (id >= nBase): (srcId, kind). */
  def dupPlan(id: Long, nBaseRows: Long): (Long, String) = {
    val r = new Prg(id, "vdup")
    val src = java.lang.Long.remainderUnsigned(r.nextLong(), nBaseRows)
    (src, dupKinds(r.nextInt(dupKinds.length)))
  }

  /** Gray 4×4 field → W×H bilinear upsample + ±8 per-pixel noise. */
  private def upsample(field: Array[Int], r: Prg): Array[Byte] = {
    val g = 4
    val out = new Array[Byte](W * H)
    var y = 0
    while (y < H) {
      val fy = y.toDouble * (g - 1) / (H - 1)
      val y0 = fy.toInt; val wy = fy - y0; val y1 = math.min(y0 + 1, g - 1)
      var x = 0
      while (x < W) {
        val fx = x.toDouble * (g - 1) / (W - 1)
        val x0 = fx.toInt; val wx = fx - x0; val x1 = math.min(x0 + 1, g - 1)
        val interp = field(y0 * g + x0) * (1 - wy) * (1 - wx) +
          field(y0 * g + x1) * (1 - wy) * wx +
          field(y1 * g + x0) * wy * (1 - wx) +
          field(y1 * g + x1) * wy * wx
        val v = math.max(0, math.min(255, interp.toInt + r.nextInt(17) - 8))
        out(y * W + x) = v.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Per-clip scene spec, a pure function of the BASE id: fps ∈
    * {10, 24, 30}, 8–32 frames, 4×4 field + per-cell drift velocity. */
  private def clipSpec(id: Long): (Int, Int, Array[Int], Array[Int]) = {
    val r = new Prg(id, "vid")
    val fps = FPS(r.nextInt(FPS.length))
    val nframes = 8 + r.nextInt(25)
    val base = Array.fill(16)(r.nextInt(256))
    val vel = Array.fill(16)(r.nextInt(13) - 6)
    (fps, nframes, base, vel)
  }

  /** Frame f of base clip `srcId`, noise drawn from `noiseId`'s stream
    * (noiseId == srcId reproduces the original frame byte-exactly). */
  private def genFrame(base: Array[Int], vel: Array[Int], f: Int,
      noiseId: Long): Array[Byte] = {
    val field = Array.tabulate(16)(c =>
      math.max(0, math.min(255, base(c) + vel(c) * f)))
    upsample(field, new Prg(noiseId, s"vframe:$f"))
  }

  /** Build one clip (pure function of id + nTotal): base rows are
    * original scenes; the ~10% tail rows are trim/renoise/refps
    * republications of a base clip (ground truth via [[dupPlan]]).
    * ≤ ~33 KB per row. */
  def genVideo(id: Long, nTotal: Long): VideoRow = {
    val nb = nBase(nTotal)
    if (id < nb) {
      val (fps, nframes, base, vel) = clipSpec(id)
      val frames = (0 until nframes).map(genFrame(base, vel, _, id))
      VideoRow(s"vid_$id", VideoContainer.encode(W, H, fps, frames),
        W, H, fps, nframes, s"clip of ${SyntheticCorpus.genCaption(id)}")
    } else {
      val (src, kind) = dupPlan(id, nb)
      val (fps, nframes, base, vel) = clipSpec(src)
      val title = s"clip of ${SyntheticCorpus.genCaption(src)}"
      kind match {
        case "trim" =>
          // cut the first 2 frames; remaining frames byte-identical to
          // the source's (noise stream keyed by src)
          val frames = (2 until nframes).map(genFrame(base, vel, _, src))
          VideoRow(s"vid_$id", VideoContainer.encode(W, H, fps, frames),
            W, H, fps, nframes - 2, title)
        case "renoise" =>
          // same scene + drift, fresh noise: every frame differs
          val frames = (0 until nframes).map(genFrame(base, vel, _, id))
          VideoRow(s"vid_$id", VideoContainer.encode(W, H, fps, frames),
            W, H, fps, nframes, title)
        case _ => // refps: identical payload, different fps label
          val r = new Prg(id, "refps")
          val fps2 = FPS((FPS.indexOf(fps) + 1 + r.nextInt(FPS.length - 1)) % FPS.length)
          val frames = (0 until nframes).map(genFrame(base, vel, _, src))
          VideoRow(s"vid_$id", VideoContainer.encode(W, H, fps2, frames),
            W, H, fps2, nframes, title)
      }
    }
  }

  /** Build one audio row (pure function of id): 2048–8191 PCM16 samples
    * of two sines + noise at rate ∈ {8, 16, 44.1} kHz. ≤ 16 KB per row. */
  def genAudio(id: Long): AudioRow = {
    val r = new Prg(id, "aud")
    val rate = RATES(r.nextInt(RATES.length))
    val n = 2048 + r.nextInt(6144)
    val f1 = 100 + r.nextInt(900)
    val f2 = 1000 + r.nextInt(3000)
    val a1 = 6000 + r.nextInt(6000)
    val a2 = 2000 + r.nextInt(4000)
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      val t = i.toDouble / rate
      val v = a1 * StrictMath.sin(2 * math.Pi * f1 * t) +
        a2 * StrictMath.sin(2 * math.Pi * f2 * t) +
        (r.nextInt(1025) - 512)
      samples(i) = math.max(Short.MinValue, math.min(Short.MaxValue, v.toInt)).toShort
      i += 1
    }
    AudioRow(s"aud_$id", WavCodec.encodePcm16(samples, rate), rate, n)
  }

  def videos(spark: SparkSession, nTotal: Long): Dataset[VideoRow] = {
    import spark.implicits._
    spark.range(nTotal).map(r => genVideo(r, nTotal))
  }

  /** Ground-truth near-dup labels for the video corpus (pure function of
    * the id range, like the clips themselves). */
  def videoDupLabels(spark: SparkSession, nTotal: Long): Dataset[DupLabel] = {
    import spark.implicits._
    val nb = nBase(nTotal)
    spark.range(nb, nTotal).map { id =>
      val (src, kind) = dupPlan(id, nb)
      DupLabel(s"vid_$id", s"vid_$src", kind)
    }
  }

  def audios(spark: SparkSession, nTotal: Long): Dataset[AudioRow] = {
    import spark.implicits._
    spark.range(nTotal).map(r => genAudio(r))
  }

  // ------------------------------------------------------------ audio dedup corpus
  //
  // The m06 corpus above is STATIONARY (two steady sines): any
  // windowed-energy fingerprint over it is noise-driven, so it cannot
  // carry a near-dup tier. The dedup corpus below adds the one thing real
  // audio has that the decode-stats corpus doesn't need: a per-block
  // loudness envelope (a "melody" of 1..8 gain steps every ENV_HOP
  // samples), which makes adjacent-window energy DELTAS signal-dominated
  // — exactly the property the Haitsma-Kalker fingerprint family
  // (ISMIR 2002) relies on. `audios`/`genAudio` stay byte-identical so
  // m06's regression-frozen oracle constants stand.

  /** Envelope block = fingerprint window hop (samples). */
  val ENV_HOP = 128

  /** Audio dup kinds, each a realistic re-publication:
    *  - `regain`  — volume re-master: every sample scaled by one factor
    *                (energy RATIOS preserved, so sign-of-delta bits hold)
    *  - `atrim`   — head cut of exactly 2 envelope blocks (a re-edit at a
    *                beat boundary: remaining bytes identical, window grid
    *                shifted by 2 — matched by the offset-slot fingerprint)
    *  - `renoise` — same melody + sines, fresh low-level noise (a
    *                re-encode: every sample differs) */
  private val audioDupKinds = Array("regain", "atrim", "renoise")

  /** Audio dup plan for a dup row id (id >= nBase): (srcId, kind). */
  def audioDupPlan(id: Long, nBaseRows: Long): (Long, String) = {
    val r = new Prg(id, "adup")
    val src = java.lang.Long.remainderUnsigned(r.nextLong(), nBaseRows)
    (src, audioDupKinds(r.nextInt(audioDupKinds.length)))
  }

  /** Per-row melodic spec, a pure function of the BASE id: rate, sample
    * count, two sine (freq, amp) pairs, and the per-block gain melody. */
  private def melodicSpec(id: Long): (Int, Int, Int, Int, Int, Int, Array[Int]) = {
    val r = new Prg(id, "maud")
    val rate = RATES(r.nextInt(RATES.length))
    val n = 2048 + r.nextInt(6144)
    val f1 = 100 + r.nextInt(900)
    val f2 = 1000 + r.nextInt(3000)
    val a1 = 800 + r.nextInt(800)
    val a2 = 300 + r.nextInt(500)
    val gains = Array.fill((n + ENV_HOP - 1) / ENV_HOP)(1 + r.nextInt(8))
    (rate, n, f1, f2, a1, a2, gains)
  }

  /** Synthesize the melodic signal of base id `specId` with noise drawn
    * from `noiseId`'s stream (noiseId == specId reproduces the original
    * byte-exactly; a different noiseId is the `renoise` republication).
    * Peak amplitude ≤ 8·(1600+800) + 64 < Short.MaxValue — no clipping,
    * so `regain` scaling below stays linear. */
  private def synthMelodic(specId: Long, noiseId: Long): (Int, Array[Short]) = {
    val (rate, n, f1, f2, a1, a2, gains) = melodicSpec(specId)
    val nr = new Prg(noiseId, "mnoise")
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      val t = i.toDouble / rate
      val g = gains(i / ENV_HOP)
      val v = g * (a1 * StrictMath.sin(2 * math.Pi * f1 * t) +
        a2 * StrictMath.sin(2 * math.Pi * f2 * t)) + (nr.nextInt(129) - 64)
      samples(i) = math.max(Short.MinValue, math.min(Short.MaxValue, v.toInt)).toShort
      i += 1
    }
    (rate, samples)
  }

  /** Build one row of the audio DEDUP corpus (pure function of id +
    * nTotal): base rows are original melodic signals; the ~10% tail rows
    * are regain/atrim/renoise republications (ground truth via
    * [[audioDupPlan]]). */
  def genAudioDedup(id: Long, nTotal: Long): AudioRow = {
    val nb = nBase(nTotal)
    if (id < nb) {
      val (rate, samples) = synthMelodic(id, id)
      AudioRow(s"aud_$id", WavCodec.encodePcm16(samples, rate), rate, samples.length)
    } else {
      val (src, kind) = audioDupPlan(id, nb)
      kind match {
        case "regain" =>
          val (rate, samples) = synthMelodic(src, src)
          val r = new Prg(id, "regain")
          val g = 0.5 + 0.05 * r.nextInt(9) // 0.50 .. 0.90
          val out = samples.map(sv => math.round(sv * g).toShort)
          AudioRow(s"aud_$id", WavCodec.encodePcm16(out, rate), rate, out.length)
        case "atrim" =>
          val (rate, samples) = synthMelodic(src, src)
          val out = samples.drop(2 * ENV_HOP) // n >= 2048, so >= 1792 remain
          AudioRow(s"aud_$id", WavCodec.encodePcm16(out, rate), rate, out.length)
        case _ => // renoise: same spec, fresh noise stream
          val (rate, samples) = synthMelodic(src, id)
          AudioRow(s"aud_$id", WavCodec.encodePcm16(samples, rate), rate, samples.length)
      }
    }
  }

  def audiosDedup(spark: SparkSession, nTotal: Long): Dataset[AudioRow] = {
    import spark.implicits._
    spark.range(nTotal).map(r => genAudioDedup(r, nTotal))
  }

  /** Ground-truth near-dup labels for the audio dedup corpus. */
  def audioDupLabels(spark: SparkSession, nTotal: Long): Dataset[DupLabel] = {
    import spark.implicits._
    val nb = nBase(nTotal)
    spark.range(nb, nTotal).map { id =>
      val (src, kind) = audioDupPlan(id, nb)
      DupLabel(s"aud_$id", s"aud_$src", kind)
    }
  }
}
