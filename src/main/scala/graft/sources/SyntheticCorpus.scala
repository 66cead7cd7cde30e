package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.core.Murmur3

/** One corpus row — the Iceberg-shaped input table of BASELINE.json
  * `input_hint`: `(image_id, bytes, w, h, fmt, caption, phash)`. */
final case class ImageRow(
    image_id: String,
    bytes: Array[Byte],
    w: Int,
    h: Int,
    fmt: String,
    caption: String,
    phash: Long)

/** Ground-truth near-dup label: `dup_id` was derived from `src_id`. */
final case class DupLabel(dup_id: String, src_id: String, kind: String)

/**
 * Deterministic synthetic image+caption corpus (seed 42) with ~5% injected
 * near-dupes, per BASELINE.json (10⁹-row target shape; sandbox runs small
 * scales of the same generator).
 *
 * Scale design: every row is a pure function of its `id` — generation is a
 * narrow `map` over `spark.range(n)` with NO shuffle and no driver-side
 * loop, so it scales linearly to any row count and any executor count. A
 * near-dup row regenerates its source row's content from the source id and
 * perturbs it; ground truth is therefore also a pure per-row function.
 *
 * Images are structured (low-frequency 4×4 field bilinearly upsampled +
 * small per-pixel noise), not white noise: perceptual fingerprints are
 * meaningless on white noise because all block averages concentrate at the
 * global mean.
 *
 * Dup kinds (each also keeps or perturbs the other modality):
 *  - `exact`    — byte-identical image + caption (caught by exact dedup)
 *  - `noise`    — ~0.5% of pixels perturbed (caught by pixel-shingle MinHash)
 *  - `reencode` — simulated-lossy re-encode, fmt=ppmq (caught by phash Hamming)
 *  - `caption`  — one caption word substituted (caught by caption MinHash/SimHash)
 *  - `capsub`   — caption truncated to a prefix substring (caught by the
 *                 containment/substring pass)
 *  - `pngenc`   — same pixels re-encoded through a real PNG container
 *                 (different bytes, identical decoded pixels: caught by
 *                 the decode→sketch path, not by byte hashing)
 *  - `jpgenc`   — same pixels re-encoded through a real JPEG container
 *                 (lossy: decoded pixels ≈ source at PSNR ≥ 40 dB; caught
 *                 by the decode→normalize→sketch path and phash)
 *  - `capedit`  — caption head rewritten (only the trailing clause
 *                 survives) + image re-quantized: caption jaccard,
 *                 containment, and simhash all go cold and the pixel
 *                 shingles change — caught ONLY by the suffix-array
 *                 exact-substring pass corroborated by phash
 */
object SyntheticCorpus {

  val W = 32
  val H = 32
  val DUP_FRACTION = 0.05

  /** Deterministic per-row PRG: splitmix64 seeded by murmur(tag, id). */
  final class Prg(id: Long, tag: String) {
    private var state: Long = Murmur3.hash64(s"$tag:$id", 42L)
    def nextLong(): Long = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def nextInt(bound: Int): Int = (java.lang.Long.remainderUnsigned(nextLong(), bound)).toInt
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
  }

  private val adjectives = Array("fluffy", "rusty", "gleaming", "ancient", "tiny",
    "massive", "colorful", "quiet", "crowded", "misty", "sunlit", "frozen",
    "weathered", "ornate", "minimalist", "vibrant")
  private val nouns = Array("cat", "harbor", "mountain", "bicycle", "market",
    "bridge", "forest", "skyline", "lighthouse", "garden", "train", "canyon",
    "library", "waterfall", "temple", "meadow")
  private val verbs = Array("overlooking", "beside", "under", "near", "inside",
    "above", "facing", "surrounding", "behind", "along")
  private val places = Array("the old town", "a rocky coast", "the valley floor",
    "a busy street", "the northern ridge", "a quiet courtyard", "the river bend",
    "an open plaza", "the forest edge", "a snowy pass", "the city center",
    "a hidden cove")

  /** Caption: deterministic 10±2-word sentence from the per-row PRG. */
  def genCaption(id: Long): String = {
    val r = new Prg(id, "cap")
    val a1 = adjectives(r.nextInt(adjectives.length))
    val n1 = nouns(r.nextInt(nouns.length))
    val v = verbs(r.nextInt(verbs.length))
    val a2 = adjectives(r.nextInt(adjectives.length))
    val n2 = nouns(r.nextInt(nouns.length))
    val p = places(r.nextInt(places.length))
    val extra = if (r.nextInt(2) == 0) s" at ${places(r.nextInt(places.length))}" else ""
    s"a $a1 $n1 $v a $a2 $n2 in $p$extra photographed on day ${r.nextInt(365)}"
  }

  /** Source pixels: 4×4 low-frequency field, bilinear upsample, ±8 noise. */
  def genPixels(id: Long): Array[Byte] = {
    val r = new Prg(id, "img")
    val g = 4
    val field = Array.fill(g * g * 3)(r.nextInt(256))
    val rgb = new Array[Byte](W * H * 3)
    var y = 0
    while (y < H) {
      val fy = y.toDouble * (g - 1) / (H - 1)
      val y0 = fy.toInt; val wy = fy - y0; val y1 = math.min(y0 + 1, g - 1)
      var x = 0
      while (x < W) {
        val fx = x.toDouble * (g - 1) / (W - 1)
        val x0 = fx.toInt; val wx = fx - x0; val x1 = math.min(x0 + 1, g - 1)
        var c = 0
        while (c < 3) {
          val v00 = field((y0 * g + x0) * 3 + c); val v01 = field((y0 * g + x1) * 3 + c)
          val v10 = field((y1 * g + x0) * 3 + c); val v11 = field((y1 * g + x1) * 3 + c)
          val interp = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
            v10 * wy * (1 - wx) + v11 * wy * wx
          val noise = r.nextInt(17) - 8
          val v = math.max(0, math.min(255, interp.toInt + noise))
          rgb((y * W + x) * 3 + c) = v.toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    rgb
  }

  /** Number of base (original) rows for a total row count — at least 1
    * (a dup needs a source; nTotal=1 would otherwise divide by zero in
    * [[dupPlan]]'s remainderUnsigned). */
  def nBase(nTotal: Long): Long =
    math.max(1L, (nTotal * (1.0 - DUP_FRACTION)).toLong)

  private val dupKinds = Array("exact", "noise", "reencode", "caption", "capsub", "pngenc", "jpgenc", "capedit")

  /** Dup plan for a dup row id (id >= nBase): (srcId, kind). */
  def dupPlan(id: Long, nBaseRows: Long): (Long, String) = {
    val r = new Prg(id, "dup")
    val src = java.lang.Long.remainderUnsigned(r.nextLong(), nBaseRows)
    (src, dupKinds(r.nextInt(dupKinds.length)))
  }

  /** Build one row (pure function of id + nTotal). */
  def genRow(id: Long, nTotal: Long): ImageRow = {
    val base = nBase(nTotal)
    if (id < base) {
      val rgb = genPixels(id)
      val caption = genCaption(id)
      ImageRow(s"img_$id", ImageCodec.encodePpm(rgb, W, H), W, H, "ppm",
        caption, ImageCodec.phash64(rgb, W, H))
    } else {
      val (src, kind) = dupPlan(id, base)
      val rgb0 = genPixels(src)
      val cap0 = genCaption(src)
      val r = new Prg(id, "perturb")
      kind match {
        case "exact" =>
          ImageRow(s"img_$id", ImageCodec.encodePpm(rgb0, W, H), W, H, "ppm",
            cap0, ImageCodec.phash64(rgb0, W, H))
        case "noise" =>
          val rgb = rgb0.clone()
          val nFlips = math.max(1, (W * H * 3 * 0.005).toInt)
          var i = 0
          while (i < nFlips) {
            val p = r.nextInt(rgb.length)
            val d = r.nextInt(33) - 16
            rgb(p) = math.max(0, math.min(255, (rgb(p) & 0xff) + d)).toByte
            i += 1
          }
          ImageRow(s"img_$id", ImageCodec.encodePpm(rgb, W, H), W, H, "ppm",
            cap0, ImageCodec.phash64(rgb, W, H))
        case "reencode" =>
          val rgb = ImageCodec.quantize(rgb0, 4)
          ImageRow(s"img_$id", ImageCodec.encodePpm(rgb, W, H), W, H, "ppmq",
            cap0, ImageCodec.phash64(rgb, W, H))
        case "caption" =>
          val words = cap0.split(' ')
          val idx = r.nextInt(words.length)
          words(idx) = adjectives(r.nextInt(adjectives.length))
          ImageRow(s"img_$id", ImageCodec.encodePpm(rgb0, W, H), W, H, "ppm",
            words.mkString(" "), ImageCodec.phash64(rgb0, W, H))
        case "capsub" =>
          val words = cap0.split(' ')
          val keep = math.max(5, words.length - 1 - r.nextInt(3))
          ImageRow(s"img_$id", ImageCodec.encodePpm(rgb0, W, H), W, H, "ppm",
            words.take(keep).mkString(" "), ImageCodec.phash64(rgb0, W, H))
        case "pngenc" =>
          ImageRow(s"img_$id", ImageCodec.encodePng(rgb0, W, H), W, H, "png",
            cap0, ImageCodec.phash64(rgb0, W, H))
        case "jpgenc" =>
          // lossy: the row's phash reflects what its bytes decode to
          val bytes = ImageCodec.encodeJpeg(rgb0, W, H)
          val dec = ImageCodec.decode(bytes, "jpg").get
          ImageRow(s"img_$id", bytes, W, H, "jpg",
            cap0, ImageCodec.phash64(dec.rgb, W, H))
        case "capedit" =>
          // head rewrite: the trailing "in <place> [...] photographed on
          // day N" clause (>= ~37 chars — well above the template
          // boilerplate every caption shares, so it clears the splice
          // floor) survives; the head is re-drawn fresh and sized to
          // ~2.5x the tail so caption jaccard stays below every
          // corroboration floor. The image is re-quantized
          // (reencode-style) so the pixel-shingle path stays cold too:
          // detection requires the suffix-array LCS pass corroborated by
          // the near-identical phash.
          val rgb = ImageCodec.quantize(rgb0, 4)
          val tail = cap0.substring(cap0.indexOf(" in ") + 1)
          def adj() = adjectives(r.nextInt(adjectives.length))
          def noun() = nouns(r.nextInt(nouns.length))
          def place() = places(r.nextInt(places.length))
          val head = new StringBuilder(
            s"a ${adj()} ${noun()} ${verbs(r.nextInt(verbs.length))}")
          while (head.length < tail.length * 3)
            head.append(s" and a ${adj()} ${noun()} toward ${place()}")
          ImageRow(s"img_$id", ImageCodec.encodePpm(rgb, W, H), W, H, "ppmq",
            s"$head $tail", ImageCodec.phash64(rgb, W, H))
      }
    }
  }

  /** The corpus as a typed Dataset — narrow map over range, no shuffle. */
  def corpus(spark: SparkSession, nTotal: Long, partitions: Int = 0): Dataset[ImageRow] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    spark.range(0, nTotal, 1, parts).map(id => genRow(id, nTotal))
  }

  /** Ground-truth dup labels (dup rows only; exact kind included). */
  def groundTruth(spark: SparkSession, nTotal: Long): Dataset[DupLabel] = {
    import spark.implicits._
    val base = nBase(nTotal)
    spark.range(base, nTotal).map { id =>
      val (src, kind) = dupPlan(id, base)
      DupLabel(s"img_$id", s"img_$src", kind)
    }
  }
}
