package graft.sources

/**
 * Minimal deterministic image codec for the corpus rows
 * `(image_id, bytes, w, h, fmt, caption, phash)` (BASELINE.json input_hint).
 *
 * Formats:
 *  - `ppm`  — binary P6 PPM, lossless round-trip.
 *  - `ppmq` — same container with pixel values quantized to step 4 at
 *             encode time: a deterministic stand-in for lossy encoding
 *             (container JPEG encoders are JVM-nondeterministic; SURVEY.md
 *             §7 risks). Uniform step-4 quantization ⇒ MSE ≈ 1.25 ⇒
 *             PSNR ≈ 47 dB vs source pixels, satisfying the per-row
 *             PSNR ≥ 40 dB invariant (BASELINE.json:15).
 *
 * Everything here is pure and allocation-light: it runs inside executor
 * tasks (generation, sketching, invariant checks).
 */
object ImageCodec {

  /** Encode interleaved RGB pixels as binary P6 PPM. */
  def encodePpm(rgb: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(rgb.length == w * h * 3, s"rgb length ${rgb.length} != ${w * h * 3}")
    val header = s"P6\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Quantize each channel byte to a uniform step (round-to-nearest,
    * clamped to 255) — the simulated-lossy transform. */
  def quantize(rgb: Array[Byte], step: Int): Array[Byte] = {
    val out = new Array[Byte](rgb.length)
    var i = 0
    while (i < rgb.length) {
      val v = rgb(i) & 0xff
      val q = math.min(255, ((v + step / 2) / step) * step)
      out(i) = q.toByte
      i += 1
    }
    out
  }

  final case class Decoded(rgb: Array[Byte], w: Int, h: Int)

  /** Nearest-neighbor k×k grayscale thumbnail of a decoded image — the
    * multimodal RESIZE primitive (BT.601 integer luma, row-major grid).
    * Pure integer arithmetic: the same decode yields the same grid on
    * any platform, so thumbnails are safe inputs to downstream sketches
    * and oracle constants. */
  def thumbnail(dec: Decoded, k: Int): Array[Int] = {
    require(k > 0 && dec.w > 0 && dec.h > 0, "thumbnail needs positive dims")
    val out = new Array[Int](k * k)
    var gy = 0
    while (gy < k) {
      val sy = math.min(dec.h - 1, gy * dec.h / k)
      var gx = 0
      while (gx < k) {
        val sx = math.min(dec.w - 1, gx * dec.w / k)
        val p = (sy * dec.w + sx) * 3
        val r = dec.rgb(p) & 0xff
        val g = dec.rgb(p + 1) & 0xff
        val b = dec.rgb(p + 2) & 0xff
        out(gy * k + gx) = (299 * r + 587 * g + 114 * b) / 1000
        gx += 1
      }
      gy += 1
    }
    out
  }

  /** Decode image bytes by format: `ppm`/`ppmq` via the native parser,
    * `png`/`bmp`/`gif`/`jpg` via `javax.imageio` (real container
    * decoders — decoding a fixed byte stream is deterministic; only
    * ENCODING was the SURVEY §7 nondeterminism risk, so corpora encode
    * once at generation). Returns None for unknown formats (the
    * multimodal stub path handles those — a real deployment plugs its
    * decoder there). */
  def decode(bytes: Array[Byte], fmt: String): Option[Decoded] = fmt match {
    case "ppm" | "ppmq" => decodePpm(bytes)
    case "png" | "bmp" | "gif" | "jpg" | "jpeg" => decodeImageIo(bytes)
    case _ => None
  }

  /** Decode via ImageIO (PNG/BMP/GIF ship with the JDK). */
  def decodeImageIo(bytes: Array[Byte]): Option[Decoded] = {
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val rgb = new Array[Byte](w * h * 3)
        var i = 0
        while (i < w * h) {
          rgb(i * 3) = ((px(i) >> 16) & 0xff).toByte
          rgb(i * 3 + 1) = ((px(i) >> 8) & 0xff).toByte
          rgb(i * 3 + 2) = (px(i) & 0xff).toByte
          i += 1
        }
        Some(Decoded(rgb, w, h))
      }
    } catch { case _: Throwable => None }
  }

  /** Encode interleaved RGB pixels as PNG (lossless: decode is byte-exact). */
  def encodePng(rgb: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(rgb.length == w * h * 3, s"rgb length ${rgb.length} != ${w * h * 3}")
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      px(i) = ((rgb(i * 3) & 0xff) << 16) | ((rgb(i * 3 + 1) & 0xff) << 8) | (rgb(i * 3 + 2) & 0xff)
      i += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Encode interleaved RGB pixels as JPEG — the lossy real-container
    * path. Chroma subsampling is DISABLED via the writer's image metadata
    * (1×1 sampling factors) and quality defaults to 1.0: the remaining
    * loss is DCT + YCbCr round-trip rounding, measured min PSNR 49.9 dB
    * over the corpus generator — the BASELINE.json per-row ≥ 40 dB decode
    * invariant holds. 4:2:0 subsampling (any quality ≤ 1.0 by default in
    * the JDK writer) lands at ~34 dB on these images and would break it.
    * Encoding is JVM-deterministic for fixed input (measured; corpora
    * encode once at generation, decode is the distributed path). */
  def encodeJpeg(rgb: Array[Byte], w: Int, h: Int, quality: Float = 1.0f): Array[Byte] = {
    require(rgb.length == w * h * 3, s"rgb length ${rgb.length} != ${w * h * 3}")
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      px(i) = ((rgb(i * 3) & 0xff) << 16) | ((rgb(i * 3 + 1) & 0xff) << 8) | (rgb(i * 3 + 2) & 0xff)
      i += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val itype = javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img)
    val meta = writer.getDefaultImageMetadata(itype, params)
    val fmt = "javax_imageio_jpeg_image_1.0"
    val tree = meta.getAsTree(fmt).asInstanceOf[org.w3c.dom.Element]
    val sofs = tree.getElementsByTagName("sof")
    if (sofs.getLength > 0) {
      val comps = sofs.item(0).asInstanceOf[org.w3c.dom.Element]
        .getElementsByTagName("componentSpec")
      var c = 0
      while (c < comps.getLength) {
        val el = comps.item(c).asInstanceOf[org.w3c.dom.Element]
        el.setAttribute("HsamplingFactor", "1")
        el.setAttribute("VsamplingFactor", "1")
        c += 1
      }
      meta.setFromTree(fmt, tree)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, meta), params)
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  def decodePpm(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    // header: "P6\n<w> <h>\n255\n" — parse three whitespace-separated ints
    var i = 2
    val nums = new Array[Int](3)
    var n = 0
    while (n < 3 && i < bytes.length) {
      while (i < bytes.length && (bytes(i) == ' ' || bytes(i) == '\n' || bytes(i) == '\t' || bytes(i) == '\r')) i += 1
      var v = 0
      var any = false
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1; any = true
        if (v > 100000000) return None // corrupt header; also caps w*h*3 in Int range below
      }
      if (!any) return None
      nums(n) = v; n += 1
    }
    if (n < 3 || i >= bytes.length) return None
    i += 1 // single whitespace after maxval
    val w = nums(0); val h = nums(1)
    // Long arithmetic: a crafted header like 26755x26755 wraps w*h*3
    // negative in Int, which would slip past the length check and throw
    // out of copyOfRange instead of honoring the None-on-bad-input contract
    val wh3 = w.toLong * h * 3L
    if (nums(2) != 255 || w <= 0 || h <= 0 || wh3 > (bytes.length - i).toLong) return None
    Some(Decoded(java.util.Arrays.copyOfRange(bytes, i, i + wh3.toInt), w, h))
  }

  /** PSNR in dB between two equal-length pixel arrays (identical → ∞). */
  def psnr(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length)
    var se = 0.0
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      se += d.toDouble * d
      i += 1
    }
    if (se == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 / (se / a.length))
  }

  /** Average-hash perceptual fingerprint: grayscale → 8×8 box-downsample →
    * threshold at the mean → 64 bits. Deterministic, pure. */
  def phash64(rgb: Array[Byte], w: Int, h: Int): Long = {
    val gw = 8; val gh = 8
    val sums = new Array[Double](gw * gh)
    val counts = new Array[Int](gw * gh)
    var y = 0
    while (y < h) {
      val gy = y * gh / h
      var x = 0
      while (x < w) {
        val gx = x * gw / w
        val p = (y * w + x) * 3
        val gray = 0.299 * (rgb(p) & 0xff) + 0.587 * (rgb(p + 1) & 0xff) +
          0.114 * (rgb(p + 2) & 0xff)
        sums(gy * gw + gx) += gray
        counts(gy * gw + gx) += 1
        x += 1
      }
      y += 1
    }
    var mean = 0.0
    var i = 0
    while (i < 64) { sums(i) = if (counts(i) > 0) sums(i) / counts(i) else 0.0; mean += sums(i); i += 1 }
    mean /= 64.0
    var bits = 0L
    i = 0
    while (i < 64) { if (sums(i) > mean) bits |= (1L << i); i += 1 }
    bits
  }

  /** Coarse normalization for sketching: channel bytes quantized to step 16
    * (top nibble). Robust to simulated-lossy re-encodes (step-4
    * quantization) and small pixel noise; the image analog of the DNA
    * canonicalization step (SURVEY.md §2.2 K4). */
  def normalizeForSketch(rgb: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](rgb.length)
    var i = 0
    while (i < rgb.length) { out(i) = (rgb(i) & 0xf0).toByte; i += 1 }
    out
  }
}
