package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native Catalyst kernels for the sketch-comparison hot path (SURVEY.md §7
 * stage 5). They read `ArrayData` in place — no per-row array copies, no
 * UDF encoder round-trip — and codegen as a single static call, so the
 * surrounding plan stays inside whole-stage codegen.
 *
 * The UDF formulations in [[graft.functions.GraftFunctions]] are kept as
 * differential-test oracles (ExpressionsSpec asserts bit-equality).
 */
object SketchKernels {

  /**
   * Combined-denominator Jaccard (`intersection_size` + `compare`,
   * `/root/reference/src/lib.rs:464-508`) in ONE merge pass over two
   * unsigned-sorted mins arrays: walk the merged union in ascending
   * unsigned order; `denom` counts union elements up to `num` (bottom-k
   * re-truncation of the combined sketch); `common` counts elements of
   * A∩B that fall inside that truncated prefix.
   */
  def jaccard(a: ArrayData, b: ArrayData, num: Int): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var union = 0
    var common = 0
    val limit = if (num > 0) num else Int.MaxValue
    while ((i < na || j < nb) && union < limit) {
      if (i < na && j < nb) {
        val c = java.lang.Long.compareUnsigned(a.getLong(i), b.getLong(j))
        if (c == 0) { common += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      } else if (i < na) i += 1
      else j += 1
      union += 1
    }
    if (union == 0) 0.0 else common.toDouble / math.max(1, union).toDouble
  }

  /** `count_common / |a|` (`/root/reference/src/index.rs:146-160`). */
  def containment(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0) return 0.0
    var i = 0
    var j = 0
    var common = 0
    while (i < na && j < nb) {
      val c = java.lang.Long.compareUnsigned(a.getLong(i), b.getLong(j))
      if (c == 0) { common += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    common.toDouble / na.toDouble
  }

  /** Downsample prefix cut: keep mins <= maxHash (UNSIGNED; the sorted-
    * ascending invariant makes this a binary-searched prefix copy) —
    * the kernel twin of [[graft.core.MinHash.downsample]], mins only. */
  def downsample(m: ArrayData, maxHash: Long): ArrayData = {
    val n = m.numElements()
    if (maxHash == 0L || n == 0) return m // 0 = "not scaled"
    var lo = 0
    var hi = n
    val k = maxHash ^ java.lang.Long.MIN_VALUE
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if ((m.getLong(mid) ^ java.lang.Long.MIN_VALUE) <= k) lo = mid + 1 else hi = mid
    }
    val out = new Array[Long](lo)
    var i = 0
    while (i < lo) { out(i) = m.getLong(i); i += 1 }
    new GenericArrayData(out)
  }

  /** Dot product of two ARRAY<DOUBLE> columns, left-to-right accumulation. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  private final val C1 = 0x87c37b91114253d5L
  private final val C2 = 0x4cf5ad432745937fL

  @inline private def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33; k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33; k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33; k
  }

  /**
   * murmur3_x64_128 low-64 of the little-endian serialization of
   * `m[from, until)` — equal to `Murmur3.hash64(bytes)` of the same longs
   * written LE (a long read back from its LE bytes is itself, so blocks
   * are consumed directly; kernel-parity test in ExpressionsSpec).
   */
  def hash64LongsLE(m: ArrayData, from: Int, until: Int, seed: Long): Long = {
    var h1 = seed
    var h2 = seed
    val count = until - from
    val len = count * 8
    var i = from
    while (i + 1 < until) {
      var k1 = m.getLong(i)
      var k2 = m.getLong(i + 1)
      k1 *= C1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= C2; h1 ^= k1
      h1 = java.lang.Long.rotateLeft(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= C1; h2 ^= k2
      h2 = java.lang.Long.rotateLeft(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 2
    }
    if (i < until) { // 8-byte tail
      var k1 = m.getLong(i)
      k1 *= C1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= C2; h1 ^= k1
    }
    h1 ^= len.toLong; h2 ^= len.toLong
    h1 += h2; h2 += h1
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 + h2
  }

  /** Caption MinHash sketch: normalized char-k-shingles → bottom-num (or
    * scaled-cutoff) mins — the string-side sketcher of the flagship
    * pipeline, as a static kernel for codegen. */
  def captionMinhash(s: org.apache.spark.unsafe.types.UTF8String,
      ksize: Int, num: Int, maxHash: Long, seed: Long): ArrayData =
    new GenericArrayData(graft.core.MinHash.sketchHashes(
      graft.core.Shingles.charShingleHashes(s.toString, ksize, seed),
      graft.core.SketchConfig(num = num, ksize = ksize, seed = seed, maxHash = maxHash)))

  /** Caption SimHash64 fingerprint over the same shingle stream. */
  def captionSimhash(s: org.apache.spark.unsafe.types.UTF8String,
      ksize: Int, seed: Long): Long =
    graft.core.Shingles.simhash64(
      graft.core.Shingles.charShingleHashes(s.toString, ksize, seed))

  /** Image MinHash sketch: decode → coarse-normalize → byte-shingle →
    * bottom-num mins; unknown formats fall back to raw-byte shingles (the
    * multimodal stub path). */
  def imageMinhash(bytes: Array[Byte], fmt: org.apache.spark.unsafe.types.UTF8String,
      ksize: Int, num: Int, maxHash: Long, seed: Long, stride: Int): ArrayData = {
    val payload = graft.sources.ImageCodec.decode(bytes, if (fmt == null) null else fmt.toString) match {
      case Some(d) => graft.sources.ImageCodec.normalizeForSketch(d.rgb)
      case None => bytes
    }
    new GenericArrayData(graft.core.MinHash.sketchHashes(
      graft.core.Shingles.byteShingleHashes(payload, ksize, stride, seed),
      graft.core.SketchConfig(num = num, ksize = ksize, seed = seed, maxHash = maxHash)))
  }

  /** LSH band keys over a mins array: murmur of each band slice (band
    * index mixed into the seed), partial trailing band kept. */
  def bandKeys(m: ArrayData, bands: Int, rowsPerBand: Int, seed: Long): ArrayData = {
    val n = m.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val nOut = math.min(bands, (n + rowsPerBand - 1) / rowsPerBand)
    val out = new Array[Long](nOut)
    var i = 0
    while (i < nOut) {
      val from = i * rowsPerBand
      val until = math.min(from + rowsPerBand, n)
      out(i) = hash64LongsLE(m, from, until, seed + i)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Abundance-weighted angular similarity (1 - 2*acos(cos)/pi) over two sketches'
    * (mins, abunds) pairs — static kernel for the codegen'd
    * [[AngularMinhash]]. */
  def angular(ma: ArrayData, aa: ArrayData, mb: ArrayData, ab: ArrayData): Double =
    graft.core.MinHash.angularSimilarity(
      ma.toLongArray(), aa.toLongArray(), mb.toLongArray(), ab.toLongArray())

  /** Longest common substring of two UTF8 strings via a generalized
    * suffix array — the north rule's exact-substring caption pass. */
  def captionLcs(a: org.apache.spark.unsafe.types.UTF8String,
      b: org.apache.spark.unsafe.types.UTF8String): Int =
    graft.core.SuffixArrays.lcsLen(a.toString, b.toString)

  /** ±1 hyperplane components, derived from murmur3 and cached per
    * config (tiny: nTables×nPlanes×dim doubles, deterministic). */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int, Long), Array[Array[Array[Double]]]]()

  private def planesFor(dim: Int, nPlanes: Int, nTables: Int, seed: Long): Array[Array[Array[Double]]] =
    planeCache.computeIfAbsent((dim, nPlanes, nTables, seed), _ =>
      Array.tabulate(nTables, nPlanes, dim) { (t, p, i) =>
        if ((graft.core.Murmur3.hash64(s"$t:$p:$i", seed) & 1L) == 0L) 1.0 else -1.0
      })

  /** Product-quantization encode: per subspace `j` (subvector
    * `v[j·subDim, (j+1)·subDim)`), the code of the L2-nearest centroid in
    * the flat codebook (`cb[j·ks + c]`, ties to the LOWEST code — strict
    * `<` on a left-to-right squared-distance accumulation, so the argmin
    * is bit-deterministic and cross-engine replicable). */
  def pqEncode(v: ArrayData, cb: ArrayData, m: Int, ks: Int, subDim: Int): ArrayData = {
    if (v.numElements() < m * subDim)
      throw new IllegalArgumentException(
        s"pq_encode: vector has ${v.numElements()} elements, need ${m * subDim}")
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ks) {
        val cent = cb.getArray(j * ks + c)
        var s = 0.0
        var i = 0
        while (i < subDim) {
          val x = v.getDouble(j * subDim + i) - cent.getDouble(i)
          s += x * x
          i += 1
        }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric PQ distance (ADC): Σ_j ‖q_j − C[j][codes_j]‖² — the exact
    * query subvector against the candidate's QUANTIZED subvectors, in
    * fixed (j asc, i asc) accumulation order. The candidate side is the
    * m-byte code array, never the vector — the PQ memory story. */
  def pqAdc(v: ArrayData, codes: ArrayData, cb: ArrayData,
      m: Int, ks: Int, subDim: Int): Double = {
    if (v.numElements() < m * subDim)
      throw new IllegalArgumentException(
        s"pq_adc: query vector has ${v.numElements()} elements, need ${m * subDim}")
    if (codes.numElements() < m)
      throw new IllegalArgumentException(
        s"pq_adc: code array has ${codes.numElements()} entries, need $m")
    var total = 0.0
    var j = 0
    while (j < m) {
      val code = codes.getInt(j)
      if (code < 0 || code >= ks)
        // fail fast: in the flat j*ks+code layout an out-of-range code
        // would silently read ANOTHER subspace's centroid (a geometry
        // mismatch between the encoded dump and the scorer)
        throw new IllegalArgumentException(
          s"pq_adc: code $code out of range [0, $ks) in subspace $j")
      val cent = cb.getArray(j * ks + code)
      var s = 0.0
      var i = 0
      while (i < subDim) {
        val x = v.getDouble(j * subDim + i) - cent.getDouble(i)
        s += x * x
        i += 1
      }
      total += s
      j += 1
    }
    total
  }

  /** Sign-bit hyperplane LSH keys over an ARRAY<FLOAT> embedding —
    * codegen'd twin of the UDF in `Similarity.hyperplaneKeysUdf` (same
    * plane derivation, same accumulation order, same probe-key layout). */
  def hyperplaneKeys(v: ArrayData, dim: Int, nPlanes: Int, nTables: Int,
      seed: Long, probe: Boolean): ArrayData = {
    val planes = planesFor(dim, nPlanes, nTables, seed)
    val perTable = if (probe) nPlanes + 1 else 1
    val out = new Array[Long](nTables * perTable)
    val nv = v.numElements()
    var t = 0
    while (t < nTables) {
      var key = 0L
      var p = 0
      while (p < nPlanes) {
        val comp = planes(t)(p)
        var dot = 0.0
        var i = 0
        val n = math.min(nv, comp.length)
        while (i < n) { dot += comp(i) * v.getFloat(i); i += 1 }
        if (dot > 0) key |= (1L << p)
        p += 1
      }
      out(t * perTable) = key * nTables + t
      var q = 1
      while (q < perTable) {
        out(t * perTable + q) = (key ^ (1L << (q - 1))) * nTables + t
        q += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Block-combination schemes for [[jointBandKeys]]: block bit-offsets,
    * per-block masks, and the per-slot multiplier. Scheme 0 = eight 8-bit
    * blocks (SimHash joint keys, base 256); scheme 1 = the Manku six-block
    * 11/11/11/11/10/10 split (phash/audio keys, base 2048). */
  private final val jointSchemes: Array[(Array[Int], Array[Long], Long)] = Array(
    ((0 until 8).map(_ * 8).toArray, Array.fill(8)(0xffL), 256L),
    (Array(0, 11, 22, 33, 44, 54),
      Array(2047L, 2047L, 2047L, 2047L, 1023L, 1023L), 2048L))

  /** combos(scheme)(pick) = all C(nBlocks, pick) index combinations, in
    * `Seq.combinations` order (the order is part of the key tag, so it is
    * pinned here and differentially tested against the fold-built
    * Column form in GraftFunctions). */
  private final val jointCombos: Array[Array[Array[Array[Int]]]] =
    jointSchemes.map { case (offs, _, _) =>
      (0 to offs.length).map { pick =>
        offs.indices.combinations(pick).map(_.toArray).toArray
      }.toArray
    }

  /**
   * All C(nBlocks, pick) joint band keys of a 64-bit fingerprint in one
   * static call: key = comboTag folded with the selected block values
   * (`acc * base + block`), identical to the fold-of-Columns form in
   * [[graft.functions.GraftFunctions]] — which built C(8,5) = 56 inlined
   * expression trees, DUPLICATED into the bands stage's filter and
   * project, overflowing Janino's 64 KB method limit and dropping the
   * whole stage out of codegen (observed on d05/m07/m10's sketch stage).
   * This kernel codegens as one call site.
   */
  def jointBandKeys(fp: Long, scheme: Int, pick: Int): ArrayData = {
    val (offs, masks, base) = jointSchemes(scheme)
    val combos = jointCombos(scheme)(pick)
    val out = new Array[Long](combos.length)
    var t = 0
    while (t < combos.length) {
      val c = combos(t)
      var acc = t.toLong
      var j = 0
      while (j < c.length) {
        val i = c(j)
        acc = acc * base + ((fp >>> offs(i)) & masks(i))
        j += 1
      }
      out(t) = acc
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** `dot_product(a, b)` over ARRAY<DOUBLE> — no intermediate array (the
  * `aggregate(zip_with(...))` formulation allocates one per row). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    SketchKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.SketchKernels.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `jaccard_minhash(a, b)` — reference-semantics similarity estimate. */
case class JaccardMinhash(left: Expression, right: Expression, num: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    SketchKernels.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], num)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.SketchKernels.jaccard($a, $b, $num)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `containment_minhash(a, b)` — asymmetric containment. */
case class ContainmentMinhash(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    SketchKernels.containment(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.SketchKernels.containment($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `graft_downsample(mins, scaled)` — sketch re-truncation to a coarser
  * scaled cutoff (the `search --scaled` operation the reference promises
  * and drops, sourmash.yml:71-76); codegen'd prefix cut. `maxHash` is
  * pre-converted from the scaled literal at registration. */
case class DownsampleMinhash(child: Expression, maxHash: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(m: Any): Any =
    SketchKernels.downsample(m.asInstanceOf[ArrayData], maxHash)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, m =>
      s"graft.functions.expressions.SketchKernels.downsample($m, ${maxHash}L)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `minhash_band_keys(mins)` — LSH band keys, codegen'd. */
case class MinhashBandKeys(child: Expression, bands: Int, rowsPerBand: Int, seed: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(bands > 0 && rowsPerBand > 0,
    s"minhash_band_keys: bands=$bands rowsPerBand=$rowsPerBand must be positive")
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(m: Any): Any =
    SketchKernels.bandKeys(m.asInstanceOf[ArrayData], bands, rowsPerBand, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, m =>
      s"graft.functions.expressions.SketchKernels.bandKeys($m, $bands, $rowsPerBand, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `caption_minhash(text)` — string sketcher, codegen'd (the flagship
  * hot path; the UDF twin in GraftFunctions is the differential oracle). */
case class CaptionMinhash(child: Expression, ksize: Int, num: Int, maxHash: Long, seed: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(s: Any): Any =
    SketchKernels.captionMinhash(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], ksize, num, maxHash, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.expressions.SketchKernels.captionMinhash($s, $ksize, $num, ${maxHash}L, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `caption_simhash(text)` — 64-bit SimHash fingerprint, codegen'd. */
case class CaptionSimhash(child: Expression, ksize: Int, seed: Long)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(s: Any): Any =
    SketchKernels.captionSimhash(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], ksize, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.expressions.SketchKernels.captionSimhash($s, $ksize, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `image_minhash(bytes, fmt)` — decode → normalize → sketch, codegen'd. */
case class ImageMinhash(left: Expression, right: Expression,
    ksize: Int, num: Int, maxHash: Long, seed: Long, stride: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(BinaryType, StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(b: Any, f: Any): Any =
    SketchKernels.imageMinhash(b.asInstanceOf[Array[Byte]],
      f.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      ksize, num, maxHash, seed, stride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, f) =>
      s"graft.functions.expressions.SketchKernels.imageMinhash($b, $f, $ksize, $num, ${maxHash}L, ${seed}L, $stride)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `hyperplane_keys(vec)` — sign-bit LSH keys for the embedding ANN
  * path, codegen'd (the e03 banding hot path). */
case class HyperplaneKeys(child: Expression, dim: Int, nPlanes: Int,
    nTables: Int, seed: Long, probe: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(dim > 0 && nPlanes > 0 && nPlanes <= 62 && nTables > 0,
    s"hyperplane_keys: dim=$dim nPlanes=$nPlanes nTables=$nTables out of range")
  // ARRAY<FLOAT> declared: an ARRAY<DOUBLE> embedding column gets an
  // analysis-time cast — without the declaration, getFloat() read 4-byte
  // strides of 8-byte slots and produced silently-garbage LSH keys
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    SketchKernels.hyperplaneKeys(v.asInstanceOf[ArrayData], dim, nPlanes,
      nTables, seed, probe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.expressions.SketchKernels.hyperplaneKeys($v, $dim, $nPlanes, $nTables, ${seed}L, $probe)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `caption_lcs(a, b)` — longest-common-substring length via a
  * generalized suffix array (codegen'd; confirm-stage substring pass). */
/** `graft_angular(minsA, abundsA, minsB, abundsB)` — abundance-weighted
  * angular similarity (published sourmash: 1 − 2·acos(ρ)/π over sparse
  * hash→abundance vectors); the
  * SQL-surface twin of `MinHash.angularSimilarity` (sm07, the
  * `"abundance"` search mode). Strict nulls: a sketch without stored
  * abundances passes `array_repeat(1L, size(mins))` explicitly. */
case class AngularMinhash(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] =
    Seq(ArrayType(LongType), ArrayType(LongType), ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    SketchKernels.angular(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.expressions.SketchKernels.angular($a, $b, $c, $d)")
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression, newFourth: Expression): Expression =
    copy(newFirst, newSecond, newThird, newFourth)
}

/** `pq_encode(vec, codebook)` — product-quantization codes (ARRAY<INT>,
  * one per subspace). The codebook rides the plan as a nested-array
  * LITERAL (flat `j·ks + c` layout, m·ks·subDim doubles ≈ KBs — model
  * output, exactly like the broadcast IVF codebook), so executors need no
  * side channel and the expression codegens as one static call. */
case class PqEncode(left: Expression, right: Expression,
    m: Int, ks: Int, subDim: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  require(m > 0 && ks > 0 && subDim > 0, s"pq_encode: m=$m ks=$ks subDim=$subDim")
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] =
    Seq(ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any, cb: Any): Any =
    SketchKernels.pqEncode(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData], m, ks, subDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, cb) =>
      s"graft.functions.expressions.SketchKernels.pqEncode($v, $cb, $m, $ks, $subDim)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `pq_adc(queryVec, codes, codebook)` — asymmetric PQ distance, codegen'd
  * (the e08 rerank hot path: exact query side, m-byte candidate side). */
case class PqAdc(first: Expression, second: Expression, third: Expression,
    m: Int, ks: Int, subDim: Int)
    extends TernaryExpression with ImplicitCastInputTypes {
  require(m > 0 && ks > 0 && subDim > 0, s"pq_adc: m=$m ks=$ks subDim=$subDim")
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] =
    Seq(ArrayType(DoubleType), ArrayType(IntegerType), ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any, codes: Any, cb: Any): Any =
    SketchKernels.pqAdc(v.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      cb.asInstanceOf[ArrayData], m, ks, subDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, codes, cb) =>
      s"graft.functions.expressions.SketchKernels.pqAdc($v, $codes, $cb, $m, $ks, $subDim)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}

/** `joint_band_keys(fp)` — all C(nBlocks, pick) joint Hamming band keys,
  * codegen'd as one static call (see [[SketchKernels.jointBandKeys]] for
  * why the fold-of-Columns form broke whole-stage codegen). `scheme`:
  * 0 = eight 8-bit blocks, 1 = Manku 11/11/11/11/10/10. */
case class FingerprintJointKeys(child: Expression, scheme: Int, pick: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(scheme == 0 || scheme == 1, s"joint_band_keys: unknown scheme $scheme")
  require(pick >= 1 && pick <= (if (scheme == 0) 8 else 6),
    s"joint_band_keys: pick=$pick out of range for scheme $scheme")
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(fp: Any): Any =
    SketchKernels.jointBandKeys(fp.asInstanceOf[Long], scheme, pick)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, fp =>
      s"graft.functions.expressions.SketchKernels.jointBandKeys($fp, $scheme, $pick)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class CaptionLcs(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.Bridge.AbstractType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    SketchKernels.captionLcs(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.SketchKernels.captionLcs($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
