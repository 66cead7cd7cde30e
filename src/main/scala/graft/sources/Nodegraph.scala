package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/**
 * Little-endian LONG-indexed bitset. `java.util.BitSet` caps bit indices
 * at `Int.MaxValue` (~2.1·10⁹ bits ≈ 256 MB/table), but OXLI tablesizes
 * are u64 and real khmer deployments run multi-GB Bloom tables — with an
 * Int-indexed set, `remainderUnsigned` past 2³¹ went negative and
 * get/set threw (or corrupted the table). Supported range is explicit:
 * up to ~1.37·10¹¹ bits (17 GB/table, the JVM array-length ceiling on
 * the word array); beyond that the constructor errors rather than
 * silently truncating.
 *
 * Value semantics over current contents (equals/hashCode) — the
 * NodegraphSpec fixture comparisons rely on them.
 */
final class LongBitSet private (val nBits: Long,
    private val words: Array[Long]) {
  def get(i: Long): Boolean =
    (words((i >>> 6).toInt) & (1L << (i & 63).toInt)) != 0L
  def set(i: Long): Unit =
    words((i >>> 6).toInt) |= (1L << (i & 63).toInt)
  def or(o: LongBitSet): Unit = {
    var w = 0
    while (w < words.length) { words(w) |= o.words(w); w += 1 }
  }
  def cardinality(): Long = {
    var c = 0L; var w = 0
    while (w < words.length) { c += java.lang.Long.bitCount(words(w)); w += 1 }
    c
  }
  /** popcount(this ∧ other) without materializing the intersection. */
  def andCardinality(o: LongBitSet): Long = {
    var c = 0L; var w = 0
    while (w < words.length) {
      c += java.lang.Long.bitCount(words(w) & o.words(w)); w += 1
    }
    c
  }
  /** popcount(this ∨ other) without materializing the union. */
  def orCardinality(o: LongBitSet): Long = {
    var c = 0L; var w = 0
    while (w < words.length) {
      c += java.lang.Long.bitCount(words(w) | o.words(w)); w += 1
    }
    c
  }
  /** LSB-first little-endian bytes, exactly `nBytes` long (the OXLI
    * layout pads to tablesize/8 + 1 — zero-padding here and in the
    * writer produce identical files). */
  def toByteArray(nBytes: Int): Array[Byte] = {
    val out = new Array[Byte](nBytes)
    var j = 0
    val lim = math.min(nBytes.toLong, (words.length.toLong) << 3).toInt
    while (j < lim) {
      out(j) = ((words(j >>> 3) >>> ((j & 7) << 3)) & 0xffL).toByte
      j += 1
    }
    out
  }
  override def equals(that: Any): Boolean = that match {
    case o: LongBitSet => nBits == o.nBits &&
      java.util.Arrays.equals(words, o.words)
    case _ => false
  }
  override def hashCode(): Int =
    31 * java.lang.Long.hashCode(nBits) + java.util.Arrays.hashCode(words)
  def copyOf(): LongBitSet =
    new LongBitSet(nBits, java.util.Arrays.copyOf(words, words.length))
}

object LongBitSet {
  private def wordCount(nBits: Long): Int = {
    require(nBits >= 1 && ((nBits + 63) >>> 6) <= Int.MaxValue.toLong,
      s"tablesize $nBits bits outside the supported range [1, ~1.37e11]")
    ((nBits + 63) >>> 6).toInt
  }
  def empty(nBits: Long): LongBitSet =
    new LongBitSet(nBits, new Array[Long](wordCount(nBits)))
  /** From LSB-first little-endian bytes (the OXLI on-disk bit layout).
    * The layout pads each table to `tablesize/8 + 1` bytes, which can
    * exceed the word capacity for tablesizes divisible by 8 — those
    * padding bytes are zero in any valid file and are ignored. */
  def fromLittleEndianBytes(nBits: Long, raw: Array[Byte]): LongBitSet = {
    val words = new Array[Long](wordCount(nBits))
    val lim = math.min(raw.length.toLong, words.length.toLong << 3).toInt
    var j = 0
    while (j < lim) {
      words(j >>> 3) |= (raw(j) & 0xffL) << ((j & 7) << 3)
      j += 1
    }
    new LongBitSet(nBits, words)
  }
}

/**
 * OXLI nodegraph (Bloom filter) binary reader/writer — reference S7/S8
 * (`/root/reference/src/index/nodegraph.rs:92-184`): magic "OXLI",
 * version 4, ht_type 2, little-endian ksize/occupied/tablesizes, then one
 * LSB-first bitset per table (`tablesize/8 + 1` bytes each).
 *
 * Membership = bit set in ALL tables at `hash mod tablesize` with
 * UNSIGNED 64-bit remainder (`nodegraph.rs:51-59`). The Bloom's engine
 * role (SBT node pruning) is replaced by LSH banding in this engine
 * (SURVEY.md §2.1 S5); this reader exists for reference-fixture parity:
 * the `internal.N` fixtures carry the reference's golden membership and
 * recombination (`update`) test vectors.
 *
 * A plain (non-case) final class: the structure is inherently mutable —
 * [[count]] sets bits and bumps the occupancy counter in place — so
 * case-class value semantics (equals/hashCode over current contents,
 * `copy()` snapshotting a live counter) would mislead callers.
 *
 * @param ksize        k-mer size the graph was built with
 * @param initialOccupiedBins starting occupancy metadata
 *                     (khmer-compatible); see [[occupiedBins]]
 * @param tableSizes   prime table sizes, one per Bloom table
 * @param tables       bit tables, LSB-first within each byte
 */
final class Nodegraph(
    val ksize: Int,
    initialOccupiedBins: Long,
    val tableSizes: Array[Long],
    val tables: Array[LongBitSet]) {

  private var occupied: Long = initialOccupiedBins

  /** Occupancy metadata (khmer-compatible): incremented per newly set bit
    * in EVERY table by [[count]] (`nodegraph.rs:34-43`); deliberately NOT
    * adjusted by [[update]], replicating the reference's quirk
    * (`nodegraph.rs:85-88`, "occupied bins seems to be broken in khmer" —
    * the increment stays commented out there, so recombined graphs
    * serialize the pre-union count). */
  def occupiedBins: Long = occupied

  /** Bloom membership: 1 if `hash` maps to a set bit in every table, else 0
    * (`nodegraph.rs:51-59`). */
  def get(hash: Long): Int = {
    var t = 0
    while (t < tables.length) {
      val bin = java.lang.Long.remainderUnsigned(hash, tableSizes(t))
      if (!tables(t).get(bin)) return 0
      t += 1
    }
    1
  }

  /** Insert; returns true when the hash set at least one new bit in any
    * table (the reference's is_new_kmer, `nodegraph.rs:34-49`), tracking
    * `occupied_bins` per newly set bit so [[toBytes]] of a built graph
    * serializes reference-equal metadata. */
  def count(hash: Long): Boolean = {
    var isNew = false
    var t = 0
    while (t < tables.length) {
      val bin = java.lang.Long.remainderUnsigned(hash, tableSizes(t))
      if (!tables(t).get(bin)) { tables(t).set(bin); occupied += 1; isNew = true }
      t += 1
    }
    isNew
  }

  /** Bitwise union with a same-shape graph (`nodegraph.rs:61-89`). */
  def update(other: Nodegraph): Unit = {
    require(tableSizes.sameElements(other.tableSizes), "incompatible tablesizes")
    var t = 0
    while (t < tables.length) { tables(t).or(other.tables(t)); t += 1 }
  }

  /** Bloom Jaccard: Σ intersection bits / Σ union bits (`nodegraph.rs:199-214`). */
  def similarity(other: Nodegraph): Double = {
    var inter = 0L
    var union = 0L
    var t = 0
    while (t < tables.length) {
      inter += tables(t).andCardinality(other.tables(t))
      union += tables(t).orCardinality(other.tables(t))
      t += 1
    }
    inter.toDouble / union.toDouble
  }

  /** Bloom containment: Σ intersection bits / Σ table sizes (`nodegraph.rs:216-224`). */
  def containment(other: Nodegraph): Double = {
    var inter = 0L
    var t = 0
    while (t < tables.length) {
      inter += tables(t).andCardinality(other.tables(t))
      t += 1
    }
    inter.toDouble / tableSizes.sum.toDouble
  }

  /** Serialize in the OXLI v4 layout (`nodegraph.rs:98-128`): byte-exact
    * round-trip with the reference fixtures (prime tablesizes).
    *
    * Single-buffer serialization is capped at 2 GiB (JVM array limit) —
    * in-memory graphs can be larger ([[LongBitSet]] holds ~1.37e11 bits);
    * fail fast with the range instead of wrapping the byte count
    * negative. Larger graphs stream per-table via
    * [[LongBitSet.toByteArray]] chunks. */
  def toBytes: Array[Byte] = {
    val nBytes = tableSizes.map(s => s / 8 + 1)
    val total = 4L + 1 + 1 + 4 + 1 + 8 + tableSizes.length * 8L + nBytes.sum
    require(total <= Int.MaxValue,
      s"nodegraph serializes to $total bytes, over the 2 GiB single-buffer " +
        "cap; write tables individually for graphs this large")
    val bb = ByteBuffer.allocate(total.toInt).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("OXLI".getBytes("US-ASCII"))
    bb.put(4.toByte).put(2.toByte)
    bb.putInt(ksize)
    bb.put(tables.length.toByte)
    bb.putLong(occupiedBins)
    var t = 0
    while (t < tables.length) {
      bb.putLong(tableSizes(t))
      bb.put(tables(t).toByteArray(nBytes(t).toInt)) // LSB-first, zero-padded
      t += 1
    }
    bb.array()
  }
}

object Nodegraph {

  /** Parse the OXLI v4 ht_type 2 layout (`nodegraph.rs:130-178`). */
  def fromBytes(data: Array[Byte]): Nodegraph = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4)
    bb.get(magic)
    require(new String(magic, "US-ASCII") == "OXLI", "bad magic")
    require(bb.get() == 4, "unsupported version")
    require(bb.get() == 2, "unsupported ht_type")
    val ksize = bb.getInt()
    val nTables = bb.get() & 0xff
    val occupied = bb.getLong()
    val sizes = new Array[Long](nTables)
    val tables = new Array[LongBitSet](nTables)
    var t = 0
    while (t < nTables) {
      val size = bb.getLong()
      sizes(t) = size
      val nBytesL = size / 8 + 1
      require(nBytesL > 0 && nBytesL <= bb.remaining(),
        s"nodegraph header claims a table of $nBytesL bytes but only " +
          s"${bb.remaining()} remain in the buffer")
      val raw = new Array[Byte](nBytesL.toInt)
      bb.get(raw)
      tables(t) = LongBitSet.fromLittleEndianBytes(size, raw)
      t += 1
    }
    new Nodegraph(ksize, occupied, sizes, tables)
  }

  def fromPath(path: String): Nodegraph =
    fromBytes(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  /** Empty graph with the given table sizes (`nodegraph.rs:20-32`). */
  def empty(tableSizes: Array[Long], ksize: Int): Nodegraph =
    new Nodegraph(ksize, 0L, tableSizes, tableSizes.map(LongBitSet.empty))
}
