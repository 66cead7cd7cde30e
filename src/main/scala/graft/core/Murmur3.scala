package graft.core

/**
 * MurmurHash3 x64_128 (public-domain algorithm by Austin Appleby), returning
 * the LOW 64 bits — the hash the reference engine uses for every token
 * (`/root/reference/src/lib.rs:33-35`, via the `murmurhash3` crate).
 *
 * Spark's built-in `hash()` is murmur3_x86_32 and `xxhash64` is xxHash64;
 * neither matches, so this is implemented from the published algorithm.
 * Golden vector (from `/root/reference/tests/test.rs:3-6`):
 * `hash64("ACG".getBytes, 42L) == 1731421407650554201L`.
 */
object Murmur3 {
  private final val C1 = 0x87c37b91114253d5L
  private final val C2 = 0x4cf5ad432745937fL

  @inline private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)

  @inline private def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  @inline private def getLongLE(data: Array[Byte], i: Int): Long =
    (data(i) & 0xffL) |
      ((data(i + 1) & 0xffL) << 8) |
      ((data(i + 2) & 0xffL) << 16) |
      ((data(i + 3) & 0xffL) << 24) |
      ((data(i + 4) & 0xffL) << 32) |
      ((data(i + 5) & 0xffL) << 40) |
      ((data(i + 6) & 0xffL) << 48) |
      ((data(i + 7) & 0xffL) << 56)

  /** Low 64 bits of murmur3_x64_128 over `data[offset, offset+len)`. */
  def hash64(data: Array[Byte], offset: Int, len: Int, seed: Long): Long = {
    var h1 = seed
    var h2 = seed
    val nblocks = len >>> 4

    var b = 0
    while (b < nblocks) {
      val i = offset + (b << 4)
      var k1 = getLongLE(data, i)
      var k2 = getLongLE(data, i + 8)

      k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
      h1 = rotl(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2
      h2 = rotl(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      b += 1
    }

    // tail
    val tail = offset + (nblocks << 4)
    val rem = len & 15
    var k1 = 0L
    var k2 = 0L
    if (rem > 8) {
      var i = rem - 1
      while (i >= 8) { k2 ^= (data(tail + i) & 0xffL) << ((i - 8) << 3); i -= 1 }
      k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2
    }
    if (rem > 0) {
      var i = math.min(rem, 8) - 1
      while (i >= 0) { k1 ^= (data(tail + i) & 0xffL) << (i << 3); i -= 1 }
      k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
    }

    // finalization
    h1 ^= len.toLong; h2 ^= len.toLong
    h1 += h2; h2 += h1
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 += h2
    // h2 += h1  (high 64 bits — not needed)
    h1
  }

  def hash64(data: Array[Byte], seed: Long): Long = hash64(data, 0, data.length, seed)

  /** Hash a string's UTF-8 bytes. */
  def hash64(s: String, seed: Long): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    hash64(b, 0, b.length, seed)
  }
}
