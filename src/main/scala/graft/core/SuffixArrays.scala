package graft.core

/**
 * Generalized suffix array over two strings — the exact-substring pass of
 * the north rule ("suffix-array exact-substring pass for caption
 * near-dupes"). The pair's captions are concatenated with a sentinel,
 * indexed with a prefix-doubling suffix array (O(n log n), allocation-lean
 * packed-long sort) plus Kasai's LCP, and the longest common substring is
 * the maximum LCP between lexicographically adjacent suffixes owned by
 * different strings.
 *
 * Why this instead of `contains()`: containment of the shorter caption is
 * the special case `lcs == min(len)`; the suffix array additionally finds
 * long shared chunks when BOTH captions carry novel text around the chunk
 * (head/tail rewrites — the common human near-dupe edit), which no
 * substring predicate can express.
 *
 * Cost model at scale: runs per LSH-gated CONFIRM pair on caption-length
 * strings (10² chars) — linearithmic per pair, linear in candidate count,
 * embarrassingly parallel, no state across rows.
 */
object SuffixArrays {

  /** Max supported combined length: ranks+index are packed 21/21/21 into
    * one long for the unboxed sort. Captions are orders of magnitude
    * shorter; longer payloads should be fingerprinted, not suffix-sorted,
    * per pair. */
  val MaxLen: Int = (1 << 21) - 2

  /** Max symbol value: initial ranks are the raw symbols, packed into the
    * same 21-bit fields as the doubled ranks. Unicode code points + 2
    * (0x10FFFF + 2) fit comfortably. */
  val MaxSymbol: Int = (1 << 21) - 2

  /**
   * Suffix array of `s` (non-negative ints ≤ [[MaxSymbol]]) by prefix
   * doubling. Each round sorts packed longs
   * `(rank[i]+1) << 42 | (rank[i+k]+1) << 21 | i` — single
   * primitive-array sort per round, no comparators, no boxing.
   */
  def suffixArray(s: Array[Int]): Array[Int] = {
    val n = s.length
    require(n <= MaxLen, s"suffixArray input length $n exceeds $MaxLen")
    if (n == 0) return Array.emptyIntArray
    var chk = 0
    while (chk < n) {
      require(s(chk) >= 0 && s(chk) <= MaxSymbol,
        s"suffixArray symbol ${s(chk)} outside [0, $MaxSymbol]")
      chk += 1
    }
    val idxMask = (1L << 21) - 1
    var rank = new Array[Int](n)
    var next = new Array[Int](n)
    val keys = new Array[Long](n)
    // initial ranks: the symbol values themselves (dense enough — order only)
    var i = 0
    while (i < n) { rank(i) = s(i); i += 1 }
    var k = 1
    var done = false
    while (!done) {
      i = 0
      while (i < n) {
        val r2 = if (i + k < n) rank(i + k) + 1L else 0L
        keys(i) = ((rank(i) + 1L) << 42) | (r2 << 21) | i
        i += 1
      }
      java.util.Arrays.sort(keys)
      // re-rank: adjacent keys with equal (r1, r2) share a rank
      var r = 0
      next((keys(0) & idxMask).toInt) = 0
      i = 1
      while (i < n) {
        if ((keys(i) >>> 21) != (keys(i - 1) >>> 21)) r += 1
        next((keys(i) & idxMask).toInt) = r
        i += 1
      }
      val t = rank; rank = next; next = t
      done = r == n - 1 || k >= n
      k <<= 1
    }
    val sa = new Array[Int](n)
    i = 0
    while (i < n) { sa(rank(i)) = i; i += 1 }
    sa
  }

  /** Kasai LCP: `lcp(i)` = longest common prefix of suffixes `sa(i-1)`
    * and `sa(i)`; `lcp(0) = 0`. O(n). */
  def lcpArray(s: Array[Int], sa: Array[Int]): Array[Int] = {
    val n = s.length
    val rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(sa(i)) = i; i += 1 }
    val lcp = new Array[Int](n)
    var h = 0
    i = 0
    while (i < n) {
      if (rank(i) > 0) {
        val j = sa(rank(i) - 1)
        while (i + h < n && j + h < n && s(i + h) == s(j + h)) h += 1
        lcp(rank(i)) = h
        if (h > 0) h -= 1
      } else h = 0
      i += 1
    }
    lcp
  }

  /**
   * Length of the longest common substring of `a` and `b` (0 if either is
   * empty), measured in Unicode CODE POINTS — matching SQL engines'
   * `length`/`substring` semantics (a surrogate pair counts once), so
   * the DuckDB oracle replication agrees beyond the BMP. Adjacent-suffix
   * scan over the generalized suffix array of `a + SEP + b`: any common
   * substring is a common prefix of one suffix from each side, and the
   * max such prefix appears between two suffixes that are ADJACENT in
   * suffix order (anything between them shares at least that prefix).
   *
   * Inputs are capped at [[LcsSideCap]] code points PER SIDE (so the
   * combined array always fits [[MaxLen]]): a direct SQL/expression user
   * feeding pathological multi-megabyte strings gets the LCS of the
   * ~1M-code-point prefixes instead of a runtime
   * IllegalArgumentException killing the job. Pipeline callers cap far
   * lower anyway (DedupConfig.lcsMaxChars); any real near-dup decision
   * resolves well inside either cap.
   */
  val LcsSideCap: Int = (MaxLen - 1) / 2

  def lcsLen(a: String, b: String, sideCap: Int = LcsSideCap): Int = {
    // clamp to [1, LcsSideCap]: a non-positive caller value must not
    // reach Arrays.copyOf as a negative length — the throw-free contract
    // is the whole point of the cap
    val cap = math.min(math.max(1, sideCap), LcsSideCap)
    var ca = a.codePoints().toArray
    var cb = b.codePoints().toArray
    if (ca.length > cap) ca = java.util.Arrays.copyOf(ca, cap)
    if (cb.length > cap) cb = java.util.Arrays.copyOf(cb, cap)
    val n = ca.length
    val m = cb.length
    if (n == 0 || m == 0) return 0
    val total = n + 1 + m
    val s = new Array[Int](total)
    var i = 0
    while (i < n) { s(i) = ca(i) + 2; i += 1 }
    s(n) = 1 // sentinel below every code point + 2; never matches either side
    i = 0
    while (i < m) { s(n + 1 + i) = cb(i) + 2; i += 1 }
    val sa = suffixArray(s)
    val lcp = lcpArray(s, sa)
    var best = 0
    i = 1
    while (i < total) {
      if (lcp(i) > best) {
        // suffix at the sentinel position n starts with SEP — its LCP with
        // anything is 0, so it never reaches here; < n ⇔ owned by `a`
        val fromA = sa(i - 1) < n
        val fromB = sa(i) < n
        if (fromA != fromB) best = lcp(i)
      }
      i += 1
    }
    best
  }
}
