package graft.core

import org.scalatest.funsuite.AnyFunSuite

class SuffixArraysSpec extends AnyFunSuite {

  /** O(n·m) DP longest-common-substring — the differential model. */
  private def lcsDp(a: String, b: String): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    var best = 0
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      for (j <- 1 to b.length) {
        cur(j) = if (a.charAt(i - 1) == b.charAt(j - 1)) prev(j - 1) + 1 else 0
        if (cur(j) > best) best = cur(j)
      }
      System.arraycopy(cur, 0, prev, 0, cur.length)
    }
    best
  }

  test("suffix array of 'banana' is the classic one") {
    val s = "banana".map(_.toInt).toArray
    assert(SuffixArrays.suffixArray(s).toSeq === Seq(5, 3, 1, 0, 4, 2))
  }

  test("lcp array of 'banana'") {
    val s = "banana".map(_.toInt).toArray
    val sa = SuffixArrays.suffixArray(s)
    assert(SuffixArrays.lcpArray(s, sa).toSeq === Seq(0, 1, 3, 0, 0, 2))
  }

  test("lcs: known cases") {
    assert(SuffixArrays.lcsLen("", "anything") === 0)
    assert(SuffixArrays.lcsLen("a", "a") === 1)
    assert(SuffixArrays.lcsLen("abc", "xyz") === 0)
    assert(SuffixArrays.lcsLen("photographed on day 7", "photographed on day 7") ===
      "photographed on day 7".length)
    // head rewrite: shared tail is the LCS, neither contains the other
    assert(SuffixArrays.lcsLen(
      "a fluffy cat beside a tiny garden photographed on day 12",
      "an ornate temple facing a canyon photographed on day 12") ===
      "n photographed on day 12".length) // garde[n]/canyo[n] share the n
    // containment special case: lcs == min length
    assert(SuffixArrays.lcsLen("the old town", "xx the old town yy") === 12)
  }

  test("lcs: differential vs DP over random strings") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 300) {
      val alpha = "ab cd".substring(0, 2 + rnd.nextInt(3))
      val a = Seq.fill(rnd.nextInt(60))(alpha(rnd.nextInt(alpha.length))).mkString
      val b = Seq.fill(rnd.nextInt(60))(alpha(rnd.nextInt(alpha.length))).mkString
      assert(SuffixArrays.lcsLen(a, b) === lcsDp(a, b), s"trial $trial a='$a' b='$b'")
    }
  }

  test("lcs: differential vs DP over realistic caption edits") {
    val rnd = new scala.util.Random(7)
    val words = Array("fluffy", "rusty", "cat", "harbor", "mountain", "a",
      "the", "beside", "under", "photographed", "on", "day")
    def sentence(k: Int) = Seq.fill(k)(words(rnd.nextInt(words.length))).mkString(" ")
    for (trial <- 1 to 100) {
      val a = sentence(6 + rnd.nextInt(8))
      val b = if (rnd.nextBoolean()) sentence(3 + rnd.nextInt(4)) + " " + a.drop(a.length / 2)
      else sentence(6 + rnd.nextInt(8))
      assert(SuffixArrays.lcsLen(a, b) === lcsDp(a, b), s"trial $trial a='$a' b='$b'")
    }
  }

  test("lcs is symmetric") {
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 50) {
      val a = Seq.fill(rnd.nextInt(40))(('a' + rnd.nextInt(3)).toChar).mkString
      val b = Seq.fill(rnd.nextInt(40))(('a' + rnd.nextInt(3)).toChar).mkString
      assert(SuffixArrays.lcsLen(a, b) === SuffixArrays.lcsLen(b, a))
    }
  }

  test("lcs counts code points (astral chars count once, SQL semantics)") {
    val rocket = new String(Character.toChars(0x1F680)) // astral: 2 UTF-16 units
    // shared chunk "ab<rocket>cd" = 5 code points (6 UTF-16 units)
    assert(SuffixArrays.lcsLen(s"xxab${rocket}cdyy", s"zab${rocket}cdw") === 5)
    // codepoint-DP differential over mixed BMP/astral strings
    val alpha = Array("a", "b", rocket, new String(Character.toChars(0x1F409)))
    val rnd = new scala.util.Random(5)
    def mk() = Seq.fill(rnd.nextInt(25))(alpha(rnd.nextInt(alpha.length))).mkString
    def dpCp(a: String, b: String): Int = {
      val ca = a.codePoints().toArray; val cb = b.codePoints().toArray
      var best = 0
      val prev = new Array[Int](cb.length + 1); val cur = new Array[Int](cb.length + 1)
      for (i <- 1 to ca.length) {
        for (j <- 1 to cb.length) {
          cur(j) = if (ca(i - 1) == cb(j - 1)) prev(j - 1) + 1 else 0
          if (cur(j) > best) best = cur(j)
        }
        System.arraycopy(cur, 0, prev, 0, cur.length)
      }
      best
    }
    for (trial <- 1 to 80) {
      val a = mk(); val b = mk()
      assert(SuffixArrays.lcsLen(a, b) === dpCp(a, b), s"trial $trial")
    }
  }

  test("lcsLen truncates oversized inputs instead of throwing (side cap)") {
    // the cap path: with sideCap=4, only the 4-code-point prefixes survive,
    // so the shared tail "WXYZ" is invisible and the LCS is the shared
    // head "ab" — and no IllegalArgumentException escapes to the caller
    assert(SuffixArrays.lcsLen("abcdWXYZ", "abefWXYZ", sideCap = 4) === 2)
    // sideCap larger than LcsSideCap is clamped, not honored
    assert(SuffixArrays.lcsLen("abc", "zabcz", sideCap = Int.MaxValue) === 3)
    // non-positive sideCap is clamped to 1, never a NegativeArraySizeException
    assert(SuffixArrays.lcsLen("abc", "abd", sideCap = -1) === 1)
    assert(SuffixArrays.lcsLen("abc", "abd", sideCap = 0) === 1)
  }

  test("suffixArray rejects out-of-range symbols instead of silently corrupting") {
    intercept[IllegalArgumentException] {
      SuffixArrays.suffixArray(Array(3000000, 1, 2))
    }
  }

  test("suffix array sorts all suffixes of random strings") {
    val rnd = new scala.util.Random(9)
    for (_ <- 1 to 50) {
      val n = 1 + rnd.nextInt(80)
      val str = Seq.fill(n)(('a' + rnd.nextInt(4)).toChar).mkString
      val s = str.map(_.toInt).toArray
      val sa = SuffixArrays.suffixArray(s)
      val expected = (0 until n).sortBy(str.substring(_))
      assert(sa.toSeq === expected, s"str='$str'")
    }
  }
}
