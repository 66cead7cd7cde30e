package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Bottom-k DISTINCT values as a Spark AGGREGATE — sourmash's bottom-k
 * sketch shape (`/root/reference/src/lib.rs:192-245`, the `num > 0` mode:
 * sorted buffer, binary-search insert, evict past the cap, duplicates
 * collapse) lifted from per-row kernel to grouped aggregation over raw
 * occurrences. The buffer is a sorted distinct array capped at `k`, so
 * PARTIAL aggregation applies: each map partition reduces its occurrences
 * into one ≤k buffer per group before the exchange, and the shuffle
 * carries k-bounded sketches — no distinct pre-pass, no per-group sort,
 * one exchange. This is the production shape of the KMV distinct-count
 * estimator (t13's audit re-derives it cross-engine) and of bottom-k
 * sketch building generally.
 *
 * Ordering is the element type's natural order; for fixed-width lowercase
 * hex strings (md5) lexicographic == numeric, and it matches both Spark's
 * UTF8String binary sort and DuckDB's VARCHAR order, which is what makes
 * the cross-engine oracle exact.
 */
class BottomKAgg(k: Int) extends Aggregator[String, Array[String], Array[String]] {
  require(k > 0, s"bottom-k: k must be positive, got $k")

  override def zero: Array[String] = Array.empty

  override def reduce(buf: Array[String], v: String): Array[String] = {
    if (v == null) return buf
    val i = java.util.Arrays.binarySearch(
      buf.asInstanceOf[Array[AnyRef]], v.asInstanceOf[AnyRef])
    if (i >= 0) buf // already present — distinct semantics
    else {
      val ins = -i - 1
      if (ins >= k) buf // not among the k smallest seen so far
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[String](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    // sorted-distinct merge truncated at k; each input is sorted distinct,
    // so equal values can only face each other across the two arrays
    val out = new scala.collection.mutable.ArrayBuffer[String](
      math.min(a.length + b.length, k))
    var i = 0
    var j = 0
    while (out.length < k && (i < a.length || j < b.length)) {
      val v =
        if (i >= a.length) { val x = b(j); j += 1; x }
        else if (j >= b.length) { val x = a(i); i += 1; x }
        else {
          val c = a(i).compareTo(b(j))
          if (c < 0) { val x = a(i); i += 1; x }
          else if (c > 0) { val x = b(j); j += 1; x }
          else { val x = a(i); i += 1; j += 1; x } // equal: consume both once
        }
      out += v
    }
    out.toArray
  }

  override def finish(r: Array[String]): Array[String] = r
  override def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  override def outputEncoder: Encoder[Array[String]] = bufferEncoder
}

object BottomKAgg {
  /** Column form: the sorted array of the k smallest distinct values. */
  def bottomK(v: Column, k: Int): Column =
    org.apache.spark.sql.functions.udaf(new BottomKAgg(k)).apply(v)
}
