package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.core.{MinHash, SketchConfig, U64}

/**
 * Typed aggregator merging MinHash sketches — the reference's `merge`/
 * `add_from` verbs (`/root/reference/src/lib.rs:307-426`) as a Spark
 * aggregation: per-chunk sketches of a sharded document/image roll up to
 * the sketch of the whole, because
 * `merge(sketch(a), sketch(b)) == sketch(a ++ b)` (kernel-property-tested,
 * KernelSpec "recombination").
 *
 * Partial aggregation (map-side combine) applies: each executor merges
 * its local sketches before the shuffle, so the shuffle carries one
 * `num`-bounded sketch per group per partition.
 */
class MinHashMergeAgg(cfg: SketchConfig)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(buf: Array[Long], row: Array[Long]): Array[Long] =
    MinHash.merge(buf, if (row == null) Array.emptyLongArray else row, cfg)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    MinHash.merge(a, b, cfg)
  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = bufferEncoder
}

object MinHashAgg {
  /** Column form: `minhash_merge(minsCol)` under `cfg` semantics. */
  def minhashMerge(mins: Column, cfg: SketchConfig): Column =
    org.apache.spark.sql.functions.udaf(new MinHashMergeAgg(cfg)).apply(mins)
}
