package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * LSH banding → candidate pairs. This is the Spark-native replacement for
 * the reference's SBT Bloom-pruned search (`SBT::find`,
 * `/root/reference/src/index/sbt.rs:147-175`): the tree's log-pruning
 * becomes a bucket equi-grouping, and the no-false-prune property of the
 * Bloom overestimate (`src/index/sbt.rs:249-251`) becomes the banding
 * s-curve guarantee.
 *
 * Scale design:
 *  - ONE shuffle: `(band, bucket)` grouping; pairs are generated inside
 *    each bucket (no self-join, which would shuffle the exploded table
 *    twice).
 *  - Hot buckets (power-law at web scale: boilerplate captions, blank
 *    images) are CAPPED at `maxBucket` ids; oversize buckets are dropped
 *    and COUNTED — never silently (`droppedBuckets` accumulator). True
 *    exact-dup mass must be removed upstream by the exact-dedup
 *    pre-aggregation (turns the worst skew into a groupBy).
 *  - Output is deduplicated on (a, b) because a pair can collide in
 *    several bands.
 */
object Lsh {

  /**
   * @param banded DataFrame with columns (id: Long/String, bandKey: Long) —
   *               one row per (row, band) from `explode`d band arrays.
   * @return pairs (a, b) with a < b, distinct.
   */
  def candidatePairs(banded: DataFrame, maxBucket: Int = 64): DataFrame = {
    val spark = banded.sparkSession
    import spark.implicits._
    val dropped = spark.sparkContext.longAccumulator("lsh.droppedBuckets")

    val ids = banded.groupBy($"bandKey").agg(collect_list($"id").as("ids"))
      .where(size($"ids") > 1)

    val pairGen = udf((ids: Seq[String]) => {
      if (ids.length > maxBucket) {
        dropped.add(1)
        Array.empty[(String, String)]
      } else {
        val sorted = ids.sorted.distinct.toArray
        val out = new scala.collection.mutable.ArrayBuffer[(String, String)](
          sorted.length * (sorted.length - 1) / 2)
        var i = 0
        while (i < sorted.length) {
          var j = i + 1
          while (j < sorted.length) { out += ((sorted(i), sorted(j))); j += 1 }
          i += 1
        }
        out.toArray
      }
    })

    ids.select(explode(pairGen($"ids")).as("p"))
      .select($"p._1".as("a"), $"p._2".as("b"))
      .dropDuplicates("a", "b")
  }

  /** Explode an array-of-band-keys column into (id, bandKey) rows, mixing
    * the source tag into the key so different sketch families (image
    * minhash / caption minhash / phash / simhash) never share buckets. */
  def explodeBands(df: DataFrame, idCol: String, bandsCol: String, sourceTag: Int): DataFrame = {
    df.select(col(idCol).as("id"),
      explode(col(bandsCol)).as("rawKey"))
      .select(col("id"),
        xxhash64(col("rawKey"), lit(sourceTag)).as("bandKey"))
  }
}
