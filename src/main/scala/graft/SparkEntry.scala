package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.DedupPipeline
import graft.sources.SyntheticCorpus

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query: end-to-end near-duplicate clustering over the
    * deterministic synthetic image+caption corpus (north_rule pipeline:
    * sketch → exact dedup → LSH bands → confirm → connected components).
    * Driver smoke-checks rows > 0 on sf=0.001-scale input. */
  def entry(spark: SparkSession): DataFrame =
    DedupPipeline.clusters(SyntheticCorpus.corpus(spark, 1000L).toDF())

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles
}
