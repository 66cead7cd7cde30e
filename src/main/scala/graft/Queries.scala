package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The registered operator surface: every entry is one operator family from
 * SURVEY.md §2 (or a training-data-pipeline extension), exercised as a
 * query over the driver's parquet tables at `sfDir`, with a DuckDB oracle
 * where the semantics are SQL-expressible.
 *
 * Column names are aliased identically in the Spark plan and the oracle
 * SQL (the driver's compare sorts columns by name before hashing).
 */
object Queries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_filter_project" -> { (s, d) =>
      t(s, d, "lineitem")
        .where(col("l_returnflag") === "R" && col("l_quantity") > 30.0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q01_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 30.0""".stripMargin
  )
}
