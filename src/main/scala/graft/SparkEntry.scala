package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
  * surface) is declared in `queries`; SQL-expressible ones carry a DuckDB
  * oracle in `oracleSql` (same column names both sides — the driver's
  * compare sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue by nation across the star schema — scan, broadcast joins,
    * hash aggregation in one plan.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc)
  }

  /** One entry per implemented operator from SURVEY.md §2 + the north-star
    * LLM-pipeline surface (dedup, similarity, text analysis, multimodal).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.defs ++ AnalyticQueries.defs ++ ExtendedQueries.defs ++
      DedupQueries.defs ++ SimilarityQueries.defs ++ TextQueries.defs ++
      MultimodalQueries.defs ++ GraphQueries.defs ++ StreamingGateQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ AnalyticQueries.oracles ++ ExtendedQueries.oracles ++
      DedupQueries.oracles ++ SimilarityQueries.oracles ++ TextQueries.oracles ++
      MultimodalQueries.oracles ++ GraphQueries.oracles ++ StreamingGateQueries.oracles
}
