package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's synthetic tables (TESTDATA.md): one parquet file
  * per table under a scale-factor directory. Centralised so every query reads
  * through the same door (and so a future move to a partitioned/bucketed
  * layout is one change here, not thirty).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"${sfDir.stripSuffix("/")}/$name.parquet")

  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark's vectorized reader
    * rejects. Read nanos as Long and truncate to micros (integer div — same
    * truncation DuckDB applies when it narrows ns→µs), so oracle comparisons
    * see identical values.
    *
    * Range predicates against the derived µs timestamp would normally be
    * opaque to the parquet filter translator; [[graft.plans.NanoTimestampPushdown]]
    * (installed here) derives the implied bounds on the raw nanos long so
    * they reach the scan as PushedFilters → row-group pruning, same as a
    * natively TimestampType log written by [[EventLog]].
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.plans.NanoTimestampPushdown.install(spark)
    table(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
