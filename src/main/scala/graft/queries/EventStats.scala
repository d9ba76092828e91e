package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** ONE cached (day, event_type, n, total_dec) rollup of the event log —
  * the DocProfiles treatment for the events side: this is exactly the
  * materialized daily table [[graft.operators.IncrementalRollup]]
  * maintains in production (q121 gates it), so the daily-analytics pack
  * (q21 tumbling, q23 sliding, q37 pivot, q90 z-scores, q140 CUSUM)
  * reads the STORED artifact instead of re-shuffling the raw log per
  * query. Re-derivations stay exact: counts re-sum exactly, and the
  * per-(day,type) sum is kept as DECIMAL so any regrouping is exact
  * decimal addition (a double here would make downstream sums
  * order-sensitive).
  */
object EventStats {

  /** The event log pre-partitioned by user — the clustered layout a
    * behavioral store keeps on disk (bucketed by user) so every per-user
    * window/sessionization reads co-located rows. Cached WITH its hash
    * partitioning: InMemoryTableScan reports outputPartitioning, so the
    * per-user window family (q17/q22/q24/q150/q163…) skips its exchange
    * and pays only the in-partition sort. One shuffle per session
    * instead of one per query per execution.
    */
  def byUser(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.CacheRegistry.track(
      Tables.events(s, dir).repartition($"user_id").cache())
  }

  /** (day DATE, event_type STRING, n BIGINT, total_dec DECIMAL(18,2)). */
  def dailyTypeAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.CacheRegistry.track(Tables.events(s, dir)
      .groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).as("total_dec"))
      .cache())
  }
}
