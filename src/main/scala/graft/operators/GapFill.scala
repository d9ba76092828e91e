package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar gap-fill (resampling) — the densification every monitoring and
  * forecasting consumer needs: a day with NO events must appear as an
  * explicit zero, because a trailing average computed over only-observed
  * days is wrong exactly on the days that matter (outage days vanish from
  * their own alert).
  *
  * Shape: the dense grid is distinct keys × the observed date span — a
  * deliberate cross join of two TINY derived sets (|keys|·|days| rows,
  * never event-sized), left-joined back to the daily counts, then an
  * exact trailing-window sum/avg per key. At 100 TB the grid is still
  * thousands of rows; the only data-sized work is the one daily-count
  * shuffle. Counts are exact integers; the trailing avg divides an exact
  * integer sum by the in-frame row count, identically in any engine.
  */
object GapFill {

  /** Dense per-(key, day) counts over the span observed in `df`, with
    * missing days as explicit zeros and trailing `trailing`-day stats.
    * Output: (keyCol, day, n, sum7, avg7) ordered by (key, day).
    */
  def daily(df: DataFrame, keyCol: String, tsCol: String,
      trailing: Int = 7): DataFrame =
    fromDailyCounts(df.sparkSession,
      df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
        .agg(count(lit(1)).as("n")),
      keyCol, trailing)

  /** [[daily]] starting from an ALREADY-AGGREGATED (keyCol, day, n) table
    * — the r15 shape for consumers of a maintained daily rollup
    * ([[IncrementalRollup]]'s output table): densifying a dashboard must
    * not re-aggregate the raw log when the day-grain table is published.
    * `daily` delegates here, so both paths share one grid/window law.
    */
  def fromDailyCounts(s: org.apache.spark.sql.SparkSession,
      dailyCnt: DataFrame, keyCol: String, trailing: Int = 7): DataFrame = {
    import s.implicits._
    val days = dailyCnt.agg(min($"day").as("d0"), max($"day").as("d1"))
      .select(explode(sequence($"d0", $"d1")).as("day"))
    val keys = dailyCnt.select(col(keyCol)).distinct()
    val w = Window.partitionBy(col(keyCol)).orderBy($"day".asc)
      .rowsBetween(-(trailing - 1), 0)
    keys.crossJoin(days)
      .join(dailyCnt, Seq(keyCol, "day"), "left")
      .select(col(keyCol), $"day", coalesce($"n", lit(0L)).as("n"))
      .withColumn("sum7", sum($"n").over(w))
      .withColumn("avg7", round(avg($"n").over(w), 6))
      .orderBy(col(keyCol), $"day")
  }
}
