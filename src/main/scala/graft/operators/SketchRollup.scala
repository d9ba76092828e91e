package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-sketch engagement rollup — the approximate scale path for
  * q101's exact DAU/WAU/MAU: at 100 TB you cannot re-scan a month of raw
  * events per day to count trailing distinct users, so you store ONE
  * Datasketches HLL sketch per (day) — built once, kilobytes each — and
  * every trailing window becomes a union of stored sketches, never a
  * second look at the events.
  *
  * Why this is sound: HLL registers are max-based, so the union is
  * order-independent and `union(sketch(A), sketch(B)) == sketch(A ∪ B)`
  * EXACTLY (identical register state, identical estimate) — the
  * mergeability law SketchRollupSpec pins, alongside the error bound
  * against exact distinct counts. Accuracy is set by lgK (default 12 ≈
  * 0.8% relative standard error, 4 KB per sketch).
  *
  * Shape at scale: building sketches is one pass with map-side partial
  * sketch merges (the aggregate is associative); the trailing-window
  * join is day×window rows of kilobyte sketches — the same bounded-grid
  * discipline as q101, but over sketches instead of the (user, day)
  * table.
  */
object SketchRollup {

  /** One HLL sketch of `idCol` per day of `tsCol` — the stored index. */
  def dailySketches(df: DataFrame, tsCol: String, idCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(expr(s"hll_sketch_agg($idCol, $lgK)").as("sk"))

  /** Trailing-window distinct estimates computed ONLY from the stored
    * sketches: for each window w, the estimate of the union of the last
    * w days' sketches. Output: (day, active_w1, active_w2, ...).
    */
  def trailingDistinct(daily: DataFrame,
      windows: Seq[Int] = Seq(1, 7, 30)): DataFrame = {
    val s = daily.sparkSession
    import s.implicits._
    val days = daily.select($"day")
    windows.map { w =>
      days.as("d")
        .join(daily.as("s"), datediff($"d.day", $"s.day").between(0, w - 1))
        .groupBy($"d.day".as("day"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as(s"active_$w"))
    }.reduce(_.join(_, "day")).orderBy($"day")
  }
}
