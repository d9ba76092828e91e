package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming anomaly detection — the q90 batch law turned into a live
  * monitor: per-key running mean/variance maintained incrementally
  * (Welford's algorithm) in the state store, emitting an anomaly record
  * the moment an observation's z-score against the stats SO FAR crosses
  * the threshold.
  *
  * What deliberately differs from batch q90: the batch query scores every
  * day against the WHOLE history's mean/stddev — a global statistic no
  * stream can know mid-flight. The streaming law scores each observation
  * against the state accumulated BEFORE it (prequential scoring), then
  * folds it in; `minObservations` suppresses the cold-start window where
  * the variance estimate is noise. Within one micro-batch a group's rows
  * are folded in event-time order, so replaying the same feed in bigger
  * or smaller batches emits the same anomalies.
  *
  * Scale shape: state is three doubles per key — a million keys is
  * megabytes; the only shuffle is the groupByKey on the monitored key, and
  * the state store partitions it. Welford is one-pass and numerically
  * stable, so a year-long stream needs no re-aggregation.
  */
object StreamingAnomaly {

  /** Welford accumulator: count, running mean, sum of squared deviations. */
  final case class Stats(n: Long, mean: Double, m2: Double) {
    def add(x: Double): Stats = {
      val n1 = n + 1
      val d = x - mean
      val mean1 = mean + d / n1
      Stats(n1, mean1, m2 + d * (x - mean1))
    }
    def sd: Double = if (n < 2) 0.0 else math.sqrt(m2 / (n - 1))
  }

  final case class Anomaly(key: String, ts: Timestamp, value: Double,
      z: Double, nSeen: Long)

  /** Monitor `stream` (any frame with a string key, timestamp, and double
    * value column) and return the anomaly stream. Run with
    * `OutputMode.Update` (each batch appends only its new anomalies).
    */
  def detect(stream: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      threshold: Double = 3.0, minObservations: Int = 5): Dataset[Anomaly] = {
    val s = stream.sparkSession
    import s.implicits._
    stream
      .select(col(keyCol).cast("string"), col(tsCol).cast("timestamp"),
        col(valueCol).cast("double"))
      .as[(String, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Timestamp, Double)],
         state: GroupState[Stats]) =>
          var st = state.getOption.getOrElse(Stats(0L, 0.0, 0.0))
          val out = Vector.newBuilder[Anomaly]
          // event-time fold order makes batching-invariant emissions
          rows.toVector.sortBy(r => (r._2.getTime, r._3)).foreach { case (_, ts, v) =>
            if (st.n >= minObservations && st.sd > 0.0) {
              val z = (v - st.mean) / st.sd
              if (math.abs(z) >= threshold) out += Anomaly(key, ts, v, z, st.n)
            }
            st = st.add(v)
          }
          state.update(st)
          out.result().iterator
      }
  }
}
