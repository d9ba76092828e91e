package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heartbeat / silent-key detection — the live twin of the batch
  * [[graft.operators.GapFill]] densification: GapFill makes a missing day
  * an explicit zero after the fact; this fires the alert WHILE the key is
  * silent. "Source X stopped publishing", "subscription Y went quiet" —
  * the absence-of-data signal no filter can express, because the row that
  * would trigger it never arrives.
  *
  * Mechanics: per-key state holds only the last event time (one timestamp
  * per key); an EVENT-TIME timeout is armed at lastSeen + silence, so the
  * alert fires when the WATERMARK — stream time, not wall clock — passes
  * the deadline. Watermark-driven firing makes replays deterministic: a
  * backfill at 100× speed raises the same alerts at the same stream
  * positions. After firing, state clears — the next event from the key
  * re-arms it (silence is re-alerted per gap, not per batch).
  *
  * Scale shape: state is one (timestamp) per distinct key in the state
  * store; a million monitored keys is megabytes. The only shuffle is the
  * groupByKey on the monitored key. Late events within the watermark
  * delay simply re-arm the deadline before it can fire.
  */
object StreamingHeartbeat {

  final case class Silence(key: String, lastSeen: Timestamp, deadline: Timestamp)

  /** Monitor `stream` (any frame with a string key and an event-time
    * column carrying a watermark) and emit a [[Silence]] when a key sees
    * no events for `silenceMs` of EVENT time. Run with
    * `OutputMode.Append`; the input MUST have `withWatermark` on `tsCol`
    * (event-time timeouts require it).
    */
  def detect(stream: DataFrame, keyCol: String, tsCol: String,
      silenceMs: Long): Dataset[Silence] = {
    val s = stream.sparkSession
    import s.implicits._
    stream
      // tsCol is selected UNCAST: a cast would mint a new attribute and
      // silently strip the watermark tag the event-time timeout requires
      .select(col(keyCol).cast("string"), col(tsCol))
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[(String, Timestamp)],
         state: GroupState[Long]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed lastSeen + silence with no new events:
            // fire once and clear — the key re-arms on its next event
            val lastSeen = state.get
            state.remove()
            Iterator.single(
              Silence(key, new Timestamp(lastSeen), new Timestamp(lastSeen + silenceMs)))
          } else {
            val newest = rows.map(_._2.getTime).foldLeft(state.getOption.getOrElse(0L))(math.max)
            val deadline = newest + silenceMs
            if (deadline <= state.getCurrentWatermarkMs()) {
              // the gap has ALREADY elapsed in stream time — a late or
              // backfilled key whose deadline sits behind the watermark.
              // Arming a timeout in the past would throw and kill the
              // query; the honest semantics is to alert immediately
              // (the key provably went silent) and clear, re-arming on
              // its next event.
              state.remove()
              Iterator.single(
                Silence(key, new Timestamp(newest), new Timestamp(deadline)))
            } else {
              state.update(newest)
              state.setTimeoutTimestamp(deadline)
              Iterator.empty
            }
          }
      }
  }
}
