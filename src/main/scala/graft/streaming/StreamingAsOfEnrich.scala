package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the live twin of the batch
  * [[graft.plans.AsOf]] operator: enrich a stream of facts against the
  * latest-prior row of a (slowly-)changing reference stream, per key.
  * This is the reference's subscription-enrichment pattern at scale
  * (a consumer joining each delivered event to the newest state it had
  * published at or before the event's time).
  *
  * LAW (pinned by StreamingAsOfEnrichSpec): the emitted rows equal
  * `AsOf.join(left, right, key, time, tie = payload, strict)` run as a
  * batch over the same data, for every left row whose event time the
  * watermark has passed. Match = the right row with the greatest
  * (time, payload) pair strictly below (strict) / at-or-below
  * (non-strict) the left's (time, payload) pair; unmatched lefts emit
  * null right fields.
  *
  * Mechanics: both sides union into one keyed stream; per key,
  * `flatMapGroupsWithState` buffers in-flight rows and emits a left ONLY
  * once the watermark passes its event time — at that point every right
  * that could precede it has either arrived or is provably late (Spark
  * drops stateful-operator input older than the watermark), so the match
  * is final and replay-deterministic. An event-time timeout flushes
  * pending lefts when the watermark advances on other keys' data.
  *
  * Scale shape: state per key = the in-flight window (rows newer than
  * the watermark, bounded by the watermark delay × arrival rate) plus
  * ONE compacted right — the "current state" a slowly-changing dimension
  * keeps forever. The only shuffle is the groupByKey; state never grows
  * with history. Limits vs the batch operator: backward direction only,
  * no tolerance band (compose with a filter on the emitted gap instead);
  * payloads travel as single string columns — struct-pack or `to_json`
  * wider rows.
  */
object StreamingAsOfEnrich {

  final case class Enriched(
      key: String, ts: Timestamp, payload: String,
      matched_ts: Option[Timestamp], matched_payload: Option[String])

  /** Per-key buffers; times in micros so the match law is exactly the
    * batch operator's (timestamps compare at micro precision).
    */
  final case class Buf(
      lefts: Seq[(Long, String)], rights: Seq[(Long, String)])

  private def toMicros(ts: Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Enrich `left` against the latest-prior `right` row per key.
    *
    * Both frames must be streaming, carry `withWatermark` on their time
    * column (the union's watermark is the min of the two), and expose
    * (key, time, payload) under the given column names.
    */
  def enrich(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, payloadCol: String,
      strict: Boolean = true): Dataset[Enriched] = {
    val s = left.sparkSession
    import s.implicits._
    // ts selected UNCAST: a cast mints a new attribute and strips the
    // watermark tag event-time timeouts require
    def shape(df: DataFrame, isLeft: Boolean) =
      df.select(col(keyCol).cast("string").as("k"), col(tsCol),
        col(payloadCol).cast("string").as("p"), lit(isLeft).as("is_left"))
    shape(left, isLeft = true).unionByName(shape(right, isLeft = false))
      .as[(String, Timestamp, String, Boolean)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[(String, Timestamp, String, Boolean)],
         state: GroupState[Buf]) =>
          val prev = state.getOption.getOrElse(Buf(Nil, Nil))
          var lefts = prev.lefts
          var rights = prev.rights
          rows.foreach { case (_, ts, p, isLeft) =>
            val us = toMicros(ts)
            if (isLeft) lefts :+= (us -> p) else rights :+= (us -> p)
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val rightsSorted = rights.sorted
          // finalize lefts the watermark has passed: all their candidate
          // rights have arrived (later arrivals would be late rows Spark
          // already drops)
          val (ready, pending) = lefts.partition(_._1 < wmUs)
          val ord = Ordering.Tuple2[Long, String]
          val out = ready.sorted.iterator.map { case l @ (lt, lp) =>
            // the batch operator's law exactly: greatest (time, tie) PAIR
            // strictly below / at-or-below the left's (time, tie)
            val m = rightsSorted.takeWhile(r => if (strict) ord.lt(r, l) else ord.lteq(r, l))
              .lastOption
            Enriched(key, fromMicros(lt), lp, m.map(r => fromMicros(r._1)), m.map(_._2))
          }.toVector
          // compact: every emitted left goes; of the rights behind the
          // watermark only the LATEST survives (it is the standing match
          // for future lefts — the "current state" of the key)
          val (past, live) = rightsSorted.partition(_._1 < wmUs)
          val kept = past.lastOption.toSeq ++ live
          if (pending.isEmpty && kept.isEmpty) state.remove()
          else {
            state.update(Buf(pending, kept))
            if (pending.nonEmpty) {
              // flush when the watermark passes the oldest pending left,
              // even if this key never sees another row; the timeout must
              // sit strictly ahead of the current watermark
              val oldestMs = pending.map(_._1).min / 1000L
              state.setTimeoutTimestamp(math.max(oldestMs + 1L,
                state.getCurrentWatermarkMs() + 1L))
            }
          }
          out.iterator
      }
  }
}
