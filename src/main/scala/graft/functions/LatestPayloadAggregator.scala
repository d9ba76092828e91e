package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.model.EventRow

/** Typed `Aggregator` — the UDAF leg of the reference's extension trio
  * (SURVEY.md §2.11: EventHandler ≈ UDF, applyEvent ≈ UDAF reduce,
  * explode ≈ UDTF): latest payload per group by (timestamp, id), i.e. the
  * reference's "current state = last event" materialization
  * (reference: src/sourcing.ts — the degenerate fold where apply just
  * replaces state).
  *
  * Mergeable by construction (keep the max-keyed pair), so Spark runs it
  * with map-side partial aggregation — the same shuffle shape as max_by.
  * Usable as a TypedColumn on grouped Datasets:
  *
  * {{{
  * events.groupByKey(_.topic).agg(LatestPayloadAggregator.toColumn)
  * }}}
  */
object LatestPayloadAggregator
    extends Aggregator[EventRow, (Long, String, String), String] {

  // buffer = (timestampMillis, id, payload) of the latest event seen
  override def zero: (Long, String, String) = (Long.MinValue, "", "")

  override def reduce(b: (Long, String, String), e: EventRow): (Long, String, String) = {
    val ts = e.timestamp.getTime
    if (ts > b._1 || (ts == b._1 && e.id > b._2)) (ts, e.id, e.payload) else b
  }

  override def merge(a: (Long, String, String), b: (Long, String, String)): (Long, String, String) =
    if (b._1 > a._1 || (b._1 == a._1 && b._2 > a._2)) b else a

  override def finish(b: (Long, String, String)): String = b._3

  override def bufferEncoder: Encoder[(Long, String, String)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.STRING)

  override def outputEncoder: Encoder[String] = Encoders.STRING
}
