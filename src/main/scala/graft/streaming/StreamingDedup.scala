package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication over the event log — the streaming counterpart
  * of the batch dedup pack (q30/q35). The reference has no dedup operator;
  * its closest behavior is the DLQ's upsert-by-event-id
  * (reference: src/deadletter.ts:315-340). A training-data ingest pipeline
  * needs the real thing: at-least-once delivery (ours and every bus's)
  * means the SAME event can arrive twice, and a 100 TB corpus cannot
  * re-scan itself to find out.
  *
  * The state-size contract is the whole design:
  *
  *   - [[withinWatermark]] — `dropDuplicatesWithinWatermark`: duplicates
  *     arrive CLOSE IN TIME (redelivery, retry storms), so state for a key
  *     is dropped once the watermark passes it. Bounded state, unbounded
  *     key domain — the production default for id-dedup of an event
  *     stream.
  *   - [[exact]] — plain `dropDuplicates`: state never evicts. Only for
  *     BOUNDED key domains (a dimension feed, a small id space) where
  *     "duplicate" must mean "ever seen", not "seen recently".
  *
  * Both run as ordinary stateful operators: per-key state lives in the
  * state store (RocksDB at scale), partitioned by key hash — no driver
  * memory involved.
  */
object StreamingDedup {

  /** Watermark-bounded exact dedup: rows whose `keys` repeat within the
    * watermark delay of each other are collapsed to the first arrival;
    * per-key state is evicted once the watermark passes. `delay` is the
    * redelivery horizon you tolerate, not a correctness knob — a duplicate
    * arriving later than `delay` after the original slips through (and is
    * caught by the batch sweep, q30).
    */
  def withinWatermark(stream: DataFrame, eventTimeCol: String, delay: String,
      keys: Seq[String]): DataFrame =
    stream.withWatermark(eventTimeCol, delay).dropDuplicatesWithinWatermark(keys)

  /** Unbounded-state exact dedup — "ever seen" semantics. State grows with
    * the distinct-key count; reserve for bounded key domains.
    */
  def exact(stream: DataFrame, keys: Seq[String]): DataFrame =
    stream.dropDuplicates(keys)

  /** Content dedup: same as [[withinWatermark]] but keyed on the md5 of a
    * content column (the streaming face of q35's content-hash groups) —
    * catches re-published bodies under fresh event ids.
    */
  def byContent(stream: DataFrame, eventTimeCol: String, delay: String,
      contentCol: String): DataFrame =
    withinWatermark(
      stream.withColumn("__content_key", md5(col(contentCol).cast("binary"))),
      eventTimeCol, delay, Seq("__content_key"))
      .drop("__content_key")
}
