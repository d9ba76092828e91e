package graft.sources

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Event, EventRow}

/** Options of a log scan — the reference's `getEvents` filter surface
  * (reference: src/persistence.ts:28-69; src/types.ts for EventFilter).
  * Bounds are inclusive; `None` means absent. The reference treats a `0`
  * bound as absent too (JS falsy check, reference: src/persistence.ts:46) —
  * callers encode that by passing None.
  */
final case class ScanOptions(
    fromTimestamp: Option[Long] = None, // epoch millis, inclusive
    toTimestamp: Option[Long] = None,   // epoch millis, inclusive
    eventTypes: Seq[String] = Nil,
    limit: Option[Int] = None
)

/** The append-only event log: one parquet dataset partitioned by `topic`.
  *
  * This single table subsumes the reference's three stores (InMemory / File /
  * Postgres, reference: src/persistence.ts) — they differ only in durability,
  * not semantics (SURVEY.md §7.0). At 100 TB the layout is what matters:
  *
  *   - `partitionBy("topic")` → topic scans touch one directory (partition
  *     pruning), the moral equivalent of the reference's per-topic Map key /
  *     per-topic directory / `WHERE topic` index.
  *   - parquet min/max stats on `timestamp` → time-range predicates prune row
  *     groups without custom indexing (the reference builds a
  *     (topic,timestamp) btree, reference: src/persistence.ts:281-288).
  *   - appends are new files; no compaction logic here (a real deployment
  *     would layer Delta/Iceberg for that — out of scope, semantics equal).
  */
final class EventLog(spark: SparkSession, val path: String) {
  import spark.implicits._

  private def fs: FileSystem =
    FileSystem.get(URI.create(path), spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(new Path(path))

  /** Append events. Store-then-forward ordering (reference: src/topic.ts:112-115)
    * is structural here: the log IS the delivery source, so anything a
    * subscription sees has already been persisted.
    */
  def append(events: Dataset[EventRow]): Unit =
    events.write.mode(SaveMode.Append).partitionBy("topic").parquet(path)

  def appendDF(events: DataFrame): Unit =
    append(events.as[EventRow])

  /** Driver-side batch append (the pub/sub hot path publishes small batches
    * built on the driver; one log append per batch).
    */
  def appendRows(events: Seq[EventRow]): Unit =
    append(spark.createDataset(events))

  /** Whole-log view. Explicit schema: partition discovery infers `topic` from
    * the directory layout; pinning the schema keeps `topic` a StringType.
    */
  def all: DataFrame =
    spark.read.schema(Event.schema).parquet(path)

  /** The reference's scan: filter(F1 ts-range, F2 type-set) → sort by
    * timestamp ASC (O1) → limit (O3) (reference: src/persistence.ts:37-68).
    * Equal-timestamp order is unspecified in the reference; we pin
    * (timestamp, id) so results are deterministic under shuffle.
    * Catalyst turns sort+limit into TakeOrderedAndProject (true top-k, no
    * global sort) and pushes every predicate to the parquet scan.
    */
  def getEvents(topic: String, opts: ScanOptions = ScanOptions()): DataFrame = {
    var df = all.where($"topic" === topic)
    opts.fromTimestamp.foreach(ms => df = df.where($"timestamp" >= timestampMillis(ms)))
    opts.toTimestamp.foreach(ms => df = df.where($"timestamp" <= timestampMillis(ms)))
    if (opts.eventTypes.nonEmpty) df = df.where($"type".isin(opts.eventTypes: _*))
    df = df.orderBy($"timestamp".asc, $"id".asc)
    opts.limit.fold(df)(df.limit)
  }

  def getEventsTyped(topic: String, opts: ScanOptions = ScanOptions()): Dataset[EventRow] =
    getEvents(topic, opts).as[EventRow]

  /** Any-match (reference: src/sourcing.ts:227-231 — `limit 1` then length
    * check). Spark short-circuits via CollectLimit.
    */
  def hasEvents(topic: String): Boolean =
    !all.where($"topic" === topic).limit(1).isEmpty

  /** Retention delete (reference: src/persistence.ts:74-93): drop events with
    * `timestamp < cutoff` in one topic, return the deleted count
    * (initialCount − remaining, reference: src/persistence.ts:83-91).
    *
    * Implemented as a partition rewrite: only the one topic partition is
    * rewritten (dynamic partition overwrite), everything else is untouched —
    * at scale this is a per-partition maintenance job, not a full-table scan.
    */
  def deleteEvents(topic: String, olderThanMillis: Long): Long = {
    val part = all.where($"topic" === topic).cache()
    try {
      val before = part.count()
      val kept = part.where($"timestamp" >= timestampMillis(olderThanMillis))
      val keptCount = kept.count()
      val staging = path.stripSuffix("/") + s"/.staging_${topic.replaceAll("[^A-Za-z0-9._-]", "_")}"
      // Rewrite via staging dir: parquet can't overwrite a path it is reading.
      // `topic` is a partition column — drop it from the data files so the
      // re-read doesn't see it twice (dir + file).
      kept.drop("topic").write.mode(SaveMode.Overwrite).parquet(staging)
      val topicDir = new Path(path, s"topic=$topic")
      fs.delete(topicDir, true)
      if (keptCount > 0) {
        fs.mkdirs(topicDir)
        val stagingPath = new Path(staging)
        fs.listStatus(stagingPath).foreach { st =>
          if (st.getPath.getName.startsWith("part-"))
            fs.rename(st.getPath, new Path(topicDir, st.getPath.getName))
        }
      }
      fs.delete(new Path(staging), true)
      before - keptCount
    } finally part.unpersist()
  }

  private def timestampMillis(ms: Long) =
    (lit(ms) / 1000.0).cast("timestamp")
}

object EventLog {
  def apply(spark: SparkSession, path: String): EventLog = new EventLog(spark, path)
}
