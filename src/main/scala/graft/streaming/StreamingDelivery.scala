package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.broker.SubscriptionOptions
import graft.dlq.DeadLetterQueue
import graft.model.{Event, EventRow}

/** Structured-Streaming delivery: each subscription is a StreamingQuery
  * tailing the event log (SURVEY.md §2.9 T1/T6/T10) — the scale path the
  * reference's in-process fan-out maps onto:
  *
  *   - store-then-forward is STRUCTURAL: the log is the only source, so a
  *     subscriber can only see persisted events (reference guarantees this
  *     by ordering two awaits, src/topic.ts:112-115)
  *   - historical replay = start from the log's beginning — history and
  *     live unify in one ordered source, strictly better than the
  *     reference's racy async replay (src/topic.ts:70-86)
  *   - pause/resume = stop + restart from the checkpoint: the gap replays,
  *     upgrading the reference's lossy pause (src/subscription.ts:62-73)
  *   - bounded immediate retry inside foreachBatch, then DLQ, mirroring
  *     src/subscription.ts:91-105; the wall-clock `retryDelay` between
  *     attempts is honored in the DLQ re-dispatch path instead of blocking
  *     the micro-batch (SURVEY.md §7.2)
  *
  * Delivery is at-least-once across restarts (checkpointed foreachBatch) —
  * handlers must be idempotent on `event.id`, which the envelope provides.
  */
final class StreamingSubscription(
    spark: SparkSession,
    logPath: String,
    checkpointDir: String,
    handler: EventRow => Unit,
    dlq: DeadLetterQueue,
    topicName: Option[String] = None,
    options: SubscriptionOptions = SubscriptionOptions()) {

  private val subscriptionId = options.name.getOrElse(Event.generateId())
  def id: String = subscriptionId
  @volatile private var query: Option[StreamingQuery] = None

  /** The filtered source stream: type/topic predicates are pushed into the
    * parquet file-stream scan by Catalyst, so a subscription reading one
    * topic never deserializes the rest of the log.
    */
  private def source: DataFrame = {
    var df = spark.readStream.schema(Event.schema).parquet(logPath)
    topicName.foreach(t => df = df.where(col("topic") === t))
    if (options.eventTypes.nonEmpty)
      df = df.where(col("type").isin(options.eventTypes: _*))
    df
  }

  /** Start (or restart — the checkpoint resumes where delivery stopped).
    * `availableNow` processes the backlog then stops, which is both the
    * test mode and the scheduled-drain deployment mode.
    */
  def start(availableNow: Boolean = false): StreamingQuery = {
    val h = handler
    val d = dlq
    val maxRetries = options.maxRetries
    val subId = subscriptionId
    val writer = source.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime(0))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        // Per-batch ordered delivery on the driver mirrors the reference's
        // sequential handler loop. A high-throughput subscriber would
        // `batch.foreachPartition` instead (unordered, distributed) — the
        // ordering law is the reference's, so ordered is the default.
        import batch.sparkSession.implicits._
        batch.as[EventRow].collect()
          .sortBy(e => (e.timestamp.getTime, e.id))
          .foreach { event =>
            var attempt = 1
            var done = false
            while (!done) {
              try { h(event); done = true }
              catch {
                case e: Exception =>
                  if (attempt < maxRetries) attempt += 1
                  else { d.addEvent(event, Option(e.getMessage).getOrElse(e.toString), subId); done = true }
              }
            }
          }
        ()
      }
    val q = writer.start()
    query = Some(q)
    q
  }

  /** Drain everything currently in the log and stop — deterministic for
    * tests and batch-drain deployments.
    */
  def runAvailable(): Unit = {
    val q = start(availableNow = true)
    q.awaitTermination()
  }

  /** Checkpointed pause: state survives, the gap is replayed on resume
    * (semantics upgrade over the reference's lossy pause, SURVEY.md T10).
    */
  def stop(): Unit = { query.foreach(_.stop()); query = None }

  def isActive: Boolean = query.exists(_.isActive)
}
