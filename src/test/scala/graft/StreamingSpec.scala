package graft

import java.sql.Timestamp
import scala.collection.mutable

import graft.broker.SubscriptionOptions
import graft.dlq.InMemoryDeadLetterQueue
import graft.model.EventRow
import graft.sources.EventLog
import graft.streaming.StreamingSubscription

/** Structured-Streaming delivery semantics (SURVEY.md §2.9 T1-T10). */
class StreamingSpec extends SparkSpec {

  private def row(id: String, tpe: String, topic: String, ms: Long) =
    EventRow(id, tpe, topic, new Timestamp(ms), "1.0", s"""{"id":"$id"}""", Map.empty)

  test("stream delivers persisted events in order; filter pushed to source (T1/T6)") {
    val logDir = tmpDir("slog")
    val log = new EventLog(spark, logDir)
    log.appendRows(Seq(
      row("e1", "click", "web", 1000),
      row("e2", "view", "web", 2000),
      row("e3", "click", "web", 3000)))
    val seen = mutable.Buffer.empty[String]
    val sub = new StreamingSubscription(spark, logDir, tmpDir("ckpt"),
      e => seen += e.id, new InMemoryDeadLetterQueue,
      topicName = Some("web"),
      options = SubscriptionOptions(eventTypes = Seq("click")))
    sub.runAvailable()
    assert(seen.toSeq == Seq("e1", "e3"))
  }

  test("checkpoint resumes where delivery stopped — pause is lossless (T10 upgrade)") {
    val logDir = tmpDir("slog")
    val ckpt = tmpDir("ckpt")
    val log = new EventLog(spark, logDir)
    log.appendRows(Seq(row("e1", "a", "t", 1000)))
    val seen = mutable.Buffer.empty[String]
    val sub = new StreamingSubscription(spark, logDir, ckpt,
      e => seen += e.id, new InMemoryDeadLetterQueue, topicName = Some("t"))
    sub.runAvailable()
    assert(seen.toSeq == Seq("e1"))
    // "paused" (stopped) — events published meanwhile are NOT lost
    log.appendRows(Seq(row("e2", "a", "t", 2000), row("e3", "a", "t", 3000)))
    sub.runAvailable()
    assert(seen.toSeq == Seq("e1", "e2", "e3")) // gap replayed from checkpoint
  }

  test("failing handler retries then dead-letters; delivery continues (T3/T4)") {
    val logDir = tmpDir("slog")
    val log = new EventLog(spark, logDir)
    log.appendRows(Seq(
      row("e1", "a", "t", 1000),
      row("poison", "a", "t", 2000),
      row("e3", "a", "t", 3000)))
    val dlq = new InMemoryDeadLetterQueue
    val seen = mutable.Buffer.empty[String]
    var poisonAttempts = 0
    val sub = new StreamingSubscription(spark, logDir, tmpDir("ckpt"),
      e => {
        if (e.id == "poison") { poisonAttempts += 1; throw new RuntimeException("bad event") }
        seen += e.id
      },
      dlq, topicName = Some("t"),
      options = SubscriptionOptions(name = Some("stream-sub"), maxRetries = 2))
    sub.runAvailable()
    assert(seen.toSeq == Seq("e1", "e3")) // poison didn't stop the stream
    assert(poisonAttempts == 2) // maxRetries total attempts (subscription.ts:91-98)
    val entries = dlq.getEvents()
    assert(entries.size == 1)
    assert(entries.head.event.id == "poison")
    assert(entries.head.error == "bad event")
    assert(entries.head.subscription == "stream-sub")
  }
}
