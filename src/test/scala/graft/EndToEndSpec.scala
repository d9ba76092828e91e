package graft

import scala.collection.mutable

import graft.broker.{EventBroker, SubscriptionOptions, TopicOptions}
import graft.dlq.InMemoryDeadLetterQueue
import graft.schema.SchemaRegistry

/** The whole engine story in one narrative: validated publish → log →
  * streaming delivery → poison event dead-letters → broker re-dispatch
  * heals it. Glues every runtime component the way a reference user
  * would actually run them.
  */
class EndToEndSpec extends SparkSpec {

  test("publish → stream → DLQ → retry, end to end") {
    val dlq = new InMemoryDeadLetterQueue
    val broker = new EventBroker(spark, tmpDir("e2e-log"), dlq)

    // schema-validated topic
    val reg = new SchemaRegistry
    reg.registerSchema("job.run",
      """{"type":"object","required":["jobId"],"properties":{"jobId":{"type":"string"}}}""",
      "1.0")
    broker.createTopic("jobs", TopicOptions(schemaRegistry = Some(reg)))

    // invalid publish: rejected, never persisted
    assert(!broker.publish("jobs", "job.run", """{"nope":1}""").success)

    // three valid publishes, one poison
    val ids = Seq("j1", "poison", "j3").map { j =>
      val r = broker.publish("jobs", "job.run", s"""{"jobId":"$j"}""")
      assert(r.success)
      r.eventId
    }

    // streaming delivery: fails on the poison payload → dead-letter
    val processed = mutable.Buffer.empty[String]
    var healed = false
    val sub = broker.subscribeStreaming("jobs", tmpDir("e2e-ckpt"),
      e => {
        if (e.payload.contains("poison") && !healed)
          throw new RuntimeException("downstream exploded")
        processed += e.id
      },
      SubscriptionOptions(name = Some("job-worker"), maxRetries = 2,
        receiveHistoricalEvents = true, retryDelayMillis = 0))
    sub.runAvailable()

    assert(processed.toSeq == Seq(ids(0), ids(2))) // poison skipped, stream alive
    val entries = dlq.getEvents(topic = Some("jobs"))
    assert(entries.map(_.event.id) == Seq(ids(1)))
    assert(entries.head.subscription == "job-worker")

    // failed re-dispatch: attempts climb, entry stays
    assert(!broker.retryDeadLetterEvent(ids(1)))
    assert(dlq.getEvents().head.attempts == 2)

    // downstream healed: re-dispatch succeeds through the SAME handler id
    healed = true
    assert(broker.retryDeadLetterEvent(ids(1)))
    assert(dlq.getEvents().isEmpty)
    assert(processed.toSeq == Seq(ids(0), ids(2), ids(1)))

    // the log remembers everything that was ever accepted
    assert(broker.log.getEventsTyped("jobs").collect().map(_.id).toSeq == ids)
  }
}
