package graft

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import graft.dlq.JdbcDeadLetterQueue
import graft.model.EventRow
import graft.sources.{EventLog, JdbcEventStore, ScanOptions}

/** JDBC store parity (reference: src/persistence.ts:240-433,
  * src/deadletter.ts:240-519) against embedded Derby — the database engine
  * in Spark's own jar set. Each test gets an isolated in-memory database.
  */
class JdbcStoreSpec extends SparkSpec {

  private val dbId = new AtomicInteger(0)
  private def freshUrl(): String =
    s"jdbc:derby:memory:graft${dbId.incrementAndGet()};create=true"

  private def ev(id: String, topic: String, tsMs: Long, tpe: String = "test-event") =
    EventRow(id, tpe, topic, new Timestamp(tsMs), "1.0",
      s"""{"n":${tsMs}}""", Map("source" -> "spec"))

  test("saveEvent + getEvents: topic/ts-range/type filters, asc order, limit (persistence.ts:325-404)") {
    val store = new JdbcEventStore(spark, freshUrl()).initialize()
    store.saveEvent(ev("a1", "t1", 1000))
    store.saveEvent(ev("a2", "t1", 3000, tpe = "other"))
    store.saveEvent(ev("a3", "t1", 2000))
    store.saveEvent(ev("b1", "t2", 1500))

    assert(store.getEvents("t1").map(_.id) == Seq("a1", "a3", "a2")) // ts asc
    assert(store.getEvents("t1", ScanOptions(fromTimestamp = Some(2000)))
      .map(_.id) == Seq("a3", "a2")) // inclusive from
    assert(store.getEvents("t1", ScanOptions(toTimestamp = Some(2000)))
      .map(_.id) == Seq("a1", "a3")) // inclusive to
    assert(store.getEvents("t1", ScanOptions(eventTypes = Seq("other")))
      .map(_.id) == Seq("a2"))
    assert(store.getEvents("t1", ScanOptions(limit = Some(2))).map(_.id) == Seq("a1", "a3"))

    // envelope round-trips exactly (payload text, metadata map)
    val back = store.getEvents("t1").head
    assert(back == ev("a1", "t1", 1000))
  }

  test("connection pooling: the publish hot path reuses one connection (persistence.ts:253)") {
    val store = new JdbcEventStore(spark, freshUrl()).initialize()
    val afterInit = store.connectionsOpened
    (1 to 50).foreach(i => store.saveEvent(ev(s"p$i", "pool-topic", 1000L + i)))
    // 50 INSERTs must NOT open 50 connections: initialize's connection is
    // returned to the pool and every save borrows it back.
    assert(store.connectionsOpened == afterInit,
      s"expected 0 new connections for 50 saves, got ${store.connectionsOpened - afterInit}")
    assert(store.getEvents("pool-topic").size == 50)
    store.close()

    // the DLQ shares the same pool discipline on its failure hot path
    val q = new JdbcDeadLetterQueue(spark, freshUrl()).initialize()
    val qAfterInit = q.connectionsOpened
    (1 to 20).foreach(i => q.addEvent(ev(s"d$i", "t", 1000L + i), "boom", "sub-1"))
    assert(q.connectionsOpened == qAfterInit)
    assert(q.getEvents(None, None, None).size == 20)
    q.close()
  }

  test("predicate pushdown: topic/timestamp/type filters reach the JDBC scan") {
    val store = new JdbcEventStore(spark, freshUrl()).initialize()
    store.saveEvent(ev("a1", "t1", 1000))
    val plan = store.getEventsDF("t1", ScanOptions(
        fromTimestamp = Some(500), toTimestamp = Some(2000),
        eventTypes = Seq("test-event")))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("EqualTo(topic,t1)"), plan)
    // the ms bounds push as plain BIGINT comparisons (they hit the DB's
    // timestamp index; a filter above the timestamp_millis conversion
    // would not be translatable and would fetch the whole topic)
    assert(plan.contains("GreaterThanOrEqual(timestamp,500)"), plan)
    assert(plan.contains("LessThanOrEqual(timestamp,2000)"), plan)
    assert(plan.contains("EqualTo(type,test-event)"), plan)
  }

  test("distributed saveEvents + partitioned parallel scan round-trip") {
    val url = freshUrl()
    val store = new JdbcEventStore(spark, url).initialize()
    import spark.implicits._
    val events = (1 to 200).map(i => ev(f"e$i%03d", s"t${i % 4}", 1000L + i))
    store.saveEvents(spark.createDataset(events))

    // unpartitioned and range-partitioned reads see the same rows
    val seen = store.allDF.as[EventRow].collect().toSet
    assert(seen == events.toSet)
    val par = new JdbcEventStore(spark, url, scanPartitions = Some(4))
    assert(par.allDF.rdd.getNumPartitions == 4)
    assert(par.allDF.as[EventRow].collect().toSet == events.toSet)
  }

  test("deleteEvents: strictly-before cutoff, per topic, returns count (persistence.ts:407-425)") {
    val store = new JdbcEventStore(spark, freshUrl()).initialize()
    store.saveEvent(ev("a1", "t1", 1000))
    store.saveEvent(ev("a2", "t1", 2000))
    store.saveEvent(ev("b1", "t2", 1000))
    assert(store.deleteEvents("t1", 2000) == 1) // strictly before; t2 untouched
    assert(store.getEvents("t1").map(_.id) == Seq("a2"))
    assert(store.getEvents("t2").map(_.id) == Seq("b1"))
  }

  test("importInto parquet log / exportFrom log — both migration directions") {
    val store = new JdbcEventStore(spark, freshUrl()).initialize()
    import spark.implicits._
    val events = (1 to 20).map(i => ev(f"e$i%02d", s"t${i % 2}", 1000L + i))
    store.saveEvents(spark.createDataset(events))

    val log = new EventLog(spark, tmpDir("jdbc-import") + "/log")
    assert(store.importInto(log) == 20)
    assert(log.getEventsTyped("t1").collect().toSet == events.filter(_.topic == "t1").toSet)

    // inverse: parquet log → fresh relational store
    val store2 = new JdbcEventStore(spark, freshUrl()).initialize()
    store2.exportFrom(log.getEventsTyped("t0"))
    assert(store2.getEvents("t0").toSet == events.filter(_.topic == "t0").toSet)
  }

  test("initialize is idempotent (CREATE IF NOT EXISTS parity)") {
    val url = freshUrl()
    val s1 = new JdbcEventStore(spark, url).initialize()
    s1.saveEvent(ev("a1", "t1", 1000))
    new JdbcEventStore(spark, url).initialize() // second init must not clobber
    assert(s1.getEvents("t1").size == 1)
  }

  test("JDBC DLQ: upsert bumps attempts + refreshes error (deadletter.ts:315-340)") {
    val q = new JdbcDeadLetterQueue(spark, freshUrl()).initialize()
    val e = ev("e1", "t1", 1000)
    q.addEvent(e, "first failure", "sub1")
    assert(q.getEvents().head.attempts == 1)
    q.addEvent(e, "second failure", "sub1") // same event id → ON CONFLICT path
    val row = q.getEvents().head
    assert(row.attempts == 2)
    assert(row.error == "second failure")
    assert(q.getEvents().size == 1) // no duplicate row
    assert(row.event == e) // event_data JSON round-trips the envelope
  }

  test("JDBC DLQ: filtered get newest-first, retry semantics, remove (deadletter.ts:344-519)") {
    val q = new JdbcDeadLetterQueue(spark, freshUrl()).initialize()
    q.addEvent(ev("e1", "t1", 1000), "err1", "sub1")
    Thread.sleep(5)
    q.addEvent(ev("e2", "t2", 1000, tpe = "other"), "err2", "sub2")
    Thread.sleep(5)
    q.addEvent(ev("e3", "t1", 1000), "err3", "sub1")

    assert(q.getEvents().map(_.event.id) == Seq("e3", "e2", "e1"))
    assert(q.getEvents(topic = Some("t1")).map(_.event.id) == Seq("e3", "e1"))
    assert(q.getEvents(eventType = Some("other")).map(_.event.id) == Seq("e2"))
    assert(q.getEvents(limit = Some(1)).map(_.event.id) == Seq("e3"))

    assert(!q.retryEvent("e1", (_, _) => false))
    assert(q.getEvents(topic = Some("t1")).find(_.event.id == "e1").get.attempts == 2)
    assert(!q.retryEvent("e1", (_, _) => throw new RuntimeException("boom")))
    assert(q.getEvents(topic = Some("t1")).find(_.event.id == "e1").get.error == "boom")
    assert(q.retryEvent("e1", (ev, sub) => { assert(sub == "sub1" && ev.id == "e1"); true }))
    assert(q.getEvents().map(_.event.id) == Seq("e3", "e2"))
    assert(!q.retryEvent("missing", (_, _) => true))
    assert(q.removeEvent("e2") && !q.removeEvent("e2"))
  }

  test("full migration walkthrough: reference file store → parquet log → JDBC store, byte-exact") {
    import java.nio.file.{Files, Paths}
    import graft.sources.FileStoreImporter
    // a reference deployment's on-disk file store...
    val base = tmpDir("refstore")
    Files.createDirectories(Paths.get(base, "orders"))
    Files.writeString(Paths.get(base, "orders", "1000_m1.json"),
      """{"id":"m1","type":"order.created","topic":"orders","timestamp":1000,"schemaVersion":"1.0","payload":{"orderId":"o1","n":2},"metadata":{"source":"migration"}}""")
    Files.writeString(Paths.get(base, "orders", "2000_m2.json"),
      """{"id":"m2","type":"order.note","topic":"orders","timestamp":2000,"schemaVersion":"1.0","payload":"note text"}""")
    // ...lands in the parquet log...
    val log = new EventLog(spark, tmpDir("miglog") + "/log")
    assert(FileStoreImporter.importInto(spark, base, log) == 2)
    // ...and on into the relational store, payloads verbatim at each hop
    val store = new JdbcEventStore(spark, freshUrl()).initialize()
    store.exportFrom(log.getEventsTyped("orders"))
    val back = store.getEvents("orders")
    assert(back.map(_.id) == Seq("m1", "m2"))
    assert(back.head.payload == """{"orderId":"o1","n":2}""")
    assert(back(1).payload == "\"note text\"") // string payload stays JSON text
    assert(back.head.metadata == Map("source" -> "migration"))
    // and the inverse direction restores the log shape
    val log2 = new EventLog(spark, tmpDir("miglog2") + "/log")
    assert(store.importInto(log2) == 2)
    assert(log2.getEventsTyped("orders").collect().toSeq
      == log.getEventsTyped("orders").collect().toSeq)
  }

  test("broker wired to the JDBC DLQ end-to-end: exhausted retries land, redispatch drains") {
    import graft.broker.{EventBroker, SubscriptionOptions}
    val dlq = new JdbcDeadLetterQueue(spark, freshUrl()).initialize()
    val b = new EventBroker(spark, tmpDir("jdbc-e2e") + "/log", dlq)
    var healthy = false
    b.subscribe("ord", e =>
      if (!healthy) throw new RuntimeException(s"down for ${e.id}"),
      SubscriptionOptions(name = Some("ord-sub"), maxRetries = 2, retryDelayMillis = 0))
    val r = b.publish("ord", "order.created", """{"n":1}""")
    assert(r.success)

    val entries = dlq.getEvents(topic = Some("ord"))
    assert(entries.size == 1)
    assert(entries.head.subscription == "ord-sub")
    assert(entries.head.error.startsWith("down for"))
    // handler recovers → broker-level redispatch removes the entry
    healthy = true
    assert(b.retryDeadLetterEvent(entries.head.event.id))
    assert(dlq.getEvents().isEmpty)
  }
}
