package graft

import java.nio.file.{Files, Paths}

import graft.sources.{EventLog, FileStoreImporter}

/** Importing the reference's on-disk file store
  * (`baseDir/<topic>/<ts>_<id>.json`, reference: src/persistence.ts:141-145)
  * into the parquet log, byte-exact payloads included.
  */
class FileStoreImporterSpec extends SparkSpec {

  test("reads the reference layout; payload text survives verbatim; appends to the log") {
    val base = tmpDir("refstore")
    Files.createDirectories(Paths.get(base, "orders"))
    Files.createDirectories(Paths.get(base, "users"))
    // object payload, string payload (must stay quoted), number payload
    Files.writeString(Paths.get(base, "orders", "1000_a1.json"),
      """{"id":"a1","type":"order.created","topic":"orders","timestamp":1000,"schemaVersion":"1.0","payload":{"orderId":"o1","n":2},"metadata":{"source":"import","retries":3}}""")
    Files.writeString(Paths.get(base, "orders", "2000_a2.json"),
      """{"id":"a2","type":"order.note","topic":"orders","timestamp":2000,"schemaVersion":"1.0","payload":"plain text note"}""")
    Files.writeString(Paths.get(base, "users", "1500_b1.json"),
      """{"id":"b1","type":"user.created","topic":"users","timestamp":1500,"payload":42}""")

    val events = FileStoreImporter.read(spark, base).collect().sortBy(_.id)
    assert(events.map(_.id).toSeq == Seq("a1", "a2", "b1"))
    assert(events(0).payload == """{"orderId":"o1","n":2}""")
    assert(events(1).payload == "\"plain text note\"") // quoted — still JSON text
    assert(events(2).payload == "42")
    assert(events(2).schemaVersion == "1.0") // defaulted (broker.ts:105)
    assert(events(0).metadata == Map("source" -> "import", "retries" -> "3"))

    val log = new EventLog(spark, tmpDir("implog"))
    val n = FileStoreImporter.importInto(spark, base, log)
    assert(n == 3)
    assert(log.getEventsTyped("orders").collect().map(_.id).toSeq == Seq("a1", "a2"))
    assert(log.getEventsTyped("users").collect().map(_.id).toSeq == Seq("b1"))
  }

  test("export → import round-trips the log exactly (rollback path)") {
    val log = new EventLog(spark, tmpDir("rtlog"))
    log.appendRows(Seq(
      graft.model.EventRow("r1", "t1", "top1", new java.sql.Timestamp(1111), "1.0",
        """{"k":[1,2,{"x":"y"}]}""", Map("m" -> "v")),
      graft.model.EventRow("r2", "t2", "top2", new java.sql.Timestamp(2222), "2.0",
        "\"a string payload\"", Map.empty)))
    val out = tmpDir("refout")
    assert(FileStoreImporter.exportFrom(log.all.as[graft.model.EventRow](
      org.apache.spark.sql.Encoders.product[graft.model.EventRow]), out) == 2)
    val back = FileStoreImporter.read(spark, out).collect().sortBy(_.id)
    val orig = log.getEventsTyped("top1").collect() ++ log.getEventsTyped("top2").collect()
    assert(back.map(e => (e.id, e.`type`, e.topic, e.timestamp, e.schemaVersion, e.payload, e.metadata)).toSeq ==
      orig.sortBy(_.id).map(e => (e.id, e.`type`, e.topic, e.timestamp, e.schemaVersion, e.payload, e.metadata)).toSeq)
  }
}
