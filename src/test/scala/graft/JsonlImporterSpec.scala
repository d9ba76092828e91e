package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._

import graft.dlq.ParquetDeadLetterQueue
import graft.sources.JsonlImporter

/** Schema-validated JSONL ingest: one permissive parse splits valid rows
  * from corrupt lines, and corruption is ROUTED to the DLQ — never dropped,
  * never fatal (the reference's dead-letter law, src/deadletter.ts:39-72,
  * applied at the ingest edge).
  */
class JsonlImporterSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("n_chars", LongType)))

  private def writeFixture(): String = {
    val base = tmpDir("jsonl")
    Files.writeString(Paths.get(base, "part-0.jsonl"),
      Seq(
        """{"doc_id":1,"lang":"en","n_chars":100}""",
        """{"doc_id":2,"lang":"de","n_chars":200,"extra":"pruned not fatal"}""",
        """{"doc_id":3,"lang":"en","n_chars":300""", // truncated object
        """not json at all""",
        """{"doc_id":"NaN-ish","lang":"fr","n_chars":50}""", // type mismatch
        """{"doc_id":6,"lang":"fr","n_chars":600}"""
      ).mkString("\n"))
    base
  }

  test("one parse splits valid rows from corrupt lines; extra fields prune") {
    val imp = JsonlImporter.read(spark, writeFixture(), schema)
    try {
      val valid = imp.valid.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
      assert(valid.toSeq == Seq((1L, "en", 100L), (2L, "de", 200L), (6L, "fr", 600L)))
      assert(imp.valid.columns.toSeq == Seq("doc_id", "lang", "n_chars"))
      val corrupt = imp.corrupt.collect().map(_.getString(0)).sorted
      assert(corrupt.length == 3)
      // the raw text survives verbatim on the corrupt side
      assert(corrupt.contains("not json at all"))
      assert(corrupt.exists(_.contains("\"n_chars\":300")))  // truncated object
      assert(corrupt.exists(_.contains("NaN-ish")))          // schema-type mismatch
    } finally imp.release()
  }

  test("quarantine routes corrupt lines to the DLQ verbatim, with deterministic ids") {
    val src = writeFixture()
    val dlq = new ParquetDeadLetterQueue(spark, tmpDir("jsonldlq") + "/q")
    val imp = JsonlImporter.read(spark, src, schema)
    try {
      assert(JsonlImporter.quarantine(imp, dlq, "crawl-42") == 3)
    } finally imp.release()

    val entries = dlq.getEvents(Some("crawl-42"), Some("jsonl.corrupt"), None)
    assert(entries.length == 3)
    // payload is the raw line as a JSON string — byte-exact after unquote
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val lines = entries.map(e => mapper.readValue(e.event.payload, classOf[String]))
    assert(lines.contains("not json at all"))
    assert(lines.forall(_.nonEmpty))
    assert(entries.forall(_.attempts == 1))
    assert(entries.forall(_.subscription == "crawl-42"))

    // deterministic content-derived ids: a re-run of the same file yields the
    // SAME ids, so replay dedupe is a distinct-on-id away
    val imp2 = JsonlImporter.read(spark, src, schema)
    val dlq2 = new ParquetDeadLetterQueue(spark, tmpDir("jsonldlq2") + "/q")
    try JsonlImporter.quarantine(imp2, dlq2, "crawl-42") finally imp2.release()
    assert(dlq2.getEvents(None, None, None).map(_.event.id).toSet ==
      entries.map(_.event.id).toSet)

    // repair-and-replay: fix the quarantined line, re-parse it, retire the entry
    val bad = entries.find(e =>
      mapper.readValue(e.event.payload, classOf[String]).contains("NaN-ish")).get
    var repairedDocId = -1L
    val ok = dlq.retryEvent(bad.event.id, { (ev, _) =>
      val line = mapper.readValue(ev.payload, classOf[String])
      val fixed = line.replace("\"NaN-ish\"", "5")
      val node = mapper.readTree(fixed)
      repairedDocId = node.get("doc_id").asLong()
      true
    })
    assert(ok && repairedDocId == 5L)
    assert(dlq.getEvents(None, None, None).length == 2)
  }
}
