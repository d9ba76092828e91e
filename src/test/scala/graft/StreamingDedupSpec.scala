package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.EventRow
import graft.sources.EventLog
import graft.streaming.StreamingDedup

/** Streaming dedup laws: same-batch and cross-micro-batch duplicates
  * collapse (id and content keys), non-duplicates survive. Multi-batch
  * behavior is forced with maxFilesPerTrigger=1 so state must carry
  * across micro-batches within one AvailableNow run.
  */
class StreamingDedupSpec extends SparkSpec {

  private val T0 = 1700000000000L

  private def row(id: String, ms: Long, payload: String = "{}") =
    EventRow(id, "m", "dd", new Timestamp(ms), "1.0", payload, Map.empty)

  private def drain(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("withinWatermark: duplicate ids collapse across micro-batches, distinct ids survive") {
    val logDir = tmpDir("sdedup")
    val log = new EventLog(spark, logDir)
    log.appendRows(Seq(row("e1", T0), row("e2", T0 + 1000)))
    log.appendRows(Seq(row("e1", T0), row("e3", T0 + 2000)))        // e1 redelivered, later file
    log.appendRows(Seq(row("e2", T0 + 1000), row("e2", T0 + 1000))) // same-batch + cross-batch dup

    val stream = spark.readStream.schema(graft.model.Event.schema)
      .option("maxFilesPerTrigger", 1).parquet(logDir)
      .where(col("topic") === "dd")
    drain(StreamingDedup.withinWatermark(stream, "timestamp", "10 minutes", Seq("id"))
      .select("id"), "dedup_ids")

    val out = spark.sql("SELECT id FROM dedup_ids ORDER BY id").collect().map(_.getString(0))
    assert(out.toSeq == Seq("e1", "e2", "e3"))
  }

  test("byContent: same body under fresh event ids collapses; different body survives") {
    val logDir = tmpDir("sdedup-content")
    val log = new EventLog(spark, logDir)
    log.appendRows(Seq(
      row("a1", T0, """{"text":"same doc"}"""),
      row("a2", T0 + 500, """{"text":"same doc"}"""), // new id, same content
      row("a3", T0 + 900, """{"text":"other doc"}""")))

    val stream = spark.readStream.schema(graft.model.Event.schema).parquet(logDir)
    drain(StreamingDedup.byContent(stream, "timestamp", "10 minutes", "payload")
      .select("id", "payload"), "dedup_content")

    val out = spark.sql("SELECT payload FROM dedup_content ORDER BY payload").collect()
    assert(out.length == 2) // one survivor per distinct body
    // the dedup key column does not leak into the output
    assert(!spark.table("dedup_content").columns.contains("__content_key"))
  }

  test("exact: ever-seen semantics for a bounded key domain") {
    val logDir = tmpDir("sdedup-exact")
    val log = new EventLog(spark, logDir)
    log.appendRows(Seq(row("k1", T0), row("k2", T0 + 1000)))
    log.appendRows(Seq(row("k1", T0 + 500000))) // same key, much later event time

    val stream = spark.readStream.schema(graft.model.Event.schema)
      .option("maxFilesPerTrigger", 1).parquet(logDir)
    drain(StreamingDedup.exact(stream, Seq("id")).select("id"), "dedup_exact")

    val out = spark.sql("SELECT id FROM dedup_exact ORDER BY id").collect().map(_.getString(0))
    assert(out.toSeq == Seq("k1", "k2")) // late k1 still a duplicate: state never evicts
  }
}
