package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.EventRow
import graft.sources.EventLog

/** Streaming-native event-time windows over the log (SURVEY.md §2.9
  * T11/T12): tumbling aggregation with a watermark (late-data eviction law)
  * and session windows with a gap — the Structured Streaming counterparts
  * of the relational q21/q22 spellings.
  */
class StreamingWindowSpec extends SparkSpec {

  private def row(id: String, tpe: String, topic: String, ms: Long, value: Double) =
    EventRow(id, tpe, topic, new Timestamp(ms), "1.0", s"""{"v":$value}""", Map.empty)

  private val T0 = 1700000000000L // fixed epoch base for deterministic windows

  test("tumbling 10s event-time window with watermark over the streamed log") {
    val logDir = tmpDir("wlog")
    val log = new EventLog(spark, logDir)
    log.appendRows(Seq(
      row("e1", "m", "w", T0 + 1000, 1),
      row("e2", "m", "w", T0 + 4000, 1),
      row("e3", "m", "w", T0 + 11000, 1), // second window
      row("e4", "m", "w", T0 + 19000, 1)))
    val stream = spark.readStream.schema(graft.model.Event.schema).parquet(logDir)
      .where(col("topic") === "w")
      .withWatermark("timestamp", "30 seconds")
      .groupBy(window(col("timestamp"), "10 seconds"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream
      .format("memory").queryName("tumbling").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.sql("SELECT window.start, n FROM tumbling ORDER BY 1").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 2L))
    assert(out.head.getTimestamp(0).getTime == T0 - (T0 % 10000)) // aligned bucket
  }

  test("session window (5s gap) groups bursts per user-topic") {
    val logDir = tmpDir("wlog")
    val log = new EventLog(spark, logDir)
    log.appendRows(Seq(
      row("e1", "m", "s", T0, 1),
      row("e2", "m", "s", T0 + 2000, 1), // same session (gap 2s < 5s)
      row("e3", "m", "s", T0 + 20000, 1), // new session
      row("e4", "m", "s", T0 + 21000, 1)))
    val stream = spark.readStream.schema(graft.model.Event.schema).parquet(logDir)
      .where(col("topic") === "s")
      .withWatermark("timestamp", "1 minute")
      .groupBy(session_window(col("timestamp"), "5 seconds"), col("topic"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream
      .format("memory").queryName("sessions").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.sql("SELECT n FROM sessions ORDER BY session_window.start").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 2L))
  }

  test("watermark evicts state: late event beyond the watermark is dropped in append mode") {
    val logDir = tmpDir("wlog")
    val ckpt = tmpDir("wckpt")
    val log = new EventLog(spark, logDir)
    // Batch 1: events up to T0+100s — watermark advances to T0+90s
    log.appendRows(Seq(
      row("e1", "m", "l", T0 + 5000, 1),
      row("e2", "m", "l", T0 + 100000, 1)))
    val emitted = scala.collection.mutable.Buffer.empty[(Long, Long)]
    def run(): Unit = {
      val stream = spark.readStream.schema(graft.model.Event.schema).parquet(logDir)
        .where(col("topic") === "l")
        .withWatermark("timestamp", "10 seconds")
        .groupBy(window(col("timestamp"), "10 seconds"))
        .agg(count(lit(1)).as("n"))
      val q = stream.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.select(col("window.start"), col("n")).collect()
            .foreach(r => emitted += ((r.getTimestamp(0).getTime, r.getLong(1))))
          ()
        }
        .start()
      q.awaitTermination()
    }
    run()
    // Batch 2: a straggler far behind the advanced watermark → dropped
    log.appendRows(Seq(row("late1", "m", "l", T0 + 6000, 1)))
    run()
    // e1's window was finalized with n=1; the late straggler never re-emits it
    val w0start = T0 - (T0 % 10000)
    val w0 = emitted.filter(_._1 == w0start)
    assert(w0.nonEmpty && w0.forall(_._2 == 1L))
  }
}
