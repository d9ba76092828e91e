package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.EventRow
import graft.sources.EventLog
import graft.streaming.StreamCorrelator

/** Stream-stream correlation laws (SURVEY.md §2.9 extension): the interval
  * join matches inside the window and only inside it; the left-outer
  * timeout path emits an unmatched request only after the watermark proves
  * no response can arrive; stream-static enrichment broadcasts the dim.
  */
class StreamCorrelatorSpec extends SparkSpec {

  private val T0 = 1700000000000L

  private def row(id: String, txn: String, topic: String, ms: Long) =
    EventRow(id, txn, topic, new Timestamp(ms), "1.0", "{}", Map.empty)

  /** The request stream shaped to distinct column names. */
  private def reqStream(dir: String): DataFrame =
    spark.readStream.schema(graft.model.Event.schema).parquet(dir)
      .select(col("type").as("txn"), col("timestamp").as("req_ts"),
        col("id").as("req_id"))

  private def respStream(dir: String): DataFrame =
    spark.readStream.schema(graft.model.Event.schema).parquet(dir)
      .select(col("type").as("rtxn"), col("timestamp").as("resp_ts"),
        col("id").as("resp_id"))

  private def drain(out: DataFrame, name: String): Unit = {
    val q = out.writeStream
      .format("memory").queryName(name).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("interval join matches responses inside the window, not outside") {
    val reqDir = tmpDir("req")
    val respDir = tmpDir("resp")
    new EventLog(spark, reqDir).appendRows(Seq(
      row("q1", "t1", "req", T0),
      row("q2", "t2", "req", T0 + 1000),
      row("q3", "t3", "req", T0 + 2000))) // never answered
    new EventLog(spark, respDir).appendRows(Seq(
      row("a1", "t1", "resp", T0 + 3000), // inside [T0, T0+10s]
      row("a2", "t2", "resp", T0 + 20000), // OUTSIDE the 10s interval
      row("a4", "t9", "resp", T0 + 1000))) // no such request
    drain(
      StreamCorrelator.correlate(
        reqStream(reqDir), "req_ts", "txn",
        respStream(respDir), "resp_ts", "rtxn",
        within = "10 seconds", delay = "30 seconds"),
      "corr")
    val got = spark.sql("SELECT req_id, resp_id FROM corr ORDER BY req_id")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("q1", "a1"))) // only the in-window pair
  }

  test("unanswered requests emit once the watermark passes the interval") {
    val reqDir = tmpDir("req")
    val respDir = tmpDir("resp")
    new EventLog(spark, reqDir).appendRows(Seq(
      row("q1", "t1", "req", T0),
      row("q2", "t2", "req", T0 + 1000), // q2 gets no response
      // heartbeats on BOTH streams: the global watermark is the MIN over
      // all watermarked inputs, so a stalled side pins eviction for both.
      // The request heartbeat's own interval end (T0+130s) stays beyond
      // the watermark (T0+90s), so it remains in state, not in output.
      row("qhb", "t8", "req", T0 + 120000)))
    val respLog = new EventLog(spark, respDir)
    respLog.appendRows(Seq(
      row("a1", "t1", "resp", T0 + 3000),
      // advances the watermark past q2's interval (max event time − delay),
      // proving q2 unanswerable
      row("hb", "t0", "resp", T0 + 120000)))
    drain(
      StreamCorrelator.unanswered(
        reqStream(reqDir), "req_ts", "txn",
        respStream(respDir), "resp_ts", "rtxn",
        within = "10 seconds", delay = "30 seconds"),
      "timeouts")
    val got = spark.sql("SELECT req_id FROM timeouts").collect().map(_.getString(0))
    assert(got.toSeq == Seq("q2"))
  }

  test("stream-static enrich broadcasts the dimension per micro-batch") {
    val reqDir = tmpDir("req")
    new EventLog(spark, reqDir).appendRows(Seq(
      row("q1", "t1", "req", T0),
      row("q2", "t2", "req", T0 + 1000)))
    import spark.implicits._
    val dim = Seq(("t1", "checkout"), ("t2", "search")).toDF("d_txn", "flow")
    drain(
      StreamCorrelator.enrich(reqStream(reqDir), dim, "txn", "d_txn"),
      "enriched")
    val got = spark.sql("SELECT req_id, flow FROM enriched ORDER BY req_id")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("q1", "checkout"), ("q2", "search")))
  }
}
