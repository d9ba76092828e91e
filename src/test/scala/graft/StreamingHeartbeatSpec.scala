package graft

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingHeartbeat

/** Heartbeat laws: a key that goes silent past the threshold fires exactly
  * one alert when the WATERMARK (not wall clock) passes its deadline; keys
  * that keep publishing never fire; a returning key re-arms and can fire
  * again for a second gap.
  */
class StreamingHeartbeatSpec extends SparkSpec {

  private def writeBatch(dir: String, rows: Seq[(String, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("key", "ms")
      .selectExpr("key", "timestamp_millis(ms) AS ts")
      .repartition(1)
      .write.mode("append").parquet(dir)
  }

  private def drain(dir: String, ckpt: String): Seq[StreamingHeartbeat.Silence] = {
    val out = scala.collection.mutable.Buffer.empty[StreamingHeartbeat.Silence]
    val stream = spark.readStream
      .schema("key STRING, ts TIMESTAMP")
      .parquet(dir)
      .withWatermark("ts", "1 second")
    val q = StreamingHeartbeat.detect(stream, "key", "ts", silenceMs = 10000L)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingHeartbeat.Silence], _: Long) =>
        out.synchronized { out ++= b.collect() }; ()
      }
      .start()
    q.awaitTermination()
    out.toSeq
  }

  test("a silent key fires once when the watermark passes its deadline; live keys don't") {
    val dir = tmpDir("hb")
    val ckpt = tmpDir("hb-ck")
    // batch 1: both keys publish at t=1s; watermark after batch ≈ 1s - 1s
    writeBatch(dir, Seq(("quiet", 1000L), ("chatty", 1000L)))
    assert(drain(dir, ckpt).isEmpty, "no deadline can have passed yet")
    // batch 2: only chatty publishes, far past quiet's 10s deadline —
    // the watermark (30s - 1s) crosses quiet's 11s deadline
    writeBatch(dir, Seq(("chatty", 30000L)))
    val got = drain(dir, ckpt)
    assert(got.map(_.key) == Seq("quiet"), s"expected exactly quiet's alert, got $got")
    assert(got.head.lastSeen.getTime == 1000L && got.head.deadline.getTime == 11000L)
    // batch 3: nothing new — no duplicate alert (state was cleared)
    writeBatch(dir, Seq(("chatty", 31000L)))
    assert(drain(dir, ckpt).isEmpty)
  }

  test("a very late event behind the watermark never crashes the query") {
    val dir = tmpDir("hb3")
    val ckpt = tmpDir("hb3-ck")
    // batch 1 advances the watermark to ~59s
    writeBatch(dir, Seq(("chatty", 60000L)))
    assert(drain(dir, ckpt).isEmpty)
    // batch 2 delivers a VERY late first event for "stale" at t=1s, whose
    // 11s deadline sits far behind the 59s watermark. Spark's stateful
    // late-row filtering drops it before the operator (observed: no
    // invocation), so no alert — and crucially no crash: if a Spark
    // version ever hands such a row through, the operator's past-deadline
    // branch alerts immediately instead of arming an in-the-past timeout
    // (setTimeoutTimestamp behind the watermark is a query-fatal throw).
    writeBatch(dir, Seq(("stale", 1000L)))
    val got = drain(dir, ckpt)
    assert(got.forall(_.key == "stale"), s"only stale may alert, got $got")
    // the query survived: a further live batch still processes normally
    writeBatch(dir, Seq(("chatty", 61000L)))
    assert(drain(dir, ckpt).forall(_.key == "stale"))
  }

  test("a returning key re-arms and fires again for a second gap") {
    val dir = tmpDir("hb2")
    val ckpt = tmpDir("hb2-ck")
    writeBatch(dir, Seq(("k", 1000L), ("other", 1000L)))
    writeBatch(dir, Seq(("other", 30000L)))          // gap 1: k silent
    val first = drain(dir, ckpt)
    assert(first.map(_.key) == Seq("k"))
    writeBatch(dir, Seq(("k", 40000L)))              // k returns → re-arms
    writeBatch(dir, Seq(("other", 80000L)))          // gap 2: k silent again
    val second = drain(dir, ckpt)
    assert(second.map(_.key) == Seq("k"), s"expected k's second alert, got $second")
    assert(second.head.lastSeen.getTime == 40000L)
  }
}
