package graft

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingSessionize

/** The streaming sessionization law: closed sessions emitted by the
  * native session_window aggregation equal the batch gaps-and-islands
  * law with q22's `> gap` boundary — Spark's `[ts, ts+gap]` session
  * ranges merge when they TOUCH (empirically: an exact-gap pair merges,
  * discovered by this spec's pinned case in r8), so a new session starts
  * only when the inter-event gap strictly exceeds the gap duration,
  * exactly the batch q22 spelling. If an engine upgrade ever flips the
  * boundary, this spec fails before the q204 oracle silently drifts.
  */
class StreamingSessionizeSpec extends SparkSpec {

  private val GapMs = 1800000L // 30 minutes

  private def writeBatch(dir: String, rows: Seq[(String, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("k", "ms")
      .selectExpr("k", "timestamp_millis(ms) AS ts")
      .repartition(1)
      .write.mode("append").parquet(dir)
  }

  private def drain(dir: String, ckpt: String): Seq[StreamingSessionize.Session] = {
    val out = scala.collection.mutable.Buffer.empty[StreamingSessionize.Session]
    val src = spark.readStream.schema("k STRING, ts TIMESTAMP").parquet(dir)
      .withWatermark("ts", "2 seconds")
    val q = StreamingSessionize.sessions(src, "k", "ts", "30 minutes")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingSessionize.Session], _: Long) =>
        out.synchronized { out ++= b.collect() }; ()
      }
      .start()
    q.awaitTermination()
    out.toSeq
  }

  /** The batch law with q22's > boundary: per key, sorted times split
    * into sessions wherever the gap from the previous event EXCEEDS
    * GapMs (an exact-gap pair stays together).
    */
  private def batchLaw(rows: Seq[(String, Long)]): Set[(String, Long, Long, Long)] =
    rows.groupBy(_._1).toSeq.flatMap { case (k, g) =>
      val ts = g.map(_._2).sorted
      val sessions = ts.foldLeft(Vector.empty[Vector[Long]]) { (acc, t) =>
        if (acc.nonEmpty && t - acc.last.last <= GapMs) acc.init :+ (acc.last :+ t)
        else acc :+ Vector(t)
      }
      sessions.map(s => (k, s.head, s.last, s.size.toLong))
    }.filterNot(_._1 == "zz").toSet

  private def got(rows: Seq[StreamingSessionize.Session]): Set[(String, Long, Long, Long)] =
    rows.map(s => (s.key, s.session_start.getTime, s.session_end.getTime, s.n_events))
      .filterNot(_._1 == "zz").toSet

  test("streaming closed sessions equal the batch > law, out-of-order included") {
    val dir = tmpDir("sess-src")
    val ckpt = tmpDir("sess-ck")
    // batch 1: watermark after the drain = 5000 - 2000 = 3000
    val b1 = Seq(("a", 1000L), ("a", 5000L), ("b", 2000L))
    writeBatch(dir, b1)
    drain(dir, ckpt)
    // batch 2: out-of-order vs b1's max but NOT below the watermark —
    // a@4000 and b@3500 merge into their open sessions (streaming aggs
    // DROP sub-watermark rows by contract; arrivals inside the delay are
    // the out-of-order case the operator owns). a's second session opens
    // past the gap.
    val b2 = Seq(("a", 4000L), ("b", 3500L), ("a", 5000L + GapMs + 1000L))
    writeBatch(dir, b2)
    val d2 = drain(dir, ckpt)
    writeBatch(dir, Seq(("zz", 5000L + 4L * GapMs)))
    val d3 = drain(dir, ckpt)
    // sessions close in WHICHEVER drain first sees their eviction
    // threshold crossed (b closes in d2, a's two in d3) — consumers
    // accumulate append-mode output across restarts, so the law is over
    // the union
    val emitted = d2 ++ d3
    assert(got(emitted) == batchLaw(b1 ++ b2),
      s"streaming != batch:\n got ${got(emitted)}\nwant ${batchLaw(b1 ++ b2)}")
  }

  test("exact-gap boundary is pinned: events exactly gap apart MERGE (q22's > law)") {
    val dir = tmpDir("sessb-src")
    val ckpt = tmpDir("sessb-ck")
    writeBatch(dir, Seq(("k", 1000L), ("k", 1000L + GapMs)))
    drain(dir, ckpt)
    writeBatch(dir, Seq(("zz", 1000L + 4L * GapMs)))
    val emitted = drain(dir, ckpt)
    val sessions = got(emitted)
    assert(sessions == Set(("k", 1000L, 1000L + GapMs, 2L)),
      s"boundary drifted: $sessions")
  }

  test("the same operator sessionizes a batch frame") {
    import spark.implicits._
    val df = Seq(("u", 1000L), ("u", 2000L), ("u", 2000L + GapMs + 5L))
      .toDF("k", "ms").selectExpr("k", "timestamp_millis(ms) AS ts")
    val sessions = StreamingSessionize.sessions(df, "k", "ts", "30 minutes")
      .collect().toSeq
    assert(got(sessions) == batchLaw(Seq(("u", 1000L), ("u", 2000L), ("u", 2000L + GapMs + 5L))))
  }
}
