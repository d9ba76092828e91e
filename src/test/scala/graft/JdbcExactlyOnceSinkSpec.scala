package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.JdbcExactlyOnceSink

/** Exactly-once laws for the transactional JDBC sink: replayed batchIds
  * are no-ops even with different data, a crashed attempt's partial
  * staging is superseded, and a lost checkpoint's full source replay
  * lands every row exactly once — each crash window exercised against
  * embedded Derby.
  */
class JdbcExactlyOnceSinkSpec extends SparkSpec {

  private val dbId = new AtomicInteger(0)

  private def mkSink(): JdbcExactlyOnceSink =
    new JdbcExactlyOnceSink(
      s"jdbc:derby:memory:xsink${dbId.incrementAndGet()};create=true",
      "metrics",
      Seq("k" -> "VARCHAR(64) NOT NULL", "v" -> "BIGINT NOT NULL")).initialize()

  test("replaying a committed batchId is a no-op, even with different data") {
    import spark.implicits._
    val sink = mkSink()
    try {
      sink.writer(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), 0L)
      sink.writer(Seq(("ZOMBIE", 99L)).toDF("k", "v"), 0L) // crash-recovery replay
      sink.writer(Seq(("c", 3L)).toDF("k", "v"), 1L)
      val got = sink.committed(spark).collect()
        .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(got == Seq(("a", 1L), ("b", 2L), ("c", 3L)))
      val ledger = sink.ledgerDF(spark).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(ledger == Seq((0L, 2L), (1L, 1L)))
    } finally sink.close()
  }

  test("a crashed attempt's partial staging is cleared before re-staging") {
    import spark.implicits._
    val sink = mkSink()
    try {
      // simulate: attempt of batch 0 staged rows, crashed before commit
      Seq(("stale", 7L)).toDF("k", "v")
        .selectExpr("k", "v", "CAST(0 AS BIGINT) AS batch_id",
          "CAST(0 AS BIGINT) AS row_tag")
        .write.mode("append").format("jdbc")
        .option("url", s"jdbc:derby:memory:xsink${dbId.get()}")
        .option("dbtable", "metrics_stage").save()
      // recovery re-runs batch 0 with the real data
      sink.writer(Seq(("real", 1L)).toDF("k", "v"), 0L)
      val got = sink.committed(spark).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == Seq(("real", 1L)), s"stale staging leaked: $got")
    } finally sink.close()
  }

  test("a task retry's duplicate partition stage is deduped in the commit") {
    import spark.implicits._
    val sink = mkSink()
    try {
      // Spark's JDBC staging write commits per task partition; a retried
      // or speculative task that re-commits leaves its partition staged
      // twice with the same row_tags. Model that by staging the SAME
      // frame twice (deterministic content+order → identical tags), then
      // committing once: the target must hold each row exactly once.
      val df = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "v").repartition(2)
      sink.stage(df, 0L)
      sink.stage(df, 0L)
      sink.commitBatch(0L)
      val got = sink.committed(spark).collect()
        .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(got == Seq(("a", 1L), ("b", 2L), ("c", 3L)),
        s"duplicate stage leaked into the target: $got")
      assert(sink.ledgerDF(spark).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((0L, 3L)), "ledger must record the deduped count")
    } finally sink.close()
  }

  test("streaming end-to-end: lost checkpoint replays without duplication") {
    import spark.implicits._
    val in = tmpDir("xsink-in")
    (0 until 50).map(i => (s"k$i", i.toLong)).toDF("k", "v")
      .repartition(1).write.mode("append").parquet(in)
    val sink = mkSink()
    try {
      def drain(ckpt: String): Unit = {
        val q = spark.readStream.schema("k STRING, v BIGINT").parquet(in)
          .writeStream.foreachBatch(sink.writer)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      drain(tmpDir("xsink-ck1"))
      drain(tmpDir("xsink-ck2")) // lost checkpoint: full at-least-once replay
      assert(sink.committed(spark).count() == 50L)
      // staging fully drained after commits
      assert(sink.ledgerDF(spark).count() >= 1L)
    } finally sink.close()
  }
}
