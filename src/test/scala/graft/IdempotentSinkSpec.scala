package graft

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.IdempotentParquetSink

/** Exactly-once laws for the replay-safe batch sink: a replayed batchId
  * is a no-op (the at-least-once crash-recovery case), distinct batches
  * append, and a real stream drains through it without duplication.
  */
class IdempotentSinkSpec extends SparkSpec {

  test("replaying a committed batchId never duplicates or overwrites") {
    import spark.implicits._
    val out = tmpDir("idem")
    val w = IdempotentParquetSink.writer(out)
    w(Seq(1, 2, 3).toDF("v"), 0L)
    // crash-recovery replay: same id, even DIFFERENT data must be ignored
    w(Seq(99).toDF("v"), 0L)
    w(Seq(4, 5).toDF("v"), 1L)
    val got = IdempotentParquetSink.read(spark, out)
      .select($"v", $"batch").as[(Int, Long)].collect().sorted.toSeq
    assert(got == Seq((1, 0L), (2, 0L), (3, 0L), (4, 1L), (5, 1L)))
  }

  test("a half-written (uncommitted) directory is repaired on replay") {
    import spark.implicits._
    val out = tmpDir("idem2")
    // simulate a crash AFTER data landed but BEFORE the commit rename:
    // a batch dir with no marker
    Seq(7).toDF("v").write.parquet(s"$out/batch=0")
    IdempotentParquetSink.writer(out)(Seq(1, 2).toDF("v"), 0L)
    val got = IdempotentParquetSink.read(spark, out)
      .select($"v").as[Int].collect().sorted.toSeq
    assert(got == Seq(1, 2), "the orphaned half-write must be superseded")
  }

  test("streaming end-to-end: restart from a fresh checkpoint does not duplicate rows") {
    import spark.implicits._
    val in = tmpDir("idem-in")
    val out = tmpDir("idem-out")
    (0 until 100).toDF("v").repartition(1).write.mode("append").parquet(in)
    def drain(ckpt: String): Unit = {
      val q = spark.readStream.schema("v INT").parquet(in)
        .writeStream
        .foreachBatch(IdempotentParquetSink.writer(out))
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain(tmpDir("idem-ck1"))
    // a LOST checkpoint forces a full source replay — the at-least-once
    // worst case; the sink's batch ledger absorbs it
    drain(tmpDir("idem-ck2"))
    val n = IdempotentParquetSink.read(spark, out).count()
    assert(n == 100L, s"expected 100 rows exactly once, got $n")
  }
}
