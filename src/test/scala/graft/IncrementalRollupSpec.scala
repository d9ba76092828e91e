package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IncrementalRollup

/** Incremental-rollup laws: after each drain the materialized table
  * equals the from-scratch batch recompute (including a NON-distributive
  * aggregate), untouched days stay untouched, and losing the checkpoint
  * converges instead of double-counting.
  */
class IncrementalRollupSpec extends SparkSpec {

  private def writeEvents(dir: String, rows: Seq[(String, String, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("user", "etype", "ms")
      .selectExpr("user", "etype", "timestamp_millis(ms) AS ts")
      .repartition(1)
      .write.mode("append").parquet(dir)
  }

  // count + DISTINCT users per (day, type) — distinct is the aggregate a
  // delta-merge scheme cannot maintain; recompute keeps it exact
  private def rollup(log: DataFrame): DataFrame =
    log.groupBy(to_date(col("ts")).as("day"), col("etype"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user")).as("users"))

  private def snap(path: String): Seq[(String, String, Long, Long)] = {
    import spark.implicits._
    spark.read.parquet(path)
      .select(col("day").cast("string"), col("etype"), col("n"), col("users"))
      .as[(String, String, Long, Long)].collect().sorted.toSeq
  }

  private def expected(logDir: String): Seq[(String, String, Long, Long)] = {
    import spark.implicits._
    rollup(spark.read.parquet(logDir))
      .select(col("day").cast("string"), col("etype"), col("n"), col("users"))
      .as[(String, String, Long, Long)].collect().sorted.toSeq
  }

  private def day(d: Int, h: Int = 12): Long =
    java.sql.Timestamp.valueOf(f"2026-02-$d%02d $h%02d:00:00").getTime

  test("each drain converges the table to the batch recompute; lost checkpoint converges too") {
    val logDir = tmpDir("ir") + "/log"
    val table = tmpDir("ir") + "/rollup"
    val ckpt = tmpDir("ir") + "/ck"
    val ir = new IncrementalRollup(spark, logDir, table, ckpt, tsCol = "ts")(rollup)

    writeEvents(logDir, Seq(("u1", "click", day(1)), ("u2", "click", day(1)),
      ("u1", "view", day(2))))
    ir.runAvailable()
    assert(snap(table) == expected(logDir))

    // batch 2 touches day 2 (more events) and day 3 (new); day 1 untouched
    val day1Files = new java.io.File(table, "day=2026-02-01").listFiles().map(_.getName).toSet
    writeEvents(logDir, Seq(("u1", "view", day(2, 14)), ("u3", "view", day(2, 15)),
      ("u2", "buy", day(3))))
    ir.runAvailable()
    assert(snap(table) == expected(logDir))
    assert(new java.io.File(table, "day=2026-02-01").listFiles().map(_.getName).toSet
      == day1Files, "untouched day's files must stay byte-identical")

    // lost checkpoint: the whole log replays — recompute converges,
    // nothing double-counts
    val ir2 = new IncrementalRollup(spark, logDir, table, tmpDir("ir") + "/ck2",
      tsCol = "ts")(rollup)
    ir2.runAvailable()
    assert(snap(table) == expected(logDir))
  }

  test("forced day refresh repairs a manually corrupted partition") {
    import spark.implicits._
    val logDir = tmpDir("ir2") + "/log"
    val table = tmpDir("ir2") + "/rollup"
    val ir = new IncrementalRollup(spark, logDir, table, tmpDir("ir2") + "/ck",
      tsCol = "ts")(rollup)
    writeEvents(logDir, Seq(("u1", "click", day(5)), ("u2", "click", day(6))))
    ir.runAvailable()
    val good = snap(table)
    // corrupt day 5 (simulate a bad manual write), then force-refresh it
    Seq(("2026-02-05", "click", 999L, 999L)).toDF("day", "etype", "n", "users")
      .write.mode("overwrite").parquet(table + "/day=2026-02-05")
    ir.refreshDays(Seq(java.sql.Date.valueOf("2026-02-05")))
    assert(snap(table) == good)
  }
}
