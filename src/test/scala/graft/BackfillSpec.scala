package graft

import graft.operators.Backfill

/** Backfill laws: only the mandated partitions change, out-of-range
  * output from a buggy transform is fenced, and re-runs converge.
  */
class BackfillSpec extends SparkSpec {

  private def mkEvents(values: (String, Int)*) = {
    import spark.implicits._
    values.toDF("day", "v")
  }

  test("replaceRange rewrites exactly [from, to]; other partitions untouched; idempotent") {
    import spark.implicits._
    val table = tmpDir("bf") + "/daily"
    // day-1..3 rollup v=1 each
    Backfill.replaceRange(spark, mkEvents("d1" -> 1, "d2" -> 1, "d3" -> 1),
      table, "day", "d1", "d3")(identity)
    // late data doubles d2 only
    val n = Backfill.replaceRange(spark, mkEvents("d2" -> 2), table, "day", "d2", "d2")(identity)
    assert(n == 1)
    def snap() = spark.read.parquet(table).select($"day", $"v")
      .as[(String, Int)].collect().sorted.toSeq
    assert(snap() == Seq(("d1", 1), ("d2", 2), ("d3", 1)))
    // idempotent: same backfill again → same state
    Backfill.replaceRange(spark, mkEvents("d2" -> 2), table, "day", "d2", "d2")(identity)
    assert(snap() == Seq(("d1", 1), ("d2", 2), ("d3", 1)))
  }

  test("replaceValues heals exactly the named set in one job; between-days untouched") {
    import spark.implicits._
    val table = tmpDir("bf-set") + "/daily"
    Backfill.replaceRange(spark, mkEvents("d1" -> 1, "d2" -> 1, "d3" -> 1, "d4" -> 1, "d5" -> 1),
      table, "day", "d1", "d5")(identity)
    // a late batch touches d1 and d5 only: the SCATTERED set heals in
    // ONE job, and d2..d4 — inside the min..max span a range spelling
    // would have re-granted — keep their bytes (their mandate was never
    // granted: a transform that would now produce different rows for
    // them must not touch them)
    val n = Backfill.replaceValues(spark,
      mkEvents("d1" -> 9, "d5" -> 9, "d2" -> 777, "d3" -> 777, "d4" -> 777),
      table, "day", Seq("d1", "d5"))(identity)
    assert(n == 2, "only the named partitions' rows are written")
    def snap() = spark.read.parquet(table).select($"day", $"v")
      .as[(String, Int)].collect().sorted.toSeq
    assert(snap() == Seq(("d1", 9), ("d2", 1), ("d3", 1), ("d4", 1), ("d5", 9)))
    // empty set is a no-op
    assert(Backfill.replaceValues(spark, mkEvents("d1" -> 0), table, "day", Seq.empty)(identity) == 0L)
    assert(snap() == Seq(("d1", 9), ("d2", 1), ("d3", 1), ("d4", 1), ("d5", 9)))
    // an in-set partition whose recompute is empty sweeps (the
    // replaceRange law carries over through the shared mechanics)
    Backfill.replaceValues(spark, mkEvents("d1" -> 4),
      table, "day", Seq("d1", "d5"))(identity)
    assert(snap() == Seq(("d1", 4), ("d2", 1), ("d3", 1), ("d4", 1)))
  }

  test("an in-mandate partition whose recompute is empty is deleted, not retained") {
    import spark.implicits._
    val table = tmpDir("bf3") + "/daily"
    Backfill.replaceRange(spark, mkEvents("d1" -> 1, "d2" -> 1, "d3" -> 1),
      table, "day", "d1", "d3")(identity)
    // recompute of [d1, d3] now says d2 has NO rows (e.g. the bug fix
    // dropped them all) — dynamic overwrite alone would keep stale d2
    val n = Backfill.replaceRange(spark, mkEvents("d1" -> 5, "d3" -> 5),
      table, "day", "d1", "d3")(identity)
    assert(n == 2)
    val got = spark.read.parquet(table).select($"day", $"v")
      .as[(String, Int)].collect().sorted.toSeq
    assert(got == Seq(("d1", 5), ("d3", 5)), "empty-recompute d2 must be deleted")
    // and the sweep never reaches outside the mandate
    val n2 = Backfill.replaceRange(spark, mkEvents("d3" -> 6), table, "day", "d3", "d3")(identity)
    assert(n2 == 1)
    assert(spark.read.parquet(table).select($"day", $"v")
      .as[(String, Int)].collect().sorted.toSeq == Seq(("d1", 5), ("d3", 6)))
  }

  test("empty-recompute sweep deletes partitions whose values need path escaping") {
    import spark.implicits._
    // Spark writes these as escaped directory names (space → %20, ':' →
    // %3A); a sweep that reconstructs "day=<raw value>" would miss them
    // and silently retain the stale rows
    val table = tmpDir("bf4") + "/hourly"
    val k1 = "2024-01-01 00:00"
    val k2 = "2024-01-01 01:00"
    Backfill.replaceRange(spark, mkEvents(k1 -> 1, k2 -> 1),
      table, "day", k1, k2)(identity)
    val n = Backfill.replaceRange(spark, mkEvents(k2 -> 9),
      table, "day", k1, k2)(identity)
    assert(n == 1)
    val got = spark.read.parquet(table).select($"day", $"v")
      .as[(String, Int)].collect().sorted.toSeq
    assert(got == Seq((k2, 9)), s"escaped stale partition must be deleted, got $got")
  }

  test("a transform leaking rows outside its mandate is fenced") {
    import spark.implicits._
    val table = tmpDir("bf2") + "/daily"
    Backfill.replaceRange(spark, mkEvents("d1" -> 1, "d2" -> 1), table, "day", "d1", "d2")(identity)
    // buggy transform emits d1 AND d2 rows, but the mandate is d2 only
    Backfill.replaceRange(spark, mkEvents("d1" -> 99, "d2" -> 7), table, "day", "d2", "d2")(identity)
    val got = spark.read.parquet(table).select($"day", $"v")
      .as[(String, Int)].collect().sorted.toSeq
    assert(got == Seq(("d1", 1), ("d2", 7)), "d1 must keep its original value")
  }
}
