package graft

import java.sql.Timestamp

import graft.operators.GapFill

/** Gap-fill laws on a feed with REAL holes (the driver fixture is dense,
  * so q113's oracle alone never exercises the zero path): missing days
  * materialize as explicit zeros, the grid spans the GLOBAL range for
  * every key (a key absent on the corpus's first day still gets that
  * row), and the trailing stats count the zeros.
  */
class GapFillSpec extends SparkSpec {

  private def ts(day: Int): Timestamp = Timestamp.valueOf(f"2026-01-$day%02d 12:00:00")

  test("missing days appear as zeros and trailing stats include them") {
    import spark.implicits._
    // key "a": days 1, 2, 4 (hole at 3); key "b": day 2 only
    val df = Seq(
      ("a", ts(1)), ("a", ts(1)), ("a", ts(2)), ("a", ts(4)),
      ("b", ts(2))).toDF("k", "t")
    val out = GapFill.daily(df, "k", "t", trailing = 3)
      .select($"k", $"day".cast("string"), $"n", $"sum7", $"avg7")
      .as[(String, String, Long, Long, Double)].collect().toSeq

    val a = out.filter(_._1 == "a").map(r => (r._2, r._3, r._4, r._5))
    assert(a == Seq(
      ("2026-01-01", 2L, 2L, 2.0),
      ("2026-01-02", 1L, 3L, 1.5),
      ("2026-01-03", 0L, 3L, 1.0),       // the hole: explicit zero, counted
      ("2026-01-04", 1L, 2L, 0.666667))) // trailing-3 of (1, 0, 1)

    // key "b" gets the FULL global span, zeros outside its own activity
    val b = out.filter(_._1 == "b").map(r => (r._2, r._3))
    assert(b == Seq(
      ("2026-01-01", 0L), ("2026-01-02", 1L),
      ("2026-01-03", 0L), ("2026-01-04", 0L)))
  }

  test("seeded-random feeds agree with a driver-side brute-force densification") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val keys = (0 until 1 + rnd.nextInt(4)).map(i => s"k$i")
      val rows = for {
        k <- keys
        _ <- 0 until 1 + rnd.nextInt(10)
      } yield (k, ts(1 + rnd.nextInt(20)))
      val got = GapFill.daily(rows.toDF("k", "t"), "k", "t", trailing = 7)
        .select($"k", $"day".cast("string"), $"n", $"sum7")
        .as[(String, String, Long, Long)].collect().toSeq

      // brute force: global span, per-key day counts, zero fill, trailing 7
      val byDay = rows.groupBy(r => (r._1, r._2.toLocalDateTime.toLocalDate))
        .view.mapValues(_.size.toLong).toMap
      val allDays = rows.map(_._2.toLocalDateTime.toLocalDate)
      val span = Iterator.iterate(allDays.min)(_.plusDays(1))
        .takeWhile(!_.isAfter(allDays.max)).toSeq
      val expected = for {
        k <- keys.sorted
        (day, i) <- span.zipWithIndex
      } yield {
        val win = span.slice(math.max(0, i - 6), i + 1)
        (k, day.toString, byDay.getOrElse((k, day), 0L),
          win.map(d => byDay.getOrElse((k, d), 0L)).sum)
      }
      assert(got == expected)
    }
  }

  test("dense input is a fixpoint: no rows added, counts unchanged") {
    import spark.implicits._
    val df = (1 to 3).flatMap(d => Seq(("x", ts(d)), ("y", ts(d)))).toDF("k", "t")
    val out = GapFill.daily(df, "k", "t")
    assert(out.count() == 6)
    assert(out.where($"n" =!= 1L).count() == 0)
  }
}
