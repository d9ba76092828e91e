package graft

import org.apache.spark.sql.functions._

import graft.operators.SketchRollup

/** Sketch-rollup laws: the trailing estimates stay within the HLL error
  * bound of the EXACT trailing distinct counts, and the mergeability law
  * holds exactly — unioning stored daily sketches gives the identical
  * estimate to sketching the window's raw events directly (HLL registers
  * are max-based, so merge order and grouping cannot change them).
  */
class SketchRollupSpec extends SparkSpec {

  // 60 days × overlapping user populations with churn: day d sees users
  // [20·d, 20·d + 600) — adjacent days share 580 of 600 users
  private def events = {
    import spark.implicits._
    (0 until 60).flatMap { d =>
      (0 until 600).map(u => (java.sql.Date.valueOf(f"2026-03-01").toLocalDate
        .plusDays(d).toString, (20 * d + u).toLong))
    }.toDF("dstr", "user")
      .select(to_timestamp($"dstr").as("ts"), $"user")
  }

  test("trailing estimates are within 5% of exact trailing distinct counts") {
    import spark.implicits._
    val ev = events.cache()
    val est = SketchRollup.trailingDistinct(
        SketchRollup.dailySketches(ev, "ts", "user"), Seq(1, 7, 30))
      .select($"day".cast("string"), $"active_1", $"active_7", $"active_30")
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)

    val ud = ev.select(to_date($"ts").as("day"), $"user").distinct()
    def exact(w: Int) = ud.as("d").select($"day").distinct().as("dd")
      .join(ud.as("u"), datediff($"dd.day", $"u.day").between(0, w - 1))
      .groupBy($"dd.day").agg(countDistinct($"u.user").as("n"))
      .select($"day".cast("string"), $"n")
      .as[(String, Long)].collect().toMap
    val (e1, e7, e30) = (exact(1), exact(7), exact(30))

    est.foreach { case (day, a1, a7, a30) =>
      def ok(got: Long, want: Long) =
        math.abs(got - want).toDouble / want <= 0.05
      assert(ok(a1, e1(day)), s"$day active_1: $a1 vs ${e1(day)}")
      assert(ok(a7, e7(day)), s"$day active_7: $a7 vs ${e7(day)}")
      assert(ok(a30, e30(day)), s"$day active_30: $a30 vs ${e30(day)}")
    }
    ev.unpersist()
  }

  test("mergeability: unioned daily sketches equal the directly-built window sketch") {
    import spark.implicits._
    val ev = events.where(to_date($"ts") <= "2026-03-07").cache()
    // union of 7 stored daily sketches
    val viaUnion = SketchRollup.dailySketches(ev, "ts", "user")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")).head().getLong(0)
    // one sketch built straight from the raw week
    val direct = ev.agg(expr("hll_sketch_estimate(hll_sketch_agg(user, 12))"))
      .head().getLong(0)
    assert(viaUnion == direct,
      s"union-of-parts ($viaUnion) must equal sketch-of-whole ($direct)")
    ev.unpersist()
  }
}
