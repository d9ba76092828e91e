package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{AsOf, AsOfJoinExec}

/** The custom as-of operator (SURVEY.md §4.3 — the whole-operator Catalyst
  * rung): match semantics incl. timestamp ties and strict/inclusive modes,
  * equivalence with the window spelling on real data, and the physical
  * plan contract (AsOfJoinExec present, children exchanged+sorted by the
  * planner, never a cartesian product).
  */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def quotes = Seq(
    // key, time, tie, px
    ("a", 10L, 1L, 1.0),
    ("a", 20L, 2L, 2.0),
    ("a", 20L, 3L, 3.0), // same time as above — tie decides
    ("b", 15L, 4L, 4.0)
  ).toDF("q_key", "q_t", "q_id", "px")

  private def trades = Seq(
    ("a", 5L, 10L), // before every quote
    ("a", 20L, 11L), // equal time: strict excludes (q_t=20,q_id<11? both 2,3 < 11 consumed)
    ("a", 25L, 12L),
    ("b", 15L, 1L), // equal time, tie BELOW the quote's (15,4): strict excludes the quote
    ("c", 30L, 13L) // key with no quotes at all
  ).toDF("t_key", "t_t", "t_id")

  test("strict as-of picks the greatest (time, tie) strictly below") {
    val out = AsOf.join(trades, quotes,
        key = ("t_key", "q_key"), time = ("t_t", "q_t"), tie = ("t_id", "q_id"))
      .select($"t_id", $"q_id", $"px")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out(10L) == -1L) // t=5: nothing earlier
    assert(out(11L) == 3L) // t=20,id=11: quotes (20,2) and (20,3) both < (20,11)
    assert(out(12L) == 3L) // t=25: latest is (20,3)
    assert(out(1L) == -1L) // b: quote at (15,4) NOT < (15,1)
    assert(out(13L) == -1L) // c: no quotes for key
  }

  test("inclusive mode admits the equal (time, tie) pair") {
    val q = Seq(("a", 20L, 11L, 9.0)).toDF("q_key", "q_t", "q_id", "px")
    val t = Seq(("a", 20L, 11L)).toDF("t_key", "t_t", "t_id")
    def run(strict: Boolean) =
      AsOf.join(t, q, ("t_key", "q_key"), ("t_t", "q_t"), ("t_id", "q_id"), strict)
        .select($"px").collect().map(r => if (r.isNullAt(0)) -1.0 else r.getDouble(0))
    assert(run(strict = true).toSeq == Seq(-1.0))
    assert(run(strict = false).toSeq == Seq(9.0))
  }

  test("null keys and null times never match (SQL join semantics)") {
    val q = Seq(
      (Option("a"), Option(5L), 1L, 1.0),
      (Option.empty[String], Option(6L), 2L, 2.0), // null key
      (Option("a"), Option.empty[Long], 3L, 3.0)) // null time
      .toDF("q_key", "q_t", "q_id", "px")
    val t = Seq(
      (Option("a"), Option(10L), 1L),
      (Option.empty[String], Option(10L), 2L), // null-key left: no match
      (Option("a"), Option.empty[Long], 3L)) // null-time left: no match
      .toDF("t_key", "t_t", "t_id")
    val out = AsOf.join(t, q, ("t_key", "q_key"), ("t_t", "q_t"), ("t_id", "q_id"))
      .select($"t_id", $"q_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out(1L) == 1L) // only the non-null (a, 5) quote — never (a, null)
    assert(out(2L) == -1L)
    assert(out(3L) == -1L)
  }

  test("matches the window spelling on the events fixture") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val clicks = ev.where($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"), $"event_id".as("c_id"))
    val custom = AsOf.join(purchases, clicks,
        ("user_id", "c_user"), ("ts", "c_ts"), ("event_id", "c_id"))
      .select($"event_id", $"c_ts".as("last_click_ts"))
      .orderBy($"event_id").collect()
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val windowed = ev
      .withColumn("click_ts", when($"event_type" === "click", $"ts"))
      .withColumn("last_click_ts", last($"click_ts", ignoreNulls = true).over(w))
      .where($"event_type" === "purchase")
      .select($"event_id", $"last_click_ts")
      .orderBy($"event_id").collect()
    assert(custom.length == windowed.length && custom.length > 0)
    custom.zip(windowed).foreach { case (c, x) => assert(c == x) }
  }

  test("tolerance: stale candidates stop matching, state law unchanged") {
    // integral time columns: tolerance interpreted as millis
    val out = AsOf.join(trades, quotes,
        key = ("t_key", "q_key"), time = ("t_t", "q_t"), tie = ("t_id", "q_id"),
        tolerance = Some(java.time.Duration.ofMillis(5)))
      .select($"t_id", $"q_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out(11L) == 3L) // t=20 vs quote (20,3): gap 0 ≤ 5
    assert(out(12L) == 3L) // t=25 vs quote (20,3): gap 5 ≤ 5
    val tight = AsOf.join(trades, quotes,
        key = ("t_key", "q_key"), time = ("t_t", "q_t"), tie = ("t_id", "q_id"),
        tolerance = Some(java.time.Duration.ofMillis(4)))
      .select($"t_id", $"q_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(tight(11L) == 3L) // gap 0 still in
    assert(tight(12L) == -1L) // gap 5 > 4: stale — no match, not an older one
  }

  test("tolerance on timestamps matches the window spelling with a horizon") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val horizon = java.time.Duration.ofHours(6)
    val purchases = ev.where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val clicks = ev.where($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"), $"event_id".as("c_id"))
    val custom = AsOf.join(purchases, clicks,
        ("user_id", "c_user"), ("ts", "c_ts"), ("event_id", "c_id"),
        tolerance = Some(horizon))
      .select($"event_id", $"c_ts".as("last_click_ts"))
      .orderBy($"event_id").collect()
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val windowed = ev
      .withColumn("click_ts", when($"event_type" === "click", $"ts"))
      .withColumn("lc", last($"click_ts", ignoreNulls = true).over(w))
      .withColumn("last_click_ts",
        when(unix_micros($"ts") - unix_micros($"lc") <= horizon.toNanos / 1000L, $"lc"))
      .where($"event_type" === "purchase")
      .select($"event_id", $"last_click_ts")
      .orderBy($"event_id").collect()
    assert(custom.length == windowed.length && custom.length > 0)
    // the horizon must actually bite on this fixture, or the test is vacuous
    assert(custom.exists(_.isNullAt(1)) && custom.exists(!_.isNullAt(1)))
    custom.zip(windowed).foreach { case (c, x) => assert(c == x) }
  }

  test("forward as-of picks the smallest (time, tie) strictly above") {
    val out = AsOf.join(trades, quotes,
        key = ("t_key", "q_key"), time = ("t_t", "q_t"), tie = ("t_id", "q_id"),
        forward = true)
      .select($"t_id", $"q_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out(10L) == 1L) // t=5: next quote is (10,1)
    assert(out(11L) == -1L) // t=20,id=11: quotes (20,2),(20,3) are BELOW (20,11)
    assert(out(12L) == -1L) // t=25: nothing after
    assert(out(1L) == 4L) // b at (15,1): quote (15,4) is above by tie
    assert(out(13L) == -1L) // c: no quotes
  }

  test("forward tolerance bounds how far ahead the match may be") {
    val out = AsOf.join(trades, quotes,
        key = ("t_key", "q_key"), time = ("t_t", "q_t"), tie = ("t_id", "q_id"),
        forward = true, tolerance = Some(java.time.Duration.ofMillis(4)))
      .select($"t_id", $"q_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out(10L) == -1L) // next quote is 5 ms ahead > 4: no match, no fallback
    assert(out(1L) == 4L) // gap 0 within tolerance
  }

  test("seeded random tables match a brute-force reference") {
    // few keys, tiny time domain (heavy collisions), overlapping id ranges
    // on both sides — stresses exactly the (time, tie) lexicographic law
    val rnd = new scala.util.Random(42)
    val keys = Vector("k1", "k2", "k3")
    for (trial <- 1 to 5) {
      val lefts = (1L to 40L).map(i =>
        (keys(rnd.nextInt(3)), rnd.nextInt(20).toLong, i))
      val rights = (1L to 40L).map(i =>
        (keys(rnd.nextInt(3)), rnd.nextInt(20).toLong, i, rnd.nextInt(1000) / 10.0))
      val expected = lefts.map { case (k, t, id) =>
        val m = rights
          .filter(r => r._1 == k && (r._2 < t || (r._2 == t && r._3 < id)))
          .sortBy(r => (r._2, r._3)).lastOption
        id -> m.map(_._3).getOrElse(-1L)
      }.toMap
      val got = AsOf.join(
          lefts.toDF("t_key", "t_t", "t_id"),
          rights.toDF("q_key", "q_t", "q_id", "px"),
          ("t_key", "q_key"), ("t_t", "q_t"), ("t_id", "q_id"))
        .select($"t_id", $"q_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      assert(got == expected, s"trial $trial diverged from reference")

      // forward + tolerance against the same brute force
      val tolMs = 5L
      val expectedFwd = lefts.map { case (k, t, id) =>
        val m = rights
          .filter(r => r._1 == k && (r._2 > t || (r._2 == t && r._3 > id)))
          .filter(r => r._2 - t <= tolMs)
          .sortBy(r => (r._2, r._3)).headOption
        id -> m.map(_._3).getOrElse(-1L)
      }.toMap
      val gotFwd = AsOf.join(
          lefts.toDF("t_key", "t_t", "t_id"),
          rights.toDF("q_key", "q_t", "q_id", "px"),
          ("t_key", "q_key"), ("t_t", "q_t"), ("t_id", "q_id"),
          forward = true, tolerance = Some(java.time.Duration.ofMillis(tolMs)))
        .select($"t_id", $"q_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      assert(gotFwd == expectedFwd, s"trial $trial forward diverged from reference")
    }
  }

  test("operator metrics count output and matched rows; bad columns throw") {
    val df = AsOf.join(trades, quotes,
      ("t_key", "q_key"), ("t_t", "q_t"), ("t_id", "q_id"))
    df.collect()
    // AQE wraps the operator in leaf QueryStageExec nodes — descend manually
    def findAsOf(p: org.apache.spark.sql.execution.SparkPlan): Option[AsOfJoinExec] =
      p match {
        case x: AsOfJoinExec => Some(x)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          findAsOf(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          findAsOf(q.plan)
        case other => other.children.view.flatMap(findAsOf(_)).headOption
      }
    val exec = findAsOf(df.queryExecution.executedPlan)
    assert(exec.isDefined, "AsOfJoinExec not found in executed plan")
    assert(exec.get.metrics("numOutputRows").value == 5) // every trade
    assert(exec.get.metrics("numMatched").value == 2) // t_id 11 and 12
    val err = intercept[IllegalArgumentException] {
      AsOf.join(trades, quotes, ("no_such", "q_key"), ("t_t", "q_t"), ("t_id", "q_id"))
    }
    assert(err.getMessage.contains("no_such"))
  }

  test("plans AsOfJoinExec with exchanged+sorted children, no cartesian") {
    val df = AsOf.join(trades, quotes,
      ("t_key", "q_key"), ("t_t", "q_t"), ("t_id", "q_id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin")) // AsOfJoinExec prints without Exec
    assert(plan.contains("Exchange hashpartitioning"))
    assert(plan.contains("Sort ["))
    assert(!plan.contains("CartesianProduct"))
  }
}
