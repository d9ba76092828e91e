package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DistributedNtile must be HASH-IDENTICAL to SQL-standard `ntile(k)`
  * under the pinned (sortVal, key) order — including every `n mod k`
  * remainder class (standard ntile puts the LONG buckets first, which the
  * naive `(r*k-1) div n + 1` spelling gets wrong), descending metrics
  * (negated sort values), ties (broken by key), and n < k. The q246 RFM
  * query rides this operator instead of three unpartitioned ntile
  * windows; this spec is the law that swap preserves.
  */
class DistributedNtileSpec extends SparkSpec {

  import graft.operators.DistributedNtile
  import graft.operators.DistributedNtile.Metric

  test("matches ntile(k) for every remainder class, ties, and n < k") {
    import spark.implicits._
    for (n <- Seq(3, 5, 7, 10, 11, 23, 100, 101); k <- Seq(3, 5)) {
      // deterministic pseudo-data with heavy ties: v = i*37 mod 11
      val df = (1 to n).map(i => (i.toLong, (i * 37 % 11).toLong,
        ((i * 53 % 17) - 8).toLong)).toDF("id", "v", "w")
      val expected = df
        .withColumn("v_score", ntile(k).over(
          Window.orderBy($"v".asc, $"id".asc)))
        .withColumn("w_score", ntile(k).over(
          Window.orderBy($"w".desc, $"id".asc)))
        .select($"id", $"v_score", $"w_score")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      val got = DistributedNtile.scores(df, "id", k,
          Seq(Metric("v", $"v"), Metric("w", -$"w")))
        .select($"id", $"v_score", $"w_score")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      assert(got == expected, s"mismatch at n=$n k=$k")
    }
  }

  test("null sortVal is rejected loudly (negation flips null placement vs desc)") {
    import spark.implicits._
    val df = Seq((1L, Some(2.0)), (2L, None), (3L, Some(1.0)))
      .toDF("id", "m")
    val e = intercept[IllegalArgumentException] {
      DistributedNtile.scores(df, "id", 2, Seq(Metric("m", -$"m"))).collect()
    }
    assert(e.getMessage.contains("non-null"))
    graft.operators.CacheRegistry.releaseAll()
  }

  test("carry columns survive with one value per key") {
    import spark.implicits._
    val df = (1 to 20).map(i => (i.toLong, i.toDouble * 1.5, s"u$i"))
      .toDF("id", "m", "tag")
    val out = DistributedNtile.scores(df, "id", 5,
      Seq(Metric("m", $"m")), carry = Seq("m", "tag"))
    assert(out.columns.toSet == Set("id", "m_score", "m", "tag"))
    assert(out.where($"tag" === "u7").select($"m").as[Double].head() == 10.5)
  }

  test("q246 RFM: hash-equal to the ntile spelling, no global window") {
    import spark.implicits._
    import org.apache.spark.sql.execution.window.WindowExec
    val dir = "/root/testdata/sf0.001"
    // ground truth: the r8 ntile spelling (single-task sorts — fine at
    // test scale, the law we must reproduce distributed)
    val horizon = graft.sources.Tables.events(spark, dir)
      .agg(max($"ts").as("hmax"))
    val u = graft.sources.Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(max($"ts").as("last_ts"), count(lit(1)).as("freq"),
        sum($"value".cast("decimal(18,6)")).as("mon"))
      .crossJoin(broadcast(horizon))
      .select($"user_id", $"freq", $"mon".cast("double").as("monetary"),
        floor((unix_micros($"hmax") - unix_micros($"last_ts")) /
          lit(86400000000L)).as("recency_days"))
    val expected = u
      .withColumn("r_score", ntile(5).over(
        Window.orderBy($"recency_days".desc, $"user_id".asc)))
      .withColumn("f_score", ntile(5).over(
        Window.orderBy($"freq".asc, $"user_id".asc)))
      .withColumn("m_score", ntile(5).over(
        Window.orderBy($"monetary".asc, $"user_id".asc)))
      .groupBy($"r_score", $"f_score", $"m_score")
      .agg(count(lit(1)).as("n_users"),
        round(avg($"monetary"), 6).as("avg_monetary"))
      .collect().map(_.toSeq).toSet
    val got = SparkEntry.queries("q246_rfm_segments")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(got == expected)
    // the shipped query memoizes the ≤125-row grid (report treatment),
    // so its own plan is a local relation; the no-global-window shape is
    // pinned on the operator itself in the plan test below, over the
    // same users-grain input class
    val phys = DistributedNtile.scores(u, "user_id", 5, Seq(
        Metric("r", -$"recency_days"), Metric("f", $"freq"),
        Metric("m", $"monetary")), carry = Seq("monetary"))
      .queryExecution.executedPlan
    assert(phys.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }.isEmpty, s"q246's rank frame plans a global window:\n$phys")
    graft.operators.CacheRegistry.releaseAll()
  }

  test("plans no unpartitioned window and no single-partition exchange") {
    import spark.implicits._
    import org.apache.spark.sql.execution.window.WindowExec
    val df = (1 to 100).map(i => (i.toLong, (i * 7 % 13).toLong))
      .toDF("id", "v")
    val out = DistributedNtile.scores(df, "id", 5, Seq(Metric("v", $"v")))
    val saved = spark.conf.getOption("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val phys = out.queryExecution.executedPlan
      val globalWindows = phys.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(globalWindows.isEmpty,
        s"DistributedNtile must not plan a global window:\n$phys")
      assert(!phys.toString.contains("Exchange SinglePartition"),
        s"DistributedNtile must not funnel data to one task:\n$phys")
    } finally {
      saved.fold(spark.conf.unset("spark.sql.adaptive.enabled"))(
        v => spark.conf.set("spark.sql.adaptive.enabled", v))
    }
  }
}
