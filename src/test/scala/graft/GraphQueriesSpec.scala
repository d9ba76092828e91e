package graft

import org.apache.spark.sql.functions._

/** Semantic laws for the graph/layout/sampling pack (q89-q94) that the
  * DuckDB oracle can't express directly: PageRank against an in-memory
  * reference power iteration on the SAME extracted graph, the z-order
  * locality bound, and priority-sample determinism.
  */
class GraphQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q89 PageRank matches an in-memory power iteration on the same graph") {
    import spark.implicits._
    // extract the identical edge list the query uses
    val li = sources.Tables.lineitem(spark, dir)
    val o = sources.Tables.orders(spark, dir)
    val c = sources.Tables.customer(spark, dir)
    val sup = sources.Tables.supplier(spark, dir)
    val edges = li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(sup, $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_nationkey".as("src"), $"c_nationkey".as("dst"))
      .agg(count(lit(1)).as("w"))
      .as[(Int, Int, Long)].collect()
    val nodes = sources.Tables.nation(spark, dir)
      .select($"n_nationkey").as[Int].collect().sorted
    val n = nodes.length.toDouble

    // reference: dense power iteration with the query's exact recurrence
    // (per-iteration 10dp rounding, dangling mass redistributed uniformly)
    val outW = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var pr = nodes.map(_ -> 1.0 / n).toMap
    def r10(x: Double) = BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (_ <- 1 to 3) {
      val dangling = nodes.filterNot(outW.contains).map(pr).sum
      val contrib = edges.groupBy(_._2).view.mapValues {
        _.map { case (s0, _, w) => pr(s0) * (w.toDouble / outW(s0)) }.sum
      }.toMap
      pr = nodes.map(v =>
        v -> r10(0.15 / n + 0.85 * (contrib.getOrElse(v, 0.0) + dangling / n))).toMap
    }

    val got = SparkEntry.queries("q89_pagerank")(spark, dir)
      .select($"nation_key", $"pagerank").as[(Int, Double)].collect().toMap
    assert(got.keySet == pr.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - pr(k)) < 1e-6, s"node $k: got $v expected ${pr(k)}")
    }
    // a proper distribution: dangling redistribution conserves mass
    // (tolerance = 25 nodes × half-ulp of the final 6dp rounding)
    assert(math.abs(got.values.sum - 1.0) < 25 * 0.5e-6)
  }

  test("q91 z-order blocks bound both dimensions (the pruning property)") {
    import spark.implicits._
    val rows = SparkEntry.queries("q91_zorder")(spark, dir)
      .select($"x_span", $"y_span").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    // z >> 12 leaves 6 interleaved bits per dimension: any block is a
    // rectangle of side ≤ 2^6 — this is WHY min-max file stats stay
    // selective for either dimension after a z-sort
    rows.foreach { case (xs, ys) =>
      assert(xs < 64 && ys < 64, s"block spans ($xs, $ys) exceed the 64-cell bound")
    }
  }

  test("q92 priority sample is deterministic and favors longer documents") {
    import spark.implicits._
    val q = SparkEntry.queries("q92_priority_sample")
    val a = q(spark, dir).collect().toSeq
    val b = q(spark, dir).collect().toSeq
    assert(a == b, "sample must be bit-stable across runs")

    // weighting law: expected selection follows n_chars; assert the weak
    // form that holds for any hash draw — sampled docs' mean length is not
    // BELOW the corpus mean (longer docs get smaller priorities)
    val sampledMean = q(spark, dir).agg(avg($"n_chars")).as[Double].head()
    val corpusMean = sources.Tables.documents(spark, dir)
      .agg(avg($"n_chars")).as[Double].head()
    assert(sampledMean > corpusMean * 0.8,
      s"weighted sample mean $sampledMean implausibly below corpus mean $corpusMean")
  }
}
