package graft

/** Physical-plan assertions for the scale claims the query docs make:
  * candidate-generation self-joins are bucket joins (never a cross
  * product), top-k scans plan as TakeOrderedAndProject, and the star join
  * broadcasts its dimensions. Plans built at sf0.001 — shape, not size,
  * is under test.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("dedup/ANN candidate joins are bucket-shaped: no cross product, no nested loop") {
    Seq("q31_minhash_lsh", "q33_lsh_jaccard", "q43_ann_lsh", "q69_simhash_neardup")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join")
      }
  }

  test("scan-sort-limit plans as TakeOrderedAndProject (no full sort)") {
    assert(plan("q02_events_scan").contains("TakeOrderedAndProject"))
    assert(plan("q15_topk_orders").contains("TakeOrderedAndProject"))
  }

  test("star join broadcasts its dimension tables") {
    assert(plan("q12_star_nation_revenue").contains("BroadcastHashJoin"))
  }
}
