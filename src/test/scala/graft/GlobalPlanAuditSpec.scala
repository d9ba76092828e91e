package graft

/** Structural scale rules enforced over the ENTIRE query surface — not a
  * sampled pin but an audit of every SparkEntry query's plan, so a new
  * query cannot ship with one of the two classic scale-killers:
  *
  *   1. a physical CartesianProduct (unbounded pair work). Bounded
  *      1-row/broadcast cross joins plan as BroadcastNestedLoopJoin with
  *      a tiny side and are allowed; a CartesianProduct means both sides
  *      were unbounded.
  *   2. an unpartitioned window running directly over raw (per-row) data
  *      — the single-task global sort. Global windows are allowed only
  *      above an Aggregate or a Limit, i.e. over tables whose size is a
  *      group-count or an explicit k, not the event/document count.
  *      (q107's two-pass rank, q93/q96's limit-then-rank, and the
  *      bounded-domain rollups all satisfy this by construction.)
  *
  * Plans are built at sf0.001 — shape, not size, is under audit. The
  * rules themselves live in [[graft.operators.PlanAudit]] (the user-facing
  * plan linter); this spec sweeps them over the whole pack.
  */
class GlobalPlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("no query plans a physical cartesian product") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (graft.operators.PlanAudit.audit(fn(spark, dir)).cartesian) Some(name)
      else None
    }
    graft.operators.CacheRegistry.releaseAll()
    assert(offenders.isEmpty, s"physical cartesian products in: $offenders")
  }

  test("every unpartitioned window sits above an aggregate or a limit") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (graft.operators.PlanAudit.audit(fn(spark, dir)).globalWindow) Some(name)
      else None
    }
    graft.operators.CacheRegistry.releaseAll()
    assert(offenders.isEmpty, s"data-sized unpartitioned windows in: $offenders")
  }
}
