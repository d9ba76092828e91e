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

  /** Sweep every query's plan through `check` with the report-memo in
    * PASSTHROUGH mode (spark.graft.report.passthrough): the
    * `ResultMemo.report` ledgers (~45 queries incl. q20/q28/q88/q102/
    * q107/q246 since the r9 review) return their UNCOLLECTED frames, so
    * the audit inspects the real derivation plan, not the driver-local
    * relation the memo serves at runtime — memoization must never become
    * a place for a scale-killer to hide. Remaining `getOrCompute`
    * hand-collectors are either driver-gated side-effect runs whose
    * scratch dies with the call (q248 shard export, q249 Derby sink, the
    * streaming-gate drains) or carry dedicated frame-builder pins
    * (PlanShapeSpec / DistributedNtileSpec).
    */
  private def offenders(check: graft.operators.PlanAudit.Report => Boolean): Seq[String] = {
    spark.conf.set("spark.graft.report.passthrough", "true")
    try SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (check(graft.operators.PlanAudit.audit(fn(spark, dir)))) Some(name)
      else None
    } finally {
      spark.conf.unset("spark.graft.report.passthrough")
      graft.operators.CacheRegistry.releaseAll()
    }
  }

  test("no query plans a physical cartesian product") {
    val bad = offenders(_.cartesian)
    assert(bad.isEmpty, s"physical cartesian products in: $bad")
  }

  test("every unpartitioned window sits above a limit or a bounded-grain aggregate") {
    val bad = offenders(_.globalWindow)
    assert(bad.isEmpty, s"data-sized unpartitioned windows in: $bad")
  }

  test("negative control: ntile over an entity-grain aggregate IS flagged") {
    // The exact shape q246 shipped with in r8 and was respelled to avoid:
    // an unpartitioned window whose input is a groupBy(user_id) rollup —
    // user-count-sized, i.e. data-proportional, NOT bounded. The
    // above-an-Aggregate exemption must not fire for entity-grain keys;
    // this control keeps the linter honest against regressions.
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val perUser = graft.sources.Tables.events(spark, dir)
      .groupBy($"user_id").agg(count(lit(1)).as("freq"))
    val rfmShape = perUser
      .withColumn("f_score", ntile(5).over(
        Window.orderBy($"freq".asc, $"user_id".asc)))
      .groupBy($"f_score").count()
    assert(graft.operators.PlanAudit.audit(rfmShape).globalWindow,
      "the linter must flag a global window over an entity-grain aggregate")
    // ...while a Limit between them still exempts (k-sized input)
    val limited = perUser.orderBy($"freq".desc).limit(10)
      .withColumn("rk", row_number().over(
        Window.orderBy($"freq".desc, $"user_id".asc)))
    assert(!graft.operators.PlanAudit.audit(limited).globalWindow,
      "a Limit above the entity-grain aggregate must keep the exemption")
    // ...and a bounded-grain (domain-keyed) aggregate still exempts
    val byType = graft.sources.Tables.events(spark, dir)
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        Window.orderBy($"n".desc, $"event_type".asc)))
    assert(!graft.operators.PlanAudit.audit(byType).globalWindow,
      "a domain-grain aggregate must keep the exemption")
    graft.operators.CacheRegistry.releaseAll()
  }
}
