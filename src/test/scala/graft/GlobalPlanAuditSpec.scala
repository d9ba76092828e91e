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
    * `ResultMemo.report` ledgers (~60 queries; the r10 migration moved
    * the last 14 batch-analytic hand-collectors — q194, q228, q230-q233,
    * q235, q237, q238, q240-q243, q247 — onto it) return their
    * UNCOLLECTED frames, so the audit inspects the real derivation plan,
    * not the driver-local relation the memo serves at runtime —
    * memoization must never become a place for a scale-killer to hide.
    * The only remaining `getOrCompute` ledgers are genuinely procedural:
    * driver-gated side-effect runs whose scratch dies with the call
    * (q248 shard export, q249 Derby sink, q206/q207 sink gates, the
    * streaming-gate drains q178-q188/q193/q195/q201-q204/q211) plus
    * eager-cached index-eval frames (q109/q116/q121/q170/q226/q229 et
    * al.) whose derivations carry dedicated frame-builder pins
    * (PlanShapeSpec / DistributedNtileSpec). NOTE: passthrough leaves the
    * MEMO cold but not the cluster idle — report bodies riding eager hub
    * builds (cache()+count() at construction) still run that work.
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

  test("negative controls: content-identity group keys are entity-grain too") {
    // r9 verdict: the id-only net let a data-proportional key named fp /
    // hash / hkey / gram / content_md5 slip the exemption. One control
    // per added class: a global window above a groupBy on each name MUST
    // flag — the group count is ~one row per distinct content item.
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, dir)
    for (name <- Seq("content_hash", "fp", "hkey", "gram", "content_md5",
        "simhash", "digest", "fingerprint", "ch", "gh")) {
      val shape = docs.select(md5($"text".cast("binary")).as(name))
        .groupBy(col(name)).agg(count(lit(1)).as("n"))
        .withColumn("rk", ntile(5).over(
          Window.orderBy($"n".asc, col(name).asc)))
        .groupBy($"rk").count()
      assert(graft.operators.PlanAudit.audit(shape).globalWindow,
        s"a global window over groupBy($name) must flag as entity-grain")
    }
    // ...and a Limit between them still exempts (k-sized input)
    val limited = docs.select(md5($"text".cast("binary")).as("content_hash"))
      .groupBy($"content_hash").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc).limit(10)
      .withColumn("rk", row_number().over(
        Window.orderBy($"n".desc, $"content_hash".asc)))
    assert(!graft.operators.PlanAudit.audit(limited).globalWindow,
      "a Limit above the content-identity aggregate must keep the exemption")
    graft.operators.CacheRegistry.releaseAll()
  }
}
