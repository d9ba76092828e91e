package graft

import org.apache.spark.sql.functions._

/** The report-treatment contract (operators.ResultMemo.report): compute
  * once per key, preserve schema (names, types, nullability) and row
  * order exactly, and serve repeat readers the same driver-local relation
  * — the semantics the r9 memoized ledgers (q20/q102/q108/...) rely on
  * for hash-stability.
  */
class ResultMemoSpec extends SparkSpec {

  import graft.operators.ResultMemo

  test("report: computes once, preserves schema/order/nulls, memo identity") {
    import spark.implicits._
    def frame = Seq((3L, "c", Option(2.5)), (1L, "a", Option(0.5)),
        (2L, "b", Option.empty[Double]))
      .toDF("id", "tag", "score")
      .orderBy($"id".desc)
    var builds = 0
    val key = s"report-spec:${System.identityHashCode(this)}"
    val a = ResultMemo.report(key) { builds += 1; frame }
    val b = ResultMemo.report(key) { builds += 1; frame }
    assert(builds == 1, "report must compute exactly once per key")
    assert(a.schema == frame.schema, "schema must be preserved exactly")
    assert(a.collect().map(_.getLong(0)).toSeq == Seq(3L, 2L, 1L),
      "collected row order must be preserved")
    assert(a.where($"id" === 2L).select($"score").collect().head.isNullAt(0),
      "nulls must survive the round-trip")
    assert(a eq b, "repeat readers must get the memoized frame")
    ResultMemo.clear()
  }

  test("report: a data-proportional frame trips the row cap loudly") {
    // the bounded-ledger contract is enforced, not just declared (r9
    // advisor finding): an unbounded report must fail fast with the key
    // in the message, never silently collect toward a driver OOM
    val key = s"report-cap-spec:${System.identityHashCode(this)}"
    val e = intercept[IllegalStateException] {
      ResultMemo.report(key) {
        spark.range(ResultMemo.MaxReportRows + 10L).toDF("id")
      }
    }
    assert(e.getMessage.contains(key) && e.getMessage.contains("bounded"))
    // and the failed key is not poisoned: a bounded retry under the same
    // key computes fine
    assert(ResultMemo.report(key) { spark.range(3).toDF("id") }.count() == 3)
    ResultMemo.clear()
  }
}
