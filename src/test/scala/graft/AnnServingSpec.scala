package graft

import org.apache.spark.sql.functions._

/** Laws of the shared ANN serving plumbing (operators.AnnServing) on a
  * hand-checkable fixture: exact top-k with the nn_id tie-break,
  * brute-truth self-exclusion, re-rank recovering the exact order from a
  * deliberately mis-ranked shortlist, and the recall ledger's zero-fill
  * for queries a tier misses entirely.
  */
class AnnServingSpec extends SparkSpec {

  import graft.operators.AnnServing

  private def fixture = {
    import spark.implicits._
    graft.functions.expressions.GraftFunctions.register(spark)
    // 2-d vectors: id 0 and 1 are queries; cosines are hand-computable
    val vecs = Seq(
      (0L, Array(1.0, 0.0)),
      (1L, Array(0.0, 1.0)),
      (2L, Array(1.0, 0.1)),   // ~q0's nearest
      (3L, Array(1.0, 0.5)),
      (4L, Array(0.1, 1.0)),   // ~q1's nearest
      (5L, Array(0.5, 1.0)),
      (6L, Array(-1.0, 0.0)))
    val e = vecs.toDF("vec_id", "v")
      .select($"vec_id", $"v", sqrt(graft.functions.VectorFunctions.dot($"v", $"v")).as("nrm"))
    val q = e.where($"vec_id" < 2)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    (e, q)
  }

  test("bruteTruth: exact cosine order, self excluded, nn_id tie-break") {
    import spark.implicits._
    val (e, q) = fixture
    val truth = AnnServing.bruteTruth(e, q, 2)
      .as[(Long, Long)].collect().toSet
    // q0=(1,0): cos with 2 (.995) > 3 (.894) > 5/1/4 > 6; never itself
    // q1=(0,1): cos with 4 (.995) > 5 (.894)
    assert(truth == Set((0L, 2L), (0L, 3L), (1L, 4L), (1L, 5L)))
  }

  test("rerank recovers exact order from a mis-ranked shortlist") {
    import spark.implicits._
    val (e, q) = fixture
    // a cheap tier proposed {3, 6, 2} for q0 in the wrong order
    val shortlist = Seq((0L, 3L), (0L, 6L), (0L, 2L)).toDF("q_id", "nn_id")
    val rr = AnnServing.rerank(shortlist, e, q, 2)
      .as[(Long, Long)].collect().toSet
    assert(rr == Set((0L, 2L), (0L, 3L)))
  }

  test("recallLedger zero-fills tiers that miss a query entirely") {
    import spark.implicits._
    val (e, q) = fixture
    val truth = AnnServing.bruteTruth(e, q, 2)
    val goodTier = truth // perfect recall
    val blindTier = Seq((0L, 6L)).toDF("q_id", "nn_id") // misses q1 wholly
    val rows = AnnServing.recallLedger(truth,
        Seq("good" -> goodTier, "blind" -> blindTier))
      .orderBy($"q_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows == Seq((0L, 2L, 2L, 0L), (1L, 2L, 2L, 0L)))
  }

  test("topK ties break on ascending nn_id") {
    import spark.implicits._
    val pairs = Seq((0L, 9L, 1.0), (0L, 3L, 1.0), (0L, 7L, 1.0))
      .toDF("q_id", "nn_id", "cos")
    val top = AnnServing.topK(pairs, 2).as[(Long, Long)].collect().toSet
    assert(top == Set((0L, 3L), (0L, 7L)))
  }
}
