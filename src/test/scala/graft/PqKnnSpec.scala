package graft

import org.apache.spark.sql.Row

/** Laws for q95 product-quantization KNN that the t2 oracle can't express:
  * recall against the exact brute-force ranking (q41 on the same fixture),
  * ADC score sanity, and bit-stability across runs.
  */
class PqKnnSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Seq[Row] =
    SparkEntry.queries(name)(spark, dir).collect().toSeq

  test("q95 output shape: 5 ascending-ADC neighbors per query") {
    val out = rows("q95_pq_knn")
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.size == 10 && byQ.values.forall(_.size == 5))
    byQ.values.foreach { g =>
      val adcs = g.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(adcs == adcs.sorted, "ADC must be non-decreasing in rank")
      assert(adcs.forall(_ >= 0.0), "squared-distance estimates are non-negative")
    }
  }

  test("q95 recall: 32-bit codes still find real neighbors on the worst-case fixture") {
    val exact = rows("q41_knn_brute") // top-10 exact cosine per query
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val hits = rows("q95_pq_knn").count(r => exact(r.getLong(0)).contains(r.getLong(2)))
    // measured 12/50 on this fixture (random vectors = no cluster structure,
    // PQ's worst case); the floor guards against a silent codebook collapse,
    // not against fixture noise
    assert(hits >= 5, s"PQ top-5 overlapped exact top-10 only $hits/50 times")
  }

  test("q95 is deterministic across runs") {
    assert(rows("q95_pq_knn") == rows("q95_pq_knn"))
  }

  test("q98 IVF-PQ: per-query ascending residual-ADC, candidates from the probed cell only") {
    val out = rows("q98_ivf_pq")
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.size == 10, "every query probes a non-empty own cell")
    byQ.values.foreach { g =>
      val adcs = g.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(adcs == adcs.sorted && adcs.forall(_ >= 0.0))
    }
    // composition sanity: the IVF cell restriction means q98's candidate
    // pool is a subset of the corpus — it must never return the query
    assert(out.forall(r => r.getLong(0) != r.getLong(2)))
    assert(rows("q98_ivf_pq") == rows("q98_ivf_pq"), "deterministic across runs")
  }
}
