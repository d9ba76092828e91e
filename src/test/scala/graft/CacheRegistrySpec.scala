package graft

import graft.operators.CacheRegistry

/** Pins the cache-lifecycle contract: the dedup/similarity pipelines hand
  * every `.cache()` to [[CacheRegistry]], and a batch-boundary releaseAll
  * returns the session to its pre-run storage footprint — a long-lived
  * session invoking the pipelines over changing inputs must not accrete
  * storage-memory entries.
  */
class CacheRegistrySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("dedup pipeline caches are tracked and released — no accretion across invocations") {
    CacheRegistry.releaseAll() // clean slate regardless of suite order
    def persisted: Int = spark.sparkContext.getPersistentRDDs.size
    // Earlier suites release with unpersist(blocking = false), so their
    // stragglers may still be DRAINING when this suite samples — the
    // baseline can only shrink. The contract under test is no ACCRETION:
    // after release the footprint is never above the (tightening) floor.
    var baseline = persisted
    for (round <- 1 to 3) {
      SparkEntry.queries("q31_minhash_lsh")(spark, dir).count()
      SparkEntry.queries("q33_lsh_jaccard")(spark, dir).count()
      assert(CacheRegistry.size > 0, s"round $round: pipelines should register caches")
      assert(persisted > baseline, s"round $round: caches should be live while tracked")
      CacheRegistry.releaseAll()
      assert(CacheRegistry.size === 0, s"round $round: registry drained")
      val after = persisted
      assert(after <= baseline,
        s"round $round: storage footprint must not accrete past the floor ($after > $baseline)")
      baseline = math.min(baseline, after)
    }
  }

  test("releaseAll on an empty registry is a no-op") {
    CacheRegistry.releaseAll()
    assert(CacheRegistry.size === 0)
    CacheRegistry.releaseAll()
    assert(CacheRegistry.size === 0)
  }
}
