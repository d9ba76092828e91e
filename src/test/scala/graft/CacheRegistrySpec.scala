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
    val baseline = persisted
    for (round <- 1 to 3) {
      SparkEntry.queries("q31_minhash_lsh")(spark, dir).count()
      SparkEntry.queries("q33_lsh_jaccard")(spark, dir).count()
      assert(CacheRegistry.size > 0, s"round $round: pipelines should register caches")
      assert(persisted > baseline, s"round $round: caches should be live while tracked")
      CacheRegistry.releaseAll()
      assert(CacheRegistry.size === 0, s"round $round: registry drained")
      assert(persisted === baseline,
        s"round $round: storage footprint must return to baseline after release")
    }
  }

  test("releaseAll on an empty registry is a no-op") {
    CacheRegistry.releaseAll()
    assert(CacheRegistry.size === 0)
    CacheRegistry.releaseAll()
    assert(CacheRegistry.size === 0)
  }
}
