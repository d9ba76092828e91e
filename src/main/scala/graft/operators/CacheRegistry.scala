package graft.operators

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset

/** Session-lifetime ledger of every DataFrame the query packs `.cache()` —
  * the explicit lifecycle for caches that must outlive the function that
  * created them.
  *
  * Why it exists: the dedup/similarity pipelines cache small derived tables
  * (shingle sets, banded signatures, fingerprints) that are read by BOTH
  * branches of one query plan AND shared across sibling queries (q31/q33/q36
  * all reuse the shingle-set plan — Spark's cache manager dedupes identical
  * plans to one entry, so re-runs are warm). The functions return LAZY
  * DataFrames, so they cannot unpersist before the caller materializes;
  * without a ledger, a long-lived session invoking these over CHANGING
  * inputs accretes storage-memory entries that nothing ever frees.
  *
  * Contract: pipelines `track(df.cache())` their caches; the session owner
  * calls [[releaseAll]] at a batch boundary (Verify and Bench do, after
  * their query sweeps). Tracking is idempotent-by-plan at the storage
  * layer — double-tracking the same plan costs one extra (cheap) unpersist
  * call, never a duplicate cache entry.
  */
object CacheRegistry {

  private val live = new ConcurrentLinkedQueue[Dataset[_]]()

  /** Register a cached Dataset for later release; returns it unchanged. */
  def track[T <: Dataset[_]](ds: T): T = { live.add(ds); ds }

  /** Number of tracked (not yet released) cache handles. */
  def size: Int = live.size

  /** Unpersist every tracked cache and clear the eager-result memo
    * ([[ResultMemo]] shares this batch boundary). Non-blocking: the
    * entries leave the cache manager immediately; block eviction
    * completes asynchronously.
    */
  def releaseAll(): Unit = {
    var d = live.poll()
    while (d != null) { d.unpersist(blocking = false); d = live.poll() }
    ResultMemo.clear()
    graft.sources.Tables.clearCache()
  }
}
