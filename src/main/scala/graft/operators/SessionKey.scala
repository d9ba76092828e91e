package graft.operators

import org.apache.spark.sql.SparkSession

/** A stable unique key for a SparkSession.
  *
  * `System.identityHashCode(session)` is NOT unique: identity hashes are
  * reusable after GC and can collide between live sessions, so a cache
  * keyed by it could hand a DataFrame bound to a stopped (or different)
  * session back to a new one. (`sessionUUID` would be the natural key but
  * is `private[sql]`.) Here each session gets a monotonic id on first use,
  * held in a weak identity map: two live sessions can never share a key,
  * and a GC'd session's id is never reissued.
  */
object SessionKey {
  private val next = new java.util.concurrent.atomic.AtomicLong(0L)
  private val keys = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  def apply(spark: SparkSession): String =
    keys.computeIfAbsent(spark, _ => "session-" + next.incrementAndGet())
}
