package graft.sources

import java.sql.{Connection, DriverManager}
import java.util.Properties
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

/** Minimal bounded JDBC connection pool for the driver-side hot paths —
  * the reference keeps a 10-connection pool for exactly this reason
  * (reference: src/persistence.ts:253): a publish is ONE parameterized
  * INSERT, and paying a TCP + auth round trip per event would dominate it.
  *
  * Deliberately tiny (borrow/validate/return, no background reaper): the
  * stores' driver-side operations are short and serialized per caller, so
  * the pool's job is connection REUSE, not concurrency management. The
  * distributed read/write paths don't go through it at all — Spark's JDBC
  * source manages per-task connections on executors.
  *
  * Failure policy: a connection whose operation threw is discarded, not
  * returned (it may hold aborted-transaction or otherwise broken state);
  * the next borrow revalidates idle connections with `isValid` and opens
  * fresh ones as needed, so a database restart heals transparently.
  */
final class ConnectionPool(url: String, props: Properties, maxIdle: Int = 10)
    extends AutoCloseable {

  private val idle = new ConcurrentLinkedQueue[Connection]()
  private val opened = new AtomicInteger(0)
  @volatile private var closed = false

  /** Physical connections opened over the pool's lifetime — the spec's
    * observable for the reuse contract (N operations ≪ N connections).
    */
  def openedCount: Int = opened.get

  def withConnection[T](f: Connection => T): T = {
    if (closed) throw new IllegalStateException("connection pool is closed")
    var c = idle.poll()
    while (c != null && !isUsable(c)) { closeQuietly(c); c = idle.poll() }
    if (c == null) {
      opened.incrementAndGet()
      c = DriverManager.getConnection(url, props)
    }
    val r =
      try f(c)
      catch { case t: Throwable => closeQuietly(c); throw t }
    // a connection borrowed across a concurrent close() must not outlive
    // the pool: re-check the flag before returning it to idle
    if (!closed && idle.size < maxIdle) idle.add(c) else closeQuietly(c)
    // close() may have drained idle between the check and the add; a
    // second drain here makes close-then-return race-safe
    if (closed) { var d = idle.poll(); while (d != null) { closeQuietly(d); d = idle.poll() } }
    r
  }

  private def isUsable(c: Connection): Boolean =
    try !c.isClosed && c.isValid(2)
    catch { case _: Exception => false }

  private def closeQuietly(c: Connection): Unit =
    try c.close() catch { case _: Exception => () }

  /** Terminal: close all idle connections and refuse new borrows. A
    * connection checked out during close() is closed when returned (the
    * post-return re-drain in [[withConnection]]).
    */
  override def close(): Unit = {
    closed = true
    var c = idle.poll()
    while (c != null) { closeQuietly(c); c = idle.poll() }
  }
}
