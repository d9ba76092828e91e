package graft.streaming

import java.sql.{Connection, SQLException}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}

import graft.sources.ConnectionPool

/** Exactly-once streaming delivery into a RELATIONAL store — the JDBC twin
  * of [[IdempotentParquetSink]], for the rows a file ledger can't protect.
  *
  * `foreachBatch` is at-least-once: after a crash between sink write and
  * checkpoint commit, recovery re-runs the last batch with the same
  * batchId. The parquet sink absorbs that with an atomic directory
  * rename; a database gives us something better — a transaction:
  *
  *   1. executors APPEND the batch to a staging table tagged with
  *      `batch_id` (the scale path: per-task parallel JDBC inserts, the
  *      target table untouched);
  *   2. the driver runs ONE transaction: move the staged batch into the
  *      target, record `batch_id` in a ledger table, clear the staging
  *      rows — commit.
  *
  * The ledger insert and the data move commit or roll back TOGETHER, so
  * every crash window replays cleanly: died before the transaction →
  * ledger empty, stale staging rows are deleted by batch_id and re-staged;
  * died inside it → rolled back, same path; died after commit but before
  * the checkpoint write → replay finds the batch in the ledger and skips.
  * No window lands a row twice. (Upsert-by-key — the DLQ's approach,
  * [[graft.dlq.JdbcDeadLetterQueue]] — gets the same effect only when
  * rows HAVE a natural key; this sink needs none.)
  *
  * Single-writer by construction: Structured Streaming serializes
  * foreachBatch calls per query, and the recovery semantics above assume
  * one query owns one sink table (Spark's own contract for sinks).
  *
  * Works on any dialect with transactions + DELETE..WHERE (tested on
  * embedded Derby, same DDL subset as [[graft.sources.JdbcEventStore]]).
  */
final class JdbcExactlyOnceSink(
    url: String,
    table: String,
    columns: Seq[(String, String)],
    user: Option[(String, String)] = None) extends AutoCloseable {

  private val staging = s"${table}_stage"
  private val ledger = s"${table}_ledger"

  private def connProps: Properties = {
    val p = new Properties()
    user.foreach { case (u, pw) => p.setProperty("user", u); p.setProperty("password", pw) }
    p
  }

  private val pool = new ConnectionPool(url, connProps)
  private def withConn[T](f: Connection => T): T = pool.withConnection(f)

  private def colList = columns.map { case (n, _) => s""""$n"""" }.mkString(", ")

  /** Create target, staging (+`batch_id`), and ledger tables; duplicate
    * DDL is tolerated like JdbcEventStore.initialize.
    */
  def initialize(): this.type = {
    def tolerant(c: Connection)(ddl: String): Unit =
      try { c.createStatement().executeUpdate(ddl); () }
      catch {
        case e: SQLException
            if e.getSQLState == "X0Y32" || Option(e.getMessage).exists(_.contains("already exists")) => ()
      }
    val colDDL = columns.map { case (n, t) => s""""$n" $t""" }.mkString(",\n  ")
    withConn { c =>
      tolerant(c)(s"CREATE TABLE $table (\n  $colDDL\n)")
      tolerant(c)(s"""CREATE TABLE $staging (\n  $colDDL,\n  "batch_id" BIGINT NOT NULL,\n  "row_tag" BIGINT NOT NULL\n)""")
      tolerant(c)(s"""CREATE INDEX ${staging}_bid_idx ON $staging ("batch_id")""")
      tolerant(c)(
        s"""CREATE TABLE $ledger (
           |  "batch_id" BIGINT NOT NULL PRIMARY KEY,
           |  "n_rows" BIGINT NOT NULL,
           |  "committed_at" BIGINT NOT NULL
           |)""".stripMargin)
    }
    this
  }

  private def isCommitted(batchId: Long): Boolean = withConn { c =>
    val ps = c.prepareStatement(s"""SELECT 1 FROM $ledger WHERE "batch_id" = ?""")
    ps.setLong(1, batchId)
    val rs = ps.executeQuery()
    try rs.next() finally rs.close()
  }

  private def clearStaging(batchId: Long): Unit = withConn { c =>
    val ps = c.prepareStatement(s"""DELETE FROM $staging WHERE "batch_id" = ?""")
    ps.setLong(1, batchId)
    ps.executeUpdate()
    ()
  }

  /** The atomic commit point: move + ledger + staging cleanup, one
    * transaction.
    */
  private[graft] def commitBatch(batchId: Long): Unit = withConn { c =>
    val auto = c.getAutoCommit
    c.setAutoCommit(false)
    try {
      // DISTINCT over (row_tag, data): Spark's JDBC writer commits per
      // task partition, so a task retry or speculative duplicate that
      // re-commits its partition leaves the same rows staged twice under
      // identical row_tags (monotonically_increasing_id is a pure
      // function of partition id and row position). The dedupe closes
      // that at-least-once window inside the commit transaction. Caveat
      // this cannot lift: the tag is only stable when each partition's
      // content and order are deterministic for the batch — true for
      // Structured Streaming's replayed sources, not for a
      // nondeterministic upstream transform.
      val mv = c.prepareStatement(
        s"""INSERT INTO $table ($colList)
           |SELECT $colList FROM
           |  (SELECT DISTINCT "row_tag", $colList FROM $staging WHERE "batch_id" = ?) t""".stripMargin)
      mv.setLong(1, batchId)
      val n = mv.executeUpdate()
      val lg = c.prepareStatement(
        s"""INSERT INTO $ledger ("batch_id", "n_rows", "committed_at") VALUES (?, ?, ?)""")
      lg.setLong(1, batchId)
      lg.setLong(2, n.toLong)
      lg.setLong(3, System.currentTimeMillis())
      lg.executeUpdate()
      val cl = c.prepareStatement(s"""DELETE FROM $staging WHERE "batch_id" = ?""")
      cl.setLong(1, batchId)
      cl.executeUpdate()
      c.commit()
    } catch {
      case e: Throwable => c.rollback(); throw e
    } finally c.setAutoCommit(auto)
  }

  /** The `foreachBatch` function. The frame's columns must match the
    * declared `columns` (names and JDBC-compatible types).
    */
  def writer: (Dataset[Row], Long) => Unit = { (df, batchId) =>
    if (!isCommitted(batchId)) {
      clearStaging(batchId) // a crashed attempt's partial stage
      stage(df, batchId)
      commitBatch(batchId)
    }
  }

  /** Stage the batch (executor-parallel JDBC appends). `row_tag` =
    * monotonically_increasing_id(): partitionId in the high bits, row
    * position in the low — the identity the commit's DISTINCT dedupes on
    * when a task retry stages a partition twice. Package-visible so the
    * spec can model exactly that double-stage.
    */
  private[graft] def stage(df: Dataset[Row], batchId: Long): Unit =
    df.selectExpr(columns.map { case (n, _) => s"`$n`" } :+
        s"CAST($batchId AS BIGINT) AS batch_id" :+
        "monotonically_increasing_id() AS row_tag": _*)
      .write.mode(SaveMode.Append)
      .format("jdbc")
      .option("url", url)
      .option("dbtable", staging)
      .options(user.map { case (u, _) => "user" -> u }.toMap)
      .options(user.map { case (_, p) => "password" -> p }.toMap)
      .save()

  /** The committed target table (raw relational shape). */
  def committed(spark: SparkSession): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(user.map { case (u, _) => "user" -> u }.toMap)
      .options(user.map { case (_, p) => "password" -> p }.toMap)
      .load()

  /** The ledger (one row per committed batch). */
  def ledgerDF(spark: SparkSession): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", ledger)
      .options(user.map { case (u, _) => "user" -> u }.toMap)
      .options(user.map { case (_, p) => "password" -> p }.toMap)
      .load()

  override def close(): Unit = pool.close()
}
