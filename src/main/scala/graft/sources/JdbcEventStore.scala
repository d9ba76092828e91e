package graft.sources

import java.sql.{Connection, SQLException}
import java.util.Properties

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

import graft.model.EventRow

/** Relational event store — the reference's `PostgresEventStore`
  * (reference: src/persistence.ts:240-433) re-expressed through Spark's JDBC
  * data source, so the same store serves BOTH roles the reference gives it:
  *
  *   - the transactional hot path: `saveEvent` is a driver-side
  *     parameterized INSERT per event, exactly the reference's
  *     one-row-per-publish shape (reference: src/persistence.ts:299-322);
  *   - an analytical scan source: `getEventsDF` is a Spark JDBC read whose
  *     topic/timestamp/type predicates push down INTO the database's SQL
  *     (the moral equivalent of the reference's four indexes,
  *     reference: src/persistence.ts:281-288), with optional range-partitioned
  *     parallel reads for bulk scans.
  *
  * Table layout mirrors the reference's DDL (reference:
  * src/persistence.ts:267-279): the envelope flattened to columns, payload
  * and metadata as JSON text (JSONB has no portable JDBC equivalent; the
  * engine's payload column is JSON text everywhere, SURVEY.md §1.2).
  * `timestamp` stays epoch millis BIGINT like the reference — range
  * predicates then push down as plain integer comparisons on an indexed
  * column in any dialect.
  *
  * The 100 TB posture: a relational store is the SMALL, transactional end of
  * the architecture (publish hot path, point lookups); the parquet
  * [[EventLog]] is the big end. `importInto`/`exportFrom` move history
  * between them in one distributed job each way, completing the migration
  * story whose file-store half is [[FileStoreImporter]]. Bulk scans
  * parallelize via JDBC range partitioning (`scanPartitions`) — without it a
  * JDBC read is a single task, which is the correct default for the
  * point-lookup shapes but would serialize a bulk export.
  *
  * Tested against embedded Derby (in Spark's own jar set); the SQL sticks to
  * DDL/DML that Derby and PostgreSQL share. Divergence from the reference:
  * no `created_at` audit column (Derby lacks `TIMESTAMP WITH TIME ZONE`;
  * nothing in the reference reads it back).
  */
final class JdbcEventStore(
    spark: SparkSession,
    url: String,
    table: String = "events",
    user: Option[(String, String)] = None,
    scanPartitions: Option[Int] = None) {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  private def connProps: Properties = {
    val p = new Properties()
    user.foreach { case (u, pw) => p.setProperty("user", u); p.setProperty("password", pw) }
    p
  }

  /** Pooled driver-side connections — the publish hot path (`saveEvent`)
    * must not pay a TCP + auth round trip per event (reference parity:
    * the 10-connection pool at src/persistence.ts:253). Distributed
    * reads/writes bypass this: Spark's JDBC source opens per-task
    * connections on executors.
    */
  private val pool = new ConnectionPool(url, connProps)

  private def withConn[T](f: Connection => T): T = pool.withConnection(f)

  /** Physical connections opened so far (spec observable for reuse). */
  private[graft] def connectionsOpened: Int = pool.openedCount

  /** Release pooled connections (store lifecycle end). */
  def close(): Unit = pool.close()

  /** `CREATE TABLE` + the reference's four indexes; "already exists" is not
    * an error (the reference's `IF NOT EXISTS`, which Derby lacks —
    * SQLState X0Y32 is its duplicate-schema-object code, 42* covers
    * dialects that reject duplicate DDL differently).
    */
  def initialize(): this.type = {
    def tolerant(c: Connection)(ddl: String): Unit =
      try { c.createStatement().executeUpdate(ddl); () }
      catch {
        case e: SQLException
            if e.getSQLState == "X0Y32" || Option(e.getMessage).exists(_.contains("already exists")) => ()
      }
    withConn { c =>
      tolerant(c)(
        s"""CREATE TABLE $table (
           |  "id" VARCHAR(64) NOT NULL PRIMARY KEY,
           |  "type" VARCHAR(256) NOT NULL,
           |  "topic" VARCHAR(512) NOT NULL,
           |  "timestamp" BIGINT NOT NULL,
           |  "schema_version" VARCHAR(32) NOT NULL,
           |  "payload" CLOB NOT NULL,
           |  "metadata" CLOB
           |)""".stripMargin)
      val prefix = table.toLowerCase.replaceAll("[^a-z0-9_]", "_")
      tolerant(c)(s"""CREATE INDEX ${prefix}_topic_idx ON $table ("topic")""")
      tolerant(c)(s"""CREATE INDEX ${prefix}_timestamp_idx ON $table ("timestamp")""")
      tolerant(c)(s"""CREATE INDEX ${prefix}_type_idx ON $table ("type")""")
      tolerant(c)(s"""CREATE INDEX ${prefix}_topic_timestamp_idx ON $table ("topic", "timestamp")""")
    }
    this
  }

  /** Drop the table (re-runnable-fixture hygiene); absent table is fine. */
  def dropTable(): Unit = withConn { c =>
    try { c.createStatement().executeUpdate(s"DROP TABLE $table"); () }
    catch {
      case e: SQLException
          if e.getSQLState == "42Y55" ||
            Option(e.getMessage).exists(m => m.contains("does not exist") || m.contains("not found")) => ()
    }
  }

  /** One-event transactional insert — the publish hot path
    * (reference: src/persistence.ts:299-322). Deliberately NOT a Spark job:
    * a one-row write through the DataFrame API would pay job scheduling for
    * a single INSERT.
    */
  def saveEvent(e: EventRow): Unit = withConn { c =>
    val ps = c.prepareStatement(
      s"""INSERT INTO $table ("id", "type", "topic", "timestamp", "schema_version", "payload", "metadata")
         |VALUES (?, ?, ?, ?, ?, ?, ?)""".stripMargin)
    ps.setString(1, e.id)
    ps.setString(2, e.`type`)
    ps.setString(3, e.topic)
    ps.setLong(4, e.timestamp.getTime)
    ps.setString(5, e.schemaVersion)
    ps.setString(6, e.payload)
    ps.setString(7, mapper.writeValueAsString {
      val n = mapper.createObjectNode()
      e.metadata.foreach { case (k, v) => n.put(k, v) }
      n
    })
    ps.executeUpdate()
    ()
  }

  /** Bulk ingest — the scale path: a whole Dataset lands as one distributed
    * JDBC append (executors write batched inserts in parallel). The table
    * must exist ([[initialize]]) so the column types are OURS — Spark's
    * Derby dialect would otherwise create every string column as CLOB,
    * which Derby refuses to compare in WHERE clauses, killing pushdown.
    */
  def saveEvents(events: Dataset[EventRow]): Unit =
    toFlat(events).write.mode(SaveMode.Append)
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(user.map { case (u, _) => "user" -> u }.toMap)
      .options(user.map { case (_, p) => "password" -> p }.toMap)
      .save()

  /** The store as a DataFrame in the engine's envelope shape — the BULK
    * path, honoring `scanPartitions` (migration/export scans).
    */
  def allDF: DataFrame = fromFlat(rawDF(partitioned = true))

  /** The table in its raw relational shape (timestamp as epoch-millis
    * BIGINT). Predicates applied HERE push into the database's SQL
    * (visible as `PushedFilters` in the scan node) — in particular
    * timestamp ranges, which as plain integer comparisons hit the
    * timestamp index; a filter above the `timestamp_millis` conversion in
    * [[allDF]] is not translatable by the JDBC source and would fetch the
    * whole topic.
    *
    * `partitioned = true` (bulk scans only) splits the read into
    * `scanPartitions` timestamp ranges executed as parallel JDBC queries —
    * which costs an EAGER whole-table MIN/MAX round-trip at plan
    * construction, and derives ranges from the global bounds. Point-lookup
    * shapes ([[getEventsDF]]) therefore always use the single-query
    * reader: a topic slice wants one indexed query, not `n` mostly-empty
    * range scans paid for with a blocking aggregate.
    */
  private def rawDF(partitioned: Boolean): DataFrame = {
    val reader = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(user.map { case (u, _) => "user" -> u }.toMap)
      .options(user.map { case (_, p) => "password" -> p }.toMap)
    val ranged = (if (partitioned) scanPartitions else None).filter(_ > 1).flatMap { n =>
      val bounds = withConn { c =>
        val rs = c.createStatement().executeQuery(
          s"""SELECT MIN("timestamp"), MAX("timestamp") FROM $table""")
        rs.next()
        val lo = rs.getLong(1); val loNull = rs.wasNull()
        val hi = rs.getLong(2); val hiNull = rs.wasNull()
        if (loNull || hiNull) None else Some((lo, hi))
      }
      bounds.map { case (lo, hi) =>
        reader
          .option("partitionColumn", "timestamp")
          .option("lowerBound", lo)
          .option("upperBound", math.max(hi, lo + 1))
          .option("numPartitions", n)
      }
    }
    ranged.getOrElse(reader).load()
  }

  /** Filtered scan, reference `getEvents` semantics
    * (reference: src/persistence.ts:325-404): topic equality, inclusive
    * timestamp bounds, type membership, ts-asc order, optional limit.
    * `(timestamp, id)` ordering pins tie-breaks like the parquet log.
    */
  def getEventsDF(topic: String, options: ScanOptions = ScanOptions()): DataFrame = {
    // All predicates go against the RAW columns (epoch-ms BIGINT bounds
    // included) so every one of them reaches the database's SQL; the
    // envelope conversion happens above the filtered scan.
    var df = rawDF(partitioned = false).where($"topic" === topic)
    options.fromTimestamp.foreach(f => df = df.where($"timestamp" >= f))
    options.toTimestamp.foreach(t => df = df.where($"timestamp" <= t))
    if (options.eventTypes.nonEmpty) df = df.where($"type".isin(options.eventTypes: _*))
    val converted = fromFlat(df).orderBy($"timestamp".asc, $"id".asc)
    options.limit.filter(_ > 0).fold(converted)(converted.limit)
  }

  def getEvents(topic: String, options: ScanOptions = ScanOptions()): Seq[EventRow] =
    getEventsDF(topic, options).as[EventRow].collect().toSeq

  /** Retention delete (reference: src/persistence.ts:407-425): strictly
    * before the cutoff, returns the deleted count. A driver-side DELETE —
    * the database does the work where the index lives.
    */
  def deleteEvents(topic: String, beforeTimestampMillis: Long): Long = withConn { c =>
    val ps = c.prepareStatement(
      s"""DELETE FROM $table WHERE "topic" = ? AND "timestamp" < ?""")
    ps.setString(1, topic)
    ps.setLong(2, beforeTimestampMillis)
    ps.executeUpdate().toLong
  }

  /** Migrate the relational store's history into the parquet log — the
    * JDBC half of the migration story ([[FileStoreImporter]] is the file
    * half). One distributed read → one distributed append.
    */
  def importInto(log: EventLog): Long = {
    // persist so the JDBC table is scanned ONCE — count() then append()
    // would otherwise each issue a full read, and a row landing between
    // them would make the reported count diverge from the imported rows
    val events = allDF.as[EventRow].persist()
    try {
      val n = events.count()
      log.append(events)
      n
    } finally { events.unpersist(blocking = false); () }
  }

  /** Inverse migration: bulk-load events (e.g. a parquet log's contents)
    * into the relational store.
    */
  def exportFrom(events: Dataset[EventRow]): Unit = saveEvents(events)

  /** Envelope ⇄ relational row shape. Timestamps cross as epoch millis
    * (`unix_millis`/`timestamp_millis` — exact, no double rounding);
    * metadata as canonical JSON text both ways, absent ⇒ empty map, so
    * a round-trip is value-identical.
    */
  private def toFlat(events: Dataset[EventRow]): DataFrame =
    events.select(
      $"id", $"type", $"topic",
      unix_millis($"timestamp").as("timestamp"),
      $"schemaVersion".as("schema_version"),
      $"payload",
      to_json($"metadata").as("metadata"))

  private def fromFlat(df: DataFrame): DataFrame =
    df.select(
      col("id"), col("type"), col("topic"),
      timestamp_millis(col("timestamp")).as("timestamp"),
      col("schema_version").as("schemaVersion"),
      col("payload"),
      coalesce(
        from_json(col("metadata"), MapType(StringType, StringType)),
        map().cast(MapType(StringType, StringType))).as("metadata"))
}
