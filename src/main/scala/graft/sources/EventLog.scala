package graft.sources

import java.net.URI
import java.security.MessageDigest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.model.{Event, EventRow}

/** Options of a log scan — the reference's `getEvents` filter surface
  * (reference: src/persistence.ts:28-69; src/types.ts for EventFilter).
  * Bounds are inclusive; `None` means absent. The reference treats a `0`
  * bound as absent too (JS falsy check, reference: src/persistence.ts:46) —
  * callers encode that by passing None.
  */
final case class ScanOptions(
    fromTimestamp: Option[Long] = None, // epoch millis, inclusive
    toTimestamp: Option[Long] = None,   // epoch millis, inclusive
    eventTypes: Seq[String] = Nil,
    limit: Option[Int] = None
)

/** The append-only event log: one parquet dataset, partitioned for pruning.
  *
  * This single table subsumes the reference's three stores (InMemory / File /
  * Postgres, reference: src/persistence.ts) — they differ only in durability,
  * not semantics (SURVEY.md §7.0). At 100 TB the layout is what matters, and
  * it is chosen by `topicBuckets`:
  *
  *   - `topicBuckets = None` (default): `partitionBy("topic")`. Topic scans
  *     touch one directory — the moral equivalent of the reference's
  *     per-topic Map key / per-topic directory / `WHERE topic` index
  *     (reference: src/persistence.ts:281-288). Right for FEW, FAT topics.
  *   - `topicBuckets = Some(n)`: `partitionBy("topic_bucket")` where the
  *     bucket is a stable hash of the topic mod n; `topic` stays a data
  *     column with parquet min/max stats. Right for MANY topics — the
  *     event-sourcing pattern mints one topic per aggregate
  *     (`aggregate.<type>.<id>`, reference: src/sourcing.ts:272-274), and a
  *     per-topic directory layout would melt down at millions of
  *     aggregates (small files, listing cost, metastore pressure). A topic
  *     scan prunes to 1/n of the data by partition, then row-group stats on
  *     the sorted-ish topic column prune within the bucket.
  *
  * Appends are new files; no compaction logic here (a real deployment would
  * layer Delta/Iceberg for that — out of scope, semantics equal).
  */
final class EventLog(
    spark: SparkSession,
    val path: String,
    val topicBuckets: Option[Int] = None) {
  import spark.implicits._

  def this(spark: SparkSession, path: String) = this(spark, path, None)

  private val BucketCol = "topic_bucket"

  // The bucketed layout carries its own pruning rule: any NON-EventLog way
  // of querying the table (`all` + DataFrame filters, SQL views) relies on
  // [[graft.plans.TopicBucketPruning]] to map `topic = 'x'` literals onto
  // the partition column. Installed once per session, no-op if the session
  // was already built with GraftExtensions.
  if (topicBuckets.isDefined) graft.plans.TopicBucketPruning.install(spark)

  private def fs: FileSystem =
    FileSystem.get(URI.create(path), spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(new Path(path))

  /** Stable topic→bucket hash: first 8 hex chars of md5, mod n. Computed
    * identically driver-side (for scan pruning) and as a Column (for
    * writes) — no dependence on JVM/Spark hash implementations.
    */
  def bucketOf(topic: String): Int =
    topicBuckets.fold(0)(EventLog.bucketOf(topic, _))

  private def bucketColumn(topic: Column): Column = {
    val n = topicBuckets.get
    pmod(conv(substring(md5(topic.cast("binary")), 1, 8), 16, 10).cast("long"), lit(n))
      .cast("int")
  }

  /** Append events. Store-then-forward ordering (reference: src/topic.ts:112-115)
    * is structural here: the log IS the delivery source, so anything a
    * subscription sees has already been persisted.
    *
    * Synchronized per log instance: concurrent write jobs into one parquet
    * path share the committer's `_temporary` directory, so two overlapping
    * appends from one driver can clobber each other's staging files. The
    * reference has the same serialization implicitly (single JS event
    * loop); here the lock only covers job submission+commit of the small
    * driver-built batches, not query execution.
    */
  def append(events: Dataset[EventRow]): Unit = this.synchronized {
    topicBuckets match {
      case None =>
        events.write.mode(SaveMode.Append).partitionBy("topic").parquet(path)
      case Some(_) =>
        events.toDF()
          .withColumn(BucketCol, bucketColumn(col("topic")))
          .write.mode(SaveMode.Append).partitionBy(BucketCol).parquet(path)
        writeMetaIfAbsent()
    }
  }

  /** Sidecar metadata so the bucket count travels WITH the table: readers
    * that never constructed an EventLog (SQL views, other sessions) still
    * get partition pruning via [[graft.plans.TopicBucketPruning]], which
    * reads this file. Underscore prefix keeps it invisible to parquet
    * directory listings (the `_SUCCESS` convention).
    */
  private def writeMetaIfAbsent(): Unit = topicBuckets.foreach { n =>
    val meta = new Path(path, graft.plans.TopicBucketPruning.MetaFile)
    if (!fs.exists(meta)) {
      val out = fs.create(meta, true)
      try out.write(s"""{"version":1,"topicBuckets":$n}""".getBytes("UTF-8"))
      finally out.close()
    }
  }

  def appendDF(events: DataFrame): Unit =
    append(events.as[EventRow])

  /** Driver-side batch append (the pub/sub hot path publishes small batches
    * built on the driver; one log append per batch).
    */
  def appendRows(events: Seq[EventRow]): Unit =
    append(spark.createDataset(events))

  private def readSchema = topicBuckets match {
    case None => Event.schema
    case Some(_) => Event.schema.add(BucketCol, IntegerType, nullable = true)
  }

  private def allRaw: DataFrame = spark.read.schema(readSchema).parquet(path)

  /** Whole-log view (bucket column, if any, hidden — the public shape is
    * always the §1.2 envelope). Explicit schema: pinning it keeps partition
    * columns typed predictably.
    */
  def all: DataFrame = topicBuckets match {
    case None => allRaw
    case Some(_) => allRaw.drop(BucketCol)
  }

  /** One topic's rows with the layout-appropriate pruning predicate. */
  private def topicDF(topic: String): DataFrame = topicBuckets match {
    case None => allRaw.where($"topic" === topic)
    case Some(_) =>
      allRaw.where(col(BucketCol) === bucketOf(topic) && $"topic" === topic)
        .drop(BucketCol)
  }

  /** The reference's scan: filter(F1 ts-range, F2 type-set) → sort by
    * timestamp ASC (O1) → limit (O3) (reference: src/persistence.ts:37-68).
    * Equal-timestamp order is unspecified in the reference; we pin
    * (timestamp, id) so results are deterministic under shuffle.
    * Catalyst turns sort+limit into TakeOrderedAndProject (true top-k, no
    * global sort) and pushes every predicate to the parquet scan.
    */
  def getEvents(topic: String, opts: ScanOptions = ScanOptions()): DataFrame = {
    var df = topicDF(topic)
    opts.fromTimestamp.foreach(ms => df = df.where($"timestamp" >= timestampMillis(ms)))
    opts.toTimestamp.foreach(ms => df = df.where($"timestamp" <= timestampMillis(ms)))
    if (opts.eventTypes.nonEmpty) df = df.where($"type".isin(opts.eventTypes: _*))
    df = df.orderBy($"timestamp".asc, $"id".asc)
    opts.limit.fold(df)(df.limit)
  }

  def getEventsTyped(topic: String, opts: ScanOptions = ScanOptions()): Dataset[EventRow] =
    getEvents(topic, opts).as[EventRow]

  /** Any-match (reference: src/sourcing.ts:227-231 — `limit 1` then length
    * check). Spark short-circuits via CollectLimit.
    */
  def hasEvents(topic: String): Boolean =
    !topicDF(topic).limit(1).isEmpty

  /** Retention delete (reference: src/persistence.ts:74-93): drop events with
    * `timestamp < cutoff` in one topic, return the deleted count
    * (initialCount − remaining, reference: src/persistence.ts:83-91).
    *
    * Implemented as a partition rewrite: only the affected partition
    * directory (the topic's own dir, or its hash bucket) is rewritten —
    * at scale this is a per-partition maintenance job, not a full-table
    * rewrite.
    */
  def deleteEvents(topic: String, olderThanMillis: Long): Long = {
    // Cutoffs beyond the max representable timestamp (callers pass
    // Long.MaxValue for "delete everything") would overflow the epoch→
    // timestamp cast to null; make delete-all explicit instead of relying
    // on three-valued-logic null propagation.
    val isOld: Column =
      if (olderThanMillis > MaxSafeEpochMillis) lit(true)
      else $"timestamp" < timestampMillis(olderThanMillis)
    val (partDirName, partData) = partitionFor(topic)
    val part = partData.cache()
    try {
      val isTopic: Column = topicBuckets.fold(lit(true))(_ => $"topic" === topic)
      val before = part.where(isTopic).count()
      val kept = part.where(!(isTopic && isOld))
      val keptTopicCount = kept.where(isTopic).count()
      val keptCount = kept.count()
      rewritePartition(partDirName, kept, keepAny = keptCount > 0)
      before - keptTopicCount
    } finally part.unpersist()
  }

  /** Count-based retention: keep only the newest `maxEvents` events of a
    * topic (by the pinned (timestamp, id) order), return the deleted count.
    * The reference DECLARES this option but never enforces it
    * (`maxEvents` default 10000, reference: src/topic.ts:33; SURVEY.md §2.9
    * T9 "dead option") — this is the honest implementation, flagged as an
    * extension. Same partition-rewrite job as time-based retention.
    */
  def enforceMaxEvents(topic: String, maxEvents: Int): Long = {
    val (partDirName, partData) = partitionFor(topic)
    val part = partData.cache()
    try {
      val isTopic: Column = topicBuckets.fold(lit(true))(_ => $"topic" === topic)
      val before = part.where(isTopic).count()
      if (before <= maxEvents) return 0L
      // rank newest-first WITHIN each topic of the partition; non-target
      // topics (bucketed layout only) are never dropped (rn filter guarded).
      // Per-topic data carries no topic column, so its rank group is global.
      val grp: Column = topicBuckets.fold(lit("t"): Column)(_ => $"topic")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(grp).orderBy($"timestamp".desc, $"id".desc)
      val kept = part.withColumn("rn", row_number().over(w))
        .where(!isTopic || $"rn" <= maxEvents).drop("rn")
      // deleted = before − kept, both counted off the SAME cached snapshot:
      // `before - maxEvents` would assume the rank filter kept exactly
      // maxEvents rows, which drifts if anything lands between the counts.
      val keptTopic = kept.where(isTopic).count()
      rewritePartition(partDirName, kept, keepAny = true)
      before - keptTopic
    } finally part.unpersist()
  }

  /** Small-file maintenance: rewrite one topic's partition (its own dir, or
    * its hash bucket) into `targetFiles` files. The pub/sub hot path
    * appends a file per publish batch (reference analog: one JSON file per
    * EVENT, reference: src/persistence.ts:143-144) — compaction is the
    * periodic job that keeps scan/listing cost flat. Returns the file-count
    * delta (before − after).
    */
  def compact(topic: String, targetFiles: Int = 1): Long = {
    val (partDirName, partData) = partitionFor(topic)
    val partDir = new Path(path, partDirName)
    if (!fs.exists(partDir)) return 0L
    def fileCount = fs.listStatus(partDir).count(_.getPath.getName.startsWith("part-"))
    val before = fileCount
    val part = partData.cache()
    try {
      val nonEmpty = part.limit(1).count() > 0
      rewritePartition(partDirName, part.coalesce(math.max(targetFiles, 1)),
        keepAny = nonEmpty)
      before - fileCount
    } finally part.unpersist()
  }

  /** Z-ORDERED small-file maintenance: like [[compact]], but clusters the
    * rewritten files on the Morton interleave of up to three columns, so
    * file-level min-max stats prune point/range lookups on ANY clustered
    * dimension — not just the one a linear sort would favor. This is the
    * layout move that keeps a 100 TB log scannable: a (timestamp, type)
    * z-sort gives every file a bounded rectangle of both dimensions, so a
    * "type X in the last hour" scan skips most files on stats alone.
    *
    * Columns are normalized to a 10-bit bin first: numerics/timestamps by
    * min-max range (locality-preserving), strings by md5 hash (equal
    * values cluster; no order semantics to preserve). Bits interleave
    * round-robin; `repartitionByRange` + `sortWithinPartitions` on the
    * z-value makes each output file one contiguous z-range.
    */
  def compactClustered(topic: String, targetFiles: Int, clusterBy: Seq[String]): Long = {
    require(clusterBy.nonEmpty && clusterBy.size <= 3, "cluster by 1-3 columns")
    val (partDirName, partData) = partitionFor(topic)
    val partDir = new Path(path, partDirName)
    if (!fs.exists(partDir)) return 0L
    def fileCount = fs.listStatus(partDir).count(_.getPath.getName.startsWith("part-"))
    val before = fileCount
    val part = partData.cache()
    try {
      if (part.limit(1).count() == 0) {
        rewritePartition(partDirName, part, keepAny = false)
        return before - fileCount
      }
      val numeric = clusterBy.map { c =>
        part.schema(c).dataType match {
          case org.apache.spark.sql.types.StringType =>
            conv(substring(md5(col(c).cast("binary")), 1, 8), 16, 10).cast("double")
          case _ => col(c).cast("double")
        }
      }
      // one pass for the per-column ranges (a maintenance job can afford it)
      val aggs = numeric.zipWithIndex.flatMap { case (e, i) =>
        Seq(min(e).as(s"mn$i"), max(e).as(s"mx$i"))
      }
      val stats = part.agg(aggs.head, aggs.tail: _*).head()
      val bins = numeric.zipWithIndex.map { case (e, i) =>
        // an all-null cluster column has no range: bin it constant-0 (the
        // rewrite degrades to plain compaction on that dimension)
        if (stats.isNullAt(2 * i)) lit(0L)
        else {
          val (mn, mx) = (stats.getDouble(2 * i), stats.getDouble(2 * i + 1))
          val span = math.max(mx - mn, java.lang.Double.MIN_NORMAL)
          least(lit(1023L), floor((coalesce(e, lit(mn)) - mn) / span * 1024).cast("long"))
        }
      }
      val stride = bins.size
      val z = (0 until 10).flatMap { bit =>
        bins.zipWithIndex.map { case (b, i) =>
          shiftleft(shiftright(b, bit).bitwiseAND(lit(1L)), bit * stride + i)
        }
      }.reduce(_ bitwiseOR _)
      val clustered = part.withColumn("__z", z)
        .repartitionByRange(math.max(targetFiles, 1), col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z") // post-sort projection is narrow: intra-partition order survives
      rewritePartition(partDirName, clustered, keepAny = true)
      before - fileCount
    } finally part.unpersist()
  }

  /** Remove orphaned `.staging_*` directories left by a crash between a
    * [[rewritePartition]] write and its rename — the rename is the commit
    * point, so anything still under a staging name is uncommitted garbage
    * that would otherwise accrete forever. Returns directories removed.
    * Safe concurrently with reads (staging dirs are dot-prefixed and
    * invisible to parquet listings); do not run concurrently with a
    * retention/compaction job on the same log.
    */
  def vacuum(): Int = {
    val root = new Path(path)
    if (!fs.exists(root)) return 0
    fs.listStatus(root)
      .filter(d => d.isDirectory && d.getPath.getName.startsWith(".staging_"))
      .count(d => fs.delete(d.getPath, true))
  }

  /** Storage layout report: one row per partition directory with file
    * count and byte sizes — the table a compaction scheduler (or a human)
    * reads to decide where [[compact]]/[[compactClustered]] is due. A
    * pure filesystem-metadata listing (no data read); at object-store
    * scale the same listing comes from the store's inventory.
    */
  def layoutReport(): DataFrame = {
    val root = new Path(path)
    val rows: Seq[(String, Long, Long, Long, Long)] =
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).filter(_.isDirectory)
        .filter(d => d.getPath.getName.contains("="))
        .map { d =>
          val files = fs.listStatus(d.getPath).filter(_.getPath.getName.startsWith("part-"))
          val sizes = files.map(_.getLen)
          (d.getPath.getName, files.length.toLong,
            sizes.sum, if (sizes.isEmpty) 0L else sizes.min,
            if (sizes.isEmpty) 0L else sizes.max)
        }.toSeq
    spark.createDataFrame(rows)
      .toDF("partition", "n_files", "total_bytes", "min_file_bytes", "max_file_bytes")
      .orderBy(col("partition"))
  }

  /** (partition dir name, partition data as written on disk — minus the
    * partition column itself).
    *
    * The directory NAME must match what Spark's committer wrote: partition
    * values are Hive-escaped on write (':', '=', '%', … become `%XX`), and
    * event-sourcing topics are user-controlled (`aggregate.<type>.<id>`,
    * reference: src/sourcing.ts:272-274) — raw `"topic=$topic"` would point
    * retention/compaction at a directory append never used.
    */
  private def partitionFor(topic: String): (String, DataFrame) = topicBuckets match {
    case None =>
      val escaped = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(topic)
      (s"topic=$escaped", topicDF(topic).drop("topic"))
    case Some(_) =>
      (s"$BucketCol=${bucketOf(topic)}",
        allRaw.where(col(BucketCol) === bucketOf(topic)).drop(BucketCol))
  }

  /** Replace one partition directory's contents with `df`, via a staging
    * dir (parquet can't overwrite a path it is reading).
    */
  private def rewritePartition(partDirName: String, df: DataFrame, keepAny: Boolean): Unit = {
    val staging = path.stripSuffix("/") +
      s"/.staging_${partDirName.replaceAll("[^A-Za-z0-9._=-]", "_")}"
    df.write.mode(SaveMode.Overwrite).parquet(staging)
    val partDir = new Path(path, partDirName)
    fs.delete(partDir, true)
    if (keepAny) {
      fs.mkdirs(partDir)
      fs.listStatus(new Path(staging)).foreach { st =>
        if (st.getPath.getName.startsWith("part-"))
          fs.rename(st.getPath, new Path(partDir, st.getPath.getName))
      }
    }
    fs.delete(new Path(staging), true)
  }

  private def timestampMillis(ms: Long) =
    (lit(ms) / 1000.0).cast("timestamp")

  /** 9999-12-31T23:59:59.999Z — anything later is treated as "no bound". */
  private val MaxSafeEpochMillis = 253402300799999L
}

object EventLog {
  def apply(spark: SparkSession, path: String): EventLog = new EventLog(spark, path)
  def bucketed(spark: SparkSession, path: String, buckets: Int): EventLog =
    new EventLog(spark, path, Some(buckets))

  /** Stable topic→bucket hash: first 8 hex chars of md5, mod n. The single
    * definition shared by the writer (via the instance method / the
    * equivalent Column expression) and [[graft.plans.TopicBucketPruning]] —
    * pruning is only sound because both sides compute the identical value.
    */
  def bucketOf(topic: String, n: Int): Int = {
    val hex = MessageDigest.getInstance("MD5").digest(topic.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16) % n).toInt
  }
}
