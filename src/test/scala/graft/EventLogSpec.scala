package graft

import java.sql.Timestamp

import graft.model.EventRow
import graft.sources.{EventLog, ScanOptions}

/** The reference's store laws over the parquet log
  * (reference: src/persistence.ts:14-93; SURVEY.md §2.1-§2.3).
  */
class EventLogSpec extends SparkSpec {

  private def row(id: String, tpe: String, topic: String, ms: Long) =
    EventRow(id, tpe, topic, new Timestamp(ms), "1.0", "{}", Map.empty)

  private def seeded(): EventLog = {
    val log = new EventLog(spark, tmpDir("log"))
    log.appendRows(Seq(
      row("e1", "click", "web", 1000),
      row("e2", "view", "web", 2000),
      row("e3", "click", "web", 3000),
      row("e4", "click", "app", 1500),
      row("e5", "purchase", "web", 4000)))
    log
  }

  test("getEvents: topic pruning + ts-range + type filter + order + limit (persistence.ts:37-68)") {
    val log = seeded()
    val all = log.getEventsTyped("web").collect()
    assert(all.map(_.id).toSeq == Seq("e1", "e2", "e3", "e5")) // ts asc, app excluded
    val ranged = log.getEventsTyped("web",
      ScanOptions(fromTimestamp = Some(2000), toTimestamp = Some(3000))).collect()
    assert(ranged.map(_.id).toSeq == Seq("e2", "e3")) // inclusive bounds (F1)
    val typed = log.getEventsTyped("web",
      ScanOptions(eventTypes = Seq("click"))).collect()
    assert(typed.map(_.id).toSeq == Seq("e1", "e3"))
    val limited = log.getEventsTyped("web", ScanOptions(limit = Some(2))).collect()
    assert(limited.map(_.id).toSeq == Seq("e1", "e2")) // limit AFTER sort = top-k
  }

  test("hasEvents short-circuits (sourcing.ts:227-231)") {
    val log = seeded()
    assert(log.hasEvents("web"))
    assert(!log.hasEvents("missing-topic"))
  }

  test("deleteEvents removes strictly-older rows of ONE topic, returns count (persistence.ts:74-93)") {
    val log = seeded()
    val deleted = log.deleteEvents("web", olderThanMillis = 3000)
    assert(deleted == 2) // e1, e2; e3 at the cutoff survives (ts >= cutoff kept)
    assert(log.getEventsTyped("web").collect().map(_.id).toSeq == Seq("e3", "e5"))
    assert(log.getEventsTyped("app").collect().map(_.id).toSeq == Seq("e4")) // untouched
  }

  test("scan plan: topic partition pruning + type filter pushed to parquet (SURVEY.md §4.1)") {
    val log = seeded()
    val plan = log.getEvents("web",
        graft.sources.ScanOptions(eventTypes = Seq("click"), fromTimestamp = Some(1000)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("topic"),
      s"expected topic partition pruning in:\n$plan")
    // single-element isin plans as EqualTo; the rendered filter list may be
    // width-truncated, so assert on the DataFilters spelling
    assert(plan.contains("PushedFilters") && plan.contains("(type#"),
      s"expected pushed type filter in:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(timestamp"),
      s"expected pushed timestamp range in:\n$plan")
  }

  test("enforceMaxEvents keeps the newest N (T9 honest extension, topic.ts:33 dead option)") {
    val log = seeded()
    val deleted = log.enforceMaxEvents("web", maxEvents = 2)
    assert(deleted == 2) // 4 web events → keep newest 2 (e3, e5)
    assert(log.getEventsTyped("web").collect().map(_.id).toSeq == Seq("e3", "e5"))
    assert(log.getEventsTyped("app").collect().map(_.id).toSeq == Seq("e4")) // untouched
    assert(log.enforceMaxEvents("web", 10) == 0L) // under the cap: no-op
  }

  test("compact merges per-append small files without changing contents") {
    val log = new EventLog(spark, tmpDir("log"))
    // five separate appends = five (or more) files in the topic partition
    (1 to 5).foreach(i => log.appendRows(Seq(row(s"e$i", "click", "web", i * 1000L))))
    val before = log.getEventsTyped("web").collect().map(_.id).toSeq
    val delta = log.compact("web")
    assert(delta > 0) // fewer files than before
    assert(log.getEventsTyped("web").collect().map(_.id).toSeq == before)
    log.appendRows(Seq(row("e9", "view", "web", 9000)))
    assert(log.getEventsTyped("web").collect().map(_.id).last == "e9")
  }

  test("CompactionAdvisor turns the layout report into executable advice") {
    import graft.operators.CompactionAdvisor
    val log = new EventLog(spark, tmpDir("log"))
    // fragmented topic: five appends = five+ small files; healthy topic: one
    (1 to 5).foreach(i => log.appendRows(Seq(row(s"e$i", "click", "web", i * 1000L))))
    log.appendRows(Seq(row("a1", "view", "app", 1000L)))
    val advice = CompactionAdvisor.advise(log.layoutReport(), maxFiles = 3)
      .collect().map(r => r.getString(0) -> (r.getString(3), r.getLong(4), r.getString(5))).toMap
    val (webAction, webTarget, webReason) = advice("topic=web")
    assert(webAction == "compact" && webTarget == 1L && webReason == "too many files")
    assert(advice("topic=app")._1 == "ok")
    // execute the advice; the next run reports the partition healthy
    log.compact("web", targetFiles = webTarget.toInt)
    val after = CompactionAdvisor.advise(log.layoutReport(), maxFiles = 3)
      .where(org.apache.spark.sql.functions.col("partition") === "topic=web")
      .collect().head
    assert(after.getString(3) == "ok" && after.getString(5) == "healthy")
  }

  test("compactClustered z-sorts files so time-window scans prune on stats") {
    import org.apache.spark.sql.functions.{col, max => smax, min => smin}
    val mkLog = () => new EventLog(spark, tmpDir("log"))
    // 400 events, 4 types, timestamps interleaved ACROSS appends so a plain
    // compaction leaves every file spanning the full time range
    // ts bin = k·173 mod 400 (a multiplicative shuffle): ANY contiguous
    // slice of ids — an append, or a part-file slice within one — spans
    // nearly the whole time range, so no accidental time-locality survives
    def fill(log: EventLog): Unit = (0 until 8).foreach { a =>
      log.appendRows((0 until 50).map { i =>
        val k = a + i * 8
        row(s"e$k", s"type${k % 4}", "web", 1000L + (k * 173 % 400) * 97L)
      })
    }
    def fileSpans(log: EventLog): Seq[(Long, Long)] = {
      val dir = new java.io.File(log.path, "topic=web")
      dir.listFiles().filter(_.getName.startsWith("part-")).toSeq.map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(smin(col("timestamp")), smax(col("timestamp"))).head()
        (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime)
      }
    }
    val plain = mkLog(); fill(plain); plain.compact("web", targetFiles = 4)
    val zed = mkLog(); fill(zed)
    val before = zed.getEventsTyped("web").collect().map(_.id).sorted.toSeq
    zed.compactClustered("web", targetFiles = 4, clusterBy = Seq("timestamp", "type"))
    // contents preserved exactly
    assert(zed.getEventsTyped("web").collect().map(_.id).sorted.toSeq == before)
    // a 10%-of-range window at the start: every plain file straddles it
    // (append order interleaved timestamps), but z-clustered files carry
    // bounded time rectangles, so stats alone skip at least one file
    val (lo, hi) = (1000L, 1000L + 399 * 97L)
    val window = (lo, lo + (hi - lo) / 10)
    def overlapping(spans: Seq[(Long, Long)]) =
      spans.count { case (mn, mx) => mx >= window._1 && mn <= window._2 }
    val pSpans = fileSpans(plain)
    val zSpans = fileSpans(zed)
    assert(pSpans.size == 4 && zSpans.size == 4)
    assert(overlapping(pSpans) == 4, s"plain files should all straddle: $pSpans")
    assert(overlapping(zSpans) < 4, s"z-clustering should bound file time spans: $zSpans")
  }

  test("layoutReport drives compaction: many small files in, one out") {
    val log = new EventLog(spark, tmpDir("log"))
    (1 to 5).foreach(i => log.appendRows(Seq(row(s"e$i", "click", "web", i * 1000L))))
    val before = log.layoutReport().collect()
    val web = before.find(_.getString(0) == "topic=web").get
    assert(web.getLong(1) >= 5, s"five appends should leave >= 5 files, saw ${web.getLong(1)}")
    assert(web.getLong(2) > 0 && web.getLong(3) <= web.getLong(4))
    log.compact("web")
    val after = log.layoutReport().collect().find(_.getString(0) == "topic=web").get
    assert(after.getLong(1) == 1, "compaction collapses the partition to one file")
  }

  test("vacuum removes crashed staging dirs, keeps committed data") {
    val log = seeded()
    // simulate a rewrite that died before its commit rename
    val orphan = new java.io.File(log.path, ".staging_topic=web")
    assert(orphan.mkdirs())
    new java.io.File(orphan, "part-00000.parquet").createNewFile()
    assert(log.vacuum() == 1)
    assert(!orphan.exists())
    assert(log.vacuum() == 0) // idempotent
    assert(log.getEventsTyped("web").collect().length == 4) // data intact
  }

  test("append after delete keeps the log usable") {
    val log = seeded()
    log.deleteEvents("web", 5000) // delete all web
    assert(!log.hasEvents("web"))
    log.appendRows(Seq(row("e6", "click", "web", 6000)))
    assert(log.getEventsTyped("web").collect().map(_.id).toSeq == Seq("e6"))
  }

  test("retention/compaction hit escaped partition dirs (aggregate.<type>.<id> topics)") {
    // Event-sourcing topics are user-controlled and may contain characters
    // Spark Hive-escapes in partition paths; a raw "topic=$topic" dir name
    // would silently rewrite the WRONG directory.
    val log = new EventLog(spark, tmpDir("log"))
    val topic = "aggregate.user:group=7%x"
    log.appendRows(Seq(
      row("e1", "created", topic, 1000),
      row("e2", "updated", topic, 2000),
      row("e3", "updated", topic, 3000)))
    assert(log.deleteEvents(topic, olderThanMillis = 2500) == 2L)
    assert(log.getEventsTyped(topic).collect().map(_.id).toSeq == Seq("e3"))
    assert(log.compact(topic) >= 0L)
    assert(log.getEventsTyped(topic).collect().map(_.id).toSeq == Seq("e3"))
  }

  test("deleteEvents with Long.MaxValue cutoff deletes everything (explicit delete-all)") {
    val log = seeded()
    assert(log.deleteEvents("web", Long.MaxValue) == 4L)
    assert(!log.hasEvents("web"))
    assert(log.hasEvents("app")) // other topics untouched
  }
}
