package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ArtifactStore

/** Stored-artifact lifecycle laws: build-once, load-forever-while-fresh,
  * rewrite-under-same-path invalidates (the TopicBucketPruning sidecar
  * discipline applied to hub tables), sibling groups publish atomically,
  * and a disabled store is a pure passthrough.
  */
class ArtifactStoreSpec extends SparkSpec {

  /** Each test gets unique artifact names (build counters are JVM-global). */
  private def uniq(n: String) = s"$n-${java.util.UUID.randomUUID().toString.take(8)}"

  private def withStore[T](body: String => T): T = {
    val root = tmpDir("artifacts")
    spark.conf.set(ArtifactStore.ConfKey, root)
    try body(root)
    finally spark.conf.unset(ArtifactStore.ConfKey)
  }

  private def writeInput(dir: String, n: Int): Unit =
    spark.range(n).selectExpr("id", "id * 2 as v")
      .coalesce(1).write.mode("overwrite").parquet(dir)

  test("build once, then serve the stored table (no rebuild)") {
    withStore { _ =>
      val in = tmpDir("in") + "/t.parquet"
      writeInput(in, 10)
      val name = uniq("tf")
      def call(): DataFrame = ArtifactStore.table(spark, name, Seq(in)) {
        spark.read.parquet(in).groupBy((col("id") % 3).as("k"))
          .agg(sum(col("v")).as("s"))
      }
      val first = call().collect().map(_.toSeq.toList).toSet
      assert(ArtifactStore.buildCount(name) == 1)
      val second = call().collect().map(_.toSeq.toList).toSet
      assert(ArtifactStore.buildCount(name) == 1, "second call must load, not rebuild")
      assert(first == second)
      // schema (names, order, types) survives the store round-trip
      assert(call().schema.map(f => (f.name, f.dataType)) ==
        Seq(("k", org.apache.spark.sql.types.LongType),
          ("s", org.apache.spark.sql.types.LongType)))
    }
  }

  test("rewrite under the SAME path invalidates: stale artifact never served") {
    withStore { _ =>
      val in = tmpDir("in") + "/t.parquet"
      writeInput(in, 5)
      val name = uniq("stale")
      def call(): Long = ArtifactStore.table(spark, name, Seq(in)) {
        spark.read.parquet(in).agg(count(lit(1)).as("n"))
      }.collect()(0).getLong(0)
      assert(call() == 5L)
      assert(ArtifactStore.buildCount(name) == 1)
      writeInput(in, 7) // same path, new content → new (mtime, len) identity
      assert(call() == 7L, "rewritten input must be re-derived, not served stale")
      assert(ArtifactStore.buildCount(name) == 2)
      assert(call() == 7L) // and the REBUILT artifact is then served
      assert(ArtifactStore.buildCount(name) == 2)
    }
  }

  test("changed build params invalidate (same inputs)") {
    withStore { _ =>
      val in = tmpDir("in") + "/t.parquet"
      writeInput(in, 5)
      val name = uniq("params")
      def call(k: Int): Long = ArtifactStore.table(spark, name, Seq(in), s"k=$k") {
        spark.read.parquet(in).where(col("id") < k).agg(count(lit(1)).as("n"))
      }.collect()(0).getLong(0)
      assert(call(3) == 3L)
      assert(call(4) == 4L, "params ride the fingerprint")
      assert(ArtifactStore.buildCount(name) == 2)
    }
  }

  test("sibling group: a missing sibling rebuilds the WHOLE group") {
    withStore { root =>
      val in = tmpDir("in") + "/t.parquet"
      writeInput(in, 6)
      val nA = uniq("cells"); val nB = uniq("cent")
      def call(): Seq[DataFrame] = ArtifactStore.tables(spark, Seq(nA, nB), Seq(in)) {
        val base = spark.read.parquet(in)
        Seq(base.select(col("id")), base.agg(max(col("v")).as("m")))
      }
      call().foreach(_.collect())
      assert(ArtifactStore.buildCount(nA) == 1 && ArtifactStore.buildCount(nB) == 1)
      // delete one sibling's directory out from under the store
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sessionState.newHadoopConf())
      val victims = fs.globStatus(new org.apache.hadoop.fs.Path(s"$root/*/$nB"))
      assert(victims.nonEmpty)
      victims.foreach(v => fs.delete(v.getPath, true))
      val Seq(a2, b2) = call()
      assert(a2.count() == 6 && b2.collect()(0).getLong(0) == 10L)
      assert(ArtifactStore.buildCount(nA) == 2 && ArtifactStore.buildCount(nB) == 2,
        "siblings must never mix builds — partial store rebuilds the group")
    }
  }

  test("empty table round-trips (schema pinned by sidecar, not inference)") {
    withStore { _ =>
      val in = tmpDir("in") + "/t.parquet"
      writeInput(in, 4)
      val name = uniq("empty")
      def call(): DataFrame = ArtifactStore.table(spark, name, Seq(in)) {
        spark.read.parquet(in).where(col("id") < 0)
          .select(col("id"), col("v").cast("decimal(18,2)").as("d"))
      }
      assert(call().count() == 0)
      val served = call()
      assert(ArtifactStore.buildCount(name) == 1)
      assert(served.schema.toDDL.contains("DECIMAL(18,2)"))
      assert(served.count() == 0)
    }
  }

  test("disabled store (conf unset) is a pure passthrough: builds every call") {
    val in = tmpDir("in") + "/t.parquet"
    writeInput(in, 3)
    val name = uniq("off")
    def call(): Long = ArtifactStore.table(spark, name, Seq(in)) {
      spark.read.parquet(in).agg(count(lit(1)).as("n"))
    }.collect()(0).getLong(0)
    assert(call() == 3L && call() == 3L)
    assert(ArtifactStore.buildCount(name) == 0, "no store root → no publishes")
  }

  test("partitioned input: recursive fingerprint sees files UNDER partition dirs") {
    // the engine's own log layout is partitionBy("topic") — all data
    // files one level down. r10's one-level fingerprint saw ZERO data
    // files there (a rewritten partition silently served the stale
    // artifact); the recursive fingerprint must invalidate.
    withStore { root =>
      val in = tmpDir("in") + "/events"
      spark.range(10)
        .selectExpr("id", "id * 2 as v",
          "CASE WHEN id % 2 = 1 THEN 'p1' ELSE 'p0' END as part")
        .write.partitionBy("part").mode("overwrite").parquet(in)
      val name = uniq("partd")
      def call(): Long = ArtifactStore.table(spark, name, Seq(in)) {
        spark.read.parquet(in).agg(sum(col("v")).as("s"))
      }.collect()(0).getLong(0)
      assert(call() == 90L)
      assert(ArtifactStore.buildCount(name) == 1)
      assert(call() == 90L && ArtifactStore.buildCount(name) == 1,
        "unchanged partitioned input must serve the stored artifact")
      // rewrite ONE partition subdirectory: nothing at the top level
      // changes, only files one level down
      spark.range(10).where("id % 2 = 1").selectExpr("id", "id * 100 as v")
        .write.mode("overwrite").parquet(s"$in/part=p1")
      assert(call() == 40L + 2500L,
        "a rewritten partition must be re-derived, not served stale")
      assert(ArtifactStore.buildCount(name) == 2)
      // the swap left no debris at the published tier
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sessionState.newHadoopConf())
      assert(fs.globStatus(new org.apache.hadoop.fs.Path(s"$root/*/*.tmp-*")).isEmpty)
      assert(fs.globStatus(new org.apache.hadoop.fs.Path(s"$root/*/*.old-*")).isEmpty)
    }
  }

  test("vacuum: mid-write crash debris is age-gated then swept; live artifact kept") {
    withStore { root =>
      val in = tmpDir("in") + "/t.parquet"
      writeInput(in, 5)
      val name = uniq("vac")
      def call(): Long = ArtifactStore.table(spark, name, Seq(in)) {
        spark.read.parquet(in).agg(count(lit(1)).as("n"))
      }.collect()(0).getLong(0)
      assert(call() == 5L)
      // a writer that died mid-df.write: part file present, no sidecar
      val grp = new java.io.File(root).listFiles().filter(_.isDirectory).head
      val tmp = new java.io.File(grp, s"$name.tmp-123-dead")
      tmp.mkdirs()
      java.nio.file.Files.writeString(tmp.toPath.resolve("part-0.parquet"), "x")
      val gated = ArtifactStore.vacuum(spark, root) // default 1h age gate
      assert(gated.exists(e => e.kind == "tmp" && e.action == "kept"),
        "a FRESH tmp dir may belong to a live writer — age-gated, not swept")
      assert(tmp.exists())
      val swept = ArtifactStore.vacuum(spark, root, maxAgeMs = 0L)
      assert(swept.exists(e => e.kind == "tmp" && e.action == "deleted"))
      assert(!tmp.exists())
      assert(swept.exists(e => e.kind == "live" && e.action == "kept"))
      assert(call() == 5L)
      assert(ArtifactStore.buildCount(name) == 1,
        "vacuum must never touch a live artifact")
    }
  }

  test("vacuum: orphaned (input deleted) and stale (input rewritten) artifacts swept") {
    withStore { root =>
      val inA = tmpDir("in") + "/a.parquet"; writeInput(inA, 3)
      val inB = tmpDir("in") + "/b.parquet"; writeInput(inB, 4)
      val nA = uniq("orph"); val nB = uniq("stal")
      ArtifactStore.table(spark, nA, Seq(inA)) { spark.read.parquet(inA) }.count()
      ArtifactStore.table(spark, nB, Seq(inB)) { spark.read.parquet(inB) }.count()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(inA))
      writeInput(inB, 9) // committed fingerprint no longer matches
      val ledger = ArtifactStore.vacuum(spark, root, maxAgeMs = 0L)
      assert(ledger.exists(e =>
        e.kind == "orphaned" && e.action == "deleted" && e.path.endsWith(nA)))
      assert(ledger.exists(e =>
        e.kind == "stale" && e.action == "deleted" && e.path.endsWith(nB)))
      // stale sweep is an early free, never a correctness event
      val n = ArtifactStore.table(spark, nB, Seq(inB)) {
        spark.read.parquet(inB) }.count()
      assert(n == 9 && ArtifactStore.buildCount(nB) == 2)
    }
  }

  test("vacuum: another build's same-inputs artifact is superseded (age-gated), not stale") {
    // cross-build hazard: an artifact committed by a DIFFERENT engine
    // build fingerprint-mismatches under this build's codeIdentity, but
    // may be live for a concurrently running session of that build (with
    // a scan of it memoized). It must sweep like tmp debris — age-gated —
    // never from under a fresh session. Simulated by hand-planting a
    // sidecar whose full fingerprint is foreign while its inputs-only
    // fingerprint matches the real inputs.
    withStore { root =>
      val in = tmpDir("in") + "/t.parquet"
      writeInput(in, 4)
      val inFp = ArtifactStore.inputsFingerprint(spark, Seq(in), "")
      val grp = new java.io.File(root, "feedface0000"); grp.mkdirs()
      val d = new java.io.File(grp, "otherbuild"); d.mkdirs()
      java.nio.file.Files.writeString(
        d.toPath.resolve(ArtifactStore.MetaFile),
        s"""{"name":"otherbuild","fingerprint":"deadbeef","inputsFp":"$inFp",""" +
          s""""inputs":["$in"],"params":"","schema":"id BIGINT"}""")
      val fresh = ArtifactStore.vacuum(spark, root) // default 1h age gate
      assert(fresh.exists(e => e.kind == "superseded" && e.action == "kept"),
        "a fresh other-build artifact may be live for that build's session")
      assert(d.exists())
      val aged = ArtifactStore.vacuum(spark, root, maxAgeMs = 0L)
      assert(aged.exists(e => e.kind == "superseded" && e.action == "deleted"))
      assert(!d.exists())
    }
  }

  test("vacuum: one unclassifiable entry never aborts the sweep (fault isolation)") {
    // red bar before the fix: `new Path("")` thrown inside the existence
    // check propagated OUT OF vacuum — the call below failed regardless
    // of enumeration order (the lexicographic naming just also pins that
    // the orphan genuinely sits behind the fault on this FS). The bad
    // entry must ledger as error/kept and the orphan must still sweep.
    withStore { root =>
      val grp = new java.io.File(root, "deadbeef0000"); grp.mkdirs()
      def plant(name: String, inputsJson: String): java.io.File = {
        val d = new java.io.File(grp, name); d.mkdirs()
        java.nio.file.Files.writeString(
          d.toPath.resolve(ArtifactStore.MetaFile),
          s"""{"name":"$name","fingerprint":"ff","inputs":$inputsJson,""" +
            """"params":"","schema":"id BIGINT"}""")
        d
      }
      // listStatus order is lexicographic on the local FS: the bad entry
      // sorts FIRST so the orphan genuinely sits behind the fault
      val bad = plant("a_bad", """[""]""") // empty path: Path ctor throws
      val orph = plant("z_orph", """["/nonexistent/graft-vacuum-spec"]""")
      val ledger = ArtifactStore.vacuum(spark, root, maxAgeMs = 0L)
      assert(ledger.exists(e =>
        e.kind == "error" && e.action == "kept" && e.path.endsWith("a_bad")))
      assert(bad.exists(), "an unclassifiable entry is never deleted")
      assert(ledger.exists(e =>
        e.kind == "orphaned" && e.action == "deleted" && e.path.endsWith("z_orph")))
      assert(!orph.exists(), "entries behind the fault must still be swept")
    }
  }

  test("untrusted root (group/other-writable) disables the store, never serves it") {
    val root = tmpDir("artifacts-open")
    java.nio.file.Files.setPosixFilePermissions(java.nio.file.Paths.get(root),
      java.nio.file.attribute.PosixFilePermissions.fromString("rwxrwxrwx"))
    spark.conf.set(ArtifactStore.ConfKey, root)
    try {
      val in = tmpDir("in") + "/t.parquet"
      writeInput(in, 3)
      val name = uniq("trust")
      def call(): Long = ArtifactStore.table(spark, name, Seq(in)) {
        spark.read.parquet(in).agg(count(lit(1)).as("n"))
      }.collect()(0).getLong(0)
      assert(call() == 3L && call() == 3L, "fallback builds in-session, correctly")
      assert(ArtifactStore.buildCount(name) == 0,
        "a root another user can write must never be published to or read from")
      assert(new java.io.File(root).listFiles().isEmpty)
    } finally spark.conf.unset(ArtifactStore.ConfKey)
  }

  test("hub equivalence: stored grams/termFreqs/daily rollup match fresh derivation") {
    // the real integration law behind 'all 249 hashes unchanged': for each
    // migrated hub, derived (store off) and stored (store on, cold + warm)
    // rows are identical. sf0.001 keeps this fast.
    val dir = "/root/testdata/sf0.001"
    def rows(df: DataFrame): Set[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    def hubs(): Seq[(String, DataFrame)] = Seq(
      "termFreqs" -> graft.queries.DocProfiles.termFreqs(spark, dir),
      "grams" -> graft.queries.DocProfiles.grams(spark, dir),
      "daily" -> graft.queries.EventStats.dailyTypeAgg(spark, dir))
    val derived = hubs().map { case (n, df) => n -> rows(df) }
    graft.operators.CacheRegistry.releaseAll()
    withStore { _ =>
      val cold = hubs().map { case (n, df) => n -> rows(df) }
      graft.operators.CacheRegistry.releaseAll()
      val warm = hubs().map { case (n, df) => n -> rows(df) }
      derived.zip(cold).zip(warm).foreach { case (((n, d), (_, c)), (_, w)) =>
        assert(d == c, s"$n: stored(cold) != derived")
        assert(d == w, s"$n: stored(warm) != derived")
      }
    }
    graft.operators.CacheRegistry.releaseAll()
  }
}
