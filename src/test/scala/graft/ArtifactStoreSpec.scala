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
