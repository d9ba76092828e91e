package graft

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{StreamingMetrics, StreamingTopK}

/** The ops ledger observes real streaming queries: row counts, batch
  * counts, state-store size for stateful operators, and termination.
  */
class StreamingMetricsSpec extends SparkSpec {

  test("snapshot reports batches, rows, and state size of a stateful query") {
    import spark.implicits._
    val m = StreamingMetrics.install(spark)
    try {
      val dir = tmpDir("met")
      (0 until 300).map(i => ("g", 1000L + i, s"item${i % 7}"))
        .toDF("g", "ms", "item")
        .selectExpr("g", "timestamp_millis(ms) AS ts", "item")
        .write.mode("append").parquet(dir)

      val q = StreamingTopK.topK(
          spark.readStream.schema("g STRING, ts TIMESTAMP, item STRING").parquet(dir),
          "g", "ts", "item", k = 3, capacity = 64)
        .writeStream.outputMode("update")
        .option("checkpointLocation", tmpDir("met-ck"))
        .queryName("metrics-probe")
        .trigger(Trigger.AvailableNow())
        .format("noop")
        .start()
      q.awaitTermination()
      // listener bus is async; poll briefly for the terminal event
      val deadline = System.nanoTime() + 10e9.toLong
      def probe() = m.snapshot(spark).where($"query" === "metrics-probe")
        .as[(String, Long, Long, Long, Long, Long, Boolean, String)].collect().headOption
      var row = probe()
      while ((row.isEmpty || !row.get._7) && System.nanoTime() < deadline) {
        Thread.sleep(100); row = probe()
      }
      val r = row.getOrElse(fail("query never appeared in the ledger"))
      assert(r._2 >= 1, "at least one batch")
      assert(r._3 == 300L, s"all input rows counted, got ${r._3}")
      assert(r._5 >= 1L, "stateful operator reports state rows")
      assert(r._7 && r._8.isEmpty, "clean termination")
    } finally StreamingMetrics.uninstall(spark, m)
  }
}
