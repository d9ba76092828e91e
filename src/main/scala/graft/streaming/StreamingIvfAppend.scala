package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.operators.IvfIncremental

/** Streaming twin of [[graft.operators.IvfIncremental.append]] — the
  * serving-index maintenance loop closed end-to-end: arriving vectors
  * stream in, every micro-batch is assigned under the index's FROZEN
  * stored centroids and appended as its own generation, and the stored
  * staleness ledger tells the operator when the next retrain pays.
  *
  * Why foreachBatch and not a stateful streaming aggregation: frozen-
  * centroid assignment is STATELESS per row (centroids are a broadcast,
  * the verdict depends on nothing else), and the index is an external
  * parquet artifact with append semantics — exactly the foreachBatch
  * contract. Batch composition is lawful by IvfIncrementalSpec's compose
  * law (two batches == their union, assignment-for-assignment), so the
  * micro-batch split cannot change any assignment — only the `gen`
  * column, which records arrival batches by design.
  *
  * At 100 TB: each micro-batch costs one narrow scan of the arrivals ×
  * a k×dim broadcast — no state store, no shuffle of history, no touch
  * of prior generations. Retrain stays a BATCH decision made off the
  * staleness ledger, never inside the stream.
  */
object StreamingIvfAppend {

  /** Drain `arrivals` (a streaming Dataset with columns vec_id, v) into
    * the stored index at `indexDir`, one generation per micro-batch.
    * AvailableNow: processes everything staged, then stops — the same
    * drain discipline as every ingest gate here.
    */
  def run(spark: SparkSession, indexDir: String, arrivals: DataFrame,
      checkpointDir: String): Unit = {
    val q = arrivals.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        // a batch CAN be empty (file-source bookkeeping batches) — an
        // empty append would still bump the generation counter, so skip
        if (!batch.isEmpty) { IvfIncremental.append(spark, indexDir, batch.toDF()); () }
      }
      .start()
    q.awaitTermination()
  }
}
