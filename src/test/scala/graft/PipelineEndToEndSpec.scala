package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.ShardExport
import graft.sources.Tables
import graft.streaming.StreamingCuration

/** The whole training-data pipeline, end to end, with the real fixture:
  * documents LAND as files (three separate arrivals, one a re-publish of
  * earlier bodies), a STREAMING query curates the feed as it lands
  * (quality gate + first-arrival content dedup, state carried across
  * micro-batches), and the curated table is EXPORTED as packed training
  * shards whose manifest is checked against the curated data. Every stage
  * is an already-spec'd component — this spec pins that they compose:
  * stream-curate ∘ ingest ∘ export agrees with the batch laws on the
  * same corpus.
  */
class PipelineEndToEndSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val MinQuality = 0.5

  test("ingest → streaming curation → shard export, batch-law agreement") {
    import spark.implicits._

    // --- arrival: three file drops, the third re-publishing old bodies
    // under fresh ids (the duplicate the stream must collapse)
    val incoming = tmpDir("e2e-incoming")
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source", $"text")
    docs.where($"doc_id" % 3 === 0).write.mode("append").parquet(incoming)
    docs.where($"doc_id" % 3 =!= 0).write.mode("append").parquet(incoming)
    docs.where($"doc_id" % 7 === 0)
      .withColumn("doc_id", $"doc_id" + 1000000L)
      .write.mode("append").parquet(incoming)

    // --- streaming curation into a curated parquet table
    val curatedDir = tmpDir("e2e-curated")
    val ckpt = tmpDir("e2e-ckpt")
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1) // force multi-batch: dedup state must persist
      .parquet(incoming)
    val q = StreamingCuration.curate(stream, "text", MinQuality)
      .writeStream.format("parquet")
      .option("path", curatedDir).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val curated = spark.read.parquet(curatedDir)

    // --- agreement with the batch laws on the same corpus:
    // same quality gate, and exactly one survivor per content hash
    val batchGate = docs
      .withColumn("quality", StreamingCuration.quality($"text"))
      .where($"quality" >= MinQuality)
    val expectedHashes = batchGate
      .select(md5($"text".cast("binary")).as("ck")).distinct()
    val curatedHashes = curated.select(md5($"text".cast("binary")).as("ck"))
    assert(curatedHashes.distinct().count() == curatedHashes.count(),
      "curated table retains duplicate bodies")
    assert(curatedHashes.except(expectedHashes).isEmpty &&
      expectedHashes.except(curatedHashes).isEmpty,
      "curated hash set differs from the batch quality gate")
    // re-published bodies (id+1000000) must have lost to first arrivals
    assert(curated.where($"doc_id" >= 1000000L).isEmpty)

    // --- export: curated corpus to packed shards, manifest vs data
    val shards = tmpDir("e2e-shards")
    val manifest = ShardExport.write(
      curated.withColumn("toks", size(split(trim($"text"), "\\s+"))),
      shards, "doc_id", "toks", binBudget = 512)
    val back = spark.read.parquet(shards)
    assert(back.count() == curated.count(), "export lost documents")
    val manifestToks = manifest.agg(sum($"sum_toks")).head().getLong(0)
    val dataToks = back.agg(sum($"toks")).head().getLong(0)
    assert(manifestToks == dataToks, "manifest token mass drifted from data")
    assert(manifest.where($"fill_ratio" <= 0.0 || $"fill_ratio" > 2.0).isEmpty,
      "implausible shard fill ratio")
  }
}
