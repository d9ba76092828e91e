package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{tokens, wordShingles}

/** Streaming eval-decontamination gate — q71's batch law at ingest time:
  * a document that shares any word-5-gram with the test split must not
  * land in the training corpus. The 100 TB-streaming shape is a Bloom
  * TWO-PATH split (the BloomPrefilter.antiJoin move, lifted to a stream):
  *
  *   1. [[flag]] (stateless, in-row): each arriving doc computes its gram
  *      hashes and probes the broadcast test-gram Bloom filter. A doc
  *      whose every gram misses is PROVABLY clean (Bloom has no false
  *      negatives) and passes with zero joins and zero state;
  *   2. suspect docs (any gram hit — true contamination + false
  *      positives) are the tiny residue routed to [[settle]]: the exact
  *      gram-level anti-join against the stored test-gram table, run
  *      per micro-batch (foreachBatch) or as a batch sweep.
  *
  * The split is exact end-to-end: clean-path soundness comes from the
  * filter's no-false-negative guarantee, suspect-path exactness from the
  * settle join — StreamingDecontaminationSpec pins both plus equality
  * with the one-shot batch law and batching invariance. Nothing here
  * keeps streaming state: the filter is a broadcast constant (megabytes
  * for billions of grams), the settle is stream-static.
  */
object StreamingDecontamination {

  /** The gram-hash law shared with DocProfiles.grams/testGrams: distinct
    * md5s of word-5-grams.
    */
  def gramHashes(textCol: String): org.apache.spark.sql.Column =
    array_distinct(transform(
      wordShingles(tokens(col(textCol)), 5), g => md5(g.cast("binary"))))

  /** Stateless flagging: adds `ghs` (gram hashes) and `suspect` (any
    * gram might be a test gram). `bloomBytes` is
    * [[graft.operators.BloomPrefilter.build]] over the test-gram table's
    * `gh` column.
    */
  def flag(stream: DataFrame, textCol: String,
      bloomBytes: Array[Byte]): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(stream.sparkSession)
    val flagged = stream.withColumn("ghs", gramHashes(textCol))
    // BloomPrefilter.build returns null for an EMPTY test-gram table; a
    // null filter makes graft_bloom_contains yield null, which would drop
    // docs from BOTH paths (!null and null are each false). An empty test
    // set means every doc is provably clean — say so explicitly.
    if (bloomBytes == null) flagged.withColumn("suspect", lit(false))
    else flagged.withColumn("suspect", exists(col("ghs"),
      gh => call_function("graft_bloom_contains",
        lit(bloomBytes), xxhash64(gh))))
  }

  /** The provably-clean fast path (no false negatives ⇒ no join needed). */
  def certainClean(flagged: DataFrame): DataFrame =
    flagged.where(!col("suspect")).drop("ghs", "suspect")

  /** The suspect residue for exact settlement. */
  def suspects(flagged: DataFrame): DataFrame =
    flagged.where(col("suspect"))

  /** Exact settle of suspects: keep only docs sharing NO gram with the
    * test-gram table (gh column). Batch-side — run in foreachBatch or as
    * a sweep; at scale this join sees only the suspect residue.
    */
  def settle(suspects: DataFrame, testGrams: DataFrame,
      docIdCol: String = "doc_id"): DataFrame = {
    val hit = suspects.select(col(docIdCol), explode(col("ghs")).as("gh"))
      .join(testGrams.select(col("gh")), Seq("gh"), "left_semi")
      .select(col(docIdCol)).distinct()
    suspects.join(hit, Seq(docIdCol), "left_anti").drop("ghs", "suspect")
  }
}
