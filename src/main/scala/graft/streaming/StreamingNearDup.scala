package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFunctions.{keyedMd5, tokens, wordShingles}

/** Streaming MinHash-LSH near-dup gate — the at-ingest twin of the batch
  * q31 candidate generator: flag an arriving document when its LSH band
  * buckets were already claimed by earlier arrivals, BEFORE it lands in
  * the corpus. The batch pipeline (q31→q33→q36) sweeps the corpus after
  * the fact; a 100 TB ingest wants the near-dup verdict on the stream so
  * boilerplate re-crawls never get stored at all. (The reference has no
  * dedup surface; this extends its ingest path the way StreamingDedup
  * extends exact id/content dedup to NEAR-dup.)
  *
  * Same signature law as the batch path ([[signatureRows]] spells
  * DedupQueries' signatures verbatim: distinct word-3-gram shingles,
  * K=8 lexicographic-min keyed md5s, one single-row band each), then a
  * stateful bucket gate:
  *
  *   - state key = (band, minhash); state value = the bucket's FIRST
  *     arrival (the keeper) + its member count — O(1) per bucket, the
  *     smallest state any LSH dedup can carry;
  *   - every later member emits a [[BandHit]] naming the keeper — the
  *     streaming candidate pair (verification against the keeper's
  *     shingles is the downstream q33 step, batch or lookup-side);
  *   - a bucket past `maxBucket` members is saturated — the batch
  *     MaxBand law: an "everything hashes alike" cell carries no dedup
  *     signal — and stops emitting candidates; it cannot retract the
  *     already-emitted hits, but the first suppressed arrival emits one
  *     `saturated = true` marker row, and [[quarantine]] uses it to drop
  *     the whole bucket's hits before the verdict, matching the batch
  *     sweep's retroactive band drop;
  *   - ARRIVAL defines precedence (ties inside a micro-batch break by
  *     doc_id, so replay is deterministic) — where the batch law keeps
  *     min-doc_id. Feed in id order and the two coincide exactly
  *     (StreamingNearDupSpec pins this equivalence window-for-window).
  *
  * [[quarantine]] then applies q31's minMatch=2 verdict: a doc hitting
  * claimed buckets in >= 2 distinct bands is a near-dup candidate. State
  * never times out by default (a dedup index forgets nothing); pass a
  * TTL'd state store policy at deployment if the corpus is windowed.
  */
object StreamingNearDup {

  /** One emitted candidate: `doc_id` collided with `first_doc` (the
    * bucket keeper) in band `band`. `saturated = true` marks the single
    * row emitted when the bucket CROSSES `maxBucket` — not a candidate
    * but a retraction signal: consumers (see [[quarantine]]) drop every
    * hit from a (band, first_doc) bucket so marked, converging the
    * stream's verdicts back onto the batch MaxBand law that drops the
    * whole boilerplate band. (`(band, first_doc)` identifies the bucket:
    * a doc has exactly one minhash per band, so the keeper pins it.)
    */
  final case class BandHit(doc_id: Long, band: Int, first_doc: Long,
      saturated: Boolean = false)

  final case class SigRow(bucket: String, doc_id: Long, band: Int)

  /** Per-bucket O(1) state: the keeper + member count. Public — the state
    * encoder's generated code calls the accessors.
    */
  final case class BucketState(first: Long, n: Int)

  /** Stateless prep — the batch signature law, spelled identically to
    * DedupQueries.signatures: (doc_id, i, mh) single-row bands, docs too
    * short to shingle dropped.
    */
  def signatureRows(docs: DataFrame, docIdCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(docs.sparkSession)
    val sh = array_distinct(wordShingles(tokens(col(textCol)), 3))
    val mins = (0 until k).map(i =>
      array_min(transform(sh, x => keyedMd5(i, x))).as(s"mh_$i"))
    val stackArgs = (0 until k).map(i => s"$i, mh_$i").mkString(", ")
    docs.select(col(docIdCol).cast("long").as("doc_id") +: mins: _*)
      .select(col("doc_id"), expr(s"stack($k, $stackArgs)").as(Seq("i", "mh")))
      .where(col("mh").isNotNull)
  }

  /** The stateful bucket gate over signature rows (doc_id, i, mh). */
  def bandHits(spark: SparkSession, sigs: DataFrame,
      maxBucket: Int = 100): Dataset[BandHit] = {
    import spark.implicits._
    val keyed = sigs
      .select(concat_ws(":", $"i", $"mh").as("bucket"), $"doc_id",
        $"i".cast("int").as("band"))
      .as[SigRow]
    keyed.groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, BandHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, rows, state: GroupState[BucketState]) =>
          var st = state.getOption.getOrElse(BucketState(-1L, 0))
          val out = scala.collection.mutable.Buffer.empty[BandHit]
          // ties within a micro-batch break by doc_id → deterministic replay
          rows.toSeq.sortBy(_.doc_id).foreach { r =>
            if (st.first < 0L) st = BucketState(r.doc_id, 1)
            else {
              if (st.n < maxBucket) out += BandHit(r.doc_id, r.band, st.first)
              // the first suppressed member ALSO emits the bucket's one
              // saturation marker, so downstream folds can retract the
              // pre-saturation hits this Append-mode stream cannot
              else if (st.n == maxBucket)
                out += BandHit(r.doc_id, r.band, st.first, saturated = true)
              st = st.copy(n = st.n + 1)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** q31's minMatch verdict over collected hits: a doc colliding in >=
    * `minMatch` distinct bands is a near-dup candidate (batch fold — run
    * it per micro-batch in foreachBatch, or over the accumulated hit log).
    *
    * Saturation handling: the gate itself cannot retract hits a bucket
    * emitted before crossing `maxBucket` (Append-mode streams are
    * non-retractive), but it emits ONE `saturated = true` marker row at
    * the crossing, and this fold honors it — every hit from a marked
    * (band, first_doc) bucket is excluded before the verdict, which is
    * exactly the batch MaxBand law (a saturated band is boilerplate and
    * carries no dedup signal) applied over the hit log. Hit logs that
    * predate the marker column (or were built by hand without it) are
    * treated as marker-free. The only residual divergence from the batch
    * sweep is a verdict CONSUMED before the marker arrives — that
    * early-read errs toward quarantine (a false positive for the
    * downstream exact-verify step), never toward missing a duplicate.
    */
  def quarantine(hits: DataFrame, minMatch: Int = 2): DataFrame = {
    val flagged =
      if (hits.columns.contains("saturated")) hits
      else hits.withColumn("saturated", lit(false))
    val sat = flagged.where(col("saturated"))
      .select(col("band"), col("first_doc")).distinct()
    flagged.where(!col("saturated"))
      .join(sat, Seq("band", "first_doc"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("band")).as("n_match"),
        min(col("first_doc")).as("min_first_doc"))
      .where(col("n_match") >= minMatch)
  }
}
