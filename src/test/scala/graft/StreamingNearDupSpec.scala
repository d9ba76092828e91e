package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingNearDup

/** Laws of the streaming MinHash-LSH near-dup gate:
  *
  *   1. BATCH EQUIVALENCE — fed in doc_id order, the emitted hit set is
  *      exactly the batch law's: within each (band, minhash) bucket, every
  *      member except the min-doc_id keeper emits against that keeper, up
  *      to the saturation cap (members ranked 2..cap+1);
  *   2. BATCHING INVARIANCE — one micro-batch or three, same hits (state
  *      carries keepers across batches);
  *   3. SOUNDNESS — every emitted (doc, band, keeper): both really share
  *      that band's minhash and the keeper has the smaller id;
  *   4. QUARANTINE — the >=2-band verdict flags exactly the planted
  *      near-dup copies, not the distinct docs;
  *   5. BOUNDED STATE — state rows == distinct buckets, O(1) each.
  */
class StreamingNearDupSpec extends SparkSpec {

  import spark.implicits._

  /** Fixture: distinct docs + near-identical copies (one word appended —
    * most 3-gram shingles shared, so >=2 of the 8 single-row bands agree
    * with overwhelming probability for these sizes).
    */
  private def fixture(): DataFrame = {
    val base = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").where($"doc_id" < 40)
    val dups = base.where($"doc_id" < 10)
      .select(($"doc_id" + 1000L).as("doc_id"),
        concat($"text", lit(" appended")).as("text"))
    base.unionAll(dups)
  }

  private def writeSlices(dir: String, df: DataFrame, slices: Seq[(Long, Long)]): Seq[String] =
    slices.zipWithIndex.map { case ((lo, hi), i) =>
      val d = s"$dir/slice$i"
      df.where($"doc_id" >= lo && $"doc_id" < hi).repartition(1)
        .write.mode("overwrite").parquet(d)
      d
    }

  /** Drain slices sequentially through ONE checkpointed query (each
    * AvailableNow restart = one-or-more micro-batches over the new file).
    */
  private def drain(slices: Seq[String], ckpt: String,
      collectStateRows: Boolean = false): (Set[(Long, Int, Long)], Long) = {
    val out = scala.collection.mutable.Buffer.empty[StreamingNearDup.BandHit]
    var stateRows = 0L
    val stage = tmpDir("snd-stage")
    slices.zipWithIndex.foreach { case (s, i) =>
      // stage slice i as the only new file under one monitored dir
      spark.read.parquet(s).write.mode("append").parquet(stage)
      val src = spark.readStream.schema("doc_id LONG, text STRING").parquet(stage)
      val sigs = StreamingNearDup.signatureRows(src, "doc_id", "text")
      val q = StreamingNearDup.bandHits(spark, sigs)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingNearDup.BandHit], _: Long) =>
          out.synchronized { out ++= b.collect() }; ()
        }
        .start()
      q.awaitTermination()
      if (collectStateRows && i == slices.size - 1)
        stateRows = Option(q.lastProgress).toSeq
          .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
    }
    (out.filter(!_.saturated).map(h => (h.doc_id, h.band, h.first_doc)).toSet,
      stateRows)
  }

  /** The batch spelling of the gate's law over the same corpus. */
  private def batchLaw(df: DataFrame, cap: Int = 100): Set[(Long, Int, Long)] = {
    val sigs = StreamingNearDup.signatureRows(df, "doc_id", "text")
    val w = Window.partitionBy($"i", $"mh").orderBy($"doc_id")
    sigs.withColumn("rn", row_number().over(w))
      .withColumn("first", min($"doc_id").over(Window.partitionBy($"i", $"mh")))
      .where($"rn" >= 2 && $"rn" <= cap + 1)
      .select($"doc_id", $"i".cast("int"), $"first")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
  }

  test("fed in id order, hits equal the batch bucket law; state is bucket-sized") {
    val df = fixture().cache()
    val slices = writeSlices(tmpDir("snd-one"), df, Seq((0L, 2000L)))
    val (got, stateRows) = drain(slices, tmpDir("snd-ck1"), collectStateRows = true)
    val want = batchLaw(df)
    assert(want.nonEmpty, "fixture must produce collisions")
    assert(got == want, s"streaming hits != batch law (got ${got.size}, want ${want.size})")
    val nBuckets = StreamingNearDup.signatureRows(df, "doc_id", "text")
      .select($"i", $"mh").distinct().count()
    assert(stateRows == nBuckets, "one O(1) state row per distinct bucket")
  }

  test("batching invariance: three arrival waves emit the same hit set") {
    val df = fixture().cache()
    // id-ordered waves: originals first, then the planted dups in two waves
    val slices = writeSlices(tmpDir("snd-three"), df,
      Seq((0L, 40L), (1000L, 1005L), (1005L, 2000L)))
    val (got, _) = drain(slices, tmpDir("snd-ck3"))
    assert(got == batchLaw(df))
  }

  test("soundness and quarantine: planted copies flagged, originals kept") {
    val df = fixture().cache()
    val slices = writeSlices(tmpDir("snd-q"), df, Seq((0L, 2000L)))
    val (got, _) = drain(slices, tmpDir("snd-ckq"))
    // soundness: emitted pairs really share the band minhash, keeper smaller
    val sigs = StreamingNearDup.signatureRows(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    got.foreach { case (doc, band, first) =>
      assert(first < doc, "keeper precedes the flagged doc")
      assert(sigs((doc, band)) == sigs((first, band)), "band minhash truly shared")
    }
    // quarantine: >=2-band verdict — every planted near-identical copy is
    // flagged, and the flagged set is exactly what the same law computes
    // in batch (the fixture corpus may carry genuine extra collisions;
    // those flag identically on both paths)
    val hits = got.toSeq.toDF("doc_id", "band", "first_doc")
    val flagged = StreamingNearDup.quarantine(hits)
      .select($"doc_id").as[Long].collect().toSet
    val batchFlagged = batchLaw(df).groupBy(_._1)
      .filter(_._2.map(_._2).toSet.size >= 2).keySet
    assert((0L until 10L).map(_ + 1000L).toSet.subsetOf(flagged),
      s"every planted copy quarantines, got $flagged")
    assert(flagged == batchFlagged, "streaming verdicts equal the batch law's")
  }

  test("saturation: crossing the cap emits ONE marker and quarantine drops the bucket") {
    // 6 identical docs → every band bucket holds all 6; with cap=3 a
    // bucket of exactly 3 members would fully emit (the q31 law keeps
    // buckets up to the cap), so docs 1-2 emit (ranks 2-3), doc 3 —
    // membership 4 > cap — emits the bucket's one marker, docs 4-5
    // emit nothing
    val df = Seq.tabulate(6)(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val sigs = StreamingNearDup.signatureRows(df, "doc_id", "text")
    val hits = StreamingNearDup.bandHits(spark, sigs, maxBucket = 3)
      .collect()
    val markers = hits.filter(_.saturated)
    val candidates = hits.filter(!_.saturated)
    val nBands = sigs.select($"i").distinct().count()
    assert(markers.length == nBands, "exactly one marker per saturated bucket")
    assert(markers.forall(m => m.doc_id == 3L && m.first_doc == 0L),
      "marker carries the first suppressed arrival and the bucket keeper")
    assert(candidates.forall(h => h.doc_id == 1L || h.doc_id == 2L),
      "candidates stop at the cap")
    // quarantine honors the marker: saturated buckets carry no dedup
    // signal, so NOTHING flags — the batch MaxBand drop, post-hoc
    val flagged = StreamingNearDup.quarantine(hits.toSeq.toDF())
    assert(flagged.count() == 0L, "marked buckets are retracted before the verdict")
    // without the marker the same hit log over-quarantines — the exact
    // pre-r8 divergence this channel closes
    val noMarker = StreamingNearDup.quarantine(
      candidates.toSeq.map(h => (h.doc_id, h.band, h.first_doc))
        .toDF("doc_id", "band", "first_doc"))
    assert(noMarker.count() > 0L)
  }
}
