package graft

import graft.multimodal.{MediaAsset, MediaPipeline}

/** Multimodal plumbing: schema, batch shape, determinism of the stubbed
  * decode, frame sampling (north-star surface).
  */
class MultimodalSpec extends SparkSpec {

  private def docs() = {
    import spark.implicits._
    Seq(
      (0L, "alpha beta gamma delta " * 20),
      (1L, "one two three four five " * 30),
      (2L, "video content payload bytes " * 40),
      (3L, "short"),
      (4L, "another audio doc " * 10),
      (5L, "second video " * 50)
    ).toDF("doc_id", "text")
  }

  test("assetsFromDocuments: binary content + kind routing + typed metadata") {
    val assets = MediaPipeline.assetsFromDocuments(docs()).collect().sortBy(_.media_id)
    assert(assets.length == 6)
    assert(assets.map(_.kind).toSeq == Seq("image", "audio", "video", "image", "audio", "video"))
    assert(assets(0).content.nonEmpty)
    assert(assets(0).meta == Map("source" -> "documents"))
  }

  test("decode: batched per-partition, deterministic, normalized features") {
    val assets = MediaPipeline.assetsFromDocuments(docs())
    val feats = MediaPipeline.decode(assets).collect().sortBy(_.media_id)
    assert(feats.length == 6)
    assert(feats.forall(_.features.length == MediaPipeline.FeatureDim))
    // L1-normalized histogram sums to ~1
    feats.foreach(f => assert(math.abs(f.features.map(_.toDouble).sum - 1.0) < 1e-5))
    // deterministic: second run bit-identical
    val again = MediaPipeline.decode(assets).collect().sortBy(_.media_id)
    assert(feats.zip(again).forall { case (a, b) => a.features.sameElements(b.features) })
    // n_bytes matches content length
    val byId = MediaPipeline.assetsFromDocuments(docs()).collect().map(a => a.media_id -> a).toMap
    feats.foreach(f => assert(f.n_bytes == byId(f.media_id).content.length))
  }

  test("sampleFrames: video-only, fixed stride, stable digests") {
    val assets = MediaPipeline.assetsFromDocuments(docs())
    val frames = MediaPipeline.sampleFrames(assets, frameBytes = 32, stride = 128).collect()
    val ids = frames.map(_.getLong(0)).distinct.sorted
    assert(ids.toSeq == Seq(2L, 5L)) // only kind == video
    val f2 = frames.filter(_.getLong(0) == 2L).map(_.getInt(1)).sorted
    assert(f2.toSeq == (0 until f2.length)) // contiguous frame numbers
    assert(frames.forall(_.getString(2).length == 32)) // md5 hex
  }

  test("resize: deterministic subsample, metadata records target dims") {
    val assets = MediaPipeline.assetsFromDocuments(docs())
    val resized = MediaPipeline.resize(assets, 8, 4).collect().sortBy(_.media_id)
    val orig = assets.collect().sortBy(_.media_id)
    resized.zip(orig).foreach { case (r, o) =>
      assert(r.content.length <= o.content.length)
      assert(r.meta("resized_w") == "8" && r.meta("resized_h") == "4")
      assert(r.meta("source") == "documents") // original meta preserved
    }
    val again = MediaPipeline.resize(assets, 8, 4).collect().sortBy(_.media_id)
    assert(resized.zip(again).forall { case (a, b) => a.content.sameElements(b.content) })
  }

  test("nearDupCandidates: identical content within kind is cosine-1 near-dup") {
    import spark.implicits._
    val dup = Seq(
      (10L, "identical words here " * 30),
      (13L, "identical words here " * 30), // same bytes, same kind (both % 3 == 1 → audio)
      (11L, "completely different animal zebra quark " * 25)
    ).toDF("doc_id", "text")
    val feats = MediaPipeline.decode(MediaPipeline.assetsFromDocuments(dup))
    val pairs = MediaPipeline.nearDupCandidates(feats, 0.999).collect()
    assert(pairs.exists(r => r.getLong(0) == 10L && r.getLong(1) == 13L))
  }

  test("nearDupCandidates: bucketed equi-join plan, no cross product") {
    val feats = MediaPipeline.decode(MediaPipeline.assetsFromDocuments(docs()))
    val plan = MediaPipeline.nearDupCandidates(feats, 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cross product in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop join in plan:\n$plan")
  }
}
