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

  /** Deterministic tiny PNG: pixel (x,y) = RGB from an integer recurrence,
    * round-tripped through the in-JDK encoder. Returns (png bytes, the
    * BufferedImage it encodes).
    */
  private def pngFixture(w: Int, h: Int): (Array[Byte], java.awt.image.BufferedImage) = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 31 + y * 17) % 256
      val g = (x * 7 + y * 131) % 256
      val b = (x * 101 + y * 3) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    (out.toByteArray, img)
  }

  test("decode: real PNGs get actual pixel dimensions and a luminance histogram") {
    import spark.implicits._
    val (png1, img1) = pngFixture(7, 5)
    val (png2, img2) = pngFixture(32, 16)
    val assets = Seq(
      MediaAsset(100L, "image", png1, Map.empty),
      MediaAsset(101L, "image", png2, Map.empty)).toDS()
    val feats = MediaPipeline.decode(assets).collect().sortBy(_.media_id).toSeq
    assert(feats.map(f => (f.width, f.height, f.decoded)) ==
      Seq((7, 5, true), (32, 16, true)))
    // features match an independent recompute from the ORIGINAL pixels
    // (decode reads them back out of the encoded PNG — lossless for PNG)
    def lumHist(img: java.awt.image.BufferedImage): Seq[Float] = {
      val hist = new Array[Float](MediaPipeline.FeatureDim)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        hist(lum * MediaPipeline.FeatureDim / 256) += 1f
      }
      hist.map(_ / (img.getWidth * img.getHeight).toFloat).toSeq
    }
    assert(feats(0).features.toSeq == lumHist(img1))
    assert(feats(1).features.toSeq == lumHist(img2))
    feats.foreach(f => assert(math.abs(f.features.map(_.toDouble).sum - 1.0) < 1e-5))
  }

  /** Deterministic mono PCM16 WAV: sample i = ((i * 2731) % 65536) - 32768,
    * wrapped by the in-JDK writer. Returns (wav bytes, the raw samples).
    */
  private def wavFixture(nSamples: Int, rate: Int = 8000): (Array[Byte], Seq[Int]) = {
    val samples = (0 until nSamples).map(i => ((i * 2731) % 65536) - 32768)
    val pcm = new Array[Byte](nSamples * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    (out.toByteArray, samples)
  }

  test("decode: real WAVs get sample rate, channels and an amplitude histogram") {
    import spark.implicits._
    val (wav, samples) = wavFixture(1000)
    val assets = Seq(MediaAsset(300L, "audio", wav, Map.empty)).toDS()
    val f = MediaPipeline.decode(assets).collect().head
    assert(f.decoded && f.width == 8000 && f.height == 1)
    val expected = {
      val hist = new Array[Float](MediaPipeline.FeatureDim)
      samples.foreach(s => hist((s + 32768) * MediaPipeline.FeatureDim / 65536) += 1f)
      hist.map(_ / samples.size.toFloat).toSeq
    }
    assert(f.features.toSeq == expected)
    // a WAV under image kind must not enter the image codec (falls back)
    val cross = Seq(MediaAsset(301L, "image", wav, Map.empty)).toDS()
    assert(!MediaPipeline.decode(cross).collect().head.decoded)
  }

  test("decode: undecodable image payloads fall back to the byte-histogram law") {
    import spark.implicits._
    val bytes = "not actually a png".getBytes("UTF-8")
    val (png, _) = pngFixture(4, 4)
    val assets = Seq(
      MediaAsset(200L, "image", bytes, Map.empty), // image kind, bogus bytes
      MediaAsset(201L, "audio", png, Map.empty), // real png, non-image kind
      MediaAsset(202L, "image", png, Map.empty)).toDS()
    val byId = MediaPipeline.decode(assets).collect().map(f => f.media_id -> f).toMap
    assert(!byId(200L).decoded && byId(200L).width == 16 + bytes.length % 64)
    assert(!byId(201L).decoded, "non-image kinds must not enter the image codec")
    assert(byId(202L).decoded && byId(202L).width == 4)
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

  test("resize: deterministic subsample fallback, metadata records target dims") {
    val assets = MediaPipeline.assetsFromDocuments(docs())
    val resized = MediaPipeline.resize(assets, 8, 4).collect().sortBy(_.media_id)
    val orig = assets.collect().sortBy(_.media_id)
    resized.zip(orig).foreach { case (r, o) =>
      assert(r.content.length <= o.content.length)
      assert(r.meta("resized_w") == "8" && r.meta("resized_h") == "4")
      assert(r.meta("resize_decoded") == "false") // text bytes: no codec
      assert(r.meta("source") == "documents") // original meta preserved
    }
    val again = MediaPipeline.resize(assets, 8, 4).collect().sortBy(_.media_id)
    assert(resized.zip(again).forall { case (a, b) => a.content.sameElements(b.content) })
  }

  test("resize: real PNGs are decoded, redrawn at target dims, re-encoded") {
    import spark.implicits._
    val (png1, img1) = pngFixture(7, 5)
    val (png2, _) = pngFixture(32, 16)
    val assets = Seq(
      MediaAsset(300L, "image", png1, Map("source" -> "fix")),
      MediaAsset(301L, "image", png2, Map("source" -> "fix"))).toDS()
    val resized = MediaPipeline.resize(assets, 8, 4).collect().sortBy(_.media_id)
    resized.foreach { r =>
      assert(r.meta("resize_decoded") == "true", "real codec path taken")
      assert(r.meta("resized_w") == "8" && r.meta("resized_h") == "4")
      assert(r.meta("source") == "fix")
    }
    // decode of the resized PNG reports the ACTUAL target pixel dims
    val feats = MediaPipeline.decode(resized.toSeq.toDS()).collect().sortBy(_.media_id)
    feats.foreach { f =>
      assert(f.decoded, "resized output must itself be a decodable PNG")
      assert(f.width == 8 && f.height == 4,
        s"real resize yields target dims, got ${f.width}x${f.height}")
    }
    // upscale direction works too (bilinear redraw, not a byte subsample)
    val up = MediaPipeline.resize(assets, 64, 32).collect().sortBy(_.media_id)
    val upFeats = MediaPipeline.decode(up.toSeq.toDS()).collect().sortBy(_.media_id)
    upFeats.foreach(f => assert(f.width == 64 && f.height == 32))
    // deterministic: PNG re-encode is lossless and stable
    val again = MediaPipeline.resize(assets, 8, 4).collect().sortBy(_.media_id)
    assert(resized.zip(again).forall { case (a, b) => a.content.sameElements(b.content) })
    // pixel spot-check: corner pixel of an 8x4 redraw of the 7x5 source
    // equals Graphics2D's own answer computed directly on the fixture
    val ref = {
      val out = new java.awt.image.BufferedImage(8, 4, java.awt.image.BufferedImage.TYPE_INT_ARGB)
      val g = out.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img1, 0, 0, 8, 4, null)
      g.dispose()
      out.getRGB(0, 0)
    }
    val got = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized.head.content)).getRGB(0, 0)
    assert(got == ref, "redraw matches a direct Graphics2D scale of the source")
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
