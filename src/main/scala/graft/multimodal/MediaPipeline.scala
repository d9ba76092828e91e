package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media asset: opaque bytes + typed metadata. The schema an asset
  * manifest carries at 100 TB — content stays `binary` end-to-end; only
  * metadata and derived features are ever shuffled.
  */
final case class MediaAsset(
    media_id: Long,
    kind: String, // image | audio | video
    content: Array[Byte],
    meta: Map[String, String])

/** Decoded features for one asset: fixed-width vector + shape metadata. */
final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Int,
    width: Int,
    height: Int,
    features: Array[Float])

/** Multimodal column plumbing (north-star surface): treat image/audio/video
  * as opaque `binary` columns, decode/feature-extract in BATCHED
  * per-partition workers, keep everything else relational.
  *
  * The decode step is a clearly-marked STUB: no codec libraries exist in
  * this container, so `decodeStub` derives deterministic fake
  * width/height/features from the bytes (byte histogram → normalized
  * float vector). Swapping in a real decoder changes ONLY the body of
  * `decodeStub` — the Spark-side contract (schema, partition-level
  * batching, feature width, null law) is real and tested.
  *
  * Scale notes: `mapPartitions` amortizes per-batch setup (a real decoder
  * loads its codec/model once per partition, exactly like a Python
  * `mapInPandas` worker would); binary payloads never pass through a
  * shuffle — features (256 floats) do. Partition sizing is the caller's
  * lever: `spark.sql.files.maxPartitionBytes` bounds decoder memory.
  */
object MediaPipeline {

  val FeatureDim = 16

  /** Build an asset table from any (id, bytes-ish) source. Used by tests to
    * synthesize media from document text; a real ingest reads
    * `binaryFile` sources (`spark.read.format("binaryFile")`).
    */
  def assetsFromDocuments(docs: DataFrame): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    docs.select(
        $"doc_id".as("media_id"),
        element_at(typedLit(Seq("image", "audio", "video")), ($"doc_id" % 3).cast("int") + 1)
          .as("kind"),
        $"text".cast("binary").as("content"),
        map(lit("source"), lit("documents")).as("meta"))
      .as[MediaAsset]
  }

  /** STUB decoder — deterministic fake. Real implementation would dispatch
    * on `kind` to an image/audio/video codec here.
    */
  private[multimodal] def decodeStub(asset: MediaAsset): MediaFeatures = {
    val bytes = asset.content
    // Fake "dimensions": derived from content length, stable across runs.
    val width = 16 + (bytes.length % 64)
    val height = 16 + ((bytes.length / 64) % 64)
    // Fake "features": L1-normalized 16-bin byte histogram.
    val hist = new Array[Float](FeatureDim)
    bytes.foreach(b => hist((b & 0xff) % FeatureDim) += 1f)
    val total = math.max(bytes.length, 1).toFloat
    MediaFeatures(asset.media_id, asset.kind, bytes.length, width, height,
      hist.map(_ / total))
  }

  /** Batched decode: one worker instantiation per PARTITION, not per row.
    * This is the Scala analogue of `mapInPandas` batch shape.
    */
  def decode(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      // Real decoder: initialize codec/session HERE (once per partition).
      batch.map(decodeStub)
    }
  }

  /** STUB resize — deterministic fake: keeps every k-th byte so the
    * "resized" content scales with the target area the way a real
    * image/audio resample would. A real implementation decodes, resamples,
    * re-encodes here; the Spark-side contract (binary in, binary out,
    * metadata records the target dims, per-row narrow) is what the
    * pipeline depends on.
    */
  def resize(assets: Dataset[MediaAsset], width: Int, height: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.map { a =>
      val target = math.max(width * height, 1)
      val step = math.max(a.content.length / target, 1)
      val out = a.content.indices.collect { case i if i % step == 0 => a.content(i) }.toArray
      a.copy(content = out,
        meta = a.meta ++ Map("resized_w" -> width.toString, "resized_h" -> height.toString))
    }
  }

  /** Fixed-stride frame sampling for video assets: every `stride`-th
    * `frameBytes` window, fingerprinted. Pure per-row generator — frames
    * explode to (media_id, frame_no, digest) rows, bytes stay put.
    */
  def sampleFrames(assets: Dataset[MediaAsset], frameBytes: Int = 32,
      stride: Int = 128): DataFrame = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      val n = ((a.content.length - 1) / stride) + 1
      (0 until n).map { i =>
        val from = i * stride
        val until = math.min(from + frameBytes, a.content.length)
        val md = MessageDigest.getInstance("MD5")
          .digest(java.util.Arrays.copyOfRange(a.content, from, until))
        (a.media_id, i, md.map("%02x".format(_)).mkString)
      }
    }.toDF("media_id", "frame_no", "frame_md5")
  }

  /** CANDIDATE near-duplicate media by feature cosine within (kind, LSH
    * bucket) — reuses the similarity surface over decoded features:
    * multimodal dedup is embedding dedup after decode. The join key is an
    * equality on the composite block, so Catalyst plans a hash/sort-merge
    * join (never a cross product), and the pair space stays linear in
    * corpus size.
    *
    * `blockPlanes` defaults from the corpus size
    * ([[graft.functions.VectorFunctions.blockPlanesFor]], one count() of
    * the feature table): each plane halves the expected (kind, bucket)
    * cell, so planes grow with log2(n) and the pair space never goes
    * quadratic within a fixed cell grid. This is standard LSH RECALL
    * trading: bit-identical features always share a bucket, but a
    * near-dup pair whose projections straddle a hyperplane is missed by
    * that plane — production raises recall with multiple hash tables or
    * multi-probe, never by falling back to all-pairs. Pass an explicit
    * value to pin recall (or to skip the sizing count on a re-used table).
    */
  def nearDupCandidates(features: Dataset[MediaFeatures], threshold: Double,
      blockPlanes: Option[Int] = None): DataFrame = {
    import features.sparkSession.implicits._
    graft.functions.expressions.GraftFunctions.register(features.sparkSession)
    // cached BEFORE the sizing count and the self-join: `features` usually
    // hangs off the decode mapPartitions, and without the cache the decode
    // would run once for the count and once per join side (3 full passes)
    val cached = graft.operators.CacheRegistry.track(features.toDF().cache())
    val planes = blockPlanes.getOrElse(
      graft.functions.VectorFunctions.blockPlanesFor(cached.count()))
    val f = cached
      .select($"media_id", $"kind", $"features".cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(graft.functions.VectorFunctions.dot($"v", $"v")))
      .withColumn("bucket",
        graft.functions.VectorFunctions.lshBucket($"v", planes, FeatureDim))
    f.as("a").join(f.as("b"),
        $"a.kind" === $"b.kind" && $"a.bucket" === $"b.bucket" &&
          $"a.media_id" < $"b.media_id")
      .select($"a.media_id".as("a_id"), $"b.media_id".as("b_id"),
        (graft.functions.VectorFunctions.dot($"a.v", $"b.v") / ($"a.nrm" * $"b.nrm")).as("cos"))
      .where($"cos" >= threshold)
  }
}
