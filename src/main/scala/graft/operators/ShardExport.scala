package graft.operators

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The training-data pipeline's LAST step: write a curated corpus as
  * sharded, sequence-packed parquet a trainer consumes directly. The
  * curation queries (q55/q100) decide WHAT ships, the packing law
  * (q70/q114, TextQueries.packedBins) decides the ORDER AND GROUPING —
  * this operator is where those laws hit disk.
  *
  * Layout: `outDir/shard=<hex>/part-*.parquet`, exactly ONE file per
  * shard (the spec pins it), rows carrying (shard, bin, pos) so a reader
  * streams sequences back in packing order with a plain partitioned scan.
  * A `_manifest` parquet sits next to the shards: per-shard doc/bin/token
  * counts, fill ratio against the bin budget, and the file's byte size
  * from the filesystem — the record a training job validates before it
  * trusts an export (underscore prefix keeps it out of partition
  * discovery, the `_SUCCESS` convention).
  *
  * Determinism and scale are both carried by the same choice — shard =
  * first `shardHexChars` of md5("pack:" + id):
  *   - assignment depends only on doc ids, so re-running an export over
  *     the same corpus reproduces every shard bit-for-bit in content
  *     (the spec pins assignment equality across runs);
  *   - the only window is PARTITIONed by shard — 16^k independent
  *     cumulative sums, each over corpus/16^k docs. At 100 TB raise
  *     `shardHexChars` to 3 (4096 shards ≈ 25 GB each): the window
  *     stays bounded and one shard still fits one task. No global sort
  *     anywhere.
  *
  * Each shard is written by the Spark partition that owns it (hash
  * repartition on the shard value), sorted by the packing order, so the
  * committer moves one file per shard with no post-write rewrite.
  */
object ShardExport {

  /** Pack and write `docs`; returns the manifest (also persisted at
    * `outDir/_manifest`).
    *
    * @param docs          corpus to export; all columns ship
    * @param outDir        export root
    * @param idCol         stable unique document id (drives the md5 order)
    * @param tokensCol     per-doc token count (integer column)
    * @param binBudget     tokens per packed sequence bin (e.g. 512/2048/8192)
    * @param shardHexChars md5 hex prefix length: 16^k shards
    */
  def write(docs: DataFrame, outDir: String, idCol: String, tokensCol: String,
      binBudget: Int = 512, shardHexChars: Int = 1): DataFrame = {
    require(shardHexChars >= 1 && shardHexChars <= 4, "1-4 hex chars (16..65536 shards)")
    val spark = docs.sparkSession

    val hk = md5(concat(lit("pack:"), col(idCol).cast("string")).cast("binary"))
    val keyed = docs.withColumn("__hkey", hk)
      .withColumn("shard", substring(col("__hkey"), 1, shardHexChars))
    val w = Window.partitionBy(col("shard")).orderBy(col("__hkey"), col(idCol))
    val packed = keyed
      .withColumn("__cum", sum(col(tokensCol)).over(w))
      .withColumn("bin",
        floor((col("__cum") - col(tokensCol)) / binBudget).cast("long"))
      .withColumn("pos", row_number().over(w))
      .drop("__hkey", "__cum")
      .persist() // one materialization feeds both the write and the manifest

    try {
      packed
        .repartition(col("shard"))
        .sortWithinPartitions(col("shard"), col("bin"), col("pos"))
        .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(outDir)

      val fs = FileSystem.get(URI.create(outDir), spark.sparkContext.hadoopConfiguration)
      val files: Seq[(String, Long, Long)] = fs.listStatus(new Path(outDir))
        .filter(d => d.isDirectory && d.getPath.getName.startsWith("shard="))
        .toSeq.map { d =>
          val parts = fs.listStatus(d.getPath).filter(_.getPath.getName.startsWith("part-"))
          (d.getPath.getName.stripPrefix("shard="),
            parts.length.toLong, parts.map(_.getLen).sum)
        }
      val fileDf = spark.createDataFrame(files).toDF("shard", "n_files", "file_bytes")

      // stats from the packed frame, not a re-read of the written tree:
      // partition-type inference on a re-read can mistake an all-numeric
      // shard set for integers and break the manifest join on `shard`
      val manifest = packed
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("bin")).as("n_bins"),
          sum(col(tokensCol)).cast("long").as("sum_toks"))
        .join(fileDf, "shard")
        .withColumn("fill_ratio",
          round(col("sum_toks") * lit(1.0) / (col("n_bins") * binBudget), 6))
        .select("shard", "n_docs", "n_bins", "sum_toks", "fill_ratio",
          "n_files", "file_bytes")
        .orderBy("shard")

      manifest.coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(outDir.stripSuffix("/") + "/_manifest")
      // return the persisted manifest rows (reading the file back would
      // hit the same inference hazard the derivation just avoided)
      val spark2 = manifest.sparkSession
      spark2.createDataFrame(
        spark2.sparkContext.parallelize(manifest.collect().toSeq, 1),
        manifest.schema)
    } finally packed.unpersist()
  }
}
