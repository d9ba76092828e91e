package graft

import org.apache.spark.sql.functions._

import graft.operators.ShardExport
import graft.sources.Tables

/** Laws of the shard export: one file per shard, lossless content,
  * assignment identical to the q70 packing law and across re-runs, the
  * straddle rule (a bin minus its last doc is under budget), and a
  * manifest that matches both the data and the filesystem.
  */
class ShardExportSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val Budget = 512

  private def corpus = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"text",
        size(split(trim($"text"), "\\s+")).as("toks"))
  }

  test("export: one file per shard, lossless, manifest matches fs and data") {
    import spark.implicits._
    val out = tmpDir("shard-export")
    val manifest = ShardExport.write(corpus, out, "doc_id", "toks", Budget).collect()

    // one data file per shard, byte sizes as listed
    assert(manifest.nonEmpty && manifest.forall(_.getAs[Long]("n_files") == 1L))
    assert(manifest.forall(_.getAs[Long]("file_bytes") > 0L))

    // lossless: same doc ids, same count
    val back = spark.read.parquet(out)
    assert(back.count() == corpus.count())
    assert(back.select($"doc_id").except(corpus.select($"doc_id")).isEmpty)

    // manifest aggregates match the written data
    val fromData = back.groupBy($"shard".cast("string").as("shard"))
      .agg(count(lit(1)).as("n_docs"), countDistinct($"bin").as("n_bins"),
        sum($"toks").cast("long").as("sum_toks"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val fromManifest = manifest.map(r => (r.getAs[String]("shard"),
      r.getAs[Long]("n_docs"), r.getAs[Long]("n_bins"), r.getAs[Long]("sum_toks"))).toSet
    assert(fromData == fromManifest)
  }

  test("straddle rule: every bin minus its last doc is under budget") {
    import spark.implicits._
    val out = tmpDir("shard-straddle")
    ShardExport.write(corpus, out, "doc_id", "toks", Budget)
    val bad = spark.read.parquet(out)
      .groupBy($"shard", $"bin")
      .agg(sum($"toks").as("bin_toks"), max(struct($"pos", $"toks")).as("last"))
      .where($"bin_toks" - $"last.toks" >= Budget)
    assert(bad.isEmpty, "a bin kept more than budget before its last doc")
  }

  test("assignment is deterministic across runs and matches the q70 law") {
    import spark.implicits._
    val (o1, o2) = (tmpDir("shard-a"), tmpDir("shard-b"))
    ShardExport.write(corpus, o1, "doc_id", "toks", Budget)
    ShardExport.write(corpus, o2, "doc_id", "toks", Budget)
    def assign(p: String) = spark.read.parquet(p)
      .select($"doc_id", $"shard".cast("string"), $"bin", $"pos")
    assert(assign(o1).except(assign(o2)).isEmpty &&
      assign(o2).except(assign(o1)).isEmpty)

    // same (shard, bin) per doc as the oracled q70 law over the same corpus
    val law = graft.SparkEntry.queries("q70_sequence_packing")(spark, dir)
      .select($"shard", $"bin", $"n_docs")
    val ours = assign(o1).groupBy($"shard", $"bin").agg(count(lit(1)).as("n_docs"))
    assert(ours.except(law).isEmpty && law.except(ours).isEmpty)
  }

  test("all-numeric shard values (leading zeros) keep a complete manifest") {
    import spark.implicits._
    // docs whose 2-char md5 prefix is purely numeric — shards like "07"
    // that partition-type inference would read back as the integer 7,
    // which is why the manifest derives from the packed frame, not a
    // re-read of the written tree
    val numeric = corpus
      .withColumn("h", substring(
        md5(concat(lit("pack:"), $"doc_id".cast("string")).cast("binary")), 1, 2))
      .where($"h".rlike("^[0-9]{2}$")).drop("h")
    val n = numeric.count()
    assert(n > 50, s"fixture too small for the hazard: $n docs")
    val out = tmpDir("shard-numeric")
    val manifest = ShardExport.write(numeric, out, "doc_id", "toks", Budget,
      shardHexChars = 2).collect()
    assert(manifest.map(_.getAs[Long]("n_docs")).sum == n,
      "manifest lost shards to partition-type inference")
    assert(manifest.exists(_.getAs[String]("shard").startsWith("0")),
      "no leading-zero shard present — hazard untested")
    assert(manifest.forall(_.getAs[Long]("n_files") == 1L))
  }

  test("shardHexChars widens the shard space (the 100 TB knob)") {
    import spark.implicits._
    val out = tmpDir("shard-wide")
    val manifest = ShardExport.write(corpus, out, "doc_id", "toks", Budget,
      shardHexChars = 2)
    val n = manifest.select(countDistinct($"shard")).head().getLong(0)
    assert(n > 16 && n <= 256, s"expected 2-hex-char shard space, got $n")
  }
}
