package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Idempotent backfill of a partitioned derived table — the maintenance
  * move every event pipeline eventually needs: "recompute days X..Y of
  * the rollup" after late data, a bug fix, or a schema change, without
  * touching any other partition and without double-writing on retry.
  *
  * Mechanics: Spark's dynamic partition overwrite replaces exactly the
  * partitions present in the written frame. Backfill constrains that
  * frame to the requested range ON BOTH SIDES — the transform's output
  * is filtered to [from, to] so a buggy transform cannot clobber
  * partitions outside its mandate, and the overwrite is atomic per
  * partition (staging + rename inside the committer). Re-running the
  * same backfill converges to the same state: the operation is
  * idempotent by construction.
  *
  * At 100 TB this is the same shape: the source scan prunes to the range
  * (partition/row-group pruning on the time predicate), the rewrite
  * touches only the affected partition directories.
  */
object Backfill {

  /** Recompute `partitionCol ∈ [from, to]` of the derived table at
    * `tablePath` using `transform` over `source`, leaving every other
    * partition byte-identical. Returns the number of rows written.
    */
  def replaceRange(spark: SparkSession, source: DataFrame, tablePath: String,
      partitionCol: String, from: String, to: String)
      (transform: DataFrame => DataFrame): Long = {
    val out = transform(source)
      .where(col(partitionCol) >= from && col(partitionCol) <= to)
    val n = out.count()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try out.write
      .mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(tablePath)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    n
  }
}
