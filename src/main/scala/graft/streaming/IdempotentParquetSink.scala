package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, Dataset}

/** Exactly-once file delivery for `foreachBatch`: each micro-batch lands
  * in `<path>/batch=<id>` via staging + ATOMIC RENAME, and a replayed
  * batch id is skipped when its committed directory already exists.
  *
  * Why it's needed: `foreachBatch` is at-least-once — after a crash
  * between sink write and checkpoint commit, recovery re-runs the last
  * batch with the SAME batchId. Spark's own file sink solves this with a
  * transaction log; this is the minimal equivalent for a custom sink:
  * the rename is the commit point (HDFS/posix-atomic), the
  * `_GRAFT_COMMITTED` marker rides inside the staged directory so a
  * half-written directory can never look committed, and underscore
  * prefixes keep the marker invisible to parquet readers. Downstream
  * reads `spark.read.parquet(path)` and sees `batch` as a partition
  * column.
  *
  * Scale shape: one rename + one existence check per micro-batch,
  * regardless of data volume; the data write itself is the normal
  * distributed parquet job.
  */
object IdempotentParquetSink {

  /** The `foreachBatch` function: replay-safe batch writer into `path`. */
  def writer(path: String): (Dataset[Row], Long) => Unit = { (df, batchId) =>
    val spark = df.sparkSession
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(path, s"batch=$batchId")
    val marker = new Path(dir, "_GRAFT_COMMITTED")
    if (!fs.exists(marker)) {
      val staging = new Path(path, s".staging_$batchId")
      fs.delete(staging, true)
      fs.delete(dir, true) // a dir without marker is a half-written replay victim
      df.write.mode("overwrite").parquet(staging.toString)
      fs.create(new Path(staging, "_GRAFT_COMMITTED")).close()
      if (!fs.rename(staging, dir)) // the commit point
        throw new IllegalStateException(s"commit rename failed for batch $batchId")
    }
  }

  /** All committed batches as one frame (`batch` is a partition column). */
  def read(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
