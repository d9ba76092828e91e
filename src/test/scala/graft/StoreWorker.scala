package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.ArtifactStore

/** Second-JVM fixture for [[ArtifactStoreCrossJvmSpec]]: a real separate
  * process (own SparkSession, own JVM-global counters, same classpath —
  * hence the same content-hashed code identity) driving the SAME store
  * root the parent test session holds scans against. Prints `WORKER_*`
  * markers on stdout; Spark noise goes to stderr.
  *
  * Protocol (one fork covers all three cross-process laws):
  *   1. serve `name1` — must be a warm HIT across JVMs (0 builds here);
  *   2. build `name2` — a miss here (1 build), which the PARENT then
  *      serves warm after this process exits;
  *   3. aged vacuum — must keep both live artifacts (the parent still
  *      holds a memoized scan of name1) and sweep the parent's planted
  *      `.tmp-` debris.
  */
object StoreWorker {
  def main(args: Array[String]): Unit = {
    val Array(root, in, name1, name2) = args.take(4)
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-store-worker")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(ArtifactStore.ConfKey, root)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      def build(name: String) = ArtifactStore.table(spark, name, Seq(in)) {
        spark.read.parquet(in).groupBy((col("id") % 4).as("k"))
          .agg(sum(col("v")).as("s"))
      }
      val served = build(name1)
      println(s"WORKER_BUILDS_1=${ArtifactStore.buildCount(name1)}")
      println(s"WORKER_SUM_1=${served.agg(sum(col("s"))).collect()(0).getLong(0)}")
      build(name2)
      println(s"WORKER_BUILDS_2=${ArtifactStore.buildCount(name2)}")
      val aged = ArtifactStore.vacuum(spark, root, maxAgeMs = 0L)
      val kinds = aged.map(e => s"${e.kind}:${e.action}").sorted.mkString(",")
      println(s"WORKER_VACUUM=$kinds")
      println("WORKER_DONE=1")
    } finally spark.stop()
  }
}
