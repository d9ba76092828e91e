package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Measurement rules:
  *   - every query is fully materialized through the `noop` sink (a count()
  *     would let Catalyst prune projections and eliminate sorts, flattering
  *     exactly the queries whose projections are heavy);
  *   - median of 3 timed runs per query — the host shows intermittent
  *     multi-second stalls (steal/load spikes), and a median absorbs one
  *     outlier where min-of-2 recorded it;
  *   - failures are explicit: a throwing query reports -1 sec and lands in
  *     the "errors" map instead of masquerading as a fast pass.
  *
  * Extras for local iteration (driver passes no args, so these are inert in
  * harness runs):
  *   - args = substrings: run only queries whose name contains any arg
  *   - SPARK_GRAFT_EXPLAIN=1: print each query's formatted physical plan
  */
object Bench {

  private val Runs = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => args.exists(n.contains) }
    // Untimed warmup: JIT + codegen + parquet file-index the inputs once so
    // the per-query numbers measure the queries, not first-touch JVM cost
    // (measured ~4s attributed to whichever query happened to run first).
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => graft.sources.Tables.table(spark, sfDir, t).count())
    graft.sources.Tables.events(spark, sfDir).count()
    spark.range(1000000).selectExpr("sum(id * 2)").collect()

    var errors = Map.empty[String, String]
    val results = selected.map { case (name, fn) =>
      if (explain) {
        println(s"===== $name =====")
        fn(spark, sfDir).explain("formatted")
      }
      // One timed run: full materialization via the noop sink.
      var lastErr: Option[String] = None
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case t: Throwable =>
            lastErr = Some(t.toString.linesIterator.next().take(200))
            None
        }
      }
      val times = (1 to Runs).flatMap(_ => once())
      // Median of the SURVIVING runs ((n-1)/2 — size/2 would pick the max
      // of two); a query is an error only when every run failed, a
      // transient single-run failure just shrinks the median's sample.
      val sec = if (times.isEmpty) -1.0 else times.sorted.apply((times.size - 1) / 2)
      if (times.isEmpty) errors += name -> lastErr.getOrElse("unknown failure")
      name -> sec
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      // control chars (tabs in Derby/Spark messages) would break the
      // one-JSON-line contract for strict parsers
      val esc = v.replace("\\", "\\\\").replace("\"", "\\\"")
        .flatMap(c => if (c < ' ') f"\\u${c.toInt}%04x" else c.toString)
      s"\"" + k + "\":\"" + esc + "\""
    }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","errors":$errJson}""")
    spark.stop()
  }
}
