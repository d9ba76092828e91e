package graft.sources

import org.apache.spark.sql.SparkSession

/** One-call SQL surface: registers every testdata table of a scale-factor
  * directory as a temp view (through the same adapting loaders the query
  * pack uses — `events` gets the ts-encoding adaptation, cached tables are
  * shared) plus the native function pack, so the full engine is reachable
  * from plain `spark.sql(...)`:
  *
  * {{{
  * GraftCatalog.register(spark, "/data/sf0.1")
  * spark.sql("SELECT graft_dot(v, v) FROM embeddings LIMIT 1")
  * }}}
  *
  * Deployment-grade sessions get the functions from
  * [[graft.GraftExtensions]] instead; `register` is idempotent either way.
  */
object GraftCatalog {

  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "documents", "embeddings")

  def register(spark: SparkSession, sfDir: String, prefix: String = ""): Unit = {
    tableNames.foreach { n =>
      Tables.table(spark, sfDir, n).createOrReplaceTempView(prefix + n)
    }
    Tables.events(spark, sfDir).createOrReplaceTempView(prefix + "events")
    graft.functions.expressions.GraftFunctions.register(spark)
  }
}
