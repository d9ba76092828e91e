package graft

import graft.sources.Tables

/** Bucketing for co-located joins (SURVEY.md §4.2 / the 100 TB join lever):
  * fact tables bucketed on the join key join WITHOUT a shuffle — at scale
  * this converts the nightly fact⨝fact join from a full network shuffle
  * into local merges. Pinned by plan assertion: no Exchange in the join.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed fact-fact join plans with zero exchanges and agrees with the shuffle join") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the merge path
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("orders_bucketed"), $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join in:\n$plan")

      val expected = li.join(o, $"l_orderkey" === $"o_orderkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    }
  }
}
