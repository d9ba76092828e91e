package graft

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import graft.model.EventRow
import graft.sources.JdbcEventStore

/** Pins DSv2 aggregate pushdown into the relational store: counting or
  * min/max-ing a JDBC table must execute INSIDE the database (one result
  * row over the wire), not as a full-table fetch aggregated by Spark. The
  * V1 JDBC source ([[JdbcEventStore]]'s scan path) pushes only filters +
  * columns; the JDBCTableCatalog route adds SupportsPushDownAggregates —
  * the difference between a metadata query and a 10⁹-row export when an
  * operational dashboard asks "how many events since T". Both the plan
  * (PushedAggregates in the V2 scan) and the values are asserted.
  */
class JdbcPushdownSpec extends SparkSpec {

  private val dbId = new AtomicInteger(100)

  test("count/min/max push into the database through the JDBC catalog") {
    val db = s"pushdown${dbId.incrementAndGet()}"
    val url = s"jdbc:derby:memory:$db;create=true"
    val store = new JdbcEventStore(spark, url, table = "events").initialize()
    (1 to 40).foreach { i =>
      store.saveEvent(EventRow(s"e$i", s"type${i % 3}", "t.push",
        new Timestamp(1700000000000L + i * 1000L), "1.0", "{}", Map.empty))
    }

    spark.conf.set("spark.sql.catalog.graft_jdbc",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set("spark.sql.catalog.graft_jdbc.url", url)
    spark.conf.set("spark.sql.catalog.graft_jdbc.driver",
      "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    spark.conf.set("spark.sql.catalog.graft_jdbc.pushDownAggregate", "true")
    try {
      val df = spark.sql(
        """SELECT count(*) AS n, min(`timestamp`) AS mn, max(`timestamp`) AS mx
          |FROM graft_jdbc.APP.EVENTS""".stripMargin)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregates"),
        s"aggregate not pushed into the database:\n$plan")
      val r = df.head()
      assert(r.getLong(0) == 40L)
      assert(r.getLong(1) == 1700000001000L && r.getLong(2) == 1700000040000L)

      // filters ride along: predicate + aggregate both pushed
      val filtered = spark.sql(
        """SELECT count(*) AS n FROM graft_jdbc.APP.EVENTS
          |WHERE `type` = 'type0'""".stripMargin)
      val fplan = filtered.queryExecution.executedPlan.toString
      assert(fplan.contains("PushedAggregates") && fplan.contains("PushedFilters"),
        s"filter+aggregate not both pushed:\n$fplan")
      assert(filtered.head().getLong(0) == 13L)
    } finally {
      Seq("", ".url", ".driver", ".pushDownAggregate")
        .foreach(s => spark.conf.unset(s"spark.sql.catalog.graft_jdbc$s"))
      store.close()
    }
  }
}
