package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Pins the scan-pruning contract for the ns-typed `events` fixture: range
  * predicates on the derived µs timestamp must reach the parquet scan as
  * bounds on the raw nanos long ([[graft.plans.NanoTimestampPushdown]]),
  * and the injected bounds must never change results.
  */
class NanoTimestampPushdownSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ts range bounds reach the parquet scan as PushedFilters") {
    import spark.implicits._
    val plan = Tables.events(spark, dir)
      .where($"ts" >= lit("2024-01-05").cast("timestamp") &&
        $"ts" <= lit("2024-01-10").cast("timestamp"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("GreaterThanOrEqual(ts"), s"no pushed ts lower bound:\n$plan")
    assert(plan.contains("LessThanOrEqual(ts"), s"no pushed ts upper bound:\n$plan")
  }

  test("injected nanos bounds never change results") {
    import spark.implicits._
    val lo = java.time.Instant.parse("2024-01-05T00:00:00Z").toEpochMilli * 1000L
    val hi = java.time.Instant.parse("2024-01-10T00:00:00Z").toEpochMilli * 1000L
    val expected = Tables.events(spark, dir)
      .select($"event_id", unix_micros($"ts").as("us")).collect()
      .filter(r => r.getLong(1) >= lo && r.getLong(1) <= hi)
      .map(_.getLong(0)).sorted.toSeq
    val got = Tables.events(spark, dir)
      .where($"ts" >= lit("2024-01-05").cast("timestamp") &&
        $"ts" <= lit("2024-01-10").cast("timestamp"))
      .select($"event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("strict bounds and equality also derive pushed bounds") {
    import spark.implicits._
    val plan = Tables.events(spark, dir)
      .where($"ts" > lit("2024-01-05").cast("timestamp") &&
        $"ts" < lit("2024-01-10").cast("timestamp"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(ts"), s"no pushed bound from >:\n$plan")
    assert(plan.contains("LessThanOrEqual(ts"), s"no pushed bound from <:\n$plan")
  }
}
