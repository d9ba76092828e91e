package graft

/** The engine confs live in ONE factory consumed by Bench, Verify and the
  * test session (r16, verdict item 3): an optimization expressed as
  * session conf must reach every execution surface, not just the bench
  * harness. This spec asserts a factory-built session actually carries
  * them — a conf silently dropped from the factory (or overridden at
  * session build) fails here instead of skewing a round's measurements.
  */
class EngineSessionSpec extends SparkSpec {

  test("factory-built session carries every engine conf") {
    EngineSession.confs.foreach { case (k, v) =>
      assert(spark.conf.get(k) == v, s"engine conf $k")
    }
  }

  test("cached-plan AQE coalescing is an engine conf, not a harness conf") {
    assert(EngineSession.confs.toMap
      .get("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning")
      .contains("true"))
  }
}
