package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.queries.GateFixtures

/** Concurrency contract of the gate machinery's session-conf overrides
  * (r14 advisor): [[GateFixtures.narrow]] sections are SERIAL across
  * threads, so an interleaved save/restore can never capture another
  * section's narrowed value as its "prior" and leave the shared session
  * permanently at width 4 / codegen off — and a derivation query built
  * while a gate is narrowed still plans and executes at the session's
  * full width with codegen on.
  */
class GateNarrowSpec extends SparkSpec {

  private val key = "spark.sql.shuffle.partitions"
  private val cgKey = "spark.sql.codegen.wholeStage"

  test("concurrent narrow sections serialize — conf restored exactly, never cross-captured") {
    val prior = spark.conf.get(key)
    val priorCg = spark.conf.get(cgKey)
    val pool = Executors.newFixedThreadPool(4)
    try {
      val tasks = (1 to 16).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = GateFixtures.narrow(spark, width = 2) {
            // inside a narrowed section the overrides are visible...
            assert(spark.conf.get(key) == "2")
            assert(spark.conf.get(cgKey) == "false")
            // ...and hold for the section's whole extent even with 15
            // rivals queued (pre-lock, a rival's set() could land here)
            Thread.sleep(5)
            assert(spark.conf.get(key) == "2")
          }
        })
      }
      tasks.foreach(_.get(120, TimeUnit.SECONDS))
    } finally { pool.shutdownNow(); () }
    // the r14 interleaving bug ended here at width=2/codegen=false
    assert(spark.conf.get(key) == prior)
    assert(spark.conf.get(cgKey) == priorCg)
  }

  test("narrow is reentrant: a drain inside a narrowed gate body re-enters without deadlock") {
    val prior = spark.conf.get(key)
    GateFixtures.narrow(spark, width = 2) {
      GateFixtures.narrow(spark, width = 2) {
        assert(spark.conf.get(key) == "2")
      }
      // inner exit restores the OUTER section's value, not the session's
      assert(spark.conf.get(key) == "2")
    }
    assert(spark.conf.get(key) == prior)
  }

  test("derivation query constructed during a narrowed gate keeps full width + codegen") {
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val gate = new Thread(() => GateFixtures.narrow(spark, width = 2) {
      entered.countDown()
      release.await(30, TimeUnit.SECONDS)
      ()
    })
    gate.start()
    assert(entered.await(30, TimeUnit.SECONDS))
    // the gate holds its narrowed section NOW; build a derivation plan
    // against the shared session (construction must not bake in gate conf)
    import spark.implicits._
    val df = Seq(1, 2, 3, 4, 5, 6).toDF("v")
      .groupBy(($"v" % 2).as("k")).count()
    release.countDown()
    gate.join(30000)
    // after the gate: session conf untouched, and the derivation executes
    // with whole-stage codegen (would be interpreted had the gate's
    // codegen=false leaked into its execution)
    assert(spark.conf.get(key) == "4")
    assert(spark.conf.get(cgKey) != "false")
    assert(df.collect().map(_.getLong(1)).sum == 6L)
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes = whole-stage-codegen stages; absent when the plan
    // was compiled under the gate's codegen=false override
    assert(plan.contains("*("),
      s"derivation lost codegen to a concurrent gate's conf override:\n$plan")
    // the shuffle planned at the session's width (4), not the gate's (2)
    assert(plan.contains(" 4), ENSURE_REQUIREMENTS"),
      s"derivation shuffled at the gate's narrowed width:\n$plan")
  }
}
