package graft

import java.sql.Timestamp

import graft.broker.{EventBroker, RetentionScheduler, TopicOptions}
import graft.model.EventRow

/** The reference's 60 s retention timer (topic.ts:40-42, 156-163) as one
  * broker-wide scheduled sweep.
  */
class RetentionSchedulerSpec extends SparkSpec {

  private def oldAndNew(b: EventBroker, topic: String): Unit = {
    val now = System.currentTimeMillis()
    b.log.appendRows(Seq(
      EventRow(s"$topic-old", "x", topic, new Timestamp(now - 100000), "1.0", "{}", Map.empty),
      EventRow(s"$topic-new", "x", topic, new Timestamp(now), "1.0", "{}", Map.empty)))
  }

  test("sweepOnce sweeps every retention-bearing topic, skips keep-forever, survives failures") {
    val b = new EventBroker(spark, tmpDir("ret-sched") + "/log")
    oldAndNew(b, "r1"); oldAndNew(b, "r2"); oldAndNew(b, "keep")
    b.createTopic("r1", TopicOptions(retentionPeriodMillis = 60000))
    b.createTopic("r2", TopicOptions(retentionPeriodMillis = 60000))
    b.createTopic("keep") // retention 0 = keep forever
    b.createTopic("empty", TopicOptions(retentionPeriodMillis = 60000)) // no data — delete of nothing

    val sched = new RetentionScheduler(b, periodMillis = 60000)
    assert(sched.sweepOnce() == 2) // one old row per retention topic
    assert(sched.totalDeleted == 2 && sched.totalSweeps == 1)
    assert(b.log.getEventsTyped("r1").collect().map(_.id).toSeq == Seq("r1-new"))
    assert(b.log.getEventsTyped("r2").collect().map(_.id).toSeq == Seq("r2-new"))
    assert(b.log.getEventsTyped("keep").collect().length == 2)
    assert(sched.sweepOnce() == 0) // idempotent: nothing old remains
  }

  test("armed timer fires without an explicit call; close disarms; start is idempotent") {
    val b = new EventBroker(spark, tmpDir("ret-timer") + "/log")
    oldAndNew(b, "t")
    b.createTopic("t", TopicOptions(retentionPeriodMillis = 60000))

    val sched = new RetentionScheduler(b, periodMillis = 200).start().start()
    try {
      assert(sched.isRunning)
      val deadline = System.currentTimeMillis() + 15000
      while (sched.totalSweeps < 1 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(sched.totalSweeps >= 1, "timer never fired")
      assert(b.log.getEventsTyped("t").collect().map(_.id).toSeq == Seq("t-new"))
    } finally sched.close()
    assert(!sched.isRunning)
  }

  test("close-then-start re-arms: a maintenance pause never silently kills retention") {
    // The r13 review race: a start() issued while close() drains the
    // in-flight sweep used to no-op, leaving the caller unarmed forever.
    // start() now WAITS for the draining executor and then arms, so the
    // pause/resume runbook (close → maintenance → start) always ends
    // armed; sweeps stay serial throughout.
    val b = new EventBroker(spark, tmpDir("ret-rearm") + "/log")
    oldAndNew(b, "m")
    b.createTopic("m", TopicOptions(retentionPeriodMillis = 60000))

    val sched = new RetentionScheduler(b, periodMillis = 100).start()
    try {
      assert(sched.isRunning)
      sched.close()
      assert(!sched.isRunning)
      val sweepsAtClose = sched.totalSweeps
      sched.start() // must arm a fresh schedule, not no-op
      assert(sched.isRunning, "start() after close() must re-arm")
      val deadline = System.currentTimeMillis() + 15000
      while (sched.totalSweeps <= sweepsAtClose &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(sched.totalSweeps > sweepsAtClose,
        "the re-armed schedule never fired")
    } finally sched.close()
    assert(!sched.isRunning)
  }

  test("concurrent close()+start(): a subsequent start() always ends armed (r13 advisor)") {
    // The residual r13 race: close() landing between start()'s drain
    // check and its arming block left a freshly shut-down executor that
    // the old single-pass start() logged-and-ignored — returning unarmed
    // despite its docstring. The drain-check/await/arm sequence now
    // loops, so whatever interleaving the two racing threads produce,
    // the next start() must arm. Stressed across interleavings.
    val b = new EventBroker(spark, tmpDir("ret-race") + "/log")
    b.createTopic("t", TopicOptions(retentionPeriodMillis = 60000))
    val sched = new RetentionScheduler(b, periodMillis = 60000)
    try {
      for (i <- 1 to 25) {
        sched.start()
        val t1 = new Thread(() => sched.close())
        val t2 = new Thread(() => sched.start())
        t1.start(); t2.start(); t1.join(); t2.join()
        sched.start()
        assert(sched.isRunning, s"start() unarmed after racing close() (round $i)")
        assert(sched.drainingSweeps == 0, "no sweep was in flight — nothing may drain")
        sched.close()
        assert(!sched.isRunning)
      }
    } finally sched.close()
  }
}
