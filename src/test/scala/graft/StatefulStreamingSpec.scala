package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.model.EventRow
import graft.sources.EventLog

/** Custom streaming state via `mapGroupsWithState` (SURVEY.md §1.1: the
  * streaming form of the event-sourcing fold): per-aggregate running state
  * maintained by Spark's state store, surviving restarts through the
  * checkpoint — the scale path for `EventSourcedRepository.foldAll` when
  * the log is unbounded.
  */
class StatefulStreamingSpec extends SparkSpec {

  private def row(id: String, user: String, topic: String, ms: Long) =
    EventRow(id, "evt", topic, new Timestamp(ms), "1.0", "{}", Map("user" -> user))

  test("per-key running fold with state store; state survives restart from checkpoint") {
    import spark.implicits._
    val logDir = tmpDir("stlog")
    val ckpt = tmpDir("stckpt")
    val log = new EventLog(spark, logDir)
    log.appendRows(Seq(
      row("e1", "alice", "st", 1000),
      row("e2", "bob", "st", 2000),
      row("e3", "alice", "st", 3000)))

    val emitted = scala.collection.mutable.Buffer.empty[(String, Long, Long)]
    def run(): Unit = {
      val stream = spark.readStream.schema(graft.model.Event.schema).parquet(logDir)
        .where(col("topic") === "st")
        .as[EventRow]
        .groupByKey(_.metadata("user"))
        .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
          (user: String, events: Iterator[EventRow], state: GroupState[(Long, Long)]) =>
            val (count0, last0) = state.getOption.getOrElse((0L, 0L))
            val evs = events.toSeq
            val count = count0 + evs.size
            val last = math.max(last0, evs.map(_.timestamp.getTime).max)
            state.update((count, last))
            (user, count, last)
        }
      val q = stream.writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[(String, Long, Long)], _: Long) =>
          batch.collect().foreach(emitted += _)
          ()
        }
        .start()
      q.awaitTermination()
    }
    run()
    assert(emitted.sortBy(_._1).toSeq == Seq(("alice", 2L, 3000L), ("bob", 1L, 2000L)))

    // restart: new events fold INTO the checkpointed state
    emitted.clear()
    log.appendRows(Seq(row("e4", "alice", "st", 9000), row("e5", "carol", "st", 4000)))
    run()
    assert(emitted.sortBy(_._1).toSeq == Seq(("alice", 3L, 9000L), ("carol", 1L, 4000L)))
  }

  test("flatMapGroupsWithState: sessions close via event-time timeout and emit once") {
    import spark.implicits._
    val logDir = tmpDir("sslog")
    val ckpt = tmpDir("ssckpt")
    val log = new EventLog(spark, logDir)
    val T0 = 1700000000000L
    val gapMs = 10000L // 10s session gap

    val closed = scala.collection.mutable.Buffer.empty[(String, Long, Long, Int)]
    def run(): Unit = {
      val stream = spark.readStream.schema(graft.model.Event.schema).parquet(logDir)
        .where(col("topic") === "ss")
        .withWatermark("timestamp", "0 seconds")
        .as[EventRow]
        .groupByKey(_.metadata("user"))
        .flatMapGroupsWithState[(Long, Long, Int), (String, Long, Long, Int)](
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
          (user, events, state: GroupState[(Long, Long, Int)]) =>
            if (state.hasTimedOut) {
              // gap elapsed in event time — the session is closed, emit it
              val (start, last, n) = state.get
              state.remove()
              Iterator((user, start, last, n))
            } else {
              val evs = events.toSeq
              val (s0, l0, n0) = state.getOption.getOrElse((Long.MaxValue, 0L, 0))
              val start = math.min(s0, evs.map(_.timestamp.getTime).min)
              val last = math.max(l0, evs.map(_.timestamp.getTime).max)
              state.update((start, last, n0 + evs.size))
              state.setTimeoutTimestamp(last + gapMs)
              Iterator.empty
            }
        }
      val q = stream.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[(String, Long, Long, Int)], _: Long) =>
          batch.collect().foreach(closed += _)
          ()
        }
        .start()
      q.awaitTermination()
    }

    // alice bursts twice within one session window
    log.appendRows(Seq(
      row("e1", "alice", "ss", T0),
      row("e2", "alice", "ss", T0 + 2000)))
    run()
    assert(closed.isEmpty) // session still open — gap not yet elapsed

    // a later event (other key) advances the watermark past alice's gap
    log.appendRows(Seq(row("e3", "bob", "ss", T0 + 60000)))
    run()
    val alice = closed.filter(_._1 == "alice")
    assert(alice.toSeq == Seq(("alice", T0, T0 + 2000, 2)))
  }
}
