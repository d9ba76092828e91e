package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters — exact-when-possible top-k over an unbounded
  * item domain with BOUNDED state: the Space-Saving sketch (Metwally et
  * al., "Efficient computation of frequent and top-k elements in data
  * streams") kept per group in the state store.
  *
  * Within one group the sketch holds at most `capacity` counters. A seen
  * item increments its counter; an unseen item when full EVICTS the
  * minimum counter and inherits its count+1, recording that count as the
  * new entry's maximum overestimate (`err`). Guarantees (the paper's):
  * reported count ≥ true count ≥ reported − err, and any item with true
  * frequency > N/capacity is present — so with capacity ≫ k the top-k is
  * trustworthy, and `err` says exactly how much to trust each row.
  *
  * Determinism: rows fold in (timestamp, item) order and eviction
  * tie-breaks on item, so replays and different batchings emit
  * identically. Scale shape: state is ≤ capacity (item, count, err)
  * triples per group — independent of stream length; the only shuffle is
  * the group key.
  */
object StreamingTopK {

  final case class HeavyHitter(group: String, item: String,
      count: Long, err: Long, rank: Int)

  /** One Space-Saving step: pure, so the sketch laws are property-testable
    * without a streaming harness (LawProps drives this against brute-force
    * counts on random feeds).
    */
  private[graft] def foldSketch(sk: Map[String, (Long, Long)], item: String,
      capacity: Int): Map[String, (Long, Long)] =
    sk.get(item) match {
      case Some((c, e)) => sk.updated(item, (c + 1, e))
      case None if sk.size < capacity => sk.updated(item, (1L, 0L))
      case None =>
        val (evict, (minC, _)) = sk.minBy { case (i, (c, _)) => (c, i) }
        (sk - evict).updated(item, (minC + 1, minC))
    }

  /** Top-`k` items per group after each micro-batch (`OutputMode.Update`):
    * the current sketch ranking, recomputed as state absorbs the batch.
    */
  def topK(stream: DataFrame, groupCol: String, tsCol: String, itemCol: String,
      k: Int = 10, capacity: Int = 256): Dataset[HeavyHitter] = {
    require(k <= capacity, "k beyond sketch capacity is unreportable")
    val s = stream.sparkSession
    import s.implicits._
    stream
      .select(col(groupCol).cast("string"), col(tsCol).cast("timestamp"),
        col(itemCol).cast("string"))
      .as[(String, Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (group: String, rows: Iterator[(String, Timestamp, String)],
         state: GroupState[Map[String, (Long, Long)]]) =>
          var sk = state.getOption.getOrElse(Map.empty[String, (Long, Long)])
          rows.toVector.sortBy(r => (r._2.getTime, r._3)).foreach { case (_, _, item) =>
            sk = foldSketch(sk, item, capacity)
          }
          state.update(sk)
          sk.toVector
            .sortBy { case (i, (c, _)) => (-c, i) }
            .take(k).zipWithIndex
            .map { case ((i, (c, e)), r) => HeavyHitter(group, i, c, e, r + 1) }
            .iterator
      }
  }
}
