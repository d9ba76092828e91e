package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming quantiles over an unbounded value stream with BOUNDED state:
  * the portable log-binned histogram of q119 (HDR/DDSketch-style — cents,
  * bit-length octave, 6-bit sub-buckets) kept per group in the state
  * store and re-estimated after every micro-batch.
  *
  * The sketch is the SAME law the batch query pins cross-engine: a value
  * becomes integer cents c; its bucket is (b, h) where b = len(bin(c))
  * and h = c >> s with s = max(b-6, 0); a quantile estimate walks the
  * buckets in (b, h) order to the first cumulative count ≥ ceil(q·n) and
  * reports that bucket's midpoint (h<<s) + (1<<(s-1)). Every bucket spans
  * at most 2^(b-6) of a value ≥ 2^(b-1), so the estimate is within ~1/64
  * relative — and the guarantee survives ANY merge order because buckets
  * are exact integer counts (the mergeable-sketch property q120 exploits
  * for rollups; here the merge is the state fold itself).
  *
  * Scale shape: state is ≤ 64 sub-buckets per octave per group —
  * independent of stream length; rows fold as pure counting (no order
  * sensitivity at all, unlike Space-Saving); the only shuffle is the
  * group key. The streaming twin of q119 the way StreamingTopK twins
  * q93's heavy hitters and StreamingAnomaly twins q90's z-scores.
  */
object StreamingQuantile {

  final case class QuantileEstimate(group: String, q: String,
      est: Double, n: Long)

  /** Default quantile set — q119's. */
  val DefaultQs: Seq[(String, Double)] =
    Seq(("p50", 0.5), ("p95", 0.95), ("p99", 0.99))

  /** Bucket of integer cents `c` (≥ 0): (bit-length, shifted-high-bits).
    * Pure, so the sketch laws are property-testable without a streaming
    * harness.
    */
  private[graft] def bucketOf(c: Long): (Int, Long) = {
    val b = if (c == 0L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(c)
    val s = math.max(b - 6, 0)
    (b, c >> s)
  }

  /** The inclusive value range a bucket covers — the estimate's error
    * bound IS this interval.
    */
  private[graft] def bucketRange(b: Int, h: Long): (Long, Long) = {
    val s = math.max(b - 6, 0)
    if (s == 0) (h, h) else (h << s, ((h + 1) << s) - 1)
  }

  private[graft] def foldSketch(sk: Map[(Int, Long), Long],
      c: Long): Map[(Int, Long), Long] = {
    val k = bucketOf(c)
    sk.updated(k, sk.getOrElse(k, 0L) + 1L)
  }

  /** Midpoint estimate (in cents) for quantile `qv` — exactly q119's
    * first-bucket-past-ceil(q·n) walk.
    */
  private[graft] def estimate(sk: Map[(Int, Long), Long], qv: Double): Long = {
    val total = sk.valuesIterator.sum
    val target = math.ceil(qv * total).toLong
    var cum = 0L
    for (((b, h), n) <- sk.toVector.sortBy { case ((b, h), _) => (b, h) }) {
      cum += n
      if (cum >= target) {
        val s = math.max(b - 6, 0)
        return if (s > 0) (h << s) + (1L << (s - 1)) else h
      }
    }
    0L // empty sketch
  }

  /** Per-group quantile estimates after each micro-batch
    * (`OutputMode.Update`): `valueCol` is a price-like double, binned at
    * cent precision like the batch law.
    */
  def quantiles(stream: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[(String, Double)] = DefaultQs): Dataset[QuantileEstimate] = {
    val s = stream.sparkSession
    import s.implicits._
    stream
      .select(col(groupCol).cast("string"),
        org.apache.spark.sql.functions.round(col(valueCol).cast("double") * 100)
          .cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (group: String, rows: Iterator[(String, Long)],
         state: GroupState[Map[(Int, Long), Long]]) =>
          var sk = state.getOption.getOrElse(Map.empty[(Int, Long), Long])
          rows.foreach { case (_, c) => sk = foldSketch(sk, c) }
          state.update(sk)
          val n = sk.valuesIterator.sum
          qs.map { case (name, qv) =>
            QuantileEstimate(group, name, estimate(sk, qv) / 100.0, n)
          }.iterator
      }
  }
}
