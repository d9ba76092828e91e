package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Restores parquet min/max pruning for the nanosecond-typed `events`
  * fixture (TESTDATA.md): its `ts` column is TIMESTAMP(NANOS), which the
  * vectorized reader only accepts as a raw Long, so [[graft.sources.Tables]]
  * exposes `ts = timestamp_micros(ts_ns div 1000)`. Range predicates written
  * against that derived column — `ts >= TIMESTAMP '…'` — are opaque to the
  * datasource filter translator, so without help the scan reads every row
  * group (at 100 TB: every byte of the log for a one-day query).
  *
  * This rule runs at the end of optimization (after PushDownPredicates has
  * inlined the projection into the Filter) and ADDS the implied bound on the
  * raw nanos column as a redundant conjunct:
  *
  *   timestamp_micros(ns div 1000) >= T  ⟹  ns >= micros(T) * 1000
  *   timestamp_micros(ns div 1000) <= T  ⟹  ns <= micros(T) * 1000 + 999
  *
  * The original predicate is kept (the rewrite is predicate *injection*, not
  * replacement, so correctness never depends on the divide semantics), but
  * the new conjunct is a plain comparison on a scan column, which
  * FileSourceStrategy pushes to the parquet reader → row-group pruning.
  *
  * Soundness: `div` on non-negative longs is floor division, and micros(T)
  * >= 1 forces the matched rows' nanos positive, so each implication above
  * holds for every row the original predicate accepts. Negative-epoch bounds
  * (pre-1970) are left alone rather than reasoned about.
  */
object NanoTimestampPushdown extends Rule[LogicalPlan] with PredicateHelper {

  /** Largest micros value whose *1000(+999) stays in Long range. */
  private val MaxMicros = (Long.MaxValue - 999L) / 1000L

  /** Matches `timestamp_micros(ns div 1000)` and yields the nanos expr. */
  private object MicrosOfNanos {
    def unapply(e: Expression): Option[Expression] = e match {
      case m: MicrosToTimestamp =>
        m.child match {
          case d: IntegralDivide
              if d.left.deterministic && d.right.foldable &&
                d.right.dataType == LongType && d.right.eval() == 1000L =>
            Some(d.left)
          case _ => None
        }
      case _ => None
    }
  }

  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(t: Long, TimestampType) => Some(t)
      case _ => None
    }
  }

  // μ(ns) >= t  ⟹  ns >= t*1000   (sound for t >= 1: original forces ns > 0)
  private def geNanos(ns: Expression, t: Long): Seq[Expression] =
    if (t >= 1 && t <= MaxMicros) Seq(GreaterThanOrEqual(ns, Literal(t * 1000L))) else Nil

  // μ(ns) <= t  ⟹  ns <= t*1000 + 999   (sound for t >= 0)
  private def leNanos(ns: Expression, t: Long): Seq[Expression] =
    if (t >= 0 && t <= MaxMicros) Seq(LessThanOrEqual(ns, Literal(t * 1000L + 999L))) else Nil

  private def derived(e: Expression): Seq[Expression] = e match {
    case GreaterThanOrEqual(MicrosOfNanos(ns), TsLit(t)) => geNanos(ns, t)
    case LessThanOrEqual(TsLit(t), MicrosOfNanos(ns)) => geNanos(ns, t)
    case GreaterThan(MicrosOfNanos(ns), TsLit(t)) if t < Long.MaxValue => geNanos(ns, t + 1)
    case LessThan(TsLit(t), MicrosOfNanos(ns)) if t < Long.MaxValue => geNanos(ns, t + 1)
    case LessThanOrEqual(MicrosOfNanos(ns), TsLit(t)) => leNanos(ns, t)
    case GreaterThanOrEqual(TsLit(t), MicrosOfNanos(ns)) => leNanos(ns, t)
    case LessThan(MicrosOfNanos(ns), TsLit(t)) if t > Long.MinValue => leNanos(ns, t - 1)
    case GreaterThan(TsLit(t), MicrosOfNanos(ns)) if t > Long.MinValue => leNanos(ns, t - 1)
    case EqualTo(MicrosOfNanos(ns), TsLit(t)) => geNanos(ns, t) ++ leNanos(ns, t)
    case EqualTo(TsLit(t), MicrosOfNanos(ns)) => geNanos(ns, t) ++ leNanos(ns, t)
    case _ => Nil
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val extra = conjuncts
        .flatMap(c => derived(c))
        .filter(_.references.subsetOf(child.outputSet))
        // idempotence: never re-add a bound already present (the rule runs in
        // a fixed-point batch) and dedup bounds derived twice
        .foldLeft(Seq.empty[Expression]) { (acc, d) =>
          if ((conjuncts ++ acc).exists(_.semanticEquals(d))) acc else acc :+ d
        }
      if (extra.isEmpty) f else Filter(extra.foldLeft(cond)(And(_, _)), child)
  }

  /** Idempotently add this rule to a session's extra optimizer batch. */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations ++= Seq(this)
  }
}
