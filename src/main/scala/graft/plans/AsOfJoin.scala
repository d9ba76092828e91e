package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.DatasetShim

/** As-of join as a first-class Catalyst operator — the whole-operator
  * extension rung of the ladder (logical node → strategy → physical node),
  * complementing the expression rung (`DotProductD`, `ShinglesExpr`) and
  * the rule rung (`NanoTimestampPushdown`).
  *
  * Semantics: LEFT OUTER as-of — for each left row, the single right row
  * with an equal key and the greatest `(time, tie)` pair that is strictly
  * below (`strict = true`) or at-or-below (`strict = false`) the left row's
  * `(time, tie)`; with `forward = true`, symmetrically the SMALLEST pair
  * above (or at-or-above). Unmatched left rows keep null right columns. Null
  * key/time/tie values follow SQL join semantics: a row carrying one never
  * matches anything (a null-keyed left row emits null right columns). The `tie`
  * columns make the match deterministic when timestamps collide — the same
  * `(ts, id)` tie-break law the event log pins for replay order
  * (reference: src/persistence.ts:120-135 sorts replay the same way).
  *
  * Physical execution is a single-pass sort-merge: both sides hash-cluster
  * on the key and sort by `(key, time, tie)` — requirements DECLARED to the
  * planner (`requiredChildDistribution` / `requiredChildOrdering`), so
  * EnsureRequirements plans the shuffles/sorts, AQE can re-plan them, and
  * reuse/pushdown around the node keep working. Each co-located partition
  * pair then merges with one cursor per side: right rows are consumed at
  * most once, carrying O(1) state (the latest candidate per key). At 100 TB
  * that is the same cost envelope as a shuffled sort-merge join — no per-row
  * range probe, no re-scan, no state growth with key cardinality — and is
  * the plan shape q27 builds by hand with a window; this operator makes it
  * a reusable primitive instead of a spelling.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    leftTie: Expression, rightTie: Expression,
    strict: Boolean,
    toleranceUnits: Option[Long] = None,
    forward: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]; a no-op for everything else. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      AsOfJoinExec(j.leftKey, j.rightKey, j.leftTime, j.rightTime,
        j.leftTie, j.rightTie, j.strict, j.toleranceUnits, j.forward,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    leftTie: Expression, rightTie: Expression,
    strict: Boolean,
    toleranceUnits: Option[Long],
    forward: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  // tolerance needs raw time arithmetic: the time column's physical long
  // (timestamp = micros) or integral value. Checked at plan construction
  // (AsOf.join), asserted here for direct constructors.
  if (toleranceUnits.isDefined) {
    import org.apache.spark.sql.types._
    require(Seq(TimestampType, TimestampNTZType, LongType, IntegerType)
      .contains(leftTime.dataType),
      s"tolerance requires a timestamp or integral time column, got ${leftTime.dataType}")
  }

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // UI-visible operator metrics: output cardinality is left's by
  // construction, so numMatched is the one that tells an operator whether
  // its as-of actually found partners
  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched left rows"))

  /** Both sides clustered on the key: EnsureRequirements inserts (and AQE
    * tunes) co-partitioned exchanges exactly as for a shuffled join.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  /** (key, time, tie) ascending on both sides — the merge's only contract. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending),
      SortOrder(leftTie, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  /** Left rows pass through in place: partitioning and ordering survive,
    * so a downstream window/sort over the same key plans no new exchange.
    */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val out = output
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // bind on the executor: projections/orderings are not serializable
      val lKeyP = UnsafeProjection.create(Seq(leftKey), lOut)
      val lTimeP = UnsafeProjection.create(Seq(leftTime, leftTie), lOut)
      val rKeyP = UnsafeProjection.create(Seq(rightKey), rOut)
      val rTimeP = UnsafeProjection.create(Seq(rightTime, rightTie), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(leftKey.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(
        Seq(leftTime.dataType, leftTie.dataType))
      // bind the right side as NULLABLE: BoundReference nullability comes
      // from the input schema, and unmatched lefts emit an all-null right
      val resultProj = UnsafeProjection.create(out,
        lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      new Iterator[InternalRow] {
        // the right cursor and the latest candidate (copies: child rows are
        // reused mutable buffers)
        private var rRow: InternalRow = _
        private var rKey: UnsafeRow = _
        private var rTimeTie: UnsafeRow = _
        private var matchRow: InternalRow = _
        private var matchKey: UnsafeRow = _
        private var matchTime: UnsafeRow = _
        advanceRight()

        // staleness gate: the candidate must lie within `toleranceUnits`
        // of the left's time (raw physical units — micros for timestamps).
        // Checked at EMIT, so merge state stays the O(1) latest candidate;
        // a stale candidate is simply not used (and may be replaced by a
        // newer right before the next left asks).
        private val timeIsInt = leftTime.dataType ==
          org.apache.spark.sql.types.IntegerType
        private def rawTime(r: UnsafeRow): Long =
          if (timeIsInt) r.getInt(0).toLong else r.getLong(0)
        private def withinTolerance(mt: UnsafeRow, lt: UnsafeRow): Boolean =
          toleranceUnits.forall { tol =>
            val gap = if (forward) rawTime(mt) - rawTime(lt)
                      else rawTime(lt) - rawTime(mt)
            gap <= tol
          }

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            val r = rIter.next()
            rRow = r.copy()
            rKey = rKeyP(rRow).copy()
            rTimeTie = rTimeP(rRow).copy()
          } else rRow = null

        // SQL null semantics: a null key/time/tie on either side never
        // matches (natural ordering would otherwise equate nulls and sort
        // a null time "before everything" — i.e. into a spurious match)
        private def rHasNull: Boolean =
          rKey.isNullAt(0) || rTimeTie.isNullAt(0) || rTimeTie.isNullAt(1)

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyP(l) // reused buffers — consumed within this call
          val lt = lTimeP(l)
          if (lk.isNullAt(0) || lt.isNullAt(0) || lt.isNullAt(1)) {
            numOutputRows += 1
            return resultProj(joined(l, nullRight)) // null never matches
          }
          val m = if (forward) forwardMatch(lk, lt) else backwardMatch(lk, lt)
          if (m ne nullRight) numMatched += 1
          numOutputRows += 1
          resultProj(joined(l, m))
        }

        // consume every right row at or before this left position; the
        // last equal-key NON-NULL one consumed is the as-of match
        private def backwardMatch(lk: UnsafeRow, lt: UnsafeRow): InternalRow = {
          var continue = rRow != null
          while (continue) {
            val kc = keyOrd.compare(rKey, lk)
            val tc = if (kc == 0) timeOrd.compare(rTimeTie, lt) else 0
            if (kc < 0 || (kc == 0 && (if (strict) tc < 0 else tc <= 0))) {
              if (kc == 0 && !rHasNull) {
                matchRow = rRow; matchKey = rKey; matchTime = rTimeTie
              }
              advanceRight()
              continue = rRow != null
            } else continue = false
          }
          if (matchRow != null && keyOrd.compare(matchKey, lk) == 0 &&
            withinTolerance(matchTime, lt)) matchRow
          else nullRight
        }

        // FORWARD: skip every right at or before this left position (plus
        // null-bearing rows — they never match anyone, so consuming them
        // is always safe), then PEEK the cursor: the first equal-key right
        // above the left is the match, and it stays unconsumed because the
        // next left — ascending — may need the same row. No candidate
        // state at all; lefts sorted ascending make every skip permanent.
        private def forwardMatch(lk: UnsafeRow, lt: UnsafeRow): InternalRow = {
          var continue = rRow != null
          while (continue) {
            if (rHasNull) { advanceRight(); continue = rRow != null }
            else {
              val kc = keyOrd.compare(rKey, lk)
              val tc = if (kc == 0) timeOrd.compare(rTimeTie, lt) else 0
              if (kc < 0 || (kc == 0 && (if (strict) tc <= 0 else tc < 0))) {
                advanceRight(); continue = rRow != null
              } else continue = false
            }
          }
          if (rRow != null && keyOrd.compare(rKey, lk) == 0 &&
            withinTolerance(rTimeTie, lt)) rRow
          else nullRight
        }
      }
    }
  }
}

/** DataFrame-level entry point. */
object AsOf {

  /** As-of join `left` to `right`: per left row, the latest right row with
    * `key` equal and `(time, tie)` before the left's (strictly, by
    * default). Left outer; inputs need distinct column names across sides.
    * Registers [[AsOfJoinStrategy]] on the session on first use.
    *
    * `tolerance` bounds staleness: a candidate older than the left's time
    * by more than the duration is treated as no match (the feature-join
    * guard — "the last click, but only if within the session horizon").
    * Timestamp time columns take the duration exactly; integral time
    * columns interpret it as milliseconds.
    *
    * `forward = true` flips the direction: the EARLIEST right row strictly
    * after (inclusive with `strict = false`) the left's `(time, tie)` —
    * "the next fill after the order", "the response to the request".
    * Tolerance then bounds how far AHEAD the match may be. Same merge cost
    * either way: one ascending pass, rights consumed at most once.
    */
  def join(left: DataFrame, right: DataFrame,
      key: (String, String), time: (String, String), tie: (String, String),
      strict: Boolean = true,
      tolerance: Option[java.time.Duration] = None,
      forward: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"column $name not found among ${p.output.map(_.name).mkString(", ")}"))
    val lTime = attr(lp, time._1)
    val tolUnits = tolerance.map { d =>
      import org.apache.spark.sql.types._
      lTime.dataType match {
        case TimestampType | TimestampNTZType => d.toNanos / 1000L // micros
        case LongType | IntegerType => d.toMillis
        case other => throw new IllegalArgumentException(
          s"tolerance requires a timestamp or integral time column, got $other")
      }
    }
    DatasetShim.ofRows(spark, AsOfJoinPlan(lp, rp,
      attr(lp, key._1), attr(rp, key._2),
      lTime, attr(rp, time._2),
      attr(lp, tie._1), attr(rp, tie._2), strict, tolUnits, forward))
  }
}
