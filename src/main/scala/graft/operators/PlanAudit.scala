package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, Window => LWindow}

/** Plan LINTER — the scale rules `GlobalPlanAuditSpec` enforces over the
  * query pack, exposed as an operator so a user can vet their own queries
  * before submitting them to a 1000-executor cluster:
  *
  *   - `cartesian`: the physical plan contains a CartesianProduct —
  *     unbounded pair work. (Bounded cross joins against a 1-row or
  *     broadcast side plan as BroadcastNestedLoopJoin and don't flag.)
  *   - `globalWindow`: an unpartitioned window runs directly over per-row
  *     data — the single-task global sort. Global windows above an
  *     Aggregate or a Limit are fine (group-count- or k-sized input).
  *   - `exchanges`: shuffle count in the physical plan — not a failure,
  *     but the number a reviewer should justify.
  *
  * Building the report PLANS the frame (optimizer + physical planning)
  * but executes nothing.
  */
object PlanAudit {

  final case class Report(cartesian: Boolean, globalWindow: Boolean,
      exchanges: Int) {
    def ok: Boolean = !cartesian && !globalWindow
  }

  def audit(df: DataFrame): Report = {
    val phys = df.queryExecution.executedPlan.toString
    val globalWindow = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty =>
        w.child.collectFirst {
          case _: GlobalLimit => true
          case _: Aggregate   => true
        }.isEmpty
    }.exists(identity)
    Report(
      cartesian = phys.contains("CartesianProduct"),
      globalWindow = globalWindow,
      exchanges = "(?m)^\\s*[+:]?-?\\s*Exchange".r.findAllIn(phys).size)
  }
}
