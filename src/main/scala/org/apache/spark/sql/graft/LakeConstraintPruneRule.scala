package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Constraint pushdown to the optimizer (NEXT.md r4 #4): CHECK
  * constraints hold for every row of a lake table (validated on ADD,
  * enforced on every write path), so a filter whose predicate
  * contradicts them is provably empty — the whole scan branch collapses
  * to an empty [[LocalRelation]] at optimization time, before any file
  * is listed. Joins/unions over the pruned branch then fold away via
  * Spark's own PropagateEmptyRelation.
  *
  * Satisfiability is decided by the SAME three-valued evaluator used for
  * per-file data skipping, fed a phantom table-level stats record built
  * from the constraint conjuncts ([[graft.lake.Stats.constraintStats]]).
  * Spark 4's DSv2 `Table.constraints()` API exists but the optimizer
  * does not yet consume CHECK bounds for pruning — this rule supplies
  * that piece for lake tables.
  */
class LakeConstraintPruneRule(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, r: DataSourceV2Relation)
        if r.table.isInstanceOf[LakeV2Table] =>
      val t = r.table.asInstanceOf[LakeV2Table]
      val constraints = graft.lake.Constraints.parsed(t.snap.metaData)
      if (constraints.nonEmpty &&
        graft.lake.Stats.contradictsConstraints(cond, constraints, t.snap.schema))
        LocalRelation(f.output)
      else f
  }
}
