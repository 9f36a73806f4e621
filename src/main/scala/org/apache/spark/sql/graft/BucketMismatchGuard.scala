package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, ExprId}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.lake.Bucketing

/** Plan-time guard for the multi-column SPJ convention: a join that
  * includes `a._bucket = b._bucket` is only correct when BOTH lake tables
  * bucket the SAME columns with the SAME numBuckets — otherwise the extra
  * predicate is not implied by the key equalities and silently drops
  * matches. Both sides' specs are known to the planner, so mismatches
  * fail analysis loudly instead of relying on users reading the
  * [[graft.lake.Bucketing]] scaladoc. Rebucket one side
  * ([[graft.lake.LakeTable.rebucket]]) to align the layouts.
  */
class BucketMismatchGuard(session: SparkSession) extends (LogicalPlan => Unit) {

  override def apply(plan: LogicalPlan): Unit = {
    // every `_bucket` attribute served by a lake scan, keyed by exprId
    val specById: Map[ExprId, Bucketing.Spec] = plan.collect {
      case rel: DataSourceV2Relation if rel.table.isInstanceOf[LakeV2Table] =>
        val spec = rel.table.asInstanceOf[LakeV2Table].bucketingSpec
        (rel.output ++ rel.metadataOutput)
          .filter(_.name == Bucketing.BUCKET_META_COL)
          .flatMap(a => spec.map(a.exprId -> _))
    }.flatten.toMap
    if (specById.isEmpty) return

    plan.foreach {
      case j: Join =>
        j.condition.foreach(_.foreach {
          case EqualTo(l: AttributeReference, r: AttributeReference)
              if l.name == Bucketing.BUCKET_META_COL &&
                r.name == Bucketing.BUCKET_META_COL =>
            (specById.get(l.exprId), specById.get(r.exprId)) match {
              case (Some(a), Some(b))
                  if a.numBuckets != b.numBuckets ||
                    a.columns.map(_.toLowerCase) != b.columns.map(_.toLowerCase) =>
                throw new UnsupportedOperationException(
                  "join on _bucket requires both lake tables to share one " +
                    s"bucket layout, but got bucket(${a.numBuckets}, " +
                    s"${a.columns.mkString(",")}) vs bucket(${b.numBuckets}, " +
                    s"${b.columns.mkString(",")}); the extra _bucket equality " +
                    "would silently drop matches — rebucket one side " +
                    "(LakeTable.rebucket) to align the layouts")
              case _ => ()
            }
          case _ => ()
        })
      case _ => ()
    }
  }
}
