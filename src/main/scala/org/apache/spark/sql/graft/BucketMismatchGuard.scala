package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualNullSafe, EqualTo, ExprId}
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
    // every `_bucket` attribute served by a lake scan, keyed by exprId,
    // with the relation-level exprIds of its bucket COLUMNS (for the
    // implication check below)
    val specById: Map[ExprId, (Bucketing.Spec, Map[String, ExprId])] =
      plan.collect {
        case rel: DataSourceV2Relation if rel.table.isInstanceOf[LakeV2Table] =>
          val spec = rel.table.asInstanceOf[LakeV2Table].bucketingSpec
          val colIds = rel.output
            .map(a => a.name.toLowerCase -> a.exprId).toMap
          (rel.output ++ rel.metadataOutput)
            .filter(_.name == Bucketing.BUCKET_META_COL)
            .flatMap(a => spec.map(s => a.exprId -> (s, colIds)))
      }.flatten.toMap
    if (specById.isEmpty) return

    // Project/Aggregate renames give an attribute a NEW exprId; collect
    // every Alias-of-attribute in the plan so join keys that rode
    // through a rename still trace to their relation-level ids for the
    // implication check below. Alias of a non-attribute (cast, coalesce,
    // arithmetic) deliberately does NOT trace: a derived key is not the
    // raw bucket column, so its equality cannot imply bucket equality.
    val aliasParent: Map[ExprId, ExprId] = plan.collect { p =>
      p.expressions.flatMap(_.collect {
        case a: Alias => a.child match {
          case c: AttributeReference => Some(a.exprId -> c.exprId)
          case _ => None
        }
      }.flatten)
    }.flatten.toMap
    def rootOf(id: ExprId): ExprId = {
      var cur = id
      var depth = 0
      while (depth < 64 && aliasParent.contains(cur)) {
        cur = aliasParent(cur); depth += 1
      }
      cur
    }

    plan.foreach {
      case j: Join =>
        // every attribute-to-attribute equality of this join's
        // condition, null-safe (<=>) included — for the implication
        // check either form pins the bucket columns equal on every
        // SURVIVING row, which is all bucket-id equality needs
        val equalities: Seq[(AttributeReference, AttributeReference)] =
          j.condition.toSeq.flatMap(_.collect {
            case EqualTo(l: AttributeReference, r: AttributeReference) => (l, r)
            case EqualNullSafe(l: AttributeReference, r: AttributeReference) => (l, r)
          })
        val canonEq: Seq[(ExprId, ExprId)] =
          equalities.map { case (l, r) => (rootOf(l.exprId), rootOf(r.exprId)) }
        // membership in specById (keyed by the relations' `_bucket`
        // metadata-attribute ids) identifies the bucket-id equality —
        // by traced id, not name, so a renamed `_bucket` is still seen
        equalities.foreach {
          case (l, r) if specById.contains(rootOf(l.exprId)) &&
              specById.contains(rootOf(r.exprId)) =>
            (specById.get(rootOf(l.exprId)), specById.get(rootOf(r.exprId))) match {
              case (Some((a, aCols)), Some((b, bCols))) =>
                if (a.numBuckets != b.numBuckets ||
                    a.columns.map(_.toLowerCase) != b.columns.map(_.toLowerCase))
                  throw new UnsupportedOperationException(
                    "join on _bucket requires both lake tables to share one " +
                      s"bucket layout, but got bucket(${a.numBuckets}, " +
                      s"${a.columns.mkString(",")}) vs bucket(${b.numBuckets}, " +
                      s"${b.columns.mkString(",")}); the extra _bucket equality " +
                      "would silently drop matches — rebucket one side " +
                      "(LakeTable.rebucket) to align the layouts")
                // `a._bucket = b._bucket` is IMPLIED (and therefore safe)
                // only when the join also equates every bucket column
                // across the same two tables — bucket ids are a function
                // of exactly those columns. A join keyed on anything less
                // would use the _bucket equality as an extra filter and
                // silently drop matches that hash to different buckets.
                // canonEq traces renames, so a bucket column equated
                // under an alias still proves the implication; a key
                // equated only through a DERIVED expression (cast,
                // coalesce) does not trace and correctly fails — the
                // bucket id is a function of the raw column
                val missing = a.columns.map(_.toLowerCase).filterNot { c =>
                  (aCols.get(c), bCols.get(c)) match {
                    case (Some(ai), Some(bi)) => canonEq.exists { case (x, y) =>
                      (x == ai && y == bi) || (x == bi && y == ai)
                    }
                    // defensive: a scan whose output lacks the bucket
                    // column (never the case for lake schemas today) —
                    // cannot prove absence, let it pass
                    case _ => true
                  }
                }
                if (missing.nonEmpty)
                  throw new UnsupportedOperationException(
                    s"join on _bucket also requires equality on the bucket " +
                      s"column(s) ${missing.mkString(", ")} between the same " +
                      "two tables — _bucket is derived from exactly those " +
                      "columns, so without them the _bucket equality is an " +
                      "extra filter that silently drops matches")
              case _ => ()
            }
          case _ => ()
        }
      case _ => ()
    }
  }
}
