package graft.lake

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Cast, EqualTo, ExprId, Expression}
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions.{col, lit, max, min}
import org.apache.spark.sql.types.StructType

/** Candidate-file pruning for MERGE (the Delta merge-scan trick): a merge
  * whose condition contains `t.k = s.k` conjuncts can only touch target
  * files whose per-file min/max for `k` overlap the SOURCE's observed
  * `[min(s.k), max(s.k)]` — one cheap aggregation over the source buys a
  * stats filter that keeps a 100 TB target's untouched files out of both
  * the prefilter join scan and (on the big-log path) the driver's
  * materialized candidate list entirely.
  *
  * Soundness: only TOP-LEVEL AND conjuncts are used (`cond = A ∧ B ⇒ A`
  * holds for every matched row), rows with a NULL key never satisfy an
  * equi-join conjunct, and unrecognized shapes simply contribute no
  * filter. Pruning is therefore never wrong — only less precise.
  */
private[lake] object MergePrune {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Strip the implicit cast analysis inserts when join-key types differ;
    * [[equiKeys]] then re-checks that the two NATIVE types share an
    * ordering before the pair may drive a range filter. */
  private def uncast(e: Expression): Expression = e match {
    case Cast(child, _, _, _) => uncast(child)
    case other => other
  }

  /** The source aggregates min/max in ITS column's native ordering and
    * the bounds are re-applied against the TARGET column's stats — only
    * sound when the two orderings agree on the shared value domain:
    * identical types, or numeric↔numeric (Spark compares those by
    * value). A string source key joined to a numeric target would
    * aggregate LEXICOGRAPHIC bounds (min "10" > max "9") and embed them
    * as the numeric range [10, 9] — an empty range that prunes files
    * holding true matches, turning updates into duplicate inserts. */
  private def orderCompatible(
      a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): Boolean =
    a == b ||
      (a.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
        b.isInstanceOf[org.apache.spark.sql.types.NumericType])

  /** `(targetColumn, sourceColumn)` pairs implied by every matched row,
    * read off the ANALYZED join condition — sides identified by exprId,
    * so no name guessing and no alias conventions. Pairs whose native
    * types do not share an ordering are dropped (prune nothing on them
    * — sound, just less precise). */
  def equiKeys(
      cond: Expression,
      tgtIds: Set[ExprId],
      srcIds: Set[ExprId]): Seq[(String, String)] =
    conjuncts(cond).flatMap {
      case EqualTo(l, r) =>
        (uncast(l), uncast(r)) match {
          case (a: AttributeReference, b: AttributeReference)
              if orderCompatible(a.dataType, b.dataType) =>
            if (tgtIds.contains(a.exprId) && srcIds.contains(b.exprId))
              Some((a.name, b.name))
            else if (srcIds.contains(a.exprId) && tgtIds.contains(b.exprId))
              Some((b.name, a.name))
            else None
          case _ => None
        }
      case _ => None
    }

  /** Target-side pruning filters from the source's equi-key value ranges:
    * ONE aggregation job over the source, `2 × |keys|` collected scalars.
    *
    *  - `Some(filters)` — conjoin with per-file stats (empty = no usable
    *    equi keys, prune nothing);
    *  - `None` — the source proves NO target row can match (empty source
    *    or an all-NULL join key): the caller can skip the scan outright.
    *
    * The condition is analyzed against an EMPTY frame with the target's
    * schema (no target I/O); keys whose type `lit` cannot re-embed
    * (arrays, structs) are skipped.
    */
  def sourceRangeFilters(
      spark: SparkSession,
      source: DataFrame,
      condition: Column,
      tgtSchema: StructType): Option[Seq[Column]] = {
    val emptyTgt = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], tgtSchema)
    val analyzed = emptyTgt.alias("t")
      .join(source.alias("s"), condition, "inner")
      .queryExecution.analyzed
    val keys = analyzed.collectFirst {
      case j: Join if j.condition.isDefined =>
        equiKeys(j.condition.get,
          j.left.output.map(_.exprId).toSet,
          j.right.output.map(_.exprId).toSet)
    }.getOrElse(Seq.empty)
    if (keys.isEmpty) return Some(Seq.empty)
    val aggs = keys.zipWithIndex.flatMap { case ((_, sk), i) =>
      Seq(min(col(sk)).as(s"__lo$i"), max(col(sk)).as(s"__hi$i"))
    }
    val row = source.agg(aggs.head, aggs.tail: _*).head()
    val ranges = keys.zipWithIndex.map { case ((tk, _), i) =>
      (tk, row.get(2 * i), row.get(2 * i + 1))
    }
    // a NULL min/max means the source has no non-null value for that key:
    // the equi-join conjunct can hold for no row at all
    if (ranges.exists { case (_, lo, hi) => lo == null || hi == null }) None
    else Some(ranges.flatMap { case (tk, lo, hi) =>
      try Some(col(tk) >= lit(lo) && col(tk) <= lit(hi))
      catch { case scala.util.control.NonFatal(_) => None }
    })
  }
}
