package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types._

import graft.lake.AddFile

/** Metadata-only aggregates: `SELECT count(*) / count(c) / min(c) /
  * max(c) FROM lake.db.t` answered from the commit log's per-file stats
  * without touching a single data file — Delta's
  * OptimizeMetadataOnlyDeltaQuery. At 100 TB the difference between a
  * log read and a full scan.
  *
  * Strictly conservative — the rule bails (leaving the scan in place)
  * unless the log PROVES the answer:
  *  - count(*): every live file carries numRecords; deletion vectors
  *    subtract their cardinality.
  *  - count(c): additionally needs a nullCount for c in every file, and
  *    no DVs (a masked row's nullness is unknown to the log).
  *  - min/max(c): numeric/date/timestamp columns, plus default-collation
  *    strings with short recorded bounds (parquet footer bounds and
  *    Spark's UTF8_BINARY collation share unsigned-byte order; bounds
  *    long enough to be truncation artifacts bail); no DVs (the
  *    extremum could be a deleted row); and every file either carries
  *    the column's range or is provably all-null in c.
  */
class LakeMetadataAggRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDown {
      case agg @ Aggregate(Nil, exprs, child, _) =>
        lakeBelow(child) match {
          case Some(t) => answer(t, exprs).getOrElse(agg)
          case None => agg
        }
    }

  /** The LakeV2Table under aliases / a pure-column Project, if any. */
  private def lakeBelow(plan: LogicalPlan): Option[LakeV2Table] = plan match {
    case SubqueryAlias(_, c) => lakeBelow(c)
    case Project(projList, c) if projList.forall(_.isInstanceOf[AttributeReference]) =>
      lakeBelow(c)
    case r: DataSourceV2Relation => r.table match {
      case t: LakeV2Table => Some(t)
      case _ => None
    }
    case _ => None
  }

  private def answer(t: LakeV2Table, exprs: Seq[NamedExpression])
      : Option[LogicalPlan] = {
    val files = t.snap.files
    val hasDvs = t.hasDvs

    def liveRows(f: AddFile): Option[Long] =
      f.stats.map(_.numRecords - f.dvCardinality)

    def countStar: Option[Long] =
      files.foldLeft(Option(0L)) { (acc, f) =>
        for (a <- acc; n <- liveRows(f)) yield a + n
      }

    def countCol(name: String): Option[Long] =
      if (hasDvs) None
      else files.foldLeft(Option(0L)) { (acc, f) =>
        for {
          a <- acc
          st <- f.stats
          nc <- st.nullCount.get(name)
        } yield a + (st.numRecords - nc)
      }

    def decode(dt: DataType, s: String): Option[Any] =
      try dt match {
        case ByteType => Some(s.toByte)
        case ShortType => Some(s.toShort)
        case IntegerType => Some(s.toInt)
        case LongType => Some(s.toLong)
        case DateType => Some(s.toInt)       // canonical: days
        case TimestampType => Some(s.toLong) // canonical: micros
        case StringType =>
          Some(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        case _ => None
      } catch { case _: Exception => None }

    def numericCmp(dt: DataType, a: String, b: String): Int = dt match {
      case StringType =>
        // binary (unsigned byte) order — BOTH parquet footer bounds and
        // Spark's default UTF8_BINARY collation compare this way
        org.apache.spark.unsafe.types.UTF8String.fromString(a)
          .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))
      case _ => BigDecimal(a).compare(BigDecimal(b))
    }

    /** A string bound trusted as an exact VALUE: shorter than any
      * plausible footer truncation threshold — a <64-char stored bound
      * was not truncated under parquet-mr's 64 default OR its
      * untruncated default. Longer bounds may be truncation artifacts
      * (valid for skipping, not as an answer) → bail to the scan.
      */
    def trustedStringBound(s: String): Boolean = s.length < 64

    /** Fold min or max over files; Some(None) = provably null (no
      * non-null values), None = cannot prove. */
    def extremum(attr: Attribute, isMin: Boolean): Option[Option[Any]] = {
      if (hasDvs) return None
      // deliberately NOT foldable: float/double (a NaN-excluded footer
      // bound understates Spark's NaN-greatest max, and Infinity breaks
      // the numeric fold — Delta excludes them too) and decimals (footer
      // stats carry the UNSCALED backing integer, the aggregation-path
      // stats the scaled rendering — ambiguous at read time)
      attr.dataType match {
        case ByteType | ShortType | IntegerType | LongType |
             DateType | TimestampType | StringType => ()
        case _ => return None
      }
      val name = attr.name
      var best: Option[String] = None
      for (f <- files) {
        f.stats match {
          case None => return None
          case Some(st) =>
            val bound = if (isMin) st.minValues.get(name) else st.maxValues.get(name)
            bound match {
              case Some(v) =>
                if (attr.dataType == StringType && !trustedStringBound(v))
                  return None
                best = Some(best match {
                  case Some(b) =>
                    val c = numericCmp(attr.dataType, v, b)
                    if ((isMin && c < 0) || (!isMin && c > 0)) v else b
                  case None => v
                })
              case None =>
                // no range: only safe if the column is provably all-null
                if (!st.nullCount.get(name).contains(st.numRecords)) return None
            }
        }
      }
      best match {
        case Some(v) => decode(attr.dataType, v).map(Some(_))
        case None => Some(None) // zero non-null values → SQL null
      }
    }

    val values: Seq[Option[Any]] = exprs.map {
      case Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(l: Literal)) if l.value != null =>
            countStar.map(v => v: Any) // count(NULL) counts nothing — bail
          case Count(Seq(a: AttributeReference)) => countCol(a.name).map(v => v: Any)
          case Min(a: AttributeReference) => extremum(a, isMin = true).map(_.orNull)
          case Max(a: AttributeReference) => extremum(a, isMin = false).map(_.orNull)
          case _ => None
        }
      case Alias(l: Literal, _) => Some(l.value)
      case _ => None
    }

    if (values.exists(_.isEmpty)) None
    else Some(LocalRelation(exprs.map(_.toAttribute),
      Seq(InternalRow.fromSeq(values.map(_.get)))))
  }
}
