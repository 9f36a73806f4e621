package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset profiling (the data-quality survey step of a curation
  * pipeline): one output row per column with row/null/distinct counts
  * and canonical min/max strings — the summary a pipeline stores per
  * ingest batch to gate downstream training jobs.
  *
  * ONE aggregation job computes every column's statistics (null counts
  * and min/max are plain aggregates; distinct counts expand the
  * aggregate per column — the standard multi-count-distinct plan), then
  * a `stack` unpivot reshapes driver-side-free into the per-column
  * frame. Min/max render through the same canonical encodings the
  * stats layer uses (timestamps as micros, dates as days), so profiles
  * of the same data agree across engines byte-for-byte.
  */
object Profile {

  private def canon(name: String, dt: DataType, agg: String): org.apache.spark.sql.Column = {
    val base = if (agg == "min") min(col(name)) else max(col(name))
    dt match {
      case TimestampType => unix_micros(base).cast("string")
      // session timezone is the engine's UTC convention, so the NTZ →
      // instant cast is identity and micros agree with a naive oracle
      case TimestampNTZType =>
        unix_micros(base.cast(TimestampType)).cast("string")
      case DateType => unix_date(base).cast("string")
      case _ => base.cast("string")
    }
  }

  private def profilable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | StringType | TimestampType | TimestampNTZType |
         DateType | BooleanType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Profile `cols` (default: every profilable column). Output:
    * (col_name, n_rows, n_nulls, n_distinct, min_value, max_value),
    * one row per column in the given order.
    */
  def profile(df: DataFrame, cols: Seq[String] = Seq.empty): DataFrame = {
    val names = if (cols.nonEmpty) cols
      else df.schema.fields.filter(f => profilable(f.dataType)).map(_.name).toSeq
    require(names.nonEmpty, "no profilable columns")
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap

    val aggs = count(lit(1)).as("__n") +: names.flatMap { n =>
      val dt = byName(n)
      Seq(
        sum(when(col(n).isNull, 1L).otherwise(0L)).as(s"__nulls__$n"),
        count_distinct(col(n)).as(s"__nd__$n"),
        (if (dt == BooleanType) min(col(n)).cast("string") else canon(n, dt, "min"))
          .as(s"__min__$n"),
        (if (dt == BooleanType) max(col(n)).cast("string") else canon(n, dt, "max"))
          .as(s"__max__$n"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)

    // stack(k, name1, nulls1, nd1, min1, max1, ...) → one row per column;
    // names escape into both the string literal and the backtick quoting
    val stackArgs = names.flatMap { n =>
      val lit = n.replace("\\", "\\\\").replace("'", "\\'")
      val bt = n.replace("`", "``")
      Seq(s"'$lit'", s"`__nulls__$bt`", s"`__nd__$bt`", s"`__min__$bt`", s"`__max__$bt`")
    }.mkString(", ")
    one.selectExpr("__n",
      s"stack(${names.size}, $stackArgs) as (col_name, n_nulls, n_distinct, min_value, max_value)")
      .select(col("col_name"), col("__n").as("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }
}
