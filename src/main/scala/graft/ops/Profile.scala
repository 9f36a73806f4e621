package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset profiling (the data-quality survey step of a curation
  * pipeline): one output row per column with row/null/distinct counts
  * and canonical min/max strings — the summary a pipeline stores per
  * ingest batch to gate downstream training jobs.
  *
  * Two LIGHT jobs instead of one heavy one. Putting every column's
  * `count_distinct` into a single aggregate makes Spark plan an
  * `Expand` that replicates each FULL-WIDTH row once per distinct
  * column (k columns → k+1 copies through the shuffle) — the classic
  * multi-distinct blowup, and exactly the shape that dies at 100 TB.
  * Instead: (a) one expand-free aggregate computes rows/nulls/min/max
  * for all columns in a single pass; (b) the distinct counts go
  * through a narrow `stack` unpivot to (col_name, canonical-string)
  * pairs and ONE two-phase distinct aggregation, so the only shuffle
  * carries short strings with map-side partial collapse. The k-row
  * results broadcast-join back together on col_name.
  *
  * Min/max render through the same canonical encodings the stats layer
  * uses (timestamps as micros, dates as days), so profiles of the same
  * data agree across engines byte-for-byte. The same encoding doubles
  * as the distinct-count carrier: it is injective per type (floats are
  * `+ 0.0` normalized first so -0.0 and 0.0 stay ONE value, matching
  * aggregate grouping semantics), so distinct-of-canonical equals
  * distinct-of-raw.
  */
object Profile {

  /** Canonical string encoding; injective per supported type. */
  private def canon(c: org.apache.spark.sql.Column, dt: DataType): org.apache.spark.sql.Column =
    dt match {
      case TimestampType => unix_micros(c).cast("string")
      // session timezone is the engine's UTC convention, so the NTZ →
      // instant cast is identity and micros agree with a naive oracle
      case TimestampNTZType => unix_micros(c.cast(TimestampType)).cast("string")
      case DateType => unix_date(c).cast("string")
      // -0.0 + 0.0 == 0.0 (IEEE): fold signed zeros together so the
      // string-level distinct matches numeric grouping semantics
      case FloatType | DoubleType => (c + lit(0.0)).cast("string")
      case _ => c.cast("string")
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

    // names escape into both string literals and backtick quoting
    def litEsc(n: String) = n.replace("\\", "\\\\").replace("'", "\\'")
    def btEsc(n: String) = n.replace("`", "``")

    // job A: one expand-free pass for rows + per-column nulls/min/max
    val aggs = count(lit(1)).as("__n") +: names.flatMap { n =>
      val dt = byName(n)
      def mm(agg: org.apache.spark.sql.Column) =
        if (dt == BooleanType) agg.cast("string") else canon(agg, dt)
      Seq(
        sum(when(col(n).isNull, 1L).otherwise(0L)).as(s"__nulls__$n"),
        mm(min(col(n))).as(s"__min__$n"),
        mm(max(col(n))).as(s"__max__$n"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = names.flatMap { n =>
      Seq(s"'${litEsc(n)}'", s"`__nulls__${btEsc(n)}`",
        s"`__min__${btEsc(n)}`", s"`__max__${btEsc(n)}`")
    }.mkString(", ")
    val base = one.selectExpr("__n",
      s"stack(${names.size}, $stackArgs) as (col_name, n_nulls, min_value, max_value)")

    // job B: distinct counts over narrow (col_name, canonical) pairs —
    // count_distinct skips nulls, same as the per-column aggregate
    val canonCols = names.map(n => canon(col(s"`${btEsc(n)}`"), byName(n)).as(n))
    val pairArgs = names.map(n => s"'${litEsc(n)}', `${btEsc(n)}`").mkString(", ")
    val nd = df.select(canonCols: _*)
      .selectExpr(s"stack(${names.size}, $pairArgs) as (col_name, __v)")
      .groupBy(col("col_name"))
      .agg(count_distinct(col("__v")).as("n_distinct"))

    // k-row broadcast join + literal position map to restore input order
    val pos = names.zipWithIndex.foldLeft(lit(0)) { case (acc, (n, i)) =>
      when(col("col_name") === lit(n), lit(i)).otherwise(acc)
    }
    base.join(broadcast(nd), Seq("col_name"), "left")
      .select(col("col_name"), col("__n").as("n_rows"), col("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_value"), col("max_value"), pos.as("__pos"))
      .orderBy(col("__pos")).drop("__pos")
  }
}
