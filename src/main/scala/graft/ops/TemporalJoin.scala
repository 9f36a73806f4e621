package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the stock join operators can't express efficiently:
  * AS-OF (each left row picks the nearest right row at-or-before /
  * at-or-after its timestamp per key) and point-in-interval range joins.
  *
  * Scale design — neither shape is a crossJoin and neither inflates the
  * probe side:
  *
  *  - [[asofJoin]] is ZERO joins: tag both inputs, union, and run one
  *    window pass per key ordered by time — `last(payload, ignoreNulls)`
  *    carries the most recent right row forward onto each left row. One
  *    shuffle on the key, O(n log n) in the partition, no row
  *    amplification; the classic log-merge shape kdb/pandas use,
  *    expressed as a Spark window so Catalyst/Tungsten run it.
  *  - [[rangeJoin]] bins the time axis: intervals explode into the
  *    fixed-width bins they overlap, points map to exactly one bin, and
  *    the join runs on (key, bin) — an equi-join Spark executes as a
  *    hash/sort-merge join, never a broadcast-nested-loop. Amplification
  *    is interval_width/binWidth per interval row, chosen by the caller
  *    to match interval length.
  *
  * Reference scope: the reference's notebooks stop at equi-joins + window
  * functions (`02.spark_sql.py`, `03.movielens-gold.py`); these cover the
  * event-log enrichment patterns its `events`-style data implies.
  */
object TemporalJoin {

  /** AS-OF join: for every left row, the payload of the LAST right row
    * with `rightTime <= leftTime` (backward; `forward=true` flips to the
    * FIRST right row with `rightTime >= leftTime`), matching per `on`
    * keys — DuckDB's `ASOF [LEFT] JOIN`, pandas' `merge_asof`. Left
    * outer: left rows with no qualifying right row keep null payloads.
    *
    * Output: every left column, then the right side's non-key columns.
    * A right column whose name collides with a left column comes back
    * suffixed `_right`. If several right rows share (key, time) the one
    * with the greatest (backward) / least (forward) payload tuple wins —
    * deterministic, but prefer a unique right side.
    *
    * @param toleranceMs reject matches farther than this many ms from
    *                    the left timestamp (payloads null out, the left
    *                    row stays). Times must be timestamp-typed.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      forward: Boolean = false,
      toleranceMs: Option[Long] = None): DataFrame = {
    require(on.nonEmpty, "asofJoin needs at least one key column")
    val payloadCols = right.columns.filterNot(c => on.contains(c)).toSeq
    require(payloadCols.contains(rightTime),
      s"right time column $rightTime must not be a key")
    val outName: Map[String, String] =
      payloadCols.map(c =>
        c -> (if (left.columns.contains(c)) s"${c}_right" else c)).toMap

    // one unioned frame: left rows carry null __rpay, right rows pack
    // their payload into one struct (null-safe: a right row with null
    // payload VALUES is still a non-null struct, so ignoreNulls only
    // skips genuinely-left rows)
    val l = left.select(
      col(leftTime).as("__t") +:
        lit(1).as("__is_left") +:
        lit(null).cast(structType(right, payloadCols)).as("__rpay") +:
        left.columns.map(col).toSeq: _*)
    val r = right
      // SQL join equality: a NULL key matches nothing — drop such right
      // rows up front (left rows with NULL keys stay, with null payloads,
      // exactly like DuckDB's ASOF LEFT JOIN / pandas merge_asof).
      // A NULL right TIMESTAMP matches nothing either: ascending nulls
      // sort FIRST, so in backward mode such a row would otherwise sit
      // "before" every left row and carry forward as a bogus match
      .where(on.map(col(_).isNotNull).reduce(_ && _) &&
        col(rightTime).isNotNull)
      .select(
        col(rightTime).as("__t") +:
          lit(0).as("__is_left") +:
          struct(payloadCols.map(col): _*).as("__rpay") +:
          left.columns.map { c =>
            // right rows keep their join keys (they partition the window);
            // every other left column is null padding
            if (on.contains(c)) col(c)
            else lit(null).cast(leftType(left, c)).as(c)
          }.toSeq: _*)

    val ord =
      if (forward) Seq(col("__t").desc, col("__is_left").asc, col("__rpay").desc)
      else Seq(col("__t").asc, col("__is_left").asc, col("__rpay").asc)
    val w = Window.partitionBy(on.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r)
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .where(col("__is_left") === 1)

    // tolerance: ms distance from the matched right timestamp
    val distMs = {
      val lm = unix_millis(col("__t"))
      val rm = unix_millis(col("__match").getField(rightTime))
      if (forward) rm - lm else lm - rm
    }
    val matched = toleranceMs match {
      case Some(tol) =>
        carried.withColumn("__match",
          when(distMs <= tol, col("__match"))) // else null
      case None => carried
    }

    matched.select(
      left.columns.map(col).toSeq ++
        payloadCols.map(c => col("__match").getField(c).as(outName(c))): _*)
  }

  /** Point-in-interval range join: rows of `left` paired with every
    * `right` row of the same `on` keys whose `[rightLo, rightHi]`
    * interval (inclusive) contains `leftPoint`. Inner join: unmatched
    * left rows drop.
    *
    * `binWidth` is in the time columns' native long units (ms for
    * timestamps via `unix_millis`) — pick it near the typical interval
    * length so each interval explodes into O(1) bins.
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftPoint: String,
      rightLo: String,
      rightHi: String,
      binWidthMs: Long): DataFrame = {
    require(binWidthMs > 0, "binWidthMs must be positive")
    val payloadCols = right.columns.filterNot(on.contains).toSeq
    val outName: Map[String, String] =
      payloadCols.map(c =>
        c -> (if (left.columns.contains(c)) s"${c}_right" else c)).toMap

    def binOf(c: Column): Column = floor(unix_millis(c) / binWidthMs)

    // intervals → the bins they overlap. Guard inverted intervals out
    // explicitly: sequence(a, b) auto-reverses when a > b, which would
    // explode bins for an empty interval; explode(null) drops the row.
    val binned = right
      .withColumn("__bin",
        explode(when(col(rightLo) <= col(rightHi),
          sequence(binOf(col(rightLo)), binOf(col(rightHi))))))
      .alias("r")
    val points = left.withColumn("__bin", binOf(col(leftPoint))).alias("l")

    points.join(binned, on :+ "__bin")
      .where(col(s"l.$leftPoint") >= col(s"r.$rightLo") &&
        col(s"l.$leftPoint") <= col(s"r.$rightHi"))
      .select(left.columns.map(c => col(s"l.$c")).toSeq ++
        payloadCols.map(c => col(s"r.$c").as(outName(c))): _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c)))

  private def leftType(df: DataFrame, c: String) = df.schema(c).dataType
}
