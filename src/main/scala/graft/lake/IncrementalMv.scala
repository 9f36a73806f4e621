package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate table (materialized view) over a
  * CDF-enabled lake table: `GROUP BY keys` with `count(*)` and `sum(c)`
  * aggregates, refreshed from the CHANGE FEED instead of recomputed —
  * each refresh reads only the commits since the last one, turns them
  * into signed per-group deltas (+1 for insert/update_postimage, -1 for
  * delete/update_preimage), and MERGEs the deltas into the view. At
  * 100 TB a daily refresh costs the day's changes, not a table scan.
  *
  * Exactness bookkeeping:
  *  - per sum column the view also stores `nn_<c>` (count of non-null
  *    values), so `sum_<c>` returns to SQL NULL when the last non-null
  *    value leaves the group — plain `old + delta` arithmetic can't
  *    distinguish "sums to 0" from "no values";
  *  - the applied-through source version rides the SAME commit as the
  *    merge ([[LakeTable.mergeClauses]] `propsDelta`), so a refresh is
  *    exactly-once: replayed after a crash it either sees the bumped
  *    version (no-op) or re-applies from an unchanged one;
  *  - groups whose count reaches 0 are deleted; min/max are NOT
  *    supported (they need the group's full history on delete).
  */
object IncrementalMv {

  val SRC_PATH_PROP = "graft.mv.sourcePath"
  val SRC_VERSION_PROP = "graft.mv.sourceVersion"
  val KEYS_PROP = "graft.mv.groupBy"
  val SUMS_PROP = "graft.mv.sums"

  /** Build the view at the source's CURRENT version and record the
    * lineage + spec in the view's table properties.
    */
  def create(
      spark: SparkSession,
      mvPath: String,
      sourcePath: String,
      groupBy: Seq[String],
      sumCols: Seq[String] = Seq.empty): LakeTable = {
    require(groupBy.nonEmpty, "an aggregate view needs group-by keys")
    val source = LakeTable.forPath(spark, sourcePath)
    require(source.snapshot.metaData.properties.get(Cdc.PROP).exists(_.toBoolean),
      s"incremental refresh needs $sourcePath to have ${Cdc.PROP}=true " +
        "(the change feed is the refresh input)")
    val version = source.version
    val df = aggregate(source.asOf(version).toDF, groupBy, sumCols)
    LakeTable.create(spark, mvPath, df, properties = Map(
      SRC_PATH_PROP -> sourcePath,
      SRC_VERSION_PROP -> version.toString,
      KEYS_PROP -> groupBy.mkString(","),
      SUMS_PROP -> sumCols.mkString(",")))
  }

  /** The view's aggregation shape — also what a full recompute runs
    * (spec parity checks compare refresh output against this). */
  def aggregate(df: DataFrame, groupBy: Seq[String],
      sumCols: Seq[String]): DataFrame =
    df.groupBy(groupBy.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sumCols.flatMap(c => Seq(
          sum(col(c)).as(s"sum_$c"),
          count(col(c)).as(s"nn_$c"))): _*)

  /** Apply all source commits since the last refresh. Returns the new
    * applied-through version (== previous when there was nothing new).
    */
  def refresh(spark: SparkSession, mvPath: String): Long = {
    val mv = LakeTable.forPath(spark, mvPath)
    val props = mv.snapshot.metaData.properties
    val sourcePath = props.getOrElse(SRC_PATH_PROP,
      throw new IllegalArgumentException(s"$mvPath is not an incremental view"))
    val lastApplied = props(SRC_VERSION_PROP).toLong
    val keys = props(KEYS_PROP).split(',').toSeq.filter(_.nonEmpty)
    val sums = props.getOrElse(SUMS_PROP, "").split(',').toSeq.filter(_.nonEmpty)

    val source = LakeTable.forPath(spark, sourcePath)
    val latest = source.version
    if (latest <= lastApplied) return lastApplied

    val changes = source.tableChanges(lastApplied + 1, Some(latest))
    val sign = when(col(Cdc.CHANGE_TYPE).isin(Cdc.INSERT, Cdc.UPDATE_POST), 1)
      .otherwise(-1)
    val delta = changes.groupBy(keys.map(col): _*)
      .agg(sum(sign).as("dn"),
        sums.flatMap(c => Seq(
          sum(when(col(c).isNotNull, col(c) * sign).otherwise(lit(0)))
            .as(s"dsum_$c"),
          sum(when(col(c).isNotNull, sign).otherwise(lit(0))).as(s"dnn_$c"))): _*)
      // net-zero groups (e.g. an update that changed neither keys nor
      // summed columns) would merge as no-op row rewrites — drop them
      .where(((col("dn") =!= 0) +: sums.flatMap(c =>
        Seq(col(s"dsum_$c") =!= 0, col(s"dnn_$c") =!= 0))).reduce(_ || _))
    if (delta.isEmpty) {
      // a range of property-only / reorganization commits: nothing to
      // apply, just move the applied-through pointer
      mv.setProperties(Map(SRC_VERSION_PROP -> latest.toString))
      return latest
    }

    val cond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val updateSet: Map[String, org.apache.spark.sql.Column] =
      Map("n" -> (col("t.n") + col("s.dn"))) ++
        sums.flatMap { c =>
          val nn = col(s"t.nn_$c") + col(s"s.dnn_$c")
          Seq(
            s"nn_$c" -> nn,
            s"sum_$c" -> when(nn === 0, lit(null))
              .otherwise(coalesce(col(s"t.sum_$c"), lit(0)) + col(s"s.dsum_$c")))
        }
    val insertSet: Map[String, org.apache.spark.sql.Column] =
      keys.map(k => k -> col(s"s.$k")).toMap ++
        Map("n" -> col("s.dn")) ++
        sums.flatMap { c =>
          Seq(
            s"nn_$c" -> col(s"s.dnn_$c"),
            s"sum_$c" -> when(col(s"s.dnn_$c") === 0, lit(null))
              .otherwise(col(s"s.dsum_$c")))
        }

    mv.mergeClauses(delta, cond,
      matchedClauses = Seq(
        MergeClause.Delete(Some(col("t.n") + col("s.dn") === 0)),
        MergeClause.Update(None, updateSet)),
      notMatchedClauses = Seq(
        MergeClause.Insert(Some(col("s.dn") > 0), insertSet)),
      notMatchedBySourceClauses = Seq.empty,
      propsDelta = Map(SRC_VERSION_PROP -> latest.toString))
    latest
  }

  /** Continuous maintenance: a change-feed stream on the source whose
    * only job is to signal "there are new commits" — each micro-batch
    * triggers one [[refresh]], which re-reads the exact version range
    * from the feed itself and commits atomically. The stream is purely
    * a TRIGGER, so a crashed/restarted query can never double-apply
    * (refresh is exactly-once on its own bookkeeping) and the stream's
    * offsets need no coordination with the view.
    *
    * Returns the running query; stop it to pause maintenance.
    */
  def continuousRefresh(
      spark: SparkSession,
      mvPath: String,
      checkpointLocation: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val props = LakeTable.forPath(spark, mvPath).snapshot.metaData.properties
    val sourcePath = props.getOrElse(SRC_PATH_PROP,
      throw new IllegalArgumentException(s"$mvPath is not an incremental view"))
    spark.readStream
      .format("org.apache.spark.sql.graft.LakeSourceProvider")
      .option("path", sourcePath)
      .option("readChangeFeed", "true")
      .option("startingVersion", props(SRC_VERSION_PROP).toLong + 1)
      .load()
      .writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (_: DataFrame, _: Long) =>
        refresh(spark, mvPath): Unit
      }
      .start()
  }
}
