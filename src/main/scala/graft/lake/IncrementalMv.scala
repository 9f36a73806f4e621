package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate table (materialized view) over a
  * CDF-enabled lake table: `GROUP BY keys` with `count(*)`, `sum(c)`,
  * and `min/max(c)` aggregates, refreshed from the CHANGE FEED instead
  * of recomputed — each refresh reads only the commits since the last
  * one, turns them into signed per-group deltas (+1 for
  * insert/update_postimage, -1 for delete/update_preimage), and MERGEs
  * the deltas into the view. At 100 TB a daily refresh costs the day's
  * changes, not a table scan.
  *
  * Exactness bookkeeping:
  *  - per sum column the view also stores `nn_<c>` (count of non-null
  *    values), so `sum_<c>` returns to SQL NULL when the last non-null
  *    value leaves the group — plain `old + delta` arithmetic can't
  *    distinguish "sums to 0" from "no values";
  *  - min/max are monotone under inserts (`least/greatest` with the
  *    batch's extremes) but NOT under deletes: a group whose current
  *    extremum was deleted is re-aggregated FROM THE SOURCE — only
  *    those groups (a semi-join on the flagged keys), everything else
  *    stays arithmetic. Refresh cost is changes + the affected groups'
  *    source rows, never the table;
  *  - the applied-through source version rides the SAME commit as the
  *    merge ([[LakeTable.mergeClauses]] `propsDelta`), so a refresh is
  *    exactly-once: replayed after a crash it either sees the bumped
  *    version (no-op) or re-applies from an unchanged one;
  *  - refreshes from SEVERAL driver processes serialize through a
  *    commit-level compare-and-swap on that pointer (`expectProps` /
  *    [[LakeTable.compareAndSetProperties]], both validated on the
  *    commit's own read snapshot): a loser aborts before anything
  *    lands, re-reads the pointer, and applies only the remainder —
  *    no leases, no clock assumptions;
  *  - groups whose count reaches 0 are deleted.
  */
object IncrementalMv {

  val SRC_PATH_PROP = "graft.mv.sourcePath"
  /** Source GENERATION (metadata id at view creation): the
    * applied-through pointer only means anything within one generation,
    * so a refresh against a source deleted and recreated at the same
    * path must fail loudly — its version numbers restart but describe
    * unrelated data — instead of silently merging wrong deltas. */
  val SRC_ID_PROP = "graft.mv.sourceId"
  val SRC_VERSION_PROP = "graft.mv.sourceVersion"
  val KEYS_PROP = "graft.mv.groupBy"
  val SUMS_PROP = "graft.mv.sums"
  val MINMAX_PROP = "graft.mv.minMax"

  /** Build the view at the source's CURRENT version and record the
    * lineage + spec in the view's table properties.
    */
  def create(
      spark: SparkSession,
      mvPath: String,
      sourcePath: String,
      groupBy: Seq[String],
      sumCols: Seq[String] = Seq.empty,
      minMaxCols: Seq[String] = Seq.empty): LakeTable = {
    require(groupBy.nonEmpty, "an aggregate view needs group-by keys")
    val source = LakeTable.forPath(spark, sourcePath)
    // ONE snapshot provides the baseline version AND the generation id —
    // separate resolutions could pair a new generation's id with the old
    // generation's version if a recreate lands in between, arming the
    // guard with a baseline that passes the id check but counts the
    // wrong history
    val srcSnap = source.snapshot
    require(srcSnap.metaData.properties.get(Cdc.PROP).exists(_.toBoolean),
      s"incremental refresh needs $sourcePath to have ${Cdc.PROP}=true " +
        "(the change feed is the refresh input)")
    val version = srcSnap.version
    val df = aggregate(source.asOf(version).toDF, groupBy, sumCols, minMaxCols)
    LakeTable.create(spark, mvPath, df, properties = Map(
      SRC_PATH_PROP -> sourcePath,
      SRC_ID_PROP -> srcSnap.metaData.id,
      SRC_VERSION_PROP -> version.toString,
      KEYS_PROP -> groupBy.mkString(","),
      SUMS_PROP -> sumCols.mkString(","),
      MINMAX_PROP -> minMaxCols.mkString(",")))
  }

  /** The view's aggregation shape — also what a full recompute runs
    * (spec parity checks compare refresh output against this). */
  def aggregate(df: DataFrame, groupBy: Seq[String],
      sumCols: Seq[String], minMaxCols: Seq[String] = Seq.empty): DataFrame =
    df.groupBy(groupBy.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sumCols.flatMap(c => Seq(
          sum(col(c)).as(s"sum_$c"),
          count(col(c)).as(s"nn_$c"))) ++
          minMaxCols.flatMap(c => Seq(
            min(col(c)).as(s"min_$c"),
            max(col(c)).as(s"max_$c"))): _*)

  // one refresh per view at a time WITHIN this JVM: two concurrent
  // refreshes (the continuous trigger racing a manual call) would both
  // read the same applied-through pointer and duplicate work. The lock
  // is an OPTIMIZATION — correctness across threads AND processes comes
  // from the commit-level compare-and-swap below: every pointer move
  // (the merge's expectProps, the empty-delta compareAndSetProperties)
  // is guarded on SRC_VERSION_PROP still holding the value this refresh
  // read, validated on the very snapshot the commit is based on. A
  // loser throws StalePrecondition/CommitConflict and retries from the
  // advanced pointer, applying only the remainder — deltas are never
  // double-applied and the pointer never moves backwards, with no
  // leases or clock assumptions.
  private val refreshLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  // CAS losers re-read the pointer and re-derive a smaller delta; a
  // bounded number of rounds guards against a pathological peer that
  // advances the pointer continuously
  private val MAX_CAS_RETRIES = 20

  /** Apply all source commits since the last refresh. Returns the new
    * applied-through version (== previous when there was nothing new).
    */
  def refresh(spark: SparkSession, mvPath: String): Long = {
    val lock = refreshLocks.computeIfAbsent(
      java.nio.file.Paths.get(mvPath).toAbsolutePath.normalize.toString,
      _ => new Object)
    lock.synchronized { refreshLocked(spark, mvPath) }
  }

  // package-private (not `private`) so the concurrency spec can race
  // un-serialized refreshes, simulating several driver processes
  private[lake] def refreshLocked(spark: SparkSession, mvPath: String): Long = {
    var round = 0
    while (true) {
      try return refreshOnce(spark, mvPath)
      catch {
        case e @ (_: StalePreconditionException | _: CommitConflictException) =>
          // a concurrent refresh advanced the pointer (or committed to
          // the view) first — re-read and apply only the remainder
          round += 1
          if (round >= MAX_CAS_RETRIES) throw e
      }
    }
    -1L // unreachable
  }

  private def refreshOnce(spark: SparkSession, mvPath: String): Long = {
    val mv = LakeTable.forPath(spark, mvPath)
    val props = mv.snapshot.metaData.properties
    val sourcePath = props.getOrElse(SRC_PATH_PROP,
      throw new IllegalArgumentException(s"$mvPath is not an incremental view"))
    val lastApplied = props(SRC_VERSION_PROP).toLong
    val keys = props(KEYS_PROP).split(',').toSeq.filter(_.nonEmpty)
    val sums = props.getOrElse(SUMS_PROP, "").split(',').toSeq.filter(_.nonEmpty)
    val minMax = props.getOrElse(MINMAX_PROP, "").split(',').toSeq.filter(_.nonEmpty)

    val source = LakeTable.forPath(spark, sourcePath)
    // ONE snapshot provides the refresh ceiling AND the generation id
    // (separate resolutions could pair them across a recreate)
    val srcSnap = source.snapshot
    val srcId = srcSnap.metaData.id
    // generation guard: a source deleted and recreated at the same path
    // restarts version numbering over unrelated data — the pointer (and
    // this view's contents) belong to the OLD generation, so refreshing
    // would silently merge wrong deltas.
    props.get(SRC_ID_PROP).foreach { created =>
      if (srcId != created)
        throw new IllegalStateException(
          s"source table $sourcePath was deleted and recreated (view " +
            s"built against generation $created, found $srcId): the " +
            s"applied-through pointer cannot continue — rebuild the view " +
            s"(IncrementalMv.create) against the new table")
    }
    // legacy adoption: a view created before the guard existed has no
    // recorded id — stamp the observed generation WITH this refresh's
    // pointer move (same CAS commit), closing the window for every
    // later refresh; until a refresh advances the pointer the view
    // stays check-less, exactly as it was before the guard
    val adoptId =
      if (props.contains(SRC_ID_PROP)) Map.empty[String, String]
      else Map(SRC_ID_PROP -> srcId)
    val latest = srcSnap.version
    if (latest <= lastApplied) return lastApplied

    val changes = source.tableChanges(lastApplied + 1, Some(latest))
    val isAdd = col(Cdc.CHANGE_TYPE).isin(Cdc.INSERT, Cdc.UPDATE_POST)
    val sign = when(isAdd, 1).otherwise(-1)
    val delta0 = changes.groupBy(keys.map(col): _*)
      .agg(sum(sign).as("dn"),
        sums.flatMap(c => Seq(
          sum(when(col(c).isNotNull, col(c) * sign).otherwise(lit(0)))
            .as(s"dsum_$c"),
          sum(when(col(c).isNotNull, sign).otherwise(lit(0))).as(s"dnn_$c"))) ++
          minMax.flatMap(c => Seq(
            min(when(isAdd, col(c))).as(s"insMin_$c"),
            max(when(isAdd, col(c))).as(s"insMax_$c"),
            min(when(!isAdd, col(c))).as(s"delMin_$c"),
            max(when(!isAdd, col(c))).as(s"delMax_$c"))): _*)
      // net-zero groups (e.g. an update that changed neither keys nor
      // aggregated columns) would merge as no-op row rewrites — drop
      // them; any min/max activity keeps the group
      .where(((col("dn") =!= 0) +: (sums.flatMap(c =>
        Seq(col(s"dsum_$c") =!= 0, col(s"dnn_$c") =!= 0)) ++
        minMax.flatMap(c => Seq(
          col(s"insMin_$c").isNotNull, col(s"delMin_$c").isNotNull))))
        .reduce(_ || _))
    // the delta is small (changed groups only) but derives from a CDF
    // scan + aggregation; materialize it ONCE — the emptiness probe, the
    // min/max enrichment join, and the merge's full-outer join all read
    // the persisted rows instead of re-running the feed aggregation.
    // persistedCut keeps lineage (r14): executor-loss-recoverable; its
    // counted variant makes the emptiness probe free (one fewer job).
    val (delta, deltaRows) =
      org.apache.spark.sql.graft.Bridge.persistedCutCounted(delta0)
    if (deltaRows == 0L) {
      // a range of property-only / reorganization commits: nothing to
      // apply, just move the applied-through pointer — CAS'd, so a
      // concurrent refresh that already advanced it (possibly past
      // `latest`) is never clobbered backwards
      mv.compareAndSetProperties(
        Map(SRC_VERSION_PROP -> lastApplied.toString),
        Map(SRC_VERSION_PROP -> latest.toString) ++ adoptId)
      return latest
    }

    // min/max under deletes: flag groups whose CURRENT extremum may have
    // left and re-aggregate exactly those from the source AT the applied
    // version (pinned — concurrent newer commits must not leak in)
    val enriched: DataFrame =
      if (minMax.isEmpty) delta
      else {
        val state = mv.toDF.select((keys.map(col) ++ minMax.flatMap(c =>
          Seq(col(s"min_$c").as(s"curMin_$c"), col(s"max_$c").as(s"curMax_$c"))) :+
          lit(true).as("__inMv")): _*)
        val dJoinS = keys.map(k => col(s"d.$k") <=> col(s"st.$k")).reduce(_ && _)
        val anyDelete = minMax.map(c =>
          col(s"d.delMin_$c").isNotNull || col(s"d.delMax_$c").isNotNull)
          .reduce(_ || _)
        val needs = minMax.map(c =>
          (col(s"d.delMin_$c").isNotNull && col(s"st.curMin_$c").isNotNull &&
            col(s"d.delMin_$c") <= col(s"st.curMin_$c")) ||
            (col(s"d.delMax_$c").isNotNull && col(s"st.curMax_$c").isNotNull &&
              col(s"d.delMax_$c") >= col(s"st.curMax_$c"))).reduce(_ || _) ||
          // a group NOT in the view whose batch both inserts and deletes:
          // the batch's insert extremes may include deleted rows — the
          // arithmetic path can't tell, so recompute
          (col("st.__inMv").isNull && anyDelete)
        val flagged = delta.alias("d")
          .join(state.alias("st"), dJoinS, "left")
          .select((Seq(col("d.*")) :+ coalesce(needs, lit(false)).as("__recompute")): _*)
        val hot = flagged.where(col("__recompute")).select(keys.map(col): _*)
        // null-safe semi join: a NULL-key group must still find its rows
        val svJoinH = keys.map(k => col(s"sv.$k") <=> col(s"h.$k")).reduce(_ && _)
        val rec = aggregate(
          source.asOf(latest).toDF.alias("sv")
            .join(broadcast(hot.alias("h")), svJoinH, "left_semi"),
          keys, sums, minMax)
        val recCols = Seq("n") ++ sums.flatMap(c => Seq(s"sum_$c", s"nn_$c")) ++
          minMax.flatMap(c => Seq(s"min_$c", s"max_$c"))
        val fJoinR = keys.map(k => col(s"f.$k") <=> col(s"r.$k")).reduce(_ && _)
        flagged.alias("f").join(
            rec.select((keys.map(col) ++
              recCols.map(c => col(c).as(s"r_$c"))): _*).alias("r"),
            fJoinR, "left")
          .select(col("f.*") +: recCols.map(c => col(s"r.r_$c")): _*)
      }

    // without min/max columns the enriched frame has no r_* columns at
    // all — the recompute branch must not even be CONSTRUCTED then
    // (an unresolvable reference fails analysis, taken or not)
    def recAware(plain: Column, recCol: String): Column =
      if (minMax.isEmpty) plain
      else when(col("s.__recompute"), col(s"s.r_$recCol")).otherwise(plain)
    val updateSet: Map[String, Column] =
      Map("n" -> recAware(col("t.n") + col("s.dn"), "n")) ++
        sums.flatMap { c =>
          val nn = col(s"t.nn_$c") + col(s"s.dnn_$c")
          Seq(
            s"nn_$c" -> recAware(nn, s"nn_$c"),
            s"sum_$c" -> recAware(
              when(nn === 0, lit(null))
                .otherwise(coalesce(col(s"t.sum_$c"), lit(0)) + col(s"s.dsum_$c")),
              s"sum_$c"))
        } ++
        minMax.flatMap { c =>
          Seq(
            // least/greatest skip nulls: no inserts → keep the current
            s"min_$c" -> recAware(
              least(col(s"t.min_$c"), col(s"s.insMin_$c")), s"min_$c"),
            s"max_$c" -> recAware(
              greatest(col(s"t.max_$c"), col(s"s.insMax_$c")), s"max_$c"))
        }
    val insertSet: Map[String, Column] =
      keys.map(k => k -> col(s"s.$k")).toMap ++
        Map("n" -> recAware(col("s.dn"), "n")) ++
        sums.flatMap { c =>
          Seq(
            s"nn_$c" -> recAware(col(s"s.dnn_$c"), s"nn_$c"),
            s"sum_$c" -> recAware(
              when(col(s"s.dnn_$c") === 0, lit(null))
                .otherwise(col(s"s.dsum_$c")),
              s"sum_$c"))
        } ++
        minMax.flatMap { c =>
          Seq(s"min_$c" -> recAware(col(s"s.insMin_$c"), s"min_$c"),
            s"max_$c" -> recAware(col(s"s.insMax_$c"), s"max_$c"))
        }

    val cond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val deleteCond =
      if (minMax.isEmpty) col("t.n") + col("s.dn") === 0
      else when(col("s.__recompute"), coalesce(col("s.r_n"), lit(0)) === 0)
        .otherwise(col("t.n") + col("s.dn") === 0)
    // fast-path staleness probe: if another driver already advanced the
    // applied-through pointer, skip the doomed merge's staging work.
    // Correctness does NOT depend on this check — the merge below
    // carries the same guard as a commit-time CAS (expectProps checked
    // on the merge's own read snapshot, non-rebaseable commit), which
    // the retry loop in refreshLocked converts into "apply only the
    // remainder". That closes the multi-process window the JVM lock
    // can't reach.
    val nowApplied = LakeTable.forPath(spark, mvPath)
      .snapshot.metaData.properties(SRC_VERSION_PROP).toLong
    if (nowApplied != lastApplied)
      throw new StalePreconditionException(mvPath, SRC_VERSION_PROP,
        lastApplied.toString, Some(nowApplied.toString))
    mv.mergeClauses(enriched, cond,
      matchedClauses = Seq(
        MergeClause.Delete(Some(deleteCond)),
        MergeClause.Update(None, updateSet)),
      notMatchedClauses = Seq(
        MergeClause.Insert(Some(
          if (minMax.isEmpty) col("s.dn") > 0
          else when(col("s.__recompute"), coalesce(col("s.r_n"), lit(0)) > 0)
            .otherwise(col("s.dn") > 0)), insertSet)),
      notMatchedBySourceClauses = Seq.empty,
      propsDelta = Map(SRC_VERSION_PROP -> latest.toString) ++ adoptId,
      expectProps = Map(SRC_VERSION_PROP -> lastApplied.toString))
    latest
  }

  /** Read the view with derived averages projected in: `avg_<c>` =
    * `sum_<c> / nn_<c>` (SQL AVG semantics fall out of the stored
    * pieces: NULL when the group holds no non-null values). */
  def readView(spark: SparkSession, mvPath: String): DataFrame = {
    val mv = LakeTable.forPath(spark, mvPath)
    val sums = mv.snapshot.metaData.properties.getOrElse(SUMS_PROP, "")
      .split(',').toSeq.filter(_.nonEmpty)
    sums.foldLeft(mv.toDF) { (df, c) =>
      df.withColumn(s"avg_$c",
        when(col(s"nn_$c") === 0, lit(null))
          .otherwise(col(s"sum_$c") / col(s"nn_$c")))
    }
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
