package org.apache.spark.sql.graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}

/** Maintenance statements Spark's grammar lacks, parsed ahead of the
  * stock parser (everything else delegates):
  *
  *   VACUUM lake.db.t [RETAIN n HOURS]     -- the reference's literal
  *                                            `%sql VACUUM ...`
  *                                            (`02.delta_lake_primer.py:442`)
  *   OPTIMIZE lake.db.t [ZORDER BY (a, b)] -- compaction / clustering
  *   DESCRIBE HISTORY lake.db.t [LIMIT n]  -- newest n = O(n) commit
  *                                            reads, not O(retained log)
  *   BUILD BLOOM INDEX ON lake.db.t [FORCE] -- backfill bloom sidecars
  *   BUILD MINHASH INDEX ON lake.db.t AT '/idx' USING (text, id)
  *     [WITH (shingleN, bands, rowsPerBand)]  -- persisted fuzzy-dedup index
  *   BUILD IVF INDEX ON lake.db.t AT '/idx' USING (vec, id) [WITH (nLists)]
  *   SYNC MINHASH|IVF INDEX AT '/idx' USING (col, id) -- exactly-once CDF sync
  *   REBUILD MINHASH|IVF INDEX AT '/idx' USING (col, id) -- fresh-log recovery
  *                                            (recorded source + conf)
  *   COMPACT MINHASH|IVF INDEX AT '/idx' USING (id) -- purge stale rows
  *   DESCRIBE MINHASH|IVF INDEX AT '/idx'  -- maintenance state (source
  *                                            triple, sync pointer, live
  *                                            rows, stale estimate)
  *   SHOW INDEXES AT '/root'               -- every gate index under a
  *                                            pipeline root
  *
  * Table references resolve like the `table_changes` TVF: a dotted name
  * through the named catalog's warehouse conf, anything else as a path.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
  extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case VACUUM_RE(ident, _, hours) =>
      RunLakeVacuum(strip(ident), Option(hours).map(_.toDouble))
    case EXPIRE_SNAPSHOTS_RE(ident, _, hours, _, retain) =>
      RunLakeExpireSnapshots(strip(ident),
        Option(hours).map(_.toDouble), Option(retain).map(_.toInt))
    case REORGANIZE_RE(ident) => RunLakeReorganize(strip(ident))
    case OPTIMIZE_INCR_RE(ident, column, _, maxLayers) =>
      RunLakeOptimizeIncremental(strip(ident), strip(column.trim),
        Option(maxLayers).map(_.toInt))
    case OPTIMIZE_RE(ident, _, where, _, zcols) =>
      RunLakeOptimize(strip(ident),
        Option(zcols).map(_.split(',').map(c => strip(c.trim)).toSeq),
        Option(where).map(_.trim))
    case DESCRIBE_HISTORY_RE(ident, limit) =>
      // validated HERE so a bad limit fails at parse time like any
      // other malformed statement, not mid-execution
      val n = Option(limit).map { s =>
        val v = try s.toLong catch { case _: NumberFormatException => 0L }
        if (v < 1 || v > Int.MaxValue)
          throw new IllegalArgumentException(
            s"DESCRIBE HISTORY LIMIT must be in [1, ${Int.MaxValue}], got $s")
        v.toInt
      }
      RunLakeHistory(strip(ident), n)
    case DESCRIBE_DETAIL_RE(ident) => RunLakeDetail(strip(ident))
    case BUILD_BLOOM_RE(ident, force) =>
      RunLakeBuildBloomIndex(strip(ident), force != null)
    case BUILD_INDEX_RE(kind, src, idx, c1, idCol, w1, w2, w3) =>
      if (kind.equalsIgnoreCase("MINHASH")) {
        // arity validated at parse time like the HISTORY limit
        if (w1 != null && (w2 == null || w3 == null))
          throw new IllegalArgumentException(
            "BUILD MINHASH INDEX ... WITH needs (shingleN, bands, rowsPerBand)")
        RunBuildMinhashIndex(strip(src), strip(idx), strip(c1), strip(idCol),
          Option(w1).map(_ => (w1.toInt, w2.toInt, w3.toInt)))
      } else {
        if (w2 != null || w3 != null)
          throw new IllegalArgumentException(
            "BUILD IVF INDEX ... WITH takes a single (nLists)")
        RunBuildIvfIndex(strip(src), strip(idx), strip(c1), strip(idCol),
          Option(w1).map(_.toInt))
      }
    case SYNC_INDEX_RE(kind, idx, c1, idCol) =>
      if (kind.equalsIgnoreCase("MINHASH"))
        RunSyncMinhashIndex(strip(idx), strip(c1), strip(idCol))
      else RunSyncIvfIndex(strip(idx), strip(c1), strip(idCol))
    case REBUILD_INDEX_RE(kind, idx, c1, idCol) =>
      if (kind.equalsIgnoreCase("MINHASH"))
        RunRebuildMinhashIndex(strip(idx), strip(c1), strip(idCol))
      else RunRebuildIvfIndex(strip(idx), strip(c1), strip(idCol))
    case COMPACT_INDEX_RE(kind, idx, idCol) =>
      if (kind.equalsIgnoreCase("MINHASH"))
        RunCompactMinhashIndex(strip(idx), strip(idCol))
      else RunCompactIvfIndex(strip(idx), strip(idCol))
    case DESCRIBE_INDEX_RE(kind, idx) => RunDescribeIndex(kind, strip(idx))
    case SHOW_INDEXES_RE(root) => RunShowIndexes(strip(root))
    case RESTORE_RE(ident, version) => RunLakeRestore(strip(ident), version.toLong)
    // only intercept constraint DDL aimed at a LAKE table; anything else
    // falls through to Spark's own ALTER TABLE handling
    case ADD_CONSTRAINT_RE(ident, name, check) if isLakeRef(ident) =>
      RunLakeAddConstraint(strip(ident), name, check.trim)
    case DROP_CONSTRAINT_RE(ident, name) if isLakeRef(ident) =>
      RunLakeDropConstraint(strip(ident), name)
    case SET_PARTITION_SPEC_RE(ident, cols) if isLakeRef(ident) =>
      RunLakeSetPartitionSpec(strip(ident),
        graft.lake.PartitionTransforms.splitTopLevel(cols).map(strip))
    case SET_PARTITION_SPEC_NONE_RE(ident) if isLakeRef(ident) =>
      RunLakeSetPartitionSpec(strip(ident), Seq.empty)
    case _ => delegate.parsePlan(sqlText)
  }

  private def isLakeRef(ident: String): Boolean =
    try {
      GraftExtensions.resolveTablePath(session, GraftSqlParser.strip(ident))
      true
    } catch { case _: Exception => false }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  // table ref: dotted/quoted identifier or a quoted path
  private val TABLE = """([`'"]?[\w./\-]+[`'"]?(?:\.[`'"]?[\w\-]+[`'"]?)*)"""
  private[graft] val VACUUM_RE =
    ("""(?is)\s*VACUUM\s+""" + TABLE +
      """(\s+RETAIN\s+([0-9.]+)\s+HOURS?)?\s*;?\s*""").r
  private[graft] val EXPIRE_SNAPSHOTS_RE =
    ("""(?is)\s*EXPIRE\s+SNAPSHOTS\s+""" + TABLE +
      """(\s+OLDER\s+THAN\s+([0-9.]+)\s+HOURS?)?(\s+RETAIN\s+LAST\s+(\d+))?\s*;?\s*""").r
  private[graft] val REORGANIZE_RE =
    ("""(?is)\s*OPTIMIZE\s+""" + TABLE + """\s+REORGANIZE\s*;?\s*""").r
  /** `OPTIMIZE t INCREMENTAL BY col [MAX LAYERS n]` — tiered clustering
    * maintenance ([[graft.lake.LakeTable.optimizeIncrementalBy]]):
    * rewrites only the layout-breaking residue, never the base run. */
  private[graft] val OPTIMIZE_INCR_RE =
    ("""(?is)\s*OPTIMIZE\s+""" + TABLE +
      """\s+INCREMENTAL\s+BY\s+\(?\s*([\w`]+)\s*\)?""" +
      """(\s+MAX\s+LAYERS\s+(\d+))?\s*;?\s*""").r
  private[graft] val OPTIMIZE_RE =
    ("""(?is)\s*OPTIMIZE\s+""" + TABLE +
      """(\s+WHERE\s+(.+?))?(\s+ZORDER\s+BY\s+\(?\s*([\w`,\s]+?)\s*\)?)?\s*;?\s*""").r
  private[graft] val DESCRIBE_HISTORY_RE =
    ("""(?is)\s*DESC(?:RIBE)?\s+HISTORY\s+""" + TABLE +
      """(?:\s+LIMIT\s+(\d+))?\s*;?\s*""").r
  private[graft] val DESCRIBE_DETAIL_RE =
    ("""(?is)\s*DESC(?:RIBE)?\s+DETAIL\s+""" + TABLE + """\s*;?\s*""").r
  private[graft] val BUILD_BLOOM_RE =
    ("""(?is)\s*BUILD\s+BLOOM\s+INDEX\s+ON\s+""" + TABLE +
      """(\s+FORCE)?\s*;?\s*""").r
  private val COLPAIR = """\s*\(\s*([\w`]+)\s*,\s*([\w`]+)\s*\)"""
  private val KIND = """(MINHASH|IVF)"""
  // WITH accepts 1 int (IVF: nLists) or 3 (MINHASH: shingleN, bands,
  // rowsPerBand). The ints are INDEPENDENTLY optional here so a wrong
  // arity (e.g. two ints) still matches this statement and gets the
  // helpful per-kind arity error from the handler — a stricter regex
  // would fall through to the delegate parser and surface an opaque
  // generic syntax error instead.
  private[graft] val BUILD_INDEX_RE =
    ("""(?is)\s*BUILD\s+""" + KIND + """\s+INDEX\s+ON\s+""" + TABLE +
      """\s+AT\s+""" + TABLE + """\s+USING""" + COLPAIR +
      """(?:\s+WITH\s*\(\s*(\d+)(?:\s*,\s*(\d+))?(?:\s*,\s*(\d+))?\s*\))?""" +
      """\s*;?\s*""").r
  private[graft] val SYNC_INDEX_RE =
    ("""(?is)\s*SYNC\s+""" + KIND + """\s+INDEX\s+AT\s+""" + TABLE +
      """\s+USING""" + COLPAIR + """\s*;?\s*""").r
  private[graft] val REBUILD_INDEX_RE =
    ("""(?is)\s*REBUILD\s+""" + KIND + """\s+INDEX\s+AT\s+""" + TABLE +
      """\s+USING""" + COLPAIR + """\s*;?\s*""").r
  private[graft] val COMPACT_INDEX_RE =
    ("""(?is)\s*COMPACT\s+""" + KIND + """\s+INDEX\s+AT\s+""" + TABLE +
      """\s+USING\s*\(\s*([\w`]+)\s*\)\s*;?\s*""").r
  private[graft] val DESCRIBE_INDEX_RE =
    ("""(?is)\s*DESC(?:RIBE)?\s+""" + KIND + """\s+INDEX\s+AT\s+""" + TABLE +
      """\s*;?\s*""").r
  private[graft] val SHOW_INDEXES_RE =
    ("""(?is)\s*SHOW\s+INDEXES\s+AT\s+""" + TABLE + """\s*;?\s*""").r
  private[graft] val RESTORE_RE =
    ("""(?is)\s*RESTORE\s+(?:TABLE\s+)?""" + TABLE +
      """\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""").r

  private[graft] val ADD_CONSTRAINT_RE =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + TABLE +
      """\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*""").r
  private[graft] val SET_PARTITION_SPEC_RE =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + TABLE +
      """\s+SET\s+PARTITION\s+SPEC\s*\((.*)\)\s*;?\s*""").r
  private[graft] val SET_PARTITION_SPEC_NONE_RE =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + TABLE +
      """\s+SET\s+PARTITION\s+SPEC\s+NONE\s*;?\s*""").r
  private[graft] val DROP_CONSTRAINT_RE =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + TABLE +
      """\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*""").r

  private[graft] def strip(s: String): String =
    s.stripPrefix("`").stripSuffix("`")
      .stripPrefix("'").stripSuffix("'")
      .stripPrefix("\"").stripSuffix("\"")
}

private[graft] case class RunLakeVacuum(ident: String,
    retainHours: Option[Double]) extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("path_deleted", StringType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftExtensions.resolveTablePath(spark, ident)
    val retention = retainHours
      .map(h => (h * 3600 * 1000).toLong)
      .getOrElse(7L * 24 * 3600 * 1000)
    graft.lake.LakeTable.forPath(spark, path).vacuum(retention).map(Row(_))
  }
}

/** `EXPIRE SNAPSHOTS t [OLDER THAN n HOURS] [RETAIN LAST k]` — commit-log
  * retention (Iceberg's expire_snapshots procedure as a statement); see
  * [[graft.lake.LakeTable.expireSnapshots]]. */
private[graft] case class RunLakeExpireSnapshots(ident: String,
    olderThanHours: Option[Double], retainLast: Option[Int])
  extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("expired_commits", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftExtensions.resolveTablePath(spark, ident)
    val n = graft.lake.LakeTable.forPath(spark, path).expireSnapshots(
      olderThanHours.map(h => (h * 3600 * 1000).toLong)
        .getOrElse(7L * 24 * 3600 * 1000),
      retainLast.getOrElse(30))
    Seq(Row(n))
  }
}

/** `DESCRIBE HISTORY t` — the reference's literal statement
  * (`02.delta_lake_primer.py:405`). */
private[graft] case class RunLakeHistory(
    ident: String, limit: Option[Int] = None)
  extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("timestamp", org.apache.spark.sql.types.TimestampType)(),
    AttributeReference("operation", StringType)(),
    AttributeReference("parameters", StringType)(),
    AttributeReference("numAddedFiles", LongType)(),
    AttributeReference("numRemovedFiles", LongType)(),
    AttributeReference("numOutputRows", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftExtensions.resolveTablePath(spark, ident)
    val t = graft.lake.LakeTable.forPath(spark, path)
    limit.fold(t.history)(t.history(_)).collect().toSeq
  }
}

/** `RESTORE TABLE t TO VERSION AS OF v` — one commit that swings the
  * file set back; both states stay time-travelable. */
private[graft] case class RunLakeRestore(ident: String, toVersion: Long)
  extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("restored_version", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftExtensions.resolveTablePath(spark, ident)
    val t = graft.lake.LakeTable.forPath(spark, path)
    t.restore(toVersion)
    Seq(Row(toVersion))
  }
}

private[graft] case class RunLakeOptimize(ident: String,
    zorderCols: Option[Seq[String]],
    where: Option[String] = None) extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("num_files", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftExtensions.resolveTablePath(spark, ident)
    val t = graft.lake.LakeTable.forPath(spark, path)
    (zorderCols, where) match {
      case (Some(cols), Some(w)) =>
        t.zOrderByWhere(org.apache.spark.sql.functions.expr(w), cols: _*)
      case (Some(cols), None) => t.zOrderBy(cols: _*)
      case (None, w) =>
        t.compact(where = w.map(org.apache.spark.sql.functions.expr))
    }
    Seq(Row(t.snapshot.numFiles))
  }
}

/** `OPTIMIZE t INCREMENTAL BY col [MAX LAYERS n]` — see
  * [[graft.lake.LakeTable.optimizeIncrementalBy]]. Returns the number
  * of files rewritten (0 = layout already within the layer budget). */
private[graft] case class RunLakeOptimizeIncremental(ident: String,
    column: String, maxLayers: Option[Int]) extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("num_rewritten_files", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftExtensions.resolveTablePath(spark, ident)
    val t = graft.lake.LakeTable.forPath(spark, path)
    val n = maxLayers.map(m => t.optimizeIncrementalBy(column, m))
      .getOrElse(t.optimizeIncrementalBy(column))
    Seq(Row(n.toLong))
  }
}

/** `OPTIMIZE t REORGANIZE` — rewrite old-generation files into the
  * current partition spec; see [[graft.lake.LakeTable.reorganize]]. */
private[graft] case class RunLakeReorganize(ident: String)
    extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("num_rows", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftExtensions.resolveTablePath(spark, ident)
    val n = graft.lake.LakeTable.forPath(spark, path).reorganize()
    Seq(Row(n))
  }
}

/** `ALTER TABLE t SET PARTITION SPEC (a, b)` / `... SET PARTITION SPEC
  * NONE` — Iceberg-style partition evolution as SQL: metadata-only;
  * see [[graft.lake.LakeTable.alterPartitionSpec]]. */
private[graft] case class RunLakeSetPartitionSpec(ident: String,
    cols: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftExtensions.resolveTablePath(spark, ident)
    graft.lake.LakeTable.forPath(spark, path).alterPartitionSpec(cols)
    Seq.empty
  }
}

/** `ALTER TABLE t ADD CONSTRAINT name CHECK (expr)` — Delta's constraint
  * DDL: validates existing rows, then every write path enforces the
  * expression per row ([[graft.lake.Constraints]]). */
private[graft] case class RunLakeAddConstraint(ident: String, name: String,
    check: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftExtensions.resolveTablePath(spark, ident)
    graft.lake.LakeTable.forPath(spark, path).addCheckConstraint(name, check)
    Seq.empty
  }
}

private[graft] case class RunLakeDropConstraint(ident: String, name: String)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftExtensions.resolveTablePath(spark, ident)
    graft.lake.LakeTable.forPath(spark, path).dropConstraint(name)
    Seq.empty
  }
}

/** `BUILD BLOOM INDEX ON t [FORCE]` — backfill per-file Bloom sidecars
  * for live files that predate `graft.bloom.columns` (FORCE re-attaches
  * every file: the recovery path after the indexed column set changed);
  * see [[graft.lake.LakeTable.buildBloomIndex]]. */
private[graft] case class RunLakeBuildBloomIndex(ident: String,
    force: Boolean) extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("files_indexed", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftExtensions.resolveTablePath(spark, ident)
    val n = graft.lake.LakeTable.forPath(spark, path).buildBloomIndex(force)
    Seq(Row(n.toLong))
  }
}

/** `BUILD MINHASH INDEX ON src AT idx USING (textCol, idCol)
  * [WITH (shingleN, bands, rowsPerBand)]` — build the persisted fuzzy
  * dedup index over a source lake table at a pinned snapshot; see
  * [[graft.ops.Dedup.buildMinhashIndexFromTable]]. */
private[graft] case class RunBuildMinhashIndex(srcIdent: String,
    idxIdent: String, textCol: String, idCol: String,
    banding: Option[(Int, Int, Int)]) extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("postings", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val srcPath = GraftExtensions.resolveTablePath(spark, srcIdent)
    val idxPath = MinhashIndexSql.resolveIndexPath(spark, idxIdent)
    val (n, b, r) = banding.getOrElse((3, 8, 4))
    graft.ops.Dedup.buildMinhashIndexFromTable(spark, idxPath, srcPath,
      textCol, idCol, n, b, r)
    Seq(Row(MinhashIndexSql.postingsRows(spark, idxPath)))
  }
}

/** `SYNC MINHASH INDEX AT idx USING (textCol, idCol)` — exactly-once
  * postings maintenance from the recorded source's change feed; see
  * [[graft.ops.Dedup.syncMinhashIndexFromTable]]. */
private[graft] case class RunSyncMinhashIndex(idxIdent: String,
    textCol: String, idCol: String) extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("postings_appended", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val idxPath = MinhashIndexSql.resolveIndexPath(spark, idxIdent)
    val n = graft.ops.Dedup.syncMinhashIndexFromTable(spark, idxPath,
      MinhashIndexSql.sourcePath(spark, idxPath), textCol, idCol)
    Seq(Row(n))
  }
}

/** `REBUILD MINHASH INDEX AT idx USING (textCol, idCol)` — the recovery
  * the sync's generation guard directs to: delete + fresh-log rebuild
  * against the RECORDED source path under the RECORDED banding config
  * (an in-place overwrite would keep the old generation's SetTxn and
  * silently poison the next sync). */
private[graft] case class RunRebuildMinhashIndex(idxIdent: String,
    textCol: String, idCol: String) extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("postings", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val idxPath = MinhashIndexSql.resolveIndexPath(spark, idxIdent)
    val src = MinhashIndexSql.sourcePath(spark, idxPath)
    val (n, b, r) = MinhashIndexSql.conf(spark, idxPath)
    graft.ops.Dedup.buildMinhashIndexFromTable(spark, idxPath, src,
      textCol, idCol, n, b, r)
    Seq(Row(MinhashIndexSql.postingsRows(spark, idxPath)))
  }
}

/** `COMPACT MINHASH INDEX AT idx USING (idCol)` — REORG-purge postings
  * whose source ids were deleted; see
  * [[graft.ops.Dedup.compactMinhashIndex]]. */
private[graft] case class RunCompactMinhashIndex(idxIdent: String,
    idCol: String) extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("postings_purged", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val idxPath = MinhashIndexSql.resolveIndexPath(spark, idxIdent)
    Seq(Row(graft.ops.Dedup.compactMinhashIndex(spark, idxPath, idCol)))
  }
}

/** `BUILD IVF INDEX ON src AT idx USING (vecCol, idCol) [WITH (nLists)]`
  * — fresh-log build over a source lake table at a pinned snapshot,
  * recording version + generation + source path as the sync baseline;
  * see [[graft.ops.Similarity.rebuildIvfIndexFromTable]]. */
private[graft] case class RunBuildIvfIndex(srcIdent: String,
    idxIdent: String, vecCol: String, idCol: String,
    nLists: Option[Int]) extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("assignments", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val srcPath = GraftExtensions.resolveTablePath(spark, srcIdent)
    val idxPath = MinhashIndexSql.resolveIndexPath(spark, idxIdent)
    graft.ops.Similarity.rebuildIvfIndexFromTable(spark, idxPath, srcPath,
      vecCol, idCol, nLists.getOrElse(16))
    Seq(Row(IvfIndexSql.assignmentRows(spark, idxPath)))
  }
}

/** `SYNC IVF INDEX AT idx USING (vecCol, idCol)` — exactly-once
  * assignment maintenance from the RECORDED source's change feed; see
  * [[graft.ops.Similarity.syncIvfIndexFromTable]]. */
private[graft] case class RunSyncIvfIndex(idxIdent: String,
    vecCol: String, idCol: String) extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("assignments_appended", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val idxPath = MinhashIndexSql.resolveIndexPath(spark, idxIdent)
    val n = graft.ops.Similarity.syncIvfIndexFromTable(spark, idxPath,
      graft.ops.Similarity.recordedSourcePath(spark, idxPath), vecCol, idCol)
    Seq(Row(n))
  }
}

/** `REBUILD IVF INDEX AT idx USING (vecCol, idCol)` — the generation-
  * guard recovery: fresh logs against the RECORDED source path under
  * the RECORDED list count (both read BEFORE the rebuild deletes the
  * codebook that records them). */
private[graft] case class RunRebuildIvfIndex(idxIdent: String,
    vecCol: String, idCol: String) extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("assignments", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val idxPath = MinhashIndexSql.resolveIndexPath(spark, idxIdent)
    val src = graft.ops.Similarity.recordedSourcePath(spark, idxPath)
    val nLists = graft.lake.LakeTable.forPath(spark, s"$idxPath/codebook")
      .toDF.count().toInt
    graft.ops.Similarity.rebuildIvfIndexFromTable(spark, idxPath, src,
      vecCol, idCol, nLists)
    Seq(Row(IvfIndexSql.assignmentRows(spark, idxPath)))
  }
}

/** `COMPACT IVF INDEX AT idx USING (idCol)` — REORG-purge assignments
  * whose source ids were deleted; see
  * [[graft.ops.Similarity.compactIvfIndex]]. */
private[graft] case class RunCompactIvfIndex(idxIdent: String,
    idCol: String) extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("assignments_purged", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val idxPath = MinhashIndexSql.resolveIndexPath(spark, idxIdent)
    Seq(Row(graft.ops.Similarity.compactIvfIndex(spark, idxPath, idCol)))
  }
}

private[graft] object IndexMetaSql {
  /** Column contract of [[graft.ops.GateIndexInfo]]'s DataFrame shape —
    * shared by both observability statements. */
  val attrs: Seq[AttributeReference] = Seq(
    AttributeReference("kind", StringType)(),
    AttributeReference("index_path", StringType)(),
    AttributeReference("index_version", LongType)(),
    AttributeReference("config", StringType)(),
    AttributeReference("source_path", StringType)(),
    AttributeReference("source_generation", StringType)(),
    AttributeReference("synced_through", LongType)(),
    AttributeReference("indexed_rows", LongType)(),
    AttributeReference("source_live_rows", LongType)(),
    AttributeReference("est_stale_fraction",
      org.apache.spark.sql.types.DoubleType)())
}

/** `DESCRIBE (MINHASH|IVF) INDEX AT idx` — one-row maintenance state;
  * see [[graft.ops.IndexMeta]]. */
private[graft] case class RunDescribeIndex(kind: String, idxIdent: String)
  extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] = IndexMetaSql.attrs
  override def run(spark: SparkSession): Seq[Row] = {
    val idxPath = MinhashIndexSql.resolveIndexPath(spark, idxIdent)
    val df =
      if (kind.equalsIgnoreCase("MINHASH"))
        graft.ops.IndexMeta.describeMinhash(spark, idxPath)
      else graft.ops.IndexMeta.describeIvf(spark, idxPath)
    df.collect().toSeq
  }
}

/** `SHOW INDEXES AT root` — every gate index discoverable under a
  * pipeline root (or the root itself); see
  * [[graft.ops.IndexMeta.indexes]]. */
private[graft] case class RunShowIndexes(rootIdent: String)
  extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] = IndexMetaSql.attrs
  override def run(spark: SparkSession): Seq[Row] = {
    val root = MinhashIndexSql.resolveIndexPath(spark, rootIdent)
    graft.ops.IndexMeta.indexes(spark, root).collect().toSeq
  }
}

private[graft] object IvfIndexSql {
  /** Row count from the staged files' footer stats — no scan job. */
  def assignmentRows(spark: SparkSession, idxPath: String): Long =
    graft.lake.LakeTable.forPath(spark, s"$idxPath/assignments")
      .snapshot.files.flatMap(_.stats.map(_.numRecords)).sum
}

private[graft] object MinhashIndexSql {
  /** An index ROOT is a plain directory holding `postings` — never
    * itself a lake table, and (for BUILD) possibly not created yet — so
    * resolution cannot demand lake-ness the way [[GraftExtensions
    * .resolveTablePath]] does: a path-looking ref is literal, a dotted
    * ref maps through the named catalog's warehouse. The commands that
    * need an EXISTING index validate through `$idx/postings`. */
  def resolveIndexPath(spark: SparkSession, s: String): String =
    if (s.contains('/')) s
    else {
      val parts = s.split('.')
      spark.conf.getOption(s"spark.sql.catalog.${parts.head}.warehouse")
        .map(w => (w +: parts.tail).mkString("/")).getOrElse(s)
    }
  private def props(spark: SparkSession, idxPath: String) =
    graft.lake.LakeTable.forPath(spark, s"$idxPath/postings")
      .snapshot.metaData.properties
  def sourcePath(spark: SparkSession, idxPath: String): String =
    props(spark, idxPath).getOrElse(
      graft.ops.Dedup.MINHASH_SOURCE_PATH_PROP,
      throw new IllegalStateException(
        s"minhash index at $idxPath records no source path"))
  def conf(spark: SparkSession, idxPath: String): (Int, Int, Int) =
    props(spark, idxPath).get(graft.ops.Dedup.MINHASH_CONF_PROP)
      .map(_.split(',')) match {
      case Some(Array(n, b, r)) => (n.toInt, b.toInt, r.toInt)
      case _ => throw new IllegalStateException(
        s"not a minhash index: $idxPath")
    }
  /** Row count from the staged files' footer stats — no scan job. */
  def postingsRows(spark: SparkSession, idxPath: String): Long =
    graft.lake.LakeTable.forPath(spark, s"$idxPath/postings")
      .snapshot.files.flatMap(_.stats.map(_.numRecords)).sum
}

/** `DESCRIBE DETAIL t` — location/version/id/partitioning/size snapshot
  * summary (Delta's statement). */
private[graft] case class RunLakeDetail(ident: String)
  extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] = Seq(
    AttributeReference("location", StringType)(),
    AttributeReference("version", LongType)(),
    AttributeReference("id", StringType)(),
    AttributeReference("partitionColumns", StringType)(),
    AttributeReference("numFiles", LongType)(),
    AttributeReference("sizeInBytes", LongType)(),
    AttributeReference("createdTime", org.apache.spark.sql.types.TimestampType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftExtensions.resolveTablePath(spark, ident)
    graft.lake.LakeTable.forPath(spark, path).detail.collect().toSeq
  }
}
