package org.apache.spark.sql.graft

import java.nio.file.{Files, Path, Paths}
import java.util.UUID

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{Alias, BindReferences, Cast, Expression, Literal, Murmur3Hash, Pmod, Predicate, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe => CatalystEqualNullSafe}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortOrder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOptions, ParquetUtils}
import org.apache.spark.sql.sources.{AlwaysTrue, And, EqualTo, EqualNullSafe, Filter}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.util.SerializableConfiguration

import graft.lake._

/** DataSource V2 write path for lake tables (VERDICT.md round-1 #1):
  * executors stage parquet files directly under the table directory via
  * Spark's own ParquetOutputWriter machinery; the driver publishes ONE
  * atomic commit-log entry in `BatchWrite.commit(messages)`. This is what
  * unlocks SQL `INSERT INTO lake.db.t`, `INSERT OVERWRITE`, and CTAS
  * without bypassing the commit protocol — the reference's primary write
  * interface (`02.delta_lake_primer.py:215-320`).
  *
  * Scale shape: the write is fully distributed (each task opens its own
  * writers, dynamic-partitioning rows into hive dirs); only file METADATA
  * crosses to the driver. Partitioned writes request a cluster-by-
  * partition distribution (Iceberg's default) so a 1000-task insert does
  * not produce tasks×partitions files.
  */
private[graft] sealed trait LakeWriteMode
private[graft] case object LakeAppend extends LakeWriteMode
private[graft] final case class LakeOverwrite(filters: Seq[Filter]) extends LakeWriteMode
private[graft] case object LakeDynamicOverwrite extends LakeWriteMode

private[graft] class LakeWriteBuilder(lake: LakeTable, info: LogicalWriteInfo,
    viaCatalog: Boolean = true)
  extends WriteBuilder with SupportsOverwrite with SupportsDynamicOverwrite {

  private var mode: LakeWriteMode = LakeAppend

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    val pcs = lake.snapshot.metaData.partitionColumns.toSet
    def check(f: Filter): Unit = f match {
      case _: AlwaysTrue => ()
      case And(l, r) => check(l); check(r)
      case EqualTo(a, _) if pcs.contains(a) => ()
      case EqualNullSafe(a, _) if pcs.contains(a) => ()
      case other => throw new UnsupportedOperationException(
        s"lake overwrite supports only partition-column equality filters, got $other")
    }
    filters.foreach(check)
    mode = LakeOverwrite(filters.toSeq)
    this
  }

  override def overwriteDynamicPartitions(): WriteBuilder = {
    mode = LakeDynamicOverwrite
    this
  }

  override def build(): Write =
    new LakeWrite(lake, info.schema(), info.queryId(), mode, viaCatalog)
}

private[graft] class LakeWrite(
    lake: LakeTable,
    writeSchema: StructType,
    queryId: String,
    mode: LakeWriteMode,
    viaCatalog: Boolean = true) extends Write with RequiresDistributionAndOrdering {

  // ONE snapshot for the whole write plan: schema alignment, constraint
  // compilation, and the publish-time staleness check below must all see
  // the same metadata
  private val planSnap = lake.snapshot
  private val partitionCols = planSnap.metaData.partitionColumns
  private val bucketSpec = Bucketing.specOf(planSnap.metaData)

  /** Cluster incoming rows by partition AND bucket, so a wide insert
    * opens ~1 writer per task instead of one per (partition × bucket).
    * The bucket transform resolves through the catalog's V2 function —
    * PATH-BASED writes (the streaming sink) have no FunctionCatalog and
    * would fail analysis on it, so they cluster by partitions only
    * (correct either way: the writer routes per row).
    */
  override def requiredDistribution(): Distribution = {
    val clustering =
      // transform entries cluster by their SOURCE column — finer than
      // the directory value but correct, and resolvable without a
      // FunctionCatalog
      graft.lake.PartitionTransforms.parseAll(partitionCols).map {
        case graft.lake.PartitionTransforms.Identity(c) => Expressions.column(c):
          org.apache.spark.sql.connector.expressions.Expression
        case t: graft.lake.PartitionTransforms.Transform => Expressions.column(t.col):
          org.apache.spark.sql.connector.expressions.Expression
      } ++
        (if (viaCatalog) bucketSpec.map(s =>
          Expressions.bucket(s.numBuckets, s.columns: _*):
            org.apache.spark.sql.connector.expressions.Expression)
        else None)
    if (clustering.isEmpty) Distributions.unspecified()
    else Distributions.clustered(clustering.toArray)
  }

  override def distributionStrictlyRequired(): Boolean = false

  override def requiredOrdering(): Array[SortOrder] = Array.empty

  override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
    val b = toBatch.asInstanceOf[LakeBatchWrite]
    new LakeStreamingWrite(b)
  }

  override def toBatch: BatchWrite = {
    val session = SparkSession.active.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // carry the TABLE schema's field metadata (parquet field ids) into the
    // written files — the query schema Spark hands us is metadata-free
    val tableByName = planSnap.schema.fields.map(f => f.name -> f).toMap
    val enriched = StructType(writeSchema.fields.map(f =>
      tableByName.get(f.name).map(tf => f.copy(metadata = tf.metadata)).getOrElse(f)))
    val dataSchema = StructType(enriched.filterNot(f => partitionCols.contains(f.name)))
    val job = Job.getInstance(session.sessionState.newHadoopConf())
    // INT64 micros, not INT96: footers then carry timestamp min/max for skipping
    job.getConfiguration.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val factory = ParquetUtils.prepareWrite(
      session.sessionState.conf, job, dataSchema,
      new ParquetOptions(Map.empty[String, String], session.sessionState.conf))
    val stagingName = LakeTable.STAGING_PREFIX + "dsv2-" + UUID.randomUUID()
    Files.createDirectories(Paths.get(lake.path, stagingName))
    // CHECK constraints: analyze each expression against the write schema
    // on the DRIVER (full analyzer: functions, casts, coercion), bind to
    // ordinals, and ship the bound expression to the row-level writers
    val attrs = DataTypeUtils.toAttributes(enriched)
    val constraintChecks: Seq[(String, String, Expression)] =
      Constraints.of(planSnap.metaData).toSeq.sortBy(_._1).map {
        case (n, sql) =>
          val parsed = session.sessionState.sqlParser.parseExpression(sql)
          val plan = org.apache.spark.sql.catalyst.plans.logical.Project(
            Seq(Alias(parsed, n)()),
            org.apache.spark.sql.catalyst.plans.logical.LocalRelation(attrs))
          val analyzed = session.sessionState.analyzer.execute(plan)
          val bound = analyzed
            .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Project]
            .projectList.head.asInstanceOf[Alias].child
          (n, sql, BindReferences.bindReference(bound, attrs))
      }
    new LakeBatchWrite(lake, enriched, dataSchema, partitionCols,
      bucketSpec, stagingName,
      factory, new SerializableConfiguration(job.getConfiguration), queryId, mode,
      constraintChecks, planSnap.metaData,
      session.sessionState.conf.sessionLocalTimeZone)
  }
}

private[graft] final case class LakeFileEntry(
    relPath: String, partitionValues: Map[String, String],
    bucket: Option[Int] = None)

private[graft] final case class LakeWriteMessage(files: Seq[LakeFileEntry])
  extends WriterCommitMessage

private[graft] class LakeBatchWrite(
    val lake: LakeTable,
    val writeSchema: StructType,
    val dataSchema: StructType,
    val partitionCols: Seq[String],
    val bucketSpec: Option[Bucketing.Spec],
    stagingName: String,
    val factory: OutputWriterFactory,
    val conf: SerializableConfiguration,
    val queryId: String,
    val mode: LakeWriteMode,
    val constraintChecks: Seq[(String, String, Expression)] = Seq.empty,
    val plannedMeta: graft.lake.MetaData = null,
    val sessionTz: String = "UTC")
  extends BatchWrite {

  private[graft] val stagingRoot = Paths.get(lake.path, stagingName)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new LakeWriterFactory(stagingRoot.toString, factory, conf, writeSchema,
      dataSchema, partitionCols, bucketSpec, constraintChecks, sessionTz)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val entries = messages.flatMap(_.asInstanceOf[LakeWriteMessage].files).toSeq
    LakePublish.publish(lake, stagingRoot, dataSchema, entries, mode, queryId,
      txn = None, plannedMeta = Option(plannedMeta))
    LakePublish.deleteRecursively(stagingRoot)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    LakePublish.deleteRecursively(stagingRoot)
}

/** Shared publish step of the DSv2 batch and streaming writes: move the
  * staged files into place, collect footer stats, and commit — removes
  * recomputed against the LATEST snapshot each attempt, so appends
  * rebase freely and overwrites replace exactly what exists at commit
  * time.
  */
private[graft] object LakePublish {

  def publish(
      lake: LakeTable,
      stagingRoot: Path,
      dataSchema: StructType,
      entries: Seq[LakeFileEntry],
      mode: LakeWriteMode,
      queryId: String,
      txn: Option[SetTxn],
      plannedMeta: Option[MetaData] = None): Unit = {
    val root = Paths.get(lake.path)
    val moved = entries.map { e =>
      val dest = root.resolve(e.relPath)
      Files.createDirectories(dest.getParent)
      Files.move(stagingRoot.resolve(e.relPath), dest)
      e -> dest
    }
    val spark = SparkSession.active
    val statsMap = Stats.collectFromFooters(spark, dataSchema, moved.map(_._2.toString))
    val adds0 = moved.map { case (e, abs) =>
      AddFile(e.relPath, e.partitionValues, Files.size(abs),
        Files.getLastModifiedTime(abs).toMillis,
        statsMap.get(abs.toAbsolutePath.normalize.toString),
        bucket = e.bucket)
    }
    // bloom index sidecars (no-op without graft.bloom.columns, and
    // best-effort — a failed build never fails the epoch); on a
    // replay-detected abort below the data files AND these sidecars are
    // simply orphans for vacuum's mtime gate
    val adds = graft.lake.BloomIndex.attachBestEffort(spark, lake.path, dataSchema, adds0,
      plannedMeta.map(_.properties)
        .getOrElse(lake.snapshot.metaData.properties))
    val rows = adds.flatMap(_.stats.map(_.numRecords)).sum

    var tries = 0
    var committed = false
    while (!committed) {
      val snap = lake.log.snapshot(None)
      // streaming epoch replay: a (queryId, epochId) at or above ours is
      // already durable — drop this attempt's files and do nothing
      if (txn.exists(t => snap.txns.get(t.appId).exists(_ >= t.batchId))) {
        moved.foreach { case (_, abs) => Files.deleteIfExists(abs) }
        return
      }
      // same staleness rule as LakeTable.commitWithRetry's rebase: the
      // staged rows were schema-aligned and constraint-checked against
      // the metadata the write was PLANNED on. A concurrent ADD
      // CONSTRAINT / schema evolution / re-partition landing before this
      // publish would otherwise be silently absorbed — the files commit
      // unvalidated against the new rules (no CommitConflict fires here,
      // because each attempt reads the LATEST snapshot and takes a fresh
      // version number). Fail loudly; the caller re-plans. Compared at
      // validationState granularity: a commit touching only benign
      // properties leaves the staged rows valid and must not abort a
      // batch write — or permanently fail a stream whose plannedMeta is
      // pinned at query start.
      if (plannedMeta.exists(_.validationState != snap.metaData.validationState)) {
        moved.foreach { case (_, abs) => Files.deleteIfExists(abs) }
        throw new IllegalStateException(
          s"concurrent metadata change on ${lake.path}: the table's " +
            "schema/constraints/layout changed after this write was " +
            "planned — re-run the write against the current table state")
      }
      val now = System.currentTimeMillis()
      val (removes, op) = mode match {
        case LakeAppend => (Seq.empty[AddFile], "APPEND")
        case LakeOverwrite(filters) =>
          (snap.files.filter(f => filters.forall(matchesPartition(f.partitionValues, _))),
            "OVERWRITE")
        case LakeDynamicOverwrite =>
          val written = entries.map(_.partitionValues).toSet
          (snap.files.filter(f => written.contains(f.partitionValues)), "OVERWRITE")
      }
      val actions =
        removes.map(f => Action.of(RemoveFile(f.path, now, f.partitionValues))) ++
          adds.map(Action.of) ++
          txn.map(Action.of).toSeq :+
          Action.of(CommitInfo(now, op,
            Map("queryId" -> queryId, "interface" -> "dsv2"),
            numAddedFiles = adds.size.toLong, numRemovedFiles = removes.size.toLong,
            numOutputRows = rows))
      try {
        lake.log.write(snap.version + 1, actions)
        committed = true
      } catch {
        case e: CommitConflictException =>
          tries += 1
          if (tries > 20) throw e
      }
    }
    // post-commit maintenance (opt-in table property): streaming epochs
    // are the archetypal small-file generator — never fails the publish
    lake.maybeAutoCompact()
  }

  private def matchesPartition(pv: Map[String, String], f: Filter): Boolean = f match {
    case _: AlwaysTrue => true
    case And(l, r) => matchesPartition(pv, l) && matchesPartition(pv, r)
    case EqualTo(a, v) => pv.get(a).exists(_ == String.valueOf(v))
    case EqualNullSafe(a, v) => pv.get(a).exists(_ == String.valueOf(v))
    case _ => false
  }

  def deleteRecursively(p: Path): Unit = {
    if (!Files.exists(p)) return
    if (Files.isDirectory(p)) {
      graft.util.Fs.listDir(p).foreach(deleteRecursively)
    }
    Files.deleteIfExists(p)
  }
}

/** Structured Streaming sink for lake tables — `writeStream.format(
  * "org.apache.spark.sql.graft.LakeSourceProvider").option("path", ...)`
  * or `.toTable("lake.db.t")`: per-epoch executor-staged files, ONE
  * atomic commit per epoch carrying a `SetTxn(queryId, epochId)` marker,
  * so epoch replays after a failure are exact no-ops (the same
  * idempotence contract as `LakeTable.idempotentAppend`). Complete
  * output mode arrives as truncate → per-epoch overwrite.
  */
private[graft] class LakeStreamingWrite(b: LakeBatchWrite)
  extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new LakeStreamingWriterFactory(b.stagingRoot.toString, b.factory, b.conf,
      b.writeSchema, b.dataSchema, b.partitionCols, b.bucketSpec,
      b.constraintChecks, b.sessionTz)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val entries = messages.flatMap(_.asInstanceOf[LakeWriteMessage].files).toSeq
    // plannedMeta pinned at query start: an external ALTER mid-stream
    // fails the stream (restart re-plans under the new schema) instead
    // of epochs silently committing stale-validated rows
    LakePublish.publish(b.lake, b.stagingRoot, b.dataSchema, entries, b.mode,
      b.queryId, txn = Some(SetTxn(b.queryId, epochId)),
      plannedMeta = Option(b.plannedMeta))
    // staging root persists across epochs; orphans are vacuum's job
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.filter(_ != null).flatMap(_.asInstanceOf[LakeWriteMessage].files)
      .foreach(e => Files.deleteIfExists(b.stagingRoot.resolve(e.relPath)))
}

private[graft] class LakeStreamingWriterFactory(
    stagingRoot: String,
    factory: OutputWriterFactory,
    conf: SerializableConfiguration,
    writeSchema: StructType,
    dataSchema: StructType,
    partitionCols: Seq[String],
    bucketSpec: Option[Bucketing.Spec],
    constraintChecks: Seq[(String, String, Expression)] = Seq.empty,
    sessionTz: String = "UTC")
  extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new LakeDataWriter(stagingRoot, factory, conf, writeSchema, dataSchema,
      partitionCols, bucketSpec, partitionId, taskId, constraintChecks,
      sessionTz)
}

private[graft] class LakeWriterFactory(
    stagingRoot: String,
    factory: OutputWriterFactory,
    conf: SerializableConfiguration,
    writeSchema: StructType,
    dataSchema: StructType,
    partitionCols: Seq[String],
    bucketSpec: Option[Bucketing.Spec],
    constraintChecks: Seq[(String, String, Expression)] = Seq.empty,
    sessionTz: String = "UTC")
  extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new LakeDataWriter(stagingRoot, factory, conf, writeSchema, dataSchema,
      partitionCols, bucketSpec, partitionId, taskId, constraintChecks,
      sessionTz)
}

/** Per-task writer: routes rows into hive partition directories (dynamic
  * partitioning inside the task), writing the non-partition columns
  * through Spark's parquet OutputWriter. One open writer per partition
  * value seen by this task; upstream cluster-by-partition keeps that
  * count ~1.
  */
private[graft] class LakeDataWriter(
    stagingRoot: String,
    factory: OutputWriterFactory,
    conf: SerializableConfiguration,
    writeSchema: StructType,
    dataSchema: StructType,
    partitionCols: Seq[String],
    bucketSpec: Option[Bucketing.Spec],
    partitionId: Int,
    taskId: Long,
    constraintChecks: Seq[(String, String, Expression)] = Seq.empty,
    sessionTz: String = "UTC")
  extends DataWriter[InternalRow] {

  private val fullAttrs = DataTypeUtils.toAttributes(writeSchema)

  // CHECK constraints: one compiled predicate each; violation iff the
  // expression IS FALSE (null-safe — SQL CHECK lets unknown pass)
  private val constraintPreds = constraintChecks.map { case (n, sql, bound) =>
    val p = Predicate.create(CatalystEqualNullSafe(bound, Literal(false)))
    p.initialize(partitionId)
    (n, sql, p)
  }
  private val dataProj = UnsafeProjection.create(
    fullAttrs.filterNot(a => partitionCols.contains(a.name)).asInstanceOf[Seq[Expression]],
    fullAttrs)
  // hidden partitioning: a transform entry's directory key is its
  // synthetic __pt_ name and its value is the transform of the source
  // attribute (which stays in the data file); identity entries elide
  private val pFields = graft.lake.PartitionTransforms.parseAll(partitionCols)
  private val partDirNames = pFields.map {
    case graft.lake.PartitionTransforms.Identity(c) => c
    case t: graft.lake.PartitionTransforms.Transform => t.dirName
  }
  private val partProj =
    if (partitionCols.isEmpty) null
    else UnsafeProjection.create(
      pFields.map {
        // IDENTITY dirs render in the writing session's timezone: the
        // read path (Spark partition discovery under an explicit schema)
        // and the Scala writer (df.write.partitionBy) both use the
        // session TZ, so a UTC pin here would shift timestamp partition
        // VALUES on read in non-UTC sessions. Timestamp identity
        // partitions never drive exact-compare pruning (the rendering
        // fails the numeric parse), so skipping is unaffected.
        //
        // CAVEAT (shared with stock Spark/Delta): the rendered string
        // becomes AddFile.partitionValues, and dynamic/filtered
        // overwrites (LakeDynamicOverwrite, matchesPartition) compare
        // those raw strings — so a dynamic overwrite issued from a
        // session in a DIFFERENT TZ will not match logically-equal
        // timestamp partitions written earlier, leaving the stale files
        // in place beside the new ones. Timestamp identity partitions
        // therefore require a consistent session TZ across all writers;
        // prefer the UTC-pinned day()/month() transforms for
        // time-partitioned tables (NEXT.md residual #6).
        case graft.lake.PartitionTransforms.Identity(c) =>
          Cast(fullAttrs.find(_.name == c).get, StringType,
            Some(sessionTz)): Expression
        // TRANSFORM dirs stay UTC-pinned — Stats.sourceRange inverts
        // them under the UTC contract shared with the Catalyst twin
        case t: graft.lake.PartitionTransforms.Transform =>
          val a = fullAttrs.find(_.name == t.col).getOrElse(
            throw new IllegalArgumentException(
              s"partition-transform source ${t.col} missing from write schema"))
          Cast(graft.lake.PartitionTransforms.expression(t, a, a.dataType),
            StringType, Some("UTC"))
      },
      fullAttrs)

  // bucketed tables: per-row bucket id via the same murmur3-pmod the
  // Scala write path uses (Bucketing.bucketId); routed like a partition
  private val bucketProj = bucketSpec.map { spec =>
    val exprs = spec.columns.map(c => fullAttrs.find(_.name == c).getOrElse(
      throw new IllegalArgumentException(
        s"bucket column ${c} missing from write schema")): Expression)
    UnsafeProjection.create(
      Seq(Pmod(new Murmur3Hash(exprs), Literal(spec.numBuckets)): Expression),
      fullAttrs)
  }

  private val writers =
    mutable.LinkedHashMap[String, (OutputWriter, LakeFileEntry)]()

  override def write(row: InternalRow): Unit = {
    constraintPreds.foreach { case (n, sql, p) =>
      if (p.eval(row))
        throw new IllegalArgumentException(
          s"CHECK constraint $n ($sql) violated")
    }
    val partKey = if (partitionCols.isEmpty) "" else {
      val p = partProj(row)
      partDirNames.indices.map { i =>
        val c = ExternalCatalogUtils.escapePathName(partDirNames(i))
        val v = if (p.isNullAt(i)) "__HIVE_DEFAULT_PARTITION__"
        else ExternalCatalogUtils.escapePathName(p.getUTF8String(i).toString)
        s"$c=$v"
      }.mkString("/")
    }
    val bucketId = bucketProj.map(_(row).getInt(0))
    val dirKey = (Seq(partKey) ++
      bucketId.map(b => s"${Bucketing.BUCKET_DIR_COL}=$b"))
      .filter(_.nonEmpty).mkString("/")
    val writer = writers.getOrElse(dirKey, {
      val pv: Map[String, String] =
        if (partitionCols.isEmpty) Map.empty
        else {
          val p = partProj(row)
          partDirNames.indices.map { i =>
            partDirNames(i) -> (if (p.isNullAt(i)) null else p.getUTF8String(i).toString)
          }.toMap
        }
      val w = newWriter(dirKey, pv, bucketId)
      writers(dirKey) = w
      w
    })._1
    writer.write(dataProj(row))
  }

  private def newWriter(dir: String, pv: Map[String, String],
      bucketId: Option[Int]): (OutputWriter, LakeFileEntry) = {
    val fileName = f"part-$partitionId%05d-$taskId-${UUID.randomUUID()}.parquet"
    val rel = if (dir.isEmpty) fileName else s"$dir/$fileName"
    val abs = Paths.get(stagingRoot, rel)
    Files.createDirectories(abs.getParent)
    val attemptId = new TaskAttemptID(
      new TaskID(new JobID("graft", 0), TaskType.MAP, partitionId), taskId.toInt)
    val ctx = new TaskAttemptContextImpl(conf.value, attemptId)
    (factory.newInstance(abs.toString, dataSchema, ctx),
      LakeFileEntry(rel, pv, bucketId))
  }

  override def commit(): WriterCommitMessage = {
    writers.values.foreach(_._1.close())
    LakeWriteMessage(writers.values.map(_._2).toSeq)
  }

  override def abort(): Unit = {
    writers.values.foreach { case (w, e) =>
      try w.close() catch { case _: Throwable => () }
      Files.deleteIfExists(Paths.get(stagingRoot, e.relPath))
    }
  }

  override def close(): Unit = ()
}
