package org.apache.spark.sql.graft

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.lake.LakeTable

/** Streaming lake source (VERDICT r01 #9): a custom MicroBatchStream over
  * the commit log with EXACT version-range batches — each micro-batch is
  * the files added in `(startVersion, endVersion]`, so replay after a
  * checkpoint recovery reads precisely the same rows. DML-safe: commits
  * that contain RemoveFile actions (MERGE/UPDATE/DELETE/COMPACT rewrites)
  * are skipped rather than re-emitting rewritten rows — Delta's
  * `skipChangeCommits` semantics (set `failOnDataLoss=true`-style
  * `skipChangeCommits=false` to fail instead). Batch reading delegates to
  * Spark's own parquet reader factory pinned to the batch's file list.
  *
  *   spark.readStream
  *     .format("org.apache.spark.sql.graft.LakeSourceProvider")
  *     .option("path", tablePath)
  *     .option("startingVersion", 0)   // default: 0 (full history)
  *     .load()
  */
class LakeSourceProvider extends TableProvider {

  private def path(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("lake source requires option 'path'"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val p = path(options)
    require(LakeTable.isLakeTable(p), s"not a lake table: $p")
    new graft.lake.LakeLog(p).snapshot(None).schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    def opt(key: String): Option[String] =
      properties.asScala.collectFirst {
        case (k, v) if k.equalsIgnoreCase(key) => v
      }
    new LakeStreamTable(
      opt("path").getOrElse(
        throw new IllegalArgumentException("lake source requires option 'path'")),
      schema,
      opt("startingVersion").map(_.toLong).getOrElse(0L),
      opt("skipChangeCommits").forall(_.toBoolean))
  }
}

private[graft] class LakeStreamTable(
    path: String, tableSchema: StructType, startingVersion: Long,
    skipChangeCommits: Boolean) extends Table with SupportsRead
  with org.apache.spark.sql.connector.catalog.SupportsWrite {

  override def name(): String = s"lake-stream:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE)

  /** `writeStream.format(provider).option("path",...)`: per-epoch atomic
    * commits with SetTxn idempotence ([[LakeStreamingWrite]]). */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    val lake = LakeTable.forPath(SparkSession.active, path)
    new LakeWriteBuilder(lake, info)
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = tableSchema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new LakeMicroBatchStream(path, tableSchema, startingVersion,
          skipChangeCommits)
    }
}

private[graft] case class LakeSourceOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

private[graft] class LakeMicroBatchStream(
    path: String, schema: StructType, startingVersion: Long,
    skipChangeCommits: Boolean) extends MicroBatchStream {

  private val log = new graft.lake.LakeLog(path)
  @volatile private var readerFactory: PartitionReaderFactory = _

  override def initialOffset(): Offset = LakeSourceOffset(startingVersion - 1)

  override def latestOffset(): Offset =
    LakeSourceOffset(log.latestVersion.getOrElse(-1L))

  override def deserializeOffset(json: String): Offset =
    LakeSourceOffset("\"version\"\\s*:\\s*(-?\\d+)".r.findFirstMatchIn(json)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(s"bad offset: $json")))

  /** Files added in `(start, end]`, excluding (or failing on) change
    * commits. */
  private def filesForRange(start: Long, end: Long): Seq[String] =
    ((start + 1) to end).flatMap { v =>
      val actions = log.readCommit(v)
      val isChange = actions.exists(_.remove.isDefined)
      if (isChange) {
        if (!skipChangeCommits)
          throw new IllegalStateException(
            s"version $v of $path rewrites existing data (MERGE/UPDATE/" +
              "DELETE/COMPACT); set skipChangeCommits=true to stream past it")
        Seq.empty
      } else actions.flatMap(_.add).map(f => s"$path/${f.path}")
    }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val files = filesForRange(
      start.asInstanceOf[LakeSourceOffset].version,
      end.asInstanceOf[LakeSourceOffset].version)
    val spark = SparkSession.active.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    spark.conf.set("spark.sql.parquet.fieldId.read.ignoreMissing", "true")
    val options = new CaseInsensitiveStringMap(Map("basePath" -> path).asJava)
    val scan = ParquetTable(s"lake-stream:$path", spark, options, files,
      Some(schema), classOf[ParquetFileFormat])
      .newScanBuilder(options).build()
    val batch = scan.toBatch
    readerFactory = batch.createReaderFactory()
    batch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory = readerFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
