package org.apache.spark.sql.graft

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.lake.LakeTable

/** The DSv2 Table for a lake table: reads delegate to Spark's own
  * ParquetTable pinned to the loaded snapshot's file list (stock
  * pushdown/pruning/vectorization); writes go through [[LakeWrite]] —
  * executor-staged parquet + one atomic commit-log publish. Time-travel
  * handles (`VERSION AS OF`) are read-only, same rule as the Scala API.
  */
class LakeV2Table(
    val lake: LakeTable,
    ident: String,
    inner: ParquetTable,
    val writable: Boolean) extends Table with SupportsRead with SupportsWrite {

  private[graft] val snap = lake.snapshot

  /** Any live deletion vectors? SQL reads then go through
    * [[LakeDvReadRule]]'s substituted plan instead of the raw scan. */
  def hasDvs: Boolean =
    snap.files.exists(f => f.dvPath.isDefined || f.dvInline.isDefined)

  private val bucketSpec = graft.lake.Bucketing.specOf(snap.metaData)

  override def name(): String = ident

  override def schema(): StructType = snap.schema

  override def partitioning(): Array[Transform] =
    (snap.metaData.partitionColumns.map(c => Expressions.identity(c)) ++
      bucketSpec.map(s => Expressions.bucket(s.numBuckets, s.columns: _*))).toArray

  override def properties(): util.Map[String, String] =
    snap.metaData.properties.asJava

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.OVERWRITE_DYNAMIC)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    bucketSpec match {
      // DV'd tables read through the substituted union plan, and a file
      // written before bucketing was enabled has no bucket id — both fall
      // back to the stock parquet scan (correct, just shuffles on join)
      case Some(spec) if !hasDvs && snap.files.nonEmpty &&
          snap.files.forall(_.bucket.isDefined) =>
        val pcs = snap.metaData.partitionColumns
        val fileKeys = snap.files.map { f =>
          java.nio.file.Paths.get(lake.path, f.path)
            .toAbsolutePath.normalize.toString ->
            (pcs.map(c => f.partitionValues.getOrElse(c, null)), f.bucket.get)
        }.toMap
        val partSchema = StructType(pcs.map(c => snap.schema(c)))
        new LakeBucketedScanBuilder(
          inner.newScanBuilder(options)
            .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder],
          spec, partSchema, fileKeys)
      case _ => inner.newScanBuilder(options)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    if (!writable)
      throw new UnsupportedOperationException(
        s"$ident: cannot write through a time-travel handle")
    new LakeWriteBuilder(lake, info)
  }
}
