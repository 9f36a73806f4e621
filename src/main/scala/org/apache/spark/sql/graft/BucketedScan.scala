package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Murmur3HashFunction}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

import graft.lake.{Bucketing, Stats}

/** Storage-partitioned-join surface for bucketed lake tables
  * (SPARK-37377, the Iceberg SPJ shape): the scan groups the snapshot's
  * files by their recorded bucket id and reports
  * `KeyGroupedPartitioning(bucket(n, cols), n)`. With
  * `spark.sql.sources.v2.bucketing.enabled=true`, an equi-join of two
  * tables bucketed on the same columns+count plans with NO shuffle on
  * either side — each bucket pair joins where it sits.
  *
  * The V2 `bucket` function below is the read-side twin of
  * [[graft.lake.Bucketing.bucketId]] (murmur3 seed 42, pmod n); Spark
  * resolves it through [[LakeCatalog]]'s FunctionCatalog and compares the
  * two sides by `canonicalName` to decide compatibility.
  */
object GraftFunctions {

  val BUCKET = new UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, cols...): murmur3(cols) pmod n — the lake bucket id"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length >= 2 && inputType.head.dataType == IntegerType,
        s"bucket expects (numBuckets int, cols...), got ${inputType.catalogString}")
      new BoundBucket(inputType)
    }
  }
}

/** Bound `bucket(numBuckets, cols...)`: input row is the literal bucket
  * count followed by the bucket column values. `produceResult` replays
  * Spark's `hash(...)` chain (murmur3, seed 42) so runtime evaluation
  * (partition filters, partially-clustered SPJ) agrees bit-for-bit with
  * what the write path stamped on each file.
  */
final class BoundBucket(inputType: StructType) extends ScalarFunction[Integer] {

  override def inputTypes(): Array[DataType] = inputType.fields.map(_.dataType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def isResultNullable: Boolean = false

  /** Two sides join shuffle-free only when their bucket functions agree;
    * key the canonical name by the bucket column types. */
  override def canonicalName(): String =
    s"graft.bucket(${inputType.fields.drop(1).map(_.dataType.catalogString).mkString(",")})"

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    var h = 42L
    var i = 1
    while (i < inputType.length) {
      val dt = inputType.fields(i).dataType
      h = Murmur3HashFunction.hash(input.get(i, dt), dt, h)
      i += 1
    }
    Integer.valueOf(((h.toInt % n) + n) % n)
  }
}

/** ScanBuilder for bucketed tables: delegates every pushdown surface to
  * Spark's ParquetScanBuilder, then wraps the built scan so it reports
  * the bucket layout. `fileToBucket` maps absolute data-file paths to
  * bucket ids (from the snapshot's AddFiles).
  */
private[graft] class LakeBucketedScanBuilder(
    inner: ParquetScanBuilder,
    spec: Bucketing.Spec,
    fileToBucket: Map[String, Int])
  extends ScanBuilder
  with SupportsPushDownRequiredColumns
  with SupportsPushDownCatalystFilters
  with SupportsPushDownAggregates {

  override def pruneColumns(requiredSchema: StructType): Unit =
    inner.pruneColumns(requiredSchema)

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    inner.pushFilters(filters)

  override def pushedFilters(): Array[Predicate] = inner.pushedFilters

  private var aggPushed = false

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    aggPushed = inner.pushAggregation(aggregation)
    aggPushed
  }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    inner.supportCompletePushDown(aggregation)

  override def build(): Scan = {
    val scan = inner.build()
    // aggregate pushdown rewrites the scan to emit pre-aggregated rows;
    // bucket grouping no longer applies to that shape
    if (aggPushed) scan
    else new LakeBucketedScan(scan, spec, fileToBucket)
  }
}

/** One bucket's slice of the scan: a plain FilePartition that also
  * exposes its bucket id as the partition key Spark groups on. */
private[graft] final class BucketedFilePartition(
    override val index: Int,
    override val files: Array[PartitionedFile],
    bucketId: Int) extends FilePartition(index, files) with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucketId))
}

private[graft] class LakeBucketedScan(
    val inner: Scan,
    val spec: Bucketing.Spec,
    fileToBucket: Map[String, Int])
  extends Scan with SupportsReportPartitioning with Batch {

  override def readSchema(): StructType = inner.readSchema()
  override def description(): String = s"${inner.description()} (bucketed)"
  override def toBatch: Batch = this

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.bucket(spec.numBuckets, spec.columns: _*)), spec.numBuckets)

  /** Regroup the inner parquet scan's splits by bucket id — filter
    * pushdown and split planning stay stock; only the grouping changes.
    * Every bucket is emitted (possibly empty) so two co-bucketed scans
    * always line up partition-for-partition.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val splits = inner.toBatch.planInputPartitions().flatMap {
      case fp: FilePartition => fp.files
      case other => throw new IllegalStateException(
        s"unexpected non-file partition from parquet scan: $other")
    }
    val byBucket = splits.groupBy { f =>
      fileToBucket.getOrElse(Stats.normalizeFileUri(f.filePath.toString),
        throw new IllegalStateException(
          s"file has no recorded bucket id: ${f.filePath}"))
    }
    Array.tabulate[InputPartition](spec.numBuckets) { b =>
      new BucketedFilePartition(b, byBucket.getOrElse(b, Array.empty), b)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    inner.toBatch.createReaderFactory()

  // plan-reuse equality: two bucketed scans are equal iff their inner
  // scans are (spec/file map are functions of the same snapshot)
  override def equals(other: Any): Boolean = other match {
    case s: LakeBucketedScan => inner == s.inner && spec == s.spec
    case _ => false
  }
  override def hashCode(): Int = inner.hashCode() * 31 + spec.hashCode()
}
