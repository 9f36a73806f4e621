package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash-bucketed table layout (Iceberg's `bucket(n, col)` partition
  * transform / Hive bucketing): rows are routed to `n` stable buckets by
  * murmur3 hash of the bucket columns, every data file holds exactly one
  * bucket (its id rides in [[AddFile.bucket]]), and the DSv2 scan reports
  * the layout as a `KeyGroupedPartitioning` so Spark's storage-partitioned
  * join (SPARK-37377) joins two co-bucketed tables WITHOUT shuffling
  * either side — at 100 TB the difference between a fact-fact join that
  * moves 100 TB over the network and one that moves nothing.
  *
  * The spec lives in table properties (copy-safe, checkpoint-safe);
  * every write path — batch, DSv2 SQL INSERT, and DML rewrites — routes
  * through the same [[bucketId]] expression so files stay consistently
  * bucketed for the table's lifetime.
  */
object Bucketing {

  val COLS_PROP = "graft.bucketColumns"
  val COUNT_PROP = "graft.bucketCount"

  /** Staging-only hive dir column carrying the bucket id (`__bucket=K/`);
    * stripped from partitionValues when the AddFile is built. */
  val BUCKET_DIR_COL = "__bucket"

  /** DSv2 METADATA column exposing each row's bucket id (constant per
    * file, served from the commit log — never stored or read from
    * parquet). Multi-column bucket specs can't engage SPJ through the V2
    * bucket transform (Spark's transform-to-join-key resolution is
    * single-reference), so the convention is: include `_bucket` in the
    * join — `ON a.k1 = b.k1 AND a.k2 = b.k2 AND a._bucket = b._bucket`
    * — and the scan reports `identity(_bucket)` instead, which matches.
    * The extra equi-condition is implied by the others ONLY when both
    * tables bucket the same key columns with the same function AND the
    * same numBuckets; with mismatched counts the predicate is NOT
    * implied and silently drops matches (and SPJ would not engage
    * anyway) — rebucket one side first ([[graft.lake.LakeTable.rebucket]]).
    */
  val BUCKET_META_COL = "_bucket"

  final case class Spec(columns: Seq[String], numBuckets: Int)

  def props(columns: Seq[String], numBuckets: Int): Map[String, String] =
    Map(COLS_PROP -> columns.mkString(","), COUNT_PROP -> numBuckets.toString)

  def specOf(meta: MetaData): Option[Spec] =
    for {
      cols <- meta.properties.get(COLS_PROP)
        .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
      if cols.nonEmpty
      n <- meta.properties.get(COUNT_PROP).flatMap(_.toIntOption)
      if n > 0
    } yield Spec(cols, n)

  /** Write-side bucket id: murmur3 (Spark's `hash`, seed 42) pmod n.
    * MUST stay in lockstep with the read-side V2 bucket function
    * (`GraftFunctions.bucket`) — SPJ correctness depends on both tables
    * and both sides of the pipeline agreeing on this exact function.
    */
  def bucketId(cols: Seq[Column], n: Int): Column =
    pmod(hash(cols: _*), lit(n))
}
