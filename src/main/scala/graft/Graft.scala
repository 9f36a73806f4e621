package graft

import org.apache.spark.sql.SparkSession

import graft.lake.LakeTable

/** Engine facade: one import for a user of the reference switching to
  * this library.
  *
  * {{{
  * val spark = Graft.session()
  * val t = Graft.createTable(spark, "/data/bronze/orders", df,
  *   partitionBy = Seq("o_orderstatus"))
  * t.merge(updates, expr("t.o_orderkey = s.o_orderkey"))
  * Graft.table(spark, "/data/bronze/orders").asOf(0).toDF.show()
  * }}}
  *
  * Area guide: `graft.lake` (ACID tables), `graft.ingest` (incremental
  * + event ingestion), `graft.streaming` (lake sink/source),
  * `graft.ops` (dedup / similarity / multimodal / skew),
  * `graft.functions` (text analysis, top-k UDAF), `graft.sql`
  * (catalog surface), `graft.pipeline` (medallion + ALS).
  */
object Graft {

  /** A SparkSession tuned the way the engine expects: AQE on, shuffle
    * partitions sized to cores (not 200), UTC — scale the master/memory
    * for a real cluster via the usual spark-submit knobs.
    */
  def session(appName: String = "graft",
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Option[Int] = None): SparkSession = {
    val cores = shufflePartitions.getOrElse(
      Runtime.getRuntime.availableProcessors())
    val s = SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      // native functions + SQL DML/DV resolution rules
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      // storage-partitioned joins: co-bucketed lake tables join shuffle-free
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      // partitioned+bucketed tables key on (partitions, bucket); joins on
      // just the bucket columns still SPJ by grouping on the subset
      .config("spark.sql.sources.v2.bucketing.allowJoinKeysSubsetOfPartitionKeys.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Register a DSv2 catalog over a warehouse directory so SQL resolves
    * lake tables natively: `SELECT/INSERT/MERGE/UPDATE/DELETE ...
    * lake.db.t`, CTAS, ALTER, time travel. (SQL DML additionally needs
    * the extensions — use [[session]] or set `spark.sql.extensions`.)
    */
  def registerCatalog(spark: SparkSession, name: String,
      warehouse: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      "org.apache.spark.sql.graft.LakeCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", warehouse)
  }

  def table(spark: SparkSession, path: String): LakeTable =
    LakeTable.forPath(spark, path)

  def createTable(spark: SparkSession, path: String,
      df: org.apache.spark.sql.DataFrame,
      partitionBy: Seq[String] = Seq.empty,
      mode: String = "error"): LakeTable =
    LakeTable.create(spark, path, df, partitionBy = partitionBy, mode = mode)

  def convert(spark: SparkSession, path: String,
      partitionSpec: Option[String] = None): LakeTable =
    LakeTable.convert(spark, path, partitionSpec)

  def isTable(path: String): Boolean = LakeTable.isLakeTable(path)

  /** Change data feed (Delta's `table_changes`): row-level changes of a
    * lake table between two versions, with `_change_type` /
    * `_commit_version` / `_commit_timestamp` columns. Requires
    * `graft.enableChangeDataFeed=true` on the table for DML commits.
    */
  def tableChanges(spark: SparkSession, path: String, startingVersion: Long,
      endingVersion: Option[Long] = None): org.apache.spark.sql.DataFrame =
    LakeTable.forPath(spark, path).tableChanges(startingVersion, endingVersion)
}
