package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.lake.LakeTable

/** SQL-facing surface of the engine (SURVEY §2 rows S3, K4, K5, K8, L9):
  * everything Spark's session catalog gives for free — databases, CTAS,
  * INSERT INTO, saveAsTable-with-path, `parquet.`-path scans — plus
  * registration of lake tables so SQL can query them (the Scala-API
  * route of §4: views now, a DSv2 TableCatalog as the follow-up).
  */
object SqlSurface {

  /** Register a lake table (optionally a time-travel pin) as a SQL view:
    * `SELECT ... FROM <name>` (the `delta.`-path analog of S3).
    */
  def registerLakeTable(spark: SparkSession, name: String, path: String,
      asOf: Option[Long] = None): Unit = {
    val t = LakeTable.forPath(spark, path)
    val pinned = asOf.map(t.asOf).getOrElse(t)
    pinned.toDF.createOrReplaceTempView(name)
  }

  /** `SELECT * FROM parquet.`path`` direct-path scan (S3). */
  def scanParquetPath(spark: SparkSession, path: String): DataFrame =
    spark.sql(s"SELECT * FROM parquet.`$path`")

  /** CREATE DATABASE + USE (L9). */
  def createDatabase(spark: SparkSession, db: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"USE $db")
  }

  /** CTAS into a managed parquet table (K4's vanilla form). */
  def ctas(spark: SparkSession, table: String, query: String): Unit =
    spark.sql(s"CREATE TABLE $table USING parquet AS $query")

  /** `df.write.option("path", p).saveAsTable(t)` — data write + catalog
    * entry in one step (K5, `03.movielens-gold.py:220-226`).
    */
  def saveAsExternalTable(df: DataFrame, table: String, path: String): Unit =
    df.write.mode("overwrite").option("path", path).saveAsTable(table)

  /** INSERT INTO ... VALUES (K8). */
  def insertValues(spark: SparkSession, table: String, valuesSql: String): Unit =
    spark.sql(s"INSERT INTO $table VALUES $valuesSql")

  /** Bucketed external table: pre-shuffles data into `nBuckets` by
    * `bucketCol` at write time so equi-joins/aggregations on that key
    * run WITHOUT a shuffle (both sides bucket-aligned) — the co-located
    * join strategy for repeated large-table joins at scale.
    */
  def saveBucketed(df: DataFrame, table: String, path: String,
      bucketCol: String, nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
}
