package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness tables (TESTDATA.md): one parquet dir per table
  * under `sfDir`. Reads are plain `spark.read.parquet` so Catalyst keeps
  * pushdown/pruning (SURVEY.md §4).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Schema per (path) — harness tables are immutable fixture files, so
    * the footer-derived schema never changes within a run. Without this,
    * EVERY query construction paid one 1-task schema-inference job per
    * table it touched (~30 ms each; q5 builds 6 tables = 6 jobs before
    * any real work, ~300 jobs across a full catalog run). With an
    * explicit schema Spark skips the inference job entirely. Keyed on
    * the resolved path so several SFs coexist; bounded by #tables × #SFs.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) (which vanilla
    * Spark rejects — [PARQUET_TYPE_ILLEGAL]) and as TIMESTAMP(MICROS)
    * without UTC adjustment (which Spark reads as TIMESTAMP_NTZ) across
    * harness revisions. Normalize every encoding to the same session-tz
    * TimestampType column at microsecond precision — matching DuckDB's
    * naive TIMESTAMP view of the file.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => // nanos-as-long files: rebuild micros
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // micros, not UTC-adjusted
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
