package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every QueryGroup's defs into the queries/oracleSql maps the
  * driver's Verify/Bench harness consumes.
  */
object SparkEntry {

  /** All registered operator groups (SURVEY.md §2 coverage). */
  def groups: Seq[QueryGroup] = Seq(
    RelationalQueries,
    JoinQueries,
    TpchQueries,
    FunctionQueries,
    WindowQueries,
    AdvancedQueries,
    TextQueries,
    DedupQueries,
    SimilarityQueries,
    TemporalQueries,
    LakeQueries)

  def allDefs: Seq[QueryDef] = groups.flatMap(_.defs)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
