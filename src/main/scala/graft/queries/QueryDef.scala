package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator exercise from SURVEY.md §2.
  *
  * @param name   stable key, also the output parquet dir name in Verify
  * @param build  (spark, sfDir) => result DataFrame. MUST be deterministic:
  *               every oracle'd query carries a total ORDER BY (the driver
  *               hash-compares values in row order after sorting columns by
  *               name).
  * @param oracle equivalent SQL for DuckDB over views named after the
  *               tables (region/nation/.../documents/embeddings). None for
  *               non-SQL-expressible ops → driver does a rows-only check.
  *
  * Conventions for hash-stable oracle parity:
  *  - alias every computed column identically on both sides;
  *  - round double aggregates (floating-point addition order differs
  *    between engines) — `round(x, 2)` money, `round(x, 4)` ratios;
  *  - never sort on a nullable key without an explicit null ordering
  *    (Spark ASC = NULLS FIRST, DuckDB ASC = NULLS LAST).
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** A group of related QueryDefs (one object per SURVEY.md §2 area). */
trait QueryGroup {
  def defs: Seq[QueryDef]
}
