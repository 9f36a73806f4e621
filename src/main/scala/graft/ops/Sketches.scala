package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable sketch state for streaming/batch pipelines (Apache
  * DataSketches HLL via Spark's built-in `hll_sketch_agg` family).
  *
  * The 100 TB shape: distinct-count STATE is pre-aggregated once per
  * fine-grained group (a day, a partition, an ingest batch) into a few-KB
  * binary sketch and PERSISTED; any coarser rollup — per week, per type,
  * global — is a union of stored sketches, never a rescan of raw data.
  * Sketches are associative and commutative, so incremental maintenance
  * is append-only: sketch the new batch, store it, done.
  */
object Sketches {

  /** Fine-grained sketch state: one HLL sketch of `valueCol` per
    * `keyCols` group — the rows a pipeline would persist. */
  def distinctSketches(df: DataFrame, keyCols: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol)).as("sketch"))

  /** Roll stored sketch state up to `keyCols` (a SUBSET of the stored
    * grain, or empty for a global estimate): union the sketches, then
    * estimate. Cost ∝ number of stored sketch rows, not raw data.
    */
  def estimateDistinct(sketches: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val est = hll_sketch_estimate(hll_union_agg(col("sketch")))
      .as("distinct_count")
    if (keyCols.isEmpty) sketches.agg(est)
    else sketches.groupBy(keyCols.map(col): _*).agg(est)
  }
}
