package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Class-balancing for training-data curation: stratified sampling and
  * per-group capping, both deterministic under a seed so pipeline
  * re-runs reproduce the same dataset.
  *
  * At 100 TB both shapes stay one pass: stratified sampling is a
  * per-row Bernoulli test against a broadcast fraction map (no shuffle
  * at all); capping is one window pass ordered by a seeded hash (one
  * shuffle on the stratum key, no global sort).
  */
object Balance {

  /** Stratified sample: keep ~`fractions(stratum)` of each stratum
    * (strata absent from the map are dropped). Spark's `sampleBy` —
    * per-row Bernoulli against the stratum's fraction, seeded.
    *
    * Keys must be the stratum column's RAW values (`sampleBy` looks up
    * by value, not string form) — [[balancingFractions]] returns exactly
    * that shape for any column type.
    */
  def stratifiedSample[T](df: DataFrame, stratumCol: String,
      fractions: Map[T, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Downsample every stratum to at most `maxRows` rows, chosen by a
    * seeded-hash order over `idCol` (deterministic, no
    * rarest-first/recency bias): the majority-class cap of a training
    * mix. Minority strata below the cap pass through untouched.
    */
  def capPerStratum(df: DataFrame, stratumCol: String, idCol: String,
      maxRows: Int, seed: Long = 42L): DataFrame = {
    require(maxRows > 0)
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= maxRows)
      .drop("__rn")
  }

  /** Proportions that downsample every stratum to the size of the
    * smallest (uniform class balance), computed from one count pass —
    * feed to [[stratifiedSample]]. Keyed by the stratum column's RAW
    * values so `sampleBy`'s per-value lookup hits for any column type
    * (an int class id as much as a string label). One collected row per
    * stratum: assumes a bounded label domain, as class-balancing does by
    * definition.
    */
  def balancingFractions(df: DataFrame, stratumCol: String): Map[Any, Double] = {
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "empty input")
    val minN = counts.values.min.toDouble
    counts.map { case (k, n) => k -> (minN / n) }
  }
}
