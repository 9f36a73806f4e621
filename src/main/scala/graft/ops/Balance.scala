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

  /** Deterministic uniform in [0,1) from a row id: an md5-prefix hash,
    * not an RNG — reproducible across engines, re-runs, and partitionings
    * (the DuckDB twin is `('0x'||substr(md5(id),1,8))::BIGINT /
    * 4294967296.0`). */
  def hash01(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long") /
      lit(4294967296.0)

  /** Dataset MIXTURE sampling — the weighting step of a training-data
    * pipeline: given `(name, df, weight)` sources, emit a mix whose
    * composition follows the weights, sampling WITHOUT replacement (the
    * scarcest source relative to its weight pins the total; no source
    * oversamples). Rows are chosen by the deterministic [[hash01]]
    * threshold, so the mix is reproducible row-for-row across engines
    * and re-runs — no RNG partition state.
    *
    * One `count()` per source sizes the fractions (bounded by the number
    * of datasets, not their size); the sampling itself is a map-side
    * filter per source — no shuffle, no join.
    */
  def mixture(sources: Seq[(String, DataFrame, Double)],
      idCol: String): DataFrame = {
    require(sources.nonEmpty, "mixture needs at least one source")
    require(sources.forall(_._3 > 0), "weights must be positive")
    val counted = sources.map { case (name, df, w) => (name, df, w, df.count()) }
    require(counted.forall(_._4 > 0L), "every source must be non-empty")
    val total = counted.map { case (_, _, w, n) => n / w }.min
    counted.map { case (name, df, w, n) =>
      val frac = math.min(1.0, w * total / n)
      df.where(hash01(col(idCol)) < frac)
        .withColumn("dataset", lit(name))
    }.reduce(_ unionByName _)
  }

  /** Deterministic GLOBAL SHUFFLE into training shards — the final
    * ordering step of a data pipeline: examples must reach the trainer
    * in a reproducible pseudo-random order, sharded so that no global
    * sort exists anywhere. `shard` = md5-derived hash of the id mod
    * `numShards`; `pos` = rank of the full md5 key within the shard
    * (id tie-break). md5 is engine-portable (unlike RNG or xxhash
    * orderings), so the layout is identical across engines and re-runs.
    * One partitioned window per shard — shards shuffle independently;
    * nothing ever orders the whole corpus on one node.
    */
  def shardShuffle(df: DataFrame, idCol: String, numShards: Int): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    df.withColumn("__key", md5(col(idCol).cast("string")))
      .withColumn("shard",
        pmod(conv(substring(col("__key"), 1, 8), 16, 10).cast("long"),
          lit(numShards.toLong)).cast("int"))
      .withColumn("pos",
        row_number().over(
          Window.partitionBy(col("shard"))
            .orderBy(col("__key"), col(idCol))).cast("long"))
      .drop("__key")
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

  /** Deterministic holdout split (train/val/test): each row lands in the
    * named slice whose cumulative-[[hash01]] window contains its id's
    * hash. No RNG and no count pass: a row's slice is a pure function of
    * its id, so it NEVER changes as the corpus grows or repartitions —
    * the stability a train/test contamination boundary needs (a val doc
    * must not drift into train on the next pipeline run). Fractions must
    * sum to <= 1; rows past the last boundary (when the sum is < 1) get
    * a null slice — an explicit holdout.
    *
    * Map-side-only (one projection, no shuffle) at any scale. The slice
    * expression is the same md5-threshold arithmetic as [[mixture]], so
    * an external engine reproduces the exact row sets from the SQL twin.
    */
  def holdoutSplit(df: DataFrame, idCol: String,
      slices: Seq[(String, Double)]): DataFrame = {
    require(slices.nonEmpty, "holdoutSplit needs at least one slice")
    require(slices.forall(_._2 > 0), "slice fractions must be positive")
    require(slices.map(_._2).sum <= 1.0 + 1e-9, "fractions must sum to <= 1")
    val h = hash01(col(idCol))
    val cums = slices.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val first = when(h < lit(cums.head), lit(slices.head._1))
    val assigned = slices.tail.zip(cums.tail).foldLeft(first) {
      case (acc, ((name, _), cum)) => acc.when(h < lit(cum), lit(name))
    }
    df.withColumn("slice", assigned)
  }
}
