package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.lake.LakeTable
import graft.ops.Dedup

/** Training-corpus curation pipeline: the end-to-end composition of the
  * text/dedup operators a 100 TB pretraining-data run needs —
  *
  *   raw documents
  *     → annotate (lang-id, quality, token counts, fingerprint)
  *     → quality gate
  *     → exact dedup (fingerprint, keep smallest doc_id)
  *     → near-dup removal (MinHash LSH candidates, exact-Jaccard
  *       verified; higher doc_id of each surviving pair dropped)
  *     → curated lake table + per-language stats
  *
  * Every stage is a pure DataFrame transform; only the final writes
  * touch storage. At scale the stages are shuffle-bounded by: one hash
  * shuffle (exact dedup), one band-bucket join (LSH), one broadcast
  * anti-join (drop list).
  */
object CorpusPipeline {

  final case class CurateResult(
      input: Long, afterQuality: Long, afterExact: Long, afterNear: Long)

  /** Annotate documents with the text-analysis columns. */
  def annotate(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("lang_pred", langId(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("fp", fingerprint(col(textCol)))

  /** Run the full curation; writes `curated` and `lang_stats` lake
    * tables under `outRoot` and returns the stage row counts.
    *
    * @param transitiveNearDups near-dup removal policy. false (default):
    *   drop the larger doc_id of each verified pair — a doc survives
    *   unless it is a near-dup of a SMALLER surviving doc. true: cluster
    *   pairs into connected components first ([[Dedup.dedupByPairs]]) and
    *   keep ONE representative per cluster — a chain a~b~c keeps only a,
    *   even though (a, c) was never a pair.
    */
  def curate(
      spark: SparkSession,
      docs: DataFrame,
      outRoot: String,
      minQuality: Double = 0.3,
      minTokens: Int = 5,
      nearDupThreshold: Double = 0.5,
      transitiveNearDups: Boolean = false): CurateResult = {

    val input = docs.count()
    val annotated = annotate(docs)

    // quality gate
    val good = annotated
      .where(col("quality") >= minQuality && col("n_tokens") >= minTokens)
      .cache()
    val afterQuality = good.count()

    // exact dedup: keep the smallest doc_id per fingerprint
    val keepers = good.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
    val exact = good.join(keepers, Seq("fp", "doc_id"), "left_semi").cache()
    val afterExact = exact.count()

    // near-dup removal: LSH candidates verified by exact Jaccard; drop
    // the larger doc_id of each surviving pair
    val pairs = Dedup.minhashLsh(exact, "text", "doc_id",
      shingleN = 3, bands = 8, rowsPerBand = 4, threshold = nearDupThreshold)
    val curated =
      if (transitiveNearDups) Dedup.dedupByPairs(exact, "doc_id", pairs)
      else {
        val dropList = pairs.select(col("id_b").as("doc_id")).distinct()
        exact.join(broadcast(dropList), Seq("doc_id"), "left_anti")
      }
    val afterNear = curated.count()

    LakeTable.create(spark, s"$outRoot/curated", curated, mode = "overwrite")
    val stats = curated.groupBy(col("lang_pred"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("quality")), 4).as("avg_quality"),
        sum(col("n_tokens")).cast("long").as("total_tokens"))
    LakeTable.create(spark, s"$outRoot/lang_stats", stats, mode = "overwrite")

    good.unpersist(); exact.unpersist()
    CurateResult(input, afterQuality, afterExact, afterNear)
  }
}
