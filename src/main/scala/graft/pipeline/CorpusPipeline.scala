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
    * @param vecCol embedding column, if the docs carry one: the curated
    *   corpus additionally builds a persisted IVF index
    *   (`outRoot/semindex`) so [[curateIncremental]] waves can run the
    *   SEMANTIC cross-corpus gate in a stable cluster space.
    */
  def curate(
      spark: SparkSession,
      docs: DataFrame,
      outRoot: String,
      minQuality: Double = 0.3,
      minTokens: Int = 5,
      nearDupThreshold: Double = 0.5,
      transitiveNearDups: Boolean = false,
      vecCol: Option[String] = None,
      semNLists: Int = 8): CurateResult = {

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

    // CDC-enabled curated table + per-language stats as an INCREMENTAL
    // materialized view over its change feed: [[curateIncremental]]'s
    // daily batches refresh the stats from the appended rows alone,
    // never a rescan of the corpus (the lake5 composition applied to
    // the curation pipeline)
    LakeTable.create(spark, s"$outRoot/curated", curated, mode = "overwrite",
      properties = Map(graft.lake.Cdc.PROP -> "true"))
    graft.lake.IncrementalMv.create(spark, s"$outRoot/lang_stats",
      s"$outRoot/curated", groupBy = Seq("lang_pred"),
      sumCols = Seq("quality", "n_tokens"))
    // the semantic gate's stable cluster space for later waves, built by
    // READING BACK the just-written curated table — the in-memory plan
    // would re-run the LSH near-dup stage once per index action, and the
    // read-back guarantees the index matches exactly the version the
    // change-feed baseline below records
    vecCol.foreach { c =>
      val curatedT = LakeTable.forPath(spark, s"$outRoot/curated")
      graft.ops.Similarity.buildIvfIndex(
        curatedT.toDF, c, "doc_id", s"$outRoot/semindex", nLists = semNLists)
      graft.ops.Similarity.markIvfSynced(spark, s"$outRoot/semindex",
        curatedT.snapshot.version)
    }

    good.unpersist(); exact.unpersist()
    CurateResult(input, afterQuality, afterExact, afterNear)
  }

  /** The per-language stats in reporting shape, derived from the
    * incrementally-maintained view (avg = stored sum / non-null count).
    */
  def langStats(spark: SparkSession, outRoot: String): DataFrame =
    LakeTable.forPath(spark, s"$outRoot/lang_stats").toDF
      .select(col("lang_pred"), col("n").as("n_docs"),
        round(col("sum_quality") / col("nn_quality"), 4).as("avg_quality"),
        col("sum_n_tokens").cast("long").as("total_tokens"))

  final case class IncrementResult(
      input: Long, afterQuality: Long, appended: Long)

  /** Incremental curation — the daily-batch path over a corpus built by
    * [[curate]]: annotate → quality gate → within-batch exact dedup →
    * BLOOM-GATED cross-corpus dedup ([[Dedup.newAgainstCorpus]], reusing
    * the corpus's stored `fp` column — definitely-new rows pass map-side,
    * only bloom hits take the verification anti join) → optional
    * NEAR-DUP cross-corpus stages (VERDICT r3 #6) → append survivors →
    * refresh the stats view from the change feed. Cost tracks the
    * BATCH: the corpus contributes one bloom build plus the tiny
    * verification side, and the stats refresh reads only the appended
    * rows.
    *
    * @param paragraphScrub scrub batch PARAGRAPHS against the corpus
    *   ([[Dedup.paragraphDedupAgainstCorpus]] — boilerplate spliced into
    *   otherwise-new docs drops even though the whole-doc fingerprint is
    *   new); surviving docs are re-annotated (their text changed) and
    *   re-gated, and fully-boilerplate docs disappear.
    * @param vecCol run the SEMANTIC gate over the `outRoot/semindex` IVF
    *   index built by [[curate]]: batch docs ≥ `semThreshold` cosine to
    *   any corpus vector — or to an earlier same-batch doc — drop
    *   ([[Dedup.semanticNewAgainstIndex]]); survivors join the index via
    *   the curated table's CHANGE FEED
    *   ([[Similarity.syncIvfIndexFromTable]] — the applied source
    *   version commits atomically with the index append, so a crash
    *   between the corpus append and the index append just defers those
    *   vectors to the next wave's sync instead of losing them).
    * @param semNProbe inverted lists probed by the semantic gate; raise
    *   toward `semNLists` for recall, lower for cost.
    */
  def curateIncremental(
      spark: SparkSession,
      newDocs: DataFrame,
      outRoot: String,
      minQuality: Double = 0.3,
      minTokens: Int = 5,
      expectedCorpusItems: Long = 10_000_000L,
      paragraphScrub: Boolean = false,
      vecCol: Option[String] = None,
      semThreshold: Double = 0.8,
      semNProbe: Int = 2): IncrementResult = {
    val curatedT = LakeTable.forPath(spark, s"$outRoot/curated")
    // catch-up sync BEFORE the semantic gate: normally an instant no-op
    // (applied == latest), but after a crash between the corpus append
    // and the index append it folds the deferred vectors in first, so
    // the gate below never has a recall gap against them
    vecCol.foreach(c => graft.ops.Similarity.syncIvfIndexFromTable(spark,
      s"$outRoot/semindex", s"$outRoot/curated", c, "doc_id"))
    val input = newDocs.count()
    val good = annotate(newDocs)
      .where(col("quality") >= minQuality && col("n_tokens") >= minTokens)
      .cache()
    val afterQuality = good.count()

    // within-batch exact dedup, then cross-corpus bloom gate; cached —
    // the scrub and semantic stages below each reference it more than
    // once (the bloom UDF filter + anti join must not recompute per use)
    val keepers = good.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
    val batchUnique = good.join(keepers, Seq("fp", "doc_id"), "left_semi")
    val docFresh = Dedup.newAgainstCorpus(batchUnique, curatedT.toDF, "text",
      expectedCorpusItems, fpCol = Some("fp")).cache()

    // paragraph scrub vs the corpus: survivors' text changed, so the
    // derived columns (quality, token count, fingerprint) recompute and
    // the quality gate re-applies to the scrubbed text. Cached when it
    // is a distinct plan from docFresh — the semantic gate references it
    // twice (probe build + final anti join) and this scrub chain is the
    // wave's most expensive stage
    val scrubbed =
      if (!paragraphScrub) docFresh
      else {
        val cleanTexts = Dedup.paragraphDedupAgainstCorpus(
          docFresh.select(col("doc_id"), col("text")),
          curatedT.toDF.select(col("doc_id"), col("text")),
          "text", "doc_id",
          // sized to the corpus-items estimate: paragraph counts are a
          // small multiple of doc counts and bloom over-capacity only
          // degrades the false-positive rate (more rows take the exact
          // verification join), never correctness
          expectedCorpusItems = expectedCorpusItems)
        annotate(docFresh
            .drop("text", "lang_pred", "quality", "n_tokens", "fp")
            .join(cleanTexts, Seq("doc_id")))
          .where(col("quality") >= minQuality && col("n_tokens") >= minTokens)
          .cache()
      }

    // semantic gate vs the persisted cluster space (and within-batch)
    val fresh = (vecCol match {
      case Some(c) => Dedup.semanticNewAgainstIndex(spark,
        s"$outRoot/semindex", scrubbed, c, "doc_id", semThreshold, semNProbe)
      case None => scrubbed
    }).cache()
    val appended = fresh.count()

    if (appended > 0)
      curatedT.append(
        fresh.select(curatedT.snapshot.schema.fieldNames.map(col).toSeq: _*))
    // index maintenance from the curated CHANGE FEED, not the in-memory
    // batch: exactly-once under crashes (see scaladoc above), and it runs
    // even on appended == 0 waves so vectors deferred by an earlier crash
    // are picked up. The drift gate then retrains the cluster space only
    // when cheap appends have actually moved the distribution.
    vecCol.foreach { c =>
      graft.ops.Similarity.syncIvfIndexFromTable(spark,
        s"$outRoot/semindex", s"$outRoot/curated", c, "doc_id")
      graft.ops.Similarity.maybeRetrainIvfIndex(spark, s"$outRoot/semindex")
    }
    graft.lake.IncrementalMv.refresh(spark, s"$outRoot/lang_stats")

    good.unpersist(); docFresh.unpersist(); fresh.unpersist()
    if (paragraphScrub) scrubbed.unpersist()
    IncrementResult(input, afterQuality, appended)
  }

  /** Continuous curation — the streaming form of [[curateIncremental]]:
    * the LANDING lake table's commit log streams through the v2 source
    * ([[graft.streaming.LakeStreaming.asStreamV2]] — exact version
    * offsets, DML-safe) and each micro-batch runs the incremental path
    * (annotate → gate → in-batch dedup → bloom-gated cross-corpus
    * dedup → append → change-feed stats refresh).
    *
    * Exactly-once WITHOUT txn bookkeeping, at the content level: a
    * batch replayed after a crash re-enters the cross-corpus dedup
    * gate, whose fingerprints it already populated, so it appends
    * nothing; and the stats view refreshes from the curated table's
    * change feed, so a no-op append moves no stats. The checkpoint
    * only bounds REREAD volume, not correctness.
    */
  def curateContinuously(
      spark: SparkSession,
      landingPath: String,
      outRoot: String,
      checkpointLocation: String,
      minQuality: Double = 0.3,
      minTokens: Int = 5,
      expectedCorpusItems: Long = 10_000_000L,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      startingVersion: Long = 0L,
      paragraphScrub: Boolean = false,
      vecCol: Option[String] = None,
      semThreshold: Double = 0.8,
      semNProbe: Int = 2): org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.LakeStreaming.asStreamV2(spark, landingPath, startingVersion)
      .writeStream
      .queryName(s"curate:$outRoot")
      .option("checkpointLocation", checkpointLocation)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          curateIncremental(spark, batch, outRoot, minQuality, minTokens,
            expectedCorpusItems, paragraphScrub, vecCol, semThreshold,
            semNProbe)
          ()
        }
      }
      .start()
}
