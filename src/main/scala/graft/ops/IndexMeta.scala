package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

import graft.lake.{LakeTable, Snapshot}

/** One row of gate-index maintenance state — the engine-side analogue of
  * the reference's Iceberg metadata tables
  * (`notebooks/01.formatos_ficheros/03.iceberg_primer.py:322-402`, where
  * snapshots/manifests/files are inspected as DataFrames): everything an
  * operator needs to decide "is this index healthy, synced, and worth
  * compacting" without scanning it.
  *
  * All row counts are FOOTER-STATS estimates (numRecords minus
  * deletion-vector cardinality — the same no-scan arithmetic the
  * auto-compaction trigger uses), so describing a 100k-file index costs
  * a snapshot resolution, never a job.
  */
final case class GateIndexInfo(
    kind: String,
    index_path: String,
    index_version: Long,
    config: String,
    source_path: Option[String],
    source_generation: Option[String],
    synced_through: Long,
    indexed_rows: Long,
    source_live_rows: Option[Long],
    est_stale_fraction: Option[Double])

/** Observability over the persisted incremental-dedup/ANN indexes
  * ([[Dedup]] minhash postings, [[Similarity]] IVF assignments):
  * recorded source triple, exactly-once sync pointer, live row counts,
  * and the stats-estimated stale fraction the maintenance trigger
  * ([[graft.pipeline.CorpusPipeline.maybeCompactIndexes]]) acts on.
  * SQL surface: `DESCRIBE (MINHASH|IVF) INDEX AT idx` and
  * `SHOW INDEXES AT root`.
  */
object IndexMeta {

  private def liveRows(snap: Snapshot): Long = snap.estimatedLiveRows

  private def sourceState(spark: SparkSession, sourcePath: Option[String],
      indexedRows: Long, rowsPerSourceRow: Long)
      : (Option[Long], Option[Double]) =
    sourcePath.filter(LakeTable.isLakeTable) match {
      case Some(sp) =>
        // a source with NO footer stats at all (CONVERT-adopted corpus)
        // has no live-row basis: report unknown rather than an estimate
        // of 0 rows that would read as ~100% stale and thrash the
        // compaction trigger (ADVICE r10)
        LakeTable.forPath(spark, sp).snapshot.estimatedLiveRowsIfKnown match {
          case Some(live) =>
            val expected = live * rowsPerSourceRow
            val stale =
              if (indexedRows <= 0) 0.0
              else math.max(0.0, 1.0 - expected.toDouble / indexedRows)
            (Some(live), Some(stale))
          case None => (None, None)
        }
      case None => (None, None)
    }

  /** Maintenance state of a persisted MinHash band index (one row). */
  def describeMinhash(spark: SparkSession, indexPath: String): DataFrame = {
    val post = LakeTable.forPath(spark, s"$indexPath/postings")
    val snap = post.snapshot
    val props = snap.metaData.properties
    val (shingleN, bands, rowsPerBand) = Dedup.minhashConf(props)
    val sourcePath = props.get(Dedup.MINHASH_SOURCE_PATH_PROP)
    // the sync pointer rides a SetTxn; the build baseline rides a
    // property — "synced through" is whichever is further, exactly the
    // arithmetic the sync itself replays against
    val synced = math.max(
      sourcePath.map(sp =>
        snap.txns.getOrElse(Dedup.minhashSyncAppId(sp), -1L)).getOrElse(-1L),
      props.get(Dedup.MINHASH_SYNCED_PROP).flatMap(_.toLongOption)
        .getOrElse(-1L))
    val indexed = liveRows(snap)
    val (srcLive, stale) = sourceState(spark, sourcePath, indexed, bands)
    spark.createDataset(Seq(GateIndexInfo(
      "minhash", indexPath, snap.version,
      s"shingleN=$shingleN,bands=$bands,rowsPerBand=$rowsPerBand",
      sourcePath, props.get(Dedup.MINHASH_SOURCE_ID_PROP),
      synced, indexed, srcLive, stale)))(
      Encoders.product[GateIndexInfo]).toDF()
  }

  /** Maintenance state of a persisted IVF ANN index (one row). */
  def describeIvf(spark: SparkSession, indexPath: String): DataFrame = {
    val asg = LakeTable.forPath(spark, s"$indexPath/assignments")
    val cb = LakeTable.forPath(spark, s"$indexPath/codebook")
    val asgSnap = asg.snapshot
    val cbProps = cb.snapshot.metaData.properties
    val sourcePath = cbProps.get(Similarity.SOURCE_PATH_PROP)
    val synced = math.max(
      sourcePath.map(sp =>
        asgSnap.txns.getOrElse(Similarity.syncAppId(sp), -1L)).getOrElse(-1L),
      cbProps.get(Similarity.SYNCED_PROP).flatMap(_.toLongOption)
        .getOrElse(-1L))
    val nLists = liveRows(cb.snapshot)
    val trained = cbProps.get(Similarity.TRAINED_COUNT_PROP)
      .flatMap(_.toLongOption).getOrElse(0L)
    val idCol = cbProps.get(Similarity.SOURCE_ID_COL_PROP)
    val indexed = liveRows(asgSnap)
    val (srcLive, stale) = sourceState(spark, sourcePath, indexed, 1L)
    spark.createDataset(Seq(GateIndexInfo(
      "ivf", indexPath, asgSnap.version,
      s"nLists=$nLists,trainedCount=$trained" +
        idCol.map(c => s",idCol=$c").getOrElse(""),
      sourcePath, cbProps.get(Similarity.SOURCE_ID_PROP),
      synced, indexed, srcLive, stale)))(
      Encoders.product[GateIndexInfo]).toDF()
  }

  /** Consolidated bloom key index over a lake table
    * ([[graft.lake.ConsolidatedKeyIndex]]), when one is published:
    * `indexed_rows` counts live files the index COVERS (bit-identical
    * sidecar repack), `source_live_rows` the table's live bloom-indexed
    * files, and the stale fraction is exactly the uncovered share the
    * coverage-gated rebuild trigger acts on. Zero rows when the table
    * has no published index. */
  def describeKeyBloom(spark: SparkSession, tablePath: String): DataFrame = {
    val rootStr = java.nio.file.Paths.get(tablePath)
      .toAbsolutePath.normalize.toString
    val rows =
      if (!LakeTable.isLakeTable(tablePath)) Seq.empty
      else {
        val snap = LakeTable.forPath(spark, tablePath).snapshot
        val live = snap.files
          .filter(_.bloomPath.isDefined).map(f => (f.path, f.bloomPath))
        graft.lake.ConsolidatedKeyIndex.coverage(rootStr, live).map {
          case (version, covered, slots, config) =>
            val liveN = live.size.toLong
            GateIndexInfo("keybloom",
              s"$rootStr/${graft.lake.ConsolidatedKeyIndex.DIR}/v$version",
              version, config + s",slots=$slots" + wideInAdvisory(
                snap.metaData.properties),
              Some(rootStr), None, version, covered, Some(liveN),
              Some(if (liveN <= 0) 0.0
              else math.max(0.0, 1.0 - covered.toDouble / liveN)))
        }.toSeq
      }
    spark.createDataset(rows)(Encoders.product[GateIndexInfo]).toDF()
  }

  /** fpp-per-IN-width advisory (VERDICT r11 round-12 #1b): on an
    * UNCLUSTERED layout, an IN of width W keeps ~1−(1−fpp)^W of the
    * files whose min/max range cannot exclude the keys — genuine bloom
    * false-positive candidates, a data cost no index removes. The
    * numbers tell the operator at which IN width the bloom stops
    * pruning and key clustering (`zOrderBy` / `OPTIMIZE ... ZORDER BY`)
    * or a lower `graft.bloom.fpp` becomes the remedy — clustered files
    * hold disjoint key ranges, so the compiled IN's window search
    * prunes by range instead. */
  private def wideInAdvisory(props: Map[String, String]): String = {
    val fpp = props.get(graft.lake.BloomIndex.FPP_PROP)
      .flatMap(_.toDoubleOption).filter(f => f > 0 && f < 1)
      .getOrElse(0.03)
    def cand(w: Int): Double = 1.0 - math.pow(1.0 - fpp, w)
    val widths = Seq(10, 100, 1000)
    val frac = widths.map(w =>
      s"$w:" + f"${cand(w)}%.3f".replace(',', '.')).mkString("/")
    val hint =
      if (cand(1000) >= 0.5) ",hint=wide IN lists keep most files as " +
        "bloom candidates at this fpp - cluster the key (ZORDER BY) " +
        "or lower graft.bloom.fpp"
      else ""
    s",fpp=$fpp,inWidthCandidateFrac=$frac$hint"
  }

  /** Every gate index discoverable under `root`: the pipeline layout's
    * `mhindex` / `semindex` children, plus `root` itself when it IS an
    * index (or a lake table carrying a consolidated bloom key index).
    * Zero rows (with the full schema) when none exists. */
  def indexes(spark: SparkSession, root: String): DataFrame = {
    val found = Seq.newBuilder[DataFrame]
    def minhashAt(p: String): Unit =
      if (LakeTable.isLakeTable(s"$p/postings"))
        found += describeMinhash(spark, p)
    def ivfAt(p: String): Unit =
      if (LakeTable.isLakeTable(s"$p/assignments") &&
          LakeTable.isLakeTable(s"$p/codebook"))
        found += describeIvf(spark, p)
    def keyBloomAt(p: String): Unit =
      if (LakeTable.isLakeTable(p)) {
        val df = describeKeyBloom(spark, p)
        if (!df.isEmpty) found += df
      }
    minhashAt(s"$root/mhindex"); minhashAt(root)
    ivfAt(s"$root/semindex"); ivfAt(root)
    keyBloomAt(s"$root/curated"); keyBloomAt(root)
    val dfs = found.result()
    if (dfs.isEmpty)
      spark.emptyDataset(Encoders.product[GateIndexInfo]).toDF()
    else dfs.reduce(_ unionByName _)
  }
}
