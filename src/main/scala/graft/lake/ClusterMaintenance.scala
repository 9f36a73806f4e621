package graft.lake

/** Planning core for [[LakeTable.optimizeIncrementalBy]] — the tiered
  * incremental-clustering maintenance (see that method's doc for the
  * layout model). Pure functions over a LIGHT per-file projection
  * ([[ClusterMaintenance.FileLayerInfo]]: path, size, class, min, max)
  * so the same layering runs driver-side on small tables and INSIDE
  * `flatMapGroups` on executors for big-log tables — the closure
  * captures only the column name and two primitives, never a session or
  * a table handle.
  *
  * File classification (the convergence contract — an immediate second
  * maintenance call must be a no-op by construction):
  *
  *  - RANGED: usable `[min, max]` keys — participates in the patience
  *    layering; rewrites only when its layer is not among the kept
  *    heaviest.
  *  - BLIND: stats absent ENTIRELY (a CONVERT-adopted tail) — the one
  *    case where a rewrite provably regains something (footer stats).
  *    Always rewrites, ONCE: the rewrite's stats land the file in
  *    RANGED or KEPT next call.
  *  - KEPT: stats exist but the column's bounds are unusable — an
  *    all-NULL run (min/max omitted by stats collection: the rewrite
  *    would regenerate an identical all-null file, forever), a
  *    NaN/Infinity-poisoned float chunk (the aggregation path renders
  *    unparseable "NaN" bounds; the FOOTER path omits the chunk's
  *    stats entirely, indistinguishable from all-null), or stats that
  *    predate the column (schema evolution: old files read all-null
  *    for it — nothing to cluster). In every one of these a rewrite
  *    regenerates the same unusable bounds: classifying them
  *    rewritable is unbounded commit churn, not maintenance. KEPT
  *    files also never count toward the layer depth. Null-run
  *    FRAGMENTATION (many small all-null files) is
  *    [[LakeTable.compact]]'s job — compaction merges them without
  *    pretending a range sort helps.
  */
private[lake] object ClusterMaintenance {

  final val RANGED = 0
  final val BLIND = 1
  final val KEPT = 2

  /** The table's RECORDED clustering column: written by single-axis
    * `zOrderBy`/`hilbertBy` and by `optimizeIncrementalBy` commits, so
    * the engine remembers which layout the operator paid for. The
    * recorded column is what [[maybeClusterAt]] maintains at checkpoint
    * boundaries; multi-column curve clustering CLEARS it (incremental
    * single-axis maintenance would shred a curve layout). */
  val CLUSTER_BY_PROP = "graft.cluster.by"
  /** Set to `false` to record the column without the boundary-time
    * auto-maintenance (manual `optimizeIncrementalBy` only). */
  val AUTO_PROP = "graft.cluster.auto"
  /** Layer budget the auto-maintenance restores to (default 4). */
  val MAX_LAYERS_PROP = "graft.cluster.maxLayers"

  /** Advisory → action (VERDICT r12 #5): the `DESCRIBE INDEX` advisory
    * tells the operator that at this fpp a wide IN keeps most files as
    * bloom candidates and CLUSTERING is the remedy; for a table whose
    * clustering column is recorded, this post-checkpoint hook ACTS on
    * it — one [[LakeTable.optimizeIncrementalBy]] per boundary, which
    * is an exact no-op when the layout is within its layer budget and
    * merges only the accumulated churn otherwise. Bounded: at most one
    * rewrite commit per checkpoint boundary, planning is one metadata
    * pass (distributed above the big-log threshold); idempotent: the
    * commit restores depth ≤ maxLayers, so the boundary it may itself
    * cross plans a no-op. Gates, cheapest first: recorded column
    * (cached-snapshot fast path — a table that never clustered costs
    * nothing here), `graft.cluster.auto` ≠ false, and for
    * bloom-indexed tables the advisory condition itself (wide-IN
    * candidate fraction at width 1000 ≥ 0.5 — below it the bloom
    * still carries wide INs and maintenance can wait for the
    * operator). Best-effort like the index build: a commit conflict
    * with a concurrent writer skips (the next boundary gets it).
    */
  def maybeClusterAt(log: LakeLog): Unit = {
    val rootKey = java.nio.file.Paths.get(log.tablePath)
      .toAbsolutePath.normalize.toString
    val cachedProps = Option(LakeLog.snapshotCache.get(rootKey))
      .map(_.snapshot.metaData.properties)
    if (cachedProps.exists(p => !p.contains(CLUSTER_BY_PROP))) return
    if (autoRunning.putIfAbsent(rootKey, true).isDefined) return
    try {
      val spark = org.apache.spark.sql.SparkSession.getActiveSession
        .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
        .getOrElse(return)
      val props = cachedProps.getOrElse {
        val (v, parts) = log.lastCheckpointInfo.getOrElse(return)
        val ckptPaths = log.checkpointPartPaths(v, parts)
        if (!ckptPaths.forall(java.nio.file.Files.isRegularFile(_))) return
        DistributedState.checkpointMeta(spark, ckptPaths)
          .map(_.properties).getOrElse(return)
      }
      val column = props.get(CLUSTER_BY_PROP).getOrElse(return)
      if (props.get(AUTO_PROP).exists(_.trim.equalsIgnoreCase("false"))) return
      if (props.contains(BloomIndex.COLS_PROP)) {
        val fpp = props.get(BloomIndex.FPP_PROP).flatMap(_.toDoubleOption)
          .filter(f => f > 0 && f < 1).getOrElse(0.03)
        if (1.0 - math.pow(1.0 - fpp, 1000) < 0.5) return
      }
      val maxLayers = props.get(MAX_LAYERS_PROP).flatMap(_.toIntOption)
        .filter(_ >= 2).getOrElse(4)
      val n = LakeTable.forPath(spark, log.tablePath)
        .optimizeIncrementalBy(column, maxLayers)
      if (n > 0) MaintenanceMetrics.autoClusterCommits.incrementAndGet()
    } catch {
      case scala.util.control.NonFatal(e) =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"auto cluster maintenance skipped for ${log.tablePath}: $e")
    } finally autoRunning.remove(rootKey)
  }

  /** One auto-maintenance per root at a time — a racing boundary skips
    * (the running call's commit covers its churn). */
  private val autoRunning =
    scala.collection.concurrent.TrieMap.empty[String, Boolean]

  /** The projection the layering scan runs over. `min`/`max` are the
    * raw stat strings (meaningful only for RANGED). */
  final case class FileLayerInfo(
      path: String, size: Long, cls: Int, min: String, max: String)

  /** Classify one file for the `column` layering (see object doc). */
  def classify(f: AddFile, column: String, numericLike: Boolean): FileLayerInfo =
    f.stats match {
      case None => FileLayerInfo(f.path, f.size, BLIND, "", "")
      case Some(s) =>
        (s.minValues.get(column), s.maxValues.get(column)) match {
          case (Some(mi), Some(ma)) =>
            if (!numericLike) FileLayerInfo(f.path, f.size, RANGED, mi, ma)
            else if (parses(mi) && parses(ma))
              FileLayerInfo(f.path, f.size, RANGED, mi, ma)
            else FileLayerInfo(f.path, f.size, KEPT, "", "")
          case _ =>
            // min/max absent with stats present: all-null run, NaN
            // footer omission, or pre-evolution stats — keep (see
            // object doc: a rewrite regenerates the same absence)
            FileLayerInfo(f.path, f.size, KEPT, "", "")
        }
    }

  private def parses(s: String): Boolean =
    try { BigDecimal(s); true } catch { case _: NumberFormatException => false }

  /** Patience layering over one partition directory's files → the files
    * that must rewrite to bring the layer depth back to ≤ `maxLayers`.
    * Empty result = the partition is already within depth (exact no-op).
    *
    * Layering: RANGED files in min order drop onto the layer with the
    * LARGEST current max still below their min (tightest fit keeps
    * layers long); none fits → a new layer opens. Layer count = interval
    * overlap depth = worst-case files a point predicate cannot
    * range-exclude. Tracked layers cap at 256 — a deeper layout is
    * pathologically unclustered and the overflow simply rewrites
    * (conservative, never keeps an overlapping file); the cap also
    * bounds the scan at O(files × 256). Past the depth bound the
    * `maxLayers − 1` HEAVIEST layers (by bytes — the base run stays
    * byte-for-byte untouched) keep and everything else merges into one
    * fresh disjoint run. Keys compare by the column's TYPE
    * (numeric-like stats are numeric renderings — a lexical compare
    * would misorder "100" under "99" and shred valid layers); strings
    * compare in UTF-8 byte order ([[Stats.strCmp]]), matching the order
    * the stats were aggregated in.
    */
  def rewriteSelection(
      group: Seq[FileLayerInfo],
      numericLike: Boolean,
      maxLayers: Int): Seq[FileLayerInfo] = {
    val blind = group.filter(_.cls == BLIND)
    val ranged = group.filter(_.cls == RANGED)
    // parse keys ONCE per file — the layering probes them O(cap) times
    def key(s: String): AnyRef =
      if (numericLike) BigDecimal(s) else s
    def kcmp(a: AnyRef, b: AnyRef): Int =
      if (numericLike)
        a.asInstanceOf[BigDecimal].compare(b.asInstanceOf[BigDecimal])
      else Stats.strCmp(a.asInstanceOf[String], b.asInstanceOf[String])
    val LAYER_CAP = 256
    val byMin = ranged.map(f => (f, key(f.min), key(f.max)))
      .sortWith((a, b) => kcmp(a._2, b._2) < 0)
    val layerMax = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    val layers = scala.collection.mutable.ArrayBuffer
      .empty[scala.collection.mutable.ArrayBuffer[FileLayerInfo]]
    val overflow = scala.collection.mutable.ArrayBuffer.empty[FileLayerInfo]
    byMin.foreach { case (f, mi, ma) =>
      var best = -1
      var i = 0
      while (i < layerMax.length) {
        if (kcmp(layerMax(i), mi) < 0 &&
            (best < 0 || kcmp(layerMax(i), layerMax(best)) > 0)) best = i
        i += 1
      }
      if (best >= 0) {
        layerMax(best) = ma
        layers(best) += f
      } else if (layers.length < LAYER_CAP) {
        layerMax += ma
        layers += scala.collection.mutable.ArrayBuffer(f)
      } else overflow += f
    }
    if (layers.length <= maxLayers && blind.isEmpty && overflow.isEmpty) Nil
    else {
      // keep the heaviest maxLayers−1 layers untouched (the base run);
      // every other RANGED file plus the blind set merges into one
      // fresh disjoint run. KEPT files are not group members here.
      val kept = layers.sortBy(l => -l.map(_.size).sum)
        .take(maxLayers - 1).flatMap(_.map(_.path)).toSet
      ranged.filterNot(f => kept.contains(f.path)) ++ blind
    }
  }

  /** Canonical grouping key for a file's partition directory — files of
    * different partitions are never co-scanned, so the layering is per
    * partition. */
  def partitionKey(f: AddFile): String =
    f.partitionValues.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString("/")
}

/** Test observability for maintenance planning (mirrors [[ReadMetrics]] /
  * DmlMetrics): how the most recent [[LakeTable.optimizeIncrementalBy]] /
  * scoped clustering call resolved its file list, and how many file
  * records it materialized on the driver.
  */
private[graft] object MaintenanceMetrics {
  /** true = layering ran over the distributed checkpoint scan. */
  val lastPlanDistributed = new java.util.concurrent.atomic.AtomicBoolean(false)
  /** AddFile records the planning phase pulled to the driver — on the
    * distributed path this must be ∝ the rewrite set, never the table. */
  val lastPlanDriverRows = new java.util.concurrent.atomic.AtomicLong(0L)
  /** Rewrite commits fired by the boundary-time auto-maintenance. */
  val autoClusterCommits = new java.util.concurrent.atomic.AtomicLong(0L)
}
