package graft.lake

import org.apache.spark.sql.functions._

/** Measurement harness for VERDICT r7 "next round" #5: a point lookup
  * that min/max cannot exclude opens ONE bloom sidecar per candidate
  * file — how bad is that fan-in at a large file count? Run with
  *
  *   sbt "Test/runMain graft.lake.BloomFanInBench [nFiles]"
  *
  * Builds an unclustered bloom-indexed table of `nFiles` files (each
  * file's id range spans the domain, so min/max never excludes and the
  * bloom is consulted for EVERY live file), then measures a cold point
  * read (every sidecar read from disk), a warm one (cache), and the
  * distributed-path variant (executor-side sidecar reads). Numbers are
  * recorded in BASELINE.md §Q.
  *
  * Round-10 extension (VERDICT r9 #1): after the sidecar-path probes, a
  * forced checkpoint publishes the CONSOLIDATED key index
  * ([[ConsolidatedKeyIndex]]) and the same probes re-run against it —
  * the driver then reads k bit-slices per value instead of opening one
  * sidecar per candidate file. The acceptance bar: consolidated
  * point-probe resolution at 100k files within ~2× of the 1k-file
  * cost. Numbers in BASELINE.md §S.
  */
object BloomFanInBench {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(20000)
    // optional second arg: an existing bench root to REUSE (skips the
    // slow table build — 100k files take ~25 min to write), or "keep"
    // to build fresh and leave the root on disk, printed at the end
    val reuse = args.drop(1).headOption.filter(_ != "keep")
    val keep = args.drop(1).headOption.contains("keep") || reuse.isDefined
    val rowsPerFile = 20
    val spark = graft.TestSpark.session
    spark.sparkContext.setLogLevel("ERROR")
    val root = reuse.getOrElse(
      java.nio.file.Files.createTempDirectory("bloom-fanin-").toString)

    val t = reuse match {
      case Some(_) => LakeTable.forPath(spark, s"$root/t")
      case None =>
        // ids hash-scattered across files: every file's (min, max) spans
        // ~the whole domain, so range skipping is structurally blind —
        // the worst case the bloom index exists for
        val df = spark.range(0L, nFiles.toLong * rowsPerFile)
          .select(col("id"), (col("id") % 1000).as("v"))
          .repartition(nFiles, col("id"))
        val t0 = System.nanoTime()
        val created = LakeTable.create(spark, s"$root/t", df,
          properties = Map(BloomIndex.COLS_PROP -> "id",
            ConsolidatedKeyIndex.MIN_FILES_PROP -> "1"))
        println(f"[fanin] built ${created.snapshot.files.size}%d files " +
          f"(+sidecars) in ${(System.nanoTime() - t0) / 1e9}%.1f s")
        created
    }
    val files = t.snapshot.files.size

    // MID-DOMAIN keys: P(a file's min exceeds the key or its max falls
    // below it) ~ 2·(1/2)^rowsPerFile — range skipping is structurally
    // blind, so the bloom is consulted for (essentially) EVERY file;
    // a low key would let min/max shortcut most of the fan-in and
    // measure the wrong thing
    val mid = nFiles.toLong * rowsPerFile / 2
    def probe(label: String, t: LakeTable, key: Long): Unit = {
      BloomMetrics.reset()
      KeyIndexMetrics.reset()
      val t1 = System.nanoTime()
      val n = t.read(col("id") === key).count()
      val sec = (System.nanoTime() - t1) / 1e9
      println(f"[fanin] $label%s: $sec%.3f s, rows=$n%d, " +
        f"bloom-skipped=${BloomMetrics.skippedByBloom.get()}%d of $files%d, " +
        f"consolidated-served=${KeyIndexMetrics.served.get()}%d")
    }
    probe("cold driver-side point read ", t, mid + 1)
    probe("warm driver-side point read ", t, mid + 1)
    probe("fresh-key driver point read ", t, mid + 3) // sidecars cached

    // distributed path: candidates resolve through the checkpoint scan,
    // sidecars read ON EXECUTORS in parallel
    spark.conf.set("spark.graft.log.distributedThreshold", "1")
    try {
      LakeLog.snapshotCache.clear()
      val t2 = LakeTable.forPath(spark, s"$root/t")
      probe("warm distributed point read", t2, mid + 5) // sidecar cache shared in-JVM
      probe("dist fresh-key point read  ", t2, mid + 7)
    } finally spark.conf.unset("spark.graft.log.distributedThreshold")

    // SUSTAINED THRASH: production sidecars are ~1 MB (1M-row files), so
    // a 100k-file table holds ~100 GB of filter bytes — the 64 MB cache
    // covers 0.07% and EVERY probe re-opens ~every sidecar. The bench's
    // tiny sidecars would all fit, so emulate the pressure by shrinking
    // the cache to the same coverage ratio.
    val normalCache = BloomIndex.CACHE_MAX_BYTES
    BloomIndex.CACHE_MAX_BYTES = 64L << 10
    BloomIndex.clearCache()
    try {
      probe("THRASHED sidecar point read", t, mid + 21)
      probe("THRASHED sidecar repeat    ", t, mid + 21)
    } finally { BloomIndex.CACHE_MAX_BYTES = normalCache; BloomIndex.clearCache() }

    // consolidated key index: one forced checkpoint publishes it, then
    // the same driver-side probes read k bit-slices per value instead of
    // opening one sidecar per file. Threshold pinned high so resolution
    // stays on the DRIVER path being measured.
    spark.conf.set("spark.graft.log.distributedThreshold", "100000000")
    try {
      val tb = System.nanoTime()
      t.log.writeCheckpointAt(t.snapshot.version)
      LakeLog.awaitMaintenance() // the build runs async off the commit path
      println(f"[fanin] checkpoint + consolidated index build: " +
        f"${(System.nanoTime() - tb) / 1e9}%.1f s")
      probe("consolidated point read    ", t, mid + 9)
      probe("consolidated fresh-key read", t, mid + 11)
      probe("consolidated repeat read   ", t, mid + 11)
      // the thrash scenario again — the consolidated path doesn't care
      // about the sidecar cache at all
      BloomIndex.CACHE_MAX_BYTES = 64L << 10
      BloomIndex.clearCache()
      try probe("consolidated THRASH-immune ", t, mid + 23)
      finally { BloomIndex.CACHE_MAX_BYTES = normalCache; BloomIndex.clearCache() }

      // WIDE-IN memo (round 11): a 1000-value IN-list over every live
      // file — the per-section LRU keeps slice reads ∝ distinct values,
      // never values × the pruning loop's O(files) visits. The PRUNE
      // line isolates the evaluator loop (the end-to-end number is
      // dominated by genuinely scanning the fpp×values candidate files
      // — at this fpp a 1000-value IN keeps ~40% of an unclustered
      // table, a data cost no index removes).
      KeyIndexMetrics.reset()
      val inVals: Seq[Any] = (0 until 1000).map(i => mid + 101 + 2L * i)
      val inPred = col("id").isin(inVals: _*)
      val snapIn = t.snapshot
      val probeIn = BloomIndex.probe(
        java.nio.file.Paths.get(s"$root/t").toAbsolutePath.normalize.toString)
      val normIn = Stats.normalize(
        org.apache.spark.sql.catalyst.expressions.In(
          org.apache.spark.sql.catalyst.expressions.AttributeReference(
            "id", org.apache.spark.sql.types.LongType)(),
          (0 until 1000).map(i =>
            org.apache.spark.sql.catalyst.expressions.Literal(
              mid + 101 + 2L * i))))
      val tp = System.nanoTime()
      val inCandidates = snapIn.files.count(f =>
        Stats.mightMatchNormalized(f, normIn, snapIn.schema, Nil, probeIn))
      println(f"[fanin] 1000-value IN-list PRUNE : " +
        f"${(System.nanoTime() - tp) / 1e9}%.2f s, " +
        f"candidates=$inCandidates%d of ${snapIn.files.size}%d, " +
        f"slice-reads=${KeyIndexMetrics.sliceReads.get()}%d, " +
        f"served=${KeyIndexMetrics.served.get()}%d")
      val ti = System.nanoTime()
      val inRows = t.read(inPred).count()
      println(f"[fanin] 1000-value IN-list probe: " +
        f"${(System.nanoTime() - ti) / 1e9}%.2f s, rows=$inRows%d, " +
        f"slice-reads=${KeyIndexMetrics.sliceReads.get()}%d, " +
        f"served=${KeyIndexMetrics.served.get()}%d")

      // CLUSTERED REMEDY (round 12, VERDICT r11 #1a): the same
      // 1000-value IN over a Z-ORDERed copy — clustered files hold
      // DISJOINT id ranges (single-axis zOrderBy is exact range
      // clustering at any file count), so the compiled IN's window
      // binary-search excludes files by RANGE and the candidate set
      // becomes ∝ the matching key span (here ~2000 consecutive ids),
      // not the fpp-bound ~40% of an unclustered layout. Copy capped
      // at 20k files to bound the fixture-build time at 100k runs.
      val zRootStr = java.nio.file.Paths
        .get(s"$root/z").toAbsolutePath.normalize.toString
      val zFresh = !java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(s"$root/z/${LakeLog.LOG_DIR}"))
      val zt =
        if (!zFresh)
          LakeTable.forPath(spark, s"$root/z")
        else {
          val tz0 = System.nanoTime()
          val created = LakeTable.create(spark, s"$root/z",
            t.toDF.repartition(math.min(nFiles, 20000), col("id")),
            properties = Map(BloomIndex.COLS_PROP -> "id",
              ConsolidatedKeyIndex.MIN_FILES_PROP -> "1",
              // the bench MEASURES maintenance manually — the boundary
              // auto-trigger must not race its timed arms
              ClusterMaintenance.AUTO_PROP -> "false"))
          created.zOrderBy("id")
          println(f"[fanin] built + Z-ORDERed clustered copy " +
            f"(${created.snapshot.files.size}%d files) in " +
            f"${(System.nanoTime() - tz0) / 1e9}%.1f s")
          created
        }
      val snapZ = zt.snapshot
      val probeZ = BloomIndex.probe(zRootStr)
      // no consolidated index on the copy yet: range pruning alone
      // carries the wide IN (the point of the remedy)
      val tz1 = System.nanoTime()
      val zCands = snapZ.files.count(f =>
        Stats.mightMatchNormalized(f, normIn, snapZ.schema, Nil, probeZ))
      println(f"[fanin] clustered IN PRUNE (range-only): " +
        f"${(System.nanoTime() - tz1) / 1e9}%.2f s, " +
        f"candidates=$zCands%d of ${snapZ.files.size}%d " +
        f"(unclustered kept $inCandidates%d of ${snapIn.files.size}%d)")
      val tz2 = System.nanoTime()
      val zRows = zt.read(inPred).count()
      println(f"[fanin] clustered IN read           : " +
        f"${(System.nanoTime() - tz2) / 1e9}%.2f s, rows=$zRows%d " +
        f"(unclustered rows=$inRows%d)")
      // and with the consolidated index published over the clustered
      // files the verdicts are unchanged — the index only matters
      // inside the (narrow) in-range window now
      zt.log.writeCheckpointAt(zt.snapshot.version)
      LakeLog.awaitMaintenance()
      ConsolidatedKeyIndex.invalidate(zRootStr)
      KeyIndexMetrics.reset()
      val tz3 = System.nanoTime()
      val zCands2 = snapZ.files.count(f =>
        Stats.mightMatchNormalized(f, normIn, snapZ.schema, Nil, probeZ))
      println(f"[fanin] clustered IN PRUNE (indexed): " +
        f"${(System.nanoTime() - tz3) / 1e9}%.2f s, " +
        f"candidates=$zCands2%d, " +
        f"slice-reads=${KeyIndexMetrics.sliceReads.get()}%d")

      // INCREMENTAL CLUSTERING MAINTENANCE (round 12): churn the
      // clustered copy with 32 domain-spanning scatter files, then
      // merge ONLY the residue — the base run must survive untouched
      // and the wide-IN candidate set must recover to ∝ key span.
      // ONLY on a fresh z copy: re-running the churn + maintenance on a
      // reused fixture would measure an accumulated repeatedly-churned
      // layout, drifting candidate counts and base-kept across runs.
      if (zFresh) {
        val zBasePaths = snapZ.files.map(_.path).toSet
        (1 to 4).foreach { i =>
          zt.append(spark
            .range(i.toLong, nFiles.toLong * rowsPerFile, 97L)
            .select(col("id"), (col("id") % 1000).as("v"))
            .repartition(8, col("id")))
        }
        val tz4 = System.nanoTime()
        val rewritten = zt.optimizeIncrementalBy("id", maxLayers = 2)
        val zAfter = zt.snapshot
        println(f"[fanin] incremental cluster of churn : " +
          f"${(System.nanoTime() - tz4) / 1e9}%.2f s, " +
          f"rewrote $rewritten%d of ${zAfter.files.size}%d files, " +
          f"base-kept=${zBasePaths.subsetOf(zAfter.files.map(_.path).toSet)}%b, " +
          f"planning=${if (MaintenanceMetrics.lastPlanDistributed.get()) "distributed" else "driver"}%s")
        val tz5 = System.nanoTime()
        val zCands3 = zAfter.files.count(f =>
          Stats.mightMatchNormalized(f, normIn, snapZ.schema, Nil, probeZ))
        println(f"[fanin] clustered IN PRUNE (post-maint): " +
          f"${(System.nanoTime() - tz5) / 1e9}%.2f s, " +
          f"candidates=$zCands3%d of ${zAfter.files.size}%d")

        // DISTRIBUTED MAINTENANCE PLANNING (round 13): a second churn
        // wave, planned through the checkpoint scan — the layering runs
        // per partition group on executors and the driver materializes
        // ONLY the rewrite set, never O(table) AddFiles
        zt.log.writeCheckpointAt(zt.snapshot.version)
        LakeLog.awaitMaintenance()
        (5 to 8).foreach { i =>
          zt.append(spark
            .range(i.toLong, nFiles.toLong * rowsPerFile, 97L)
            .select(col("id"), (col("id") % 1000).as("v"))
            .repartition(8, col("id")))
        }
        spark.conf.set("spark.graft.log.distributedThreshold", "1")
        try {
          val tz6 = System.nanoTime()
          val rewritten2 = zt.optimizeIncrementalBy("id", maxLayers = 2)
          println(f"[fanin] DISTRIBUTED incremental cluster: " +
            f"${(System.nanoTime() - tz6) / 1e9}%.2f s, " +
            f"rewrote $rewritten2%d of ${zt.snapshot.files.size}%d files, " +
            f"planning-distributed=${MaintenanceMetrics.lastPlanDistributed.get()}%b, " +
            f"driver-rows=${MaintenanceMetrics.lastPlanDriverRows.get()}%d")
        } finally
          spark.conf.set("spark.graft.log.distributedThreshold", "100000000")
      } else println("[fanin] churn-maintenance arms skipped (reused z " +
        "fixture would measure an accumulated layout)")

      // INCREMENTAL REBUILD (round 11): churn ~12% of the files past the
      // 10% gate and force a boundary — the group-packed rebuild reads
      // ∝ churned sidecars (files-packed), referencing carried groups
      // untouched, vs the full re-pack the initial build paid above
      val churnFiles = math.max(1, nFiles / 8)
      val lo = nFiles.toLong * rowsPerFile
      t.append(spark.range(lo, lo + churnFiles.toLong * rowsPerFile)
        .select(col("id"), (col("id") % 1000).as("v"))
        .repartition(churnFiles, col("id")))
      KeyIndexMetrics.reset()
      val tr = System.nanoTime()
      t.log.writeCheckpointAt(t.snapshot.version)
      LakeLog.awaitMaintenance()
      println(f"[fanin] incremental rebuild after ~12%% churn: " +
        f"${(System.nanoTime() - tr) / 1e9}%.1f s, " +
        f"files-packed=${KeyIndexMetrics.filesPacked.get()}%d of " +
        f"${t.snapshot.files.size}%d, " +
        f"groups-built=${KeyIndexMetrics.groupsBuilt.get()}%d, " +
        f"carried=${KeyIndexMetrics.groupsCarried.get()}%d")
      ConsolidatedKeyIndex.invalidate(s"$root/t")
      probe("post-incremental point read", t, lo + 1) // a churned-file key

      // point DML through the same probe path
      val td = System.nanoTime()
      val del = t.delete(col("id") === (mid + 13))
      println(f"[fanin] consolidated point DELETE: " +
        f"${(System.nanoTime() - td) / 1e9}%.3f s, deleted=$del%d")
    } finally spark.conf.unset("spark.graft.log.distributedThreshold")

    if (keep) println(s"[fanin] root kept at $root")
    else graft.TestFs.rmRf(java.nio.file.Paths.get(root))
    spark.stop()
  }
}
