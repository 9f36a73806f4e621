package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[LakeTable.optimizeIncrementalBy]] — tiered clustering maintenance:
  * the clustered base is NEVER rewritten, only the accumulated
  * layout-breaking residue (appended scatter, stats-less adoptions)
  * merges into a fresh disjoint run, and a layout already within the
  * layer budget is an exact no-op. The point: at 100 TB the wide-IN
  * remedy (BASELINE §U) is only affordable if maintaining it costs
  * churn, not the table.
  */
class OptimizeIncrementalSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  /** 20 range-clustered base files over ids 0..1999 (disjoint). */
  private def base(path: String): LakeTable = {
    val df = (0L until 2000L).map(i => (i, s"r$i")).toDF("id", "v")
      .repartitionByRange(20, $"id").sortWithinPartitions($"id")
    LakeTable.create(spark, path, df)
  }

  /** One appended file spanning the whole id domain (scatter). */
  private def scatter(t: LakeTable, seed: Long): Unit =
    t.append((0 until 40).map(i => (i * 50L + seed, s"s$seed-$i"))
      .toDF("id", "v").repartition(1))

  test("rewrites only the churn; the clustered base stays byte-for-byte") {
    val path = Files.createTempDirectory("optinc-").toString
    val t = base(path)
    val basePaths = t.snapshot.files.map(_.path).toSet
    assert(basePaths.size === 20)
    (1 to 5).foreach(i => scatter(t, i.toLong))
    assert(t.snapshot.files.size === 25)

    val rewritten = t.optimizeIncrementalBy("id", maxLayers = 2)
    assert(rewritten === 5, "exactly the five scatter files rewrite")
    val after = t.snapshot
    assert(basePaths.subsetOf(after.files.map(_.path).toSet),
      "the base run must survive untouched — cost ∝ churn, not table")
    assert(t.toDF.count() === 2000L + 5 * 40)

    // depth is now ≤ maxLayers: an immediate second call is a no-op
    val v = after.version
    assert(t.optimizeIncrementalBy("id", maxLayers = 2) === 0)
    assert(t.snapshot.version === v, "a clean layout must not commit")

    // and the layout bound is the read bound: a point key hits at most
    // one file per layer
    assert(t.read($"id" === 777L).inputFiles.length <= 2)
  }

  test("stat strings compare by column type, not lexically") {
    val path = Files.createTempDirectory("optinc-num-").toString
    val rows = (0L until 1000L).map(i => (i, i.toString)).toDF("id", "v")
    val t = LakeTable.create(spark, path,
      rows.where($"id" < 10).repartition(1))
    t.append(rows.where($"id" >= 10 && $"id" < 100).repartition(1))
    t.append(rows.where($"id" >= 100).repartition(1))
    // ranges [0,9], [10,99], [100,999] are DISJOINT numerically; a
    // lexical compare would read "9" > "10" and "99" > "100", see depth
    // 3, and shred a perfectly clustered table
    val v = t.snapshot.version
    assert(t.optimizeIncrementalBy("id", maxLayers = 2) === 0)
    assert(t.snapshot.version === v)
  }

  test("a stats-less adopted file rewrites and regains footer stats") {
    val path = Files.createTempDirectory("optinc-blind-").toString
    val t = base(path)
    val snap = t.snapshot
    val victim = snap.files.head
    t.log.write(snap.version + 1,
      snap.files.map { f =>
        if (f.path == victim.path) Action.of(f.copy(stats = None))
        else Action.of(f)
      } :+ Action.of(CommitInfo(System.currentTimeMillis(), "CONVERT",
        Map("blind" -> "true"))))
    LakeLog.snapshotCache.clear()
    val adopted = LakeTable.forPath(spark, path)
    assert(adopted.snapshot.files.count(_.stats.isEmpty) === 1)

    assert(adopted.optimizeIncrementalBy("id") === 1,
      "the lone blind file rewrites (regains stats); ranged files keep")
    val after = adopted.snapshot
    assert(after.files.forall(_.stats.isDefined))
    assert(adopted.toDF.count() === 2000L)
  }

  test("deletion vectors survive: a rewritten file drops its deleted rows") {
    val path = Files.createTempDirectory("optinc-dv-").toString
    val t = base(path)
    scatter(t, 1L) // ids duplicate base keys: 1, 51, 101, …
    scatter(t, 2L) // depth 3 > maxLayers 2: both scatter files rewrite
    val before = t.toDF.count()
    // a point delete hits one base file AND a scatter file — small
    // fraction of each, so both take deletion-vector sidecars
    assert(t.delete($"id" === 51L) === 2L)
    assert(t.snapshot.files.exists(f =>
      f.dvPath.isDefined || f.dvInline.isDefined))
    assert(t.toDF.count() === before - 2)
    // the scatter files (one DV-bearing) rewrite; the DV-bearing base
    // file stays in its kept layer with its DV intact
    assert(t.optimizeIncrementalBy("id", maxLayers = 2) === 2)
    assert(t.toDF.count() === before - 2,
      "a layout rewrite must not resurrect DV-deleted rows")
    assert(t.read($"id" === 51L).isEmpty)
  }

  test("partition columns are refused: the directory layout already clusters them") {
    val path = Files.createTempDirectory("optinc-part-").toString
    val df = (0 until 200).map(i => (i.toLong, i % 4, s"r$i"))
      .toDF("id", "part", "v")
    val t = LakeTable.create(spark, path, df, partitionBy = Seq("part"))
    val e = intercept[IllegalArgumentException] {
      t.optimizeIncrementalBy("part")
    }
    assert(e.getMessage.contains("partition"))
    // a DATA column on the partitioned table still maintains per-dir
    t.append((0 until 50).map(i => (i * 4L, i % 4, s"x$i"))
      .toDF("id", "part", "v").repartition(1))
    assert(t.optimizeIncrementalBy("id", maxLayers = 2) >= 0) // no throw
    assert(t.toDF.count() === 250L)
  }

  test("SQL surface: OPTIMIZE ... INCREMENTAL BY ... MAX LAYERS") {
    val wh = Files.createTempDirectory("optinc-wh-").toString
    spark.conf.set("spark.sql.catalog.optinc",
      "org.apache.spark.sql.graft.LakeCatalog")
    spark.conf.set("spark.sql.catalog.optinc.warehouse", wh)
    Files.createDirectories(java.nio.file.Paths.get(s"$wh/db"))
    val t = base(s"$wh/db/t")
    (1 to 3).foreach(i => scatter(t, i.toLong))
    val n = spark.sql(
      "OPTIMIZE optinc.db.t INCREMENTAL BY id MAX LAYERS 2")
      .as[Long].head()
    assert(n === 3L, "SQL form rewrites exactly the scatter files")
    assert(spark.sql("OPTIMIZE optinc.db.t INCREMENTAL BY id MAX LAYERS 2")
      .as[Long].head() === 0L)
  }

  test("an all-null run keeps: maintenance converges instead of churning") {
    val path = Files.createTempDirectory("optinc-null-").toString
    val df = (0L until 2000L).map(i => (Some(i): Option[Long], s"r$i"))
      .toDF("id", "v")
      .repartitionByRange(20, $"id").sortWithinPartitions($"id")
    val t = LakeTable.create(spark, path, df)
    val basePaths = t.snapshot.files.map(_.path).toSet
    // churn: two full-span scatter files AND one all-null file — the
    // null file's chunk has no min/max (omitted by stats collection),
    // only nullCount == numRecords
    scatter2(t, 1L); scatter2(t, 2L)
    t.append((0 until 30).map(i => (None: Option[Long], s"n$i"))
      .toDF("id", "v").repartition(1))
    val nullPath = (t.snapshot.files.map(_.path).toSet
      -- basePaths
      -- t.snapshot.files.filter(f =>
        f.stats.exists(_.minValues.contains("id"))).map(_.path)).head

    // the scatter files rewrite; the null run is a KEPT layer — a
    // rewrite would regenerate an identical all-null file forever
    assert(t.optimizeIncrementalBy("id", maxLayers = 2) === 2)
    assert(t.snapshot.files.exists(_.path == nullPath),
      "the all-null file must survive untouched")
    // convergence: an immediate second call is a no-op — the old
    // classification read the null run as blind and rewrote it on
    // EVERY maintenance call (unbounded commit churn)
    val v = t.snapshot.version
    assert(t.optimizeIncrementalBy("id", maxLayers = 2) === 0)
    assert(t.snapshot.version === v, "null residue must not re-churn")
    assert(t.toDF.count() === 2000L + 80 + 30)
    assert(t.toDF.where($"id".isNull).count() === 30L)
  }

  test("NaN float bounds keep conservatively: no perpetual rewrite") {
    val path = Files.createTempDirectory("optinc-nan-").toString
    val df = (0 until 2000).map(i => (i.toDouble, i)).toDF("x", "v")
      .repartitionByRange(20, $"x").sortWithinPartitions($"x")
    val t = LakeTable.create(spark, path, df)
    // a file whose max stat is "NaN" (NaN sorts above every double in
    // Spark's max): BigDecimal cannot parse it, so the file has no
    // usable range — but rewriting it would regenerate the same
    // unparseable bounds, so it must KEEP, not churn
    t.append(Seq((Double.NaN, -1), (1000.5, -2)).toDF("x", "v")
      .repartition(1))
    scatter2d(t, 0.25); scatter2d(t, 0.75)
    assert(t.optimizeIncrementalBy("x", maxLayers = 2) === 2,
      "exactly the two parseable scatter files rewrite")
    val v = t.snapshot.version
    assert(t.optimizeIncrementalBy("x", maxLayers = 2) === 0)
    assert(t.snapshot.version === v, "NaN residue must not re-churn")
    assert(t.toDF.count() === 2000L + 2 + 80)
  }

  test("a schema-evolved column's old files keep: nothing to cluster, no churn") {
    val path = Files.createTempDirectory("optinc-evolve-").toString
    val t = base(path)
    t.alterAddColumn("w", "BIGINT")
    // old files carry stats that predate `w` entirely: they read
    // all-null for it, so a rewrite regains NOTHING — and would leave
    // the output equally stats-less for w, churning forever
    val v = t.snapshot.version
    assert(t.optimizeIncrementalBy("w", maxLayers = 2) === 0)
    assert(t.snapshot.version === v, "pre-evolution files must not churn")
    assert(t.toDF.count() === 2000L)
  }

  test("big-log planning runs distributed: driver holds only the rewrite set") {
    val path = Files.createTempDirectory("optinc-dist-").toString
    def batch(lo: Long, hi: Long) =
      spark.range(lo, hi).select($"id", ($"id" % 20).as("p"), ($"id" * 2).as("v"))
    val t = LakeTable.create(spark, path, batch(0, 2000), partitionBy = Seq("p"))
    (1 to 10).foreach(i => t.append(batch(2000L * i, 2000L * i + 2000)))
    assert(java.nio.file.Files.isRegularFile(t.log.logDir.resolve(
      LakeLog.parquetCheckpointFileName(10L))), "checkpoint at v10 expected")
    val basePaths = t.snapshot.files.map(_.path).toSet
    // tail churn: two appends, each writing one scatter file into EVERY
    // partition directory with an IDENTICAL id set {seed, 1100+seed, …}
    // spanning the domain (depth 3 per directory, deterministically —
    // a per-directory-varying scatter min can land in a gap of the
    // base layer's coverage and merge into it, a patience-layering tie
    // that would make the expected rewrite count flaky)
    // ids {seed, 1160+seed, …, 22040+seed} STRADDLE the whole base id
    // domain [0, 22000): a scatter max inside the domain would let
    // high-id base files chain onto the scatter layer instead of the
    // base layer (the +2 flake this fixture replaces)
    def scatterAll(seed: Long): Unit =
      t.append((for (p <- 0 until 20; j <- 0 until 20)
        yield (j * 1160L + seed, p.toLong, -seed))
        .toDF("id", "p", "v").repartition(1))
    scatterAll(1L); scatterAll(2L)
    val total = t.toDF.count()
    try {
      spark.conf.set("spark.graft.log.distributedThreshold", "10")
      val rewritten = t.optimizeIncrementalBy("id", maxLayers = 2)
      assert(MaintenanceMetrics.lastPlanDistributed.get(),
        "planning must ride the distributed checkpoint scan")
      assert(rewritten === 40, "exactly the 2×20 scatter files rewrite")
      assert(MaintenanceMetrics.lastPlanDriverRows.get() === 40L,
        "the driver materializes the rewrite set, never the table")
      val after = t.snapshot
      assert(basePaths.subsetOf(after.files.map(_.path).toSet),
        "the clustered base survives byte-for-byte")
      assert(t.toDF.count() === total)
      // converged: the follow-up is a distributed-planned no-op
      val v = after.version
      assert(t.optimizeIncrementalBy("id", maxLayers = 2) === 0)
      assert(MaintenanceMetrics.lastPlanDistributed.get())
      assert(t.snapshot.version === v)
    } finally spark.conf.unset("spark.graft.log.distributedThreshold")
  }

  test("scoped curve clustering resolves its partitions distributed") {
    val path = Files.createTempDirectory("optinc-zwhere-").toString
    def batch(lo: Long, hi: Long) =
      spark.range(lo, hi).select($"id", ($"id" % 20).as("p"), ($"id" * 2).as("v"))
    val t = LakeTable.create(spark, path, batch(0, 2000), partitionBy = Seq("p"))
    (1 to 10).foreach(i => t.append(batch(2000L * i, 2000L * i + 2000)))
    val before = t.snapshot
    val untouched = before.files.filterNot(_.partitionValues.get("p").contains("3"))
      .map(_.path).toSet
    val scopedCount = before.files.size - untouched.size
    val total = t.toDF.count()
    try {
      spark.conf.set("spark.graft.log.distributedThreshold", "10")
      t.zOrderByWhere($"p" === 3L, "id")
      assert(MaintenanceMetrics.lastPlanDistributed.get(),
        "scope resolution must ride the distributed checkpoint scan")
      assert(MaintenanceMetrics.lastPlanDriverRows.get() === scopedCount.toLong,
        "the driver materializes only the scoped partition's files")
      val after = t.snapshot
      assert(untouched.subsetOf(after.files.map(_.path).toSet),
        "out-of-scope partitions survive byte-for-byte")
      assert(!after.files.exists(f =>
        f.partitionValues.get("p").contains("3") &&
          before.files.exists(b => b.path == f.path)),
        "every in-scope file was rewritten")
      assert(t.toDF.count() === total)
    } finally spark.conf.unset("spark.graft.log.distributedThreshold")
  }

  /** Full-id-span scatter over the nullable-id fixture. */
  private def scatter2(t: LakeTable, seed: Long): Unit =
    t.append((0 until 40).map(i => (Some(i * 50L + seed): Option[Long], s"s$seed-$i"))
      .toDF("id", "v").repartition(1))

  /** Full-x-span scatter over the double fixture. */
  private def scatter2d(t: LakeTable, frac: Double): Unit =
    t.append((0 until 40).map(i => (i * 50 + frac, -i)).toDF("x", "v")
      .repartition(1))

  test("string keys layer by raw byte order and keep range locality") {
    val path = Files.createTempDirectory("optinc-str-").toString
    val df = (0 until 2000).map(i => (f"doc-$i%04d", i)).toDF("k", "v")
      .repartitionByRange(20, $"k").sortWithinPartitions($"k")
    val t = LakeTable.create(spark, path, df)
    t.append((0 until 40).map(i => (f"doc-${i * 50}%04d", -i))
      .toDF("k", "v").repartition(1))
    t.append((0 until 40).map(i => (f"doc-${i * 50 + 7}%04d", -i))
      .toDF("k", "v").repartition(1))
    assert(t.optimizeIncrementalBy("k", maxLayers = 2) === 2)
    assert(t.read($"k" >= "doc-0100" && $"k" < "doc-0200")
      .inputFiles.length <= 2)
    assert(t.toDF.count() === 2080L)
  }
}
