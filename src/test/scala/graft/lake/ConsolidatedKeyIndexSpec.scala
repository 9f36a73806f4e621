package graft.lake

import java.io.{ByteArrayOutputStream, DataInputStream}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[ConsolidatedKeyIndex]] — the per-checkpoint bit-sliced repack of
  * the per-file bloom sidecars: position arithmetic pinned bit-for-bit
  * against Spark's own `BloomFilter`, candidate sets identical to
  * sidecar-based pruning, coverage-gated rebuilds, and sidecar fallback
  * for files the index does not cover.
  */
class ConsolidatedKeyIndexSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("position arithmetic reproduces BloomFilter.mightContainLong exactly") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 20) {
      val expected = 64L << rnd.nextInt(8) // 64 … 8192 items
      val fpp = Seq(0.001, 0.01, 0.03, 0.1)(rnd.nextInt(4))
      val bf = BloomFilter.create(expected, fpp)
      val members = Array.fill(expected.toInt)(rnd.nextLong())
      members.foreach(bf.putLong)
      // parse the stable V1 wire format the sidecars store
      val bos = new ByteArrayOutputStream()
      bf.writeTo(bos)
      val in = new DataInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      val ver = in.readInt()
      assert(ver === 1 || ver === 2, s"BloomFilter wire version drifted: $ver")
      val k = in.readInt()
      val seed = if (ver == 2) in.readInt() else 0
      val words = Array.fill(in.readInt())(in.readLong())
      val bitSize = words.length.toLong * 64
      def mine(item: Long): Boolean =
        ConsolidatedKeyIndex.positions(item, ver, seed, k, bitSize)
          .forall { pos =>
            ((words((pos >>> 6).toInt) >>> (pos & 63)) & 1L) != 0L
          }
      // members MUST match (true), and non-members must agree exactly —
      // including Spark's false positives, which is the whole point
      members.take(200).foreach(v =>
        assert(mine(v) && bf.mightContainLong(v), s"member $v (trial $trial)"))
      (0 until 2000).foreach { _ =>
        val v = rnd.nextLong()
        assert(mine(v) === bf.mightContainLong(v), s"probe $v (trial $trial)")
      }
    }
  }

  /** Unclustered keys over many files + enough commits to cross the
    * checkpoint boundary that triggers consolidation. */
  private def build(path: String): LakeTable = {
    val props = Map(
      BloomIndex.COLS_PROP -> "id",
      BloomIndex.FPP_PROP -> "0.001",
      ConsolidatedKeyIndex.MIN_FILES_PROP -> "1")
    def batch(lo: Long): org.apache.spark.sql.DataFrame =
      (lo until lo + 64L).map(i => (2 * i, s"v${2 * i}")).toDF("id", "v")
        .repartition(4) // round-robin: min/max never prunes a point probe
    val t = LakeTable.create(spark, path, batch(0), properties = props)
    (1 to 10).foreach(i => t.append(batch(64L * i)))
    LakeLog.awaitMaintenance() // the index build rides the async executor
    t
  }

  test("consolidated candidates are identical to sidecar pruning, and serve probes") {
    val path = Files.createTempDirectory("ckidx-").toString
    val t = build(path)
    val idxDir = Paths.get(path, ConsolidatedKeyIndex.DIR)
    assert(Files.isDirectory(idxDir) &&
      graft.util.Fs.listDir(idxDir).exists(
        _.getFileName.toString.matches("v\\d+")),
      "the v10 checkpoint must have published a consolidated index")

    // probe keys: present (even, mid-domain) and absent (odd, inside
    // every file's min/max range — only a bloom can skip)
    val present = Seq(2L, 640L, 1280L)
    val absent = Seq(3L, 641L, 1281L)
    def candidates(k: Long): Set[String] =
      t.read($"id" === k).inputFiles.toSet

    KeyIndexMetrics.reset()
    val withIdx = (present ++ absent).map(k => k -> candidates(k)).toMap
    assert(KeyIndexMetrics.served.get() > 0,
      "probes over covered files must be served by the consolidated index")
    present.foreach(k =>
      assert(t.read($"id" === k).count() === 1L, s"present key $k"))
    absent.foreach(k => assert(withIdx(k).isEmpty,
      s"absent key $k should prune every file (fpp 0.001)"))

    // hide the index: the sidecar path must produce the SAME candidates
    val hidden = Paths.get(path, "_keyindex_hidden")
    Files.move(idxDir, hidden)
    ConsolidatedKeyIndex.invalidate(path)
    try {
      KeyIndexMetrics.reset()
      val withoutIdx = (present ++ absent).map(k => k -> candidates(k)).toMap
      assert(KeyIndexMetrics.served.get() === 0L)
      assert(withoutIdx === withIdx,
        "consolidated and sidecar pruning must agree bit-for-bit")
    } finally {
      Files.move(hidden, idxDir)
      ConsolidatedKeyIndex.invalidate(path)
    }
  }

  test("files newer than the index fall back to sidecars; DML stays correct") {
    val path = Files.createTempDirectory("ckidx-dml-").toString
    val t = build(path)
    // one commit past the checkpoint: its file is NOT in the v10 index
    t.append(Seq((999999L, "late")).toDF("id", "v"))
    assert(t.toDF.where($"id" === 999999L).count() === 1L,
      "a key only in an uncovered file must be found via its sidecar")
    // point DML through the layered probe
    assert(t.delete($"id" === 640L) === 1L)
    assert(t.toDF.where($"id" === 640L).isEmpty)
    assert(t.toDF.count() === 64L * 11)
  }

  test("SHOW INDEXES surfaces the consolidated key index with live coverage") {
    val path = Files.createTempDirectory("ckidx-meta-").toString
    val t = build(path) // 44 files, index published at v10
    val row = spark.sql(s"SHOW INDEXES AT '$path'").collect()
      .find(_.getAs[String]("kind") == "keybloom").get
    assert(row.getAs[Long]("indexed_rows") === 44L)
    assert(row.getAs[Long]("source_live_rows") === 44L)
    assert(row.getAs[Double]("est_stale_fraction") === 0.0)
    assert(row.getAs[String]("config").contains("id(words="))

    // churn: new files are uncovered until the next coverage-gated build
    t.append((9000L until 9064L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(4))
    graft.lake.ConsolidatedKeyIndex.invalidate(path)
    val stale = graft.ops.IndexMeta.describeKeyBloom(spark, path)
      .collect().head
    assert(stale.getAs[Long]("source_live_rows") === 48L)
    assert(stale.getAs[Long]("indexed_rows") === 44L)
    assert(math.abs(stale.getAs[Double]("est_stale_fraction") - 4.0 / 48) < 1e-9)
  }

  test("big-log path: executor-side pruning rides the consolidated index too") {
    val path = Files.createTempDirectory("ckidx-dist-").toString
    val t = build(path)
    spark.conf.set("spark.graft.log.distributedThreshold", "10")
    try {
      LakeLog.snapshotCache.clear()
      val t2 = LakeTable.forPath(spark, path)
      KeyIndexMetrics.reset()
      assert(t2.delete($"id" === 642L) === 1L)
      assert(DmlMetrics.lastDmlDistributed.get(),
        "the DML must have resolved candidates distributed")
      // local mode shares the JVM, so executor-evaluated probes land in
      // the same metric: the layered probe serves them consolidated
      assert(KeyIndexMetrics.served.get() > 0,
        "pruneLive's executor probes must be served by the index")
      assert(t2.toDF.where($"id" === 642L).isEmpty)
    } finally spark.conf.unset("spark.graft.log.distributedThreshold")
  }

  test("multi-column index: string and long probes both serve consolidated") {
    val path = Files.createTempDirectory("ckidx-cols-").toString
    val props = Map(
      BloomIndex.COLS_PROP -> "id,name",
      BloomIndex.FPP_PROP -> "0.001",
      ConsolidatedKeyIndex.MIN_FILES_PROP -> "1")
    def batch(lo: Long) =
      (lo until lo + 64L).map(i => (2 * i, s"name_${2 * i}"))
        .toDF("id", "name").repartition(4)
    val t = LakeTable.create(spark, path, batch(0), properties = props)
    (1 to 10).foreach(i => t.append(batch(64L * i)))
    LakeLog.awaitMaintenance()

    KeyIndexMetrics.reset()
    assert(t.read($"name" === "name_640").count() === 1L)
    assert(t.read($"name" === "name_641").isEmpty) // absent, in-range
    assert(t.read($"id" === 640L && $"name" === "name_640").count() === 1L)
    // conjunction of per-column TRUE bits with a wrong pairing still
    // reads (bloom can't prove cross-column correlation) but returns 0
    assert(t.read($"id" === 640L && $"name" === "name_642").isEmpty)
    assert(KeyIndexMetrics.served.get() > 0,
      "string-typed probes must be served by their own matrix")
  }

  test("multi-geometry tables: union coverage, no phantom staleness, probes exact") {
    // REAL tables mix file sizes (tail files, compactions), so sidecars
    // split across bloom geometries and the index holds several
    // matrices. Coverage must be the UNION — rating it against one
    // matrix would rebuild every checkpoint forever and report phantom
    // staleness through SHOW INDEXES.
    val path = Files.createTempDirectory("ckidx-geo-").toString
    val props = Map(
      BloomIndex.COLS_PROP -> "id",
      BloomIndex.FPP_PROP -> "0.001",
      ConsolidatedKeyIndex.MIN_FILES_PROP -> "1")
    def batch(lo: Long, n: Long) =
      (lo until lo + n).map(i => (2 * i, s"v${2 * i}")).toDF("id", "v")
        .repartition(2)
    val t = LakeTable.create(spark, path, batch(0, 64), properties = props)
    // alternating batch sizes → alternating expected-item sizing →
    // at least two (words, k) geometry classes among the sidecars
    (1 to 10).foreach(i =>
      t.append(batch(1000L * i, if (i % 2 == 0) 64 else 700)))
    LakeLog.awaitMaintenance()
    val geometries = t.snapshot.files.flatMap(f =>
      BloomIndex.readSidecarHeaders(
        Paths.get(path).resolve(f.bloomPath.get)))
      .flatten.map(h => (h.words, h.k)).toSet
    assert(geometries.size >= 2, s"fixture must span geometries: $geometries")

    // zero churn: a forced checkpoint must NOT rebuild
    val idxDir = Paths.get(path, ConsolidatedKeyIndex.DIR)
    def dirs() = graft.util.Fs.listDir(idxDir)
      .filter(_.getFileName.toString.matches("v\\d+"))
      .map(_.getFileName.toString).sorted
    val first = dirs()
    assert(first.nonEmpty)
    t.append(Seq((999999L, "x")).toDF("id", "v")) // 1 of 23 files
    t.log.writeCheckpointAt(t.snapshot.version)
    LakeLog.awaitMaintenance()
    assert(dirs() === first,
      "union coverage must keep the gate closed across geometry classes")

    // observability agrees: only the 1 new file is uncovered
    val row = graft.ops.IndexMeta.describeKeyBloom(spark, path)
      .collect().head
    assert(row.getAs[Double]("est_stale_fraction") < 0.1,
      s"phantom staleness on a multi-geometry table: $row")

    // probes across BOTH geometry classes, served consolidated, exact
    KeyIndexMetrics.reset()
    assert(t.read($"id" === 2000L).count() === 1L)  // in a 700-row batch
    assert(t.read($"id" === 4000L).count() === 1L)  // in a 64-row batch
    assert(t.read($"id" === 2001L).isEmpty)
    assert(KeyIndexMetrics.served.get() > 0)
  }

  test("rebuilds are coverage-gated and old index dirs are swept") {
    val path = Files.createTempDirectory("ckidx-cov-").toString
    val t = build(path)
    val idxDir = Paths.get(path, ConsolidatedKeyIndex.DIR)
    def dirs() = graft.util.Fs.listDir(idxDir)
      .filter(_.getFileName.toString.matches("v\\d+"))
      .map(_.getFileName.toString).sorted
    val first = dirs()
    assert(first.nonEmpty)

    // tiny churn (1 commit, ~9% of files): a forced checkpoint must
    // SKIP the rebuild — the live set is still ≥90% covered
    t.append(Seq((777777L, "x")).toDF("id", "v"))
    t.log.writeCheckpointAt(t.snapshot.version)
    LakeLog.awaitMaintenance()
    assert(dirs() === first,
      "a ≤staleFraction churn must not pay a rebuild")

    // heavy churn (compaction rewrites every file) → rebuild at the
    // next boundary; the sweep keeps at most the two newest dirs
    t.compact(targetFileBytes = 1L << 20)
    t.log.writeCheckpointAt(t.snapshot.version)
    LakeLog.awaitMaintenance()
    val after = dirs()
    assert(after !== first, s"heavy churn must rebuild: $after")
    assert(after.size <= 2)
    // and the fresh index serves probes over the rewritten files
    ConsolidatedKeyIndex.invalidate(path)
    KeyIndexMetrics.reset()
    assert(t.read($"id" === 2L).count() === 1L)
    assert(KeyIndexMetrics.served.get() > 0)
  }
}
