package graft.lake

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Multi-part checkpoints (Delta's classic N-part shape): above
  * `spark.graft.checkpoint.partSize` estimated rows the distributed
  * boundary build fans the encode out to one executor task PER PART —
  * removing the last single-point serialization on the maintenance path.
  * The `_last_checkpoint` pointer records the part count; readers
  * construct the complete part set without listing, listing-based
  * discovery (time travel, pointer loss) only accepts COMPLETE sets, and
  * expiry deletes part files below the horizon. Parity oracle: an
  * independent replay of the raw commit JSONs.
  */
class MultiPartCheckpointSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  /** Independent replay of the raw log — the test's own fold. */
  private def foldLog(path: String, through: Long)
      : (MetaData, Map[String, Long], Map[String, AddFile]) = {
    val log = new LakeLog(path)
    var meta: Option[MetaData] = None
    val txns = scala.collection.mutable.HashMap[String, Long]()
    val files = scala.collection.mutable.LinkedHashMap[String, AddFile]()
    for (v <- 0L to through; a <- log.readCommit(v)) {
      a.metaData.foreach(m => meta = Some(m))
      a.add.foreach(f => files(f.path) = f)
      a.remove.foreach(r => files.remove(r.path))
      a.txn.foreach(t => txns(t.appId) =
        math.max(t.batchId, txns.getOrElse(t.appId, Long.MinValue)))
    }
    (meta.get, txns.toMap, files.toMap)
  }

  /** create (2 files, 8 rows) + one single-file append per version
    * through v20: v10 boundary = driver single-file checkpoint, v20
    * boundary = distributed MULTI-PART (thresholds forced low). */
  private def buildTo20(path: String): LakeTable = {
    val t = LakeTable.create(spark, path,
      (0L until 8L).map(i => (2 * i, s"n$i")).toDF("id", "v").repartition(2))
    for (i <- 1 to 20) t.append(Seq((1000L + i, s"x$i")).toDF("id", "v"))
    t
  }

  private def withMultipartConf[A](body: => A): A = {
    spark.conf.set("spark.graft.checkpoint.distributedThreshold", "1")
    spark.conf.set("spark.graft.checkpoint.partSize", "8")
    try body
    finally {
      spark.conf.unset("spark.graft.checkpoint.distributedThreshold")
      spark.conf.unset("spark.graft.checkpoint.partSize")
    }
  }

  test("multi-part build: complete set, pointer parts, parity vs raw-log replay") {
    val path = Files.createTempDirectory("mp-ckpt-").toString
    withMultipartConf {
      buildTo20(path)
      val logDir = Paths.get(path, LakeLog.LOG_DIR)

      // v10 checkpoint: 12 adds + 1 meta = 13 rows; v20 estimate =
      // 13 + 10 tail adds = 23 → ceil(23/8) = 3 parts
      val total = 3
      val parts = (1 to total).map(p =>
        logDir.resolve(LakeLog.multipartCheckpointFileName(20, p, total)))
      parts.foreach(p => assert(Files.isRegularFile(p), s"missing part $p"))
      assert(!Files.isRegularFile(
        logDir.resolve(LakeLog.parquetCheckpointFileName(20))),
        "a multi-part boundary must not also write the single-file layout")

      val ptr = new String(Files.readAllBytes(
        logDir.resolve(LakeLog.LAST_CHECKPOINT)), StandardCharsets.UTF_8)
      assert(ptr.contains("\"version\":20") && ptr.contains(s""""parts":$total"""),
        s"pointer must carry the part count: $ptr")

      // head actions ride in part 1, and ONLY part 1
      assert(Checkpoint.read(parts.head).exists(_.metaData.isDefined))
      parts.tail.foreach(p =>
        assert(Checkpoint.read(p).forall(_.metaData.isEmpty)))

      // union of all parts == independent raw-log replay
      val decoded = parts.flatMap(Checkpoint.read)
      val (expMeta, expTxns, expFiles) = foldLog(path, 20L)
      assert(decoded.flatMap(_.metaData) === Seq(expMeta))
      assert(decoded.flatMap(_.txn).map(x => x.appId -> x.batchId).toMap === expTxns)
      assert(decoded.flatMap(_.add).map(f => f.path -> f).toMap === expFiles,
        "multi-part checkpoint adds must equal the raw-log replay")
      // no row lands in two parts
      assert(decoded.flatMap(_.add).size === expFiles.size)

      // cold resolution THROUGH the multi-part checkpoint
      LakeLog.snapshotCache.clear()
      val t2 = LakeTable.forPath(spark, path)
      assert(t2.snapshot.version === 20)
      assert(t2.toDF.count() === 8 + 20)
      // exact-version time travel reads the pointer's multi-part layout
      assert(t2.asOf(20).toDF.count() === 8 + 20)
      // below it, listing discovery falls back to the v10 single-file
      assert(t2.asOf(15).toDF.count() === 8 + 15)
    }
  }

  test("distributed read path resolves through a multi-part checkpoint") {
    val path = Files.createTempDirectory("mp-read-").toString
    withMultipartConf {
      val t = buildTo20(path)
      spark.conf.set("spark.graft.log.distributedThreshold", "1")
      try {
        LakeLog.snapshotCache.clear()
        ReadMetrics.lastReadDistributed.set(false)
        val got = t.read($"id" === 1005L).as[(Long, String)].collect().toSeq
        assert(got === Seq((1005L, "x5")))
        assert(ReadMetrics.lastReadDistributed.get(),
          "the read must have taken the distributed checkpoint scan")
        assert(t.read($"id" === 4L).count() === 1)
      } finally spark.conf.unset("spark.graft.log.distributedThreshold")
    }
  }

  test("expiry writes a multi-part horizon checkpoint and deletes old parts") {
    val path = Files.createTempDirectory("mp-expire-").toString
    withMultipartConf {
      val t = buildTo20(path)
      for (i <- 21 to 25) t.append(Seq((1000L + i, s"x$i")).toDF("id", "v"))
      val log = new LakeLog(path)
      val logDir = Paths.get(path, LakeLog.LOG_DIR)

      val deleted = log.expireBefore(23L)
      assert(deleted === 23L, "commits 0..22 must be deleted")

      // horizon checkpoint is itself multi-part and complete
      val horizonParts = graft.util.Fs.listDir(logDir)
        .map(_.getFileName.toString)
        .filter(n => n.startsWith(f"${23L}%020d.checkpoint.") &&
          n.endsWith(".parquet"))
      assert(horizonParts.size > 1, s"expected multi-part at 23: $horizonParts")

      // v20's parts and v10's single-file are gone
      assert(!Files.isRegularFile(
        logDir.resolve(LakeLog.parquetCheckpointFileName(10))))
      assert(!graft.util.Fs.listDir(logDir).exists(
        _.getFileName.toString.startsWith(f"${20L}%020d.checkpoint.")))

      // resolution across the expired boundary
      LakeLog.snapshotCache.clear()
      val t2 = LakeTable.forPath(spark, path)
      assert(t2.toDF.count() === 8 + 25)
      assert(t2.asOf(23).toDF.count() === 8 + 23)
      intercept[Exception](t2.asOf(15).toDF.count())
    }
  }

  test("fuzz: warm/cold parity over a random history with every boundary multi-part") {
    // partSize 3 forces EVERY distributed boundary checkpoint into
    // multiple parts; the random mix of DML, property commits,
    // compaction, expiry and vacuum then exercises multi-part
    // publication, pointer-driven reads, listing fallback, incremental
    // cache replay across multi-part boundaries, and horizon builds —
    // with the SnapshotCacheFuzzSpec parity oracle after every step
    spark.conf.set("spark.graft.checkpoint.distributedThreshold", "1")
    spark.conf.set("spark.graft.checkpoint.partSize", "3")
    try {
      val rnd = new scala.util.Random(6L)
      val path = Files.createTempDirectory("mp-fuzz-").toString
      val t = LakeTable.create(spark, path, Seq((0L, "r0")).toDF("id", "v"))
      val model = scala.collection.mutable.LinkedHashMap(0L -> "r0")
      var nextId = 1L
      var purged = false
      def assertParityWithCold(): Unit = {
        val warm = new LakeLog(path).snapshot(None)
        LakeLog.snapshotCache.clear()
        val cold = new LakeLog(path).snapshot(None)
        assert(warm.version === cold.version)
        assert(warm.metaData === cold.metaData)
        assert(warm.files.map(f => (f.path, f.size, f.dvPath)) ===
          cold.files.map(f => (f.path, f.size, f.dvPath)))
        assert(warm.txns === cold.txns)
      }
      for (step <- 1 to 34) {
        rnd.nextInt(11) match {
          case 0 | 1 | 2 | 3 =>
            val rows = (0 until 1 + rnd.nextInt(3)).map { _ =>
              val id = nextId; nextId += 1
              model(id) = s"r$id"; (id, s"r$id")
            }
            t.append(rows.toDF("id", "v"))
          case 10 if model.size > 1 =>
            // REORG PURGE (a takedown'd id): just another commit type to
            // the multi-part checkpoint machinery — the id picked
            // deterministically so the draw sequence stays step-local
            val id = model.keys.toSeq(step % model.size)
            model.remove(id)
            t.purgeStale(Seq(id).toDF("id"), Seq("id"))
            purged = true
          case 4 if model.size > 1 =>
            val id = model.keys.toSeq(rnd.nextInt(model.size))
            model.remove(id)
            t.delete(col("id") === id)
          case 5 if model.nonEmpty =>
            val id = model.keys.toSeq(rnd.nextInt(model.size))
            model(id) = s"u$step"
            t.update(col("id") === id, Map("v" -> lit(s"u$step")))
          case 6 => t.setProperties(Map(s"tag$step" -> step.toString))
          case 7 => t.compact(targetFileBytes = 1L << 30)
          case 8 if step > 10 => t.expireSnapshots(olderThanMs = 0L, retainLast = 5)
          case 9 if step > 5 => t.vacuum(retentionMs = 0L)
          case _ => ()
        }
        assertParityWithCold()
        assert(t.toDF.as[(Long, String)].collect().toSet === model.toSet,
          s"data divergence at step $step")
      }
      assert(purged, "the PURGE arm never fired — raise the step count")
      // non-vacuity: the history must actually have produced multi-part
      // checkpoints (boundaries land every CHECKPOINT_EVERY commits)
      val logDir = Paths.get(path, LakeLog.LOG_DIR)
      assert(graft.util.Fs.listDir(logDir).exists(p =>
        LakeLog.MULTIPART_RE.matches(p.getFileName.toString)),
        "no multi-part checkpoint was ever written — the arm is vacuous")
    } finally {
      spark.conf.unset("spark.graft.checkpoint.distributedThreshold")
      spark.conf.unset("spark.graft.checkpoint.partSize")
    }
  }

  test("multi-part publication through a registered marker commit store") {
    // every part file and the pointer go through the SAME conditional-PUT
    // seam as commits — the object-store adapter must see N putIfAbsent
    // publications and the pointer must still carry the part count
    val adapter = new MarkerFsCommitStore
    CommitStore.register("file", _ => adapter)
    try {
      withMultipartConf {
        val path = Files.createTempDirectory("mp-marker-").toString
        buildTo20(path)
        val logDir = Paths.get(path, LakeLog.LOG_DIR)
        val parts = (1 to 3).map(p =>
          logDir.resolve(LakeLog.multipartCheckpointFileName(20, p, 3)))
        parts.foreach(p => assert(Files.isRegularFile(p),
          s"part not published through the adapter: $p"))
        val ptr = new String(Files.readAllBytes(
          logDir.resolve(LakeLog.LAST_CHECKPOINT)),
          StandardCharsets.UTF_8)
        assert(ptr.contains("\"parts\":3"))
        LakeLog.snapshotCache.clear()
        assert(LakeTable.forPath(spark, path).toDF.count() === 8 + 20)
      }
    } finally CommitStore.unregister("file")
  }

  test("a foreign writer's parts:1 set is a valid checkpoint (ADVICE r8)") {
    // Delta writers may emit NNN.checkpoint.0000000001.0000000001.parquet
    // with {"parts":1}; the reader used to filter parts > 1 everywhere,
    // so with older commits expired the table became unresolvable even
    // though a complete checkpoint existed
    val path = Files.createTempDirectory("mp-one-").toString
    val t = buildTo20(path) // v10/v20 boundaries → single-file checkpoints
    val logDir = Paths.get(path, LakeLog.LOG_DIR)
    val single = logDir.resolve(LakeLog.parquetCheckpointFileName(20))
    assert(Files.isRegularFile(single))
    // rewrite the v20 boundary into the foreign one-part layout
    Files.move(single,
      logDir.resolve(LakeLog.multipartCheckpointFileName(20, 1, 1)))
    Files.write(logDir.resolve(LakeLog.LAST_CHECKPOINT),
      """{"version":20,"parts":1}""".getBytes(StandardCharsets.UTF_8))
    // expire everything below: the one-part set is now the ONLY way in
    (0L to 19L).foreach { v =>
      Files.deleteIfExists(logDir.resolve(LakeLog.commitFileName(v)))
      Files.deleteIfExists(logDir.resolve(LakeLog.parquetCheckpointFileName(v)))
    }
    LakeLog.snapshotCache.clear()
    val t2 = LakeTable.forPath(spark, path)
    assert(t2.snapshot.version === 20)
    assert(t2.toDF.count() === 8 + 20,
      "pointer-driven resolution must read the parts:1 layout")
    // listing-based discovery (no pointer) must accept it too
    Files.delete(logDir.resolve(LakeLog.LAST_CHECKPOINT))
    LakeLog.snapshotCache.clear()
    assert(LakeTable.forPath(spark, path).toDF.count() === 8 + 20,
      "listing discovery must accept a complete one-part set")
    assert(t.snapshot.version === 20)
  }

  test("a hung part decode degrades to replay within the bounded await") {
    val path = Files.createTempDirectory("mp-hang-").toString
    withMultipartConf {
      buildTo20(path)
      // every part-decode future stalls past the (shrunk) await bound:
      // resolution must abandon the checkpoint and replay the commits
      System.setProperty("graft.checkpoint.readTimeoutSec", "1")
      LakeLog.multipartDecodeHook = () => Thread.sleep(4000)
      try {
        LakeLog.snapshotCache.clear()
        val t0 = System.nanoTime()
        val t2 = LakeTable.forPath(spark, path)
        assert(t2.snapshot.version === 20)
        assert(t2.toDF.count() === 8 + 20,
          "resolution must complete via commit replay despite the hang")
        val elapsedSec = (System.nanoTime() - t0) / 1e9
        assert(elapsedSec < 30,
          s"resolution took ${elapsedSec}s — the await bound did not engage")
      } finally {
        LakeLog.multipartDecodeHook = () => ()
        System.clearProperty("graft.checkpoint.readTimeoutSec")
      }
    }
  }

  test("hung decodes rotate the pool: later reads decode in parallel, not fallback") {
    val path = Files.createTempDirectory("mp-rotate-").toString
    withMultipartConf {
      buildTo20(path)
      // a hook that never returns: repeated timed-out reads would pin
      // 3 slots each — past 8 the shared pool would be permanently
      // exhausted and every later multi-part decode in the JVM would
      // silently degrade to replay. Rotation must prevent exactly that.
      val latch = new java.util.concurrent.CountDownLatch(1)
      System.setProperty("graft.checkpoint.readTimeoutSec", "1")
      LakeLog.multipartDecodeHook = () => latch.await()
      val rotationsBefore = LakeLog.multipartPool.rotations.get()
      try {
        (1 to 3).foreach { _ => // 9 would-be-stuck decode tasks > 8 slots
          LakeLog.snapshotCache.clear()
          assert(LakeTable.forPath(spark, path).toDF.count() === 8 + 20,
            "each hung read must still resolve via replay")
        }
        assert(LakeLog.multipartPool.rotations.get() - rotationsBefore >= 3,
          "every timed-out read must rotate the abandoned pool")
      } finally {
        LakeLog.multipartDecodeHook = () => ()
        System.clearProperty("graft.checkpoint.readTimeoutSec")
        latch.countDown()
      }
      // a healthy read now PROVABLY runs the parallel decode path (the
      // per-part hook fires), not the replay fallback
      val decodes = new java.util.concurrent.atomic.AtomicLong(0L)
      LakeLog.multipartDecodeHook = () => { decodes.incrementAndGet(); () }
      try {
        LakeLog.snapshotCache.clear()
        val t0 = System.nanoTime()
        assert(LakeTable.forPath(spark, path).toDF.count() === 8 + 20)
        assert(decodes.get() >= 3,
          s"all 3 parts must decode on the fresh pool, saw ${decodes.get()}")
        assert((System.nanoTime() - t0) / 1e9 < 30)
      } finally LakeLog.multipartDecodeHook = () => ()
    }
  }

  test("a reader racing a rotation retries on the fresh pool, not the fallback") {
    val path = Files.createTempDirectory("mp-race-").toString
    withMultipartConf {
      buildTo20(path)
      // the race the pool comment promises is harmless: a reader
      // captures the pool, a concurrent timeout rotates it, and the
      // reader's submission hits the shut-down executor. The retry must
      // land the decode on the FRESH pool — parallel path, not replay.
      val raced = new java.util.concurrent.atomic.AtomicBoolean(false)
      val decodes = new java.util.concurrent.atomic.AtomicLong(0L)
      val rotationsBefore = LakeLog.multipartPool.rotations.get()
      LakeLog.multipartSubmitHook = () =>
        if (raced.compareAndSet(false, true))
          LakeLog.multipartPool.rotateIfCurrent(LakeLog.multipartPool.context)
      LakeLog.multipartDecodeHook = () => { decodes.incrementAndGet(); () }
      try {
        LakeLog.snapshotCache.clear()
        assert(LakeTable.forPath(spark, path).toDF.count() === 8 + 20)
        assert(raced.get(), "the submit hook must have rotated the pool")
        assert(LakeLog.multipartPool.rotations.get() === rotationsBefore + 1)
        assert(decodes.get() >= 3,
          s"the retry must decode all parts in parallel, saw ${decodes.get()}")
      } finally {
        LakeLog.multipartSubmitHook = () => ()
        LakeLog.multipartDecodeHook = () => ()
      }
    }
  }

  test("an incomplete part set is never used (crash-safe discovery)") {
    val path = Files.createTempDirectory("mp-partial-").toString
    withMultipartConf {
      buildTo20(path)
      val logDir = Paths.get(path, LakeLog.LOG_DIR)
      // simulate a lost/unpublished part: the pointer still names the
      // set, but readers must degrade (pointer read fails → listing
      // ignores the incomplete set → v10 single-file + tail replay)
      Files.delete(
        logDir.resolve(LakeLog.multipartCheckpointFileName(20, 2, 3)))
      LakeLog.snapshotCache.clear()
      val t2 = LakeTable.forPath(spark, path)
      assert(t2.snapshot.version === 20)
      assert(t2.toDF.count() === 8 + 20,
        "resolution must fall back past the incomplete part set")
    }
  }
}
