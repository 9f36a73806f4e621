package graft.lake

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Distributed boundary-checkpoint build: above the previous
  * checkpoint's row threshold, the new checkpoint is assembled from the
  * cached checkpoint Dataset + the folded commit tail and encoded by an
  * executor task streaming a row iterator — the driver never
  * materializes the live-file list (the write-side mirror of the
  * distributed read path). Parity oracle here: an independent replay of
  * the raw commit JSONs.
  */
class DistributedCheckpointSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  /** Independent replay of the raw log: the test's own fold, not the
    * engine's resolution (which would read the checkpoint under test). */
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

  test("distributed checkpoint equals an independent raw-log replay") {
    val path = Files.createTempDirectory("dist-ckpt-").toString
    spark.conf.set("spark.graft.checkpoint.distributedThreshold", "1")
    val before = LakeLog.distributedCheckpoints.get()
    try {
      // bloom-indexed so adds carry every optional field (stats,
      // bloomPath); DML so the tail carries removes and DV fields;
      // txn + property commits so the non-add action kinds fold too
      val t = LakeTable.create(spark, path,
        (0L until 8L).map(i => (2 * i, s"n$i")).toDF("id", "v").repartition(2),
        properties = Map(BloomIndex.COLS_PROP -> "id"))
      for (i <- 1 to 9) // v1..v9; v10 is the first boundary (driver-built)
        t.append(Seq((1000L + i, s"x$i")).toDF("id", "v"))
      t.delete($"id" === 2L) // v10: the first boundary IS the delete
      t.update($"id" === 4L, Map("v" -> lit("updated"))) // v11
      t.setProperties(Map("custom.tag" -> "r7")) // v12
      assert(t.idempotentAppend(
        Seq((5000L, "txn")).toDF("id", "v"), "app-a", 7L)) // v13
      for (i <- 1 to 7) // v14..v20; the v20 boundary builds DISTRIBUTED
        t.append(Seq((2000L + i, s"y$i")).toDF("id", "v"))

      assert(LakeLog.distributedCheckpoints.get() > before,
        "the v20 boundary must have taken the distributed path")
      val ckpt = Paths.get(path, LakeLog.LOG_DIR,
        LakeLog.parquetCheckpointFileName(20))
      assert(Files.isRegularFile(ckpt))

      // decode the distributed checkpoint and compare against the fold
      val decoded = Checkpoint.read(ckpt)
      val (expMeta, expTxns, expFiles) = foldLog(path, 20L)
      val gotMeta = decoded.flatMap(_.metaData)
      assert(gotMeta === Seq(expMeta))
      val gotTxns = decoded.flatMap(_.txn).map(x => x.appId -> x.batchId).toMap
      assert(gotTxns === expTxns)
      val gotFiles = decoded.flatMap(_.add).map(f => f.path -> f).toMap
      assert(gotFiles === expFiles,
        "distributed checkpoint adds must equal the raw-log replay")

      // cold resolution through the distributed checkpoint
      LakeLog.snapshotCache.clear()
      val t2 = LakeTable.forPath(spark, path)
      assert(t2.snapshot.version === 20)
      assert(t2.toDF.where($"id" === 2L).count() === 0) // deleted
      assert(t2.toDF.where($"id" === 4L).select("v").head().getString(0)
        === "updated")
      assert(t2.toDF.count() === 8 - 1 + 9 + 1 + 7)
      // bloom pruning still rides the round-tripped bloomPath pointers
      BloomMetrics.reset()
      assert(t2.read($"id" === 3L).count() === 0)
      assert(BloomMetrics.skippedByBloom.get() > 0)
      // time travel through the distributed checkpoint's log
      assert(t2.asOf(10).toDF.count() === 16) // v10 is the delete
    } finally {
      spark.conf.unset("spark.graft.checkpoint.distributedThreshold")
    }
  }

  test("recreate at the same path never serves the old incarnation's checkpoint decode") {
    // the decoded-checkpoint caches were keyed by PATH alone: a table
    // deleted and recreated at the same path produces a same-named
    // checkpoint file, and the stale cached Dataset[AddFile] would feed
    // both the distributed READ and (durably!) the distributed
    // checkpoint BUILD; keys now carry the file's fingerprint
    val path = Files.createTempDirectory("dist-ckpt-recreate-").toString
    spark.conf.set("spark.graft.log.distributedThreshold", "1")
    try {
      val a = LakeTable.create(spark, path,
        (0L until 4L).map(i => (i, "old")).toDF("id", "v"))
      for (i <- 1 to 10) a.append(Seq((100L + i, "old")).toDF("id", "v"))
      // populate the decode cache for A's v10 checkpoint
      assert(a.read($"id" === 0L).collect().map(_.getString(1)).toSeq === Seq("old"))
      assert(ReadMetrics.lastReadDistributed.get())

      graft.TestFs.rmRf(Paths.get(path))
      LakeLog.snapshotCache.clear()
      val b = LakeTable.create(spark, path,
        (0L until 4L).map(i => (i, "new")).toDF("id", "v"))
      for (i <- 1 to 10) b.append(Seq((200L + i, "new")).toDF("id", "v"))
      // B's v10 checkpoint lives at the IDENTICAL path as A's did
      val rows = b.toDF.select("v").distinct().as[String].collect().toSeq
      assert(rows === Seq("new"),
        s"stale checkpoint decode served the old incarnation: $rows")
      assert(b.read($"id" === 0L).collect().map(_.getString(1)).toSeq === Seq("new"))
      assert(b.toDF.count() === 14)
    } finally {
      spark.conf.unset("spark.graft.log.distributedThreshold")
    }
  }

  test("distributed build of an emptied table writes a head-only checkpoint") {
    val path = Files.createTempDirectory("dist-ckpt-empty-").toString
    spark.conf.set("spark.graft.checkpoint.distributedThreshold", "1")
    try {
      val t = LakeTable.create(spark, path,
        (0L until 4L).map(i => (i, s"n$i")).toDF("id", "v"))
      for (i <- 1 to 10) t.append(Seq((100L + i, "x")).toDF("id", "v"))
      t.delete(lit(true)) // v11: everything gone
      for (i <- 1 to 9) // v12..v20
        t.setProperties(Map(s"k$i" -> "v"))
      val ckpt = Paths.get(path, LakeLog.LOG_DIR,
        LakeLog.parquetCheckpointFileName(20))
      assert(Files.isRegularFile(ckpt))
      val decoded = Checkpoint.read(ckpt)
      assert(decoded.flatMap(_.add).isEmpty)
      assert(decoded.flatMap(_.metaData).nonEmpty)
      LakeLog.snapshotCache.clear()
      assert(LakeTable.forPath(spark, path).toDF.count() === 0)
    } finally {
      spark.conf.unset("spark.graft.checkpoint.distributedThreshold")
    }
  }
}
