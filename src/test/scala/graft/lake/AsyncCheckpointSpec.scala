package graft.lake

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Async boundary checkpoints (the commit path must not pay O(live
  * files) of parquet encoding inline on big tables — nothing waits on a
  * checkpoint, so above the estimated-file threshold it moves to the
  * daemon writer). The spec drives the async path on a small fixture by
  * dropping the threshold to zero.
  */
class AsyncCheckpointSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("an async boundary checkpoint lands, swings the pointer, resolves") {
    val path = Files.createTempDirectory("async-ckpt-").toString
    val t = LakeTable.create(spark, path, Seq((0L, "r0")).toDF("id", "v"))
    val old = LakeLog.asyncCheckpointFileThreshold
    LakeLog.asyncCheckpointFileThreshold = 0L
    try {
      // the estimate comes from the CACHED latest snapshot; a fresh
      // table with no cache entry deliberately stays synchronous
      t.toDF.count()
      for (i <- 1 to 10) t.append(Seq((i.toLong, s"r$i")).toDF("id", "v"))
      // the boundary commit (v10) has RETURNED; its checkpoint may lag
      val ckpt = Paths.get(path, LakeLog.LOG_DIR,
        LakeLog.parquetCheckpointFileName(10))
      val deadline = System.currentTimeMillis() + 30000
      while (!Files.isRegularFile(ckpt) &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(Files.isRegularFile(ckpt), "async checkpoint must land")
      // and the pointer swings to it (same async task, may lag a beat)
      val ptrFile = Paths.get(path, LakeLog.LOG_DIR, LakeLog.LAST_CHECKPOINT)
      while ((!Files.isRegularFile(ptrFile) ||
          !new String(Files.readAllBytes(ptrFile)).contains("10")) &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(new String(Files.readAllBytes(ptrFile)).contains("\"version\":10"))

      // a COLD resolution reads through the new checkpoint and agrees
      LakeLog.snapshotCache.clear()
      val snap = new LakeLog(path).snapshot(None)
      assert(snap.version === 10)
      assert(t.toDF.count() === 11)
    } finally LakeLog.asyncCheckpointFileThreshold = old
  }

  test("a fresh table without a cached estimate checkpoints synchronously") {
    val path = Files.createTempDirectory("sync-ckpt-").toString
    val old = LakeLog.asyncCheckpointFileThreshold
    LakeLog.asyncCheckpointFileThreshold = 0L
    try {
      // write through a RAW log (no reads → no cache entry): the
      // boundary checkpoint must exist the moment the commit returns
      val log = new LakeLog(path)
      log.write(0L, Seq(
        Action.of(MetaData(id = "sync-test", schemaDdl = "id BIGINT")),
        Action.of(CommitInfo(1L, "CREATE", Map.empty))))
      LakeLog.snapshotCache.clear()
      for (v <- 1L to 10L) {
        log.write(v, Seq(
          Action.of(AddFile(s"f$v.parquet", Map.empty, 1L, 1L, None)),
          Action.of(CommitInfo(v, "APPEND", Map.empty))))
        LakeLog.snapshotCache.clear() // keep the estimate absent
      }
      assert(Files.isRegularFile(Paths.get(path, LakeLog.LOG_DIR,
        LakeLog.parquetCheckpointFileName(10))),
        "without an estimate the boundary checkpoint stays inline")
    } finally LakeLog.asyncCheckpointFileThreshold = old
  }
}
