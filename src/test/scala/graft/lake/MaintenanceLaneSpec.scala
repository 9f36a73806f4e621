package graft.lake

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The TWO maintenance lanes (VERDICT r10 #1/#2 + ADVICE r10):
  * consolidated key-index builds run on their own executor so a
  * multi-GB sidecar repack can never head-of-line-block other tables'
  * async checkpoint pointer swings; a failed build attempt re-submits
  * once against the refreshed `_last_checkpoint`; and
  * [[LakeLog.awaitMaintenance]] drains BOTH lanes including the work
  * they enqueue transitively (checkpoint→build handoff, the retry).
  */
class MaintenanceLaneSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def batch(lo: Long) =
    (lo until lo + 16L).map(i => (i, s"v$i")).toDF("id", "v").repartition(2)

  private def indexedTo10(path: String): LakeTable = {
    val t = LakeTable.create(spark, path, batch(0), properties = Map(
      BloomIndex.COLS_PROP -> "id",
      ConsolidatedKeyIndex.MIN_FILES_PROP -> "1",
      ConsolidatedKeyIndex.STALE_FRACTION_PROP -> "0.0"))
    (1 to 10).foreach(i => t.append(batch(16L * i)))
    t
  }

  private def indexVersions(path: String): Seq[String] = {
    val dir = Paths.get(path, ConsolidatedKeyIndex.DIR)
    if (!Files.isDirectory(dir)) Seq.empty
    else graft.util.Fs.listDir(dir)
      .filter(_.getFileName.toString.matches("v\\d+"))
      .map(_.getFileName.toString).sorted
  }

  test("an in-flight index build never blocks another table's async checkpoint") {
    val pathA = Files.createTempDirectory("lane-a-").toString
    val tA = indexedTo10(pathA)
    LakeLog.awaitMaintenance() // drain the v10 boundary build
    val entered = new CountDownLatch(1)
    val gate = new CountDownLatch(1)
    ConsolidatedKeyIndex.onBuildStart = _ => {
      entered.countDown()
      gate.await(60, TimeUnit.SECONDS); ()
    }
    try {
      // hold a rebuild of A in flight on the INDEX lane
      tA.append(batch(16L * 11))
      tA.log.writeCheckpointAt(tA.snapshot.version)
      assert(entered.await(30, TimeUnit.SECONDS),
        "the rebuild must start on the index-maintenance lane")

      // an UNRELATED table's async boundary checkpoint must land while
      // the build is still blocked — the one head-of-line hazard the
      // split lanes exist to remove
      val pathB = Files.createTempDirectory("lane-b-").toString
      val tB = LakeTable.create(spark, pathB, batch(0))
      val oldThreshold = LakeLog.asyncCheckpointFileThreshold
      LakeLog.asyncCheckpointFileThreshold = 0L
      try {
        (1 to 10).foreach(i => tB.append(batch(16L * i)))
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        def landed() = tB.log.lastCheckpointInfo.exists(_._1 >= 10)
        while (!landed() && System.nanoTime() < deadline) Thread.sleep(20)
        assert(landed(),
          "B's async checkpoint queued behind A's in-flight index build")
      } finally LakeLog.asyncCheckpointFileThreshold = oldThreshold
    } finally {
      ConsolidatedKeyIndex.onBuildStart = _ => ()
      gate.countDown()
    }
    LakeLog.awaitMaintenance()
    assert(indexVersions(pathA).contains("v11"),
      "A's held build must still land once released")
  }

  test("a failed build re-submits once against the refreshed pointer") {
    val path = Files.createTempDirectory("lane-retry-").toString
    val t = indexedTo10(path)
    LakeLog.awaitMaintenance()
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    // first attempt dies the way the expiry race does (checkpoint parts
    // deleted under the build); the single retry re-reads
    // `_last_checkpoint` and must land WITHOUT waiting another full
    // checkpoint interval
    ConsolidatedKeyIndex.onBuildStart = _ =>
      if (attempts.incrementAndGet() == 1)
        throw new IllegalStateException("simulated expiry race")
    try {
      t.append(batch(16L * 11))
      t.log.writeCheckpointAt(t.snapshot.version)
      // ONE fence must drain the failed attempt AND its retry (the old
      // single-barrier fence returned between them — ADVICE r10)
      LakeLog.awaitMaintenance()
      assert(attempts.get() === 2, s"expected 1 failure + 1 retry, " +
        s"saw ${attempts.get()} attempts")
      assert(indexVersions(path).contains("v11"),
        "the retry must publish the index at the same boundary")
    } finally ConsolidatedKeyIndex.onBuildStart = _ => ()
  }

  test("a build that fails twice gives up until the next boundary") {
    val path = Files.createTempDirectory("lane-give-").toString
    val t = indexedTo10(path)
    LakeLog.awaitMaintenance()
    val before = indexVersions(path)
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    ConsolidatedKeyIndex.onBuildStart = _ => {
      attempts.incrementAndGet()
      throw new IllegalStateException("persistent failure")
    }
    try {
      t.append(batch(16L * 11))
      t.log.writeCheckpointAt(t.snapshot.version)
      LakeLog.awaitMaintenance()
      assert(attempts.get() === 2,
        "exactly one retry — a persistent failure must not loop")
      assert(indexVersions(path) === before)
    } finally ConsolidatedKeyIndex.onBuildStart = _ => ()
    // the next boundary heals it
    t.append(batch(16L * 12))
    t.log.writeCheckpointAt(t.snapshot.version)
    LakeLog.awaitMaintenance()
    assert(indexVersions(path).contains("v12"))
  }
}
