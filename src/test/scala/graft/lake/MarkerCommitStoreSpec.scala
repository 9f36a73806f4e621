package graft.lake

import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[MarkerFsCommitStore]] — the seam's second production-shaped
  * implementation (VERDICT r3 #5): conditional-PUT semantics emulated
  * through an atomic reservation marker in a separate `.cond/`
  * directory, registered per scheme and driven through the FULL commit
  * protocol (table create, contended rebasing appends, parquet
  * checkpoint publication, `_last_checkpoint` swing) end-to-end via
  * [[CommitStore.register]] / [[CommitStore.forPath]].
  */
class MarkerCommitStoreSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("condition is decided by the marker, loser never touches dest") {
    val store = new MarkerFsCommitStore
    val d = Files.createTempDirectory("marker-")
    val dest = d.resolve("00000000000000000001.json")
    assert(store.putIfAbsent(dest, "winner".getBytes))
    assert(!store.putIfAbsent(dest, "loser".getBytes))
    assert(new String(Files.readAllBytes(dest)) === "winner")
    assert(store.wins === 1 && store.lostRaces === 1)
    // the reservation marker is the durable record of the won condition
    assert(Files.isRegularFile(
      d.resolve(".cond/00000000000000000001.json.reserved")))
  }

  test("published objects stay immutable and their markers vacuum away") {
    val store = new MarkerFsCommitStore
    val d = Files.createTempDirectory("marker-vac-")
    val dest = d.resolve("00000000000000000003.json")
    assert(store.putIfAbsent(dest, "committed".getBytes))
    // the marker is reclaimable once its object is published...
    assert(store.vacuumMarkers(d) === 1)
    // ...because publish refuses an existing dest: a late writer that
    // re-wins the now-markerless condition still cannot overwrite
    assert(!store.putIfAbsent(dest, "intruder".getBytes))
    assert(new String(Files.readAllBytes(dest)) === "committed")
    assert(store.publishRefused === 1) // the refusal is counted, not hidden

    // a marker whose object was EXPIRED (deleted by snapshot retention)
    // is reclaimable only under an explicit expiry floor
    Files.createFile(d.resolve(".cond/00000000000000000001.json.reserved"))
    assert(store.vacuumMarkers(d) === 1) // re-created marker of dest only
    assert(Files.exists(d.resolve(".cond/00000000000000000001.json.reserved")))
    assert(store.vacuumMarkers(d, Some("00000000000000000002")) === 1)
    assert(!Files.exists(d.resolve(".cond/00000000000000000001.json.reserved")))
  }

  test("a crashed winner's stale marker is repaired, not a wedge") {
    val store = new MarkerFsCommitStore(staleMarkerMs = 100L)
    val d = Files.createTempDirectory("marker-repair-")
    val dest = d.resolve("00000000000000000002.json")
    // simulate a winner that reserved and died before publishing
    Files.createDirectories(d.resolve(".cond"))
    Files.createFile(d.resolve(".cond/00000000000000000002.json.reserved"))
    // inside the lease window the condition is honestly refused...
    assert(!store.putIfAbsent(dest, "x".getBytes))
    Thread.sleep(150L)
    // ...after it, any writer repairs the orphan and wins
    assert(store.putIfAbsent(dest, "recovered".getBytes))
    assert(store.repairs >= 1)
    assert(new String(Files.readAllBytes(dest)) === "recovered")
    // a PUBLISHED object's marker is never stale: the condition still holds
    Thread.sleep(150L)
    assert(!store.putIfAbsent(dest, "late".getBytes))
    assert(new String(Files.readAllBytes(dest)) === "recovered")
  }

  test("full protocol through the registry: create, rebase, checkpoint") {
    val adapter = new MarkerFsCommitStore
    // plain local paths carry no scheme and resolve as "file": installing
    // an adapter there routes EVERY table commit through it, which is the
    // end-to-end register/forPath path the seam promises deployments
    CommitStore.register("file", _ => adapter)
    try {
      val dir = Files.createTempDirectory("marker-e2e-").resolve("t")
      val df = spark.range(0, 100).selectExpr("id", "id * 2 as v")
      val t = LakeTable.create(spark, dir.toString, df)
      assert(adapter.wins >= 1, "create never went through the adapter")
      // the table reads back through normal I/O (markers invisible to
      // readers); later raw-log adds reference no physical files, so the
      // data read-back happens here
      assert(t.toDF.count() === 100)

      // 12 contending raw-log writers: losers get CommitConflictException
      // from the adapter's refused condition and rebase to the next slot
      val log = new LakeLog(dir.toString)
      val pool = Executors.newFixedThreadPool(12)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      // first-round rendezvous: every writer computes its target version
      // BEFORE any writer publishes, so ≥11 losses are guaranteed — a
      // loaded box can otherwise serialize the free-running loop and
      // flake the non-vacuity assertion below
      val gate = new java.util.concurrent.CyclicBarrier(12)
      val futs = (1 to 12).map { i =>
        Future {
          var done = false
          var first = true
          while (!done) {
            val next = log.latestVersion.get + 1
            if (first) { gate.await(); first = false }
            try {
              log.write(next, Seq(
                Action.of(AddFile(s"races/f$i.parquet", Map.empty, 1L, 1L, None)),
                Action.of(CommitInfo(next, "APPEND", Map.empty))))
              done = true
            } catch { case _: CommitConflictException => () }
          }
        }
      }
      Await.result(Future.sequence(futs), 120.seconds)
      pool.shutdown()
      assert(adapter.lostRaces > 0, "contention fixture never actually raced")

      // 13 commits (create + 12) crossed CHECKPOINT_EVERY: the parquet
      // checkpoint and the _last_checkpoint pointer both published
      // through the adapter onto the shared FS
      val snap = log.snapshot()
      assert(snap.version === 12)
      assert(snap.files.map(_.path).count(_.startsWith("races/")) === 12)
      assert(Files.isRegularFile(
        dir.resolve(LakeLog.LOG_DIR).resolve(
          LakeLog.parquetCheckpointFileName(10))))
      assert(Files.isRegularFile(
        dir.resolve(LakeLog.LOG_DIR).resolve(LakeLog.LAST_CHECKPOINT)))
      // every published commit object holds exactly one won condition
      // (directory stream closed — the leak class c0b36b5 fixed in
      // vacuumMarkers)
      val markerStream =
        Files.list(dir.resolve(LakeLog.LOG_DIR).resolve(".cond"))
      val reserved =
        try markerStream.iterator().asScala
          .count(_.toString.endsWith(".reserved"))
        finally markerStream.close()
      assert(reserved === adapter.wins)
    } finally CommitStore.unregister("file")
    assert(CommitStore.forPath("/plain/path") eq LocalFsCommitStore)
  }
}
