package graft.lake

import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

/** The [[CommitStore]] publication seam: local hard-link semantics, the
  * scheme registry, and the commit protocol running unchanged over
  * object-store-style conditional PUTs.
  */
class CommitStoreSpec extends AnyFunSuite {

  private def tmpDir() = Files.createTempDirectory("commitstore-")

  test("local putIfAbsent: first writer wins, loser leaves dest untouched") {
    val d = tmpDir()
    val dest = d.resolve("00000000000000000000.json")
    assert(LocalFsCommitStore.putIfAbsent(dest, "a".getBytes))
    assert(!LocalFsCommitStore.putIfAbsent(dest, "b".getBytes))
    assert(new String(Files.readAllBytes(dest)) === "a")
    // staging junk is cleaned either way
    assert(!Files.list(d.resolve(LakeLog.TMP_DIR)).iterator().hasNext)
  }

  test("replace is last-writer-wins and atomic-moves the pointer") {
    val d = tmpDir()
    val dest = d.resolve("_last_checkpoint")
    LocalFsCommitStore.replace(dest, """{"version":10}""".getBytes)
    LocalFsCommitStore.replace(dest, """{"version":20}""".getBytes)
    assert(new String(Files.readAllBytes(dest)).contains("20"))
  }

  test("scheme registry routes adapters; pathless tables stay local") {
    val probe = new ConditionalPutCommitStore
    CommitStore.register("graft-test", _ => probe)
    assert(CommitStore.forPath("graft-test://bucket/t") eq probe)
    assert(CommitStore.forPath("/plain/path") eq LocalFsCommitStore)
    assert(CommitStore.forPath("s3-unregistered://b/t") eq LocalFsCommitStore)
  }

  test("12 contending writers all land through conditional-PUT semantics") {
    val table = tmpDir().resolve("t").toString
    val store = new ConditionalPutCommitStore
    val log = new LakeLog(table, store)
    log.write(0L, Seq(
      Action.of(MetaData(id = "cs-test", schemaDdl = "id BIGINT")),
      Action.of(CommitInfo(1L, "CREATE", Map.empty))))
    val pool = Executors.newFixedThreadPool(12)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // first round rendezvous: every writer computes its target version
    // BEFORE any writer is allowed to publish, so ≥11 conditional-PUT
    // losses are GUARANTEED — on a loaded box the free-running loop can
    // serialize and the non-vacuity assertion below would flake
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
              Action.of(AddFile(s"f$i.parquet", Map.empty, 1L, 1L, None)),
              Action.of(CommitInfo(next, "APPEND", Map.empty))))
            done = true
          } catch { case _: CommitConflictException => () }
        }
      }
    }
    Await.result(Future.sequence(futs), 120.seconds)
    pool.shutdown()
    val snap = log.snapshot()
    assert(snap.version === 12)
    assert(snap.files.map(_.path).toSet === (1 to 12).map(i => s"f$i.parquet").toSet)
    assert(store.lostRaces > 0, "contention fixture never actually raced")
    // the checkpoint written at v10 went through the adapter too
    assert(Files.isRegularFile(
      Paths.get(table, LakeLog.LOG_DIR, LakeLog.parquetCheckpointFileName(10))))
  }
}
