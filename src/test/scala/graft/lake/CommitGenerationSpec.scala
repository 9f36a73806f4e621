package graft.lake

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The two commit-time shapes of the recreate-at-the-same-path family
  * that the write-side guards must close (review of the round-7 diff):
  *
  *  - a REBASING blind append must compare the table's validation state
  *    against the writer's PINNED read metadata, not a re-resolved
  *    "snapshot at readVersion" — after a recreate the re-resolved
  *    baseline reads the NEW generation on both sides and the
  *    comparison can never detect it;
  *  - a commit whose PREDECESSOR version does not exist (the table was
  *    recreated with a SHORTER log underneath the writer) must fail
  *    loudly instead of acknowledging a gapped commit that forward
  *    probing never reaches.
  */
class CommitGenerationSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("a rebasing blind append refuses a recreated table generation") {
    val path = Files.createTempDirectory("commit-gen-").toString
    val tA = LakeTable.create(spark, path, Seq((0L, "genA")).toDF("id", "v"))
    tA.append(Seq((1L, "genA")).toDF("id", "v")) // gen A: versions 0..1
    val snapA = tA.snapshot // the writer's read snapshot, pinned

    // the recreate lands "during staging": same schema, same version
    // count + one more commit so the write attempt at v2 CONFLICTS and
    // the rebase guard is what must catch the generation change
    graft.TestFs.rmRf(path)
    val tB = LakeTable.create(spark, path, Seq((0L, "genB")).toDF("id", "v"))
    tB.append(Seq((1L, "genB")).toDF("id", "v"))
    tB.append(Seq((2L, "genB")).toDF("id", "v")) // gen B: versions 0..2

    val now = System.currentTimeMillis()
    val staged = Seq(
      Action.of(AddFile("ghost.parquet", Map.empty, 1L, now, None)),
      Action.of(CommitInfo(now, "APPEND", Map.empty)))
    val t = LakeTable.forPath(spark, path)
    intercept[CommitConflictException] {
      t.commitWithRetry(snapA.version, staged, rebaseable = true,
        readMeta = Some(snapA.metaData))
    }
    assert(!LakeTable.forPath(spark, path).snapshot.files
      .exists(_.path == "ghost.parquet"),
      "gen A's staged file must not land in generation B")

    // control: the SAME pinned metadata rebases fine when only benign
    // concurrent commits happened (no recreate)
    val snapB = tB.snapshot
    tB.setProperties(Map("tag" -> "x")) // benign concurrent commit
    val v = t.commitWithRetry(snapB.version, staged, rebaseable = true,
      readMeta = Some(snapB.metaData))
    assert(v === snapB.version + 2) // rebased past the property commit
  }

  test("a commit with a missing predecessor fails instead of writing a gap") {
    val path = Files.createTempDirectory("commit-gap-").toString
    val t = LakeTable.create(spark, path, Seq((0L, "a")).toDF("id", "v"))
    t.append(Seq((1L, "a")).toDF("id", "v")) // versions 0..1
    val log = new LakeLog(path)
    val now = System.currentTimeMillis()
    val actions = Seq(
      Action.of(AddFile("f.parquet", Map.empty, 1L, now, None)),
      Action.of(CommitInfo(now, "APPEND", Map.empty)))
    // a writer that read a LONGER history (e.g. v5 of a prior
    // generation) attempts version 6 — predecessor 5 does not exist.
    // Thrown as a CONFLICT so a rebaseable append re-enters the rebase
    // path (the benign cause is concurrent expiry, where the pinned
    // readMeta still matches and the retry at the current tip succeeds)
    val e = intercept[CommitConflictException] { log.write(6L, actions) }
    assert(e.getMessage.contains("predecessor"))
    assert(!Files.isRegularFile(java.nio.file.Paths.get(
      path, LakeLog.LOG_DIR, LakeLog.commitFileName(6L))),
      "no gapped commit file may exist")
    // the dense next version still works
    log.write(2L, actions)
    assert(new LakeLog(path).snapshot(None).version === 2L)
  }

  test("a blind append whose read version was EXPIRED rebases to the tip") {
    // the benign cause of a missing predecessor: concurrent
    // expireSnapshots deleted the slots below its horizon while this
    // writer staged. Same generation → the pinned readMeta matches and
    // the rebase lands at the current tip instead of failing with a
    // misleading recreate diagnosis
    val path = Files.createTempDirectory("commit-expired-").toString
    val t = LakeTable.create(spark, path, Seq((0L, "a")).toDF("id", "v"))
    for (i <- 1 to 12) t.append(Seq((i.toLong, "a")).toDF("id", "v"))
    t.expireSnapshots(olderThanMs = 0L, retainLast = 3)
    assert(!Files.isRegularFile(java.nio.file.Paths.get(
      path, LakeLog.LOG_DIR, LakeLog.commitFileName(2L))),
      "the fixture must actually expire the writer's slot")

    val now = System.currentTimeMillis()
    val staged = Seq(
      Action.of(AddFile("late.parquet", Map.empty, 1L, now, None)),
      Action.of(CommitInfo(now, "APPEND", Map.empty)))
    // writer pinned at v1 (now expired); the generation is unchanged
    val v = t.commitWithRetry(1L, staged, rebaseable = true,
      readMeta = Some(t.snapshot.metaData))
    assert(v === 13L, "the rebase must land past the expiry horizon")
    assert(LakeTable.forPath(spark, path).snapshot.files
      .exists(_.path == "late.parquet"))
  }
}
