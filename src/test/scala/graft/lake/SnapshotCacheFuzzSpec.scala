package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized invariant harness for the latest-snapshot cache: after
  * EVERY operation of a random commit history (appends, deletes,
  * updates, property commits, compactions, checkpoint crossings,
  * snapshot expiry), the cache-served snapshot must be byte-equivalent
  * to a cold from-disk resolution — same files in the same order, same
  * metadata, txns, and history window. Histories run long enough to
  * cross the CHECKPOINT_EVERY boundary repeatedly, so the
  * newer-checkpoint fallback (incremental replay must NOT graft past a
  * fresh checkpoint) fires for real, and one arm deletes + recreates
  * the table mid-history to exercise the fingerprint.
  */
class SnapshotCacheFuzzSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def assertParityWithCold(path: String): Unit = {
    val warm = new LakeLog(path).snapshot(None)
    LakeLog.snapshotCache.clear()
    val cold = new LakeLog(path).snapshot(None)
    assert(warm.version === cold.version)
    assert(warm.metaData === cold.metaData)
    assert(warm.files.map(f => (f.path, f.size, f.partitionValues, f.dvPath,
      f.dvInline.map(_.toSeq))) ===
      cold.files.map(f => (f.path, f.size, f.partitionValues, f.dvPath,
        f.dvInline.map(_.toSeq))), "file list parity (content AND order)")
    assert(warm.txns === cold.txns)
    assert(warm.commits.map { case (v, ci) => (v, ci.operation) } ===
      cold.commits.map { case (v, ci) => (v, ci.operation) },
      "history window parity")
    // leave the cold result cached — the next round's warm read then
    // exercises incremental replay on top of it
  }

  for (seed <- 1L to 4L) {
    test(s"cache-served snapshots == cold resolution over a random history (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val path = Files.createTempDirectory(s"snapfuzz-$seed-").toString
      var t = LakeTable.create(spark, path, Seq((0L, "r0")).toDF("id", "v"))
      val model = scala.collection.mutable.LinkedHashMap(0L -> "r0")
      var nextId = 1L
      var compacted = false
      var recreated = false
      // 28 steps crosses CHECKPOINT_EVERY=10 at least twice
      for (step <- 1 to 28) {
        // the adversarial arm runs DETERMINISTICALLY (not behind a
        // random draw that could never land): delete + recreate at the
        // same path mid-history, which the commit-file fingerprint must
        // catch
        if (seed == 4 && step == 15) {
          graft.TestFs.rmRf(path)
          model.clear(); model(0L) = "reborn"
          t = LakeTable.create(spark, path, Seq((0L, "reborn")).toDF("id", "v"))
          recreated = true
        } else rnd.nextInt(11) match {
          case 0 | 1 | 2 | 3 =>
            val rows = (0 until 1 + rnd.nextInt(3)).map { _ =>
              val id = nextId; nextId += 1
              model(id) = s"r$id"; (id, s"r$id")
            }
            t.append(rows.toDF("id", "v"))
          case 10 if model.size > 1 =>
            // REORG PURGE of a takedown'd id: the dataChange=false class
            // interleaving with DML/expiry/vacuum/checkpoint crossings —
            // cache parity and data correctness must be indifferent to
            // it like any other commit (id picked deterministically so
            // the draw sequence stays step-local)
            val id = model.keys.toSeq(step % model.size)
            model.remove(id)
            t.purgeStale(Seq(id).toDF("id"), Seq("id"))
          case 4 if model.size > 1 =>
            val id = model.keys.toSeq(rnd.nextInt(model.size))
            model.remove(id)
            t.delete(col("id") === id)
          case 5 if model.nonEmpty =>
            val id = model.keys.toSeq(rnd.nextInt(model.size))
            model(id) = s"u$step"
            t.update(col("id") === id, Map("v" -> lit(s"u$step")))
          case 6 =>
            t.setProperties(Map(s"tag$step" -> step.toString))
          case 7 =>
            t.compact(targetFileBytes = 1L << 30)
            compacted = true
          case 8 if step > 10 =>
            // expiry deletes old commit files; the cache must survive
            // losing history below the latest checkpoint
            t.expireSnapshots(olderThanMs = 0L, retainLast = 5)
          case 9 if step > 5 =>
            // vacuum deletes non-live files while the cache holds the
            // live list — parity and readability must be untouched
            t.vacuum(retentionMs = 0L)
          case _ => ()
        }
        assertParityWithCold(path)
        assert(t.toDF.as[(Long, String)].collect().toSet === model.toSet,
          s"data divergence at step $step")
      }
      if (seed == 4)
        assert(recreated, "the adversarial recreate arm must have fired")
      else assert(compacted, "the fuzz should exercise compaction")
    }
  }

  test("parity holds with ASYNC checkpoints racing random DML/expiry/vacuum (seed 5)") {
    // threshold 0 pushes every boundary checkpoint onto the daemon
    // writer, so checkpoint publication and pointer swings land at
    // arbitrary points relative to the history's commits, expiries, and
    // vacuums — warm/cold parity and data correctness must be
    // indifferent to WHEN (or whether) a checkpoint lands
    val old = LakeLog.asyncCheckpointFileThreshold
    LakeLog.asyncCheckpointFileThreshold = 0L
    try {
      val rnd = new scala.util.Random(5L)
      val path = Files.createTempDirectory("snapfuzz-async-").toString
      val t = LakeTable.create(spark, path, Seq((0L, "r0")).toDF("id", "v"))
      val model = scala.collection.mutable.LinkedHashMap(0L -> "r0")
      var nextId = 1L
      for (step <- 1 to 28) {
        rnd.nextInt(10) match {
          case 0 | 1 | 2 | 3 =>
            val rows = (0 until 1 + rnd.nextInt(3)).map { _ =>
              val id = nextId; nextId += 1
              model(id) = s"r$id"; (id, s"r$id")
            }
            t.append(rows.toDF("id", "v"))
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
        assertParityWithCold(path)
        assert(t.toDF.as[(Long, String)].collect().toSet === model.toSet,
          s"data divergence at step $step")
      }
    } finally LakeLog.asyncCheckpointFileThreshold = old
  }

  test("a recreate landing between replay and cache store cannot poison the cache") {
    // ADVICE r6: cachePut used to stat the commit file AFTER the replay,
    // so a delete+recreate in that window stored the OLD table's
    // snapshot under the NEW commit file's fingerprint — and the
    // poisoned entry kept validating until the checkpoint pointer moved.
    // The fingerprint is now captured BEFORE any log-body read; the same
    // race must degrade to a plain cache miss. The onBeforeCachePut seam
    // injects the race deterministically at its worst point.
    val path = Files.createTempDirectory("snapcache-race-").toString
    val tA = LakeTable.create(spark, path, Seq((0L, "genA")).toDF("id", "v"))
    tA.append(Seq((1L, "genA")).toDF("id", "v")) // latest version = 1
    val genA = tA.snapshot.metaData.id

    LakeLog.snapshotCache.clear()
    var fired = false
    LakeLog.onBeforeCachePut = () => {
      // disarm FIRST: the recreate below resolves snapshots itself
      LakeLog.onBeforeCachePut = () => ()
      fired = true
      graft.TestFs.rmRf(path)
      val tB = LakeTable.create(spark, path, Seq((0L, "genB")).toDF("id", "v"))
      tB.append(Seq((1L, "genB")).toDF("id", "v")) // same latest version
    }
    try {
      // this resolution reads generation A, then the swap lands, then
      // the result is stored — under the old ordering the store would
      // fingerprint generation B's commit file
      val racedSnap = new LakeLog(path).snapshot(None)
      assert(fired, "the race seam must have fired")
      assert(racedSnap.metaData.id === genA, "the raced read itself sees gen A")

      val after = new LakeLog(path).snapshot(None)
      assert(after.metaData.id !== genA,
        "a fresh resolution must see generation B, not the poisoned gen-A entry")
      assert(LakeTable.forPath(spark, path).toDF
        .as[(Long, String)].collect().toSet === Set((0L, "genB"), (1L, "genB")))
    } finally LakeLog.onBeforeCachePut = () => ()
  }
}
