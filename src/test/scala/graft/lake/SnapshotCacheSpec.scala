package graft.lake

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The JVM-global latest-snapshot cache ([[LakeLog.snapshotCache]]):
  * repeat resolution must be O(new commits) — exact hit for an
  * unchanged table, tail-only replay for a grown one — while staying
  * indistinguishable from a from-disk resolution, including after the
  * adversarial case: a table deleted and recreated at the same path
  * (same version numbers, different history), which the commit-file
  * fingerprint must catch.
  */
class SnapshotCacheSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("snapcache-").toString

  test("unchanged table: repeat snapshot() is an exact cache hit") {
    val path = tmpDir()
    val t = LakeTable.create(spark, path, Seq((1L, "a")).toDF("id", "v"))
    t.append(Seq((2L, "b")).toDF("id", "v"))
    val first = t.snapshot
    // a FRESH handle (no state of its own) resolving the same table:
    // pointer probe + one stat, no commit/checkpoint re-reads
    val reader = new LakeLog(path)
    val again = reader.snapshot(None)
    assert(again eq first, "unchanged table must return the cached instance")
    assert(reader.fileReads === 0,
      s"exact hit must re-read no log bodies, read ${reader.fileReads}")
  }

  test("grown table: only the new tail is replayed") {
    val path = tmpDir()
    val t = LakeTable.create(spark, path, Seq((1L, "a")).toDF("id", "v"))
    t.snapshot // prime the cache at v0
    t.append(Seq((2L, "b")).toDF("id", "v"))
    t.append(Seq((3L, "c")).toDF("id", "v"))
    val reader = new LakeLog(path)
    val snap = reader.snapshot(None)
    assert(snap.version === 2L)
    assert(snap.files.size === 3)
    // 2 new commit files; fingerprint stat is not a body read
    assert(reader.fileReads <= 2,
      s"tail replay must read only the 2 new commits, read ${reader.fileReads}")
    // and the incremental result must EQUAL a cold from-disk resolution
    LakeLog.snapshotCache.clear()
    val cold = new LakeLog(path).snapshot(None)
    assert(snap.version === cold.version)
    assert(snap.files.map(f => (f.path, f.size)) ===
      cold.files.map(f => (f.path, f.size)), "file order + content parity")
    assert(snap.metaData === cold.metaData)
    assert(snap.txns === cold.txns)
    assert(snap.commits.map(_._1) === cold.commits.map(_._1))
  }

  test("delete + recreate at the same path never serves the stale table") {
    val path = tmpDir()
    val t1 = LakeTable.create(spark, path, Seq((1L, "old")).toDF("id", "v"))
    t1.snapshot // cache the OLD table's v0
    graft.TestFs.rmRf(path)
    val t2 = LakeTable.create(spark, path, Seq((9L, "new")).toDF("id", "v"))
    val rows = t2.toDF.as[(Long, String)].collect().toSet
    assert(rows === Set((9L, "new")),
      "the recreated table's snapshot must win over the cached one")
  }

  test("time travel hits the cache only at the exact cached version") {
    val path = tmpDir()
    val t = LakeTable.create(spark, path, Seq((1L, "a")).toDF("id", "v"))
    t.append(Seq((2L, "b")).toDF("id", "v"))
    val latest = t.snapshot // cache at v1
    val reader = new LakeLog(path)
    assert(reader.snapshot(Some(1L)) eq latest)
    // v0 is NOT cached → resolved from disk, and must not evict latest
    val v0 = reader.snapshot(Some(0L))
    assert(v0.version === 0L && v0.files.size === 1)
    assert(new LakeLog(path).snapshot(None) eq latest,
      "a time-travel resolve must not poison the latest-entry cache")
  }
}
