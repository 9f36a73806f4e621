package graft.lake

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Commit-log retention (`expireSnapshots` / SQL `EXPIRE SNAPSHOTS`):
  * the log must truncate below a checkpointed horizon without breaking
  * any retained version, and expired versions must fail CLEARLY.
  */
class ExpireSnapshotsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  /** Synthetic log with controlled commit timestamps (tsBase+v): ancient
    * by default so age cutoffs are deterministic. */
  private def syntheticTable(n: Long, tsBase: Long = 1000L): String = {
    val dir = Files.createTempDirectory("expire-log-").toString
    val log = new LakeLog(dir)
    val meta = MetaData("id-1", "id BIGINT, v DOUBLE", Seq.empty, Map.empty, 123L)
    log.write(0L, Seq(Action.of(meta), Action.of(CommitInfo(tsBase, "CREATE TABLE"))))
    (1L to n).foreach { v =>
      log.write(v, Seq(
        Action.of(AddFile(s"part-$v.parquet", Map.empty, 100L, 5000L,
          Some(FileStats(1L, Map("id" -> "0"), Map("id" -> s"$v"), Map("id" -> 0L))))),
        Action.of(CommitInfo(tsBase + v, "APPEND"))))
    }
    dir
  }

  test("expire by count: horizon checkpoint materialized, tail intact") {
    val dir = syntheticTable(25L)
    val before = new LakeLog(dir).snapshot(Some(22L))
    val t = LakeTable.forPath(spark, dir)
    assert(t.expireSnapshots(olderThanMs = 0L, retainLast = 5) === 21L)
    val log = new LakeLog(dir)
    assert(log.firstAvailableVersion === Some(21L))
    assert(Files.isRegularFile(
      log.logDir.resolve(LakeLog.parquetCheckpointFileName(21L))))
    // pre-horizon checkpoints are gone
    assert(!Files.isRegularFile(
      log.logDir.resolve(LakeLog.parquetCheckpointFileName(10L))))
    // every retained version still resolves, bit-equal to pre-expiry
    val after = log.snapshot(Some(22L))
    assert(after.files.map(_.path).sorted === before.files.map(_.path).sorted)
    assert(log.snapshot(None).version === 25L)
    assert(log.snapshot(Some(21L)).files.size === 21)
  }

  test("expired versions raise, naming the earliest retained") {
    val dir = syntheticTable(25L)
    LakeTable.forPath(spark, dir).expireSnapshots(0L, 5)
    val log = new LakeLog(dir)
    val e = intercept[IllegalArgumentException](log.snapshot(Some(5L)))
    assert(e.getMessage.contains("expired"))
    assert(e.getMessage.contains("21"))
    val e2 = intercept[IllegalStateException](log.readCommit(3L))
    assert(e2.getMessage.contains("expired"))
    // timestamp travel: below the horizon raises, at/after it resolves
    intercept[IllegalArgumentException](log.versionAtTimestamp(1005L))
    assert(log.versionAtTimestamp(1023L) === 23L)
  }

  test("age floor retains recent commits even under a tight count") {
    // commits stamped NOW: a 1-year retention keeps everything...
    val dir = syntheticTable(10L, tsBase = System.currentTimeMillis() - 10000L)
    assert(LakeTable.forPath(spark, dir)
      .expireSnapshots(olderThanMs = 365L * 24 * 3600 * 1000,
        retainLast = 1) === 0L)
    // ...and with age waived, the count floor alone governs
    assert(LakeTable.forPath(spark, dir)
      .expireSnapshots(olderThanMs = 0L, retainLast = 1) === 10L)
    assert(new LakeLog(dir).firstAvailableVersion === Some(10L))
  }

  test("idempotent and no-op below the floor") {
    val dir = syntheticTable(8L)
    val t = LakeTable.forPath(spark, dir)
    assert(t.expireSnapshots(0L, 3) === 6L)
    assert(t.expireSnapshots(0L, 3) === 0L) // nothing left below horizon
    assert(t.expireSnapshots(0L, 100) === 0L) // retainLast exceeds history
  }

  test("real table: SQL statement, post-expiry writes and history") {
    val dir = Files.createTempDirectory("expire-sql-").toString
    val t = LakeTable.create(spark,
      dir, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    (1 to 11).foreach(i => t.append(Seq((10L + i, s"x$i")).toDF("id", "s")))
    val expired = spark.sql(
      s"EXPIRE SNAPSHOTS '$dir' OLDER THAN 0 HOURS RETAIN LAST 3")
      .head().getLong(0)
    assert(expired === 9L) // versions 0..8 of 0..11
    // retained versions read; expired raise; the table keeps working
    assert(t.toDF.count() === 13L)
    assert(t.asOf(9L).toDF.count() === 11L)
    intercept[IllegalArgumentException](t.asOf(2L))
    t.append(Seq((99L, "z")).toDF("id", "s"))
    assert(t.toDF.count() === 14L)
    val versions = spark.sql(s"DESCRIBE HISTORY '$dir'")
      .select("version").collect().map(_.getLong(0)).sorted
    assert(versions === (9L to 12L).toArray)
  }

  test("vacuum after expiry still removes unreferenced files (mtime)") {
    val dir = Files.createTempDirectory("expire-vac-").toString
    val t = LakeTable.create(spark,
      dir, (1L to 40L).map(i => (i, s"r$i")).toDF("id", "s"))
    t.append((41L to 80L).map(i => (i, s"r$i")).toDF("id", "s"))
    t.delete(org.apache.spark.sql.functions.col("id") <= 40L, useDvs = false)
    t.expireSnapshots(0L, 1) // the removing commits are gone
    val deleted = t.vacuum(retentionMs = 0L)
    assert(deleted.exists(_.endsWith(".parquet")))
    assert(t.toDF.count() === 40L)
  }

  test("history(limit) reads the newest window and stops at the expiry edge") {
    val dir = Files.createTempDirectory("expire-hist-").toString
    val t = LakeTable.create(spark, dir, Seq((0L, "r0")).toDF("id", "s"))
    for (i <- 1 to 12) t.append(Seq((i.toLong, s"r$i")).toDF("id", "s"))
    import spark.implicits._
    // newest-3 window equals the head of the full history
    assert(t.history(3).select("version").as[Long].collect().toSeq ===
      t.history.select("version").as[Long].collect().toSeq.take(3))
    // a limit PAST the expiry edge returns just the retained versions
    // instead of failing on the deleted commits
    t.expireSnapshots(0L, 4)
    val afterExpiry = t.history(1000).select("version").as[Long].collect().toSeq
    assert(afterExpiry === t.history.select("version").as[Long].collect().toSeq)
    assert(afterExpiry.size === 4)
  }
}
