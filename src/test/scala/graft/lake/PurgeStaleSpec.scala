package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[LakeTable.purgeStale]] — the REORG-class stale-row purge the
  * incremental dedup/ANN indexes compact with (Delta's
  * `REORG ... APPLY (PURGE)` shape): only files holding matched rows
  * rewrite, the commit is invisible to streams and the change feed, and
  * SetTxn/properties state survives byte-identical.
  */
class PurgeStaleSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def freshTable(path: String): LakeTable =
    LakeTable.create(spark, path,
      (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v")
        .repartitionByRange(2, col("id"))) // 2 files: ids 0-49 / 50-99

  test("file granularity: only files holding stale rows rewrite") {
    val path = Files.createTempDirectory("purge-gran-").toString
    val t = freshTable(path)
    assert(t.snapshot.files.size === 2)
    val untouchedBefore = t.snapshot.files.map(_.path).toSet

    val dropped = t.purgeStale(
      (0L until 10L).toDF("id"), Seq("id"))
    assert(dropped === 10L)
    assert(t.toDF.count() === 90)
    assert(t.toDF.where($"id" < 10).isEmpty)
    assert(t.snapshot.commits.last._2.operation === "PURGE")
    // the high-range file held no stale row — same AddFile, not rewritten
    val after = t.snapshot.files.map(_.path).toSet
    assert(after.intersect(untouchedBefore).nonEmpty,
      s"the untouched file must survive by path: before=$untouchedBefore after=$after")

    // a file whose EVERY row is stale is dropped outright (its kept set
    // is empty — no replacement rows to write for it)
    assert(t.purgeStale((50L until 100L).toDF("id"), Seq("id")) === 50L)
    assert(t.toDF.count() === 40)
    assert(t.toDF.agg(max($"id")).head().getLong(0) === 49L)
  }

  test("nondeterministic stale frame: census and rewrite see ONE evaluation") {
    val path = Files.createTempDirectory("purge-nondet-").toString
    val t = freshTable(path)
    val before = t.toDF.count()
    // a frame that returns a DIFFERENT subset per evaluation (rand()
    // won't do: its seed bakes in at analysis): without the pinned
    // localCheckpoint, the census semi-join and the rewrite anti-join
    // would disagree — dropped != rows actually removed
    val flip = udf((_: Long) =>
      java.util.concurrent.ThreadLocalRandom.current().nextBoolean())
      .asNondeterministic()
    val nondet = spark.range(0, 100).toDF("id")
      .where(flip($"id")).select($"id")
    val dropped = t.purgeStale(nondet, Seq("id"))
    val after = t.toDF.count()
    assert(before - after === dropped,
      s"dropped=$dropped but table shrank by ${before - after}")
  }

  test("big-log purge: census inventory comes off the distributed checkpoint scan") {
    val THRESH = "spark.graft.log.distributedThreshold"
    def build(): LakeTable = {
      val path = Files.createTempDirectory("purge-dist-").toString
      def batch(lo: Long, hi: Long) =
        (lo until hi).map(i => (i, s"v$i")).toDF("id", "v")
          .repartitionByRange(4, col("id"))
      val t = LakeTable.create(spark, path, batch(0, 200))
      (1 to 10).foreach(i => t.append(batch(200L * i, 200L * i + 200)))
      assert(java.nio.file.Files.isRegularFile(t.log.logDir.resolve(
        LakeLog.parquetCheckpointFileName(10L))), "checkpoint at v10 expected")
      t
    }
    // identical tables, identical stale set — one purge per path
    val (a, b) = (build(), build())
    def stale = (0L until 2200L by 7L).toDF("id")
    try {
      spark.conf.set(THRESH, "1000000")
      val droppedDriver = a.purgeStale(stale, Seq("id"))
      assert(!DmlMetrics.lastPurgeDistributed.get())

      spark.conf.set(THRESH, "10")
      val droppedDist = b.purgeStale(stale, Seq("id"))
      assert(DmlMetrics.lastPurgeDistributed.get(),
        "above the threshold the census must resolve via DistributedState")
      // results identical to the driver path: same drop count, same
      // surviving rows, same PURGE commit shape
      assert(droppedDist === droppedDriver && droppedDist > 0)
      assert(b.toDF.collect().map(r => (r.getLong(0), r.getString(1))).toSet
        === a.toDF.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
      val (ciA, ciB) =
        (a.snapshot.commits.last._2, b.snapshot.commits.last._2)
      assert(ciB.operation === "PURGE")
      assert(ciB.parameters("purgedRows")
        === ciA.parameters("purgedRows"))
      assert(ciB.parameters("touchedFiles")
        === ciA.parameters("touchedFiles"))
      assert(ciB.parameters("skippedFiles")
        === ciA.parameters("skippedFiles"))
    } finally spark.conf.unset(THRESH)
  }

  test("no stale match: zero rows, zero commits") {
    val path = Files.createTempDirectory("purge-noop-").toString
    val t = freshTable(path)
    val v = t.snapshot.version
    assert(t.purgeStale(Seq(5000L, 6000L).toDF("id"), Seq("id")) === 0L)
    assert(t.snapshot.version === v, "a no-op purge must not commit")
  }

  test("SetTxn state and table properties survive the purge") {
    val path = Files.createTempDirectory("purge-txn-").toString
    val t = LakeTable.create(spark, path,
      (0L until 40L).map(i => (i, s"v$i")).toDF("id", "v"),
      properties = Map("custom.prop" -> "kept"))
    assert(t.idempotentAppend((100L until 110L).map(i => (i, s"v$i"))
      .toDF("id", "v"), "purge-spec-app", 7L))
    val txnsBefore = t.snapshot.txns
    assert(txnsBefore("purge-spec-app") === 7L)

    assert(t.purgeStale((0L until 5L).toDF("id"), Seq("id")) === 5L)
    assert(t.snapshot.txns === txnsBefore,
      "the purge must not move any exactly-once pointer")
    assert(t.snapshot.metaData.properties("custom.prop") === "kept")
    // the pointer still gates replays after the purge
    assert(!t.idempotentAppend((200L until 210L).map(i => (i, s"v$i"))
      .toDF("id", "v"), "purge-spec-app", 7L), "replay must stay a no-op")
  }

  test("expectedVersion mismatch refuses to purge (racing-sync guard)") {
    val path = Files.createTempDirectory("purge-ver-").toString
    val t = freshTable(path)
    val v = t.snapshot.version
    t.append(Seq((500L, "late")).toDF("id", "v")) // the table moved
    intercept[CommitConflictException] {
      t.purgeStale((0L until 10L).toDF("id"), Seq("id"),
        expectedVersion = Some(v))
    }
    assert(t.toDF.count() === 101, "nothing may be purged on a version race")
  }

  test("strict-mode stream flows past a PURGE commit (REORG semantics)") {
    val path = Files.createTempDirectory("purge-stream-").toString
    val t = LakeTable.create(spark, path, Seq((1L, "a")).toDF("id", "v"))
    val q = spark.readStream
      .format("org.apache.spark.sql.graft.LakeSourceProvider")
      .option("path", path)
      .option("skipChangeCommits", "false")
      .load()
      .writeStream.format("memory").queryName("purge_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("purge-stream-ckpt-").toString)
      .start()
    try {
      q.processAllAvailable()
      t.append(Seq((2L, "b"), (3L, "dead")).toDF("id", "v"))
      // the purge lands MID-STREAM: even strict mode must classify it
      // as row-invisible and keep tailing appends across it
      assert(t.purgeStale(Seq(3L).toDF("id"), Seq("id")) === 1L)
      t.append(Seq((4L, "c")).toDF("id", "v"))
      q.processAllAvailable()
      val seen = spark.table("purge_stream").as[(Long, String)].collect().toSet
      assert(seen === Set((1L, "a"), (2L, "b"), (3L, "dead"), (4L, "c")),
        "PURGE must be invisible to the stream (no failure, no re-emission)")
    } finally q.stop()
  }

  test("purging a DV-masked file drops the masked rows physically") {
    val path = Files.createTempDirectory("purge-dv-").toString
    val t = LakeTable.create(spark, path,
      (0L until 50L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    t.delete($"id" === 7L) // small hit → deletion vector, not a rewrite
    assert(t.snapshot.files.exists(f => f.dvPath.isDefined || f.dvInline.isDefined),
      "fixture must have produced a DV")
    assert(t.purgeStale(Seq(3L).toDF("id"), Seq("id")) === 1L)
    // the rewrite applied the DV as a side effect: clean file, same rows
    assert(t.snapshot.files.forall(f => f.dvPath.isEmpty && f.dvInline.isEmpty))
    assert(t.toDF.count() === 48)
    assert(t.toDF.where($"id".isin(3L, 7L)).isEmpty)
  }
}
