package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Distributed snapshot state (the Delta trick): above a file-count
  * threshold, `LakeTable.read` resolves candidate files by scanning the
  * parquet CHECKPOINT as a DataFrame — stats pruning on executors, only
  * survivors collected — instead of filtering a driver-side Seq. The
  * synthetic log here has a checkpoint (version 10) plus a live tail with
  * appends AND removes, so the distributed path must reproduce exactly
  * what the driver-side replay sees.
  */
class DistributedSnapshotSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private val THRESH = "spark.graft.log.distributedThreshold"

  /** v0 create (partitioned, many files) + 10 appends → parquet
    * checkpoint at v10; then a tail: one append (v11) and one
    * whole-partition delete (v12, pure-metadata removes). */
  private def buildManyFileTable(): (String, LakeTable) = {
    val path = Files.createTempDirectory("dist-log-").toString
    def batch(lo: Long, hi: Long) =
      spark.range(lo, hi).select($"id", ($"id" % 20).as("p"), ($"id" * 2).as("v"))
    val t = LakeTable.create(spark, path, batch(0, 2000), partitionBy = Seq("p"))
    (1 to 10).foreach(i => t.append(batch(2000L * i, 2000L * i + 2000)))
    assert(Files.isRegularFile(t.log.logDir.resolve(
      LakeLog.parquetCheckpointFileName(10L))), "checkpoint at v10 expected")
    t.append(batch(22000, 24000))        // v11: tail adds
    t.delete($"p" === 7L)                // v12: tail removes (whole partition)
    (path, t)
  }

  test("distributed read reproduces the driver-side replay exactly") {
    val (_, t) = buildManyFileTable()
    try {
      spark.conf.set(THRESH, "1000000")
      val legacy = t.read().collect().toSet
      assert(!ReadMetrics.lastReadDistributed.get())

      spark.conf.set(THRESH, "10")
      val distributed = t.read().collect().toSet
      assert(ReadMetrics.lastReadDistributed.get(),
        "checkpoint-scan path should engage above the threshold")
      assert(distributed === legacy)
      assert(!distributed.exists(_.getLong(1) == 7L), "tail delete applied")
      assert(distributed.exists(_.getLong(0) >= 22000L), "tail append applied")
    } finally spark.conf.unset(THRESH)
  }

  test("stats pruning happens in the distributed pass: fewer input files") {
    val (_, t) = buildManyFileTable()
    try {
      spark.conf.set(THRESH, "10")
      val all = t.read()
      val one = t.read($"p" === 3L)
      assert(ReadMetrics.lastReadDistributed.get())
      assert(one.inputFiles.length < all.inputFiles.length / 5,
        s"partition filter should prune: ${one.inputFiles.length} vs " +
          s"${all.inputFiles.length}")
      assert(one.count() === t.toDF.where($"p" === 3L).count())
      // a filter contradicting per-file stats prunes everything
      val none = t.read($"id" === -1L)
      assert(none.inputFiles.isEmpty && none.count() === 0)
    } finally spark.conf.unset(THRESH)
  }

  test("DELETE and UPDATE over a big log resolve candidates distributed") {
    val (_, t) = buildManyFileTable() // 22800 rows live (p=7 already deleted)
    try {
      spark.conf.set(THRESH, "10")
      DmlMetrics.lastDmlDistributed.set(false)
      // whole-partition delete: pure-metadata removes through the big-log path
      assert(t.delete($"p" === 3L) === 1200L)
      assert(DmlMetrics.lastDmlDistributed.get(),
        "DELETE should resolve candidates via the checkpoint scan")
      // partial delete (half of partition 6): DV path through the
      // big-log resolution
      assert(t.delete($"id" % 40 === 6L && $"p" === 6L) === 600L)
      // update through the big-log path (all p=4 ids are divisible by 4)
      t.update($"p" === 4L, Map("v" -> lit(-1L)))
      assert(DmlMetrics.lastDmlDistributed.get())

      // the committed state is correct from BOTH resolution paths
      val viaDistributed = t.toDF.collect().toSet
      spark.conf.set(THRESH, "1000000")
      val viaDriver = t.toDF.collect().toSet
      assert(viaDistributed === viaDriver)
      assert(t.toDF.count() === 22800 - 1200 - 600)
      assert(t.toDF.where($"p" === 3L).count() === 0)
      assert(t.toDF.where($"v" === -1L).count() === 1200)
    } finally spark.conf.unset(THRESH)
  }

  test("MERGE over a big log resolves candidates distributed and prunes by source key range") {
    val (_, t) = buildManyFileTable() // live ids: 0..21999 minus p=7, plus 22000..23999
    try {
      spark.conf.set(THRESH, "10")
      DmlMetrics.lastDmlDistributed.set(false)
      DmlMetrics.lastMergeCandidateFiles.set(-1L)
      // source touches a narrow id band: the checkpoint scan must prune
      // candidate files to the overlapping stats range on executors
      val source = spark.range(1000, 1020)
        .select($"id", lit(-5L).as("v2"))
      t.mergeClauses(source,
        expr("t.id = s.id"),
        matchedClauses = Seq(MergeClause.Update(None, Map("v" -> col("s.v2")))),
        notMatchedClauses = Seq.empty,
        notMatchedBySourceClauses = Seq.empty)
      assert(DmlMetrics.lastDmlDistributed.get(),
        "MERGE should resolve candidates via the checkpoint scan")
      // ids 1000..1019 live in one batch-0 file per partition (p = id%20,
      // p=7 deleted) → ~19 touched files out of ~230 live
      val candidates = DmlMetrics.lastMergeCandidateFiles.get()
      assert(candidates >= 1 && candidates <= 25,
        s"source key range [1000,1019] should prune to ~19 files, got $candidates")
      assert(t.toDF.where($"v" === -5L).count() === 19) // id=1007 (p=7) is deleted

      // upsert: updates + inserts through the same path
      val source2 = spark.range(23990, 24010)
        .select($"id", ($"id" * 100).as("v2"))
      t.mergeClauses(source2,
        expr("t.id = s.id"),
        matchedClauses = Seq(MergeClause.Update(None, Map("v" -> col("s.v2")))),
        notMatchedClauses = Seq(MergeClause.Insert(None, Map(
          "id" -> col("s.id"), "p" -> (col("s.id") % 20), "v" -> col("s.v2")))),
        notMatchedBySourceClauses = Seq.empty)
      assert(t.toDF.where($"id" >= 24000).count() === 10, "inserts landed")
      assert(t.toDF.where($"v" === 23990L * 100).count() === 1, "updates landed")

      // committed state identical to what the driver-side path computes
      val viaDistributed = t.toDF.collect().toSet
      spark.conf.set(THRESH, "1000000")
      val viaDriver = t.toDF.collect().toSet
      assert(viaDistributed === viaDriver)
    } finally spark.conf.unset(THRESH)
  }

  test("repeated big-log reads reuse the decoded checkpoint (one decode per checkpoint)") {
    val (_, t) = buildManyFileTable()
    try {
      spark.conf.set(THRESH, "10")
      t.read($"p" === 1L).count()
      val after1 = DistributedState.decodeMisses.get()
      t.read($"p" === 2L).count()
      t.read($"id" > 5000L).count()
      t.toDF.count()
      assert(DistributedState.decodeMisses.get() === after1,
        "same checkpoint: later reads must hit the decoded cache")
      // a new checkpoint version is a new cache entry
      (1 to 10).foreach(_ => t.append(
        spark.range(0, 10).select($"id", ($"id" % 20).as("p"), ($"id" * 2).as("v"))))
      t.read($"p" === 1L).count()
      assert(DistributedState.decodeMisses.get() === after1 + 1,
        "new checkpoint: exactly one fresh decode")
    } finally spark.conf.unset(THRESH)
  }

  test("pinned time-travel handles stay on the driver-side path") {
    val (_, t) = buildManyFileTable()
    try {
      spark.conf.set(THRESH, "10")
      ReadMetrics.lastReadDistributed.set(true)
      val v0 = t.asOf(0).toDF
      assert(v0.count() === 2000)
      assert(!ReadMetrics.lastReadDistributed.get(),
        "time travel resolves driver-side (correct, just not distributed)")
    } finally spark.conf.unset(THRESH)
  }
}
