package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.CorpusPipeline

/** Stats-less adopted tables (ADVICE r10 medium): a CONVERT-adopted
  * corpus whose files carry no footer stats must read as UNKNOWN
  * liveness, not as 0 live rows — zero would make every staleness
  * estimate report ~100% stale, fire `maybeCompactIndexes`' census on
  * every zero-churn wave, and misreport `est_stale_fraction` through
  * SHOW INDEXES. Partially stats-less snapshots extrapolate the blind
  * files at the stats-carrying files' bytes-per-row.
  */
class StatsLessAdoptionSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("partially stats-less snapshots extrapolate by bytes-per-row") {
    def f(path: String, size: Long, rows: Option[Long], dv: Long = 0L) =
      AddFile(path, size = size, dvCardinality = dv,
        stats = rows.map(r => FileStats(r)))
    val meta = MetaData("id", "id BIGINT")
    val known = Snapshot(0L, meta, Seq(
      f("a", 100L, Some(10L)), f("b", 100L, Some(10L)),
      f("c", 100L, None)), Map.empty, Seq.empty)
    assert(known.estimatedLiveRows === 30L,
      "a blind 100-byte file among 10-rows-per-100-bytes files reads as 10")
    assert(known.estimatedLiveRowsIfKnown === Some(30L))
    // DVs still subtract, floored per file
    val dvd = Snapshot(0L, meta, Seq(
      f("a", 100L, Some(10L), dv = 4L), f("b", 100L, Some(10L))),
      Map.empty, Seq.empty)
    assert(dvd.estimatedLiveRows === 16L)
    // no stats anywhere: no basis — unknown, never "0 live rows"
    val blind = Snapshot(0L, meta, Seq(
      f("a", 100L, None), f("b", 100L, None)), Map.empty, Seq.empty)
    assert(blind.estimatedLiveRowsIfKnown.isEmpty)
    // empty table: known-zero (not unknown)
    val empty = Snapshot(0L, meta, Seq.empty, Map.empty, Seq.empty)
    assert(empty.estimatedLiveRowsIfKnown === Some(0L))
  }

  test("a sub-1% stat-ful sliver is no basis: the estimate reads unknown") {
    def f(path: String, size: Long, rows: Option[Long]) =
      AddFile(path, size = size, stats = rows.map(r => FileStats(r)))
    val meta = MetaData("id", "id BIGINT")
    // one tiny stat-ful control file against a large blind bulk
    // (VERDICT r11 #4): extrapolating the bulk from the sliver's
    // bytes-per-row could be off by the row-width ratio — unknown
    val sliver = Snapshot(0L, meta,
      f("tiny", 10L, Some(1L)) +:
        (0 until 5).map(i => f(s"blind$i", 100000L, None)),
      Map.empty, Seq.empty)
    assert(sliver.estimatedLiveRowsIfKnown.isEmpty,
      "a <1%-of-bytes stat-ful sliver must not drive an extrapolation")
    // the raw estimate still extrapolates (callers that need a number
    // get the best-effort one); only the gated IfKnown path closes
    assert(sliver.estimatedLiveRows > 0L)
    // at exactly 1% the basis counts as representative again
    val onePct = Snapshot(0L, meta, Seq(
      f("s", 100L, Some(10L)), f("blind", 9900L, None)),
      Map.empty, Seq.empty)
    assert(onePct.estimatedLiveRowsIfKnown === Some(1000L))
  }

  test("a fully stats-less source keeps the compaction trigger closed at zero churn") {
    val root = Files.createTempDirectory("statsless-").toString
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(8)(r.nextGaussian().toFloat)
    }
    val words = Seq("one", "two", "red", "blue", "wolf", "bear", "alpha",
      "beta", "iron", "gold", "oak", "elm", "north", "south", "rain",
      "snow", "fast", "slow", "high", "low")
    val corpus = (0 until 20).map { i =>
      (i.toLong, (0 until 10).map(j => words((i * 7 + j * 3) % 20) + i)
        .mkString(" "), vec(i))
    }.toDF("doc_id", "text", "embedding")
    CorpusPipeline.curate(spark, corpus, root, minQuality = 0.0,
      minTokens = 0, nearDupThreshold = 0.99, fuzzyIndex = true,
      vecCol = Some("embedding"), semNLists = 2)

    // adopt-shape the curated table: replace-by-path adds drop every
    // file's footer stats, exactly what a CONVERT over foreign parquet
    // whose footers failed to parse produces
    val curated = LakeTable.forPath(spark, s"$root/curated")
    val snap = curated.snapshot
    curated.log.write(snap.version + 1,
      snap.files.map(f => Action.of(f.copy(stats = None))) :+
        Action.of(CommitInfo(System.currentTimeMillis(), "CONVERT",
          Map("statsless" -> "true"))))
    LakeLog.snapshotCache.clear()
    val adopted = LakeTable.forPath(spark, s"$root/curated")
    assert(adopted.snapshot.files.forall(_.stats.isEmpty))
    assert(adopted.snapshot.estimatedLiveRowsIfKnown.isEmpty)

    // ZERO churn: the trigger must stay closed — estimating the blind
    // source at 0 live rows would read as 100% stale and pay the purge
    // census (which finds nothing) on every wave
    val posts = LakeTable.forPath(spark, s"$root/mhindex/postings")
    val asg = LakeTable.forPath(spark, s"$root/semindex/assignments")
    val (pv, av) = (posts.snapshot.version, asg.snapshot.version)
    assert(CorpusPipeline.maybeCompactIndexes(spark, root) === ((0L, 0L)))
    assert(posts.snapshot.version === pv && asg.snapshot.version === av,
      "neither index log may move on a zero-churn stats-less source")

    // observability mirrors the same arithmetic: unknown, not ~1.0
    val rows = spark.sql(s"SHOW INDEXES AT '$root'").collect()
      .filter(r => Set("minhash", "ivf")(r.getAs[String]("kind")))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("source_live_rows")),
        s"stats-less source must report unknown live rows: $r")
      assert(r.isNullAt(r.fieldIndex("est_stale_fraction")),
        s"stats-less source must report unknown staleness: $r")
    }

    // re-adopt with ONE tiny stat-ful control file against the blind
    // bulk (a compaction artifact surviving a CONVERT): <1% of the
    // snapshot's bytes is no basis — the trigger stays closed instead
    // of extrapolating the bulk from the sliver's bytes-per-row
    val snap2 = adopted.snapshot
    val tinyPath = snap2.files.head.path
    adopted.log.write(snap2.version + 1,
      snap2.files.map { f =>
        if (f.path == tinyPath)
          Action.of(f.copy(stats = Some(FileStats(1L)), size = 1L))
        else Action.of(f)
      } :+ Action.of(CommitInfo(System.currentTimeMillis(), "CONVERT",
        Map("sliver" -> "true"))))
    LakeLog.snapshotCache.clear()
    val slivered = LakeTable.forPath(spark, s"$root/curated")
    assert(slivered.snapshot.files.count(_.stats.isDefined) === 1)
    assert(slivered.snapshot.estimatedLiveRowsIfKnown.isEmpty,
      "a sub-1% stat-ful sliver must read as unknown, not extrapolate")
    val (pv2, av2) = (posts.snapshot.version, asg.snapshot.version)
    assert(CorpusPipeline.maybeCompactIndexes(spark, root) === ((0L, 0L)))
    assert(posts.snapshot.version === pv2 && asg.snapshot.version === av2,
      "the sliver-stats source must keep the trigger closed too")
  }
}
