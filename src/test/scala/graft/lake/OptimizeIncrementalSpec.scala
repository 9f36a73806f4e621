package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[LakeTable.optimizeIncrementalBy]] — tiered clustering maintenance:
  * the clustered base is NEVER rewritten, only the accumulated
  * layout-breaking residue (appended scatter, stats-less adoptions)
  * merges into a fresh disjoint run, and a layout already within the
  * layer budget is an exact no-op. The point: at 100 TB the wide-IN
  * remedy (BASELINE §U) is only affordable if maintaining it costs
  * churn, not the table.
  */
class OptimizeIncrementalSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  /** 20 range-clustered base files over ids 0..1999 (disjoint). */
  private def base(path: String): LakeTable = {
    val df = (0L until 2000L).map(i => (i, s"r$i")).toDF("id", "v")
      .repartitionByRange(20, $"id").sortWithinPartitions($"id")
    LakeTable.create(spark, path, df)
  }

  /** One appended file spanning the whole id domain (scatter). */
  private def scatter(t: LakeTable, seed: Long): Unit =
    t.append((0 until 40).map(i => (i * 50L + seed, s"s$seed-$i"))
      .toDF("id", "v").repartition(1))

  test("rewrites only the churn; the clustered base stays byte-for-byte") {
    val path = Files.createTempDirectory("optinc-").toString
    val t = base(path)
    val basePaths = t.snapshot.files.map(_.path).toSet
    assert(basePaths.size === 20)
    (1 to 5).foreach(i => scatter(t, i.toLong))
    assert(t.snapshot.files.size === 25)

    val rewritten = t.optimizeIncrementalBy("id", maxLayers = 2)
    assert(rewritten === 5, "exactly the five scatter files rewrite")
    val after = t.snapshot
    assert(basePaths.subsetOf(after.files.map(_.path).toSet),
      "the base run must survive untouched — cost ∝ churn, not table")
    assert(t.toDF.count() === 2000L + 5 * 40)

    // depth is now ≤ maxLayers: an immediate second call is a no-op
    val v = after.version
    assert(t.optimizeIncrementalBy("id", maxLayers = 2) === 0)
    assert(t.snapshot.version === v, "a clean layout must not commit")

    // and the layout bound is the read bound: a point key hits at most
    // one file per layer
    assert(t.read($"id" === 777L).inputFiles.length <= 2)
  }

  test("stat strings compare by column type, not lexically") {
    val path = Files.createTempDirectory("optinc-num-").toString
    val rows = (0L until 1000L).map(i => (i, i.toString)).toDF("id", "v")
    val t = LakeTable.create(spark, path,
      rows.where($"id" < 10).repartition(1))
    t.append(rows.where($"id" >= 10 && $"id" < 100).repartition(1))
    t.append(rows.where($"id" >= 100).repartition(1))
    // ranges [0,9], [10,99], [100,999] are DISJOINT numerically; a
    // lexical compare would read "9" > "10" and "99" > "100", see depth
    // 3, and shred a perfectly clustered table
    val v = t.snapshot.version
    assert(t.optimizeIncrementalBy("id", maxLayers = 2) === 0)
    assert(t.snapshot.version === v)
  }

  test("a stats-less adopted file rewrites and regains footer stats") {
    val path = Files.createTempDirectory("optinc-blind-").toString
    val t = base(path)
    val snap = t.snapshot
    val victim = snap.files.head
    t.log.write(snap.version + 1,
      snap.files.map { f =>
        if (f.path == victim.path) Action.of(f.copy(stats = None))
        else Action.of(f)
      } :+ Action.of(CommitInfo(System.currentTimeMillis(), "CONVERT",
        Map("blind" -> "true"))))
    LakeLog.snapshotCache.clear()
    val adopted = LakeTable.forPath(spark, path)
    assert(adopted.snapshot.files.count(_.stats.isEmpty) === 1)

    assert(adopted.optimizeIncrementalBy("id") === 1,
      "the lone blind file rewrites (regains stats); ranged files keep")
    val after = adopted.snapshot
    assert(after.files.forall(_.stats.isDefined))
    assert(adopted.toDF.count() === 2000L)
  }

  test("deletion vectors survive: a rewritten file drops its deleted rows") {
    val path = Files.createTempDirectory("optinc-dv-").toString
    val t = base(path)
    scatter(t, 1L) // ids duplicate base keys: 1, 51, 101, …
    scatter(t, 2L) // depth 3 > maxLayers 2: both scatter files rewrite
    val before = t.toDF.count()
    // a point delete hits one base file AND a scatter file — small
    // fraction of each, so both take deletion-vector sidecars
    assert(t.delete($"id" === 51L) === 2L)
    assert(t.snapshot.files.exists(f =>
      f.dvPath.isDefined || f.dvInline.isDefined))
    assert(t.toDF.count() === before - 2)
    // the scatter files (one DV-bearing) rewrite; the DV-bearing base
    // file stays in its kept layer with its DV intact
    assert(t.optimizeIncrementalBy("id", maxLayers = 2) === 2)
    assert(t.toDF.count() === before - 2,
      "a layout rewrite must not resurrect DV-deleted rows")
    assert(t.read($"id" === 51L).isEmpty)
  }

  test("partition columns are refused: the directory layout already clusters them") {
    val path = Files.createTempDirectory("optinc-part-").toString
    val df = (0 until 200).map(i => (i.toLong, i % 4, s"r$i"))
      .toDF("id", "part", "v")
    val t = LakeTable.create(spark, path, df, partitionBy = Seq("part"))
    val e = intercept[IllegalArgumentException] {
      t.optimizeIncrementalBy("part")
    }
    assert(e.getMessage.contains("partition"))
    // a DATA column on the partitioned table still maintains per-dir
    t.append((0 until 50).map(i => (i * 4L, i % 4, s"x$i"))
      .toDF("id", "part", "v").repartition(1))
    assert(t.optimizeIncrementalBy("id", maxLayers = 2) >= 0) // no throw
    assert(t.toDF.count() === 250L)
  }

  test("SQL surface: OPTIMIZE ... INCREMENTAL BY ... MAX LAYERS") {
    val wh = Files.createTempDirectory("optinc-wh-").toString
    spark.conf.set("spark.sql.catalog.optinc",
      "org.apache.spark.sql.graft.LakeCatalog")
    spark.conf.set("spark.sql.catalog.optinc.warehouse", wh)
    Files.createDirectories(java.nio.file.Paths.get(s"$wh/db"))
    val t = base(s"$wh/db/t")
    (1 to 3).foreach(i => scatter(t, i.toLong))
    val n = spark.sql(
      "OPTIMIZE optinc.db.t INCREMENTAL BY id MAX LAYERS 2")
      .as[Long].head()
    assert(n === 3L, "SQL form rewrites exactly the scatter files")
    assert(spark.sql("OPTIMIZE optinc.db.t INCREMENTAL BY id MAX LAYERS 2")
      .as[Long].head() === 0L)
  }

  test("string keys layer by raw byte order and keep range locality") {
    val path = Files.createTempDirectory("optinc-str-").toString
    val df = (0 until 2000).map(i => (f"doc-$i%04d", i)).toDF("k", "v")
      .repartitionByRange(20, $"k").sortWithinPartitions($"k")
    val t = LakeTable.create(spark, path, df)
    t.append((0 until 40).map(i => (f"doc-${i * 50}%04d", -i))
      .toDF("k", "v").repartition(1))
    t.append((0 until 40).map(i => (f"doc-${i * 50 + 7}%04d", -i))
      .toDF("k", "v").repartition(1))
    assert(t.optimizeIncrementalBy("k", maxLayers = 2) === 2)
    assert(t.read($"k" >= "doc-0100" && $"k" < "doc-0200")
      .inputFiles.length <= 2)
    assert(t.toDF.count() === 2080L)
  }
}
