package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Z-order clustering: after zOrderBy(x, y), point/range predicates on
  * EITHER column must prune most files via min/max skipping — a
  * single-axis sort can only do that for its leading column.
  */
class ZOrderSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("skipping prunes on every z-ordered dimension") {
    val path = Files.createTempDirectory("zorder-").toString
    // 64x64 uniform grid, written in x-major order over 16 files: before
    // clustering, y predicates cannot prune (every file spans all y)
    val grid = for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong, (x * 64 + y).toDouble)
    val t = LakeTable.create(spark, path,
      grid.toDF("x", "y", "v").repartitionByRange(16, $"x"))
    assert(t.snapshot.files.size === 16)

    def filesRead(cond: org.apache.spark.sql.Column): Int =
      t.read(cond).inputFiles.length

    val yCond = $"y" >= 10L && $"y" < 14L
    val xCond = $"x" >= 20L && $"x" < 24L
    assert(filesRead(xCond) <= 2)               // x-sorted: x prunes
    assert(filesRead(yCond) === 16)             // ...but y cannot

    t.zOrderBy("x", "y")
    assert(t.snapshot.files.size >= 8)
    val xFiles = filesRead(xCond)
    val yFiles = filesRead(yCond)
    assert(xFiles <= 10, s"x prunes poorly after zorder: $xFiles")
    assert(yFiles <= 10, s"y prunes poorly after zorder: $yFiles")

    // content unchanged
    assert(t.toDF.count() === 64 * 64)
    assert(t.toDF.agg(sum($"v")).as[Double].head() ===
      (0 until 64 * 64).map(_.toDouble).sum)
  }

  test("hilbert index is a bijection whose neighbors are grid-adjacent") {
    import org.apache.spark.sql.graft.Hilbert
    val bits = 4
    val side = 1 << bits
    val all = for (x <- 0L until side; y <- 0L until side)
      yield Hilbert.index(Array(x, y), bits) -> (x, y)
    val byIndex = all.toMap
    // bijection over the full grid
    assert(byIndex.size === side * side)
    assert(byIndex.keys.min === 0L && byIndex.keys.max === side * side - 1L)
    // continuity: consecutive indexes are manhattan-distance-1 neighbors
    (0L until (side * side - 1L)).foreach { h =>
      val (x1, y1) = byIndex(h)
      val (x2, y2) = byIndex(h + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"jump at h=$h: ($x1,$y1)->($x2,$y2)")
    }
  }

  test("hilbertBy prunes on every clustered dimension") {
    val path = Files.createTempDirectory("hilbert-").toString
    val grid = for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong, (x * 64 + y).toDouble)
    val t = LakeTable.create(spark, path,
      grid.toDF("x", "y", "v").repartitionByRange(16, $"x"))
    def filesRead(cond: org.apache.spark.sql.Column): Int =
      t.read(cond).inputFiles.length
    assert(filesRead($"y" >= 10L && $"y" < 14L) === 16) // x-major: y can't prune

    t.hilbertBy("x", "y")
    assert(filesRead($"x" >= 20L && $"x" < 24L) <= 10)
    assert(filesRead($"y" >= 10L && $"y" < 14L) <= 10)
    assert(t.toDF.count() === 64 * 64)
    assert(t.toDF.agg(sum($"v")).as[Double].head() ===
      (0 until 64 * 64).map(_.toDouble).sum)
    assert(t.history.select("operation").as[String].collect()
      .contains("HILBERT BY"))
  }

  test("curve codes agree between codegen and interpreted eval") {
    import org.apache.spark.sql.graft.ZOrderExpressions
    val df = (0 until 512).map(i => ((i % 31).toDouble, (i % 17).toDouble))
      .toDF("a", "b")
    val bounds = Array((1 until 8).map(_ * 4.0).toArray,
      (1 until 8).map(_ * 2.0).toArray)
    for (mk <- Seq(ZOrderExpressions.zOrderCode _,
        ZOrderExpressions.hilbertCode _)) {
      val c = mk(Seq($"a", $"b"), bounds)
      val whole = df.select(c.as("z")).collect().map(_.getLong(0))
      // force the interpreted path for comparison
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = try df.select(c.as("z")).collect().map(_.getLong(0))
      finally {
        spark.conf.unset("spark.sql.codegen.wholeStage")
        spark.conf.unset("spark.sql.codegen.factoryMode")
      }
      assert(whole.toSeq === interp.toSeq)
    }
  }

  test("single-column zOrderBy is exact range clustering: disjoint ranges, any file count") {
    val path = Files.createTempDirectory("zorder-1d-").toString
    // string key, hash-scattered over 20 files: before clustering every
    // file spans ~the whole key domain. The multi-dim curve path would
    // hash strings (spread, no locality); the single-axis path must
    // range-cluster the RAW column — this is also the layout remedy the
    // wide-IN advisory points at, and it must hold at 100k files, which
    // the 2^12-code quantile path cannot (≤4096 distinct file ranges)
    val rows = (0 until 2000).map(i => (f"doc-$i%04d", i.toLong))
    val t = LakeTable.create(spark, path,
      rows.toDF("k", "v").repartition(20, $"k"))
    assert(t.snapshot.files.size === 20)
    assert(t.read($"k" >= "doc-0100" && $"k" < "doc-0200")
      .inputFiles.length === 20, "hash-scattered: no range pruning")

    t.zOrderBy("k")
    val snap = t.snapshot
    assert(snap.files.size === 20, "clustering must keep the file count")
    // per-file [min, max] string ranges must be pairwise disjoint —
    // the property that makes the window binary-search prune by range
    val ranges = snap.files.map { f =>
      (f.stats.get.minValues("k"), f.stats.get.maxValues("k"))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"overlapping file ranges: $aMax vs $bMin")
      case _ => ()
    }
    val pruned = t.read($"k" >= "doc-0100" && $"k" < "doc-0200")
    assert(pruned.inputFiles.length <= 2,
      "a 5% key range must read ~1 of 20 clustered files")
    assert(pruned.count() === 100L)
    assert(t.toDF.count() === 2000L)
  }

  test("zOrderBy handles string dims and survives further appends") {
    val path = Files.createTempDirectory("zorder-s-").toString
    val rows = (0 until 500).map(i => (i.toLong, s"k${i % 7}", i * 1.0))
    val t = LakeTable.create(spark, path,
      rows.toDF("id", "k", "v").repartition(4))
    t.zOrderBy("id", "k")
    assert(t.toDF.count() === 500)
    t.append(Seq((9999L, "k0", 1.0)).toDF("id", "k", "v"))
    assert(t.toDF.count() === 501)
    assert(t.history.select("operation").as[String].collect()
      .contains("ZORDER BY"))
  }
}
