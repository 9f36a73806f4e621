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
