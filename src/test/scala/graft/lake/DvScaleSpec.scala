package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The DML scale contract: deletion-vector construction happens on
  * executors, and the driver receives one bitmap blob per affected FILE —
  * never a row per matched target row. A DELETE/MERGE claiming 40% of a
  * 100 TB table must collect O(files), not O(rows); these specs pin that
  * with a large-fraction DML over a multi-file table and assert the
  * identity job's driver-side row count via [[DmlMetrics]].
  */
class DvScaleSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("dvscale-").toString

  test("large-fraction DELETE collects O(files) identity rows, not O(rows)") {
    val path = tmp()
    val t = LakeTable.create(spark, path,
      spark.range(20000).select($"id", ($"id" % 7).as("v")).repartition(4))
    val nFiles = t.snapshot.files.size
    assert(nFiles >= 2)

    DmlMetrics.lastIdentityRowsCollected.set(-1L)
    val deleted = t.delete($"id" % 5 < 2) // 40% of every file → DV path
    assert(deleted === 8000L)
    val collected = DmlMetrics.lastIdentityRowsCollected.get()
    assert(collected >= 1L && collected <= nFiles.toLong,
      s"DELETE identity job returned $collected rows to the driver for " +
        s"$nFiles files — per-row collection would be 8000")
    assert(t.toDF.count() === 12000)
    assert(t.snapshot.files.forall(f => f.dvPath.isDefined || f.dvInline.isDefined))
  }

  test("large-fraction MERGE collects O(files) claim rows, not O(rows)") {
    val path = tmp()
    val t = LakeTable.create(spark, path,
      spark.range(20000).select($"id", lit(0.0).as("v")).repartition(4))
    val nFiles = t.snapshot.files.size

    DmlMetrics.lastIdentityRowsCollected.set(-1L)
    // update 40% of rows + insert 100 new: DV path claims 8000 old versions
    val source = spark.range(20000)
      .where($"id" % 5 < 2).select($"id", lit(1.0).as("v"))
      .union(spark.range(20000, 20100).select($"id", lit(2.0).as("v")))
    t.merge(source, expr("t.id = s.id"))
    val collected = DmlMetrics.lastIdentityRowsCollected.get()
    assert(collected >= 1L && collected <= nFiles.toLong,
      s"MERGE identity job returned $collected rows to the driver for " +
        s"$nFiles files — per-row collection would be 8000")
    assert(t.toDF.count() === 20100)
    assert(t.toDF.where($"v" === 1.0).count() === 8000)
    assert(t.toDF.where($"v" === 2.0).count() === 100)
  }

  test("large UPDATE through DVs collects O(files)") {
    val path = tmp()
    val t = LakeTable.create(spark, path,
      spark.range(10000).select($"id", lit(0.0).as("v")).repartition(2))
    val nFiles = t.snapshot.files.size

    DmlMetrics.lastIdentityRowsCollected.set(-1L)
    t.update($"id" % 3 === 0, Map("v" -> lit(4.0)))
    val collected = DmlMetrics.lastIdentityRowsCollected.get()
    assert(collected >= 1L && collected <= nFiles.toLong)
    assert(t.toDF.where($"v" === 4.0).count() === 3334)
  }
}
