package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.lake.LakeTable

class SqlSurfaceSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("database + CTAS + INSERT INTO + SHOW (L9/K4/K8)") {
    SqlSurface.createDatabase(spark, "graft_test_db")
    assert(spark.sql("SHOW DATABASES").as[String].collect()
      .contains("graft_test_db"))
    spark.sql("DROP TABLE IF EXISTS loans")
    SqlSurface.ctas(spark, "loans",
      "SELECT 'CA' AS addr_state, CAST(100.0 AS DOUBLE) AS amount")
    SqlSurface.insertValues(spark, "loans", "('NY', 50.0), ('CA', 25.0)")
    val byState = spark.sql(
      "SELECT addr_state, sum(amount) AS s FROM loans GROUP BY 1 ORDER BY 1")
      .as[(String, Double)].collect()
    assert(byState.toSeq === Seq(("CA", 125.0), ("NY", 50.0)))
    spark.sql("DROP TABLE loans")
    spark.sql("USE default")
    spark.sql("DROP DATABASE graft_test_db")
  }

  test("saveAsTable with explicit path (K5)") {
    val dir = Files.createTempDirectory("saveas-").toString
    spark.sql("DROP TABLE IF EXISTS ext_t")
    SqlSurface.saveAsExternalTable(
      Seq((1, "a"), (2, "b")).toDF("id", "v"), "ext_t", s"$dir/ext_t")
    assert(spark.sql("SELECT count(*) FROM ext_t").as[Long].head() === 2)
    // data really lives at the path
    assert(spark.read.parquet(s"$dir/ext_t").count() === 2)
    spark.sql("DROP TABLE ext_t")
  }

  test("parquet direct-path scan (S3)") {
    val dir = Files.createTempDirectory("scan-").toString
    Seq((1, "x")).toDF("id", "v").write.parquet(s"$dir/t")
    assert(SqlSurface.scanParquetPath(spark, s"$dir/t").count() === 1)
  }

  test("lake table registered as SQL view, incl. time travel") {
    val dir = Files.createTempDirectory("lakeview-").toString
    val t = LakeTable.create(spark, s"$dir/t",
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.append(Seq((3L, "c")).toDF("id", "v"))

    SqlSurface.registerLakeTable(spark, "lake_now", s"$dir/t")
    SqlSurface.registerLakeTable(spark, "lake_v0", s"$dir/t", asOf = Some(0L))
    assert(spark.sql("SELECT count(*) FROM lake_now").as[Long].head() === 3)
    assert(spark.sql("SELECT count(*) FROM lake_v0").as[Long].head() === 2)
    // SQL over the view composes with the rest of the surface
    assert(spark.sql(
      "SELECT v FROM lake_now WHERE id = 3").as[String].head() === "c")
  }

  test("bucketed tables join without exchange (co-located join)") {
    val dir = Files.createTempDirectory("bucketed-").toString
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select($"l_orderkey", $"l_quantity")
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select($"o_orderkey", $"o_totalprice")
    spark.sql("DROP TABLE IF EXISTS b_li"); spark.sql("DROP TABLE IF EXISTS b_ord")
    SqlSurface.saveBucketed(li, "b_li", s"$dir/li", "l_orderkey", 8)
    SqlSurface.saveBucketed(ord, "b_ord", s"$dir/ord", "o_orderkey", 8)

    val joined = spark.sql("""
      SELECT /*+ MERGE(b_ord) */ count(*) AS n
      FROM b_li JOIN b_ord ON l_orderkey = o_orderkey""")
    val plan = joined.queryExecution.executedPlan.toString
    // bucket alignment: the sort-merge join needs NO shuffle on either side
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in bucketed join plan:\n$plan")
    assert(joined.as[Long].head() === li.count())
    spark.sql("DROP TABLE b_li"); spark.sql("DROP TABLE b_ord")
  }
}
