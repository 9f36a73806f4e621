package graft.sql

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.lake.LakeTable

/** DSv2 catalog: SQL resolves lake tables natively, including VERSION AS
  * OF / TIMESTAMP AS OF and partition pruning through the catalog scan.
  */
class LakeCatalogSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("lake-wh-").toString
    spark.conf.set("spark.sql.catalog.lake",
      "org.apache.spark.sql.graft.LakeCatalog")
    spark.conf.set("spark.sql.catalog.lake.warehouse", w)
    Files.createDirectories(java.nio.file.Paths.get(s"$w/bronze"))
    val t = LakeTable.create(spark, s"$w/bronze/orders",
      Seq((1L, "CA", 10.0), (2L, "NY", 20.0), (3L, "CA", 30.0))
        .toDF("id", "state", "amount"),
      partitionBy = Seq("state"))
    t.append(Seq((4L, "TX", 40.0)).toDF("id", "state", "amount"))
    w
  }

  test("SELECT through the catalog") {
    warehouse
    val n = spark.sql("SELECT count(*) FROM lake.bronze.orders").as[Long].head()
    assert(n === 4)
    val ca = spark.sql(
      "SELECT id FROM lake.bronze.orders WHERE state = 'CA' ORDER BY id")
      .as[Long].collect()
    assert(ca.toSeq === Seq(1L, 3L))
  }

  test("VERSION AS OF time travel through SQL") {
    warehouse
    val v0 = spark.sql(
      "SELECT count(*) FROM lake.bronze.orders VERSION AS OF 0").as[Long].head()
    assert(v0 === 3)
  }

  test("SHOW TABLES lists lake tables") {
    warehouse
    val tables = spark.sql("SHOW TABLES IN lake.bronze")
      .select("tableName").as[String].collect()
    assert(tables.contains("orders"))
  }

  test("catalog scan prunes hive partitions") {
    warehouse
    val df = spark.sql("SELECT id FROM lake.bronze.orders WHERE state = 'NY'")
    // DSv2 BatchScan applies partition filters at the scan (inputFiles
    // reports the unpruned index, so assert on the plan)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters") && plan.contains("= NY"))
    assert(df.as[Long].collect().toSeq === Seq(2L))
  }

  test("snapshot isolation: DML after catalog registration is visible") {
    warehouse
    val t = LakeTable.forPath(spark, s"$warehouse/bronze/orders")
    t.delete($"id" === 4L)
    assert(spark.sql("SELECT count(*) FROM lake.bronze.orders").as[Long].head() === 3)
    // and the pre-delete version still reads 4 via time travel
    val vPrev = t.version - 1
    assert(spark.sql(
      s"SELECT count(*) FROM lake.bronze.orders VERSION AS OF $vPrev")
      .as[Long].head() === 4)
  }
}
