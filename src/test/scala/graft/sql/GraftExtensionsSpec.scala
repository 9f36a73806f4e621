package graft.sql

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  test("native expressions callable from SQL after registration") {
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    Seq((Seq(1L, 2L, 3L), Seq(1.0, 2.0), Seq(3.0, 4.0)))
      .toDF("hs", "a", "b").createOrReplaceTempView("ext_t")
    val row = spark.sql(
      "SELECT simhash64(hs) AS sh, dot_product_d(a, b) AS dp FROM ext_t").head()
    assert(row.getLong(0) === spark.sql(
      "SELECT simhash64(array(1L, 2L, 3L))").head().getLong(0))
    assert(row.getDouble(1) === 11.0)
  }
}
