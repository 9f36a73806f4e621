package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

/** The UDAF must agree exactly with the window-function formulation on
  * real data (harness orders at sf0.001): same rows, k-bounded.
  */
class TopKAggregatorSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("top-3 orders per customer: aggregator == window row_number") {
    val orders = Tables.orders(spark, sf)
    val topkUdaf = udaf(new TopKAggregator(3))

    val viaAgg = orders
      .select(col("o_custkey"),
        struct(col("o_orderkey").as("id"), col("o_totalprice").as("score")).as("s"))
      .groupBy("o_custkey")
      .agg(topkUdaf(col("s.id"), col("s.score")).as("top"))
      .select(col("o_custkey"), explode(col("top")).as("t"))
      .select(col("o_custkey"), col("t.id").as("o_orderkey"))

    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"))

    assert(viaAgg.exceptAll(viaWindow).count() === 0)
    assert(viaWindow.exceptAll(viaAgg).count() === 0)
  }

  test("buffer never exceeds k and output is sorted desc") {
    val topkUdaf = udaf(new TopKAggregator(2))
    val df = Seq((1L, 1L, 5.0), (1L, 2L, 9.0), (1L, 3L, 7.0), (1L, 4L, 9.0))
      .toDF("g", "id", "score")
    val out = df.groupBy("g")
      .agg(topkUdaf(col("id"), col("score")).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.id"), col("t.score")).as[(Long, Double)].collect()
    // ties broken by id asc: (2, 9.0) before (4, 9.0)
    assert(out.toSeq === Seq((2L, 9.0), (4L, 9.0)))
  }
}
