package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.tables.Tables

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  test("salted join equals plain join on skewed key") {
    val li = Tables.lineitem(spark, sf).select(col("l_suppkey").as("k"), col("l_quantity"))
    val sup = Tables.supplier(spark, sf).select(col("s_suppkey").as("k"), col("s_name"))
    val plain = li.join(sup, Seq("k")).groupBy("k").count()
    val salted = Skew.saltedJoin(li, sup, "k", saltFactor = 4).groupBy("k").count()
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("left join keeps unmatched left rows") {
    import spark.implicits._
    val l = Seq((1, "a"), (2, "b"), (99, "orphan")).toDF("k", "lv")
    val r = Seq((1, "x"), (2, "y")).toDF("k", "rv")
    val out = Skew.saltedJoin(l, r, "k", saltFactor = 3, joinType = "left")
    assert(out.count() === 3)
    assert(out.where($"k" === 99 && $"rv".isNull).count() === 1)
  }

  test("the bare semi/anti aliases are accepted (left-preserving)") {
    import spark.implicits._
    val l = Seq((1, "a"), (2, "b"), (99, "orphan")).toDF("k", "lv")
    val r = Seq((1, "x"), (2, "y")).toDF("k", "rv")
    // Spark accepts "semi"/"anti" as spellings of leftsemi/leftanti;
    // both are left-preserving, so the salted form is sound (ADVICE r5)
    assert(Skew.saltedJoin(l, r, "k", saltFactor = 3, joinType = "semi")
      .select("k").as[Int].collect().sorted === Array(1, 2))
    assert(Skew.saltedJoin(l, r, "k", saltFactor = 3, joinType = "anti")
      .select("k").as[Int].collect() === Array(99))
  }

  test("right/full outer joins are rejected (replicated right side)") {
    import spark.implicits._
    val l = Seq((1, "a")).toDF("k", "lv")
    val r = Seq((1, "x"), (9, "unmatched")).toDF("k", "rv")
    // an unmatched right row would come back once PER SALT value
    for (jt <- Seq("right", "full", "full_outer")) {
      val e = intercept[IllegalArgumentException] {
        Skew.saltedJoin(l, r, "k", saltFactor = 3, joinType = jt)
      }
      assert(e.getMessage.contains("duplicate"), s"join type $jt")
    }
  }
}
