package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Data skipping under negated predicates: `Some(false)` must mean
  * "provably no row matches". A naive `Not(inner) => !inner` flip is
  * unsound — the inner verdict is "might match", and negating it skips
  * files that DO contain matching rows. These specs pin the sound
  * behavior on both the read path and DML candidate selection.
  */
class SkippingNegationSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def freshTable(): LakeTable = {
    val dir = Files.createTempDirectory("skip-not-").toString
    // two files: [1..5] and [6..10]
    val df = spark.range(1, 11).select($"id".as("x"))
      .repartitionByRange(2, $"x")
    LakeTable.create(spark, s"$dir/t", df)
  }

  test("read with NOT(x > 7) returns every qualifying row") {
    val t = freshTable()
    val got = t.read(!(col("x") > 7)).as[Long].collect().toSet
    assert(got === (1L to 7L).toSet)
  }

  test("read with x =!= 5 (Not(EqualTo)) returns every qualifying row") {
    val t = freshTable()
    val got = t.read(col("x") =!= 5).as[Long].collect().toSet
    assert(got === ((1L to 10L).toSet - 5L))
  }

  test("delete with NOT(x > 7) deletes from files the naive flip skips") {
    val t = freshTable()
    t.delete(!(col("x") > 7))
    val left = t.toDF.as[Long].collect().toSet
    assert(left === Set(8L, 9L, 10L))
  }

  test("NOT over a provably-all-matching file still skips correctly") {
    val t = freshTable()
    // x <= 20 holds for every row; NOT(x <= 20) matches nothing —
    // both files are provably skippable and the result is empty
    assert(t.read(!(col("x") <= 20)).isEmpty)
  }
}
