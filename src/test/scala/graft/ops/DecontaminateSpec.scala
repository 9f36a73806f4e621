package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** contaminationReport / decontaminate: n-gram overlap between a train
  * corpus and a benchmark set, inverted-index join, exact counts.
  */
class DecontaminateSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  // 3-grams of "a b c d e f g h" = 6; doc 20 shares exactly the first
  // 5 of doc 10's 3-grams ("a b c d e f g" → a b c, b c d, ..., e f g)
  private lazy val bench = Seq(
    (10L, "a b c d e f g h"),
    (11L, "p q r s t u v w")).toDF("doc_id", "text")

  private lazy val train = Seq(
    (1L, "x y z x2 y2 z2 x3 y3 z3"),        // clean
    (2L, "a b c d e f g h"),                // verbatim leak of bench 10
    (3L, "a b c d e f g zz"),               // shares 5 3-grams with bench 10
    (4L, "p q r s t u v w extra tail here") // superset leak of bench 11
  ).toDF("doc_id", "text")

  test("report finds verbatim and superset leaks at the right counts") {
    val rep = Dedup.contaminationReport(train, bench, "text", "doc_id",
      shingleN = 3, minOverlap = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rep === Set((2L, 10L, 6L), (4L, 11L, 6L)))
  }

  test("minOverlap bounds partial overlap in and out") {
    val at5 = Dedup.contaminationReport(train, bench, "text", "doc_id",
      shingleN = 3, minOverlap = 5)
      .select("train_id").collect().map(_.getLong(0)).toSet
    assert(at5 === Set(2L, 3L, 4L))
    val at7 = Dedup.contaminationReport(train, bench, "text", "doc_id",
      shingleN = 3, minOverlap = 7)
      .count()
    assert(at7 === 0L) // longest shared run is 6 3-grams
  }

  test("decontaminate drops exactly the contaminated train docs") {
    val kept = Dedup.decontaminate(train, bench, "text", "doc_id",
      shingleN = 3, minOverlap = 6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L))
  }

  test("clean corpora pass through untouched") {
    val kept = Dedup.decontaminate(
      train.where($"doc_id" === 1L), bench, "text", "doc_id")
    assert(kept.count() === 1L)
  }
}
