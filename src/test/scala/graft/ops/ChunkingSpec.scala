package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Chunking.chunkByWords]]: coverage (every token in ≥1 chunk), overlap
  * width, tail handling, and the shuffle-free plan.
  */
class ChunkingSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def doc(n: Int) = Seq((1L, (1 to n).map(i => s"w$i").mkString(" ")))
    .toDF("doc_id", "text")

  private def chunks(n: Int, c: Int, s: Int) =
    Chunking.chunkByWords(doc(n), "doc_id", "text", c, s)
      .orderBy("chunk_start")
      .as[(Long, Int, Int, String)].collect().toSeq

  test("windows overlap by chunk-stride; every token covered exactly") {
    val got = chunks(10, 8, 4)
    assert(got.map(r => (r._2, r._4)) === Seq(
      0 -> (1 to 8).map("w" + _).mkString(" "),
      4 -> (5 to 10).map("w" + _).mkString(" ")))
    // a start-8 tail ([w9 w10] ⊂ chunk at 4) must NOT appear
    assert(got.map(_._2) === Seq(0, 4))
    // coverage: union of chunk tokens == all tokens
    val covered = got.flatMap(_._4.split(" ")).toSet
    assert(covered === (1 to 10).map("w" + _).toSet)
  }

  test("short doc yields one chunk; empty text yields none") {
    assert(chunks(3, 8, 4) === Seq((1L, 0, 3, "w1 w2 w3")))
    val empty = Chunking.chunkByWords(
      Seq((1L, "   ")).toDF("doc_id", "text"), "doc_id", "text", 8, 4)
    assert(empty.count() === 0)
  }

  test("non-overlapping stride == chunk partitions the doc") {
    val got = chunks(10, 4, 4)
    assert(got.map(_._2) === Seq(0, 4, 8))
    assert(got.map(_._3) === Seq(4, 4, 2))
    assert(got.flatMap(_._4.split(" ")) === (1 to 10).map("w" + _))
  }

  test("map-side only: no exchange in the plan") {
    val plan = Chunking.chunkByWords(doc(50), "doc_id", "text", 8, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
