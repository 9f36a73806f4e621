package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** CCNet-style paragraph dedup: global first-occurrence-wins on exact
  * paragraph text, reassembly in document order.
  */
class ParagraphDedupSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def run(rows: (Long, String)*): Map[Long, String] =
    Dedup.paragraphDedup(rows.toDF("id", "text"), "text", "id")
      .as[(Long, String)].collect().toMap

  test("shared boilerplate survives only in its first occurrence") {
    val out = run(
      1L -> "alpha\nBOILER\nbeta",
      2L -> "gamma\nBOILER\ndelta",
      3L -> "BOILER\nepsilon")
    assert(out(1L) === "alpha\nBOILER\nbeta")
    assert(out(2L) === "gamma\ndelta")
    assert(out(3L) === "epsilon")
  }

  test("within-doc repeats keep only the first position") {
    val out = run(4L -> "x\ny\nx\nz\ny")
    assert(out(4L) === "x\ny\nz")
  }

  test("a doc whose every paragraph was seen before disappears") {
    val out = run(
      1L -> "a\nb",
      2L -> "a\nb") // exact copy — both paragraphs are dups
    assert(out === Map(1L -> "a\nb"))
  }

  test("first occurrence is by (id, position), not input order") {
    // 'p' appears at (1, pos 1) and (2, pos 0): doc 1 wins
    val out = run(
      2L -> "p\nq",
      1L -> "r\np")
    assert(out(1L) === "r\np")
    assert(out(2L) === "q")
  }

  test("unique paragraphs pass through untouched") {
    val out = run(5L -> "one\ntwo\nthree", 6L -> "four")
    assert(out(5L) === "one\ntwo\nthree")
    assert(out(6L) === "four")
  }

  test("incremental: batch paragraphs scrub against the corpus") {
    val corpus = Seq(
      1L -> "alpha\nBOILER",
      2L -> "beta").toDF("id", "text")
    val batch = Seq(
      10L -> "gamma\nBOILER\ndelta", // BOILER known to the corpus
      11L -> "alpha\nbeta",          // both paragraphs known
      12L -> "epsilon\nzeta\nepsilon") // within-batch repeat
      .toDF("id", "text")
    val out = Dedup.paragraphDedupAgainstCorpus(
      batch, corpus, "text", "id", expectedCorpusItems = 100L)
      .as[(Long, String)].collect().toMap
    assert(out(10L) === "gamma\ndelta")
    assert(!out.contains(11L)) // fully deduped → dropped
    assert(out(12L) === "epsilon\nzeta")
  }

  test("incremental equals batch dedup restricted to the new docs") {
    // running corpus+batch through the global dedup and keeping only
    // batch ids must equal the incremental result (corpus ids < batch)
    val corpus = Seq(1L -> "a\nb", 2L -> "c").toDF("id", "text")
    val batch = Seq(10L -> "b\nd", 11L -> "e\na\ne").toDF("id", "text")
    val global = Dedup.paragraphDedup(
        corpus.unionByName(batch), "text", "id")
      .as[(Long, String)].collect().toMap.filter(_._1 >= 10L)
    val inc = Dedup.paragraphDedupAgainstCorpus(
        batch, corpus, "text", "id", expectedCorpusItems = 100L)
      .as[(Long, String)].collect().toMap
    assert(inc === global)
  }
}
