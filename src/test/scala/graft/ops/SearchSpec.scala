package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BM25 retrieval ([[Search]]): ranking properties on a constructed
  * corpus (exact values are oracle-gated in t7_bm25_search).
  */
class SearchSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def corpus = Seq(
    (1L, "cat cat cat dog"),          // high tf for cat
    (2L, "cat dog bird fish"),        // one of each
    (3L, "dog dog dog dog"),          // no cat
    (4L, "cat"),                      // short doc, one cat
    (5L, "bird fish fish bird fish"), // neither
    (6L, "zebra cat " + Seq.fill(50)("filler").mkString(" ")) // long doc
  ).toDF("doc_id", "text")

  test("postings carry tf and doc length; empty docs drop") {
    val p = Search.postings(corpus.unionByName(
      Seq((7L, "   ")).toDF("doc_id", "text")), "text", "doc_id")
    assert(p.where($"doc_id" === 7).count() === 0)
    val r = p.where($"doc_id" === 1 && $"term" === "cat").collect().head
    assert(r.getAs[Long]("tf") === 3 && r.getAs[Int]("doc_len") === 4)
  }

  test("repeated terms in short docs outrank diluted mentions") {
    val ranked = Search.bm25(corpus, "text", "doc_id", Seq("cat"))
      .select("doc_id").as[Long].collect().toSeq
    // docs without the term never appear
    assert(!ranked.contains(3L) && !ranked.contains(5L))
    // tf=3 in a 4-token doc beats tf=1 docs; the 52-token doc ranks last
    assert(ranked.head === 1L)
    assert(ranked.last === 6L)
  }

  test("rare terms dominate common ones in multi-term queries") {
    // "zebra" is rare, "dog" is common — a short zebra-heavy doc must
    // outrank every dog-only doc on the combined query
    val c2 = corpus.unionByName(Seq((7L, "zebra zebra dog"))
      .toDF("doc_id", "text"))
    val ranked = Search.bm25(c2, "text", "doc_id", Seq("zebra", "dog"))
      .select("doc_id").as[Long].collect().toSeq
    assert(ranked.head === 7L, s"got $ranked")
  }

  test("query terms are case-insensitive and deduplicated") {
    val a = Search.bm25(corpus, "text", "doc_id", Seq("CAT", "cat"))
      .collect().toSeq
    val b = Search.bm25(corpus, "text", "doc_id", Seq("cat")).collect().toSeq
    assert(a === b)
  }
}
