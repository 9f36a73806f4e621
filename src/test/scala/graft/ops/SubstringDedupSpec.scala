package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Exact-substring (window-hash) dedup: any L-token span occurring at
  * more than one (doc, offset) keeps only its globally-first occurrence;
  * other occurrences lose their covered tokens. Spark-vs-DuckDB parity
  * for the generated SQL twin runs under the driver's oracle gate as
  * `d13_substring_dedup`; this spec pins the Spark semantics on the edge
  * cases the r3 advice called out (exact-duplicate doc → empty
  * clean_text, empty doc, doc shorter than the window).
  */
class SubstringDedupSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def run(window: Int, rows: (Long, String)*):
      Map[Long, (Int, Int, String)] =
    Dedup.substringDedup(rows.toDF("id", "text"), "id", "text", window)
      .as[(Long, Int, Int, String)].collect()
      .map { case (id, n, r, t) => id -> ((n, r, t)) }.toMap

  test("exact duplicate doc is fully covered and ends empty") {
    val out = run(3, 1L -> "a b c d", 2L -> "a b c d")
    assert(out(1L) === ((4, 0, "a b c d"))) // globally first: untouched
    assert(out(2L) === ((4, 4, "")))        // every token covered
  }

  test("empty doc and doc shorter than the window pass through") {
    val out = run(3, 1L -> "", 2L -> "x y", 3L -> "x y")
    assert(out(1L) === ((0, 0, "")))
    // 2-token docs have no 3-token window — even identical ones survive
    assert(out(2L) === ((2, 0, "x y")))
    assert(out(3L) === ((2, 0, "x y")))
  }

  test("boilerplate spliced into a unique doc loses only its span") {
    val out = run(3,
      1L -> "a b c",
      3L -> "u v a b c w")
    assert(out(1L) === ((3, 0, "a b c")))
    // "a b c" at (3, offset 2) duplicates (1, offset 0): positions 3,4,5
    assert(out(3L) === ((6, 3, "u v w")))
  }

  test("within-doc repeats keep the first occurrence only") {
    val out = run(3, 7L -> "m n m n m n")
    // "m n m" dups at offset 2 (covers 3..5), "n m n" at offset 3 (4..6)
    assert(out(7L) === ((6, 4, "m n")))
  }

  test("first occurrence is the min (id, offset) key, not input order") {
    val out = run(3,
      9L -> "p q r",
      4L -> "z p q r")
    // doc 4's window at offset 1 has key 4e9+1 < 9e9+0: doc 4 keeps it
    assert(out(4L) === ((4, 0, "z p q r")))
    assert(out(9L) === ((3, 3, "")))
  }

  test("multi-space and leading whitespace tokenize identically") {
    val out = run(3, 1L -> "  a  b   c d", 2L -> "a b c d")
    assert(out(1L) === ((4, 0, "a b c d")))
    assert(out(2L) === ((4, 4, "")))
  }
}
