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

  /** Plan-shape guard for the round-5 interval-form cover (VERDICT r4
    * #3): the ONLY Generate (explode) nodes in the physical plan are the
    * window-occurrence streams (`sequence(0, size(w)-L)` → `__s`) — the
    * algorithm's input, paid once per corpus token per pass. A
    * reintroduced ×L covered-position explode (one row per covered
    * token of every duplicated occurrence, growing with the corpus'
    * boilerplate share) would add a Generate with a different output
    * and fail here.
    */
  test("plan: every Generate is the window stream, never the cover") {
    val df = Seq(1L -> "a b c d e", 2L -> "a b c d x").toDF("id", "text")
    // sparkPlan, not executedPlan: AQE wraps the tree in an adaptive
    // node whose inner stages aren't visible to collect() before run
    val plan = Dedup.substringDedup(df, "id", "text", 3)
      .queryExecution.sparkPlan
    val gens = plan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }
    assert(gens.nonEmpty, "window stream must be a Generate")
    gens.foreach { g =>
      val outs = g.generatorOutput.map(_.name)
      assert(outs == Seq("__s"),
        s"unexpected Generate output $outs — cover explode reintroduced?")
    }
  }

  /** Model check for the round-5 INTERVAL-form cover (sorted starts →
    * disjoint-slice expansion): tiny vocab + short docs force dense
    * overlapping duplicate windows — exactly the regime where an
    * interval-merge off-by-one (slice bounds, adjacent-interval seams,
    * within-doc overlaps) would diverge from the per-position model.
    */
  for (seed <- 1L to 8L) {
    test(s"interval cover == per-position brute-force model (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val L = 2 + rnd.nextInt(3) // windows of 2..4 tokens
      val vocab = Vector("a", "b", "c")
      val docs = (1L to (3 + rnd.nextInt(4)).toLong).map { id =>
        id -> Vector.fill(rnd.nextInt(13))(vocab(rnd.nextInt(vocab.size)))
      }

      // reference model: materialize every window occurrence, find each
      // window text's first (id, offset), mark the L positions of every
      // other occurrence
      val occs = for {
        (id, toks) <- docs
        s <- 0 to toks.size - L
        if toks.size >= L
      } yield (toks.slice(s, s + L).mkString(" "), id, s)
      val first = occs.groupBy(_._1)
        .map { case (w, os) => w -> os.map(o => o._2 * 1000000000L + o._3).min }
      val expected = docs.map { case (id, toks) =>
        val cov = occs.collect {
          case (w, `id`, s) if first(w) != id * 1000000000L + s =>
            (s + 1) to (s + L)
        }.flatten.toSet
        val keptToks = toks.zipWithIndex.collect {
          case (t, i) if !cov.contains(i + 1) => t
        }
        id -> ((toks.size, cov.size, keptToks.mkString(" ")))
      }.toMap

      val out = run(L, docs.map { case (id, toks) =>
        id -> toks.mkString(" ") }: _*)
      assert(out === expected, s"L=$L docs=$docs")
    }
  }
}
