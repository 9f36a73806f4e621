package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions._

/** simhashPairsVerified: complete multi-block banding (pigeonhole) +
  * exact-Jaccard verification. Ground truth is the brute-force crossJoin
  * over (hamming, jaccard) — the verified operator must reproduce it
  * EXACTLY, including the pairs the single-prefix heuristic drops when
  * leading signature bits differ.
  */
class SimhashCompleteSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  /** Deterministic corpus: 40 base docs of seeded word soup, every 4th
    * doc near-duplicated with a short tail. */
  private lazy val docs = {
    val rnd = new scala.util.Random(42)
    val vocab = Vector.tabulate(500)(i => s"w${i}x${rnd.nextInt(1000)}")
    val base = (0 until 40).map { i =>
      (i.toLong, Seq.fill(60)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val dups = base.filter(_._1 % 4 == 0).map { case (id, t) =>
      (id + 1000L, t + " tiny tail extra")
    }
    (base ++ dups).toDF("doc_id", "text")
  }

  private val MAXH = 6

  private lazy val truth = {
    val sigs = docs
      .withColumn("__hs", tokenHashes(col("text")))
      .withColumn("sig",
        org.apache.spark.sql.graft.TextExpressions.simhash64(col("__hs")))
      .select(col("doc_id"), col("sig"))
    val a = sigs.select(col("doc_id").as("id_a"), col("sig").as("sa"))
    val b = sigs.select(col("doc_id").as("id_b"), col("sig").as("sb"))
    val withinRadius = a.crossJoin(b).where(col("id_a") < col("id_b"))
      .where(hamming64(col("sa"), col("sb")) <= MAXH)
      .select("id_a", "id_b")
    Dedup.ngramJaccardPairs(docs, "text", "doc_id", shingleN = 3, threshold = 0.2)
      .join(withinRadius, Seq("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("verified pairs == brute-force (hamming <= r) ∩ (jaccard >= t)") {
    val got = Dedup.simhashPairsVerified(docs, "text", "doc_id",
      maxHamming = MAXH, shingleN = 3, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(truth.nonEmpty, "fixture must produce near-dup pairs")
    assert(got === truth)
  }

  test("every injected near-dup pair is found (recall 1.0 within radius)") {
    val got = Dedup.simhashPairsVerified(docs, "text", "doc_id",
      maxHamming = MAXH, shingleN = 3, threshold = 0.2)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val injected = truth.map(t => (t._1, t._2))
    assert(injected.subsetOf(got))
  }

  test("block widths cover all 64 bits for awkward radii") {
    // radii where 64 % (r+1) != 0 exercise the uneven block split
    for (r <- Seq(0, 2, 6, 9, 13)) {
      val out = Dedup.simhashPairsVerified(docs, "text", "doc_id",
        maxHamming = r, shingleN = 3, threshold = 0.2)
      assert(out.columns.toSeq === Seq("id_a", "id_b", "jaccard"))
      assert(out.count() >= 0)
    }
  }
}
