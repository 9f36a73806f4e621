package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Direct model parity for the one-pass signature expressions. The LSH
  * pipelines' OUTPUTS are oracle-verified (d3v/d4v), but the signature
  * arithmetic itself had no independent reference — this pins
  * [[org.apache.spark.sql.graft.MinHashSignature]] (wrapping 64-bit
  * affine transform, mod Mersenne prime, null elements skipped like
  * array_min, all-null → all-null signature) and
  * [[org.apache.spark.sql.graft.SimHash64]] (majority bit vote,
  * strict >) against plain Scala models over random hash arrays
  * including nulls, empties, and extreme longs.
  */
class SignatureParitySpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private val P = TextFunctions.MINHASH_PRIME

  private def minhashModel(hs: Seq[Option[Long]], coeffs: Seq[(Long, Long)])
      : Seq[Option[Long]] = {
    val present = hs.flatten
    if (present.isEmpty) Seq.fill(coeffs.size)(None)
    else coeffs.map { case (a, b) =>
      Some(present.map { h0 =>
        val h = ((h0 % P) + P) % P
        val v = h * a + b // wrapping, like Spark's non-ANSI multiply
        ((v % P) + P) % P
      }.min)
    }
  }

  private def simhashModel(hs: Seq[Long]): Long = {
    val n = hs.size
    (0 until 64).foldLeft(0L) { (acc, j) =>
      val set = hs.count(h => ((h >>> j) & 1L) == 1L)
      if (2 * set > n) acc | (1L << j) else acc
    }
  }

  test("minhash signature matches the model over random arrays") {
    val rnd = new scala.util.Random(17L)
    val k = 12
    val seed = 42L
    // the same coefficient derivation minhashSignatureFromHashes uses
    val crnd = new scala.util.Random(seed)
    val coeffs = Seq.fill(k)((1L + crnd.nextLong(P - 1), crnd.nextLong(P)))

    val cases: Seq[Seq[Option[Long]]] =
      Seq(Seq.empty, Seq(None), Seq(None, None), Seq(Some(0L)),
        Seq(Some(Long.MinValue), Some(Long.MaxValue)),
        Seq(Some(-1L), None, Some(1L))) ++
        (1 to 60).map(_ => Seq.fill(1 + rnd.nextInt(20))(
          if (rnd.nextInt(8) == 0) None else Some(rnd.nextLong())))

    val df = cases.toDF("hs")
    val got = df.select(
      TextFunctions.minhashSignatureFromHashes(col("hs"), k, seed)).collect()
    got.zip(cases).foreach { case (row, hs) =>
      val expect = minhashModel(hs, coeffs)
      val sig =
        if (row.isNullAt(0)) fail(s"null signature for $hs")
        else row.getSeq[Any](0).map(Option(_).map(_.asInstanceOf[Long]))
      assert(sig === expect, s"input $hs")
    }
  }

  test("simhash64 matches the majority-vote model") {
    val rnd = new scala.util.Random(19L)
    val cases: Seq[Seq[Long]] =
      Seq(Seq.empty, Seq(0L), Seq(-1L), Seq(Long.MinValue, Long.MaxValue)) ++
        (1 to 60).map(_ => Seq.fill(1 + rnd.nextInt(25))(rnd.nextLong()))
    val df = cases.toDF("hs")
    val got = df.select(
      org.apache.spark.sql.graft.TextExpressions.simhash64(col("hs")))
      .as[Long].collect()
    got.zip(cases).foreach { case (g, hs) =>
      assert(g === simhashModel(hs), s"input ${hs.take(5)}...")
    }
  }
}
