package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import org.apache.spark.sql.graft.VectorExpressions

/** Direct model parity for the native vector expressions. The ANN
  * oracles (sim1/sim2v/sim3v) pin them transitively on well-formed unit
  * vectors; this pins the expression arithmetic itself on the edges the
  * corpus never produces — NaN/Infinity components, zero vectors
  * (0/0 → NaN propagation), ragged lengths (min-length contract), and
  * empty arrays — against plain Scala models evaluating the same
  * operations in the same order.
  */
class VectorParitySpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def bits(d: Double) = java.lang.Double.doubleToLongBits(d)

  test("dot product matches the model, min-length, NaN/Inf propagating") {
    val rnd = new scala.util.Random(23L)
    val cases: Seq[(Seq[Double], Seq[Double])] =
      Seq(
        (Seq.empty, Seq.empty),
        (Seq(1.0), Seq.empty),                       // ragged → 0.0
        (Seq(1.0, 2.0), Seq(3.0)),                   // min-length
        (Seq(Double.NaN, 1.0), Seq(1.0, 1.0)),
        (Seq(Double.PositiveInfinity), Seq(0.0)),    // Inf * 0 = NaN
        (Seq(Double.MaxValue, Double.MaxValue), Seq(2.0, 2.0))) ++
        (1 to 50).map { _ =>
          val n = rnd.nextInt(6)
          val m = rnd.nextInt(6)
          (Seq.fill(n)(rnd.nextDouble() * 100 - 50),
            Seq.fill(m)(rnd.nextDouble() * 100 - 50))
        }
    def model(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0
      var i = 0
      val n = math.min(a.size, b.size)
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }
    val got = cases.toDF("a", "b")
      .select(VectorExpressions.dotD(col("a"), col("b"))).as[Double].collect()
    got.zip(cases).foreach { case (g, (a, b)) =>
      assert(bits(g) === bits(model(a, b)), s"dot($a, $b)")
    }
  }

  test("normalize matches the model bit-for-bit (zero vector → NaN)") {
    val rnd = new scala.util.Random(29L)
    val cases: Seq[Seq[Double]] =
      Seq(Seq.empty, Seq(0.0), Seq(0.0, 0.0), Seq(3.0, 4.0),
        Seq(Double.NaN, 1.0), Seq(Double.PositiveInfinity, 1.0)) ++
        (1 to 40).map(_ => Seq.fill(1 + rnd.nextInt(8))(
          rnd.nextDouble() * 20 - 10))
    def model(v: Seq[Double]): Seq[Double] = {
      var s = 0.0
      v.foreach(x => s += x * x)
      val norm = math.sqrt(s)
      v.map(_ / norm)
    }
    val got = cases.toDF("v")
      .select(VectorExpressions.normalizeD(col("v"))).collect()
    got.zip(cases).foreach { case (row, v) =>
      val g = row.getSeq[Double](0)
      val want = model(v)
      assert(g.size === want.size, s"normalize($v) size")
      g.zip(want).foreach { case (x, y) =>
        assert(bits(x) === bits(y), s"normalize($v): $x vs $y")
      }
    }
  }

  test("nearest centroids match an argmax model with the tie rule") {
    val rnd = new scala.util.Random(31L)
    val dim = 4
    val nLists = 6
    val cents = Array.fill(nLists * dim)(rnd.nextDouble() * 2 - 1)
    def model(v: Seq[Double], nProbe: Int): Seq[Int] = {
      val dots = (0 until nLists).map { c =>
        (0 until math.min(v.size, dim)).map(i => v(i) * cents(c * dim + i)).sum
      }
      // best first; ties broken by LOWER id (stable selection)
      val taken = scala.collection.mutable.Set[Int]()
      (1 to nProbe).map { _ =>
        val best = (0 until nLists).filterNot(taken)
          .maxBy(c => (dots(c), -c))
        taken += best
        best
      }
    }
    val cases = (1 to 40).map(_ =>
      Seq.fill(if (rnd.nextBoolean()) dim else rnd.nextInt(dim) + 1)(
        rnd.nextDouble() * 2 - 1))
    for (nProbe <- Seq(1, 3)) {
      val got = cases.toDF("v")
        .select(VectorExpressions.nearestCentroids(col("v"), cents, dim, nProbe))
        .collect()
      got.zip(cases).foreach { case (row, v) =>
        assert(row.getSeq[Int](0) === model(v, nProbe), s"probe($v, $nProbe)")
      }
    }
  }
}
