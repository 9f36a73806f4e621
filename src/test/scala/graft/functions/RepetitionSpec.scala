package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions._

/** repetitionRatio: 1 − distinct/total token n-grams (Gopher-style
  * intra-doc repetition rule). */
class RepetitionSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def ratio(text: String, n: Int): Double =
    Seq(text).toDF("t").select(repetitionRatio(col("t"), n)).head().getDouble(0)

  test("no repetition → 0; full repetition → high; short docs → 0") {
    assert(ratio("a b c d e f", 3) === 0.0)
    // "a b a b a b a b" 2-grams: ab ba ab ba ab ba ab → 7 total, 2 distinct
    assert(math.abs(ratio("a b a b a b a b", 2) - (1.0 - 2.0 / 7.0)) < 1e-12)
    assert(ratio("a b", 3) === 0.0) // shorter than n
    assert(ratio("", 3) === 0.0)
  }

  test("doubling a document roughly halves the distinct fraction") {
    val doc = (1 to 40).map(i => s"w$i").mkString(" ")
    assert(ratio(doc, 3) === 0.0)
    val doubled = doc + " " + doc
    // 80 tokens → 78 3-grams; distinct = 38 originals + 2 spanning the
    // boundary = 40 → ratio = 1 - 40/78
    assert(math.abs(ratio(doubled, 3) - (1.0 - 40.0 / 78.0)) < 1e-12)
  }
}
