package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions._

/** The native ShingleHashes64 expression must be BIT-IDENTICAL to the
  * composed pipeline it replaces — every dedup oracle depends on it.
  * Composed reference: array_distinct(transform(shingles(c,n), xxhash64))
  * for shingles, transform(tokens(c), xxhash64) for per-token hashes.
  */
class ShingleHashParitySpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  // the historical composition (short-doc guard added — `sequence(1,0)`
  // descends and made the original undefined below n tokens)
  private def composedShingles(c: org.apache.spark.sql.Column, n: Int) =
    when(size(tokens(c)) < n, array().cast("array<bigint>"))
      .otherwise(array_distinct(transform(
        array_distinct(transform(
          sequence(lit(1), size(tokens(c)) - (n - 1)),
          i => array_join(slice(tokens(c), i, lit(n)), " "))),
        x => xxhash64(x))))

  private def composedTokenHashes(c: org.apache.spark.sql.Column) =
    transform(tokens(c), t => xxhash64(t))

  private val fixtures = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c a b c a b c", // repeats → distinct matters
    "  leading and   multiple   spaces ", // ws runs, trim
    "tabs\tand\nnewlines\rmixedws\fhere",
    "UPPER Case MiXeD", // lower() outside
    "unicode: café naïve 你好世界 tokens",
    "single",
    "two words",
    "exactly three words",
    "")

  test("shingle hashes match the composed pipeline bit-for-bit") {
    for (n <- Seq(1, 2, 3, 5); s <- fixtures) {
      val row = Seq(s).toDF("t")
        .select(shingleHashes(col("t"), n).as("fast"),
          composedShingles(col("t"), n).as("slow"))
        .head()
      assert(row.getSeq[Long](0) === row.getSeq[Long](1),
        s"n=$n text=${s.take(30)}")
    }
  }

  test("token hashes match the composed pipeline (order + duplicates)") {
    for (s <- fixtures) {
      val row = Seq(s).toDF("t")
        .select(tokenHashes(col("t")).as("fast"),
          composedTokenHashes(col("t")).as("slow"))
        .head()
      assert(row.getSeq[Long](0) === row.getSeq[Long](1), s.take(30))
    }
  }

  test("parity holds over the documents fixture corpus") {
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
    val bad = docs.select(
      shingleHashes(col("text"), 3).as("fast"),
      composedShingles(col("text"), 3).as("slow"))
      .where(not(col("fast") === col("slow")))
      .count()
    assert(bad === 0L)
  }

  test("random adversarial strings keep shingle/token-hash parity") {
    // supplementary chars, NBSP/U+2028 (NOT ASCII ws on either path),
    // control-ws runs, 300-char tokens — searched at random
    val alphabet = Seq(
      "a", "bb", "ccc", "é", "你", new String(Character.toChars(0x1F600)),
      " ", " ", "\t", "\n", "\f", "\r", ".", "x" * 300)
    val rnd = new scala.util.Random(9L)
    val docs = (1 to 150).map(_ =>
      Seq.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length)))
        .mkString)
    for (n <- Seq(1, 2, 3)) {
      val bad = docs.toDF("t").select(
        shingleHashes(col("t"), n).as("fs"),
        composedShingles(col("t"), n).as("ss"),
        tokenHashes(col("t")).as("ft"),
        composedTokenHashes(col("t")).as("st"))
        .where(not(col("fs") === col("ss")) || not(col("ft") === col("st")))
        .collect()
      assert(bad.isEmpty,
        s"n=$n: ${bad.length} divergent rows, first: ${bad.headOption}")
    }
  }
}
