package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions._

/** The native TokenStats expression must agree EXACTLY with the HOF
  * composition it replaced — tokenCount / stopwordCount / langId /
  * qualityScore feed the oracle queries and the curation pipeline.
  * Composed references reproduced here verbatim from the old
  * implementations.
  */
class TokenStatsParitySpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def composedTokenCount(c: org.apache.spark.sql.Column) =
    size(tokens(c)).cast("int")

  private def composedStopwordCount(c: org.apache.spark.sql.Column) = {
    val all = stopwords.flatMap(_._2).distinct
    size(filter(tokens(c), t => t.isInCollection(all))).cast("int")
  }

  private def composedLangId(c: org.apache.spark.sql.Column) = {
    val toks = tokens(c)
    def hits(words: Seq[String]) =
      size(filter(toks, t => t.isInCollection(words)))
    val scores = stopwords.map { case (lang, words) => lang -> hits(words) }
    val maxScore = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val chain = scores.tail.foldLeft(
      when(scores.head._2 === maxScore && maxScore > 0, lit(scores.head._1))) {
      case (acc, (lang, s)) => acc.when(s === maxScore && maxScore > 0, lit(lang))
    }
    chain.otherwise(lit("und"))
  }

  private def composedDistinct(c: org.apache.spark.sql.Column) =
    size(array_distinct(tokens(c))).cast("int")

  private val fixtures = Seq(
    "the quick brown fox and the lazy dog", // en hits
    "el perro y la casa de que un una los por", // es hits
    "de de de", // shared word: es and zh tie → es (earlier list)
    "le la les et pour dans", // fr
    "der die das und ist von", // de
    "no stopwords whatsoever here",
    "a b c a b c a b c", // repeats → distinct matters
    "  leading and   multiple   spaces ",
    "tabs\tand\nnewlines\rmixedws\fhere",
    "UPPER The AND of MiXeD", // lower() applies before matching
    "unicode: café naïve 你好世界 the tokens",
    "single",
    "")

  test("token count, distinct count, stopword hits, language match the HOF composition") {
    val df = fixtures.toDF("t")
    val rows = df.select(
      tokenCount($"t"), composedTokenCount($"t"),
      stopwordCount($"t"), composedStopwordCount($"t"),
      langId($"t"), composedLangId($"t"),
      composedDistinct($"t"),
      org.apache.spark.sql.graft.TextExpressions
        .tokenStats(trim(lower($"t")), stopwords).getField("n_distinct"))
      .collect()
    rows.zip(fixtures).foreach { case (r, s) =>
      assert(r.getInt(0) === r.getInt(1), s"tokenCount: '$s'")
      assert(r.getInt(2) === r.getInt(3), s"stopwordCount: '$s'")
      assert(r.getString(4) === r.getString(5), s"langId: '$s'")
      assert(r.getInt(7) === r.getInt(6), s"distinct: '$s'")
    }
  }

  test("qualityScore is bit-identical to the composed formula") {
    val composed = {
      val c = $"t"
      val nt = composedTokenCount(c).cast("double")
      val sw = composedStopwordCount(c).cast("double")
      val pc = punctCount(c).cast("double")
      val ch = length(c).cast("double")
      val dt = composedDistinct(c).cast("double")
      when(nt === 0.0 || ch === 0.0, 0.0).otherwise(
        lit(0.4) * least(lit(1.0), nt / 50.0) +
          lit(0.3) * (sw / nt) +
          lit(0.2) * (lit(1.0) - pc / ch) +
          lit(0.1) * (dt / nt))
    }
    val rows = fixtures.toDF("t")
      .select(qualityScore($"t"), composed).collect()
    rows.zip(fixtures).foreach { case (r, s) =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"qualityScore bits: '$s'")
    }
  }

  test("punctCount and fingerprint match their composed forms exactly") {
    val composedPunct =
      length(regexp_replace($"t", punctClass, "")).cast("int")
    val composedFp = md5(array_join(tokens($"t"), " "))
    val punctFixtures = fixtures ++ Seq(
      "wait... what?! yes; no: maybe, ok.", "¡unicode! ¿punct? — café...")
    val rows = punctFixtures.toDF("t")
      .select(punctCount($"t"), composedPunct, fingerprint($"t"), composedFp)
      .collect()
    rows.zip(punctFixtures).foreach { case (r, s) =>
      assert(r.getInt(0) === r.getInt(1), s"punctCount: '$s'")
      assert(r.getString(2) === r.getString(3), s"fingerprint: '$s'")
    }
  }

  test("subwordCount matches the regexp composition exactly") {
    val composed = size(regexp_extract_all($"t",
      lit("[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"), lit(0))).cast("int")
    val swFixtures = fixtures ++ Seq(
      "abc123 def", "a1b2c3", "word, word! 42.0",
      "mixedé runs breakàhere", "数字123と文字", "ctrlchars",
      "hyphen-ated under_scored")
    val rows = swFixtures.toDF("t")
      .select(subwordCount($"t"), composed).collect()
    rows.zip(swFixtures).foreach { case (r, s) =>
      assert(r.getInt(0) === r.getInt(1), s"subwordCount: '$s'")
    }
  }

  test("null text: counts stay null, langId falls through to 'und'") {
    // the composed forms' NULL behavior, pinned: size-of-null counts are
    // NULL, but langId's when-chain fell through to "und" (and the SQL
    // twin's CASE ... ELSE 'und' still does)
    val df = Seq[Option[String]](None, Some("the fox")).toDF("t")
    val r = df.select(tokenCount($"t"), stopwordCount($"t"), langId($"t"),
        composedLangId($"t"))
      .collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1))
    assert(r(0).getString(2) === "und")
    assert(r(0).getString(2) === r(0).getString(3))
    assert(!r(1).isNullAt(0))
  }

  test("random adversarial strings keep bit-parity with the HOF forms") {
    // the byte-scan's soft spots, searched at random: supplementary
    // characters (4-byte UTF-8), whitespace LOOKALIKES that ASCII \s
    // does not match (NBSP, U+2028 — one token with their neighbors on
    // BOTH paths), control whitespace runs, long tokens, stopwords
    // embedded between multibyte chars
    val alphabet = Seq(
      "a", "b", "the", "de", "und", "é", "你", "好",
      new String(Character.toChars(0x1F600)),
      " ", " ", " ", "\t", "\n", "\f", "\r",
      ".", "!", "-", "9", "x" * 300)
    val rnd = new scala.util.Random(7L)
    val docs = (1 to 200).map(_ =>
      Seq.fill(rnd.nextInt(14))(alphabet(rnd.nextInt(alphabet.length)))
        .mkString)
    val composedPunct =
      length(regexp_replace($"t", punctClass, "")).cast("int")
    val composedFp = md5(array_join(tokens($"t"), " "))
    val composedSub = size(regexp_extract_all($"t",
      lit("[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"), lit(0))).cast("int")
    val rows = docs.toDF("t").select(
      tokenCount($"t"), composedTokenCount($"t"),
      stopwordCount($"t"), composedStopwordCount($"t"),
      langId($"t"), composedLangId($"t"),
      punctCount($"t"), composedPunct,
      fingerprint($"t"), composedFp,
      subwordCount($"t"), composedSub).collect()
    rows.zip(docs).foreach { case (r, s) =>
      val show = s.take(40).replace("\n", "\\n")
      assert(r.getInt(0) === r.getInt(1), s"tokenCount: '$show'")
      assert(r.getInt(2) === r.getInt(3), s"stopwordCount: '$show'")
      assert(r.getString(4) === r.getString(5), s"langId: '$show'")
      assert(r.getInt(6) === r.getInt(7), s"punctCount: '$show'")
      assert(r.getString(8) === r.getString(9), s"fingerprint: '$show'")
      assert(r.getInt(10) === r.getInt(11), s"subwordCount: '$show'")
    }
  }
}
