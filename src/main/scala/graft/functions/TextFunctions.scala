package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language ID, quality scoring, fingerprinting. Everything
  * is composed from built-in `functions._` (codegen'd or HOF) — no UDFs,
  * no python workers, fully distributed.
  *
  * Each operator has a DuckDB SQL twin generated FROM THE SAME constants
  * (`*Sql` methods) so the driver's oracle comparison is exact by
  * construction.
  */
object TextFunctions {

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Order matters: ties resolve to the earlier language.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "por"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "que", "pour", "dans"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "ein", "eine", "zu", "mit"),
    "zh" -> Seq("de", "shi", "bu", "le", "zai", "ren", "you", "wo", "ta", "zhe"))

  val punctClass = "[^.,;:!?]"

  // ---- tokenization ----------------------------------------------------

  /** Whitespace tokens of lower-cased text (empty string → empty array). */
  def tokens(c: Column): Column =
    filter(split(trim(lower(c)), "\\s+"), t => length(t) > 0)

  def tokensSql(c: String): String =
    s"list_filter(string_split_regex(trim(lower($c)), '\\s+'), t -> length(t) > 0)"

  /** One-pass compiled token statistics (count / distinct / stopword
    * hits / language argmax) — the hot-path core of tokenCount,
    * stopwordCount, langId and qualityScore. The HOF composition
    * re-tokenized per REFERENCE (langId's argmax chain alone held ~25
    * split+filter occurrences, none rescued by subexpression elimination
    * because lambdas are excluded from it); this evaluates the byte-scan
    * once per row with identical semantics (ASCII `\s`, exact string
    * distinct, distinct-union stopword set, first-language tie-break).
    */
  private def tokenStats(c: Column): Column =
    org.apache.spark.sql.graft.TextExpressions
      .tokenStats(trim(lower(c)), stopwords)

  /** Whitespace token count. */
  def tokenCount(c: Column): Column =
    tokenStats(c).getField("n_tokens")
  def tokenCountSql(c: String): String = s"CAST(length(${tokensSql(c)}) AS INT)"

  /** BPE-ish subword count: word-piece runs of letters / digits /
    * single punctuation, the usual pre-tokenizer regex shape — one
    * compiled byte scan (the regexp form materialized the whole match
    * array per document just to count it).
    */
  def subwordCount(c: Column): Column =
    org.apache.spark.sql.graft.TextExpressions.subwordCount(c)
  def subwordCountSql(c: String): String =
    s"CAST(length(regexp_extract_all($c, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]')) AS INT)"

  // ---- language ID -----------------------------------------------------

  /** Stopword hits for one language (SQL-twin side; the Spark side
    * computes all languages in the one-pass [[tokenStats]]). */
  private def hitsSql(toksSql: String, words: Seq[String]): String = {
    val inList = words.map(w => s"'$w'").mkString(", ")
    s"len(list_filter($toksSql, t -> t IN ($inList)))"
  }

  /** Language-ID heuristic: argmax of per-language stopword hit counts;
    * "und" (undetermined) when no stopword hits at all. Ties go to the
    * earlier language in `stopwords`.
    */
  def langId(c: Column): Column =
    // NULL text is "und", not NULL: the composed when-chain this
    // replaced fell through its otherwise("und") on NULL input, and the
    // SQL twin's CASE ... ELSE 'und' still does — coalesce keeps the
    // three implementations agreeing
    coalesce(tokenStats(c).getField("lang_pred"), lit("und"))

  def langIdSql(c: String): String = {
    val toksSql = tokensSql(c)
    val scoreSqls = stopwords.map { case (lang, words) => lang -> hitsSql(toksSql, words) }
    val maxSql = scoreSqls.map(_._2).mkString("greatest(", ", ", ")")
    val whens = scoreSqls.map { case (lang, s) =>
      s"WHEN $s = $maxSql AND $maxSql > 0 THEN '$lang'"
    }.mkString(" ")
    s"CASE $whens ELSE 'und' END"
  }

  // ---- quality scoring -------------------------------------------------

  /** Punctuation-character count — one compiled byte scan (the
    * `regexp_replace` form built and measured a filtered copy of every
    * document; counts are identical for an ASCII class). */
  def punctCount(c: Column): Column =
    org.apache.spark.sql.graft.TextExpressions
      .asciiCharCount(c, ".,;:!?")
  def punctCountSql(c: String): String =
    s"CAST(length(regexp_replace($c, '${punctClass.replace("\\", "\\\\")}', '', 'g')) AS INT)"

  /** Stopword hits across all languages (quality signal). */
  def stopwordCount(c: Column): Column =
    tokenStats(c).getField("stop_hits")
  def stopwordCountSql(c: String): String = {
    val all = stopwords.flatMap(_._2).distinct
    val inList = all.map(w => s"'$w'").mkString(", ")
    s"CAST(len(list_filter(${tokensSql(c)}, t -> t IN ($inList))) AS INT)"
  }

  /** Heuristic quality score in [0,1]: integer counts combined with one
    * final arithmetic expression (identical operand order on both
    * engines → bit-identical doubles).
    *
    * score = 0.4*min(1, tokens/50) + 0.3*(stopHits/tokens)
    *       + 0.2*(1 - punct/chars) + 0.1*(distinctTokens/tokens)
    */
  def qualityScore(c: Column): Column = {
    // one TokenStats subtree shared by all three token-derived counts —
    // lambda-free, so subexpression elimination hoists it; worst case
    // it re-runs the single compiled byte-scan, never the HOF pipeline
    val st = tokenStats(c)
    val nt = st.getField("n_tokens").cast("double")
    val sw = st.getField("stop_hits").cast("double")
    val pc = punctCount(c).cast("double")
    val ch = length(c).cast("double")
    val dt = st.getField("n_distinct").cast("double")
    when(nt === 0.0 || ch === 0.0, 0.0).otherwise(
      lit(0.4) * least(lit(1.0), nt / 50.0) +
        lit(0.3) * (sw / nt) +
        lit(0.2) * (lit(1.0) - pc / ch) +
        lit(0.1) * (dt / nt))
  }

  def qualityScoreSql(c: String): String = {
    val nt = s"CAST(${tokenCountSql(c)} AS DOUBLE)"
    val sw = s"CAST(${stopwordCountSql(c)} AS DOUBLE)"
    val pc = s"CAST(${punctCountSql(c)} AS DOUBLE)"
    val ch = s"CAST(length($c) AS DOUBLE)"
    val dt = s"CAST(len(list_distinct(${tokensSql(c)})) AS DOUBLE)"
    s"""CASE WHEN $nt = 0.0 OR $ch = 0.0 THEN 0.0 ELSE
       0.4 * least(1.0, $nt / 50.0)
       + 0.3 * ($sw / $nt)
       + 0.2 * (1.0 - $pc / $ch)
       + 0.1 * ($dt / $nt) END"""
  }

  // ---- fingerprinting --------------------------------------------------

  /** Content fingerprint: md5 of whitespace-normalized lower-cased text
    * (md5 is identical across engines — exact-dedup key). The
    * normalization is one compiled pass (ws-run collapse + trim ≡ the
    * tokenize→join composition byte-for-byte); md5 stays the codegen'd
    * builtin.
    */
  def fingerprint(c: Column): Column =
    md5(org.apache.spark.sql.graft.TextExpressions
      .normalizeWs(trim(lower(c))))
  def fingerprintSql(c: String): String =
    s"md5(list_aggregate(${tokensSql(c)}, 'string_agg', ' '))"

  /** Character n-gram shingles (n consecutive tokens joined) — the MinHash
    * input. */
  def shingles(c: Column, n: Int): Column =
    array_distinct(shinglesAll(c, n))

  def shinglesSql(c: String, n: Int): String = {
    val toksSql = tokensSql(c)
    s"""list_distinct(list_transform(
        range(1, greatest(len($toksSql) - ${n - 1}, 0) + 1),
        i -> array_to_string($toksSql[i:i+${n - 1}], ' ')))"""
  }

  /** Token n-grams WITHOUT dedup — the denominator of the repetition
    * ratio needs every occurrence. Spark's `sequence(1, 0)` DESCENDS
    * (yielding a slice at index 0), so documents shorter than n tokens
    * short-circuit to an empty array instead.
    */
  def shinglesAll(c: Column, n: Int): Column = {
    val toks = tokens(c)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
  }

  private def shinglesAllSql(c: String, n: Int): String = {
    val toksSql = tokensSql(c)
    s"""list_transform(
        range(1, greatest(len($toksSql) - ${n - 1}, 0) + 1),
        i -> array_to_string($toksSql[i:i+${n - 1}], ' '))"""
  }

  /** Intra-document REPETITION ratio (the Gopher-style quality rule from
    * public LLM-data work): `1 − distinct n-grams / total n-grams`; 0
    * for documents shorter than n tokens. Heavily repetitive documents
    * (boilerplate, template spam, degenerate generations) score high
    * and get filtered before training. Integer counts + one final
    * division in fixed operand order → bit-identical doubles across
    * engines.
    */
  def repetitionRatio(c: Column, n: Int): Column = {
    // counts come from the compiled hash expression, not the string HOF
    // chain: |windows| and |distinct windows| are equal either way
    // (modulo ~1e-10 hash collisions), and the division is the same
    // fixed-order double arithmetic the DuckDB twin performs on strings
    val x = org.apache.spark.sql.graft.TextExpressions
    val tot = size(x.allShingleHashes64(lower(c), n)).cast("double")
    when(tot <= 0.0, lit(0.0))
      .otherwise(lit(1.0) -
        size(x.shingleHashes64(lower(c), n)).cast("double") / tot)
  }

  def repetitionRatioSql(c: String, n: Int): String = {
    val all = shinglesAllSql(c, n)
    s"""CASE WHEN len($all) <= 0 THEN 0.0 ELSE
        1.0 - CAST(len(list_distinct($all)) AS DOUBLE) /
              CAST(len($all) AS DOUBLE) END"""
  }

  /** MinHash signature: k permutation-hash minima over the shingle set,
    * h_i(x) = (a_i * xxhash64(x) + b_i) mod p. Composed entirely from
    * built-in HOFs — the base hash is computed ONCE per shingle, then k
    * affine transforms take array minima. No oracle twin (DuckDB's hash
    * differs) — used by LSH dedup whose verified output IS oracle-checked
    * via exact Jaccard.
    */
  /** 2^31-1 (Mersenne prime): (M-1)*(M-1)+b stays far below Long.Max, so
    * the affine transform never overflows under ANSI arithmetic. */
  val MINHASH_PRIME: Long = (1L << 31) - 1

  def minhashSignature(shingleCol: Column, k: Int, seed: Long = 42L): Column =
    minhashSignatureFromHashes(
      transform(shingleCol, s => xxhash64(s)), k, seed)

  /** Signature from an already-xxhash64'd shingle array (reuse the
    * hashes the verification set-ops need anyway). One-pass native
    * expression; bit-identical to the k-HOF composition it replaced
    * (same coefficients from the same seeded RNG, same mod-prime
    * arithmetic — see [[org.apache.spark.sql.graft.MinHashSignature]]).
    */
  def minhashSignatureFromHashes(hashesCol: Column, k: Int,
      seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    val coeffs = Seq.fill(k)((1L + rnd.nextLong(MINHASH_PRIME - 1),
      rnd.nextLong(MINHASH_PRIME)))
    org.apache.spark.sql.graft.TextExpressions.minhashSignature(
      hashesCol, coeffs.map(_._1).toArray, coeffs.map(_._2).toArray,
      MINHASH_PRIME)
  }

  /** Token xxhash64 array — materialize this ONCE per row (withColumn)
    * before feeding [[simhash64FromHashes]], which walks it 64 times.
    */
  def tokenHashes(c: Column): Column =
    org.apache.spark.sql.graft.TextExpressions.tokenHashes64(lower(c))

  /** Distinct xxhash64'd n-token shingles in ONE compiled pass — the
    * fast twin of `array_distinct(transform(shingles(c, n), xxhash64))`
    * (hash-identical; parity pinned in ShingleHashParitySpec). Every
    * shingle-based dedup operator feeds from this.
    */
  def shingleHashes(c: Column, n: Int): Column =
    org.apache.spark.sql.graft.TextExpressions.shingleHashes64(lower(c), n)

  /** 64-bit SimHash over a materialized hash array: bit j of the result
    * is the sign of Σ(±1) across hashes' j-th bits. Builtin-composed
    * (64 static-shift aggregates); a custom one-pass Catalyst Expression
    * is the planned fast path — see graft.functions.expressions.
    */
  def simhash64FromHashes(hs: Column): Column = {
    val bits = (0 until 64).map { j =>
      val bitSum = aggregate(hs, lit(0L), (s, h) =>
        s + when(shiftright(h, j).bitwiseAND(lit(1L)) === lit(1L), lit(1L))
          .otherwise(lit(-1L)))
      when(bitSum > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
