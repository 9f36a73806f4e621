package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass 64-bit SimHash over a token-hash array. The builtin
  * composition (64 static-shift `aggregate` HOFs) walks the array 64
  * times through the lambda interpreter; this expression keeps 64 int
  * counters and walks once, with whole-stage codegen. Semantics are
  * identical: bit j of the result is set iff the count of set j-th bits
  * strictly exceeds half the hashes (Σ±1 > 0).
  */
case class SimHash64(child: Expression)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      // Σ±1 > 0  ⇔  setBits > n/2  ⇔  2*setBits > n
      if (2 * counts(j) > n) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
        int $n = $a.numElements();
        int[] $counts = new int[64];
        for (int $i = 0; $i < $n; $i++) {
          long $h = $a.getLong($i);
          for (int $j = 0; $j < 64; $j++) {
            if ((($h >>> $j) & 1L) == 1L) $counts[$j]++;
          }
        }
        long $out = 0L;
        for (int $j = 0; $j < 64; $j++) {
          if (2 * $counts[$j] > $n) $out |= (1L << $j);
        }
        ${ev.value} = $out;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature over an xxhash64'd shingle array in ONE pass. The
  * builtin composition evaluates k `transform`+`array_min` HOFs — k
  * interpreted walks per row; this keeps k running minima and walks
  * once, codegen'd. Arithmetic replicates the composition exactly
  * (`pmod(pmod(h,P)*a + b, P)` with wrapping 64-bit multiply), so
  * signatures — and therefore LSH candidate sets — are bit-identical.
  */
case class MinHashSignature(
    child: Expression, coeffA: Array[Long], coeffB: Array[Long], prime: Long)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  require(coeffA.length == coeffB.length && coeffA.nonEmpty)
  private val k = coeffA.length

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  // all-null signature when no hash contributes (empty array / all-null
  // elements) — matching array_min's null-on-empty in the composition
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) { // array_min skips null elements
        any = true
        val h = ((hs.getLong(i) % prime) + prime) % prime
        var j = 0
        while (j < k) {
          val v = h * coeffA(j) + coeffB(j) // wrapping, as Spark's non-ANSI *
          val m = ((v % prime) + prime) % prime
          if (m < mins(j)) mins(j) = m
          j += 1
        }
      }
      i += 1
    }
    if (!any)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](k))
    else
      new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ca = ctx.addReferenceObj("coeffA", coeffA, "long[]")
      val cb = ctx.addReferenceObj("coeffB", coeffB, "long[]")
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val any = ctx.freshName("any")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val m = ctx.freshName("m")
      s"""
        int $n = $a.numElements();
        long[] $mins = new long[$k];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        boolean $any = false;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i)) {
            $any = true;
            long $h = (($a.getLong($i) % ${prime}L) + ${prime}L) % ${prime}L;
            for (int $j = 0; $j < $k; $j++) {
              long $v = $h * $ca[$j] + $cb[$j];
              long $m = (($v % ${prime}L) + ${prime}L) % ${prime}L;
              if ($m < $mins[$j]) $mins[$j] = $m;
            }
          }
        }
        ${ev.value} = $any
          ? new org.apache.spark.sql.catalyst.util.GenericArrayData($mins)
          : new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$k]);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Byte-level tokenize + n-gram window hashing in one compiled pass.
  *
  * The composed pipeline — `split` on `\s+`, `filter`, `transform` over
  * a `sequence`, `array_join(slice(...))`, `xxhash64`, `array_distinct`
  * — evaluates four higher-order functions through the lambda
  * INTERPRETER per document, which dominates every shingle-based
  * operator's runtime (measured ~1 ms/doc). This expression produces
  * BIT-IDENTICAL hashes in one tight loop:
  *
  *  - tokens are maximal runs of non-whitespace BYTES (the ASCII set
  *    `\s` matches: space, \t, \n, \x0B, \f, \r — multi-byte UTF-8
  *    units never collide with ASCII, so byte scanning equals the
  *    regex split + non-empty filter on code points);
  *  - each n-token window hashes the exact bytes of
  *    `array_join(slice(tokens, i, n), " ")` (token bytes + 0x20
  *    separators) through the same XXH64(seed=42) as `xxhash64`;
  *  - `distinct = true` dedups by hash keeping first occurrence —
  *    `array_distinct` order.
  *
  * Lower-casing stays OUTSIDE (pass `lower(text)`): Spark's `lower` is
  * already codegen'd and its full-Unicode semantics are not worth
  * reimplementing.
  */
object ShingleHash {
  // regex `\\s` without UNICODE_CHARACTER_CLASS: space, \t, \n, \x0B, \f, \r
  private val WS = {
    val a = new Array[Boolean](128)
    Seq(32, 9, 10, 11, 12, 13).foreach(a(_) = true)
    a
  }
  @inline private def isWs(b: Byte): Boolean = b >= 0 && b < 128 && WS(b)

  def hashWindows(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // token boundaries (byte ranges)
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nTok = 0
    var i = 0
    while (i < len) {
      if (!isWs(bytes(i))) {
        val st = i
        while (i < len && !isWs(bytes(i))) i += 1
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = st; ends(nTok) = i; nTok += 1
      } else i += 1
    }
    val nWin = nTok - n + 1
    if (nWin <= 0) return new GenericArrayData(Array.emptyLongArray)
    var buf = new Array[Byte](64)
    val out = new Array[Long](nWin)
    var nOut = 0
    val seen = if (distinct) new java.util.HashSet[java.lang.Long]() else null
    var w = 0
    while (w < nWin) {
      var need = n - 1 // separators
      var t = w
      while (t < w + n) { need += ends(t) - starts(t); t += 1 }
      if (need > buf.length)
        buf = new Array[Byte](java.lang.Integer.highestOneBit(need) * 2)
      var pos = 0
      t = w
      while (t < w + n) {
        if (t > w) { buf(pos) = ' '; pos += 1 }
        val l = ends(t) - starts(t)
        System.arraycopy(bytes, starts(t), buf, pos, l)
        pos += l
        t += 1
      }
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          pos, 42L)
      if (seen == null || seen.add(h)) { out(nOut) = h; nOut += 1 }
      w += 1
    }
    new GenericArrayData(
      if (nOut == out.length) out else java.util.Arrays.copyOf(out, nOut))
  }
}

/** Codegen'd wrapper over [[ShingleHash.hashWindows]]: whole-stage
  * codegen emits ONE static call per row — all per-window work runs in
  * compiled scala, no lambda interpretation. `n = 1, distinct = false`
  * is exactly `transform(tokens(c), xxhash64)` (per-token hashes).
  */
case class ShingleHashes64(child: Expression, n: Int, distinct: Boolean)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  require(n >= 1, "window size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes64"

  override def nullSafeEval(input: Any): Any =
    ShingleHash.hashWindows(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
        ${ev.value} = org.apache.spark.sql.graft.ShingleHash.hashWindows(
          $s, $n, $distinct);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass token statistics for the text-analysis operators. The
  * composed pipeline evaluated `filter(split(trim(lower(c)),"\\s+"),…)`
  * once per REFERENCE — and langId's argmax chain plus qualityScore's
  * ratio formula reference token-derived counts dozens of times, with
  * no common-subexpression rescue because every occurrence sits under a
  * lambda (HOF subtrees are excluded from subexpression elimination).
  * This expression tokenizes once per row (byte scan, same ASCII-`\s`
  * semantics as the regex split — see [[ShingleHash]]) and returns every
  * count the operators need:
  *
  *   struct<n_tokens int, n_distinct int, stop_hits int, lang_pred string>
  *
  *  - `n_distinct`: exact string-distinct tokens (`array_distinct`);
  *  - `stop_hits`: occurrences of any word in the DISTINCT union of all
  *    language lists (a word shared by two languages counts once) —
  *    `stopwordCount` semantics;
  *  - `lang_pred`: argmax of per-language hit counts, ties to the
  *    earlier language in `langWords` order, "und" when no hits —
  *    `langId` semantics.
  *
  * Pass `trim(lower(c))` as the child: casing stays on Spark's codegen'd
  * full-Unicode `lower`, exactly like the shingle expressions.
  */
object TokenStatsImpl {
  import java.util.{HashSet => JHashSet}

  final class WordSets(langWords: Seq[(String, Seq[String])]) extends Serializable {
    val langs: Array[UTF8String] =
      langWords.map(l => UTF8String.fromString(l._1)).toArray
    val perLang: Array[JHashSet[UTF8String]] = langWords.map { case (_, ws) =>
      val s = new JHashSet[UTF8String]()
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray
    val union: JHashSet[UTF8String] = {
      val s = new JHashSet[UTF8String]()
      langWords.flatMap(_._2).foreach(w => s.add(UTF8String.fromString(w)))
      s
    }
    val und: UTF8String = UTF8String.fromString("und")
  }

  private val WS = {
    val a = new Array[Boolean](128)
    Seq(32, 9, 10, 11, 12, 13).foreach(a(_) = true)
    a
  }
  @inline private def isWs(b: Byte): Boolean = b >= 0 && b < 128 && WS(b)

  def eval(s: UTF8String, sets: WordSets): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = s.getBytes
    val len = bytes.length
    val nLangs = sets.perLang.length
    val langHits = new Array[Int](nLangs)
    val distinct = new JHashSet[UTF8String]()
    var nTok = 0
    var stopHits = 0
    var i = 0
    while (i < len) {
      if (!isWs(bytes(i))) {
        val st = i
        while (i < len && !isWs(bytes(i))) i += 1
        nTok += 1
        val tok = UTF8String.fromBytes(bytes, st, i - st)
        distinct.add(tok)
        if (sets.union.contains(tok)) {
          stopHits += 1
          var j = 0
          while (j < nLangs) {
            if (sets.perLang(j).contains(tok)) langHits(j) += 1
            j += 1
          }
        }
      } else i += 1
    }
    var best = -1
    var bestScore = 0
    var j = nLangs - 1
    while (j >= 0) { // reverse: earlier language wins ties
      if (langHits(j) >= bestScore && langHits(j) > 0) {
        best = j; bestScore = langHits(j)
      }
      j -= 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTok, distinct.size(), stopHits,
        if (best < 0) sets.und else sets.langs(best)))
  }
}

case class TokenStats(child: Expression, langWords: Seq[(String, Seq[String])])
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tokens",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("n_distinct",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("stop_hits",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("lang_pred",
      StringType, nullable = false)))
  override def prettyName: String = "token_stats"

  @transient private lazy val sets = new TokenStatsImpl.WordSets(langWords)

  override def nullSafeEval(input: Any): Any =
    TokenStatsImpl.eval(input.asInstanceOf[UTF8String], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("wordSets", sets,
        classOf[TokenStatsImpl.WordSets].getName)
      s"""
        ${ev.value} = org.apache.spark.sql.graft.TokenStatsImpl.eval($s, $ref);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** BPE-ish subword count in one byte scan — the compiled twin of
  * `size(regexp_extract_all(c, "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]", 0))`
  * without materializing the match array. Replicates the Java-regex
  * alternation exactly: a maximal ASCII-letter run counts once, an
  * ASCII digit counts once, any other non-`\s` CODE POINT counts once
  * (negated classes match one code point; a UTF-8 lead byte is one code
  * point — surrogates don't exist in UTF-8), ASCII whitespace separates.
  */
case class SubwordCount(child: Expression)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "subword_count"

  override def nullSafeEval(input: Any): Any =
    SubwordCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
        ${ev.value} = org.apache.spark.sql.graft.SubwordCount.count($s);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SubwordCount {
  @inline private def isWs(b: Byte): Boolean =
    b == 32 || (b >= 9 && b <= 13)
  @inline private def isLetter(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')

  def count(s: UTF8String): Int = {
    val bytes = s.getBytes
    val len = bytes.length
    var n = 0
    var i = 0
    while (i < len) {
      val b = bytes(i)
      if (isLetter(b)) {
        n += 1
        i += 1
        while (i < len && isLetter(bytes(i))) i += 1
      } else if (b >= 0) { // ASCII digit / ws / punct
        if (!isWs(b)) n += 1
        i += 1
      } else { // UTF-8 lead byte: one code point
        n += 1
        i += 1
        while (i < len && (bytes(i) & 0xC0) == 0x80) i += 1
      }
    }
    n
  }
}

/** Count of characters from an ASCII set, one byte scan — the compiled
  * twin of `length(regexp_replace(c, "[^<set>]", ""))` (which builds and
  * measures a filtered COPY of every document). ASCII bytes never occur
  * inside multi-byte UTF-8 sequences, so byte counting equals code-point
  * counting for an ASCII set.
  */
case class AsciiCharCount(child: Expression, chars: String)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  require(chars.nonEmpty && chars.forall(_ < 128), "ASCII set only")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "ascii_char_count"

  @transient private lazy val mask: Array[Boolean] = {
    val a = new Array[Boolean](128)
    chars.foreach(c => a(c.toInt) = true)
    a
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var n = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 0 && mask(b)) n += 1
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val m = ctx.addReferenceObj("mask", mask, "boolean[]")
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      s"""
        byte[] $bytes = $s.getBytes();
        int $n = 0;
        for (int $i = 0; $i < $bytes.length; $i++) {
          byte $b = $bytes[$i];
          if ($b >= 0 && $m[$b]) $n++;
        }
        ${ev.value} = $n;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Whitespace normalization in one pass: collapse ASCII-`\s` runs to a
  * single space and trim — byte-identical to
  * `array_join(filter(split(trim(lower(c)),"\\s+"), …), " ")` when fed
  * the trimmed, lowered string (token bytes + 0x20 separators). Feeds
  * `md5(...)` for content fingerprints without the HOF pipeline or the
  * intermediate array.
  */
case class NormalizeWs(child: Expression)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_ws"

  override def nullSafeEval(input: Any): Any =
    NormalizeWs.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
        ${ev.value} = org.apache.spark.sql.graft.NormalizeWs.normalize($s);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeWs {
  private val WS = {
    val a = new Array[Boolean](128)
    Seq(32, 9, 10, 11, 12, 13).foreach(a(_) = true)
    a
  }
  @inline private def isWs(b: Byte): Boolean = b >= 0 && b < 128 && WS(b)

  def normalize(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val len = bytes.length
    val out = new Array[Byte](len)
    var pos = 0
    var i = 0
    while (i < len) {
      if (!isWs(bytes(i))) {
        if (pos > 0) { out(pos) = ' '; pos += 1 }
        val st = i
        while (i < len && !isWs(bytes(i))) i += 1
        System.arraycopy(bytes, st, out, pos, i - st)
        pos += i - st
      } else i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, pos))
  }
}

object TextExpressions {
  /** Column API: one-pass token statistics of an already-lowercased,
    * trimmed text column. */
  def tokenStats(loweredText: Column,
      langWords: Seq[(String, Seq[String])]): Column =
    Bridge.column(TokenStats(Bridge.expr(loweredText), langWords))

  /** Column API: count of the given ASCII characters, one byte scan. */
  def asciiCharCount(text: Column, chars: String): Column =
    Bridge.column(AsciiCharCount(Bridge.expr(text), chars))

  /** Column API: one-pass BPE-ish subword count. */
  def subwordCount(text: Column): Column =
    Bridge.column(SubwordCount(Bridge.expr(text)))

  /** Column API: ASCII-whitespace-run collapse + trim, one pass. */
  def normalizeWs(text: Column): Column =
    Bridge.column(NormalizeWs(Bridge.expr(text)))

  /** Column API: one-pass simhash over array<long> token hashes. */
  def simhash64(tokenHashes: Column): Column =
    Bridge.column(SimHash64(Bridge.expr(tokenHashes)))

  /** Column API: distinct xxhash64'd n-token shingles of an
    * already-lowercased text column, one compiled pass. */
  def shingleHashes64(loweredText: Column, n: Int): Column =
    Bridge.column(ShingleHashes64(Bridge.expr(loweredText), n, distinct = true))

  /** Column API: per-token xxhash64 (order + duplicates kept) — the
    * compiled twin of `transform(tokens(c), xxhash64)`. */
  def tokenHashes64(loweredText: Column): Column =
    Bridge.column(ShingleHashes64(Bridge.expr(loweredText), 1, distinct = false))

  /** Column API: EVERY n-token window's hash, duplicates kept — the
    * denominator side of repetition ratios. */
  def allShingleHashes64(loweredText: Column, n: Int): Column =
    Bridge.column(ShingleHashes64(Bridge.expr(loweredText), n, distinct = false))

  /** Column API: one-pass minhash signature over array<long> shingle
    * hashes. */
  def minhashSignature(shingleHashes: Column, coeffA: Array[Long],
      coeffB: Array[Long], prime: Long): Column =
    Bridge.column(MinHashSignature(Bridge.expr(shingleHashes), coeffA, coeffB, prime))
}
