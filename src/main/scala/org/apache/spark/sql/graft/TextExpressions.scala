package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

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

object TextExpressions {
  /** Column API: one-pass simhash over array<long> token hashes. */
  def simhash64(tokenHashes: Column): Column =
    Bridge.column(SimHash64(Bridge.expr(tokenHashes)))

  /** Column API: one-pass minhash signature over array<long> shingle
    * hashes. */
  def minhashSignature(shingleHashes: Column, coeffA: Array[Long],
      coeffB: Array[Long], prime: Long): Column =
    Bridge.column(MinHashSignature(Bridge.expr(shingleHashes), coeffA, coeffB, prime))
}
