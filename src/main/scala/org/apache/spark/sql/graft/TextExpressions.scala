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

object TextExpressions {
  /** Column API: one-pass simhash over array<long> token hashes. */
  def simhash64(tokenHashes: Column): Column =
    Bridge.column(SimHash64(Bridge.expr(tokenHashes)))
}
