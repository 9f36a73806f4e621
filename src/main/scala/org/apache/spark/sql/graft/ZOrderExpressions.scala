package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, LongType}

/** Morton (Z-order) code over quantile-bucketed dimensions: each input is
  * bucketed by binary search over its per-dimension quantile boundaries
  * (computed once, driver-side, from approxQuantile — skew-proof unlike
  * linear width bucketing), then the bucket bits are interleaved. Sorting
  * by this code clusters rows so per-file min/max ranges are tight on ALL
  * dimensions at once — the layout optimization behind
  * [[graft.lake.LakeTable.zOrderBy]].
  *
  * `boundaries(d)` are the sorted inner boundaries of dimension d;
  * bits per dimension = log2(boundaries(d).length + 1). Total bits must
  * fit 63. Inputs are non-null doubles (the Column layer coalesces).
  */
case class ZOrderCode(children: Seq[Expression], boundaries: Array[Array[Double]])
  extends Expression with ExpectsInputTypes
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  // CodegenFallback: the code is computed once per row during a LAYOUT
  // REWRITE (maintenance), not in the query hot path — interpreter
  // overhead is irrelevant next to the parquet write it feeds.

  require(children.nonEmpty && children.size == boundaries.length)
  private val bitsPerDim: Array[Int] =
    boundaries.map(b => 32 - java.lang.Integer.numberOfLeadingZeros(b.length))
  require(bitsPerDim.map(_.toLong).sum <= 63,
    s"z-order bits overflow: ${bitsPerDim.mkString("+")}")

  override def inputTypes: Seq[AbstractDataType] = children.map(_ => DoubleType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "z_order_code"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    var code = 0L
    var d = 0
    while (d < children.size) {
      val v = children(d).eval(input)
      val x = if (v == null) Double.NegativeInfinity else v.asInstanceOf[Double]
      val bs = boundaries(d)
      // bucket = count of boundaries <= x (binary search)
      var lo = 0
      var hi = bs.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (bs(mid) <= x) lo = mid + 1 else hi = mid
      }
      val bucket = lo
      val bits = bitsPerDim(d)
      var b = 0
      while (b < bits) {
        code |= (((bucket >> b) & 1L).toLong) << (interleavedPos(b, d))
        b += 1
      }
      d += 1
    }
    code
  }

  /** Round-robin interleave by bit level: level b of dim d lands at
    * position (#dims-with->b-bits before level b) + rank of d among dims
    * still contributing at level b. Precomputed into a table.
    */
  private lazy val positions: Array[Array[Int]] = {
    val maxBits = bitsPerDim.max
    val out = Array.fill(maxBits, children.size)(-1)
    var pos = 0
    for (b <- 0 until maxBits; d <- children.indices if b < bitsPerDim(d)) {
      out(b)(d) = pos
      pos += 1
    }
    out
  }

  private def interleavedPos(b: Int, d: Int): Int = positions(b)(d)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object ZOrderExpressions {
  /** Column API: inputs must already be double (caller casts/coalesces). */
  def zOrderCode(cols: Seq[Column], boundaries: Array[Array[Double]]): Column =
    Bridge.column(ZOrderCode(cols.map(Bridge.expr), boundaries))
}
