package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, LongType}

/** Space-filling-curve codes over quantile-bucketed dimensions — the
  * layout clustering behind [[graft.lake.LakeTable.zOrderBy]] /
  * `hilbertBy`: each input is bucketed by binary search over its
  * per-dimension quantile boundaries (computed once, driver-side, from
  * approxQuantile — skew-proof unlike linear-width bucketing), then the
  * bucket coordinates collapse to one long via Morton bit-interleave
  * (Z-order) or the Hilbert curve. Sorting by the code clusters rows so
  * per-file min/max ranges stay tight on ALL dimensions at once.
  *
  * Both expressions implement doGenCode (bucket search + curve math via
  * one reference-object call), so the rewrite pipeline that feeds the
  * parquet writer stays inside whole-stage codegen end to end.
  */
// Serializable explicitly: this class ships to executors via codegen
// reference objects; without it, Java deserialization would run this
// abstract constructor against still-null subclass fields.
abstract class CurveCode extends Expression with ExpectsInputTypes
  with Serializable {

  def boundaries: Array[Array[Double]]

  override def inputTypes: Seq[AbstractDataType] = children.map(_ => DoubleType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  protected lazy val bitsPerDim: Array[Int] =
    boundaries.map(b => 32 - java.lang.Integer.numberOfLeadingZeros(b.length))

  /** bucket(d) = count of boundaries(d) <= x (binary search). */
  protected final def bucketOf(d: Int, x: Double): Long = {
    val bs = boundaries(d)
    var lo = 0
    var hi = bs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bs(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  /** The curve index of one row's raw double values (null → -inf is
    * applied by the caller). Called from both eval and generated code. */
  def codeOf(values: Array[Double]): Long

  override def eval(input: InternalRow): Any = {
    val vals = new Array[Double](children.size)
    var d = 0
    while (d < children.size) {
      val v = children(d).eval(input)
      vals(d) = if (v == null) Double.NegativeInfinity else v.asInstanceOf[Double]
      d += 1
    }
    codeOf(vals)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val ref = ctx.addReferenceObj("curve", this, classOf[CurveCode].getName)
    val arr = ctx.freshName("curveVals")
    val fills = evals.zipWithIndex.map { case (e, i) =>
      s"$arr[$i] = ${e.isNull} ? Double.NEGATIVE_INFINITY : ${e.value};"
    }.mkString("\n")
    ev.copy(
      code = code"""
        ${evals.map(_.code).mkString("\n")}
        double[] $arr = new double[${children.size}];
        $fills
        long ${ev.value} = $ref.codeOf($arr);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
}

/** Morton (Z-order) interleave; dimensions may carry different bit
  * widths (round-robin interleave by bit level). */
case class ZOrderCode(children: Seq[Expression],
    boundaries: Array[Array[Double]]) extends CurveCode {

  require(children.nonEmpty && children.size == boundaries.length)
  require(bitsPerDim.map(_.toLong).sum <= 63,
    s"z-order bits overflow: ${bitsPerDim.mkString("+")}")

  override def prettyName: String = "z_order_code"

  /** Round-robin interleave by bit level: level b of dim d lands at
    * position (#dims-with->b-bits before level b) + rank of d among dims
    * still contributing at level b. Precomputed into a table.
    */
  private lazy val positions: Array[Array[Int]] = {
    val maxBits = if (bitsPerDim.isEmpty) 0 else bitsPerDim.max
    val out = Array.fill(maxBits, children.size)(-1)
    var pos = 0
    for (b <- 0 until maxBits; d <- children.indices if b < bitsPerDim(d)) {
      out(b)(d) = pos
      pos += 1
    }
    out
  }

  override def codeOf(values: Array[Double]): Long = {
    var code = 0L
    var d = 0
    while (d < values.length) {
      val bucket = bucketOf(d, values(d))
      val bits = bitsPerDim(d)
      var b = 0
      while (b < bits) {
        code |= ((bucket >> b) & 1L) << positions(b)(d)
        b += 1
      }
      d += 1
    }
    code
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** Hilbert-curve index over UNIFORM bit-width dimensions. Z-order's
  * worst case teleports between quadrant edges; the Hilbert curve is
  * continuous (adjacent indexes are grid neighbors), so file ranges stay
  * tighter as dimension count grows — offered as `hilbertBy` next to
  * `zOrderBy`, same quantile bucketing.
  */
case class HilbertCode(children: Seq[Expression],
    boundaries: Array[Array[Double]]) extends CurveCode {

  require(children.nonEmpty && children.size == boundaries.length)
  require(bitsPerDim.distinct.length == 1,
    s"hilbert needs uniform bits per dimension, got ${bitsPerDim.mkString(",")}")
  private val bits = bitsPerDim.head
  require(bits.toLong * children.size <= 63,
    s"hilbert bits overflow: $bits × ${children.size}")

  override def prettyName: String = "hilbert_code"

  override def codeOf(values: Array[Double]): Long = {
    val coords = new Array[Long](values.length)
    var d = 0
    while (d < values.length) {
      coords(d) = bucketOf(d, values(d))
      d += 1
    }
    Hilbert.index(coords, bits)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** n-dimensional Hilbert index from grid coordinates — Skilling's
  * transpose algorithm ("Programming the Hilbert curve", AIP Conf. Proc.
  * 707, 2004; public-domain method): Gray-decode the axes in place, then
  * bit-interleave the transposed form MSB-first.
  */
object Hilbert {

  /** Hilbert index of `coords` (each in [0, 2^bits)); mutates a copy. */
  def index(coords: Array[Long], bits: Int): Long = {
    val n = coords.length
    val x = java.util.Arrays.copyOf(coords, n)
    // axes → transpose (inverse undo + Gray encode), per Skilling
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // transpose → single index: MSB-first interleave across dims
    var h = 0L
    var b = bits - 1
    while (b >= 0) {
      var d = 0
      while (d < n) {
        h = (h << 1) | ((x(d) >> b) & 1L)
        d += 1
      }
      b -= 1
    }
    h
  }
}

object ZOrderExpressions {
  /** Column API: inputs must already be double (caller casts/coalesces). */
  def zOrderCode(cols: Seq[Column], boundaries: Array[Array[Double]]): Column =
    Bridge.column(ZOrderCode(cols.map(Bridge.expr), boundaries))

  def hilbertCode(cols: Seq[Column], boundaries: Array[Array[Double]]): Column =
    Bridge.column(HilbertCode(cols.map(Bridge.expr), boundaries))
}
