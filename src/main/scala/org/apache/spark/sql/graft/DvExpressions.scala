package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.lake.DvLookup

/** True iff `(filePath, rowIndex)` is marked deleted in the deletion
  * vectors of the current snapshot. The lookup ships as a reference
  * object; bitmap deserialization happens once per executor, membership
  * is O(1) per row inside whole-stage codegen.
  */
case class DvRowDeleted(left: Expression, right: Expression, lookup: DvLookup)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "dv_row_deleted"

  override def nullSafeEval(path: Any, idx: Any): Any =
    lookup.deleted(path.asInstanceOf[UTF8String].toString,
      idx.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, i) => {
      val ref = ctx.addReferenceObj("dvLookup", lookup,
        classOf[DvLookup].getName)
      s"${ev.value} = $ref.deleted($p.toString(), $i);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DvExpressions {
  def rowDeleted(path: Column, idx: Column, lookup: DvLookup): Column =
    Bridge.column(DvRowDeleted(Bridge.expr(path), Bridge.expr(idx), lookup))
}
