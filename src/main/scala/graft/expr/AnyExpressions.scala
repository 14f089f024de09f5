package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType}

import graft.table.AnyColumn

/** `graft_decode_any(binary, kind)` -> array<storageType(kind)>: the generic
  * table's per-column decode. The payload is self-describing for the CODEC
  * (incl. the NULLABLE wrapper), but the element TYPE comes from the table
  * schema recorded in the snapshot — the caller passes the storage kind and
  * gets a typed array back, inside whole-stage codegen (static call, no
  * fallback).
  */
case class GraftDecodeAny(child: Expression, kind: String) extends UnaryExpression {
  require(AnyColumn.Kinds.contains(kind), s"unknown storage kind $kind")

  override def checkInputDataTypes(): TypeCheckResult = GraftTypeCheck.binary(child, prettyName)
  override def dataType: DataType =
    ArrayType(AnyColumn.storageType(kind), containsNull = true)
  override def prettyName: String = "graft_decode_any"

  override protected def nullSafeEval(input: Any): Any =
    AnyColumn.decodeCatalyst(kind, input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.table.AnyColumn.decodeCatalyst("$kind", $c)""")

  override protected def withNewChildInternal(newChild: Expression): GraftDecodeAny =
    copy(child = newChild)
}
