package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, StringType}

/** AbstractDataType is private[sql], so type checks are hand-rolled. */
private[expr] object GraftTypeCheck {
  def intArray(e: Expression, fn: String): TypeCheckResult = e.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn expects array<int>, got ${other.catalogString}")
  }
  def binary(e: Expression, fn: String): TypeCheckResult = e.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn expects binary, got ${other.catalogString}")
  }
}
import org.apache.spark.unsafe.types.UTF8String

import graft.codec.{IntBlocks, StrBlocks}

/** JVM-static kernels shared by interpreted eval and generated code, so the
  * expressions stay inside whole-stage codegen (the generated Java simply
  * calls these; no Catalyst fallback, no UDF serialization).
  */
object GraftRuntime {

  def toInts(a: ArrayData): Array[Int] = {
    val n = a.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException("graft codecs require non-null array elements")
      out(i) = a.getInt(i)
      i += 1
    }
    out
  }

  def encodeAuto(a: ArrayData): Array[Byte] = IntBlocks.encodeAuto(toInts(a))

  def encodeWith(id: Int, a: ArrayData): Array[Byte] = IntBlocks.encodeWith(id, toInts(a))

  def decode(bytes: Array[Byte]): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(IntBlocks.decode(bytes))

  def decodeStr(bytes: Array[Byte]): ArrayData =
    new GenericArrayData(StrBlocks.decode(bytes).map(UTF8String.fromString(_: String)))

  /** Split a flat decoded value stream back into per-row arrays using the
    * per-row lengths column (the stored n_tok block doubles as offsets).
    */
  def reslice(flat: ArrayData, lengths: ArrayData): ArrayData = {
    val lens = toInts(lengths)
    val vals = toInts(flat)
    var total = 0L
    var i = 0
    while (i < lens.length) { total += lens(i); i += 1 }
    if (total != vals.length)
      throw new IllegalArgumentException(
        s"graft_reslice: lengths sum to $total but flat stream has ${vals.length} values")
    val out = new Array[Any](lens.length)
    var off = 0
    i = 0
    while (i < lens.length) {
      val slice = java.util.Arrays.copyOfRange(vals, off, off + lens(i))
      out(i) = UnsafeArrayData.fromPrimitiveArray(slice)
      off += lens(i)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_encode(array<int>[, codec])` -> binary. With no codec the
  * trial-based auto-selector picks the smallest payload per row; with a
  * codec name the encoding is forced (used by the per-codec oracle queries
  * and tests). SURVEY.md E8a–E8e as a native Catalyst expression — codegen
  * via a static call, not a Scala UDF.
  */
case class GraftEncode(child: Expression, codec: Option[String] = None)
    extends UnaryExpression {

  private val codecId: Option[Int] = codec.map { name =>
    IntBlocks.idOf.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown codec '$name' (expected one of ${IntBlocks.idOf.keys.toSeq.sorted.mkString(", ")})"))
  }

  override def checkInputDataTypes(): TypeCheckResult = GraftTypeCheck.intArray(child, prettyName)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    codecId match {
      case Some(id) => GraftRuntime.encodeWith(id, a)
      case None     => GraftRuntime.encodeAuto(a)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    codecId match {
      case Some(id) => defineCodeGen(ctx, ev, c => s"graft.expr.GraftRuntime.encodeWith($id, $c)")
      case None     => defineCodeGen(ctx, ev, c => s"graft.expr.GraftRuntime.encodeAuto($c)")
    }

  override protected def withNewChildInternal(newChild: Expression): GraftEncode =
    copy(child = newChild)
}

/** `graft_decode(binary)` -> array<int>, bit-identical inverse of
  * graft_encode for every codec (payloads are self-describing).
  */
case class GraftDecode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = GraftTypeCheck.binary(child, prettyName)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_decode"

  override protected def nullSafeEval(input: Any): Any =
    GraftRuntime.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.GraftRuntime.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): GraftDecode =
    copy(child = newChild)
}

/** `graft_decode_str(binary)` -> array<string> (doc_id / source blocks). */
case class GraftDecodeStr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = GraftTypeCheck.binary(child, prettyName)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_decode_str"

  override protected def nullSafeEval(input: Any): Any =
    GraftRuntime.decodeStr(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.GraftRuntime.decodeStr($c)")

  override protected def withNewChildInternal(newChild: Expression): GraftDecodeStr =
    copy(child = newChild)
}

/** `graft_reslice(flat array<int>, lengths array<int>)` -> array<array<int>>:
  * rebuilds per-row token arrays from a decoded block stream.
  */
case class GraftReslice(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = GraftTypeCheck.intArray(left, prettyName)
    if (l.isFailure) l else GraftTypeCheck.intArray(right, prettyName)
  }
  override def dataType: DataType =
    ArrayType(ArrayType(IntegerType, containsNull = false), containsNull = false)
  override def prettyName: String = "graft_reslice"

  override protected def nullSafeEval(flat: Any, lens: Any): Any =
    GraftRuntime.reslice(flat.asInstanceOf[ArrayData], lens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, l) => s"graft.expr.GraftRuntime.reslice($f, $l)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): GraftReslice =
    copy(left = newLeft, right = newRight)
}
