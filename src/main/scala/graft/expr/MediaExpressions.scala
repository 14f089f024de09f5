package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Multimodal columns: media payloads ride as opaque `binary` columns with
  * typed metadata. The Spark-side plumbing — schema, expressions, codegen,
  * partitioning, tests — is real; the byte-level "decode" is a clearly
  * marked STUB (this container ships no image/audio libraries), replaced in
  * production by a real decoder behind the same expression signature.
  *
  * Payload layout used by the synthetic media table (Multimodal.scala):
  * `[width:int32 LE][height:int32 LE][body bytes]`.
  */
object MediaRuntime {

  private def intLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  def wrap(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + body.length)
    out(0) = width.toByte; out(1) = (width >> 8).toByte
    out(2) = (width >> 16).toByte; out(3) = (width >> 24).toByte
    out(4) = height.toByte; out(5) = (height >> 8).toByte
    out(6) = (height >> 16).toByte; out(7) = (height >> 24).toByte
    System.arraycopy(body, 0, out, 8, body.length)
    out
  }

  /** STUB decode: parses the fake header + body statistics. A real build
    * would hand `bytes` to an image codec here and emit true dimensions.
    */
  def probe(bytes: Array[Byte]): InternalRow = {
    require(bytes.length >= 8, s"media payload too short: ${bytes.length}")
    val width = intLE(bytes, 0)
    val height = intLE(bytes, 4)
    var sum = 0L
    var i = 8
    while (i < bytes.length) { sum += bytes(i) & 0xFF; i += 1 }
    val body = bytes.length - 8
    val mean = if (body == 0) 0.0 else sum.toDouble / body
    InternalRow(width, height, body.toLong, mean)
  }

  /** STUB feature extraction: a `dims`-bucket byte histogram, L1-normalized
    * to floats — the deterministic stand-in for an embedding model. The
    * expression shape (binary → array<float>) is what production swaps in.
    */
  def features(bytes: Array[Byte], dims: Int): UnsafeArrayData = {
    val counts = new Array[Int](dims)
    var i = 8
    while (i < bytes.length) {
      counts((bytes(i) & 0xFF) % dims) += 1
      i += 1
    }
    val body = math.max(1, bytes.length - 8)
    val out = new Array[Float](dims)
    i = 0
    while (i < dims) { out(i) = counts(i).toFloat / body; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Frame sampling: split the body into fixed-size frames and keep every
    * `step`-th — the batch-shape part of a video pipeline, bytes untouched.
    */
  def frameSample(bytes: Array[Byte], frameBytes: Int, step: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val body = bytes.length - 8
    val nFrames = math.max(0, body / frameBytes)
    val kept = Seq.range(0, nFrames, step).map { f =>
      java.util.Arrays.copyOfRange(bytes, 8 + f * frameBytes, 8 + (f + 1) * frameBytes)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(kept.toArray[Any])
  }
}

/** `graft_media_wrap(width, height, body)` -> binary payload in the fake
  * media layout (test/synthesis helper — the inverse of the probe stub).
  */
case class GraftMediaWrap(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != IntegerType || second.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects (int, int, binary)")
    else GraftTypeCheck.binary(third, prettyName)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_media_wrap"

  override protected def nullSafeEval(w: Any, h: Any, b: Any): Any =
    MediaRuntime.wrap(w.asInstanceOf[Int], h.asInstanceOf[Int], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, h, b) => s"graft.expr.MediaRuntime.wrap($w, $h, $b)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): GraftMediaWrap =
    copy(first = newFirst, second = newSecond, third = newThird)
}

case class GraftMediaProbe(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = GraftTypeCheck.binary(child, prettyName)
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("body_bytes", LongType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false)))
  override def prettyName: String = "graft_media_probe"

  override protected def nullSafeEval(input: Any): Any =
    MediaRuntime.probe(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.MediaRuntime.probe($c)")

  override protected def withNewChildInternal(newChild: Expression): GraftMediaProbe =
    copy(child = newChild)
}

case class GraftMediaFeatures(child: Expression, dims: Int) extends UnaryExpression {
  require(dims > 0 && dims <= 4096, s"dims out of range: $dims")
  override def checkInputDataTypes(): TypeCheckResult = GraftTypeCheck.binary(child, prettyName)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_media_features"

  override protected def nullSafeEval(input: Any): Any =
    MediaRuntime.features(input.asInstanceOf[Array[Byte]], dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.MediaRuntime.features($c, $dims)")

  override protected def withNewChildInternal(newChild: Expression): GraftMediaFeatures =
    copy(child = newChild)
}

case class GraftFrameSample(child: Expression, frameBytes: Int, step: Int)
    extends UnaryExpression {
  require(frameBytes > 0 && step > 0, s"bad frame/step: $frameBytes/$step")
  override def checkInputDataTypes(): TypeCheckResult = GraftTypeCheck.binary(child, prettyName)
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "graft_frame_sample"

  override protected def nullSafeEval(input: Any): Any =
    MediaRuntime.frameSample(input.asInstanceOf[Array[Byte]], frameBytes, step)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.MediaRuntime.frameSample($c, $frameBytes, $step)")

  override protected def withNewChildInternal(newChild: Expression): GraftFrameSample =
    copy(child = newChild)
}
