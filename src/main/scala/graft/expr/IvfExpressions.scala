package graft.expr

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Kernels for IVF coarse quantization. Centroids are broadcast
  * L2-NORMALIZED, so ranking centroids by cosine reduces to ranking by dot
  * product (the query's own norm is constant across centroids) — no sqrt
  * in the per-(row, centroid) inner loop.
  */
object IvfRuntime {

  def nearest(v: ArrayData, centroids: Array[Array[Float]]): Int = {
    val dim = v.numElements()
    var best = -1
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var dot = 0.0
      var i = 0
      val n = math.min(dim, cent.length)
      while (i < n) { dot += v.getFloat(i).toDouble * cent(i); i += 1 }
      // NaN dots (degenerate NaN/Inf embeddings) rank as -Inf so an
      // all-NaN row still assigns deterministically to centroid 0 instead
      // of returning cid -1 (ADVICE r2)
      if (dot != dot) dot = Double.NegativeInfinity
      if (best < 0 || dot > bestDot) { bestDot = dot; best = c } // ties → lower cid
      c += 1
    }
    best
  }

  /** Top-`nprobe` centroid ids by dot product, descending (ties → lower
    * cid). k is small (≈√n), so an O(k·nprobe) selection beats sorting.
    */
  def nearestN(v: ArrayData, centroids: Array[Array[Float]], nprobe: Int): ArrayData = {
    val k = centroids.length
    val dim = v.numElements()
    val dots = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = centroids(c)
      var dot = 0.0
      var i = 0
      val n = math.min(dim, cent.length)
      while (i < n) { dot += v.getFloat(i).toDouble * cent(i); i += 1 }
      // NaN → -Inf: keeps selection total for degenerate embeddings so
      // taken(best) below never indexes -1 (ADVICE r2)
      dots(c) = if (dot != dot) Double.NegativeInfinity else dot
      c += 1
    }
    val m = math.min(nprobe, k)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](k)
    var j = 0
    while (j < m) {
      var best = -1
      var bestDot = Double.NegativeInfinity
      c = 0
      while (c < k) {
        if (!taken(c) && (best < 0 || dots(c) > bestDot)) { bestDot = dots(c); best = c }
        c += 1
      }
      taken(best) = true
      out(j) = best
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `IvfAssign(vec, broadcast centroids)` -> int centroid id (coarse
  * quantizer assignment). Native + codegen'd; centroids fetched once per
  * executor via the broadcast.
  */
case class IvfAssign(
    child: Expression,
    bc: Broadcast[Array[Array[Float]]])
    extends UnaryExpression {

  @transient private lazy val cents: Array[Array[Float]] = bc.value

  private def floatArray(e: Expression): TypeCheckResult = e.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.catalogString}")
  }
  override def checkInputDataTypes(): TypeCheckResult = floatArray(child)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_ivf_assign"

  override protected def nullSafeEval(input: Any): Any =
    IvfRuntime.nearest(input.asInstanceOf[ArrayData], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftIvfBc", bc, "org.apache.spark.broadcast.Broadcast")
    val cName = ctx.addMutableState("float[][]", "graftIvfCents",
      v => s"$v = (float[][]) $ref.value();")
    defineCodeGen(ctx, ev, c => s"graft.expr.IvfRuntime.nearest($c, $cName)")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfAssign =
    copy(child = newChild)
}

/** `IvfProbes(vec, broadcast centroids, nprobe)` -> array<int> of the
  * nprobe nearest centroid ids (query-side multi-probe).
  */
case class IvfProbes(
    child: Expression,
    bc: Broadcast[Array[Array[Float]]],
    nprobe: Int)
    extends UnaryExpression {
  require(nprobe > 0, s"nprobe must be positive: $nprobe")

  @transient private lazy val cents: Array[Array[Float]] = bc.value

  private def floatArray(e: Expression): TypeCheckResult = e.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.catalogString}")
  }
  override def checkInputDataTypes(): TypeCheckResult = floatArray(child)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_ivf_probes"

  override protected def nullSafeEval(input: Any): Any =
    IvfRuntime.nearestN(input.asInstanceOf[ArrayData], cents, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftIvfBc", bc, "org.apache.spark.broadcast.Broadcast")
    val cName = ctx.addMutableState("float[][]", "graftIvfCents",
      v => s"$v = (float[][]) $ref.value();")
    defineCodeGen(ctx, ev, c => s"graft.expr.IvfRuntime.nearestN($c, $cName, $nprobe)")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfProbes =
    copy(child = newChild)
}
