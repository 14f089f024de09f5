package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic 64-bit string hashing for the dedup sketches: FNV-1a over
  * the UTF-8 bytes, seeded, with a splitmix64 finalizer for avalanche. Pure
  * JVM, no dependencies — stable across Spark versions (sketch values are
  * persisted nowhere, but candidate generation must be run-to-run stable).
  */
object SketchRuntime {

  def hashBytes(bytes: Array[Byte], off: Int, len: Int, seed: Long): Long = {
    var h = seed ^ 0xcbf29ce484222325L
    var i = off
    val end = off + len
    while (i < end) {
      h ^= bytes(i) & 0xFFL
      h *= 0x100000001b3L
      i += 1
    }
    // splitmix64 finalizer
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  def hashString(s: UTF8String, seed: Long): Long = {
    val b = s.getBytes
    hashBytes(b, 0, b.length, seed)
  }

  /** MinHash signature: for seed i in [0, n), the minimum of hash(elem, i)
    * over the (shingle) set. P(sig_a[i] == sig_b[i]) = Jaccard(a, b).
    */
  def minHash(a: ArrayData, n: Int): ArrayData = {
    val m = a.numElements()
    val sig = new Array[Long](n)
    var i = 0
    while (i < n) {
      var min = Long.MaxValue
      var j = 0
      while (j < m) {
        val h = hashString(a.getUTF8String(j), i.toLong)
        if (h < min) min = h
        j += 1
      }
      sig(i) = min
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** Cosine similarity, double precision, sequential accumulation — must
    * match the HOF formulation bit for bit (same op order).
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(), s"dim mismatch: $n vs ${b.numElements()}")
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** 64-bit SimHash over the element multiset: bit b of the result is 1 iff
    * the sum over elements of sign(bit b of hash(elem)) is positive. Near-
    * identical documents differ in few bits (small Hamming distance).
    */
  def simHash(a: ArrayData): Long = {
    val m = a.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < m) {
      val h = hashString(a.getUTF8String(j), 0L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }
}

/** `graft_cosine(array<float>, array<float>)` -> double cosine similarity.
  * Same sequential double-precision recurrence as the HOF formulation
  * (identical results), but codegen'd — the HOF lambdas evaluate
  * interpreted per element, which dominated the all-pairs similarity scan
  * (measured ~18× slower).
  */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  private def floatArray(e: Expression, fn: String): TypeCheckResult = e.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn expects array<float>, got ${other.catalogString}")
  }
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = floatArray(left, prettyName)
    if (l.isFailure) l else floatArray(right, prettyName)
  }
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SketchRuntime.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.SketchRuntime.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** `graft_minhash(array<string>, n)` -> array<bigint> MinHash signature. */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes > 0 && numHashes <= 512, s"numHashes out of range: $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = GraftTypeCheck.strArray(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any =
    SketchRuntime.minHash(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SketchRuntime.minHash($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `graft_simhash(array<string>)` -> bigint 64-bit SimHash. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = GraftTypeCheck.strArray(child, prettyName)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    SketchRuntime.simHash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SketchRuntime.simHash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
