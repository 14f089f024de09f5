package graft.expr

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `VocabLookup(word, broadcast vocab)` -> int token id (null if absent).
  *
  * The tokenize hot path: a map-side hash probe per word with NO join and
  * NO shuffle of the document stream — the same dataflow as the build side
  * of a broadcast hash join, minus the join machinery. Round 1 inlined the
  * vocab as a `typedLit` map: fine at 31 words, but a realistic 100k–1M
  * entry tokenizer vocab as a plan literal bloats every task's serialized
  * plan and the driver's plan tree. A broadcast is fetched once per
  * executor and referenced.
  *
  * Keys are `UTF8String` (Spark's internal string repr), so the probe needs
  * no conversion on either side of the map.
  */
case class VocabLookup(
    child: Expression,
    bc: Broadcast[java.util.HashMap[UTF8String, Integer]])
    extends UnaryExpression {

  @transient private lazy val map: java.util.HashMap[UTF8String, Integer] = bc.value

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vocab_id"

  override protected def nullSafeEval(input: Any): Any =
    map.get(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(
      "graftVocabBc", bc, "org.apache.spark.broadcast.Broadcast")
    val mapName = ctx.addMutableState(
      "java.util.HashMap", "graftVocabMap",
      v => s"$v = (java.util.HashMap) $ref.value();")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Integer ${ev.value}Boxed = (java.lang.Integer) $mapName.get($c);
      if (${ev.value}Boxed == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}Boxed.intValue();
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): VocabLookup =
    copy(child = newChild)
}
