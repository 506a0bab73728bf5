package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native Bloom-filter membership test over a LONG column:
  * `bloom_might_contain(value, bloomBytes)` with the serialized filter as a
  * foldable BINARY literal. TRUE means "possibly in the set" (false-positive
  * rate fixed at build time), FALSE means "definitely not" — the no-false-
  * negative guarantee downstream exact verifies rely on
  * ([[graft.operators.Dedup.contaminationPairsBloom]]).
  *
  * Why an expression and not a UDF: the probe runs once per exploded
  * training-corpus shingle — the widest row stream in decontamination — and
  * a UDF would box every long and break whole-stage codegen there. Here the
  * filter deserializes once per task (lazy, from the literal bytes) and the
  * generated code is a single virtual call on a reference object, with the
  * surrounding stage staying codegen'd.
  *
  * Null contract: null value or null filter bytes → NULL (filters drop the
  * row, matching equi-join semantics on null keys).
  */
case class BloomMightContain(value: Expression, bloomBytes: Expression)
    extends BinaryExpression {

  override def left: Expression = value
  override def right: Expression = bloomBytes
  override def nullable: Boolean = true
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (value.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName value must be BIGINT, got ${value.dataType.simpleString}")
    else if (bloomBytes.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName filter must be BINARY, got ${bloomBytes.dataType.simpleString}")
    else if (!bloomBytes.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName filter bytes must be foldable")
    else TypeCheckResult.TypeCheckSuccess

  /** Deserialized once per task (the literal bytes ride with the plan). */
  @transient private lazy val filter: BloomFilter = {
    val bytes = bloomBytes.eval().asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  /** Public bridge for generated code. */
  def mightContain(v: Long): Boolean = filter.mightContainLong(v)

  override def nullSafeEval(v: Any, b: Any): Any =
    mightContain(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bloomExpr", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = $self.mightContain($v);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(value = newLeft, bloomBytes = newRight)
}
