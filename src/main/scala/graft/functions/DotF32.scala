package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two `array<float>` columns, accumulating in
  * double.
  *
  * This is the one place the engine drops below `functions._`: the
  * higher-order-function formulation (`aggregate(zip_with(a, b, ...))`) is
  * evaluated interpreted — lambda functions don't participate in whole-stage
  * codegen — and allocates a boxed intermediate per element, which is the
  * inner loop of every similarity operator (SURVEY.md §2.9 E2). A
  * `BinaryExpression` with `doGenCode` compiles to a primitive `for` loop
  * over the two `ArrayData`s (measured 18x on 2M 64-dim pairs: 0.76s vs
  * 14.1s for the HOF form at local[32]; see DotF32Spec).
  *
  * Arithmetic contract: identical to the HOF version — each float widens to
  * double before multiply, accumulation left-to-right — so results are
  * bit-identical for well-formed inputs (equal-length, null-free arrays),
  * and the DuckDB oracles keep matching. Malformed inputs also agree with
  * the HOF: unequal lengths (zip_with null-pads the shorter side) or a null
  * element (null poisons `aggregate`'s sum) → NULL, as does a null array.
  * Registered as SQL function `dot_f32` by [[graft.GraftExtensions]].
  */
case class DotF32(left: Expression, right: Expression) extends BinaryExpression {

  // The result can be null even for non-null inputs (length mismatch /
  // null element), independent of child nullability.
  override def nullable: Boolean = true

  // ExpectsInputTypes.inputTypes needs the private[sql] AbstractDataType —
  // enforce the contract in checkInputDataTypes instead.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f32"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  // The loop is emitted as its OWN small generated method and the call
  // site is one line. Inlining it instead (the original form) let a
  // projection with many dots — the SRP banding expressions carry 40-80 —
  // compose into a single >8 KB-bytecode generated method, which HotSpot
  // refuses to JIT (DontCompileHugeMethods, limit 8000 bytes): the whole
  // stage then ran in the bytecode interpreter, measured ~15 µs per
  // 64-dim dot vs ~0.1 µs compiled. Per-expression methods stay a few
  // hundred bytes each, so every dot loop compiles no matter how many a
  // projection carries. The null flag rides a per-expression mutable
  // field because a Java method can't return (value, isNull) without
  // boxing; generated code is single-threaded per partition, so the
  // field is race-free.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val isNullF = ctx.addMutableState("boolean", "dotF32IsNull")
      val fname = ctx.freshName("dotF32")
      val fn = ctx.addNewFunction(fname,
        s"""
           |private double $fname(org.apache.spark.sql.catalyst.util.ArrayData x,
           |    org.apache.spark.sql.catalyst.util.ArrayData y) {
           |  int n = x.numElements();
           |  if (n != y.numElements()) { $isNullF = true; return 0.0; }
           |  double acc = 0.0;
           |  for (int i = 0; i < n; i++) {
           |    if (x.isNullAt(i) || y.isNullAt(i)) { $isNullF = true; return 0.0; }
           |    acc += (double) x.getFloat(i) * (double) y.getFloat(i);
           |  }
           |  return acc;
           |}
         """.stripMargin)
      s"""
         |$isNullF = false;
         |${ev.value} = $fn($x, $y);
         |${ev.isNull} = $isNullF;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
