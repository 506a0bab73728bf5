package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the higher-order-function dot product
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0,
  * (acc, v) -> acc + v)` over two `array<float>` columns into the native
  * codegen'd [[DotF32]].
  *
  * Why a Rule and not "just call dot_f32": users (and the engine's own
  * [[Vectors.dotHof]] fallback) write the declarative HOF form, which Spark
  * evaluates interpreted — lambdas never enter whole-stage codegen and box
  * every element (measured 18x slower, see DotF32 doc). The rewrite is
  * semantics-exact because DotF32 reproduces the HOF contract bit-for-bit,
  * including the malformed-input cases: unequal lengths → NULL (zip_with
  * null-pads), null element → NULL (null poisons the sum), null array →
  * NULL, empty arrays → 0.0.
  *
  * The match is deliberately narrow — exact zero literal, exact
  * float→double cast-then-multiply lambda, identity finish, both inputs
  * `array<float>` — so near-miss shapes (e.g. [[Vectors.lshBucket]]'s
  * zip_with against an integer plane array, or double-array inputs) keep
  * their original semantics. Injected via
  * [[graft.GraftExtensions]]'s `injectOptimizerRule` (runs in the
  * user-provided batch, idempotent at fixed point).
  */
object VectorizeDotProduct extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** (x, y) -> cast(x as double) * cast(y as double), either operand order. */
  private def isWidenedMultiply(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(
        Multiply(Cast(x: NamedLambdaVariable, DoubleType, _, _),
                 Cast(y: NamedLambdaVariable, DoubleType, _, _), _),
        Seq(a0: NamedLambdaVariable, a1: NamedLambdaVariable), _) =>
      (x.exprId == a0.exprId && y.exprId == a1.exprId) ||
        (x.exprId == a1.exprId && y.exprId == a0.exprId) // double * is commutative
    case _ => false
  }

  /** (acc, v) -> acc + v (exact order: float addition is not associative,
    * but this frame only checks the two operands are the lambda's own args).
    */
  private def isSumMerge(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(a0: NamedLambdaVariable, a1: NamedLambdaVariable), _) =>
      l.exprId == a0.exprId && r.exprId == a1.exprId
    case _ => false
  }

  private def isIdentity(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a0: NamedLambdaVariable), _) =>
      v.exprId == a0.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b, mul: LambdaFunction),
        Literal(0.0, DoubleType),
        merge: LambdaFunction,
        finish: LambdaFunction)
      if isFloatArray(a) && isFloatArray(b) &&
        isWidenedMultiply(mul) && isSumMerge(merge) && isIdentity(finish) =>
      DotF32(a, b)
  }
}
