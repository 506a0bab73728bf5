package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Threshold-bounded Levenshtein distance with an ASCII byte fast path.
  *
  * Spark's built-in bounded `levenshtein(l, r, k)` already runs the banded
  * O(k·n) DP, but each cell steps UTF-8 code points through `UTF8String`
  * accessors — measured ~29 ns/cell on the d5 near-dup verify (4.6 s of a
  * 6.4 s query at sf0.1). When BOTH inputs are full-ASCII (`isFullAscii`),
  * code points ARE bytes, so the same DP runs over primitive `byte[]` with
  * array indexing. Non-ASCII inputs fall back to
  * `UTF8String.levenshteinDistance(other, k)` — the exact code the built-in
  * evaluates — so results are identical to the built-in for EVERY input:
  * the distance when ≤ k, −1 when greater (LevBoundedSpec property-checks
  * this, unicode included).
  *
  * Same extension-tier rationale as [[DotF32]]: one `BinaryExpression` with
  * `doGenCode` (the generated code calls the static [[LevDp.dist]]), keeping
  * the surrounding filter/project pipeline inside whole-stage codegen.
  */
case class LevBounded(left: Expression, right: Expression, threshold: Int)
  extends BinaryExpression {

  require(threshold >= 0, s"threshold must be >= 0, got $threshold")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "lev_bounded"

  override def nullSafeEval(a: Any, b: Any): Any =
    LevDp.dist(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LevDp.dist($a, $b, $threshold);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static DP helpers for [[LevBounded]] (top-level object → Scala emits
  * static forwarders, so generated Java calls `LevDp.dist(...)` directly).
  */
object LevDp {

  /** Bounded distance: exact value when ≤ k, −1 when > k. */
  def dist(a: UTF8String, b: UTF8String, k: Int): Int =
    if (a.isFullAscii && b.isFullAscii) boundedAscii(a.getBytes, b.getBytes, k)
    else a.levenshteinDistance(b, k)

  // Per-thread DP scratch rows (grown on demand): the verify join evaluates
  // the DP per candidate pair, and two fresh (m+2)-int rows per pair is pure
  // allocator churn — ~1 GB over a 200k-pair verify at m≈300.
  private val scratch = new ThreadLocal[Array[Array[Int]]] {
    override def initialValue(): Array[Array[Int]] =
      Array(new Array[Int](128), new Array[Int](128))
  }

  /** Banded two-row DP over ASCII bytes; cells outside the |i−j| ≤ k band
    * are implicit ∞ (INF sentinels are written only at band edges).
    */
  def boundedAscii(s0: Array[Byte], t0: Array[Byte], k: Int): Int = {
    var s = s0
    var t = t0
    if (s.length > t.length) { val tmp = s; s = t; t = tmp }
    val n = s.length
    val m = t.length
    if (m - n > k) return -1
    if (n == 0) return m // m - n <= k already ensured
    val inf = k + 1
    val rows = scratch.get()
    if (rows(0).length < m + 2) {
      rows(0) = new Array[Int](m + 2)
      rows(1) = new Array[Int](m + 2)
    }
    var prev = rows(0)
    var cur = rows(1)
    // row 0: prev(j) = j for j <= k, sentinel INF just past the band
    val top = math.min(m, k)
    var j = 0
    while (j <= top) { prev(j) = j; j += 1 }
    if (top + 1 <= m + 1) prev(top + 1) = inf
    var i = 1
    while (i <= n) {
      val from = math.max(1, i - k)
      val to = math.min(m, i + k)
      // left band edge: column from-1 (0 only while i <= k, else ∞)
      cur(from - 1) = if (from == 1) i else inf
      var rowMin = cur(from - 1)
      val si = s(i - 1)
      j = from
      while (j <= to) {
        val cost = if (si == t(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = cur(j - 1) + 1
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin > k) return -1 // whole band exceeded the threshold
      if (to + 1 <= m + 1) cur(to + 1) = inf // right sentinel for next row
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    if (prev(m) <= k) prev(m) else -1
  }
}
