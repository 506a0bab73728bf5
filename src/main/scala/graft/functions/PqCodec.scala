package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization codec expressions ([[graft.operators.Pq]]).
  *
  * Why native and not composed `functions._`: the composed encoder is
  * m·ksub struct entries each wrapping a [[DotF32]] — at 8×16 the generated
  * projection blows Janino's 64 KB method limit and the whole stage falls
  * back to interpreted evaluation, precisely on the corpus-side hot path
  * (one encode per indexed vector). A dedicated expression is three nested
  * primitive loops of CONSTANT code size: whole-stage codegen keeps working
  * at any (m, ksub), and the codebook rides along as a reference object
  * instead of m·ksub array literals.
  *
  * Shared arithmetic contract (so PqSpec can replicate it driver-side and
  * the composed form in git history stays an equivalence witness):
  * per-element float→double widening, left-to-right accumulation, score =
  * dot(x_s, c)/‖x‖ − ½‖c‖², argmax with ties to the smaller code. ‖x‖ is
  * computed inside the expression (left-to-right Σx², then sqrt) — one
  * array pass, no separate norm column needed.
  *
  * Null contract ([[DotF32]]'s): null array, length ≠ m·subDim, or a null
  * element → NULL result. Zero-norm input: [[PqEncode]] yields code 0 in
  * every subspace, [[PqTables]] an all-zero table (both deterministic; a
  * zero vector has no direction, and downstream exact re-rank scores it
  * NULL cosine the same way the raw lane does).
  */
private[graft] trait PqCodecBase extends BinaryExpression {
  /** The embedding input. */
  def emb: Expression
  /** Flattened codebooks literal: m·ksub·subDim floats, codeword-major
    * (sub, then code, then component) — must be foldable.
    */
  def books: Expression
  def m: Int
  def ksub: Int

  override def left: Expression = emb
  override def right: Expression = books
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (!ok(emb.dataType) || !ok(books.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> (embedding, codebooks), got " +
          s"${emb.dataType.simpleString} and ${books.dataType.simpleString}")
    else if (!books.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName codebooks must be foldable")
    else if (m < 1 || ksub < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName m=$m ksub=$ksub must be >= 1")
    else {
      val n = books.eval().asInstanceOf[ArrayData].numElements()
      if (n % (m * ksub) != 0)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName codebook length $n not divisible by m*ksub=${m * ksub}")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  /** Parsed codebook (reference object in codegen — never literal-inlined). */
  @transient protected lazy val flatBooks: Array[Float] =
    books.eval().asInstanceOf[ArrayData].toFloatArray()
  protected def subDim: Int = flatBooks.length / (m * ksub)
  /** ½‖c‖² per (sub, code), precomputed left-to-right in double. */
  @transient protected lazy val halfCn2: Array[Double] = {
    val sd = subDim
    Array.tabulate(m * ksub) { sc =>
      var acc = 0.0
      var i = 0
      while (i < sd) {
        val v = flatBooks(sc * sd + i).toDouble
        acc += v * v
        i += 1
      }
      0.5 * acc
    }
  }

  /** Left-to-right ‖x‖ (Σ x² then sqrt); NaN marks a null element. */
  protected final def normOf(x: ArrayData, n: Int): Double = {
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return Double.NaN
      val v = x.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }
}

/** PQ code assignment: array<int> of `m` codes, codes(s) =
  * argmax_c (dot(x_s, book[s][c])/‖x‖ − ½‖book[s][c]‖²), ties to the
  * smaller code. See [[PqCodecBase]] for the shared contract.
  */
case class PqEncode(emb: Expression, books: Expression, m: Int, ksub: Int)
    extends PqCodecBase {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val sd = subDim
    if (x.numElements() != m * sd) return null
    val nrm = normOf(x, m * sd)
    if (nrm.isNaN) return null
    val codes = new Array[Int](m)
    if (nrm != 0.0) {
      var s = 0
      while (s < m) {
        var best = 0
        var bestScore = Double.NegativeInfinity
        var c = 0
        while (c < ksub) {
          var d = 0.0
          var i = 0
          while (i < sd) {
            d += x.getFloat(s * sd + i).toDouble * flatBooks((s * ksub + c) * sd + i).toDouble
            i += 1
          }
          val score = d / nrm - halfCn2(s * ksub + c)
          if (score > bestScore) { bestScore = score; best = c }
          c += 1
        }
        codes(s) = best
        s += 1
      }
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", flatBooks, "float[]")
    val cn2Ref = ctx.addReferenceObj("pqHalfCn2", halfCn2, "double[]")
    nullSafeCodeGen(ctx, ev, (x, _) => {
      val sd = ctx.freshName("sd")
      val nrm = ctx.freshName("nrm")
      val codes = ctx.freshName("codes")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val score = ctx.freshName("score")
      val bad = ctx.freshName("bad")
      s"""
         |final int $sd = ${subDim};
         |boolean $bad = ($x.numElements() != ${m} * $sd);
         |double $nrm = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < ${m} * $sd; $i++) {
         |    if ($x.isNullAt($i)) { $bad = true; break; }
         |    double v = (double) $x.getFloat($i);
         |    $nrm += v * v;
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  $nrm = Math.sqrt($nrm);
         |  int[] $codes = new int[${m}];
         |  if ($nrm != 0.0) {
         |    for (int $s = 0; $s < ${m}; $s++) {
         |      int $best = 0;
         |      double $bestScore = Double.NEGATIVE_INFINITY;
         |      for (int $c = 0; $c < ${ksub}; $c++) {
         |        double $d = 0.0;
         |        for (int $i = 0; $i < $sd; $i++) {
         |          $d += (double) $x.getFloat($s * $sd + $i)
         |              * (double) $booksRef[($s * ${ksub} + $c) * $sd + $i];
         |        }
         |        double $score = $d / $nrm - $cn2Ref[$s * ${ksub} + $c];
         |        if ($score > $bestScore) { $bestScore = $score; $best = $c; }
         |      }
         |      $codes[$s] = $best;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(emb = newLeft, books = newRight)
}

/** Candidate-side ADC score: Σ_s tables(s)(codes(s)) — `m` array lookups,
  * left-to-right double accumulation from 0.0 (bit-identical to the
  * composed `aggregate(zip_with(codes, tables, (cd, tb) ->
  * element_at(tb, cd + 1)), 0.0, +)` it replaces).
  *
  * Why native: higher-order functions are CodegenFallback, so the composed
  * form dropped the ONE projection on the candidate stream — the IVF-PQ
  * hot path — out of whole-stage codegen, and the interpreted stage then
  * materializes every joined candidate row INCLUDING the query's m·ksub
  * ADC table (~33 KB at 16×256) instead of streaming it virtually: on c8's
  * 10.9k-code corpus that row-copy traffic was 3.2 s of the probe's 7.4 s
  * wall. This expression keeps the stage in codegen; the table array is
  * read in place, never copied.
  *
  * Null contract (mirrors the composed form): null codes/tables array, a
  * null element in either, mismatched lengths, or a code outside its
  * table's [0, len) range → NULL. The range check matters: the composed
  * form's non-ANSI `element_at(tb, cd + 1)` yields NULL on an out-of-range
  * code (e.g. codes persisted under a larger-ksub model than the tables
  * were built with, or a corrupted extent row), while an unchecked
  * `getDouble(code)` on UnsafeArrayData reads ADJACENT BUFFER MEMORY and
  * returns a silently wrong score.
  */
case class PqAdcScore(codes: Expression, tables: Expression)
    extends BinaryExpression {

  override def left: Expression = codes
  override def right: Expression = tables
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"

  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, tables.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (c, t) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<array<double>>), got " +
          s"${c.simpleString} and ${t.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val cd = a.asInstanceOf[ArrayData]
    val tb = b.asInstanceOf[ArrayData]
    val n = cd.numElements()
    if (tb.numElements() != n) return null
    var acc = 0.0
    var s = 0
    while (s < n) {
      if (cd.isNullAt(s) || tb.isNullAt(s)) return null
      val row = tb.getArray(s)
      val code = cd.getInt(s)
      if (code < 0 || code >= row.numElements()) return null
      acc += row.getDouble(code)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cd, tb) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val row = ctx.freshName("row")
      val code = ctx.freshName("code")
      s"""
         |final int $n = $cd.numElements();
         |if ($tb.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $s = 0; $s < $n; $s++) {
         |    if ($cd.isNullAt($s) || $tb.isNullAt($s)) { ${ev.isNull} = true; break; }
         |    org.apache.spark.sql.catalyst.util.ArrayData $row = $tb.getArray($s);
         |    final int $code = $cd.getInt($s);
         |    if ($code < 0 || $code >= $row.numElements()) { ${ev.isNull} = true; break; }
         |    $acc += $row.getDouble($code);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(codes = newLeft, tables = newRight)
}

/** Query-side ADC tables: array<array<double>> with tables(s)(c) =
  * dot(q_s, book[s][c])/‖q‖. Runs once per QUERY row (the broadcast-bounded
  * side) — candidates score with `m` table lookups. See [[PqCodecBase]].
  */
case class PqTables(emb: Expression, books: Expression, m: Int, ksub: Int)
    extends PqCodecBase {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_tables"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val sd = subDim
    if (x.numElements() != m * sd) return null
    val nrm = normOf(x, m * sd)
    if (nrm.isNaN) return null
    val tables = new Array[Any](m)
    var s = 0
    while (s < m) {
      val row = new Array[Double](ksub)
      if (nrm != 0.0) {
        var c = 0
        while (c < ksub) {
          var d = 0.0
          var i = 0
          while (i < sd) {
            d += x.getFloat(s * sd + i).toDouble * flatBooks((s * ksub + c) * sd + i).toDouble
            i += 1
          }
          row(c) = d / nrm
          c += 1
        }
      }
      tables(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(tables)
  }

  /** Public bridge for the generated code ([[nullSafeEval]] compiles to a
    * protected member Janino-generated classes cannot call).
    */
  def evalTables(emb: Any): Any = nullSafeEval(emb, null)

  // Query-side only (bounded rows): route codegen through the interpreted
  // eval — the surrounding stage stays in whole-stage codegen, and the
  // nested-array construction code isn't worth generating.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqTables", this, classOf[PqTables].getName)
    val embCode = emb.genCode(ctx)
    val result = ctx.freshName("result")
    ev.copy(code = code"""
      ${embCode.code}
      Object $result = null;
      if (!${embCode.isNull}) {
        $result = $self.evalTables(${embCode.value});
      }
      boolean ${ev.isNull} = ($result == null);
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        (org.apache.spark.sql.catalyst.util.ArrayData) $result;
    """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(emb = newLeft, books = newRight)
}
