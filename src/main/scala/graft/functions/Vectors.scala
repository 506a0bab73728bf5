package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, as higher-order
  * function expressions (codegen-friendly, no UDF boxing).
  *
  * Precision contract: elements are cast to DOUBLE *before* multiplication so
  * the arithmetic matches the DuckDB oracle (which sums
  * `CAST(x AS DOUBLE) * CAST(y AS DOUBLE)`) to the last ulp modulo summation
  * order; results that feed hash-compares are rounded to 4 decimals.
  */
object Vectors {

  /** Native codegen'd dot product ([[DotF32]], registered by
    * [[graft.GraftExtensions]] — every [[graft.Sessions]] session has it).
    * Same arithmetic as [[dotHof]] (float→double widen, left-to-right
    * accumulation), measured 18x faster: primitive loop instead of
    * interpreted lambdas with per-element boxing.
    */
  def dot(a: Column, b: Column): Column = call_function("dot_f32", a, b)

  /** Reference HOF formulation — kept as the pure-`functions._` fallback for
    * sessions without [[graft.GraftExtensions]], and as the equivalence
    * witness in DotF32Spec.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = dot(a, a)

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (sqrt(normA) * sqrt(normB))

  def cosine(a: Column, b: Column): Column = cosine(a, b, norm2(a), norm2(b))

  /** Deterministic pseudo-random hyperplane component for LSH bucketing:
    * plane(j)[i] derived from (i, j) by integer mixing — no RNG state, so
    * buckets are reproducible across runs/engines. Values in {-3..3}.
    */
  def planeComponent(i: Column, j: Int): Column =
    pmod(i * lit(2654435761L) + lit(j) * lit(40503L), lit(7)) - lit(3)

  /** Sign bucket over `nPlanes` hyperplanes → integer bucket id in
    * [0, 2^nPlanes). Embedding dims are indexed 1-based.
    */
  def lshBucket(emb: Column, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { j =>
      val proj = aggregate(
        zip_with(emb, transform(sequence(lit(1), size(emb)), i => planeComponent(i, j)),
          (x, p) => x.cast("double") * p.cast("double")),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** [[lshBucket]] with a STATIC embedding width: the hyperplanes become
    * literal `array<float>` columns (components are −3..3, exact in float)
    * and each projection is one native [[DotF32]] — no per-row interpreted
    * plane construction, no lambda evaluation. Bit-identical buckets to
    * [[lshBucket]] for `dims`-length inputs (same products, same
    * accumulation order — VectorsSpec); an input of any OTHER length gets a
    * NULL bucket (dot_f32's length guard) instead of lshBucket's adaptive
    * projection, so `dims` must match the data.
    */
  def lshBucketFast(emb: Column, nPlanes: Int, dims: Int, firstPlane: Int = 0): Column = {
    val bits = (0 until nPlanes).map { j =>
      val plane = Array.tabulate(dims) { idx =>
        (Math.floorMod((idx + 1) * 2654435761L + (firstPlane + j).toLong * 40503L, 7L) - 3L).toFloat
      }
      val d = dot(emb, typedLit(plane))
      // two-sided when: a NULL projection (null element inside the array,
      // which DuckDB's SUM would silently skip) propagates to a NULL bit
      // and thus a NULL bucket that drops out of the band equi-join —
      // never a silent collision into bit 0
      when(d >= 0, lit(1L << j)).when(d < 0, lit(0L))
    }
    // explicit width guard: a mismatched-length dot must null the bucket,
    // not land in bucket 0 — null buckets drop out of equi-joins instead
    when(size(emb) === dims, bits.reduce(_ + _)).otherwise(lit(null).cast("long"))
  }

  /** [[lshBucketFast]]'s PORTABLE twin: the same integer-mixed hyperplanes,
    * but the projection is EXACT BIGINT arithmetic — each coordinate is
    * floored to `2^scaleBits` fixed-point units (power-of-two scaling of a
    * float is exact in double, floor is unambiguous on every engine) and
    * multiplied by the integer plane component, so the sign test
    * `Σ q_i·c_i ≥ 0` is order-independent and reproduces digit for digit in
    * ANSI SQL. [[lshBucketFast]]'s float dot stays the scale path (native
    * codegen, 18x faster); this twin exists so the SRP banding machinery is
    * oracle-checkable with ZERO ulp risk — a float projection's sign can in
    * principle flip with summation order when the projection is within ulps
    * of 0, which a witness must rule out by construction, not by luck.
    * Quantization changes WHICH side of a plane a borderline vector falls
    * on vs the float path — irrelevant for a witness, which only needs both
    * engines to agree with EACH OTHER.
    */
  def lshBucketFixedPoint(emb: Column, nPlanes: Int, dims: Int,
                          firstPlane: Int = 0, scaleBits: Int = 20): Column = {
    require(scaleBits >= 0 && scaleBits <= 30, s"scaleBits in [0,30], got $scaleBits")
    val unit = (1L << scaleBits).toDouble
    val bits = (0 until nPlanes).map { j =>
      val plane = Array.tabulate(dims) { idx =>
        Math.floorMod((idx + 1) * 2654435761L + (firstPlane + j).toLong * 40503L, 7L) - 3L
      }
      val proj = aggregate(
        zip_with(emb, typedLit(plane),
          (x, c) => floor(x.cast("double") * lit(unit)).cast("long") * c),
        lit(0L), (acc, v) => acc + v)
      // two-sided when (same contract as lshBucketFast): a null embedding
      // element nulls the zip_with fold, and that NULL must become a NULL
      // bucket — the DuckDB witness's SUM skips NULL terms, so mapping the
      // null fold to bit 0 here could disagree with the oracle's bucket for
      // such rows; a NULL bucket drops out of the band join on BOTH engines
      when(proj >= 0, lit(1L << j)).when(proj < 0, lit(0L))
    }
    when(size(emb) === dims, bits.reduce(_ + _)).otherwise(lit(null).cast("long"))
  }
}
