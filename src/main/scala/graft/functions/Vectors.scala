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
    * plane(j)[i] derived from (i = 1-based dim index, j = GLOBAL plane
    * index) by integer mixing — no RNG state, so buckets are reproducible
    * across runs/engines and restatable in ANSI SQL (every intermediate
    * stays far below 2^63: no wrapping arithmetic). Values in {-3..3}.
    *
    * Round 19 — the §6.1l ladder's ×30 rung caught the original linear
    * form `(i·2654435761 + j·40503) mod 7` PERIODIC in j with period 7
    * (both multipliers reduce mod 7; 40503 ≡ 1): the whole scheme had
    * only SEVEN distinct hyperplanes, so any plane budget past 7 silently
    * stopped growing the key space (buckets saturated at ~2^7 per band —
    * measured 1008 used of 8192 at planes=10 — and candidates went
    * quadratic: 34.5M at n=60k vs the 15.4M design ceiling), and adjacent
    * BANDS shared planes whenever global indices collided mod 7 — the
    * real source of the depressed 0.41–0.57 recall "transfer" §6.1k had
    * attributed to lattice quantization. The cross-term form
    * `(i·(j+13)·40503 mod 1000003) mod 7` fixes both: the inner modulus
    * is prime, so plane slopes `(j+13)·40503 mod 1000003` are distinct
    * for every j < 1000003 (no period, no cross-band sharing), while the
    * outer mod-7 keeps the {-3..3} lattice and the double-mod chain is
    * exactly expressible in SQL on non-negative BIGINTs.
    */
  def planeComponent(i: Column, j: Int): Column =
    pmod(pmod(i * lit((j + 13).toLong * 40503L), lit(1000003L)), lit(7)) - lit(3)

  /** [[planeComponent]] as driver-side arithmetic — the ONE statement the
    * literal-plane fast/fixed-point paths tabulate from (two copies of the
    * mixing could drift and silently split the bucket space between the
    * scale path and its portable witness).
    */
  private[graft] def planeComponentLong(i: Long, j: Long): Long =
    Math.floorMod(Math.floorMod(i * (j + 13L) * 40503L, 1000003L), 7L) - 3L

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
        planeComponentLong(idx + 1L, (firstPlane + j).toLong).toFloat
      }
      val d = dot(emb, typedLit(plane))
      // (d >= 0)::long * bit — value-identical to the old two-sided when
      // (d ≥ 0 → bit; d < 0 → 0; NULL projection → NULL bit, so a null
      // element — which DuckDB's SUM would silently skip — still nulls the
      // bucket out of the band equi-join, never a silent collision into
      // bit 0) but evaluates the projection ONCE: CaseWhen branch
      // conditions are exempt from codegen subexpression elimination, so
      // the when-form ran every dot twice (r21).
      (d >= 0).cast("long") * lit(1L << j)
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
        planeComponentLong(idx + 1L, (firstPlane + j).toLong)
      }
      val proj = aggregate(
        zip_with(emb, typedLit(plane),
          (x, c) => floor(x.cast("double") * lit(unit)).cast("long") * c),
        lit(0L), (acc, v) => acc + v)
      // (proj >= 0)::long * bit — same single-eval rewrite (and null
      // contract) as lshBucketFast: a null embedding element nulls the
      // zip_with fold, and that NULL must become a NULL bucket — the
      // DuckDB witness's SUM skips NULL terms, so mapping the null fold to
      // bit 0 here could disagree with the oracle's bucket for such rows;
      // a NULL bucket drops out of the band join on BOTH engines. The old
      // two-sided when ran the interpreted fold twice per plane.
      (proj >= 0).cast("long") * lit(1L << j)
    }
    when(size(emb) === dims, bits.reduce(_ + _)).otherwise(lit(null).cast("long"))
  }
}
