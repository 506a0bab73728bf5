package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout keys: interleave the bits of two bucketed
  * dimensions so that sorting by ONE key clusters the data in BOTH — the
  * standard multi-dimensional data-skipping layout (Bayer/Markl UB-trees;
  * the technique behind Delta/Iceberg Z-ORDER OPTIMIZE). At 100 TB a table
  * sorted by `a` alone prunes parquet row groups only for filters on `a`;
  * written in z-order, min/max footer stats stay tight on BOTH dimensions,
  * so either filter (or a box on both) skips most files.
  *
  * Everything here is plain integer arithmetic (shifts/masks composed at
  * plan-build time into one codegen'd expression) — engine-portable, so the
  * key computation is DuckDB-oracle-checkable, and cheap enough to compute
  * on write for every row.
  */
object ZCurve {

  /** Interleave the low `bits` bits of two non-negative bucket ids:
    * a's bit i → result bit 2i, b's bit i → result bit 2i+1. Inputs must
    * already be rank/bucket ids in [0, 2^bits) — bucketing policy (range,
    * hash, quantile) is the caller's, because it is a data-model decision.
    * bits ≤ 31 keeps the result in a positive long.
    */
  def interleave(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val terms: Seq[Column] = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** N-dimensional Morton interleave: dimension j's bit i lands at result
    * bit i·n + j (round-robin placement, the 2-D [[interleave]] generalized).
    * n·bits ≤ 62 keeps the key in a positive long. Same use: sort/range-
    * partition by the one key, stay clustered in every dimension.
    */
  def interleaveN(dims: Seq[Column], bits: Int): Column = {
    val n = dims.size
    require(n >= 2, s"need at least 2 dimensions, got $n")
    require(bits >= 1 && n * bits <= 62, s"n*bits must be in [2, 62], got ${n * bits}")
    val terms: Seq[Column] = for {
      i <- 0 until bits
      (d, j) <- dims.zipWithIndex
    } yield shiftleft(shiftright(d.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Inverse of [[interleave]]: extract dimension `dim` (0 = even bits,
    * 1 = odd bits). Used by tests to prove the roundtrip; production reads
    * never need it (the original columns are still there).
    */
  def deinterleave(z: Column, dim: Int, bits: Int): Column = {
    require(dim == 0 || dim == 1, s"dim must be 0 or 1, got $dim")
    val terms: Seq[Column] = (0 until bits).map { i =>
      shiftleft(shiftright(z.cast("long"), 2 * i + dim).bitwiseAND(lit(1L)), i)
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** Rewrite `df` in z-order on two bucketed dimensions: compute the key,
    * range-repartition + sort by it (range partitioning keeps files
    * disjoint in z, which is what makes footer min/max tight), drop the
    * key. The caller writes the result; parquet footers then carry tight
    * min/max for BOTH source columns.
    */
  def layout(df: DataFrame, aBucket: Column, bBucket: Column, bits: Int,
             numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    df.withColumn("_z", interleave(aBucket, bBucket, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
