package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content integrity at table scale: an order-insensitive, engine-portable
  * checksum over a relation, for sink-parity and replica checks (does the
  * JDBC copy equal the parquet truth? did a migration lose rows?) without
  * ever moving the data — each side aggregates locally and compares two
  * numbers.
  *
  * Shape: one map-side-combined aggregate (COUNT + SUM of a per-row 64-bit
  * hash). Addition is commutative, so the checksum is independent of row
  * order, partitioning, and parallelism — and the per-row hash is defined
  * as arithmetic every SQL engine reproduces (md5 bytes, not xxhash64),
  * so the SAME number comes out of Spark and the DuckDB oracle.
  */
object Integrity {

  /** Lower 64 bits of md5(c) as an unsigned DECIMAL(20,0) — the md5 digest's
    * LAST 8 bytes read little-endian, matching DuckDB's `md5_number_lower`
    * so checks can run cross-engine without custom UDFs on either side.
    * Implemented by reversing the tail byte pairs of the hex form and
    * radix-converting (`conv` treats 16 hex chars as unsigned 64-bit).
    */
  def md5Lower64(c: Column): Column = {
    val h = md5(c)
    val le = concat((0 until 8).map(i => substring(h, 31 - 2 * i, 2)): _*)
    conv(le, 16, 10).cast("decimal(20,0)")
  }

  /** Canonical row image for hashing: values cast to string, joined with a
    * U+0001 separator, NULL encoded as U+0002 (distinct from the empty
    * string, and concat_ws would otherwise silently drop nulls). Callers
    * pick columns whose string form is engine-stable — integers and
    * strings are; raw doubles/timestamps need explicit formatting first.
    */
  def canonicalRow(cols: Seq[String]): Column =
    concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*)

  /** The checksum AGGREGATE itself — sum of per-row portable hashes,
    * emitted as its decimal-digit STRING (an opaque token to compare;
    * decimals past 2^63 degrade to float64 in common client bridges
    * (pandas), which would corrupt exactly the digits the comparison is
    * for). The ONE definition every checksum consumer composes
    * ([[tableChecksum]], [[groupedChecksum]], the c3 export manifest) —
    * a second copy of the cast chain would silently desynchronize
    * manifests from shard checksums.
    */
  def checksumAgg(cols: Seq[String]): Column = {
    require(cols.nonEmpty, "cols must be non-empty")
    checksumAggOf(canonicalRow(cols)).as("checksum")
  }

  /** [[checksumAgg]] over an ARBITRARY row image (already canonicalized by
    * the caller — e.g. c6's `'c6:' || doc_id` shard-manifest image), so
    * consumers that hash something other than a plain column list still
    * share the one sum/decimal(38,0)/string ladder instead of restating
    * it (a second copy would silently desynchronize manifests from shard
    * checksums if either side changed). Unaliased: callers name it.
    */
  def checksumAggOf(image: Column): Column =
    sum(md5Lower64(image)).cast("decimal(38,0)").cast("string")

  /** (n_rows, checksum): row count plus the sum of per-row hashes. Equal
    * checksums and counts mean equal multisets of canonical rows (up to
    * md5-collision odds, ~2^-64 per pair).
    */
  def tableChecksum(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(count(lit(1)).as("n_rows"), checksumAgg(cols))

  /** Per-group [[tableChecksum]]: (groupCols..., n_rows, checksum) — the
    * manifest shape a sharded training export ships beside its files, so a
    * consumer verifies each shard independently (and a re-export proves
    * itself identical shard by shard) without any side re-reading the
    * other's data. Same one-pass map-side-combined aggregate; the group
    * keys ride the same shuffle.
    */
  def groupedChecksum(df: DataFrame, groupCols: Seq[String],
                      cols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), checksumAgg(cols))
  }

  /** Key-level diff of two table versions — [[tableChecksum]] says WHETHER
    * two snapshots diverged; this says WHERE: one row per key that was
    * added, removed, or changed between `oldDf` and `newDf`, with both
    * versions' attribute values side by side (old_ and new_ prefixes).
    * Unchanged keys
    * are dropped, so output is proportional to the delta, not the table.
    *
    * Shape: ONE full-outer equi-join on the key (AQE broadcasts a small
    * side) plus a null-safe attr comparison — no windows, no second pass.
    * At most one row per key per side (snapshot contract; pre-aggregate
    * versioned tables to their open slice first).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, key: String,
                   attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "attrs must be non-empty")
    val o = oldDf.select((key +: attrs).map(col): _*).alias("o")
    val n = newDf.select((key +: attrs).map(col): _*).alias("n")
    val differs = attrs.map(a => !(col(s"o.$a") <=> col(s"n.$a"))).reduce(_ || _)
    val changeType = when(col(s"o.$key").isNull, "added")
      .when(col(s"n.$key").isNull, "removed")
      .when(differs, "changed")
    o.join(n, col(s"o.$key") === col(s"n.$key"), "full_outer")
      .withColumn("change_type", changeType)
      .filter(col("change_type").isNotNull)
      .select(coalesce(col(s"o.$key"), col(s"n.$key")).as(key) +:
        col("change_type") +:
        (attrs.map(a => col(s"o.$a").as(s"old_$a")) ++
          attrs.map(a => col(s"n.$a").as(s"new_$a"))): _*)
  }
}
