package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe replacements for window shapes whose PARTITION BY key has too
  * few distinct values to parallelize: `Window.partitionBy(lowCardKey)` puts
  * each key's entire row set on ONE task's sort — at 100 TB with a 5-value
  * key that is N/5 rows per task, the classic full-shuffle-on-low-cardinality
  * scale killer.
  *
  * The trick (textbook distributed order statistics): range-slice each key
  * group by the ORDER BY value into `slices` sub-partitions, rank WITHIN a
  * slice (parallelism = |keys| x slices), then restore global positions by
  * adding per-slice prefix offsets computed from a tiny (|keys| x slices)-row
  * aggregate. Slice boundaries come from `percentile_approx`, so slices stay
  * balanced under value skew — and correctness never depends on the
  * approximation: boundaries only decide WHERE the group is cut, while the
  * global position arithmetic is exact regardless of the cut.
  */
object ScalableWindow {

  /** Adaptive slice count: `max(64, 2 x defaultParallelism)`, capped at
    * 4096. The big sort's parallelism in the constant-key regime (global
    * order statistics) is exactly `|part| x slices`, so a constant default
    * would cap a 100 TB global percentile at 64 tasks (~1.5 TB each on a
    * 1000-executor cluster); deriving it from the cluster keeps per-task
    * slice volume bounded as the cluster grows, while the 64 floor
    * preserves the local-mode task shape (local[32] -> max(64, 64) = 64).
    * The 4096 cap bounds the two slice-count-linear terms — the per-row
    * boundary scan in step 2 and the sketch accuracy below — on very large
    * clusters (4096 tasks x a few GB per slice covers the charter scale;
    * past that, slices is the caller's explicit knob). The offset table
    * stays |part| x slices rows — broadcast-trivial at any realistic
    * cluster size.
    */
  def defaultSlices(df: DataFrame): Int =
    math.min(4096,
      math.max(64, 2 * df.sparkSession.sparkContext.defaultParallelism))

  /** Exact global positions (`ROW_NUMBER() OVER (PARTITION BY part ORDER BY
    * value, tie)`) without a single-task sort per `part` value — the shared
    * machinery under [[ntile]] and any rank-family rewrite. Returns the
    * input plus `as` (1-based position) and `_n` (group size; callers that
    * don't need it should drop it).
    *
    * Contract: (value, tie) is a total order within each part group (same
    * requirement the plain-window form needs for a deterministic result).
    * NULL values: `null > boundary` is NULL, so every null-valued row lands
    * in slice 0 — consistent with ASC NULLS FIRST, which is also how the
    * within-slice sort orders them, so positions match the plain window.
    *
    * Scale shape: two passes over the input (a map-side-combined count per
    * (part, slice) and one within-slice sort), one broadcast of the
    * (|part| x slices)-row offset table, zero single-task big sorts.
    */
  def rowNumber(df: DataFrame, part: String, value: String, tie: String,
                as: String = "row_number", slices: Int = 0): DataFrame = {
    val nSlices = if (slices == 0) defaultSlices(df) else slices
    require(nSlices > 1, s"slices must be > 1, got $nSlices")

    // 1. Per-part approximate slice boundaries on the order value. Balanced
    //    even under skew; any boundary set is CORRECT (see scaladoc), so the
    //    sketch accuracy only tunes slice-size variance. Accuracy must SCALE
    //    with the slice count (a fixed 1000 cannot distinguish more than
    //    ~1000 quantiles — boundaries would duplicate and leave empty
    //    slices, silently capping effective parallelism): 16x slices keeps
    //    the 1/accuracy rank error at ~6% of the 1/slices width at any
    //    slice count, the same evenness the old 64-slice/1000 pairing had.
    val accuracy = math.max(1000, 16 * nSlices)
    val probs = (1 until nSlices).map(_.toDouble / nSlices)
    val bounds = df.groupBy(col(part))
      .agg(percentile_approx(col(value), typedlit(probs), lit(accuracy)).as("_bnds"))

    // 2. Slice id = number of boundaries strictly below this row's value —
    //    monotone in value, so slice order == value order, and equal values
    //    always land in the same slice (ties never straddle a boundary, which
    //    is what keeps within-slice ranks composable into global positions).
    //    coalesce guards the all-NULL group: percentile_approx yields a NULL
    //    boundary array there, aggregate(NULL, ...) a NULL slice, and the
    //    (part, _slice) inner joins below would silently drop every row of
    //    the group — the plain window it replaces still ranks them (NULLS
    //    FIRST), so they must land in slice 0 like any other null value.
    val sliced = df.join(broadcast(bounds), part)
      .withColumn("_slice",
        coalesce(
          aggregate(col("_bnds"), lit(0),
            (acc: Column, b: Column) => acc + when(col(value) > b, 1).otherwise(0)),
          lit(0)))
      .drop("_bnds")

    // 3. Slice sizes -> per-slice global offsets. Computed from `sliced`
    //    (BEFORE the window) so the broadcast side is one map-side-combined
    //    aggregate, not a recompute through the sort. The prefix sum runs
    //    per part over the collected (≤ `slices`-entry, bounded by
    //    construction) slice list as ONE array fold — deliberately not a
    //    window: with a CONSTANT part key (h2/pr1's global-order-statistics
    //    regime) Catalyst folds the partition key away and a prefix-sum
    //    window would execute as the unpartitioned WindowExec this operator
    //    family exists to avoid (and PlanQualitySpec bans).
    val sizes = sliced.groupBy(col(part), col("_slice")).agg(count(lit(1)).as("_cnt"))
    val offs = sizes.groupBy(col(part))
      // sort_array orders by the struct's leading field `_slice` (unique
      // within a part), so the fold walks slices in slice order
      .agg(sort_array(collect_list(struct(col("_slice"), col("_cnt")))).as("_sc"))
      .withColumn("_n",
        aggregate(col("_sc"), lit(0L), (a, x) => a + x.getField("_cnt")))
      .withColumn("_po", aggregate(col("_sc"),
        struct(lit(0L).as("t"), expr("CAST(array() AS ARRAY<BIGINT>)").as("o")),
        (a, x) => struct(
          (a.getField("t") + x.getField("_cnt")).as("t"),
          concat(a.getField("o"), array(a.getField("t"))).as("o")),
        a => a.getField("o")))
      .select(col(part), col("_n"),
        explode(arrays_zip(col("_sc"), col("_po"))).as("_z"))
      .select(col(part), col("_z._sc._slice").as("_slice"),
        col("_z._po").as("_off"), col("_n"))

    // 4. Within-slice rank: the only big sort, parallelism |part| x slices.
    val wSlice = Window.partitionBy(col(part), col("_slice"))
      .orderBy(col(value), col(tie))
    val numbered = sliced.withColumn("_rn", row_number().over(wSlice))

    // 5. Global position = slice offset + within-slice rank.
    numbered.join(broadcast(offs), Seq(part, "_slice"))
      .withColumn(as, col("_off") + col("_rn"))
      .drop("_slice", "_rn", "_off")
  }

  /** Exact `PERCENT_RANK() OVER (PARTITION BY part ORDER BY value, tie)` on
    * the sliced [[rowNumber]] machinery: (pos−1)/(n−1), 0 for a 1-row
    * group (SQL convention). The (value, tie) total-order contract makes
    * RANK equal ROW_NUMBER, so this matches the built-in exactly while the
    * sort parallelism stays |part|·slices.
    */
  def percentRank(df: DataFrame, part: String, value: String, tie: String,
                  as: String = "percent_rank", slices: Int = 0): DataFrame =
    rowNumber(df, part, value, tie, as = "_pos", slices = slices)
      .withColumn(as,
        when(col("_n") === 1L, lit(0.0))
          .otherwise((col("_pos") - lit(1L)).cast("double") / (col("_n") - lit(1L)).cast("double")))
      .drop("_pos", "_n")

  /** Exact `NTILE(k) OVER (PARTITION BY part ORDER BY value, tie)` without a
    * single-task sort per `part` value: [[rowNumber]] positions plus the
    * SQL-standard bucket arithmetic. Returns the input rows plus an integer
    * bucket column `as` (1-based; the first n%k buckets get one extra row).
    */
  def ntile(df: DataFrame, part: String, value: String, tie: String,
            k: Int, as: String = "ntile", slices: Int = 0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // q = floor(n/k), r = n%k; buckets 1..r hold q+1 rows, the rest q.
    // (q=0 i.e. n<k: the `big` branch covers all rows, so the q division
    // below is unreachable; greatest(q,1) guards it anyway.)
    val pos = col("_pos")
    val q = floor(col("_n") / lit(k)).cast("long")
    val r = col("_n") % lit(k.toLong)
    val big = (q + lit(1L)) * r
    val bucket = when(pos <= big, ceil(pos.cast("double") / (q + lit(1L)).cast("double")))
      .otherwise(r + ceil((pos - big).cast("double") / greatest(q, lit(1L)).cast("double")))
    rowNumber(df, part, value, tie, as = "_pos", slices = slices)
      .withColumn(as, bucket.cast("int"))
      .drop("_pos", "_n")
  }
}
