package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins: as-of join and
  * interval/range join (the charter's named examples of "operator the
  * reference engine family has but Spark doesn't").
  *
  * Both are composed from existing operators (SURVEY.md §2.9's preference
  * order (a)): the as-of join is a union + running window — ONE shuffle on
  * the key, state bounded by a single row per partition stream — and the
  * range join is band-bucketed so the join is an equi-join on band id. No
  * custom SparkStrategy is needed: neither shape degenerates to a cartesian
  * /broadcast-nested-loop plan, which is what disqualifies the naive theta
  * join at 100 TB.
  */
object Temporal {

  /** As-of join: for each left row, the single right row with the nearest
    * `rightTs` at-or-before (`backward`, default) or at-or-after (`forward`)
    * the left row's `leftTs`, within equal join `keys`. Left rows with no
    * eligible right row keep nulls (LEFT semantics) — matches DuckDB/kdb/
    * pandas `merge_asof` with `allow_exact_matches=true`.
    *
    * Implementation: tag + union both sides, then one running
    * `last(payload, ignoreNulls)` window ordered by (ts, side) with right
    * rows sorting before left rows at equal ts (inclusiveness). This is the
    * scale-safe as-of: a single hash shuffle on `keys`, sort within
    * partitions, no time-range candidate explosion — at 100 TB the cost is
    * the same as one repartition+sort, regardless of how far back matches
    * lie.
    *
    * Determinism contract: `right` must be unique per (keys, rightTs) —
    * pre-aggregate duplicates away, otherwise which duplicate wins depends
    * on sort tie order.
    *
    * Output: all left columns plus `payload` columns from the matched right
    * row (names must not clash with left's).
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String],
               direction: String = "backward"): DataFrame = {
    require(payload.nonEmpty, "payload must name at least one right column")
    require(payload.forall(right.columns.contains), s"payload ⊄ right columns")
    val clash = payload.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"payload columns clash with left: ${clash.mkString(", ")}")
    require(direction == "backward" || direction == "forward", direction)
    // the implementation reserves these internal names; an input column with
    // one of them would be shadowed or break the final select silently
    val reserved = Set("__ts", "__side", "__pay", "__row", "__match")
    val taken = (left.columns ++ right.columns ++ keys).toSet.intersect(reserved)
    require(taken.isEmpty,
      s"input columns clash with joinAsOf internals: ${taken.mkString(", ")}")

    val keyCols = keys.map(col)
    val paySchema = right.select(struct(payload.map(col): _*).as("__pay")).schema("__pay").dataType
    val leftRow = struct(left.columns.map(col): _*)
    val leftSchema = left.select(leftRow.as("__row")).schema("__row").dataType

    val l2 = left.select(keyCols ++ Seq(
      col(leftTs).as("__ts"), lit(1).as("__side"),
      lit(null).cast(paySchema).as("__pay"), leftRow.as("__row")): _*)
    // SQL comparison semantics: a null-keyed or null-ts right row can never
    // satisfy `rightTs <= leftTs` (or >=) for ANY left row — drop it before
    // the union, otherwise null ordering would slot it where the running
    // last() hands its payload to real left rows.
    val r2 = right
      .filter((keys.map(col(_).isNotNull) :+ col(rightTs).isNotNull).reduce(_ && _))
      .select(keyCols ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        struct(payload.map(col): _*).as("__pay"),
        lit(null).cast(leftSchema).as("__row")): _*)

    // Null-ts LEFT rows must match nothing: sort them BEFORE every right row
    // in either direction (nulls_first), so the running window sees no
    // payload yet. (Null-keyed left rows partition alone once null-keyed
    // right rows are dropped, so they come out null-matched too.)
    val ord =
      if (direction == "backward") Seq(col("__ts").asc_nulls_first, col("__side").asc)
      else Seq(col("__ts").desc_nulls_first, col("__side").asc)
    val w = Window.partitionBy(keyCols: _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l2.unionByName(r2)
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__row.*") +: payload.map(p => col(s"__match.$p").as(p)): _*)
  }

  /** As-of join with a match tolerance — the feature-engineering standard
    * "latest right row within the trailing window, else null". EXACT as a
    * post-filter on the plain as-of match: backward picks the LATEST right
    * row ≤ leftTs, so if that row falls outside the window no earlier row
    * can fall inside it (they are strictly farther); symmetric for forward.
    * So tolerance costs nothing extra at scale — same single shuffle as
    * [[joinAsOf]], then a row-local null-out of payload columns. The
    * comparison is full-precision (timestamps cast to fractional epoch
    * seconds), matching SQL INTERVAL semantics at sub-second resolution.
    * `rightTs` must not clash with a left column (it rides along in the
    * payload to evaluate the window).
    */
  def joinAsOfWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTs: String, rightTs: String, payload: Seq[String],
                     toleranceSec: Double,
                     direction: String = "backward"): DataFrame = {
    require(toleranceSec >= 0, s"toleranceSec must be >= 0, got $toleranceSec")
    val payAll = (payload :+ rightTs).distinct
    val out = joinAsOf(left, right, keys, leftTs, rightTs, payAll, direction)
    val within = col(rightTs).isNotNull &&
      abs(col(leftTs).cast("double") - col(rightTs).cast("double")) <= toleranceSec
    val nulled = payAll.foldLeft(out)((df, p) =>
      df.withColumn(p, when(within, col(p))))
    if (payload.contains(rightTs)) nulled else nulled.drop(rightTs)
  }

  /** Floor division that is correct for negative values too (Spark's `/` on
    * longs truncates toward zero; bands must tile the whole number line).
    * Uses integral `div` — a double-division quotient loses precision past
    * 2^53 and would band extreme long keys incorrectly.
    */
  private def floorDiv(c: Column, w: Long): Column =
    // (c - pmod) is exactly divisible by w; the division runs in DECIMAL so
    // quotients beyond 2^53 stay exact (double division would mis-band
    // extreme long keys), and the cast back to long is lossless.
    (((c - pmod(c, lit(w))).cast("decimal(38,0)") / lit(w)).cast("long"))

  /** Band-bucketed range (interval) join: pairs every point row with every
    * interval row of the same band having `lo <= point <= hi` (inclusive).
    * `pointCol`/`loCol`/`hiCol` are integral (epoch days/seconds, ids, …).
    *
    * Each interval is exploded to the bands it overlaps
    * (`floor(lo/w) .. floor(hi/w)`), the point carries its single band, and
    * the match is an equi-join on band + residual range filter — Spark plans
    * a plain shuffled hash/sort-merge join, never a cartesian. Exact: a
    * matching pair shares exactly one band (the point's), so no dedup is
    * needed. Cost scales with Σ interval_span/w (band replication) plus true
    * match count; pick `bandWidth` near the typical interval span so
    * replication stays O(1) per interval — the standard bin-size tradeoff of
    * every range-join optimizer.
    *
    * Output: all point columns + all interval columns (names must be
    * disjoint).
    */
  def bandRangeJoin(points: DataFrame, pointCol: String,
                    intervals: DataFrame, loCol: String, hiCol: String,
                    bandWidth: Long): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    val clash = points.columns.toSet.intersect(intervals.columns.toSet)
    require(clash.isEmpty, s"point/interval column names clash: ${clash.mkString(", ")}")

    val banded = intervals.withColumn("__band",
      explode(sequence(floorDiv(col(loCol), bandWidth), floorDiv(col(hiCol), bandWidth))))
    points
      .withColumn("__band", floorDiv(col(pointCol), bandWidth))
      .join(banded, "__band")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__band")
  }
}
