package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Heavy-hitter extraction at vocabulary scale: sketch-then-verify.
  *
  * An exact `GROUP BY item HAVING count > n/(k+1)` shuffles one row per
  * DISTINCT item — at 100 TB of text that is the full vocabulary, most of
  * which is about to be thrown away. The two-pass form bounds the shuffle
  * by the answer size instead:
  *
  *  1. SKETCH: one map-side-combined [[graft.functions.MisraGries]]
  *     aggregate (shuffle = k entries per partition) plus the row count in
  *     the same pass. The MG guarantee makes the ≤k candidates a SUPERSET
  *     of every item with frequency > n/(k+1) — nothing to find is lost.
  *  2. VERIFY: exact counts of just the candidates (broadcast semi-join,
  *     shuffle ≤ k rows), keep those with count·(k+1) > n — integer-exact
  *     arithmetic, no double rounding at any n.
  *
  * The candidate list crosses the driver (bounded by k, documented like the
  * k-means sample in Similarity). The final output is deterministic and
  * engine-portable — the sketch's merge-order nondeterminism only ever
  * widens the candidate set, never the verified answer — so query hh1 is
  * DuckDB-oracle-checked even though the sketch itself has no SQL twin.
  */
object Frequency {

  /** Count-Min sketch counters (Cormode & Muthukrishnan 2005) as a
    * relation: `depth` independent hash rows × `width` counters, one row
    * per NON-ZERO (j, idx) cell. The build is a single map-side-combined
    * COUNT over (j, h_j(item)) — shuffle ≤ depth·width rows regardless of
    * corpus size, and cells merge by addition, so sketches from different
    * partitions/days/engines combine losslessly (the mergeability that
    * makes this the streaming/distributed counting workhorse). The hash is
    * [[Integrity.md5Lower64]] over "j:item" — engine-portable integer
    * arithmetic, so the ENTIRE sketch (not just its answers) is
    * reproducible in ANSI SQL: cm1's oracle rebuilds every counter and
    * hash-matches the estimates digit for digit.
    */
  def countMinCounters(df: DataFrame, items: Column, depth: Int,
                       width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    val it = items.cast("string")
    df.select(explode(array((0 until depth).map(lit): _*)).as("j"), it.as("item"))
      .withColumn("idx", (Integrity.md5Lower64(
        concat(col("j").cast("string"), lit(":"), col("item"))) % lit(width))
        .cast("long"))
      .groupBy("j", "idx").agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for `probes` (a small relation with an
    * `item` column) against a counter relation from [[countMinCounters]]:
    * est(t) = MIN over j of counter(j, h_j(t)) — the classic CM upper
    * bound, est ≥ true count always, over-estimate ≤ e·N/width with
    * probability 1−e^−depth. Counters are ≤ depth·width rows → broadcast;
    * the probe side never shuffles.
    */
  def countMinEstimate(counters: DataFrame, probes: DataFrame, depth: Int,
                       width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"depth=$depth width=$width")
    probes.select(col("item").cast("string").as("item"))
      .select(col("item"), explode(array((0 until depth).map(lit): _*)).as("j"))
      .withColumn("idx", (Integrity.md5Lower64(
        concat(col("j").cast("string"), lit(":"), col("item"))) % lit(width))
        .cast("long"))
      .join(broadcast(counters), Seq("j", "idx"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_n"))
  }

  /** Exact items with frequency strictly greater than n/(k+1), with their
    * exact counts, ordered by (count desc, item asc). `items` may be any
    * expression (e.g. an exploded token column); it is cast to string.
    */
  def heavyHitters(df: DataFrame, items: Column, k: Int,
                   as: String = "item"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    val it = items.cast("string")
    val sk = df.agg(
      call_function("mg_sketch", it, lit(k)).as("cands"),
      count(it).as("n")).head()
    val n = sk.getAs[Long]("n")
    val cands = sk.getAs[scala.collection.Seq[Row]]("cands").map(_.getString(0)).toSeq
    import spark.implicits._
    val candDf = cands.toDF(as)
    df.select(it.as(as))
      .join(broadcast(candDf), as)
      .groupBy(as).agg(count(lit(1)).as("freq"))
      .filter(col("freq") * lit(k + 1L) > lit(n))
      .orderBy(desc("freq"), col(as))
  }
}
