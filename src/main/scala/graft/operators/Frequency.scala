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
