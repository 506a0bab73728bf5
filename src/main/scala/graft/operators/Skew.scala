package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for aggregations (charter: "salting for skew").
  *
  * A hot grouping key sends its entire weight through one reducer; salting
  * splits each key into `buckets` sub-keys for the first (partial) stage and
  * re-combines in a second stage over at most |keys|·buckets rows. AQE's
  * skew handling covers joins; aggregation skew on a pathological key is
  * still the pipeline author's job — this is the reusable form of the
  * x1_salted_agg query, which oracle-checks its equivalence to the plain
  * groupBy.
  *
  * The salt is deterministic (hash of a caller-chosen expression, e.g. a
  * row id), so results are reproducible run to run.
  */
object Skew {

  /** Two-stage salted aggregation.
    *
    * @param saltFrom expression whose hash spreads rows across sub-keys
    * @param partials alias → aggregate over the raw rows, run per
    *                 (keys, salt) — e.g. `"n" -> count(lit(1))`
    * @param combines alias → merge of the partials per keys — sum for
    *                 sum/count partials, max for max, min for min
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltFrom: Column, buckets: Int,
                partials: Seq[(String, Column)],
                combines: Map[String, Column => Column]): DataFrame = {
    require(partials.map(_._1).toSet == combines.keySet,
      "every partial alias needs a combine and vice versa")
    require(!df.columns.contains("__salt"),
      "input already has a __salt column — rename it before salting")
    val stage1 = df
      .withColumn("__salt", pmod(xxhash64(saltFrom), lit(buckets)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }: _*)
    stage1
      .groupBy(keys.map(col): _*)
      .agg(combines(partials.head._1)(col(partials.head._1)).as(partials.head._1),
        partials.tail.map { case (n, _) => combines(n)(col(n)).as(n) }: _*)
  }

  /** Salted equi-join for a probe side skewed on the join keys: each probe
    * row gets a deterministic salt in [0, buckets), the build side is
    * replicated across ALL salts, and the join key becomes (keys, salt) — a
    * hot key's rows now land on `buckets` reducers instead of one. Result is
    * exactly the plain inner join (every probe row meets every matching
    * build row in exactly one salt partition).
    *
    * Use when AQE's skew-join splitting can't apply — streaming joins, or a
    * build side replicated cheaply enough that `buckets`x duplication beats
    * one straggler task. Cost: |right| · buckets build rows.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFrom: Column, buckets: Int): DataFrame = {
    // withColumn would silently REPLACE a pre-existing __salt on either side,
    // changing join semantics without error — refuse instead
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "an input already has a __salt column — rename it before salting")
    val l = left.withColumn("__salt", pmod(xxhash64(saltFrom), lit(buckets)))
    val r = right.withColumn("__salt", explode(sequence(lit(0L), lit(buckets - 1L))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
