package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture apply: collapse an out-of-order log of keyed changes
  * (upserts and deletes) onto a base snapshot, last-writer-wins — the batch
  * core of every CDC ingestion pipeline (Debezium-style feeds, Delta/Hudi
  * merge-on-read compaction).
  *
  * Scale shape: the log collapses through the bounded-heap
  * [[graft.functions.TopKStruct]] aggregate at k=1 — map-side combine ships
  * ONE row per (key, partition) into the shuffle, so a billion-change log
  * with a million distinct keys shuffles like a dimension, not like a log.
  * (The window form — `row_number over (partition by key order by ts desc)`
  * — shuffles and sorts the ENTIRE log; that is the plan this operator
  * exists to avoid.) Then one equi-join against the base applies the
  * surviving state.
  */
object Cdc {

  /** Apply `log` to `base`. The log carries `key`, `opCol` ('delete' means
    * tombstone, anything else is an upsert), the new `attrs` values, and a
    * (`tsCol`, `tieCol`) total order (tie makes equal-timestamp changes
    * deterministic — use the log's sequence/offset column).
    *
    * Per key: the latest change wins; a winning delete removes the row
    * (including a base row); a winning upsert replaces the base attrs (or
    * inserts a new key); keys with no change pass through.
    */
  def applyLog(base: DataFrame, log: DataFrame, key: String, attrs: Seq[String],
               opCol: String, tsCol: String, tieCol: String): DataFrame = {
    require(attrs.nonEmpty, "attrs must be non-empty")
    val latest = log.groupBy(col(key))
      .agg(call_function("topk_struct",
        struct(col(tsCol), col(tieCol)),
        struct(col(opCol) +: attrs.map(col): _*),
        lit(1)).getItem(0).as("_c"))
      .select(col(key), col("_c.*"))
    val b = base.select((key +: attrs).map(col): _*).alias("b")
    val l = latest.alias("l")
    b.join(l, col(s"b.$key") === col(s"l.$key"), "full_outer")
      .filter(col(s"l.$opCol").isNull || col(s"l.$opCol") =!= "delete")
      .select(coalesce(col(s"b.$key"), col(s"l.$key")).as(key) +:
        attrs.map(a =>
          when(col(s"l.$key").isNotNull, col(s"l.$a")).otherwise(col(s"b.$a")).as(a)): _*)
  }
}
