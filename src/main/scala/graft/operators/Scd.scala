package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 maintenance: apply a batch of attribute
  * updates to a versioned dimension, closing the changed rows' validity
  * intervals and opening new ones, so every historical attribute state stays
  * queryable by time (the warehouse-standard dimension-history discipline;
  * the reference's visitantes MERGE — utils/utils_load.py:43-82 — is the
  * Type-1 "overwrite in place" cousin, implemented as J1).
  *
  * Scale shape: ONE equi-join of the dimension's open rows against the
  * update batch on the business key plus a union — no windows, no
  * per-key iteration. Updates are typically dimension-sized or smaller, so
  * AQE broadcasts them; at worst this is a key-partitioned shuffle join.
  * History rows (valid_to set) are never rewritten — at 100 TB the closed
  * extent is append-only cold data, and only the open slice joins.
  */
object Scd {

  /** Apply one update batch to a Type-2 dimension.
    *
    * `dim` carries `key`, the tracked `attrs`, and [`validFrom`, `validTo`]
    * timestamps where a NULL `validTo` marks each key's single open row.
    * `updates` carries `key`, the same `attrs`, and `effCol` — the instant
    * the new state takes effect. At most one update per key per batch (the
    * daily-batch contract; pre-aggregate upstream if a feed can repeat).
    *
    * Per key: an update whose attrs differ (null-safely) from the open
    * row's closes that row at `effCol` and inserts a new open row; an
    * identical update is a no-op; an update for an unseen key inserts its
    * first open row; closed history rows pass through untouched.
    */
  def applyBatch(dim: DataFrame, updates: DataFrame, key: String,
                 attrs: Seq[String], effCol: String,
                 validFrom: String = "valid_from",
                 validTo: String = "valid_to"): DataFrame = {
    require(attrs.nonEmpty, "attrs must be non-empty")
    val outCols: Seq[Column] =
      (key +: attrs).map(col) :+ col(validFrom) :+ col(validTo)

    // The update batch feeds three branches (close, open, first-seen); if it
    // is itself derived from a fact-table aggregate, lazy recompute would
    // scan the fact table three times — materialize once (it is at most
    // dimension-sized by contract).
    val u0 = updates.localCheckpoint()

    val differs = attrs.map(a => !(col(s"d.$a") <=> col(s"u.$a"))).reduce(_ || _)
    // changed = (key, eff, new attr values) for keys whose OPEN row differs
    val changed = dim.filter(col(validTo).isNull).alias("d")
      .join(u0.alias("u"), col(s"d.$key") === col(s"u.$key"))
      .filter(differs)
      .select(col(s"u.$key").as(key) +:
        attrs.map(a => col(s"u.$a").as(a)) :+
        col(s"u.$effCol").as("_eff"): _*)

    // existing rows: open-and-changed rows get their interval closed at eff
    val closed = dim.alias("d")
      .join(changed.select(col(key), col("_eff")).alias("c"),
        col(s"d.$key") === col(s"c.$key"), "left")
      .select(
        (key +: attrs).map(a => col(s"d.$a").as(a)) :+
          col(s"d.$validFrom").as(validFrom) :+
          when(col(s"d.$validTo").isNull, col("_eff"))
            .otherwise(col(s"d.$validTo")).as(validTo): _*)

    // new open rows: one per changed key, plus first rows for unseen keys
    val opened = changed
      .select(col(key) +: attrs.map(col) :+
        col("_eff").as(validFrom) :+ lit(null).cast("timestamp").as(validTo): _*)
    val firstSeen = u0
      .join(dim.select(key).distinct(), Seq(key), "left_anti")
      .select(col(key) +: attrs.map(col) :+
        col(effCol).as(validFrom) :+ lit(null).cast("timestamp").as(validTo): _*)

    closed.select(outCols: _*)
      .unionByName(opened)
      .unionByName(firstSeen)
  }
}
