package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed managed tables for co-located joins — the storage-layout lever
  * for repeated large joins on a stable key (SURVEY.md §4: at 100 TB the
  * fact-fact join `estadisticas ⋈ errores`-style workloads should not shuffle
  * per query). Writing both sides bucketed+sorted by the join key lets
  * SortMergeJoin consume the buckets directly: `.explain` shows NO Exchange
  * on either side — the shuffle was paid once at write time, amortized over
  * every subsequent join.
  */
object Bucketing {

  /** Persist `df` as a bucketed, sorted managed table (parquet).
    *
    * Orphan handling: with a session-scoped (in-memory) catalog, a crashed
    * writer leaves the table's warehouse directory behind while the catalog
    * forgets the table — the next overwrite then fails with
    * LOCATION_ALREADY_EXISTS. If the catalog does NOT know the table but its
    * managed location exists, the location is a dead orphan and is removed.
    *
    * The warehouseDir/<name> location heuristic is only valid for simple
    * (unqualified, default-database) names — a qualified `db.tbl` lives under
    * `db.db/tbl` and the naive mapping could delete an unrelated directory,
    * so qualified names are rejected. Single-writer assumption: the orphan
    * check races with any concurrent writer of the same table name; callers
    * own serialization per table.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    require(!table.contains("."),
      s"writeBucketed requires an unqualified table name in the default database, got '$table'")
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table) // managed: lives under spark.sql.warehouse.dir
  }

  /** Join two same-bucketed tables on their bucket keys. When both sides
    * have matching bucket counts on the join keys, the physical plan has no
    * shuffle exchange (assert via [[hasShuffle]]).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable),
        spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))

  /** True when the executed plan contains a shuffle exchange. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
