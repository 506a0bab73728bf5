package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's read-only testdata tables (TESTDATA.md).
  *
  * `events.ts` has shipped in two physical layouts across driver rounds:
  * parquet TIMESTAMP(NANOS) — which Spark's vectorized reader rejects
  * ([PARQUET_TYPE_ILLEGAL]) unless `spark.sql.legacy.parquet.nanosAsLong=true`
  * (see [[Sessions.tune]]) reads it as LONG ns — and plain µs TIMESTAMP with
  * isAdjustedToUTC=false, which Spark reads as TIMESTAMP_NTZ. [[Tables.events]]
  * dispatches on the READ dtype so both layouts normalize to the same
  * microsecond TimestampType: ns-as-long rebuilds via `timestamp_micros(ns div
  * 1000)` (the floor-truncation DuckDB applies when reading ns parquet), NTZ
  * casts through the pinned UTC session zone (wall-clock values unchanged,
  * matching DuckDB's naive read of the same file).
  */
object Tables {
  def region(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(s"$dir/region.parquet")
  def nation(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(s"$dir/nation.parquet")
  def customer(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(s"$dir/customer.parquet")
  def supplier(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(s"$dir/supplier.parquet")
  def part(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(s"$dir/part.parquet")
  def orders(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(s"$dir/orders.parquet")
  def lineitem(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(s"$dir/lineitem.parquet")
  def documents(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(s"$dir/embeddings.parquet")

  /** `events` with `ts` normalized to TimestampType (µs), matching DuckDB. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // ns-as-long legacy layout
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType => // µs naive layout
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case org.apache.spark.sql.types.TimestampType => raw // already µs UTC
      // fail loudly on a THIRD layout (e.g. ms, or UTC-adjusted int96): a
      // silent pass-through would skew ts against the DuckDB oracle with no
      // error anywhere — a load failure is diagnosable, value drift is not
      case other => throw new IllegalStateException(
        s"events.ts: unexpected physical dtype $other — add an explicit " +
          "normalization arm (Tables.events) before using this layout")
    }
  }
}

/** Session configuration shared by Verify / Bench / tests / pipeline mains. */
object Sessions {
  /** Configs every graft session needs. Applied at builder time.
    *
    *  - ANSI off: the engine's coerce-cast semantics (null on bad input,
    *    SURVEY.md §7.3) require non-ANSI `cast`/`to_timestamp`; Spark 4
    *    defaults ANSI on, so pin it off explicitly.
    *  - nanosAsLong: see [[Tables]].
    *  - AQE on with a modest advisory partition size: queries here are
    *    sub-GB at test SF but the plan shapes must survive 100 TB, where AQE
    *    coalescing/skew-splitting does the runtime re-plan.
    */
  val tuning: Map[String, String] = Map(
    "spark.sql.extensions" -> "graft.GraftExtensions",
    "spark.sql.ansi.enabled" -> "false",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    // Pipeline sinks overwrite per-file partitions idempotently; static mode
    // would wipe sibling files' partitions on every rerun.
    "spark.sql.sources.partitionOverwriteMode" -> "dynamic",
    // InferFiltersFromGenerate turns explode(f(x)) into Filter(size(f(x))>0)
    // + Generate(f(x)); pushdown then alias-substitutes f into the filter, so
    // expensive generator inputs (tokenize→shingle lambda chains) evaluate
    // TWICE per row — measured 20x slowdown on the shingle inverted index.
    // The rows it would skip (empty arrays) cost nothing here.
    "spark.sql.optimizer.excludedRules" ->
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    "spark.sql.autoBroadcastJoinThreshold" -> (64 * 1024 * 1024).toString,
    "spark.sql.parquet.compression.codec" -> "snappy",
    // managed (bucketed) tables land in tmp, not the repo working dir
    "spark.sql.warehouse.dir" ->
      s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft-warehouse",
    "spark.ui.enabled" -> "false")

  def tune(b: SparkSession.Builder): SparkSession.Builder =
    tuning.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }

  /** Standard local session for mains/tests. */
  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val s = tune(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
