package graft

import java.nio.file.{Files, Paths}
import java.sql.Date
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Layout, Merge, Prepare, Validate}

/** End-to-end batch assembly of the reference ETL (SURVEY.md §3, §7.1):
  * glob scan → layout check (P16) → validity flags (P4-P6) → single-pass
  * valid/invalid materialization (P7/P8) → `estadisticas` (P11-P15) /
  * `visitantes` merge (A1+J1) / `errores` (G1+P1) / `bitacora` (A3).
  *
  * Reference lifecycle: flows/etl_flow.py:20-47 + flows/orchestrator_flow.py:16-56.
  * The dispatcher's one-subflow-per-file fan-out becomes ONE Spark job over
  * all files with per-file grouping (`groupBy(nombreArchivo)`) — same
  * observable outputs, arbitrarily many files per run.
  *
  * Scale design (100 TB framing):
  *  - ONE scan of the input CSVs: the flagged frame is materialized to
  *    parquet partitioned by `is_valid`, so the valid/invalid split and every
  *    downstream consumer read partition-pruned parquet instead of re-parsing
  *    CSV (the reference parses once but holds everything in RAM; a naive
  *    two-filter Spark plan would scan the CSV twice).
  *  - `estadisticas`/`errores` are written partitioned by `nombreArchivo`
  *    with dynamic partition overwrite → re-running a file replaces exactly
  *    its own partitions. Idempotent reruns subsume the reference's
  *    per-file transaction rollback (tasks/load.py:33-55).
  *  - the `visitantes` upsert (J1) rewrites via full-outer join into a NEW
  *    versioned directory and a pointer-file swap makes it current — readers
  *    never observe a half-written table.
  *  - `bitacora` is appended LAST: it is the ledger consumers audit
  *    (README.md:166-174), so a file appears there only after its data
  *    committed.
  */
object Pipeline {

  /** One row per processed file, mirroring the reference's bitacora insert. */
  final case class RunSummary(files: Long, okRows: Long, errRows: Long)

  /** S1+S3: glob scan of `report_*.txt` under `inputDir`, all columns raw
    * strings (validation precedes casts), rows tagged with their source file
    * (replaces the reference's per-file dispatch identity).
    */
  def readReports(spark: SparkSession, inputDir: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("pathGlobFilter", "report_*.txt")
      .schema(Layout.rawSchema)
      .csv(inputDir)
      .withColumn("nombreArchivo", element_at(split(input_file_name(), "/"), -1))

  /** S1: driver-side file listing (metadata only — never a data scan). */
  def listReports(spark: SparkSession, inputDir: String): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(inputDir, "report_*.txt")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
      .map(_.getPath.toString).sorted
  }

  /** Files already recorded in the bitacora ledger. The reference README
    * claims "filter already-processed files" but never implements it
    * (SURVEY.md §2.10) — here the ledger check makes reruns append-safe:
    * a processed file can never double-count into the visitantes merge.
    */
  def processedFiles(spark: SparkSession, outDir: String): Set[String] = {
    val bitDir = Paths.get(outDir, "bitacora")
    if (!Files.exists(bitDir)) Set.empty
    else spark.read.parquet(bitDir.toString)
      .select("nombreArchivo").distinct().collect().map(_.getString(0)).toSet
  }

  /** P16 for real files: the schema-enforced CSV read can never fail the
    * column check (it imposes our schema positionally), so a wrong-layout
    * file would silently parse into garbage. Instead the HEADER LINE of each
    * file is read driver-side (one metadata-sized read per file, no Spark
    * job) and validated against the expected 15 columns — missing columns
    * quarantine the file (reference: hard per-file failure,
    * utils/utils_transform.py:85-96); extra columns only warn (:97-101).
    */
  def checkHeader(spark: SparkSession, file: String): Validate.LayoutCheck = {
    val path = new org.apache.hadoop.fs.Path(file)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(path)
    val header =
      try new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8")).readLine()
      finally in.close()
    val cols = Option(header).map(_.split(",", -1).map(_.trim).toSeq).getOrElse(Seq.empty)
    Validate.checkLayout2(cols)
  }

  /** True when the file has a header line but no data line (driver-side,
    * reads at most two lines — the streaming zero-row reconcile gate).
    */
  def isHeaderOnly(spark: SparkSession, file: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(file)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(path)
    try {
      val r = new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8"))
      r.readLine() != null && r.readLine() == null
    } finally in.close()
  }

  /** Ledger rows for wrong-layout files: recorded as 'Fallido' so they never
    * re-enter processing. Shared by the batch driver and the streaming gate.
    */
  def quarantine(spark: SparkSession, outDir: String, basenames: Seq[String], asOf: Date): Unit =
    ledgerRows(spark, outDir, basenames, asOf, "Fallido")

  /** Resolve the current visitantes table version, if any. */
  def currentVisitantes(spark: SparkSession, outDir: String): Option[DataFrame] = {
    val ptr = Paths.get(outDir, "visitantes", "_CURRENT")
    if (Files.exists(ptr))
      Some(spark.read.parquet(Paths.get(outDir, "visitantes", Files.readString(ptr).trim).toString))
    else None
  }

  /** Full batch run. Returns per-run totals (the driver-visible contract the
    * reference exposes through bitacora).
    */
  def runBatch(spark: SparkSession, inputDir: String, outDir: String, asOf: Date): RunSummary = {
    val done = processedFiles(spark, outDir)
    val pending = listReports(spark, inputDir)
      .filterNot(p => done.contains(p.substring(p.lastIndexOf('/') + 1)))
    if (pending.isEmpty) return RunSummary(0, 0, 0)

    // Per-file layout gate: quarantined files get a 'Fallido' ledger row
    // (recorded → never retried; the reference's retry-then-quarantine ladder
    // collapses to quarantine-first since our batch is idempotent).
    val (todo, quarantined) = pending.partition(f => checkHeader(spark, f).ok)
    quarantine(spark, outDir, quarantined.map(p => p.substring(p.lastIndexOf('/') + 1)), asOf)
    if (todo.isEmpty) return RunSummary(quarantined.size.toLong, 0, 0)

    val raw = spark.read
      .option("header", "true")
      .schema(Layout.rawSchema)
      .csv(todo: _*)
      .withColumn("nombreArchivo", element_at(split(input_file_name(), "/"), -1))
    val s = processBatch(spark, raw, outDir, asOf,
      expectedFiles = todo.map(p => p.substring(p.lastIndexOf('/') + 1)))
    s.copy(files = s.files + quarantined.size)
  }

  /** Transform + load for one batch of tagged raw rows — the shared core of
    * the batch driver above and [[graft.streaming.StreamingPipeline]]'s
    * foreachBatch sink.
    *
    * `expectedFiles`: basenames the caller believes are in this batch. A
    * header-only (zero-row) file contributes no rows, so the data-derived
    * bitacora would skip it and the ledger's "processed file never re-enters"
    * guarantee would break — it would be re-listed and re-read every run.
    * Expected files absent from the data-derived ledger get an explicit
    * (0, 0, 'Completado') row.
    */
  def processBatch(spark: SparkSession, raw: DataFrame, outDir: String, asOf: Date,
                   expectedFiles: Seq[String] = Seq.empty): RunSummary = {
    // P16: missing columns are a hard failure; extra columns flow through.
    val layout = Validate.checkLayout(raw.drop("nombreArchivo"))
    require(layout.ok, s"layout check failed, missing columns: ${layout.missing.mkString(", ")}")

    // All-empty batch (every expected file was header-only): a partitioned
    // write of zero rows leaves no readable parquet behind, so skip the
    // transform entirely and just ledger the files.
    if (raw.isEmpty) {
      emptyFileLedger(spark, outDir, expectedFiles, asOf)
      return RunSummary(expectedFiles.size.toLong, 0, 0)
    }

    // P4-P8: flag + single-pass materialized split. The scratch dir must be
    // truncated WHOLE (static overwrite): under the session's dynamic
    // partition-overwrite mode, a batch with no invalid rows would leave the
    // previous run's is_valid=false partition in place and resurrect its
    // rows into this batch.
    val staged = s"$outDir/_staged"
    Validate.withValidityFlags(raw)
      .write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("is_valid").parquet(staged)
    // Partition-column type inference never yields BooleanType — the
    // `is_valid=true/false` directory names read back as STRING; restore the
    // boolean the split predicate needs.
    val flagged = spark.read.parquet(staged)
      .withColumn("is_valid", col("is_valid").cast("boolean"))
    val (ok, err) = Validate.split(flagged)

    // estadisticas: P11→P2→P12-15, reference column order, per-file partitions.
    val prepared = Prepare.dropFlags(Prepare.prepare(ok))
    Prepare.estadisticas(prepared, col("nombreArchivo"))
      .write.mode("overwrite").partitionBy("nombreArchivo")
      .parquet(s"$outDir/estadisticas")

    // errores: G1 explode + P1 projection, per-file partitions.
    val exploded = Prepare.errores(Prepare.explodeErrors(err), col("nombreArchivo"))
    exploded.write.mode("overwrite").partitionBy("nombreArchivo")
      .parquet(s"$outDir/errores")

    // visitantes: A1 delta + J1 merge into a new version, then pointer swap.
    val delta = Prepare.visitantes(prepared)
    val merged = currentVisitantes(spark, outDir)
      .map(target => Merge.mergeVisitantes(target, delta, asOf))
      .getOrElse(delta)
      .select(Merge.allCols.map(col): _*)
    val ptr = Paths.get(outDir, "visitantes", "_CURRENT")
    val nextVersion = f"v${(if (Files.exists(ptr)) Files.readString(ptr).trim.drop(1).toInt else 0) + 1}%06d"
    merged.write.mode("overwrite").parquet(Paths.get(outDir, "visitantes", nextVersion).toString)
    Files.createDirectories(ptr.getParent)
    Files.writeString(ptr, nextVersion)

    // bitacora: the per-file ledger, appended last. Files the caller expected
    // but that produced zero rows (header-only inputs) still get a ledger row
    // — otherwise they are never marked processed and re-enter every run.
    // One collect serves the append, the seen-set, and the totals: the frame
    // is one row per file, and re-aggregating it would re-run the whole
    // staged-read DAG per consumer.
    val bit = Prepare.bitacora(ok, exploded).withColumn("fechaProceso", lit(asOf))
    val rows = bit.collect() // one row per file — the whole DAG runs ONCE
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), bit.schema)
      .write.mode("append").parquet(s"$outDir/bitacora")
    val name = bit.schema.fieldIndex("nombreArchivo")
    val oks = bit.schema.fieldIndex("registrosExitosos")
    val errs = bit.schema.fieldIndex("registrosFallidos")
    val seen = rows.map(_.getString(name)).toSet
    emptyFileLedger(spark, outDir, expectedFiles.filterNot(seen), asOf)
    RunSummary(seen.size.toLong + expectedFiles.count(!seen(_)),
      rows.map(_.getLong(oks)).sum, rows.map(_.getLong(errs)).sum)
  }

  /** 'Completado' (0/0) ledger rows for expected files that contributed no
    * data rows — see [[processBatch]]'s `expectedFiles` contract.
    */
  private def emptyFileLedger(spark: SparkSession, outDir: String,
                              basenames: Seq[String], asOf: Date): Unit =
    ledgerRows(spark, outDir, basenames, asOf, "Completado")

  /** Shared bitacora ledger-row writer (schema in ONE place — quarantine and
    * the empty-file path must stay byte-compatible in the same directory).
    */
  private[graft] def ledgerRows(spark: SparkSession, outDir: String,
                                basenames: Seq[String], asOf: Date,
                                estatus: String): Unit =
    if (basenames.nonEmpty) {
      import spark.implicits._
      basenames.toDF("nombreArchivo")
        .withColumn("registrosExitosos", lit(0L))
        .withColumn("registrosFallidos", lit(0L))
        .withColumn("estatus", lit(estatus))
        .withColumn("fechaProceso", lit(asOf))
        .write.mode("append").parquet(s"$outDir/bitacora")
    }
}
