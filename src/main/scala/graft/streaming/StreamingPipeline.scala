package graft.streaming

import java.sql.Date
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.Pipeline
import graft.operators.Layout

/** Structured Streaming form of the ETL (SURVEY.md §2.10).
  *
  * The reference "streams" by listing an SFTP directory daily and fanning out
  * one Prefect subflow per file (flows/orchestrator_flow.py:16-56). The
  * Spark-native idiom is a file-source stream: the source discovers new
  * files, the checkpoint records which files each micro-batch consumed
  * (subsuming the bitacora dedup role the reference claims but never
  * implements), and `Trigger.AvailableNow` gives the same "drain everything
  * pending, then stop" semantics as the daily batch — one code path for both
  * scheduled batch and continuous tailing.
  *
  * Each micro-batch reuses [[Pipeline.processBatch]] verbatim, so batch and
  * streaming runs are observably identical per file set.
  */
object StreamingPipeline {

  /** File-source stream of report rows, tagged with their source file. */
  def reportStream(spark: SparkSession, inputDir: String,
                   maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream
      .option("header", "true")
      .option("pathGlobFilter", "report_*.txt")
      .schema(Layout.rawSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.csv(inputDir)
      .withColumn("nombreArchivo", element_at(split(input_file_name(), "/"), -1))
  }

  /** Drain all currently-available files through the ETL, then stop.
    * `checkpointDir` carries processed-file state across restarts.
    *
    * P16 layout gate: the schema-enforced stream read cannot itself fail
    * layout (columns are imposed positionally), so each micro-batch's file
    * set is recovered via `input_file_name()` and the same driver-side
    * header check as [[Pipeline.runBatch]] runs per file — wrong-layout
    * files are quarantined with a 'Fallido' ledger row and their (garbage)
    * rows excluded, instead of silently parsing into the outputs.
    */
  def runAvailableNow(spark: SparkSession, inputDir: String, outDir: String,
                      checkpointDir: String, asOf: Date): StreamingQuery =
    reportStream(spark, inputDir).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val files = batch.select(input_file_name().as("f")).distinct()
          .collect().map(_.getString(0)).toSeq
        val (good, bad) = files.partition(f => Pipeline.checkHeader(spark, f).ok)
        def basenames(ps: Seq[String]) = ps.map(p => p.substring(p.lastIndexOf('/') + 1))
        Pipeline.quarantine(spark, outDir, basenames(bad), asOf)
        if (good.nonEmpty) {
          val goodBatch =
            if (bad.isEmpty) batch else batch.filter(input_file_name().isin(good: _*))
          Pipeline.processBatch(spark, goodBatch, outDir, asOf,
            expectedFiles = basenames(good))
        }
        ()
      }
      .start()

  /** Streaming E9: watermarked tumbling-window aggregate over an event
    * stream — the streaming twin of the batch `e9_hourly_window` query.
    * Late rows beyond the watermark are dropped; state is bounded.
    */
  def hourlyWindow(events: DataFrame, tsCol: String = "ts", valueCol: String = "value",
                   watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("hour_epoch"), col("n"), col("sum_value"))
}
