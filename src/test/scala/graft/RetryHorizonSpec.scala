package graft

import java.nio.file.{Files, Path}
import java.sql.Date
import org.scalatest.BeforeAndAfterAll

/** The reference's system-failure retry horizon (README.md:110-115: retry
  * a failing file for 2 days, then quarantine) over [[Pipeline.runBatch]]:
  * a file whose OPEN fails (here: a directory wearing a report name — the
  * glob lists it, fs.open throws) is retried across runs, recovers if the
  * cause clears, and is quarantined into bitacora once the horizon passes.
  */
class RetryHorizonSpec extends SparkSpec with BeforeAndAfterAll {

  private val header = operators.Layout.validColumns.mkString(",")
  private val goodRows =
    header + "\n" +
      "alice@example.com,x,-,-,01/02/2024 10:00,,1,0,,0,0,-,-,-,-"

  private def freshDirs(): (Path, Path) =
    (Files.createTempDirectory("retry_in"), Files.createTempDirectory("retry_out"))

  private def bitacora(outDir: Path) =
    spark.read.parquet(outDir.resolve("bitacora").toString)

  test("system-failing file is retried inside the horizon, quarantined past it") {
    val (inDir, outDir) = freshDirs()
    Files.write(inDir.resolve("report_ok.txt"), goodRows.getBytes)
    Files.createDirectory(inDir.resolve("report_broken.txt")) // open() throws

    // day 1: good file processes; broken one opens a retry row, no ledger
    val d1 = Pipeline.runBatch(spark, inDir.toString, outDir.toString,
      Date.valueOf("2024-03-01"))
    assert(d1 == Pipeline.RunSummary(1, 1, 0))
    assert(bitacora(outDir).count() == 1)
    val ledger1 = spark.read.parquet(outDir.resolve("reintentos").toString)
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getInt(3)))
    assert(ledger1.toSeq == Seq(("report_broken.txt", "2024-03-01", 1)))

    // day 2 (1 day elapsed < 2-day horizon): still retried, attempts bump
    val d2 = Pipeline.runBatch(spark, inDir.toString, outDir.toString,
      Date.valueOf("2024-03-02"))
    assert(d2 == Pipeline.RunSummary(0, 0, 0))
    val ledger2 = spark.read.parquet(outDir.resolve("reintentos").toString)
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getInt(3)))
    assert(ledger2.toSeq == Seq(("report_broken.txt", "2024-03-01", 2)))

    // day 3 (2 days elapsed >= horizon): quarantined — Fallido bitacora row,
    // file never re-enters. The ledger row SURVIVES this run's rewrite (the
    // rewrite lands before the quarantine, and a crash between them must
    // keep the first-failure date on disk) — it prunes on the next rewrite.
    val d3 = Pipeline.runBatch(spark, inDir.toString, outDir.toString,
      Date.valueOf("2024-03-03"))
    assert(d3 == Pipeline.RunSummary(1, 0, 0))
    val fallido = bitacora(outDir)
      .filter(org.apache.spark.sql.functions.col("estatus") === "Fallido")
      .select("nombreArchivo").collect().map(_.getString(0))
    assert(fallido.toSeq == Seq("report_broken.txt"))
    val ledger3 = spark.read.parquet(outDir.resolve("reintentos").toString)
      .collect().map(r => (r.getString(0), r.getDate(1).toString))
    assert(ledger3.toSeq == Seq(("report_broken.txt", "2024-03-01")))
    val d4 = Pipeline.runBatch(spark, inDir.toString, outDir.toString,
      Date.valueOf("2024-03-04"))
    assert(d4 == Pipeline.RunSummary(0, 0, 0)) // nothing pending anymore
  }

  test("crash between ledger rewrite and quarantine does not restart the horizon") {
    val (inDir, outDir) = freshDirs()
    Files.createDirectory(inDir.resolve("report_crash.txt"))
    val d1 = Pipeline.runBatch(spark, inDir.toString, outDir.toString,
      Date.valueOf("2024-03-01"))
    assert(d1 == Pipeline.RunSummary(0, 0, 0))
    // simulate the day-3 crash window: the horizon decision ran and rewrote
    // the ledger, but the driver died before quarantine() wrote bitacora
    val dec = Pipeline.recordSystemFailures(spark, outDir.toString,
      Seq(("report_crash.txt", "IOException: simulated")), Date.valueOf("2024-03-03"))
    assert(dec.expired == Seq("report_crash.txt") && dec.retry.isEmpty)
    val kept = spark.read.parquet(outDir.resolve("reintentos").toString)
      .collect().map(r => (r.getString(0), r.getDate(1).toString))
    assert(kept.toSeq == Seq(("report_crash.txt", "2024-03-01")),
      "expired row must survive the rewrite until the quarantine commits")
    // the idempotent rerun sees first=2024-03-01 (not a fresh horizon) and
    // quarantines — the retried-forever window stays closed
    val rerun = Pipeline.runBatch(spark, inDir.toString, outDir.toString,
      Date.valueOf("2024-03-03"))
    assert(rerun == Pipeline.RunSummary(1, 0, 0))
    assert(bitacora(outDir).filter(
      org.apache.spark.sql.functions.col("estatus") === "Fallido").count() == 1)
  }

  test("same-day idempotent rerun does not inflate the attempt count") {
    val (inDir, outDir) = freshDirs()
    Files.createDirectory(inDir.resolve("report_rerun.txt"))
    Pipeline.runBatch(spark, inDir.toString, outDir.toString, Date.valueOf("2024-03-01"))
    Pipeline.runBatch(spark, inDir.toString, outDir.toString, Date.valueOf("2024-03-01"))
    val row = spark.read.parquet(outDir.resolve("reintentos").toString)
      .collect().map(r => (r.getString(0), r.getInt(3))).toSeq
    assert(row == Seq(("report_rerun.txt", 1)), s"got $row") // one failing DAY
  }

  test("a file that recovers before the horizon processes normally and drops its retry row") {
    val (inDir, outDir) = freshDirs()
    Files.createDirectory(inDir.resolve("report_flaky.txt"))
    val d1 = Pipeline.runBatch(spark, inDir.toString, outDir.toString,
      Date.valueOf("2024-03-01"))
    assert(d1 == Pipeline.RunSummary(0, 0, 0))
    assert(spark.read.parquet(outDir.resolve("reintentos").toString).count() == 1)

    // upload completes: the directory becomes a real file
    Files.delete(inDir.resolve("report_flaky.txt"))
    Files.write(inDir.resolve("report_flaky.txt"), goodRows.getBytes)
    val d2 = Pipeline.runBatch(spark, inDir.toString, outDir.toString,
      Date.valueOf("2024-03-02"))
    assert(d2 == Pipeline.RunSummary(1, 1, 0))
    assert(spark.read.parquet(outDir.resolve("reintentos").toString).count() == 0)
    assert(bitacora(outDir).filter(
      org.apache.spark.sql.functions.col("estatus") === "Fallido").count() == 0)
  }

  test("streaming dispatcher: fail -> retry -> expire across AvailableNow drains") {
    // the round-14 verdict item 6 contract: the 2-day quarantine horizon
    // must hold under the streaming entry too. A directory wearing a report
    // name is never delivered by the file source, so the post-drain
    // reconcile ladder is what must carry the horizon.
    val (inDir, outDir) = freshDirs()
    val ckDir = Files.createTempDirectory("retry_ck")
    Files.write(inDir.resolve("report_ok.txt"), goodRows.getBytes)
    Files.createDirectory(inDir.resolve("report_broken.txt")) // open() throws

    def drain(day: String): Unit = {
      val q = streaming.StreamingPipeline.runAvailableNow(
        spark, inDir.toString, outDir.toString, ckDir.toString, Date.valueOf(day))
      q.awaitTermination(120000)
      streaming.StreamingPipeline.reconcilePendingFiles(
        spark, inDir.toString, outDir.toString, Date.valueOf(day))
    }

    // day 1: good file processes through the stream; broken one opens a
    // retry row via the reconcile, no ledger entry
    drain("2024-03-01")
    assert(bitacora(outDir).count() == 1)
    val ledger1 = spark.read.parquet(outDir.resolve("reintentos").toString)
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getInt(3)))
    assert(ledger1.toSeq == Seq(("report_broken.txt", "2024-03-01", 1)))

    // day 2 (< horizon): still retried, attempts bump, still unledgered
    drain("2024-03-02")
    val ledger2 = spark.read.parquet(outDir.resolve("reintentos").toString)
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getInt(3)))
    assert(ledger2.toSeq == Seq(("report_broken.txt", "2024-03-01", 2)))
    assert(bitacora(outDir).filter(
      org.apache.spark.sql.functions.col("estatus") === "Fallido").count() == 0)

    // day 3 (>= horizon): quarantined 'Fallido', never re-enters
    drain("2024-03-03")
    val fallido = bitacora(outDir)
      .filter(org.apache.spark.sql.functions.col("estatus") === "Fallido")
      .select("nombreArchivo").collect().map(_.getString(0))
    assert(fallido.toSeq == Seq("report_broken.txt"))
    drain("2024-03-04")
    assert(bitacora(outDir).count() == 2) // nothing new
  }

  test("streaming dispatcher: a file that recovers mid-horizon is delivered by the next drain") {
    val (inDir, outDir) = freshDirs()
    val ckDir = Files.createTempDirectory("retry_ck2")
    Files.createDirectory(inDir.resolve("report_flaky.txt"))
    def drain(day: String): Unit = {
      val q = streaming.StreamingPipeline.runAvailableNow(
        spark, inDir.toString, outDir.toString, ckDir.toString, Date.valueOf(day))
      q.awaitTermination(120000)
      streaming.StreamingPipeline.reconcilePendingFiles(
        spark, inDir.toString, outDir.toString, Date.valueOf(day))
    }
    drain("2024-03-01")
    assert(spark.read.parquet(outDir.resolve("reintentos").toString).count() == 1)
    // upload completes: the directory becomes a real file; the SOURCE
    // delivers it on the next drain, and its retry row prunes
    Files.delete(inDir.resolve("report_flaky.txt"))
    Files.write(inDir.resolve("report_flaky.txt"), goodRows.getBytes)
    drain("2024-03-02")
    assert(bitacora(outDir).filter(
      org.apache.spark.sql.functions.col("estatus") === "Completado").count() == 1)
    assert(spark.read.parquet(outDir.resolve("reintentos").toString).count() == 0)
  }

  test("recordSystemFailures: a partial view preserves the rows it cannot see") {
    val (_, outDir) = freshDirs()
    // full-view run opens A's row
    Pipeline.recordSystemFailures(spark, outDir.toString,
      Seq(("report_A.txt", "boom")), Date.valueOf("2024-03-01"))
    // a partial caller (a streaming micro-batch) failing only B must not
    // erase A's first-failure date — that date IS the horizon
    Pipeline.recordSystemFailures(spark, outDir.toString,
      Seq(("report_B.txt", "crash")), Date.valueOf("2024-03-02"), partial = true)
    def ledger() = spark.read.parquet(outDir.resolve("reintentos").toString)
      .collect().map(r => r.getString(0) -> (r.getDate(1).toString, r.getString(4))).toMap
    assert(ledger() == Map(
      "report_A.txt" -> ("2024-03-01", "boom"),
      "report_B.txt" -> ("2024-03-02", "crash")))
    // a partial caller with nothing failing leaves the ledger untouched
    Pipeline.recordSystemFailures(spark, outDir.toString, Seq.empty,
      Date.valueOf("2024-03-02"), partial = true)
    assert(ledger().keySet == Set("report_A.txt", "report_B.txt"))
    // the full-view rewrite still prunes recovered files (only B failing now)
    Pipeline.recordSystemFailures(spark, outDir.toString,
      Seq(("report_B.txt", "crash")), Date.valueOf("2024-03-02"))
    assert(ledger().keySet == Set("report_B.txt"))
  }

  test("streaming: a new file's micro-batch must not erase other files' retry rows") {
    // regression for the ledger-wipe bug: day-2's micro-batch (which sees
    // ONLY the newly-arrived file) used to rewrite the whole retry ledger,
    // erasing the broken file's first-failure date — restarting its
    // horizon every day a new file arrived, so it would retry forever.
    val (inDir, outDir) = freshDirs()
    val ckDir = Files.createTempDirectory("retry_ck3")
    Files.createDirectory(inDir.resolve("report_broken.txt"))
    def drain(day: String): Unit = {
      val q = streaming.StreamingPipeline.runAvailableNow(
        spark, inDir.toString, outDir.toString, ckDir.toString, Date.valueOf(day))
      q.awaitTermination(120000)
      streaming.StreamingPipeline.reconcilePendingFiles(
        spark, inDir.toString, outDir.toString, Date.valueOf(day))
    }
    drain("2024-03-01") // reconcile opens the broken file's row
    Files.write(inDir.resolve("report_new.txt"), goodRows.getBytes)
    drain("2024-03-02") // new file fires a micro-batch; row must survive
    val ledger = spark.read.parquet(outDir.resolve("reintentos").toString)
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getInt(3)))
    assert(ledger.toSeq == Seq(("report_broken.txt", "2024-03-01", 2)),
      s"ledger after day-2 drain: ${ledger.toSeq}")
    assert(bitacora(outDir).filter(
      org.apache.spark.sql.functions.col("estatus") === "Completado").count() == 1)
    // day 3: 2 days elapsed from the PRESERVED first-failure date →
    // quarantined on schedule
    drain("2024-03-03")
    val fallido = bitacora(outDir)
      .filter(org.apache.spark.sql.functions.col("estatus") === "Fallido")
      .select("nombreArchivo").collect().map(_.getString(0))
    assert(fallido.toSeq == Seq("report_broken.txt"))
  }

  test("layout failures still quarantine immediately — the horizon is for system failures only") {
    val (inDir, outDir) = freshDirs()
    Files.write(inDir.resolve("report_badcols.txt"), "email,notthelayout\nx,y".getBytes)
    val d1 = Pipeline.runBatch(spark, inDir.toString, outDir.toString,
      Date.valueOf("2024-03-01"))
    assert(d1 == Pipeline.RunSummary(1, 0, 0))
    assert(bitacora(outDir).filter(
      org.apache.spark.sql.functions.col("estatus") === "Fallido").count() == 1)
    assert(!Files.exists(outDir.resolve("reintentos")))
  }
}
