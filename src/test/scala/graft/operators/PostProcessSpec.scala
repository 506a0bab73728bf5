package graft.operators

import java.nio.file.{Files, Paths}
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** S7 archive/zip post-steps (filesystem) + parquet compaction (Spark). */
class PostProcessSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkSpec.session

  test("moveToBackup relocates files and replaces same-name leftovers") {
    val src = Files.createTempDirectory("pp_src")
    val bak = src.resolve("backup")
    val f = src.resolve("report_1.txt"); Files.writeString(f, "v1")
    PostProcess.moveToBackup(Seq(f), bak)
    assert(!Files.exists(f) && Files.readString(bak.resolve("report_1.txt")) == "v1")

    val f2 = src.resolve("report_1.txt"); Files.writeString(f2, "v2")
    PostProcess.moveToBackup(Seq(f2), bak)
    assert(Files.readString(bak.resolve("report_1.txt")) == "v2") // idempotent replace
  }

  test("zipBackup compresses all files, deletes originals, skips existing zips") {
    val bak = Files.createTempDirectory("pp_bak")
    Files.writeString(bak.resolve("report_a.txt"), "aaa")
    Files.writeString(bak.resolve("report_b.txt"), "bbb")
    val zip1 = PostProcess.zipBackup(bak, "150224").get
    assert(zip1.getFileName.toString == "150224.zip")
    val entries = new ZipFile(zip1.toFile).entries().asScala.map(_.getName).toSeq
    assert(entries == Seq("report_a.txt", "report_b.txt"))
    assert(!Files.exists(bak.resolve("report_a.txt")))

    // next day: only new files zip; yesterday's archive untouched
    Files.writeString(bak.resolve("report_c.txt"), "ccc")
    val zip2 = PostProcess.zipBackup(bak, "160224").get
    val e2 = new ZipFile(zip2.toFile).entries().asScala.map(_.getName).toSeq
    assert(e2 == Seq("report_c.txt") && Files.exists(zip1))
  }

  test("zipBackup on empty/missing dir → None") {
    assert(PostProcess.zipBackup(Files.createTempDirectory("pp_empty"), "x").isEmpty)
    assert(PostProcess.zipBackup(Paths.get("/nonexistent_dir_xyz"), "x").isEmpty)
  }

  test("retentionSweep: deletes past-horizon files, keeps young ones, rerun is a no-op") {
    import java.nio.file.attribute.FileTime
    import java.time.Instant
    val dir = Files.createTempDirectory("pp_ret")
    val asOf = Instant.parse("2024-06-01T02:00:00Z")
    def mk(name: String, ageDays: Long): java.nio.file.Path = {
      val p = dir.resolve(name); Files.writeString(p, "x")
      Files.setLastModifiedTime(p, FileTime.from(asOf.minus(java.time.Duration.ofDays(ageDays))))
      p
    }
    val old1 = mk("010324.zip", 95)
    val old2 = mk("150324.zip", 91)
    val young = mk("280524.zip", 4)
    val notZip = mk("notes.txt", 200) // suffix-filtered: untouched
    val deleted = PostProcess.retentionSweep(dir, asOf, 90, Some(".zip"))
    assert(deleted.toSet == Set(old1, old2))
    assert(!Files.exists(old1) && !Files.exists(old2))
    assert(Files.exists(young) && Files.exists(notZip))
    // idempotent rerun: nothing left to delete
    assert(PostProcess.retentionSweep(dir, asOf, 90, Some(".zip")).isEmpty)
    // boundary: exactly maxAgeDays old is KEPT (strictly-older deletes)
    val edge = mk("edge.zip", 90)
    assert(PostProcess.retentionSweep(dir, asOf, 90, Some(".zip")).isEmpty)
    assert(Files.exists(edge))
    // missing dir is a no-op
    assert(PostProcess.retentionSweep(dir.resolve("nope"), asOf, 90, None).isEmpty)
  }

  test("applyRetention: 90-day backups + 30-day logs in one call") {
    import java.nio.file.attribute.FileTime
    import java.time.Instant
    val bak = Files.createTempDirectory("pp_ret_bak")
    val logs = Files.createTempDirectory("pp_ret_log")
    val asOf = Instant.parse("2024-06-01T02:00:00Z")
    def mk(dir: java.nio.file.Path, name: String, ageDays: Long): java.nio.file.Path = {
      val p = dir.resolve(name); Files.writeString(p, "x")
      Files.setLastModifiedTime(p, FileTime.from(asOf.minus(java.time.Duration.ofDays(ageDays))))
      p
    }
    val oldZip = mk(bak, "010224.zip", 120); mk(bak, "300524.zip", 2)
    val oldLog = mk(logs, "etl-2024-04-01.log", 61); mk(logs, "etl-2024-05-30.log", 2)
    val (dz, dl) = PostProcess.applyRetention(bak, logs, asOf)
    assert(dz == Seq(oldZip) && dl == Seq(oldLog))
    assert(Files.list(bak).count() == 1 && Files.list(logs).count() == 1)
  }

  test("compactParquet merges small files in place, data intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pp_compact").resolve("t").toString
    (1L to 1000L).toDF("x").repartition(20).write.parquet(dir)
    val (before, after) = PostProcess.compactParquet(spark, dir, targetBytes = 1L << 30)
    assert(before == 20 && after == 1, s"$before -> $after")
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000 && back.agg(org.apache.spark.sql.functions.sum($"x"))
      .head().getLong(0) == 500500L)
    // already compact: second pass is a no-op
    assert(PostProcess.compactParquet(spark, dir, 1L << 30) == (1, 1))
  }

  test("compactParquet recovers every crash state of a prior interrupted swap") {
    import spark.implicits._
    import java.nio.file.StandardCopyOption
    def freshDir(): java.nio.file.Path = {
      val d = Files.createTempDirectory("pp_crash").resolve("t")
      (1L to 100L).toDF("x").repartition(5).write.parquet(d.toString)
      d
    }
    def total(d: java.nio.file.Path): Long =
      spark.read.parquet(d.toString).agg(org.apache.spark.sql.functions.sum($"x"))
        .head().getLong(0)

    // state A: died between the two ATOMIC_MOVEs — live dir gone, complete
    // rewrite stranded in .compact.tmp, original in .compact.old
    val a = freshDir()
    val aTmp = a.resolveSibling("t.compact.tmp")
    val aOld = a.resolveSibling("t.compact.old")
    spark.read.parquet(a.toString).coalesce(1).write.parquet(aTmp.toString)
    Files.move(a, aOld, StandardCopyOption.ATOMIC_MOVE)
    PostProcess.compactParquet(spark, a.toString, 1L << 30)
    assert(total(a) == 5050L && !Files.exists(aTmp) && !Files.exists(aOld))

    // state B: died mid-rewrite — live dir intact, partial tmp left behind
    val b = freshDir()
    val bTmp = b.resolveSibling("t.compact.tmp")
    Files.createDirectories(bTmp)
    Files.writeString(bTmp.resolve("part-junk.parquet"), "not parquet")
    val (before, after) = PostProcess.compactParquet(spark, b.toString, 1L << 30)
    assert(before == 5 && after == 1 && total(b) == 5050L && !Files.exists(bTmp))

    // state C: died before the rewrite finished AND the live dir was already
    // moved aside with no tmp — only the pre-swap copy survives; roll back
    val c = freshDir()
    val cOld = c.resolveSibling("t.compact.old")
    Files.move(c, cOld, StandardCopyOption.ATOMIC_MOVE)
    PostProcess.compactParquet(spark, c.toString, 1L << 30)
    assert(total(c) == 5050L && !Files.exists(cOld))
  }

  test("compactParquet accepts a scheme-qualified file: URI (Hadoop FS path handling)") {
    import spark.implicits._
    val raw = Files.createTempDirectory("pp_uri").resolve("t")
    (1L to 200L).toDF("x").repartition(8).write.parquet(raw.toString)
    // the URI form java.nio.Paths.get would reject — proves the compaction
    // path goes through the Hadoop FileSystem resolver end to end
    val uri = "file:" + raw.toString
    val (before, after) = PostProcess.compactParquet(spark, uri, targetBytes = 1L << 30)
    assert(before == 8 && after == 1, s"$before -> $after")
    val back = spark.read.parquet(raw.toString)
    assert(back.count() == 200 &&
      back.agg(org.apache.spark.sql.functions.sum($"x")).head().getLong(0) == 20100L)
  }
}
