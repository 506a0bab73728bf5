package graft.operators

import java.sql.Date
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.SparkSpec

/** J1 merge semantics (SURVEY.md §2.5): every CASE branch of the reference's
  * intended MERGE, including the rollover resets and null-date edges.
  */
class MergeSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("email", StringType),
    StructField("fechaPrimeraVisita", DateType),
    StructField("fechaUltimaVisita", DateType),
    StructField("visitasTotales", IntegerType),
    StructField("visitasAnioActual", IntegerType),
    StructField("visitasMesActual", IntegerType)))

  private def frame(rows: (String, String, String, Int, Int, Int)*): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (e, f, l, t, a, m) =>
        Row(e, Option(f).map(Date.valueOf).orNull, Option(l).map(Date.valueOf).orNull,
          Int.box(t), Int.box(a), Int.box(m))
      }: _*), schema)

  private val asOf = Date.valueOf("2024-03-20")

  private def merge(t: DataFrame, s: DataFrame): Map[String, Row] =
    Merge.mergeVisitantes(t, s, asOf).collect().map(r => r.getString(0) -> r).toMap

  test("NOT MATCHED: delta-only email inserted wholesale") {
    val out = merge(frame(), frame(("new@x.com", "2024-03-01", "2024-03-10", 3, 3, 3)))
    val r = out("new@x.com")
    assert(r.getDate(1).toString == "2024-03-01" && r.getDate(2).toString == "2024-03-10")
    assert(r.getInt(3) == 3 && r.getInt(4) == 3 && r.getInt(5) == 3)
  }

  test("MATCHED same year+month: all counters sum") {
    val out = merge(
      frame(("u@x.com", "2024-01-05", "2024-03-05", 10, 8, 2)),
      frame(("u@x.com", "2024-03-18", "2024-03-19", 4, 4, 4)))
    val r = out("u@x.com")
    assert(r.getDate(1).toString == "2024-01-05")  // first visit never overwritten
    assert(r.getDate(2).toString == "2024-03-19")  // greatest
    assert(r.getInt(3) == 14 && r.getInt(4) == 12 && r.getInt(5) == 6)
  }

  test("MATCHED year rollover: anio and mes reset to S") {
    // target last visit in 2023, asOf 2024 → year mismatch resets anio;
    // month CASE requires same year first, so mes resets too.
    val out = merge(
      frame(("u@x.com", "2023-01-05", "2023-12-30", 10, 8, 2)),
      frame(("u@x.com", "2024-03-18", "2024-03-19", 4, 4, 4)))
    val r = out("u@x.com")
    assert(r.getInt(3) == 14) // totals always sum
    assert(r.getInt(4) == 4 && r.getInt(5) == 4)
  }

  test("MATCHED same year, month change: mes resets, anio sums") {
    val out = merge(
      frame(("u@x.com", "2024-01-05", "2024-02-20", 10, 8, 5)),
      frame(("u@x.com", "2024-03-18", "2024-03-19", 4, 4, 4)))
    val r = out("u@x.com")
    assert(r.getInt(4) == 12 && r.getInt(5) == 4)
  }

  test("MATCHED with null target fechaPrimeraVisita: T kept (stays null)") {
    val out = merge(
      frame(("u@x.com", null, null, 2, 2, 2)),
      frame(("u@x.com", "2024-03-01", "2024-03-02", 1, 1, 1)))
    val r = out("u@x.com")
    assert(r.isNullAt(1))                          // reference keeps T in both branches
    assert(r.getDate(2).toString == "2024-03-02")  // greatest(null, S) = S
    // null t_fechaUltimaVisita: year CASE null → ELSE → reset to S
    assert(r.getInt(4) == 1 && r.getInt(5) == 1)
    assert(r.getInt(3) == 3)
  }

  test("target-only rows pass through untouched") {
    val out = merge(
      frame(("keep@x.com", "2024-01-01", "2024-01-02", 7, 7, 7)),
      frame(("other@y.com", "2024-03-01", "2024-03-01", 1, 1, 1)))
    val r = out("keep@x.com")
    assert(r.getInt(3) == 7 && r.getDate(1).toString == "2024-01-01")
    assert(out.contains("other@y.com"))
  }

  test("batch-split consistency: merging two deltas sequentially = merging their union when months align") {
    val t = frame(("u@x.com", "2024-01-05", "2024-03-01", 10, 8, 2))
    val d1 = frame(("u@x.com", "2024-03-10", "2024-03-10", 2, 2, 2))
    val d2 = frame(("u@x.com", "2024-03-15", "2024-03-15", 3, 3, 3))
    val seqMerged = Merge.mergeVisitantes(Merge.mergeVisitantes(t, d1, asOf), d2, asOf)
    val union = frame(("u@x.com", "2024-03-10", "2024-03-15", 5, 5, 5))
    val once = Merge.mergeVisitantes(t, union, asOf)
    assert(seqMerged.collect().toSeq == once.collect().toSeq)
  }
}
