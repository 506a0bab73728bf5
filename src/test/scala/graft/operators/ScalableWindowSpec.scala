package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** ScalableWindow.ntile must be value-identical to Spark's own
  * `ntile(k).over(partitionBy(part).orderBy(value, tie))` — the plain window
  * is the executable spec; the operator exists purely to change the PLAN
  * (sliced parallel sort instead of one task per key).
  */
class ScalableWindowSpec extends SparkSpec {
  import spark.implicits._

  private def reference(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("ref",
      ntile(k).over(Window.partitionBy(col("p")).orderBy(col("v"), col("t"))))

  private def check(rows: Seq[(String, Double, Long)], k: Int, slices: Int): Unit = {
    val df = rows.toDF("p", "v", "t")
    val got = ScalableWindow.ntile(df, "p", "v", "t", k, as = "got", slices = slices)
    val joined = reference(df, k)
      .join(got, Seq("p", "v", "t"))
    val mismatches = joined.filter(col("ref") =!= col("got")).collect()
    assert(mismatches.isEmpty,
      s"k=$k slices=$slices mismatches:\n${mismatches.mkString("\n")}")
    assert(joined.count() == rows.size)
  }

  test("matches built-in ntile on a multi-key frame with ties") {
    val rows = for {
      p <- Seq("a", "b", "c")
      i <- 1 to 37
    } yield (p, (i % 7).toDouble, (p.hashCode * 100 + i).toLong) // heavy ties
    check(rows, k = 4, slices = 8)
    check(rows, k = 3, slices = 5)
  }

  test("slice count far above the old fixed accuracy stays exact (scaled sketch)") {
    // 300 slices forces accuracy = 16*300 = 4800 > the old pinned 1000; a
    // non-scaling sketch would duplicate boundaries (empty slices) — which
    // is still CORRECT by construction, so the real check is value identity
    // plus the adaptive default resolving inside [64, 4096].
    val rows = (1 to 2000).map(i => ("a", (i % 611).toDouble, i.toLong))
    check(rows, k = 10, slices = 300)
    val d = rows.toDF("p", "v", "t")
    val ds = ScalableWindow.defaultSlices(d)
    assert(ds >= 64 && ds <= 4096, s"defaultSlices out of range: $ds")
  }

  test("n < k degenerates to one row per bucket (SQL semantics)") {
    val rows = Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("a", 3.0, 3L))
    check(rows, k = 10, slices = 4)
  }

  test("single slice boundary set still exact when all values equal") {
    val rows = (1 to 20).map(i => ("a", 5.0, i.toLong)) // every row ties on v
    check(rows, k = 4, slices = 6)
  }

  test("heavy skew: 90% of rows on one value still exact") {
    // one dominant value forces most rows into ONE slice — buckets must
    // still match the plain window exactly (balance is perf, not semantics)
    val rows = (1 to 200).map { i =>
      ("a", if (i <= 180) 1.0 else (i % 11).toDouble, i.toLong)
    }
    check(rows, k = 7, slices = 8)
  }

  test("null order values match the plain window's NULLS FIRST placement") {
    val df = Seq(("a", Option(2.0), 1L), ("a", None, 2L), ("a", Option(1.0), 3L),
        ("a", None, 4L), ("a", Option(3.0), 5L))
      .toDF("p", "v", "t")
    val ref = df.withColumn("ref",
        ntile(2).over(Window.partitionBy(col("p")).orderBy(col("v"), col("t"))))
      .select("t", "ref").as[(Long, Int)].collect().toMap
    val got = ScalableWindow.ntile(df, "p", "v", "t", 2, as = "got", slices = 4)
      .select("t", "got").as[(Long, Int)].collect().toMap
    assert(ref == got, s"ref=$ref got=$got")
  }

  test("a part group whose order values are ALL null keeps its rows (slice 0)") {
    // percentile_approx returns a NULL boundary array for such a group; an
    // unguarded slice id would be NULL and the inner joins would silently
    // drop the whole group. The plain window still ranks them NULLS FIRST.
    val df = Seq(("a", Option(2.0), 1L), ("a", Option(1.0), 2L),
        ("z", Option.empty[Double], 3L), ("z", None, 4L), ("z", None, 5L))
      .toDF("p", "v", "t")
    val ref = df.withColumn("ref",
        ntile(2).over(Window.partitionBy(col("p")).orderBy(col("v"), col("t"))))
      .select("t", "ref").as[(Long, Int)].collect().toMap
    val got = ScalableWindow.ntile(df, "p", "v", "t", 2, as = "got", slices = 4)
      .select("t", "got").as[(Long, Int)].collect().toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L), s"rows dropped: $got")
    assert(ref == got, s"ref=$ref got=$got")
  }

  test("rowNumber matches built-in row_number over (value, tie)") {
    val rows = for { p <- Seq("a", "b"); i <- 1 to 50 }
      yield (p, (i % 5).toDouble, i.toLong)
    val df = rows.toDF("p", "v", "t")
    val ref = df.withColumn("ref",
      row_number().over(Window.partitionBy(col("p")).orderBy(col("v"), col("t"))))
    val got = ScalableWindow.rowNumber(df, "p", "v", "t", as = "got", slices = 4)
    val joined = ref.join(got, Seq("p", "v", "t"))
    assert(joined.filter(col("ref") =!= col("got")).isEmpty)
    assert(joined.count() == rows.size)
  }

  test("percentRank matches built-in percent_rank, including the 1-row group") {
    val rows = (for { p <- Seq("a", "b"); i <- 1 to 40 } yield (p, (i % 7).toDouble, i.toLong)) :+
      (("solo", 1.0, 99L))
    val df = rows.toDF("p", "v", "t")
    val ref = df.withColumn("ref",
      percent_rank().over(Window.partitionBy(col("p")).orderBy(col("v"), col("t"))))
    val got = ScalableWindow.percentRank(df, "p", "v", "t", as = "got", slices = 4)
    val joined = ref.join(got, Seq("p", "v", "t"))
    assert(joined.filter(col("ref") =!= col("got")).isEmpty)
    assert(joined.count() == rows.size)
  }

  test("matches built-in ntile on the events table at sf0.001") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type").as("p"), col("value").as("v"), col("event_id").as("t"))
    val got = ScalableWindow.ntile(ev, "p", "v", "t", 4, as = "got")
    val joined = reference(ev, 4).join(got, Seq("p", "v", "t"))
    assert(joined.filter(col("ref") =!= col("got")).isEmpty)
    assert(joined.count() == ev.count())
  }
}
