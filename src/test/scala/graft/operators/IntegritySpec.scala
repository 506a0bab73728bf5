package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Order-insensitive table checksum + the portable md5-low-64 primitive. */
class IntegritySpec extends SparkSpec {
  import spark.implicits._

  test("md5Lower64 matches DuckDB's md5_number_lower on a known digest") {
    // md5('abc') = 900150983cd24fb0d6963f7d28e17f72; last 8 bytes LE
    // = 8250560606382298838 (verified against duckdb md5_number_lower('abc'))
    val got = Seq("abc").toDF("s")
      .select(Integrity.md5Lower64(col("s")).cast("string")).as[String].head()
    assert(got == "8250560606382298838", got)
  }

  test("checksum is invariant to row order and partitioning; sensitive to content") {
    val rows = (1L to 500L).map(i => (i, s"name_$i", if (i % 7 == 0) null else s"v$i"))
    val base = spark.sparkContext.parallelize(rows, 4).toDF("id", "name", "opt")
    val shuffled = spark.sparkContext.parallelize(new scala.util.Random(7).shuffle(rows), 13)
      .toDF("id", "name", "opt")
    val cols = Seq("id", "name", "opt")
    val a = Integrity.tableChecksum(base, cols).head()
    val b = Integrity.tableChecksum(shuffled, cols).head()
    assert(a == b, s"$a vs $b")
    // one changed value flips the checksum but not the count
    val mutated = base.withColumn("opt",
      when(col("id") === 123L, lit("poisoned")).otherwise(col("opt")))
    val c = Integrity.tableChecksum(mutated, cols).head()
    assert(c.getLong(0) == a.getLong(0) && c.getString(1) != a.getString(1))
  }

  test("snapshotDiff: added/removed/changed classified; unchanged and null-equal keys dropped") {
    val oldV = Seq((1L, Some("a"), 10), (2L, Some("b"), 20), (3L, Option.empty[String], 30),
      (4L, Some("gone"), 40)).toDF("k", "attr", "v")
    val newV = Seq((1L, Some("a"), 10),            // unchanged
      (2L, Some("B"), 20),                         // changed attr
      (3L, Option.empty[String], 30),              // unchanged (null == null)
      (5L, Some("fresh"), 50)).toDF("k", "attr", "v") // added; 4 removed
    val out = Integrity.snapshotDiff(oldV, newV, "k", Seq("attr", "v"))
      .orderBy("k")
      .select("k", "change_type", "old_attr", "new_attr")
      .as[(Long, String, Option[String], Option[String])].collect().toSeq
    assert(out == Seq(
      (2L, "changed", Some("b"), Some("B")),
      (4L, "removed", Some("gone"), None),
      (5L, "added", None, Some("fresh"))), out.mkString("\n"))
  }

  test("groupedChecksum: per-group sums partition the table checksum; order-insensitive") {
    val df = Seq((1L, "a", "x"), (2L, "b", "x"), (3L, "c", "y"), (4L, "d", "y"))
      .toDF("id", "s", "g")
    val per = Integrity.groupedChecksum(df, Seq("g"), Seq("id", "s"))
      .orderBy("g").collect()
    assert(per.map(_.getLong(1)).toSeq == Seq(2L, 2L))
    // group sums add up to the whole-table checksum (same commutative sum)
    val whole = Integrity.tableChecksum(df, Seq("id", "s")).head().getString(1)
    assert(per.map(r => BigInt(r.getString(2))).sum == BigInt(whole))
    // row order / partitioning cannot change the result
    val shuffled = Integrity.groupedChecksum(df.orderBy(desc("id")).repartition(7),
      Seq("g"), Seq("id", "s")).orderBy("g").collect()
    assert(shuffled.map(_.getString(2)).toSeq == per.map(_.getString(2)).toSeq)
  }

  test("null vs empty string hash differently; literal sentinel collides with null (documented)") {
    def sum1(v: Option[String]) =
      Integrity.tableChecksum(Seq((1L, v)).toDF("id", "s"), Seq("id", "s"))
        .head().getString(1)
    assert(sum1(None) != sum1(Some("")))
    // the U+0002 sentinel IS the null encoding -- a literal U+0002 value
    // cannot be told apart (control characters in data are out of contract)
    assert(sum1(None) == sum1(Some("\u0002")))
  }
}
