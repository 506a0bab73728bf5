package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** [[Tables.events]]' ts-layout dispatch: the driver has shipped two
  * physical layouts across rounds (ns-as-long, µs NTZ); the loader must
  * normalize both to µs TimestampType, pass a plain TimestampType through,
  * and FAIL LOUDLY on any third layout — silent pass-through of e.g. a
  * ms-encoded column would read as value skew against the DuckDB oracle
  * with no error anywhere (round-13 advice).
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private def dirWith(df: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("tables_events").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("ns-as-long layout rebuilds µs timestamps (floor division, DuckDB parity)") {
    // 2024-01-02T03:04:05.123456789 as raw nanos; expect µs floor-truncation
    val ns = 1704164645123456789L
    val dir = dirWith(Seq((1L, ns)).toDF("event_id", "ts"))
    val got = Tables.events(spark, dir).select(col("ts").cast("string")).as[String].head()
    assert(got == "2024-01-02 03:04:05.123456", got)
  }

  test("µs TimestampType passes through unchanged") {
    val dir = dirWith(Seq((1L, java.sql.Timestamp.valueOf("2024-01-02 03:04:05.123456")))
      .toDF("event_id", "ts"))
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(df.select(col("ts").cast("string")).as[String].head() ==
      "2024-01-02 03:04:05.123456")
  }

  test("an unexpected third ts layout fails loudly at load, not as silent value skew") {
    val dir = dirWith(Seq((1L, 12.5)).toDF("event_id", "ts")) // double: no valid arm
    val e = intercept[IllegalStateException] { Tables.events(spark, dir) }
    assert(e.getMessage.contains("unexpected physical dtype"), e.getMessage)
  }
}
