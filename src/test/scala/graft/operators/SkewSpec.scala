package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Salted aggregation equals the plain groupBy, key by key. */
class SkewSpec extends SparkSpec {

  test("saltedAgg(sum,count,max) == plain groupBy on skewed data") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val salted = Skew.saltedAgg(
      ev, Seq("event_type"), saltFrom = col("event_id"), buckets = 16,
      partials = Seq(
        "sum_value" -> sum(col("value").cast("decimal(18,2)")),
        "n" -> count(lit(1)),
        "max_value" -> max(col("value"))),
      combines = Map(
        "sum_value" -> (c => sum(c)),
        "n" -> (c => sum(c)),
        "max_value" -> (c => max(c))))
      .orderBy("event_type").collect()
    val plain = ev.groupBy("event_type")
      .agg(sum(col("value").cast("decimal(18,2)")).as("sum_value"),
        count(lit(1)).as("n"), max(col("value")).as("max_value"))
      .orderBy("event_type").collect()
    assert(salted.toSeq == plain.toSeq)
  }
}
