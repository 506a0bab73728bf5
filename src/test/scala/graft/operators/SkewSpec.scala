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

  test("saltedJoin == plain inner join on skewed keys, and shuffles on (key, salt)") {
    import spark.implicits._
    // 90% of probe rows share one hot key
    val probe = Seq.tabulate(2000) { i =>
      (i.toLong, if (i % 10 == 0) i.toLong % 7 else 999L)
    }.toDF("row_id", "k")
    val build = Seq.tabulate(1000)(i => (i.toLong, s"dim_$i")).toDF("k", "label")

    val salted = Skew.saltedJoin(probe, build, Seq("k"), saltFrom = $"row_id", buckets = 8)
    val got = salted.select("row_id", "k", "label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val want = probe.join(build, "k").select("row_id", "k", "label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == want && got.nonEmpty)

    // the physical join key includes the salt: the hot key spreads over
    // `buckets` reducers instead of one
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt not in the plan:\n$plan")
  }

  test("pre-existing __salt column is refused, not silently replaced") {
    import spark.implicits._
    val tainted = Seq((1L, 2L)).toDF("k", "__salt")
    val clean = Seq((1L, "x")).toDF("k", "label")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(tainted, clean, Seq("k"), $"k", 4)
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(clean, tainted, Seq("k"), $"k", 4)
    }
    intercept[IllegalArgumentException] {
      Skew.saltedAgg(tainted, Seq("k"), $"k", 4,
        Seq("n" -> org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1))),
        Map("n" -> ((c: org.apache.spark.sql.Column) =>
          org.apache.spark.sql.functions.sum(c))))
    }
  }
}
