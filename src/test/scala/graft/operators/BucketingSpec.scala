package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Co-located join via bucketed tables: same results as the shuffled join,
  * but the plan has no exchange — the 100 TB lever for repeated fact-fact
  * joins on a stable key.
  */
class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed-sorted tables join without a shuffle exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Bucketing.writeBucketed(Tables.orders(spark, sf), "b_orders", "o_orderkey", 8)
      Bucketing.writeBucketed(Tables.lineitem(spark, sf), "b_lineitem", "l_orderkey", 8)

      val bucketed = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem",
        "o_orderkey", "l_orderkey")
      assert(!Bucketing.hasShuffle(bucketed), "bucketed join must not shuffle:\n" +
        bucketed.queryExecution.executedPlan.toString.take(2000))

      // same cardinality as the plain shuffled join
      val plain = Tables.orders(spark, sf).join(Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      assert(bucketed.count() == plain.count())
      assert(Bucketing.hasShuffle(plain)) // the contrast: unbucketed side shuffles
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
