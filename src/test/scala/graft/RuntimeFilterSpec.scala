package graft

import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning: for a shuffle join whose build side is
  * made selective by a filter, Catalyst can inject `might_contain(bloom_agg
  * (build keys))` onto the probe side — at 100 TB this prunes probe rows
  * BEFORE the shuffle, which is the difference between shuffling the whole
  * fact table and shuffling the matching slice. The thresholds below are
  * lowered only because the test corpus is tiny; production defaults
  * (creation ≤ 10 MB build, probe ≥ 10 GB scan) gate it to exactly the
  * case that matters at scale.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective shuffle join gets a bloom might_contain on the probe side") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "500MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val d = "/root/testdata/sf0.001"
      val l = Tables.lineitem(spark, d)
      val o = Tables.orders(spark, d).filter(col("o_orderpriority") === "1-URGENT")
      val joined = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
