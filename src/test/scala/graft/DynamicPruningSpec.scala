package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Dynamic partition pruning: a fact table laid out with `partitionBy` on
  * the join key lets Catalyst inject the dim side's filtered key set as a
  * partition predicate at RUNTIME — the fact scan then reads only matching
  * directories. At 100 TB this is the storage-layout complement of the
  * bloom runtime filter: whole partitions never leave disk.
  */
class DynamicPruningSpec extends SparkSpec {

  test("partitioned fact scan is pruned by the filtered dim side") {
    val dir = Files.createTempDirectory("dpp").toString
    val d = "/root/testdata/sf0.001"
    Tables.orders(spark, d).write.partitionBy("o_orderpriority")
      .mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    // the dim's selectivity comes from a DIFFERENT column, so the partition
    // predicate cannot be derived statically (a literal equality on the key
    // would constant-propagate through the join — static pruning, not DPP)
    val dim = Tables.orders(spark, d)
      .filter(col("o_totalprice") > 450000)
      .select(col("o_orderpriority").as("p")).distinct()
    val joined = fact.join(dim, fact("o_orderpriority") === dim("p"))
      .agg(count(lit(1)).as("n"))
    val physical = joined.queryExecution.executedPlan.toString
    assert(physical.contains("dynamicpruningexpression"),
      s"no dynamic partition pruning in plan:\n$physical")
    assert(joined.head().getLong(0) > 0)
  }
}
