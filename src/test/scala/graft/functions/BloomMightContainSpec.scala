package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomMightContainSpec extends SparkSpec {
  import spark.implicits._

  private def filterBytes(values: Seq[Long], fpp: Double = 0.01): Array[Byte] = {
    val bf = values.toDF("v").stat.bloomFilter("v", values.length.toLong, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  test("no false negatives: every inserted value tests true") {
    val inserted = (0L until 500L).map(_ * 7919L)
    val bytes = filterBytes(inserted)
    val hits = inserted.toDF("v")
      .filter(call_function("bloom_might_contain", col("v"), lit(bytes)))
      .count()
    assert(hits == inserted.length)
  }

  test("prunes absent values (fpp bounds the survivors), null value -> dropped") {
    val inserted = (0L until 500L).map(_ * 7919L)
    val bytes = filterBytes(inserted, fpp = 0.01)
    val absent = (1L to 2000L).map(_ * 7919L + 3L) // disjoint from inserted
    val survivors = absent.toDF("v")
      .filter(call_function("bloom_might_contain", col("v"), lit(bytes)))
      .count()
    // E[survivors] = 20 at 1% fpp; 200 would mean the filter isn't filtering
    assert(survivors < 200, s"$survivors of ${absent.length} absent values passed")
    val withNull = Seq[java.lang.Long](7919L, null).toDF("v")
      .filter(call_function("bloom_might_contain", col("v"), lit(bytes)))
      .count()
    assert(withNull == 1) // null key drops, matching equi-join semantics
  }

  test("callable from SQL and stays inside whole-stage codegen") {
    val bytes = filterBytes(Seq(42L))
    val dir = java.nio.file.Files.createTempDirectory("bloomsql").toString
    spark.range(0, 100).select(col("id").as("v")).write.parquet(s"$dir/t")
    spark.read.parquet(s"$dir/t").createOrReplaceTempView("bloom_t")
    spark.udf // no-op touch to keep the session initialized
    val df = spark.table("bloom_t")
      .filter(call_function("bloom_might_contain", col("v"), lit(bytes)))
    assert(df.collect().map(_.getLong(0)).contains(42L))
    // parquet-backed frame → the filter must sit inside a codegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen stage in:\n$plan")
  }
}
