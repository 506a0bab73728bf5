package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkSpec

/** topk_struct: equivalence with the window top-k on random data (through a
  * real partial/merge shuffle, so serialize/deserialize run), edge shapes.
  */
class TopKStructSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(13)
  private val rows = Seq.tabulate(5000) { i =>
    (rnd.nextInt(40).toLong, i.toLong, math.floor(rnd.nextDouble() * 100) / 4)
  }

  private def topkAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.repartition(16) // many partitions -> partial buffers serialize + merge
      .groupBy($"g")
      .agg(call_function("topk_struct",
        struct($"v", (-$"id").as("neg_id")), struct($"id", $"v"), lit(k)).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", ($"pos" + 1).as("rn"), $"col.id".as("id"), $"col.v".as("v"))

  test("matches the window top-k rank-for-rank (ties broken by id asc)") {
    val df = rows.toDF("g", "id", "v")
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    val expect = df.withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 3).select("g", "rn", "id", "v")
    assert(topkAgg(df, 3).except(expect).isEmpty && expect.except(topkAgg(df, 3)).isEmpty)
  }

  test("groups smaller than k return all members; null struct FIELDS rank nulls-first") {
    val df = Seq((1L, 10L, Some(5.0)), (1L, 11L, None), (2L, 20L, Some(1.0)))
      .toDF("g", "id", "v")
    val out = topkAgg(df, 3).orderBy("g", "rn")
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    // a null field inside a struct key is NOT a null key: it orders as the
    // smallest value (Spark null-first), so it ranks last in largest-first
    assert(out == Seq((1L, 1L, 10L, Some(5.0)), (1L, 2L, 11L, None),
      (2L, 1L, 20L, Some(1.0))))
  }

  test("a TOP-LEVEL null key drops the row") {
    val df = Seq((1L, 10L, 5.0), (1L, 11L, -1.0), (2L, 20L, 1.0)).toDF("g", "id", "v")
      .withColumn("key", when($"v" >= 0, struct($"v")))
    val out = df.groupBy($"g")
      .agg(call_function("topk_struct", $"key", $"id", lit(3)).as("top"))
      .select($"g", explode($"top").as("id")).orderBy("g", "id")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 10L), (2L, 20L))) // id 11 had a null key
  }

  test("SQL registration works end to end") {
    rows.toDF("g", "id", "v").createOrReplaceTempView("tk")
    val n = spark.sql(
      "SELECT g, topk_struct(named_struct('v', v, 'ni', -id), id, 2) AS top FROM tk GROUP BY g")
      .selectExpr("g", "size(top) AS s").agg(sum($"s")).head().getLong(0)
    assert(n == 80) // 40 groups x 2
  }
}
