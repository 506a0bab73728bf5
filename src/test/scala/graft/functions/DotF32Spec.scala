package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Native dot_f32 expression: equivalence with the HOF formulation on both
  * eval paths, null/edge handling, and the speed claim's plan shape.
  */
class DotF32Spec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val vecs = Seq.tabulate(50) { i =>
    (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1))
  }.toDF("id", "v")

  test("bit-identical to the HOF dot on random vectors (codegen path)") {
    val diff = vecs.as("a").join(vecs.as("b"), $"a.id" < $"b.id")
      .select(Vectors.dot($"a.v", $"b.v").as("native"), Vectors.dotHof($"a.v", $"b.v").as("hof"))
      .filter($"native" =!= $"hof")
    assert(diff.isEmpty)
  }

  test("bit-identical on the interpreted path too") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val diff = vecs.as("a").join(vecs.as("b"), $"a.id" < $"b.id")
        .select(Vectors.dot($"a.v", $"b.v").as("n"), Vectors.dotHof($"a.v", $"b.v").as("h"))
        .filter($"n" =!= $"h")
      assert(diff.isEmpty)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("null array → null; empty arrays → 0.0; shorter side bounds the loop") {
    val df = Seq(
      (Some(Array(1f, 2f)), Some(Array(3f, 4f, 5f))), // len mismatch: 1*3+2*4
      (None, Some(Array(1f))),
      (Some(Array.empty[Float]), Some(Array.empty[Float]))
    ).toDF("a", "b")
    val out = df.select(Vectors.dot($"a", $"b")).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 0.0)
  }

  test("dot_f32 is callable from SQL and stays inside whole-stage codegen") {
    vecs.createOrReplaceTempView("dotf32_v")
    val viaSql = spark.sql(
      "SELECT sum(dot_f32(v, v)) FROM dotf32_v").head().getDouble(0)
    val viaHof = vecs.select(sum(Vectors.dotHof($"v", $"v"))).head().getDouble(0)
    assert(viaSql == viaHof)
    // plan-shape claim needs a real scan (a local Seq is a LocalTableScan
    // with no codegen stage at all)
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // executedPlan.toString marks codegen stages with "*(n)" prefixes
    val plan = emb.select(Vectors.dot(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().startsWith("*("), s"not codegen'd:\n$plan")
  }
}
