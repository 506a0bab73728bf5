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

  test("malformed inputs agree with the HOF: null array / length mismatch / null element → null") {
    val df = Seq(
      (Some(Array(1f, 2f)), Some(Array(3f, 4f, 5f))), // zip_with null-pads → HOF null
      (None, Some(Array(1f))),
      (Some(Array.empty[Float]), Some(Array.empty[Float]))
    ).toDF("a", "b")
    val out = df.select(Vectors.dot($"a", $"b")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 0.0)

    // null ELEMENT poisons the sum to null on both paths (the HOF behaves
    // the same: null*x → null, aggregate's + propagates it)
    val withNullElem = spark.sql(
      "SELECT dot_f32(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS d")
    assert(withNullElem.head().isNullAt(0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(withNullElem.head().isNullAt(0))
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("VectorizeDotProduct rewrites the HOF dot to dot_f32; near-miss shapes survive") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // the HOF form optimizes into the native expression...
    val hofPlan = emb.select(Vectors.dotHof(col("embedding"), col("embedding")))
      .queryExecution.optimizedPlan.toString
    assert(hofPlan.contains("dot_f32"), s"not rewritten:\n$hofPlan")
    // ...with identical results
    val viaRule = emb.select(Vectors.dotHof(col("embedding"), col("embedding")).as("d")).collect()
    val native = emb.select(Vectors.dot(col("embedding"), col("embedding")).as("d")).collect()
    assert(viaRule.map(_.getDouble(0)).toSeq == native.map(_.getDouble(0)).toSeq)

    // near-miss: double arrays keep the HOF (DotF32 requires array<float>)
    val dbl = emb.select(col("embedding").cast("array<double>").as("e"))
    val dblPlan = dbl.select(Vectors.dotHof(col("e"), col("e")))
      .queryExecution.optimizedPlan.toString
    assert(!dblPlan.contains("dot_f32"), s"must not rewrite double arrays:\n$dblPlan")
    // near-miss: lshBucket's zip_with against an integer plane array
    val lshPlan = emb.select(Vectors.lshBucket(col("embedding"), 4))
      .queryExecution.optimizedPlan.toString
    assert(!lshPlan.contains("dot_f32"), s"must not rewrite lshBucket:\n$lshPlan")
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
