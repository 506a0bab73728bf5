package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Vectors

/** E2 similarity family: exact brute-force baseline, LSH bucketing. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),   // closest to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f)),  // opposite of 0
    (4L, Array(0.5f, 0.5f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("dot / cosine expressions match hand math") {
    val d = vecs.filter(col("vec_id") === 4L)
      .select(Vectors.dot(col("embedding"), col("embedding")).as("d")).as[Double].head()
    assert(math.abs(d - 0.5) < 1e-9)
    val c = Seq((Array(1.0f, 0f), Array(0f, 1.0f))).toDF("a", "b")
      .select(Vectors.cosine(col("a"), col("b")).as("c")).as[Double].head()
    assert(math.abs(c) < 1e-9)
  }

  test("bruteForceTopK: correct neighbor order for a known geometry") {
    val out = Similarity.bruteForceTopK(vecs.filter(col("vec_id") === 0L), vecs, 4)
      .orderBy("rn").select("b_id", "cosine").as[(Long, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 4L, 2L, 3L))
    assert(out.head._2 > 0.99 && out.last._2 == -1.0)
  }

  test("bruteForceTopK excludes self and respects k") {
    val out = Similarity.bruteForceTopK(vecs, vecs, 2)
    assert(out.filter(col("a_id") === col("b_id")).isEmpty)
    assert(out.groupBy("a_id").count().filter(col("count") > 2).isEmpty)
  }

  test("lshTopK: bucketed results are a subset of brute-force candidates with same scoring") {
    val bf = Similarity.bruteForceTopK(vecs, vecs, 4)
      .select("a_id", "b_id", "cosine").as[(Long, Long, Double)].collect().toMap2
    // nPlanes=2: coarse buckets so the 3-dim toy vectors share buckets.
    val lsh = Similarity.lshTopK(vecs, vecs, 4, nPlanes = 2, dims = 3)
      .select("a_id", "b_id", "cosine").as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty)
    lsh.foreach { case (a, b, c) => assert(bf.get((a, b)).forall(_ == c)) }
  }

  test("ivfTopK: probed cells find the true nearest neighbor, scores match brute force") {
    val bf = Similarity.bruteForceTopK(vecs, vecs, 4)
      .select("a_id", "b_id", "cosine").as[(Long, Long, Double)].collect().toMap2
    val ivf = Similarity.ivfTopK(vecs, vecs, k = 4, nCells = 3, nProbe = 2)
      .select("a_id", "b_id", "cosine").as[(Long, Long, Double)].collect()
    assert(ivf.nonEmpty)
    ivf.foreach { case (a, b, c) => assert(bf.get((a, b)).forall(_ == c)) }
    // vector 1's nearest (vector 0) is found through its probed cells
    val n1 = Similarity.ivfTopK(vecs.filter($"vec_id" === 1L), vecs, 1, nCells = 3, nProbe = 3)
      .select("b_id").as[Long].head()
    assert(n1 == 0L)
  }

  test("cosineNearDupPairs finds the near-identical pair") {
    val pairs = Similarity.cosineNearDupPairs(vecs, 0.9, nPlanes = 2, dims = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
  }

  private implicit class MapOps(rows: Array[(Long, Long, Double)]) {
    def toMap2: Map[(Long, Long), Double] = rows.map { case (a, b, c) => (a, b) -> c }.toMap
  }
}
