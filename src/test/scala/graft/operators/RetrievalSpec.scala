package graft.operators

import org.apache.spark.sql.functions.col
import graft.SparkSpec

/** RRF hybrid retrieval: rank plumbing on a controlled two-ranker fixture +
  * the fusion property (agreement beats a single strong ranker) + the RRF
  * arithmetic recomputed from the emitted ranks + partitioning invariance.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // doc d maps to vector (31·d+7) % 4 = (3d+3) % 4: d0→v3 d1→v2 d2→v1
  // d3→v0 d4→v3 d5→v2. Query d0 carries v3=[1,0]; cosines to it:
  // d4 1.0, d1/d5 0.8, d2 0.0, d3 −1.0.
  private def fixture = {
    val docs = Seq(
      (0L, "apple banana"),            // the query
      (1L, "apple banana apple"),      // lexically strongest
      (2L, "apple xyz qqq"),           // one shared term
      (3L, "nothing here"),            // no shared terms
      (4L, "zzz yyy"),                 // no shared terms, dense best
      (5L, "banana")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(-1f, 0f)),            // v0
      (1L, Array(0f, 1f)),             // v1
      (2L, Array(0.8f, 0.6f)),         // v2
      (3L, Array(1f, 0f))              // v3
    ).toDF("vec_id", "embedding")
    (docs, emb)
  }

  test("rank plumbing: per-ranker ranks, null for absent ranker, rrf arithmetic") {
    val (docs, emb) = fixture
    val out = Retrieval.rrfFuse(docs, emb, col("doc_id") < 1)
      .orderBy("rn").collect()
    val byDoc = out.map(r => r.getLong(2) ->
      ((r.getInt(1), r.getDouble(3), Option(r.get(4)), Option(r.get(5))))).toMap
    // lexical ranking: d1 has the most query-term mass -> r_lex 1;
    // d3/d4 share no term -> null r_lex but still fused via dense
    assert(byDoc(1L)._3.contains(1))
    assert(byDoc(3L)._3.isEmpty && byDoc(4L)._3.isEmpty)
    // dense ranking: d4 cosine 1.0 -> r_dense 1; ties d1/d5 at 0.8 break
    // by doc_id -> 2, 3; d3 at −1.0 ranks last
    assert(byDoc(4L)._4.contains(1))
    assert(byDoc(1L)._4.contains(2) && byDoc(5L)._4.contains(3))
    // RRF property: d1 (lex 1 + dense 2) outranks d4 (dense 1 alone):
    // 1/61 + 1/62 > 1/61
    assert(byDoc(1L)._1 == 1)
    // the emitted rrf is exactly the two-term arithmetic on the emitted ranks
    for ((_, (_, rrf, rl, rd)) <- byDoc) {
      val expect = BigDecimal(
        rl.map(r => 1.0 / (60 + r.asInstanceOf[Int])).getOrElse(0.0) +
          rd.map(r => 1.0 / (60 + r.asInstanceOf[Int])).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rrf == expect)
    }
    // rn order is (rrf desc, doc_id asc)
    val sorted = out.map(r => (-r.getDouble(3), r.getLong(2))).toSeq
    assert(sorted == sorted.sorted)
  }

  test("kPer must cover kOut") {
    val (docs, emb) = fixture
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(docs, emb, col("doc_id") < 1, kPer = 5, kOut = 10)
    }
  }

  test("fused results are partitioning-invariant on real data") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def run(d: org.apache.spark.sql.DataFrame, e: org.apache.spark.sql.DataFrame) =
      Retrieval.rrfFuse(d, e, col("doc_id") < 8)
        .orderBy("q_id", "rn").collect().toSeq
    assert(run(docs, emb) ==
      run(docs.repartition(7, $"doc_id").localCheckpoint(),
        emb.repartition(5, $"vec_id").localCheckpoint()))
  }
}
