package graft.operators

import graft.SparkSpec

/** T9 corpus bigram-LM scoring: hand math on a tiny corpus + the ordering
  * property the pipeline thresholds on.
  */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  test("bigram LM scores match hand-computed smoothed log-probs") {
    // uni: a:3 b:3 z:1, V=3; bigrams: "a b":3, "b a":1
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "z")).toDF("doc_id", "text")
    val out = LanguageModel.bigramLmScores(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val lpAb = math.log(3.5 / 4.5)  // (3+0.5)/(3+0.5*3)
    val lpBa = math.log(1.5 / 4.5)
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getLong(1) == 3 && out(0).getDouble(2) == r4((2 * lpAb + lpBa) / 3))
    assert(out(1).getLong(1) == 1 && out(1).getDouble(2) == r4(lpAb))
    assert(out(2).getLong(1) == 0 && out(2).isNullAt(2)) // single token: no bigrams
  }

  test("corpus-typical documents outscore rare-vocabulary documents") {
    val common = (1L to 20L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
    val rare = Seq((99L, "zqx wvu tsr qpo nml kji hgf edc baz"))
    val out = LanguageModel.bigramLmScores((common ++ rare).toDF("doc_id", "text"),
      "doc_id", "text").collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(common.forall { case (id, _) => out(id) > out(99L) })
  }
}
