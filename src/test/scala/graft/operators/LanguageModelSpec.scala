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

  test("naive Bayes recovers the class on separable vocabulary; zero-token docs drop") {
    // two disjoint vocabularies → the classifier must get every test doc
    // right; a test doc with no tokens carries no evidence and is dropped
    val train = Seq(
      (1L, "perro gato casa sol", "es"), (2L, "gato sol luna perro", "es"),
      (3L, "dog cat house sun", "en"), (4L, "cat sun moon dog", "en"),
      (5L, "sun dog cat cat", "en")).toDF("doc_id", "text", "lang")
    val test = Seq((10L, "perro luna"), (11L, "dog moon"), (12L, "...")).toDF("doc_id", "text")
    val out = LanguageModel.naiveBayesClassify(train, test, "doc_id", "text", "lang")
      .orderBy("doc_id").collect()
    assert(out.length == 2) // doc 12 tokenizes to nothing
    assert(out(0).getLong(0) == 10L && out(0).getString(1) == "es")
    assert(out(1).getLong(0) == 11L && out(1).getString(1) == "en")
  }

  test("naive Bayes score matches hand math; ties break to the smallest label") {
    // symmetric training: one doc per class, identical token counts, so a
    // test word seen by neither class scores both classes EQUALLY — the
    // argmax must deterministically pick the lexicographically smaller
    val train = Seq((1L, "aa bb", "x1"), (2L, "cc dd", "x0")).toDF("doc_id", "text", "lang")
    val test = Seq((9L, "zz")).toDF("doc_id", "text")
    val out = LanguageModel.naiveBayesClassify(train, test, "doc_id", "text", "lang").collect()
    assert(out.length == 1 && out(0).getString(1) == "x0")
    // score = ln(1/2) + 1 * ln((0+0.5)/(2 + 0.5*4)) — prior + one unseen word
    val want = math.log(0.5) + math.log(0.5 / 4.0)
    val got = out(0).getDouble(2)
    assert(math.abs(got - BigDecimal(want).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("naive Bayes keeps a class whose training docs tokenize to nothing") {
    // the "emoji" class has no tokens: it must survive into prediction
    // (every word scores the smoothed floor, the prior carries the
    // evidence) rather than silently vanish via an inner join on the
    // token-count frame
    val train = Seq(
      (1L, "!!! ???", "sym"), (2L, "!!!", "sym"), (3L, "!!!", "sym"),
      (4L, "dog cat", "en")).toDF("doc_id", "text", "lang")
    val test = Seq((9L, "zebra")).toDF("doc_id", "text")
    val out = LanguageModel.naiveBayesClassify(train, test, "doc_id", "text", "lang").collect()
    // sym: prior ln(3/4) + ln(0.5/(0 + 0.5*2)); en: ln(1/4) + ln(0.5/(2 + 0.5*2))
    val symScore = math.log(3.0 / 4) + math.log(0.5 / 1.0)
    val enScore = math.log(1.0 / 4) + math.log(0.5 / 3.0)
    assert(symScore > enScore) // the dominant-prior empty class wins here
    assert(out.length == 1 && out(0).getString(1) == "sym")
  }

  test("persisted NB model scores identically to the inline classifier") {
    val train = Seq(
      (1L, "perro gato casa sol", "es"), (2L, "gato sol luna perro", "es"),
      (3L, "dog cat house sun", "en"), (4L, "cat sun moon dog", "en")).toDF("doc_id", "text", "lang")
    val test = Seq((10L, "perro luna gato"), (11L, "dog moon"), (12L, "sun sol")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("nbmodel").toString
    LanguageModel.buildNbModel(train, "text", "lang", dir)
    val inline = LanguageModel.naiveBayesClassify(train, test, "doc_id", "text", "lang")
      .orderBy("doc_id").collect().toSeq
    val persisted = LanguageModel.scoreWithNbModel(dir, test, "doc_id", "text", "lang")
      .orderBy("doc_id").collect().toSeq
    assert(persisted == inline)
    // rebuild is idempotent (overwrite extents)
    LanguageModel.buildNbModel(train, "text", "lang", dir)
    val again = LanguageModel.scoreWithNbModel(dir, test, "doc_id", "text", "lang")
      .orderBy("doc_id").collect().toSeq
    assert(again == inline)
  }

  test("shared docWordCounts frame reproduces both inline consumers exactly") {
    // c4 tokenizes the corpus ONCE into docWordCounts and feeds NB scoring
    // and the DSIR weights from the same frame (r21 optimization); pin that
    // the shared-counts entry points are row-identical to the inline forms
    // on real data
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang")
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("doc_id").collect().toSeq
    val docWords = LanguageModel.docWordCounts(docs, "doc_id", "text", $"lang" === "en")
      .localCheckpoint()
    assert(rows(LanguageModel.importanceWeightsFromCounts(docWords, "doc_id"))
      == rows(LanguageModel.importanceWeights(docs, "doc_id", "text", $"lang" === "en")))
    val train = docs.filter($"doc_id" % 2 === 0)
    assert(rows(LanguageModel.naiveBayesClassifyFromCounts(train,
        docWords.select($"doc_id", $"w", $"cnt"), "doc_id", "text", "lang"))
      == rows(LanguageModel.naiveBayesClassify(train, docs, "doc_id", "text", "lang")))
  }

  test("rounded scores are partitioning-invariant on real data") {
    // the oracle hash-compare assumes the 4/6-decimal rounding absorbs
    // float-summation-order noise; prove it on the real corpus by running
    // each scorer under two hostile partitionings and requiring EXACT
    // (bitwise double) equality of every output row
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang")
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("doc_id").collect().toSeq
    val shuffled = docs.repartition(7, $"lang").localCheckpoint()
    assert(rows(LanguageModel.bigramLmScores(docs, "doc_id", "text"))
      == rows(LanguageModel.bigramLmScores(shuffled, "doc_id", "text")))
    assert(rows(LanguageModel.importanceWeights(docs, "doc_id", "text", $"lang" === "en"))
      == rows(LanguageModel.importanceWeights(shuffled, "doc_id", "text", $"lang" === "en")))
    def nb(d: org.apache.spark.sql.DataFrame) = LanguageModel.naiveBayesClassify(
      d.filter($"doc_id" % 2 === 0), d.filter($"doc_id" % 2 === 1), "doc_id", "text", "lang")
    assert(rows(nb(docs)) == rows(nb(shuffled)))
  }

  test("importance weights steer toward the target domain and normalize for length") {
    // target (tgt=true) speaks 'sun moon'; raw background speaks 'mud rock'.
    // A sun-moon doc must outweigh a mud-rock doc; doubling a doc's length
    // without changing its vocabulary mix must not change its weight.
    val docs = Seq(
      (1L, "sun moon sun moon", true), (2L, "sun moon sun moon", true),
      (3L, "mud rock mud rock", false), (4L, "mud rock mud rock", false),
      (5L, "sun moon", false),                      // target-like candidate
      (6L, "mud rock", false),                      // background-like candidate
      (7L, "sun moon sun moon", false)).toDF("doc_id", "text", "tgt") // 5 doubled
    val out = LanguageModel.importanceWeights(docs, "doc_id", "text", $"tgt")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(5L) > out(6L))
    assert(out(5L) == out(7L)) // mean log-ratio, not sum: length-invariant
    // weights are exp(mean log ratio): strictly positive
    assert(out.values.forall(_ > 0.0))
  }

  test("perplexity buckets match hand math: smoothed floors, tertile ranks, short-doc drop") {
    // train "a b a b": bigrams {a b:2, b a:1}, uni {a:2, b:2}, V=2
    val train = Seq((0L, "a b a b", "en")).toDF("doc_id", "text", "lang")
    val score = Seq(
      (1L, "a b", "en"),  // seen bigram: ppl = 3/2.5 = 1.2
      (2L, "b a", "en"),  // ppl = 3/1.5 = 2.0
      (3L, "z z", "en"),  // unseen bigram AND unseen w1: (0+.5)/(0+1) -> ppl 2.0
      (5L, "a z", "en"),  // unseen bigram, SEEN w1: (0+.5)/(2+1) -> ppl 6.0
      (4L, "c", "en")     // < 2 tokens: no evidence, dropped
    ).toDF("doc_id", "text", "lang")
    val out = LanguageModel.perplexityBuckets(train, score, "doc_id", "text", "lang")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3), r.getString(4)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 5L))
    // n=4 per-lang tertiles: head rnk*3<=4 -> rnk 1; middle rnk*3<=8 -> rnk 2; tail 3,4
    assert(out(1L) == ((1L, 1.2, "head")))
    assert(out(2L) == ((1L, 2.0, "middle"))) // tie on ppl with doc 3 breaks by id
    assert(out(3L) == ((1L, 2.0, "tail")))
    assert(out(5L) == ((1L, 6.0, "tail")))
  }

  test("perplexity tertiles are per-language and partitioning-invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang")
    def run(d: org.apache.spark.sql.DataFrame) = LanguageModel.perplexityBuckets(
      d.filter($"doc_id" % 5 === 0), d.filter($"doc_id" % 5 =!= 0),
      "doc_id", "text", "lang").orderBy("doc_id").collect().toSeq
    val base = run(docs)
    assert(base == run(docs.repartition(7, $"lang").localCheckpoint()))
    // within every language the three buckets partition the docs with
    // |head| <= |middle| <= |tail| <= |head|+1 (rank-tertile guarantee)
    val sizes = base.groupBy(r => (r.getString(1), r.getString(4)))
      .view.mapValues(_.size).toMap
    val langs = base.map(_.getString(1)).distinct
    for (l <- langs) {
      val h = sizes.getOrElse((l, "head"), 0)
      val m = sizes.getOrElse((l, "middle"), 0)
      val t = sizes.getOrElse((l, "tail"), 0)
      assert(h <= m && m <= t && t <= h + 1, s"lang $l: $h/$m/$t")
    }
  }
}
