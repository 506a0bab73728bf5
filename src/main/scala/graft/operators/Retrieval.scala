package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Text, Vectors}

/** Hybrid lexical + dense retrieval with reciprocal-rank fusion (Cormack et
  * al., SIGIR 2009) — the standard RAG-era "hybrid search" operator: a BM25
  * ranking and an embedding-cosine ranking over the same corpus, fused per
  * query by RRF(d) = Σ_rankers 1/(c + rank_r(d)), which rewards documents
  * both rankers surface without ever comparing the two scorers' incomparable
  * score scales.
  *
  * Distributed shape (100 TB framing): the lexical side is an
  * inverted-index probe — query terms equi-join the (doc, word, tf) relation
  * on the word key, so per-query work is proportional to the posting lists
  * touched, never a corpus scan per query; the dense side broadcasts the
  * bounded query-vector set and streams the corpus once (the e2 exact
  * discipline — swap in [[Pq.ivfPqTopKIndexed]] for the compressed-probe
  * scale path). BOTH per-ranker top-k cuts and the fused cut run through the
  * `topk_struct` bounded-heap aggregate: map-side combine ships at most k
  * rows per (query, partition) into the shuffle — no window sort over a
  * query's full candidate extent anywhere. Fusion itself joins two
  * (queries × k)-row frames — constant in corpus size.
  *
  * Determinism: BM25 and cosine are rounded to 4 decimals BEFORE ranking
  * (summation-order ulps can't flip ranks), ties break on ascending doc id,
  * and the RRF sum is two fixed-order IEEE divisions on integer ranks —
  * engine-portable end to end, which is what lets the whole hybrid stack be
  * oracle-checked exactly rather than recall-gated.
  */
object Retrieval {

  /** Hybrid BM25 + cosine retrieval, RRF-fused.
    *
    * @param docs      corpus with (doc_id, text)
    * @param emb       embedding table (vec_id, embedding); each doc is
    *                  assigned the vector at pmod(doc_id·31+7, |emb|) — the
    *                  c8 deterministic doc→vector fixture assignment
    * @param queryPred predicate over doc_id selecting the bounded query set
    * @param kPer      per-ranker candidate depth
    * @param kOut      fused results kept per query
    * @param c         RRF smoothing constant (60 in the original paper)
    * @return (q_id, rn, doc_id, rrf, r_lex, r_dense) — r_* null when only
    *         the other ranker surfaced the doc
    */
  def rrfFuse(docs: DataFrame, emb: DataFrame, queryPred: Column,
              kPer: Int = 20, kOut: Int = 10, c: Int = 60): DataFrame = {
    require(kPer >= kOut, s"kPer ($kPer) must be >= kOut ($kOut)")
    // bounded construction-time scalar (vector-table size), the c8 pattern
    val nVec = emb.count()

    // ---- lexical ranker: BM25(k1=1.2, b=0.75) via inverted-index probe
    val toks = docs.select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .localCheckpoint() // feeds query terms, tf AND doc lengths
    val qTerms = toks.filter(queryPred)
      .select(col("doc_id").as("q_id"), explode(array_distinct(col("toks"))).as("word"))
    val tf = toks.select(col("doc_id"), explode(col("toks")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .localCheckpoint() // feeds document frequencies AND the probe join
    val dl = toks.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val nd = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val ad = dl.agg(avg(col("dl")).as("avgdl"))
    val perTerm = qTerms
      .join(tf, "word") // the posting-list probe
      .filter(col("doc_id") =!= col("q_id"))
      .join(dl, "doc_id")
      .join(dfreq, "word")
      .crossJoin(broadcast(nd)).crossJoin(broadcast(ad)) // one row each
      .select(col("q_id"), col("doc_id"),
        (log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))).as("s"))
    val bm25 = perTerm.groupBy("q_id", "doc_id")
      .agg(round(sum(col("s")), 4).as("bm25"))
    val lexTop = topKPerQuery(bm25, "bm25", kPer, "r_lex")

    // ---- dense ranker: exact cosine over the doc→vector assignment
    val assigned = docs.select(col("doc_id"))
      .withColumn("_evec", pmod(col("doc_id") * 31 + 7, lit(nVec)))
      .join(emb.select(col("vec_id").as("_evec"), col("embedding")), "_evec")
      .select(col("doc_id"), col("embedding"),
        Vectors.norm2(col("embedding")).as("nrm"))
      .localCheckpoint() // feeds the query side AND the corpus side
    val qv = assigned.filter(queryPred)
      .select(col("doc_id").as("q_id"), col("embedding").as("ea"), col("nrm").as("na"))
    val cos = assigned.join(broadcast(qv), col("q_id") =!= col("doc_id"))
      .select(col("q_id"), col("doc_id"),
        round(Vectors.cosine(col("ea"), col("embedding"), col("na"), col("nrm")), 4)
          .as("cosine"))
    val denseTop = topKPerQuery(cos, "cosine", kPer, "r_dense")

    // ---- reciprocal-rank fusion over the two bounded candidate frames
    val fused = lexTop.join(denseTop, Seq("q_id", "doc_id"), "full_outer")
      .select(col("q_id"), col("doc_id"), col("r_lex"), col("r_dense"),
        round(coalesce(lit(1.0) / (lit(c) + col("r_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("r_dense")), lit(0.0)), 6).as("rrf"))
    fused.groupBy("q_id")
      .agg(call_function("topk_struct",
        struct(col("rrf"), (-col("doc_id")).as("neg_id")),
        struct(col("doc_id"), col("rrf"), col("r_lex"), col("r_dense")),
        lit(kOut)).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rn"),
        col("col.doc_id").as("doc_id"), col("col.rrf").as("rrf"),
        col("col.r_lex").as("r_lex"), col("col.r_dense").as("r_dense"))
  }

  /** Top-k (score desc, doc_id asc) per q_id through the bounded-heap
    * aggregate; emits (q_id, doc_id, rankAs).
    */
  private def topKPerQuery(scored: DataFrame, scoreCol: String, k: Int,
                           rankAs: String): DataFrame =
    scored.groupBy("q_id")
      .agg(call_function("topk_struct",
        struct(col(scoreCol), (-col("doc_id")).as("neg_id")),
        struct(col("doc_id")), lit(k)).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.doc_id").as("doc_id"),
        (col("pos") + 1).cast("int").as(rankAs))
}
