package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Corpus language-model document scoring — the classic "how typical is
  * this document of the corpus" quality signal LLM-data pipelines use for
  * filtering (CCNet-style LM scoring, here with the corpus itself as the
  * model): a bigram model with add-k smoothing, each document scored by the
  * mean log-probability of its bigrams.
  *
  * Distributed shape (100 TB framing): ONE bigram-count aggregation and ONE
  * unigram-count aggregation over the corpus (both map-side combined,
  * shuffle keyed by the n-gram string), then the per-document scoring joins
  * each document bigram against those counts — equi-joins on the n-gram
  * key, never a per-document model broadcast (the model IS corpus-sized, so
  * it stays distributed). Everything downstream of tokenization is
  * `functions._` codegen.
  */
object LanguageModel {

  private def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** (doc_id, n_bigrams, lm_score): lm_score = mean over the document's
    * bigrams of ln((c(w1 w2) + k) / (c(w1) + k·V)), V = corpus vocabulary
    * size; documents with fewer than two tokens get (0, null). Higher is
    * more corpus-typical; rankings are what pipelines threshold on.
    */
  def bigramLmScores(docs: DataFrame, idCol: String, textCol: String,
                     k: Double = 0.5): DataFrame = {
    require(k > 0, s"smoothing k must be positive, got $k")
    // token arrays feed unigram counts, bigram counts AND per-doc scoring —
    // materialized once (no cross-branch CSE in Spark)
    val toks = spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), Text.tokens(col(textCol)).as("toks"))
      .localCheckpoint()
    // (doc, bigram string, leading word); tokens are [a-z0-9]+ so the
    // space-joined bigram key is collision-free
    val bg = toks
      .filter(size(col("toks")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("toks")) - 1),
        i => struct(
          concat(element_at(col("toks"), i), lit(" "), element_at(col("toks"), i + 1)).as("bgram"),
          element_at(col("toks"), i).as("w1")))).as("b"))
      .select(col(idCol), col("b.bgram").as("bgram"), col("b.w1").as("w1"))
    val uni = toks.select(explode(col("toks")).as("w"))
    val ucnt = uni.groupBy("w").agg(count(lit(1)).as("cu"))
    val vocab = uni.agg(count_distinct(col("w")).as("v"))
    val bcnt = bg.groupBy("bgram").agg(count(lit(1)).as("cb"))
    val scored = bg
      .join(bcnt, "bgram")
      .join(ucnt, col("w1") === col("w"))
      .crossJoin(broadcast(vocab)) // one row
      .select(col(idCol),
        log((col("cb") + lit(k)) / (col("cu") + lit(k) * col("v"))).as("lp"))
    toks.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .groupBy(col(idCol))
      .agg(count(col("lp")).as("n_bigrams"), round(avg(col("lp")), 4).as("lm_score"))
  }

  /** CCNet-style perplexity gate (Wenzek et al., arXiv:1911.00359): train
    * the bigram LM on a REFERENCE corpus (CCNet uses Wikipedia; callers pass
    * any high-quality slice), score every candidate document by bigram
    * perplexity exp(−mean ln p), and bucket each language's documents into
    * head / middle / tail perplexity TERTILES — the published protocol keeps
    * head+middle and drops tail. Unlike [[bigramLmScores]] (corpus-as-model
    * typicality), the model and the scored set are DIFFERENT corpora, so
    * n-grams unseen in training take the smoothed floor via left joins
    * (cb→0, cu→0 ⇒ lp = −ln V at worst).
    *
    * Bucketing is RANK-based, not cutoff-based: per language, documents are
    * ranked by (rounded ppl, id) with [[ScalableWindow.rowNumber]] — the
    * sliced form, never one task per language — and bucket membership is
    * integer arithmetic on (rank, group size), so the tertile split is
    * deterministic and engine-portable where interpolated percentile
    * CUTOFFS are not. Documents with fewer than two tokens are dropped (no
    * evidence → no verdict), matching [[naiveBayesClassify]].
    *
    * Distributed shape (100 TB framing): two map-side-combined count
    * aggregations over the reference corpus, equi-joins of candidate
    * bigrams against them on the n-gram key (the model stays distributed —
    * only the 1-row vocab frame broadcasts), one sliced rank. Perplexity is
    * rounded to 4 decimals BEFORE ranking so the rank order is insensitive
    * to summation-order ulps.
    *
    * @return (id, lang, n_bigrams, ppl, bucket) — bucket ∈ head|middle|tail
    */
  def perplexityBuckets(trainDocs: DataFrame, scoreDocs: DataFrame,
                        idCol: String, textCol: String, langCol: String,
                        k: Double = 0.5): DataFrame = {
    require(k > 0, s"smoothing k must be positive, got $k")
    val tr = spread(trainDocs.select(col(textCol)))
      .select(Text.tokens(col(textCol)).as("toks"))
      .localCheckpoint() // feeds bigram counts, unigram counts AND vocab
    val trBg = tr.filter(size(col("toks")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("toks")) - 1),
        i => concat(element_at(col("toks"), i), lit(" "),
          element_at(col("toks"), i + 1)))).as("bgram"))
    val bcnt = trBg.groupBy("bgram").agg(count(lit(1)).as("cb"))
    val trUni = tr.select(explode(col("toks")).as("w"))
    val ucnt = trUni.groupBy("w").agg(count(lit(1)).as("cu"))
    val vocab = trUni.agg(count_distinct(col("w")).as("v"))
    val sc = spread(scoreDocs.select(col(idCol), col(langCol), col(textCol)))
      .select(col(idCol), col(langCol), Text.tokens(col(textCol)).as("toks"))
      .localCheckpoint() // feeds scoring AND the lang join-back
    val sbg = sc.filter(size(col("toks")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("toks")) - 1),
        i => struct(
          concat(element_at(col("toks"), i), lit(" "),
            element_at(col("toks"), i + 1)).as("bgram"),
          element_at(col("toks"), i).as("w1")))).as("b"))
      .select(col(idCol), col("b.bgram").as("bgram"), col("b.w1").as("w1"))
    val scored = sbg
      .join(bcnt, Seq("bgram"), "left")
      .join(ucnt, col("w1") === col("w"), "left")
      .crossJoin(broadcast(vocab)) // one row
      .select(col(idCol),
        log((coalesce(col("cb"), lit(0L)) + lit(k)) /
          (coalesce(col("cu"), lit(0L)) + lit(k) * col("v"))).as("lp"))
    val ppl = scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), round(exp(-avg(col("lp"))), 4).as("ppl"))
    // materialized: the sliced ranker passes over its input three times
    // (boundaries, slice sizes, the sort) — without the checkpoint each pass
    // re-ran the whole scoring-join + perplexity aggregation chain (the r21
    // baseline plan held 102 Exchanges, three copies of the scoring DAG)
    val base = sc.select(col(idCol), col(langCol)).join(ppl, Seq(idCol))
      .localCheckpoint()
    val ranked = ScalableWindow.rowNumber(base, langCol, "ppl", idCol, as = "_rnk")
    // the ranker already returns the per-part group size as `_n` — the old
    // separate nLang aggregate + join recomputed exactly that number
    ranked
      .select(col(idCol), col(langCol), col("n_bigrams"), col("ppl"),
        when(col("_rnk") * 3 <= col("_n"), lit("head"))
          .when(col("_rnk") * 3 <= col("_n") * 2, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Multinomial Naive Bayes document classification — the classifier-based
    * curation gate (CCNet / fastText-style language-or-quality labeling):
    * train per-class unigram models on a labeled corpus, score every test
    * document under every class, keep the argmax. Closed-form counts-based
    * training (no iterative fitting), so the whole train+predict round trip
    * is ANSI-SQL-expressible and oracle-checkable — unlike gradient-fit
    * classifiers whose per-step float order is engine-private.
    *
    * Distributed shape (100 TB framing): the MODEL is corpus-vocabulary-
    * sized, so the per-(class, word) count relation stays distributed and
    * scoring equi-joins each test document's distinct words against it on
    * (word, label) — never a model broadcast, never per-document model
    * state. Only the per-CLASS frame (|classes| rows: prior, token total,
    * vocab size) broadcasts, and test tokens pre-aggregate to per-doc
    * distinct-word counts before the |classes|-way fan-out, so the scoring
    * join's input is O(distinct words per doc × classes), not O(tokens ×
    * classes). The argmax is one `min(struct(-score, label))` aggregate —
    * no per-document window sort.
    *
    * Scoring: score(d, c) = ln P(c) + Σ_w cnt_d(w) · ln P(w|c) with add-k
    * smoothing P(w|c) = (c(w,c)+k)/(N_c+k·V), V = train vocabulary size.
    * A test word unseen for a class contributes the smoothed floor via the
    * left join's `coalesce(c, 0)`; ties break toward the lexicographically
    * smallest label, deterministically. Test documents with zero tokens
    * are dropped (no evidence → no claim).
    *
    * @return (id, pred_<labelCol>, score) — score is the winning class's
    *         log-joint, rounded to 4 decimals for cross-engine hashing
    *         (same discipline as [[bigramLmScores]]).
    */
  def naiveBayesClassify(train: DataFrame, test: DataFrame, idCol: String,
                         textCol: String, labelCol: String,
                         k: Double = 0.5): DataFrame = {
    require(k > 0, s"smoothing k must be positive, got $k")
    val (wc, stats) = trainNb(train, textCol, labelCol)
    scoreNb(wc, classesFrame(stats, totalsFrame(wc, stats), labelCol),
      test, idCol, textCol, labelCol, k)
  }

  /** [[naiveBayesClassify]] scoring from PRECOMPUTED per-(id, word) test
    * counts (see [[scoreNbFromCounts]]) — training still reads `train`.
    */
  private[graft] def naiveBayesClassifyFromCounts(
      train: DataFrame, testWords: DataFrame, idCol: String,
      textCol: String, labelCol: String, k: Double = 0.5): DataFrame = {
    require(k > 0, s"smoothing k must be positive, got $k")
    val (wc, stats) = trainNb(train, textCol, labelCol)
    scoreNbFromCounts(wc,
      classesFrame(stats, totalsFrame(wc, stats), labelCol),
      testWords, idCol, labelCol, k)
  }

  /** The NB training core shared by [[naiveBayesClassify]] (inline) and
    * [[buildNbModel]] (persisted) — ONE source of the training arithmetic
    * so the two paths cannot drift. Returns (wc, stats): the distributed
    * (class, word) count relation and the |classes|-row (label, n_docs,
    * n_tok) stats frame.
    *
    * The raw token stream is shuffled ONCE, into the per-(class, word)
    * model counts; the per-class token totals re-aggregate from that (much
    * smaller) distinct-word frame instead of paying a second
    * token-granularity shuffle — exact integer sums, so re-aggregation
    * changes nothing but the shuffle volume. The stats join is left +
    * coalesce: a class whose training docs tokenize to NOTHING still
    * exists (NB is well-defined at n_tok = 0 — every word scores the
    * smoothed floor ln(k/(k·V)) and the prior carries the evidence); an
    * inner join would silently drop the class from prediction.
    */
  private def trainNb(train: DataFrame, textCol: String,
                      labelCol: String): (DataFrame, DataFrame) = {
    val wc = spread(train.select(col(labelCol), col(textCol)))
      .select(col(labelCol), explode(Text.tokens(col(textCol))).as("w"))
      .groupBy(col(labelCol), col("w"))
      .agg(count(lit(1)).as("cw"))
      .localCheckpoint() // feeds the scoring join, per-class totals, vocab
    val nd = train.groupBy(col(labelCol)).agg(count(lit(1)).as("n_docs"))
    val nt = wc.groupBy(col(labelCol)).agg(sum(col("cw")).as("n_tok"))
    val stats = nd.join(nt, Seq(labelCol), "left")
      .withColumn("n_tok", coalesce(col("n_tok"), lit(0L)))
    (wc, stats)
  }

  /** One-row (n_all, v) corpus totals — re-aggregated from the stats/count
    * frames, never from a second scan of the training corpus.
    */
  private def totalsFrame(wc: DataFrame, stats: DataFrame): DataFrame =
    stats.agg(sum(col("n_docs")).as("n_all"))
      .crossJoin(broadcast(wc.agg(count_distinct(col("w")).as("v"))))

  /** The |classes|-row broadcast scoring frame (label, prior_lp, n_tok, v)
    * — shared by the inline and persisted scoring paths.
    */
  private def classesFrame(stats: DataFrame, totals: DataFrame,
                           labelCol: String): DataFrame =
    stats.crossJoin(broadcast(totals)) // one row
      .select(col(labelCol),
        (log(col("n_docs").cast("double")) - log(col("n_all").cast("double"))).as("prior_lp"),
        col("n_tok"), col("v"))

  /** The NB scoring core shared by [[naiveBayesClassify]] (inline model)
    * and [[scoreWithNbModel]] (persisted model): per-doc distinct-word
    * counts × the |classes|-row broadcast frame, left-joined against the
    * distributed (class, word) count relation, argmax via min-struct.
    */
  private def scoreNb(wc: DataFrame, classes: DataFrame, test: DataFrame,
                      idCol: String, textCol: String, labelCol: String,
                      k: Double): DataFrame =
    scoreNbFromCounts(wc, classes,
      spread(test.select(col(idCol), col(textCol)))
        .select(col(idCol), explode(Text.tokens(col(textCol))).as("w"))
        .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("cnt")),
      idCol, labelCol, k)

  /** [[scoreNb]] over PRECOMPUTED per-(id, word) counts — the entry point
    * for composed lanes (c4) that already paid the tokenize+count pass for
    * another consumer ([[importanceWeightsFromCounts]]): the corpus text is
    * tokenized ONCE and both operators aggregate from the same
    * materialized frame (guide §1.2 step 1: don't compute the same thing
    * twice). `testWords` must be exactly (idCol, w, cnt) as the inline
    * form's groupBy produces.
    */
  private[graft] def scoreNbFromCounts(wc: DataFrame, classes: DataFrame,
                                       testWords: DataFrame, idCol: String,
                                       labelCol: String, k: Double): DataFrame = {
    val scored = testWords
      .crossJoin(broadcast(classes)) // |classes| rows
      .join(wc, Seq(labelCol, "w"), "left")
      .select(col(idCol), col(labelCol), col("prior_lp"),
        (col("cnt") * (log(coalesce(col("cw"), lit(0L)) + lit(k))
          - log(col("n_tok") + lit(k) * col("v")))).as("lp"))
    scored.groupBy(col(idCol), col(labelCol))
      .agg((first(col("prior_lp")) + sum(col("lp"))).as("score"))
      .groupBy(col(idCol))
      .agg(min(struct((-col("score")).as("ns"), col(labelCol).as("lbl"))).as("best"))
      .select(col(idCol), col("best.lbl").as(s"pred_$labelCol"),
        round(-col("best.ns"), 4).as("score"))
  }

  /** Persist a trained NB model: the distributed (class, word) count
    * relation plus the tiny per-class stats — the classifier twin of the
    * persisted dedup/semantic indexes, so a model trained ONCE on a labeled
    * corpus serves every later batch and stream gate without retraining.
    * Extents: `word_counts` (label, w, cw — corpus-vocabulary-sized, stays
    * distributed at read time), `class_stats` (label, n_docs, n_tok — one
    * row per class), `totals` (n_all, v — one row). Raw counts, not derived
    * log-probs: counts are exact integers (engine-portable, auditable) and
    * the smoothing constant stays a SCORING-time choice.
    */
  def buildNbModel(train: DataFrame, textCol: String, labelCol: String,
                   dir: String): Unit = {
    val (wc, stats0) = trainNb(train, textCol, labelCol)
    wc.write.mode("overwrite").parquet(s"$dir/word_counts")
    val stats = stats0.localCheckpoint() // its own write + the totals write
    stats.write.mode("overwrite").parquet(s"$dir/class_stats")
    totalsFrame(wc, stats).write.mode("overwrite").parquet(s"$dir/totals")
  }

  /** Score documents against a PERSISTED NB model ([[buildNbModel]]) —
    * same output contract as [[naiveBayesClassify]]; the model relation is
    * read, never recomputed (the point of persisting). `labelCol` names
    * the model's label column (it's stored under that name in the extents).
    */
  def scoreWithNbModel(modelDir: String, test: DataFrame, idCol: String,
                       textCol: String, labelCol: String,
                       k: Double = 0.5): DataFrame = {
    require(k > 0, s"smoothing k must be positive, got $k")
    val spark = test.sparkSession
    scoreNb(spark.read.parquet(s"$modelDir/word_counts"),
      classesFrame(spark.read.parquet(s"$modelDir/class_stats"),
        spark.read.parquet(s"$modelDir/totals"), labelCol),
      test, idCol, textCol, labelCol, k)
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169): score
    * every document by how much more likely its unigrams are under a
    * TARGET corpus model than under the RAW corpus model, then resample
    * proportionally to exp(mean log-ratio) — the standard recipe for
    * steering a web-scale crawl toward a high-quality target domain
    * without hand-written filter rules.
    *
    * Both models are add-k-smoothed unigram LMs computed in ONE pass over
    * the exploded tokens (conditional aggregation: target counts and raw
    * counts share the groupBy(word) shuffle); per-document scoring joins
    * the doc's distinct words against that count relation on the word key
    * — model stays distributed, same discipline as [[bigramLmScores]].
    * The mean (not sum) of log-ratios normalizes for document length so
    * the weight is a quality signal, not a length signal.
    *
    * The weight is rounded to 6 decimals so downstream deterministic
    * samplers ([[graft.operators.Splits.weightedSample]]) feed from
    * bit-identical doubles on every engine — the unrounded mean's last
    * ulps are float-summation-order noise with no information in them.
    *
    * @param isTarget boolean Column selecting the target-domain rows of
    *                 `docs` (e.g. `col("lang") === "en"`).
    * @return (id, n_toks, weight): weight = round(exp(avg log-ratio), 6);
    *         documents with zero tokens carry no evidence and are dropped
    *         (downstream samplers would exclude a null/zero weight anyway).
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, k: Double = 0.5): DataFrame =
    importanceWeightsFromCounts(
      docWordCounts(docs, idCol, textCol, isTarget)
        .localCheckpoint(), // feeds word counts, corpus totals AND doc scoring
      idCol, k)

  /** The per-(id, isTarget, word) count frame both [[importanceWeights]]
    * and (projected to (id, w, cnt) — tgt is constant per doc, so the
    * groups coincide) [[scoreNbFromCounts]] aggregate from. Composed lanes
    * materialize THIS once and feed both consumers, so the corpus text is
    * tokenized a single time.
    */
  private[graft] def docWordCounts(docs: DataFrame, idCol: String,
                                   textCol: String, isTarget: Column): DataFrame =
    spread(docs.select(col(idCol), col(textCol), isTarget.as("tgt")))
      .select(col(idCol), col("tgt"), explode(Text.tokens(col(textCol))).as("w"))
      .groupBy(col(idCol), col("tgt"), col("w"))
      .agg(count(lit(1)).as("cnt"))

  /** [[importanceWeights]] over a PRECOMPUTED (and, if shared,
    * materialized) [[docWordCounts]] frame. The raw token stream is
    * shuffled ONCE, into per-(doc, word) counts (the scoring join's left
    * side); both corpus models and the totals re-aggregate from that much
    * smaller frame — exact integer sums, so only the shuffle volume
    * changes.
    */
  private[graft] def importanceWeightsFromCounts(docWords: DataFrame,
                                                 idCol: String,
                                                 k: Double = 0.5): DataFrame = {
    require(k > 0, s"smoothing k must be positive, got $k")
    // one groupBy(word) carries BOTH models: target hits as a conditional
    // sum riding the raw count's shuffle
    val wcnt = docWords.groupBy(col("w")).agg(
      sum(when(col("tgt"), col("cnt")).otherwise(0L)).as("ct"),
      sum(col("cnt")).as("cr"))
    // corpus totals: one row, broadcast
    val tot = docWords.agg(
      sum(when(col("tgt"), col("cnt")).otherwise(0L)).as("nt"),
      sum(col("cnt")).as("nr"),
      count_distinct(col("w")).as("v"))
    docWords
      .join(wcnt, "w")
      .crossJoin(broadcast(tot)) // one row
      .select(col(idCol), col("cnt"),
        (col("cnt") * ((log(col("ct") + lit(k)) - log(col("nt") + lit(k) * col("v")))
          - (log(col("cr") + lit(k)) - log(col("nr") + lit(k) * col("v"))))).as("lr"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_toks"),
        round(exp(sum(col("lr")) / sum(col("cnt"))), 6).as("weight"))
  }
}
