package graft.operators

import org.apache.spark.sql.DataFrame
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
}
