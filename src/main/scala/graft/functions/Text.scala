package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline operators
  * (charter E3 / T-series). All pure `functions._` compositions — codegen'd,
  * no UDFs — and each has a straightforward DuckDB equivalent so the t2
  * oracle can check them (list_filter/list_transform mirror filter/transform).
  */
object Text {

  /** Lowercased alphanumeric tokens; empty tokens dropped. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => length(t) > 0)

  /** Distinct token set. */
  def tokenSet(c: Column): Column = array_distinct(tokens(c))

  /** Threshold-bounded Levenshtein distance (−1 when > k): the native
    * [[LevBounded]] expression with its ASCII byte fast path, registered as
    * SQL `lev_bounded` by [[graft.GraftExtensions]]. Result-identical to
    * `levenshtein(a, b, k)` for every input (LevBoundedSpec).
    */
  def levBounded(a: Column, b: Column, k: Int): Column =
    call_function("lev_bounded", a, b, lit(k))

  /** 3-token shingles (1-based element_at matches DuckDB list indexing).
    * Empty array when fewer than 3 tokens.
    */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** 2-token shingles (1-based element_at matches DuckDB list indexing).
    * Empty array when fewer than 2 tokens.
    */
  def bigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** English stopword hit count over a token array (n-gram-free heuristic
    * language ID signal; the list is small so the lambda stays codegen'd).
    */
  val enStopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "for", "on", "with", "as", "by", "at")

  def stopwordHits(toks: Column): Column =
    size(filter(toks, t => t.isInCollection(enStopwords)))

  /** Sum of token lengths (exact int math). */
  def totalTokenLen(toks: Column): Column =
    aggregate(transform(toks, t => length(t)), lit(0), (acc, x) => acc + x)

  /** Characters that are neither lowercase alnum nor space, after lowering —
    * the "punctuation-ish" count used by the quality score.
    */
  def punctCount(c: Column): Column =
    length(regexp_replace(lower(c), "[a-z0-9 ]", ""))

  /** Whitespace-normalized md5 fingerprint (portable across engines). */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(c), "\\s+", " "))

  /** GPT-2-style BPE pre-tokenizer pattern, simplified to constructs shared
    * by Java regex and RE2 (no lookarounds): contraction suffixes, space+word,
    * space+number, space+punct-run, whitespace-run. Counting its matches
    * approximates BPE piece counts without a merges table.
    */
  val bpePattern: String =
    "'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+"

  /** Sentence segments of `c`: split on sentence punctuation runs, trimmed,
    * empties dropped — t7's exact arithmetic, shared with
    * [[graft.operators.Dedup.sentenceDedup]] so the two lanes cannot drift
    * (the DuckDB twin is regexp_split_to_array + trim + len filter).
    */
  def sentenceArray(c: Column): Column =
    filter(transform(split(c, "[.!?]+"), x => trim(x)), x => length(x) > 0)

  /** BPE-ish piece count over raw text. */
  def bpeTokenCount(c: Column): Column =
    regexp_count(c, lit(bpePattern))

  /** Char-trigram language scores (n-gram heuristic language ID): counts of
    * high-frequency English vs German trigrams. Portable: plain alternation
    * of fixed-length literals, identical leftmost non-overlapping counts in
    * Java regex and RE2.
    */
  val enTrigrams = "(the|and|ing|ion|ent|for|her)"
  val deTrigrams = "(der|und|sch|ein|ich|den)"
}
