package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Preference-pair assembly for DPO/RLHF-style fine-tuning: per prompt,
  * pair the best-scored candidate response (chosen) against the
  * worst-scored one (rejected), keep pairs whose score margin clears a
  * floor — the step that turns a scored candidate pool into a preference
  * dataset (Rafailov et al. 2023's data shape; the sibling of Sft.renderChat
  * on the fine-tuning side of the curation fence).
  *
  * Scores arrive as FIXED-POINT integers (e.g. 4-decimal quality × 10⁴ —
  * emb1/pg1's discipline): argmax/argmin selection and the margin test are
  * then exact integer comparisons, deterministic under any partitioning and
  * restatable verbatim in any engine. Ties break to the SMALLER candidate
  * id on both sides via an injective ordering key `qfp·2³² ∓ id` (injective
  * while 0 ≤ id < 2³² and |qfp| < 2³⁰ — one BIGINT comparison instead of a
  * struct compare, so the same key works as DuckDB's `arg_max` val, whose
  * tie behavior is otherwise unspecified).
  *
  * Distributed shape (100 TB framing): ONE hash aggregation keyed by
  * prompt — max_by/min_by/count are all map-side combined, so per-group
  * state is O(1) no matter how many candidates a prompt accumulates; no
  * window sort over candidate extents, no per-prompt task. The margin
  * filter runs on the aggregated row. Null-scored candidates are dropped
  * before grouping (an unscored response can be neither chosen nor
  * rejected, and must not inflate n_candidates).
  */
object Preference {

  /** State-frame column contract shared by [[preferenceState]] /
    * [[mergePreferenceState]] / [[pairsFromState]]: the prompt key is the
    * FIRST column, followed by exactly these in this order. The contract is
    * validated, not assumed — a state frame whose columns were reordered
    * (a caller's select, a parquet round-trip with a different column
    * order) must fail loudly rather than silently group on the wrong
    * column. */
  private val stateCols = Seq("n_candidates", "_cq", "chosen_id", "_rq", "rejected_id")

  private def statePromptCol(state: DataFrame, caller: String): String = {
    val cols = state.columns
    require(cols.length == stateCols.length + 1 && cols.tail.sameElements(stateCols) &&
      !stateCols.contains(cols.head),
      s"$caller: expected preference-state schema (<prompt>, ${stateCols.mkString(", ")}) " +
        s"in that order, got (${cols.mkString(", ")})")
    cols.head
  }

  /** (prompt, n_candidates, chosen_id, rejected_id, chosen_q, rejected_q,
    * margin) — one row per prompt with ≥2 scored candidates and
    * chosen−rejected ≥ `minMarginFp`. chosen_q/rejected_q/margin are the
    * fixed-point scores scaled back to 4-decimal doubles.
    *
    * @param scored      candidate frame: one row per (prompt, candidate)
    * @param promptCol   prompt key column
    * @param idCol       candidate id (unique, 0 ≤ id < 2³²; tie-break)
    * @param qFpCol      fixed-point score column (|q| < 2³⁰), null = unscored
    * @param minMarginFp minimum chosen−rejected gap, fixed-point units
    */
  def preferencePairs(scored: DataFrame, promptCol: String, idCol: String,
                      qFpCol: String, minMarginFp: Long): DataFrame =
    // the one-shot form IS the single-batch incremental form — defined as
    // the composition so the equivalence dpo2's oracle depends on is
    // structural, not maintained by hand
    pairsFromState(preferenceState(scored, promptCol, idCol, qFpCol), minMarginFp)

  /** Per-prompt MERGEABLE preference state — the daily-ingest form of
    * [[preferencePairs]] (the d8/d6b/d12b discipline applied to the
    * fine-tuning tier): every component is a monoid (count and sum add;
    * best/worst merge by the same injective `qfp·2³² ∓ id` keys the
    * one-shot form selects with), so folding batches through
    * [[mergePreferenceState]] is EQUAL to one aggregation over their
    * union — by algebra, not by protocol. State is bounded by the prompt
    * domain regardless of how many candidates ever streamed through;
    * batches must be disjoint (the count is a sum — replays double-count
    * it; use the d8 marker protocol for at-least-once sources, the
    * best/worst components themselves are replay-idempotent).
    *
    * Columns: (prompt, n_candidates, _cq, chosen_id, _rq, rejected_id).
    */
  def preferenceState(scored: DataFrame, promptCol: String, idCol: String,
                      qFpCol: String): DataFrame = {
    val shift = lit(4294967296L)
    val up = col(qFpCol) * shift - col(idCol)
    val dn = col(qFpCol) * shift + col(idCol)
    scored
      .filter(col(qFpCol).isNotNull)
      .groupBy(col(promptCol))
      .agg(
        count(lit(1)).as("n_candidates"),
        max(col(qFpCol)).as("_cq"),
        max_by(col(idCol), up).as("chosen_id"),
        min(col(qFpCol)).as("_rq"),
        min_by(col(idCol), dn).as("rejected_id"))
  }

  /** Monoid merge of two state frames (missing prompts pass through). */
  def mergePreferenceState(a: DataFrame, b: DataFrame): DataFrame = {
    val promptCol = statePromptCol(a, "mergePreferenceState")
    statePromptCol(b, "mergePreferenceState")
    val shift = lit(4294967296L)
    val up = col("_cq") * shift - col("chosen_id")
    val dn = col("_rq") * shift + col("rejected_id")
    a.unionByName(b)
      .groupBy(col(promptCol))
      .agg(
        sum(col("n_candidates")).as("n_candidates"),
        max(col("_cq")).as("_cq"),
        max_by(col("chosen_id"), up).as("chosen_id"),
        min(col("_rq")).as("_rq"),
        min_by(col("rejected_id"), dn).as("rejected_id"))
  }

  /** [[preferencePairs]]' output contract read from a state frame. */
  def pairsFromState(state: DataFrame, minMarginFp: Long): DataFrame = {
    val promptCol = statePromptCol(state, "pairsFromState")
    state
      .filter(col("n_candidates") >= 2 &&
        col("_cq") - col("_rq") >= minMarginFp)
      .select(col(promptCol), col("n_candidates"),
        col("chosen_id"), col("rejected_id"),
        round(col("_cq").cast("double") / 10000.0, 4).as("chosen_q"),
        round(col("_rq").cast("double") / 10000.0, 4).as("rejected_q"),
        round((col("_cq") - col("_rq")).cast("double") / 10000.0, 4).as("margin"))
  }

  /** Group-relative advantage (GRPO, Shao et al. 2024): z-score each
    * candidate's reward against its prompt group's mean/std — the signal a
    * GRPO trainer weights its policy gradients with, and the many-candidate
    * generalization of [[preferencePairs]]' best-vs-worst cut.
    *
    * The z-score is computed from INTEGER group moments:
    * z = (n·q − S) / √(n·Σq² − S²), since (q−μ)/σ with μ = S/n and
    * σ = √(nΣq² − S²)/n cancels the n's. Both operands are exact BIGINTs
    * while n·max|qfp| < 2³¹ (then |S| and √(n·Σq²) are both under 2³¹, so
    * n·Σq² and S² stay under 2⁶² and their difference cannot wrap) — at
    * the 4-decimal quality scale that is ~200k candidates per prompt, and
    * the moment frame RAISES on violation rather than let non-ANSI Long
    * arithmetic wrap into silently-wrong z-scores. Within the bound the
    * only float operations are one correctly-rounded IEEE sqrt and one
    * division of exactly-representable integers — bit-identical under any
    * partitioning or engine, with none of the summation-order ulps that
    * make naive mean/std unpinnable. Degenerate groups (n < 2, or zero
    * variance) emit a null advantage — a GRPO batch skips them rather than
    * divide by zero.
    *
    * Distributed shape: one map-side-combined moment aggregation keyed by
    * prompt (count/sum/sum-of-squares), then the prompt-domain-bounded
    * moment frame joins back to the candidates — broadcast-sized whenever
    * the prompt domain is, and an equi-join either way. No window over
    * candidate extents. Null-scored candidates are excluded from both the
    * moments and the output.
    */
  def groupAdvantage(scored: DataFrame, promptCol: String, idCol: String,
                     qFpCol: String): DataFrame = {
    // the contract is FIXED-POINT INTEGER scores: a fractional column would
    // be silently truncated by the widening cast below (0.95 -> 0, total
    // signal loss with no error) — off-envelope input must RAISE instead
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val qType = scored.schema(qFpCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(qType),
      s"groupAdvantage: $qFpCol must be an integral fixed-point column " +
        s"(|qfp| < 2^30), got $qType — scale fractional scores to fixed " +
        s"point first (e.g. round(q * 10000).cast(\"long\"))")
    val s = scored.filter(col(qFpCol).isNotNull)
    // widen BEFORE squaring: an IntegerType qfp column inside the documented
    // |qfp| < 2^30 envelope still wraps the per-row int*int square past
    // |qfp| > 46340 under non-ANSI arithmetic — and the n*max|qfp| tripwire
    // below cannot see it, since n and qmax don't wrap
    val qWide = col(qFpCol).cast("long")
    val moments = s.groupBy(col(promptCol)).agg(
        count(lit(1)).as("n_candidates"),
        sum(qWide).as("_s"),
        sum(qWide * qWide).as("_ss"),
        max(abs(qWide)).as("_qmax"))
      // overflow tripwire on the prompt-domain-bounded frame (one
      // comparison per GROUP, not per candidate): outside the documented
      // envelope the non-ANSI Long math would wrap silently
      // divide, don't multiply: n * qmax could itself wrap before the test
      .withColumn("_ss", when(
        col("n_candidates") >= lit(2147483648L) / greatest(col("_qmax"), lit(1L)),
        raise_error(concat(lit("groupAdvantage: n*max|qfp| >= 2^31 for prompt "),
          col(promptCol).cast("string"), lit(" — moments would overflow"))))
        .otherwise(col("_ss")))
    val varNum = col("n_candidates") * col("_ss") - col("_s") * col("_s")
    s.join(moments, promptCol)
      .select(col(promptCol), col(idCol), col("n_candidates"),
        round(col(qFpCol).cast("double") / 10000.0, 4).as("q"),
        when(col("n_candidates") >= 2 && varNum > 0,
          round((col("n_candidates") * col(qFpCol) - col("_s")).cast("double") /
            sqrt(varNum.cast("double")), 4)).as("advantage"))
  }
}
