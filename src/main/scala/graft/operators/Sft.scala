package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SFT / instruction-tuning data prep: render grouped event streams into
  * chat-template training strings with LOSS-MASK spans — the step between a
  * curated corpus and a fine-tuning dataloader. Each conversation's turns
  * are rendered `<|role|>text<|end|>` in time order; the loss mask covers
  * exactly the assistant-turn TEXT (not its delimiters), expressed as
  * [start, end) character offsets into the rendered string so the tokenizer
  * downstream can map spans to token masks.
  *
  * Distributed shape (100 TB framing): ONE shuffle keyed by conversation;
  * offsets are per-conversation integer PREFIX SUMS over piece lengths (a
  * running-total window, w2's shape — exact integer arithmetic, so the
  * whole render is engine-portable and hash-checkable); the conversation
  * fingerprint folds the time-sorted pieces per group (state bounded by
  * conversation length, never corpus size). No global sort, no driver-side
  * assembly, no conversation ever materialized outside its group.
  */
object Sft {

  /** Shared conversation scaffolding for the char-space and token-space
    * lanes — normalized turns, then `turn_idx` + the exclusive prefix sum
    * `_start` over `_len` (whatever unit a caller assigns that column:
    * piece chars for [[renderChat]], piece tokens for [[tokenSpans]]).
    * One definition so the two lanes' offset semantics — the exact
    * hand-off contract sft2 pins — cannot drift.
    */
  private def baseTurns(events: DataFrame, convCol: String, tsCol: String,
                        idCol: String, roleCol: String, textCol: String): DataFrame =
    events.select(
        col(convCol), col(tsCol), col(idCol), col(roleCol).as("role"),
        coalesce(col(textCol), lit("")).as("text"))
      // the ONE conversation-keyed shuffle, placed BEFORE the per-turn
      // projection: the piece/regex work runs parallel across the cluster
      // (not in however few splits the scan produced — the Dedup.spread
      // lesson), and every downstream window spec inherits the
      // partitioning. Everything after this line is shuffle-free.
      .repartition(col(convCol))

  private def withOffsets(turns: DataFrame, convCol: String, tsCol: String,
                          idCol: String): DataFrame = {
    val w = Window.partitionBy(col(convCol)).orderBy(col(tsCol), col(idCol))
    turns
      .withColumn("turn_idx", row_number().over(w))
      .withColumn("_start", coalesce(
        sum(col("_len")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
  }

  /** Per-turn render frame: (conv, turn_idx, role, loss_start, loss_end,
    * render_fp, n_turns, n_chars). loss_* are null on non-assistant turns;
    * render_fp/n_* repeat per conversation (md5 + length of the full
    * rendered string — the conversation-level artifact without shipping a
    * megabyte string per row).
    *
    * @param events    input frame
    * @param convCol   conversation key column name
    * @param tsCol     turn order column (ties broken by `idCol`)
    * @param idCol     unique turn id (deterministic tie-break)
    * @param roleCol   turn role ("assistant" turns carry loss)
    * @param textCol   turn text (null-tolerant: rendered as empty)
    */
  def renderChat(events: DataFrame, convCol: String, tsCol: String,
                 idCol: String, roleCol: String, textCol: String): DataFrame = {
    val turns = baseTurns(events, convCol, tsCol, idCol, roleCol, textCol)
      .withColumn("piece",
        concat(lit("<|"), col("role"), lit("|>"), col("text"), lit("<|end|>")))
      .withColumn("_len", length(col("piece")).cast("long"))
    // conversation-level columns ride the SAME window partition as the
    // offsets (full-frame aggregates) — one scan, one shuffle, no second
    // branch and no join-back; the per-group collect_list is bounded by
    // conversation length, exactly the groupBy fold's state
    val wFull = Window.partitionBy(col(convCol))
    withOffsets(turns, convCol, tsCol, idCol)
      .withColumn("loss_start",
        when(col("role") === "assistant",
          col("_start") + length(col("role")).cast("long") + lit(4L)))
      .withColumn("loss_end",
        when(col("role") === "assistant",
          col("_start") + col("_len") - lit(7L)))
      .withColumn("n_turns", count(lit(1)).over(wFull))
      .withColumn("n_chars", sum(col("_len")).over(wFull))
      .withColumn("render_fp", md5(array_join(transform(
        array_sort(collect_list(struct(col(tsCol), col(idCol), col("piece")))
          .over(wFull)),
        t => t("piece")), "")))
      .select(col(convCol), col("turn_idx"), col("role"),
        col("loss_start"), col("loss_end"),
        col("n_turns"), col("n_chars"), col("render_fp"))
  }

  /** TOKEN-space loss spans — the hand-off [[renderChat]]'s char spans
    * exist to feed: the dataloader masks token positions, not characters,
    * so the render's offsets must survive tokenization. Contract (the way
    * production chat templates tokenize): the `<|role|>` / `<|end|>`
    * delimiters are ATOMIC special tokens (1 token each — they never merge
    * into neighboring text), and turn text tokenizes with the BPE
    * pre-tokenizer (`Text.bpeTokenCount`). A turn's piece is then
    * 1 + n_text_tokens + 1 tokens, token offsets are the same
    * per-conversation integer prefix sums as the char form, and an
    * assistant turn's loss mask covers [prefix+1, prefix+1+n_text_tokens).
    *
    * Same distributed shape as [[renderChat]]: ONE shuffle keyed by
    * conversation, exact integer arithmetic throughout — the spans
    * hash-match any engine that restates the token counts.
    */
  def tokenSpans(events: DataFrame, convCol: String, tsCol: String,
                 idCol: String, roleCol: String, textCol: String): DataFrame = {
    val turns = baseTurns(events, convCol, tsCol, idCol, roleCol, textCol)
      .withColumn("n_text_tokens",
        graft.functions.Text.bpeTokenCount(col("text")).cast("long"))
      .withColumn("_len", col("n_text_tokens") + lit(2L))
    withOffsets(turns, convCol, tsCol, idCol)
      .withColumn("tok_start",
        when(col("role") === "assistant", col("_start") + lit(1L)))
      .withColumn("tok_end",
        when(col("role") === "assistant",
          col("_start") + lit(1L) + col("n_text_tokens")))
      .withColumn("n_tokens",
        sum(col("_len")).over(Window.partitionBy(col(convCol))))
      .select(col(convCol), col("turn_idx"), col("role"),
        col("n_text_tokens"), col("tok_start"), col("tok_end"), col("n_tokens"))
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022): rewrite a
    * document as `<|pre|>prefix<|suf|>suffix<|mid|>middle` (PSM mode) so an
    * autoregressive model learns infilling — the code-model sibling of the
    * chat render, applied to a deterministic fraction of the corpus (the
    * paper's ~0.5 FIM rate) while the rest passes through raw.
    *
    * Everything is a pure function of (id, text): the two cut points are
    * modular residues of the id (c1 ∈ [1, n−2], c2 ∈ [c1+1, n−1] — both
    * splits always non-degenerate), mode selection is `id mod fimOne`, and
    * the loss span is integer arithmetic over the piece lengths — so the
    * whole transform is engine-portable and hash-checkable, unlike the
    * published samplers' RNG cuts. Docs too short to cut (n < 3) and null
    * text stay raw. The loss span covers exactly the MIDDLE text inside
    * the render (infilling supervises the moved span; raw docs supervise
    * everything, span [0, n)).
    *
    * Distributed shape: a single codegen'd projection — no shuffle, no
    * UDF; at 100 TB this runs at scan speed and the render's byte cost is
    * the same +21 header bytes per transformed row.
    *
    * @param docs    input frame
    * @param idCol   numeric id (cut-point seed; 0 ≤ id)
    * @param textCol document text
    * @param fimOne  apply FIM to rows with id % fimOne == 0 (2 = half)
    */
  def fimTransform(docs: DataFrame, idCol: String, textCol: String,
                   fimOne: Int = 2): DataFrame = {
    val n = length(col(textCol)).cast("long")
    val eligible = col(textCol).isNotNull && n >= 3 &&
      pmod(col(idCol), lit(fimOne.toLong)) === 0
    val c1 = pmod(col(idCol) * lit(7919L), n - 2) + lit(1L)
    val c2 = c1 + lit(1L) + pmod(col(idCol) * lit(104729L), n - c1 - 1)
    val prefix = substring(col(textCol), lit(1), c1.cast("int"))
    val middle = substring(col(textCol), (c1 + 1).cast("int"), (c2 - c1).cast("int"))
    val suffix = substring(col(textCol), (c2 + 1).cast("int"), n.cast("int"))
    val render = concat(lit("<|pre|>"), prefix, lit("<|suf|>"), suffix,
      lit("<|mid|>"), middle)
    // <|pre|> + prefix + <|suf|> + suffix + <|mid|> precede the middle
    val lossStart = lit(7L) + c1 + lit(7L) + (n - c2) + lit(7L)
    // token space (the [[tokenSpans]] contract: sentinels are ATOMIC, the
    // pieces tokenize independently with the BPE pre-tokenizer — which is
    // also the honest semantics, since the cut falls mid-token and the
    // halves really do tokenize separately in a FIM render)
    def nt(piece: org.apache.spark.sql.Column) =
      graft.functions.Text.bpeTokenCount(piece).cast("long")
    val tokLossStart = lit(3L) + nt(prefix) + nt(suffix)
    docs.select(col(idCol), n.as("n_chars"),
      when(eligible, lit("psm")).otherwise(lit("raw")).as("mode"),
      when(eligible, render).otherwise(col(textCol)).as("rendered"),
      when(eligible, lossStart).otherwise(lit(0L)).as("loss_start"),
      when(eligible, lossStart + (c2 - c1))
        .otherwise(coalesce(n, lit(0L))).as("loss_end"),
      when(eligible, lit(3L) + nt(prefix) + nt(suffix) + nt(middle))
        .otherwise(coalesce(nt(col(textCol)), lit(0L))).as("n_tokens"),
      when(eligible, tokLossStart).otherwise(lit(0L)).as("tok_loss_start"),
      when(eligible, tokLossStart + nt(middle))
        .otherwise(coalesce(nt(col(textCol)), lit(0L))).as("tok_loss_end"))
      .withColumn("render_fp", md5(coalesce(col("rendered"), lit(""))))
  }
}
