package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-set assembly primitives: the two steps between a curated corpus
  * and a training dataloader — deterministic corpus splits and fixed-context
  * sequence packing. Both are engine-portable by construction (md5 hex and
  * integer arithmetic only), so their results are DuckDB-oracle-checkable
  * and reproducible across reruns, cluster sizes, and engines.
  */
object Splits {

  /** Deterministic hash split (train/val/test): the first 8 hex digits of
    * `md5(salt:id)` are uniform on [0, 2^32); a cumulative fraction f maps
    * to the fixed bound floor(f·2^32) printed as 8 lowercase hex digits, and
    * lexicographic comparison of fixed-width same-case hex EQUALS numeric
    * comparison — so the identical CASE ladder runs on any SQL engine.
    * Changing `salt` re-rolls the split without touching ids; membership is
    * a pure function of (salt, id), never of row order or partitioning.
    * A NULL id hashes to NULL and falls through every `<` test into the
    * LAST bucket — deterministic, but callers should treat null ids as a
    * data-quality failure upstream, not rely on that placement.
    */
  def hashSplit(df: DataFrame, idCol: String, salt: String,
                splits: Seq[(String, Double)], as: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "fractions must be positive")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    val h = substring(md5(concat(lit(s"$salt:"), col(idCol).cast("string"))), 1, 8)
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail
      .map(f => f"${math.min((f * 4294967296.0).toLong, 4294967295L)}%08x")
    val assigned = splits.init.zip(bounds).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), bound)) =>
        Some(acc.fold(when(h < lit(bound), name))(_.when(h < lit(bound), name)))
    }.fold(lit(splits.last._1): Column)(_.otherwise(splits.last._1))
    df.withColumn(as, assigned)
  }

  /** LEAKAGE-SAFE deterministic split: [[hashSplit]] keyed by the near-dup
    * COMPONENT instead of the document id, so an entire duplicate cluster
    * lands in one split and no near-dup pair can straddle train/test — the
    * contamination channel an id-keyed split leaves open (measured on this
    * corpus: 14 of 25 MinHash near-dup pairs cross the sp1-style id split,
    * 6 of them train↔test — the sl1 audit query). Pairs come from ANY
    * blocker ([[Dedup.minhashLshPortable]] in the registered lane);
    * components from [[Dedup.connectedComponents]] (salted star joins, hub
    * skew bounded); docs in no pair key by their own id, so the split
    * remains a pure function of (salt, pair graph, id) and reproduces in
    * ANSI SQL — the whole chain, CC included, is the d6 oracle's recursive
    * CTE plus sp1's CASE ladder.
    */
  def componentSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                     aCol: String, bCol: String, salt: String,
                     splits: Seq[(String, Double)],
                     as: String = "split"): DataFrame = {
    // collision-proof internal names: an input already carrying `comp`
    // would make the join ambiguous, and a caller `_skey` would be silently
    // overwritten then dropped (round-14 advice) — refuse the (improbable)
    // reserved names instead of corrupting them
    val internal = Seq("__cs_comp", "__cs_key")
    require(!df.columns.exists(internal.contains),
      s"input must not contain reserved columns ${internal.mkString(", ")}")
    val comp = Dedup.connectedComponents(pairs, aCol, bCol)
      .select(col("id").as(idCol), col("comp").as("__cs_comp"))
    val keyed = df.join(comp, Seq(idCol), "left")
      .withColumn("__cs_key", coalesce(col("__cs_comp"), col(idCol)))
    hashSplit(keyed, "__cs_key", salt, splits, as).drop(internal: _*)
  }

  /** Deterministic global training-order shuffle: every row gets a
    * `shard` (0..nShards-1) and a 1-based `pos` within its shard, both pure
    * functions of (salt, id) — the reproducible document ordering a
    * training run ships to its dataloader, stable across reruns, cluster
    * sizes, partitionings, and engines (Spark's own `orderBy(rand(seed))`
    * is none of those: rand is partition-layout-dependent). Changing
    * `salt` re-rolls the whole permutation; epoch k = salt "run1:epoch3".
    *
    * Mechanics: sort key = signed-shifted `md5Lower64(salt:id)` (the
    * [[graft.operators.Integrity.md5Lower64]] idiom — DuckDB's
    * `md5_number_lower` minus 2^63, so the BIGINT order equals the
    * unsigned hash order on both engines); shard = pmod(key, nShards);
    * pos = exact rank of (key, id) within the shard via
    * [[ScalableWindow.rowNumber]] — per-shard volume is N/nShards and the
    * sliced ranker sorts it at |shards| x slices parallelism, so there is
    * NO single-task global sort anywhere (the naive
    * `row_number() OVER (ORDER BY hash)` global shuffle is exactly the
    * scale killer this exists to avoid at 100 TB).
    */
  def deterministicShuffle(df: DataFrame, idCol: String, salt: String,
                           nShards: Int): DataFrame = {
    // "_n" is reserved too: the ranker's group-size column would collide
    // with (and the final drop would destroy) a caller column of that name
    val internal = Seq("__ds_key", "shard", "pos", "_n")
    require(!df.columns.exists(internal.contains),
      s"input must not contain reserved columns ${internal.mkString(", ")}")
    val keyed = deterministicShard(df, idCol, salt, nShards)
      .withColumn("__ds_key", shuffleKey(idCol, salt))
    ScalableWindow.rowNumber(keyed, "shard", "__ds_key", idCol, as = "pos")
      .drop("__ds_key", "_n")
  }

  /** Just the shard assignment of [[deterministicShuffle]] — for consumers
    * that never read positions (c6's per-shard manifest), sparing them the
    * ranker's sort entirely: shard is pure row-local arithmetic.
    */
  def deterministicShard(df: DataFrame, idCol: String, salt: String,
                         nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    require(!df.columns.contains("shard"),
      "input must not contain reserved column shard")
    df.withColumn("shard",
      pmod(shuffleKey(idCol, salt), lit(nShards.toLong)).cast("int"))
  }

  /** The signed-shifted md5Lower64 sort/shard key shared by both forms. */
  private def shuffleKey(idCol: String, salt: String): Column =
    (Integrity.md5Lower64(concat(lit(s"$salt:"), col(idCol).cast("string")))
      - lit(BigDecimal("9223372036854775808"))).cast("long")

  /** WHOLE-DOCUMENT greedy sequence packing — the no-split twin of
    * [[packSequences]]: a document never straddles a context boundary;
    * when it would overflow the current sequence's remaining budget, a new
    * sequence starts (an oversized single document occupies a sequence
    * alone). This is the packing mode used when documents must stay intact
    * (instruction tuning, contrastive pairs), and it is the one that
    * WASTES tokens — the pk2 lane reports the padding bill that concat-
    * and-cut (pk1) avoids.
    *
    * Scale shape: docs shard by `idCol div shardSize` exactly like
    * [[packSequences]]; each shard's assignment is a sequential fold over
    * its ≤ shardSize docs run as ONE bounded array fold inside an
    * aggregate (the ScalableWindow prefix-offset idiom — state is
    * (fill, seq) + the emitted list, bounded by shardSize, never a
    * window over unbounded rows). Shards pack independently and in
    * parallel; cross-shard coupling is deliberately absent, same contract
    * as pk1.
    *
    * Recurrence per shard, docs in `idCol` order: a doc with t tokens
    * OVERFLOWS iff fill + t > ctxLen AND fill > 0 AND t > 0; then seq+1,
    * fill := t; else seq, fill += t. Zero-token docs (null token counts
    * coalesce to 0) therefore NEVER overflow and always stay in the
    * current sequence — the `t > 0` conjunct matters: without it a
    * zero-token doc following an oversized one would be evicted into an
    * all-padding sequence of its own (round-15 review finding). The
    * precise invariant is thus: a sequence's token sum exceeds ctxLen
    * only when it contains exactly ONE positive-token document (possibly
    * plus zero-token ones). The same recurrence restates as a recursive
    * CTE (the pk2 oracle).
    */
  def packSequencesWhole(df: DataFrame, idCol: String, tokensCol: Column,
                         ctxLen: Int, shardSize: Long = 1024): DataFrame = {
    require(ctxLen > 0, s"ctxLen must be positive, got $ctxLen")
    require(shardSize > 0, s"shardSize must be positive, got $shardSize")
    val folded = df
      .withColumn("_tokens", coalesce(tokensCol.cast("long"), lit(0L)))
      .withColumn("_shard", expr(s"$idCol div $shardSize"))
      .groupBy(col("_shard"))
      .agg(sort_array(collect_list(struct(col(idCol).as("id"), col("_tokens").as("t")))).as("_ds"))
      .withColumn("_asg", aggregate(col("_ds"),
        struct(lit(0L).as("fill"), lit(0L).as("seq"),
          expr("CAST(array() AS ARRAY<STRUCT<id: BIGINT, seq: BIGINT, t: BIGINT>>)").as("out")),
        (a, x) => {
          val over = (a.getField("fill") + x.getField("t") > ctxLen) &&
            (a.getField("fill") > 0) && (x.getField("t") > 0)
          val seq = when(over, a.getField("seq") + 1).otherwise(a.getField("seq"))
          val fill = when(over, x.getField("t"))
            .otherwise(a.getField("fill") + x.getField("t"))
          struct(fill.as("fill"), seq.as("seq"),
            concat(a.getField("out"),
              array(struct(x.getField("id").as("id"), seq.as("seq"),
                x.getField("t").as("t")))).as("out"))
        },
        a => a.getField("out")))
    folded.select(col("_shard").as("shard"), explode(col("_asg")).as("a"))
      .select(col("shard"), col("a.id").as(idCol), col("a.seq").as("seq_id"),
        col("a.t").as("n_tokens"))
  }

  /** Deterministic fractional upsampling (dataset mixture weighting): each
    * row is emitted `floor(factor)` times, plus one more iff the row's
    * md5-hex draw falls under the fractional remainder — so multiplicity is
    * a pure function of (salt, id, factor) with expectation exactly
    * `factor`, reproducible across engines, reruns, and partitionings
    * (sampling with a random seed is not: Spark ties it to partition
    * layout). The hex bound is `format_string("%08x", floor(frac·2^32))`,
    * clamped to 2^32−1 like [[hashSplit]] — without the clamp, a fractional
    * part within 2^-33 of 1.0 rounds to 2^32 and prints as the 9-char
    * '100000000', inverting the lexicographic `h < bound` test. The same
    * printf runs on any SQL engine. Adds `copy_idx` (1-based). Negative
    * factors are clamped to 0 (the row is dropped), the only multiplicity
    * a negative weight can mean.
    */
  def upsample(df: DataFrame, idCol: String, salt: String, factor: Column): DataFrame = {
    val f = greatest(factor, lit(0.0))
    val h = substring(md5(concat(lit(s"$salt:"), col(idCol).cast("string"))), 1, 8)
    val bound = format_string("%08x",
      least(floor((f - floor(f)) * lit(4294967296.0)).cast("long"), lit(4294967295L)))
    val copies = floor(f).cast("long") + when(h < bound, 1L).otherwise(0L)
    df.withColumn("_copies", copies)
      .filter(col("_copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(1L), col("_copies"))))
      .drop("_copies")
  }

  /** Deterministic weighted sample without replacement (Efraimidis-Spirakis
    * A-ES): each row draws a uniform u from the portable 64-bit hash
    * ([[Integrity.md5Lower64]], so the SAME u on any engine) and takes
    * priority u^(1/w); the k largest priorities are the sample. Inclusion
    * probability is proportional to weight, and the draw is a pure function
    * of (salt, id, weight) — reproducible across engines, reruns, and
    * partitionings, unlike rand()-keyed sampling.
    *
    * Scale shape: ONE global [[graft.functions.TopKStruct]] bounded-heap
    * aggregate — shuffle ≤ k entries per partition, never a full sort.
    * Returns (rank, id, priority) with priority rounded to 6 digits for
    * display; selection uses the unrounded key.
    *
    * Rows with NULL or non-positive weight are excluded before the draw:
    * w=0 has inclusion probability 0 by definition, and w<0 would flip the
    * exponent sign so u^(1/w) ≥ 1, outranking every legitimate row — the
    * same reason [[upsample]] clamps negative factors to 0.
    */
  def weightedSample(df: DataFrame, idCol: String, salt: String,
                     weightCol: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // (h+1)/2^64 ∈ (0,1]; 2^64 is a power of two, exactly representable
    val u = (Integrity.md5Lower64(concat(lit(s"$salt:"), col(idCol).cast("string")))
      .cast("double") + lit(1.0)) / lit(18446744073709551616.0)
    val key = pow(u, lit(1.0) / weightCol.cast("double"))
    // NaN needs its own test: Spark orders NaN ABOVE every number, so
    // `NaN > 0` is true and pow(u, 1/NaN) = NaN would float to the top of
    // the heap — the exact failure the positivity guard exists to stop.
    val w = weightCol.cast("double")
    df.filter(w > 0 && !isnan(w))
      .agg(call_function("topk_struct",
        struct(key.as("k"), col(idCol).as("id")),
        struct(col(idCol).as("id"), round(key, 6).as("priority")),
        lit(k)).as("top"))
      .select(posexplode(col("top")).as(Seq("rank0", "s")))
      .select((col("rank0") + 1).cast("long").as("rank"),
        col("s.id").as(idCol), col("s.priority").as("priority"))
  }

  /** Fixed-context sequence packing (streaming concat-and-cut): within each
    * (group, shard) stream, documents are laid out in id order and cut into
    * `ctxLen`-token windows; a document belongs to the window its FIRST
    * token lands in (`seq_id = floor(tokens_before / ctxLen)`).
    *
    * Scale shape: ONE running-sum window partitioned by (group, shard) where
    * `shard = id div shardSize` — partition count grows with the corpus, so
    * there is no single-task cumsum at any scale (packing is embarrassingly
    * parallel across shards by construction, the standard practice for
    * training-shard assembly). Adds `_shard`, `_tokens`, `seq_id`.
    */
  def packSequences(df: DataFrame, groupCol: String, idCol: String,
                    tokensCol: Column, ctxLen: Int,
                    shardSize: Long = 1024): DataFrame = {
    require(ctxLen > 0, s"ctxLen must be positive, got $ctxLen")
    require(shardSize > 0, s"shardSize must be positive, got $shardSize")
    val w = Window.partitionBy(col(groupCol), col("_shard")).orderBy(col(idCol))
    df.withColumn("_tokens", tokensCol)
      .withColumn("_shard", expr(s"$idCol div $shardSize"))
      .withColumn("_cum", sum(col("_tokens")).over(w))
      .withColumn("seq_id", floor((col("_cum") - col("_tokens")) / ctxLen))
      .drop("_cum")
  }
}
