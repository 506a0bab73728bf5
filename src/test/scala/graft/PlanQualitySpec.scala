package graft

/** Plan-shape guard over the ENTIRE query surface: no query may plan a
  * CartesianProduct, and BroadcastNestedLoopJoin is allowed only where the
  * broadcast side is bounded by construction (a one-row aggregate, a bounded
  * query set, a fixed centroid table). Catches the classic scale killer — a
  * join that silently degenerates to all-pairs between two LARGE sides — at
  * spec time instead of at 100 TB.
  */
class PlanQualitySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Queries whose BNL crosses with a broadcast frame that is small by
    * construction, so the nested loop is the intended bounded scan — mapped
    * to the EXACT number of BNLs their plan is allowed to contain, so a
    * future unbounded BNL introduced anywhere else in an allowlisted query
    * still fails the guard (round-7 advice: a bare name exemption would
    * let it through silently):
    *  - t6_tfidf: one-row corpus-size aggregate.
    *  - e2_cosine_topk: brute-force baseline — broadcast query set vs
    *    streamed corpus under a non-equi (a_id =!= b_id) condition.
    *  - e2d_ann_ivf: IVF assignment — corpus x centroids AND query x
    *    centroids scoring, both against the nCells(=16) broadcast centroid
    *    table (linear in corpus / queries).
    *  - e2e_ann_recall: contains e2's brute-force branch as its ground truth.
    *  - e2f_ivf_recall: brute-force ground-truth branch + e2d's two
    *    centroid-assignment crosses (16 broadcast centroids).
    *  - t9_bigram_lm: one-row vocabulary-size aggregate (same shape as
    *    t6_tfidf's corpus-size scalar).
    *  - t12_bm25: TWO one-row corpus scalars (doc count N and average
    *    document length) crossed into the per-term score — both bounded by
    *    construction, same shape as t6's.
    *  - h2_equidepth_histogram / pr1_percent_rank: ScalableWindow over a
    *    CONSTANT partition key — Catalyst folds the key, so the two
    *    broadcast joins (the 1-row boundary table and the |slices|-row
    *    offset table, both bounded by construction) lose their equi-keys
    *    and plan as BNL.
    */
  private val boundedBroadcastBnl: Map[String, Int] = Map(
    "t6_tfidf" -> 1,
    "e2_cosine_topk" -> 1,
    // e2d (round-16 gate shape): the brute-force recall ground truth
    // (1 scalar BNL, e2's shape) + FOUR one-row gate-aggregate crossJoins
    // (n_queries x k x scores x rank x recall). The IVF centroid crosses
    // that used to be the lane's 2 BNLs now run at construction behind the
    // approx localCheckpoint.
    "e2d_ann_ivf" -> 5,
    // d2/d3b/e2c (round-16 gate shapes): one-row gate-aggregate
    // crossJoins only — the truth/emitted frames are localCheckpointed, so
    // their own join machinery (banded equi-joins; e2c's all-pairs
    // broadcast cross) runs bounded at construction and never appears in
    // the returned plan. d2's third is the weak-band tripwire aggregate.
    "d2_minhash_lsh" -> 3,
    "d3b_simhash_neardup" -> 1,
    "e2c_embedding_neardup" -> 1,
    // c8 (round-16 retrieval composition): brute-force recall ground truth
    // (1 scalar BNL, e2's shape) + FIVE one-row gate-aggregate crossJoins
    // (n_queries x n_corpus x k x scores x rank x recall); the chunk
    // corpus and the IVF-PQ result are localCheckpointed, so their join
    // machinery runs bounded at construction.
    "c8_retrieval_pipeline" -> 6,
    "e2e_ann_recall" -> 1,
    "e2f_ivf_recall" -> 3,
    // e2h composes brute-force (1 scalar BNL, e2's shape) with the sampled
    // IVF path (2, e2d's shape) — all one-row/|cells|-row broadcasts,
    // bounded by construction.
    "e2h_ivf_sampled_recall" -> 3,
    // e2k mirrors e2h's three bounded shapes (brute-force scalar + the two
    // 16-row centroid assignment crosses); the distributed trainer's own
    // assignCells crosses run EAGERLY at construction (bounded sample ×
    // 16-row broadcast) and never appear in the returned plan.
    "e2k_ivf_scalable_recall" -> 3,
    // e2l: brute-force ground truth (1 scalar BNL, e2's shape) + the PQ
    // queryCells centroid cross (16-row broadcast, e2d's query-side shape).
    // The corpus-side assignCells cross is localCheckpointed inside
    // ivfPqTopKWithCentroids (it feeds both the codes extent and the
    // re-rank raw side), so it runs bounded at construction and never
    // appears in the returned plan — d9's pattern.
    "e2l_ivfpq_recall" -> 2,
    // e2i is e2's brute-force lane (bounded query-set broadcast) with the
    // label-mismatch residual folded into the non-equi condition; e2j's
    // bucket equi-join keeps it BNL-free.
    "e2i_hard_negatives" -> 1,
    // d9b: the corpus-side assignCells cross against the 16-row broadcast
    // centroid table (e2d's exact shape — linear in corpus, bounded by
    // construction). d9 plans ZERO only because semanticDedup
    // localCheckpoints its single assignment (the plan is truncated, the
    // same BNL runs inside it); the incremental corpus side is consumed
    // once, so a checkpoint would buy nothing but a materialization. The
    // delta-side assignment IS checkpointed (3 consumers) and stays hidden.
    "d9b_semantic_dedup_incremental" -> 1,
    "t9_bigram_lm" -> 1,
    "t12_bm25" -> 2,
    // t17: the 1-row train-vocab broadcast crossed into the scoring join
    // (t9's shape) + ScalableWindow.rowNumber's bounded internals on the
    // per-lang rank (|lang|-row boundary/offset broadcasts).
    "t17_perplexity_buckets" -> 5,
    // rrf1: two one-row corpus scalars (n_docs, avgdl — t12's BM25 shape)
    // + the dense ranker's bounded query-vector broadcast with the
    // non-equi self-exclusion residual (e2's brute-force shape).
    "rrf1_hybrid_retrieval" -> 3,
    // mix2: one-row n_max aggregate crossed into the |sources|-row rate
    // table — t6_tfidf's corpus-scalar shape.
    "mix2_temperature_mixing" -> 1,
    // e6: one-row total-files scalar crossed into the ≤4-row status
    // aggregate (replaced the surface's last unpartitioned window,
    // round-14 verdict item 5) — t6_tfidf's corpus-scalar shape.
    "e6_status_distribution" -> 1,
    // up1: one-row (total tokens, source count) scalar crossed into the
    // |sources|-row mixture table — same window→scalar replacement as e6.
    "up1_mixture_upsample" -> 1,
    "h2_equidepth_histogram" -> 2,
    "pr1_percent_rank" -> 2,
    // t16: the one-row vocab scalar + one-row train-doc-count scalar crossed
    // into the per-class prior frame, then that |classes|(=5)-row frame
    // crossed into the per-doc word counts — all three bounded by
    // construction; the MODEL relation joins on (word, lang) equi-keys and
    // never nests.
    "t16_nb_langid" -> 3,
    // ws2: one-row corpus-totals scalar (target tokens, raw tokens, vocab)
    // crossed into the per-doc word scoring — t6_tfidf's corpus-scalar shape.
    "ws2_dsir_resample" -> 1,
    // c4 composes t16's classifier (its 3 bounded crosses) with ws2's
    // weight pass (its 1 corpus scalar) — the same four bounded broadcasts,
    // no new nesting introduced by the composition.
    "c4_classifier_curation" -> 4)

  private def countBnl(plan: String): Int =
    "BroadcastNestedLoop".r.findAllMatchIn(plan).size

  test("no query plans a cartesian product; BNL only on bounded broadcasts, exact count") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      val bnls = countBnl(plan)
      val allowed = boundedBroadcastBnl.getOrElse(name, 0)
      val cartesian = plan.contains("CartesianProduct")
      if (cartesian) Some(s"$name: CartesianProduct")
      else if (bnls > allowed) Some(s"$name: $bnls BroadcastNestedLoopJoin(s), allowed $allowed")
      else None
    }
    assert(offenders.isEmpty, s"degenerate join plans:\n${offenders.mkString("\n")}")
  }

  test("every TPC-H shape plans at least one whole-stage-codegen span") {
    // codegen tripwire for the hot relational path: a non-codegen Expression
    // or an interpreted fallback slipped into a q* query would silently cost
    // 2-10x at scale. Codegen stages print as `*(n)` — but only in the FINAL
    // adaptive plan, so each query must execute before inspection (the
    // pre-execution AdaptiveSparkPlan string carries no codegen markers).
    val qShapes = SparkEntry.queries.keys.filter(_.matches("q\\d+_.*")).toSeq.sorted
    assert(qShapes.size >= 18, s"TPC-H suite shrank? $qShapes")
    val bare = qShapes.filterNot { name =>
      val qe = SparkEntry.queries(name)(spark, sfDir).queryExecution
      // run THIS plan (df.count() would execute a different wrapping plan
      // and leave this AdaptiveSparkPlan un-finalized)
      qe.toRdd.count()
      val plan = qe.executedPlan.toString
      // AQE empty-relation propagation can collapse a whole query to an
      // EmptyRelation/LocalTableScan at tiny SFs (q7's nation pair has no
      // suppliers at sf0.001) — the optimizer WORKING, not a codegen loss
      plan.contains("*(") || plan.contains("LocalTableScan") ||
        plan.contains("EmptyRelation")
    }
    assert(bare.isEmpty, s"q-shapes with NO codegen span: $bare")
  }

  /** w4's scalable-ntile plan invariant (round-7 verdict): the only window
    * allowed to run over the raw events scan must partition by BOTH the key
    * and the slice column (parallelism |keys| x slices, never one task per
    * key); single-key windows may exist only over pre-aggregated inputs
    * (the tiny per-slice offset frame). Walked on the physical tree, so a
    * regression back to `Window.partitionBy(event_type)` over the scan
    * fails here even though the result would still be correct.
    */
  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
  import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
  import org.apache.spark.sql.execution.window.WindowExec

  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  /** Aggregate anywhere strictly below the window's child chain BEFORE a
    * leaf is reached means the window input is already reduced.
    */
  private def overAggregate(p: SparkPlan): Boolean = {
    val u = unwrap(p)
    u.isInstanceOf[BaseAggregateExec] || (u.children.nonEmpty && u.children.forall(overAggregate))
  }

  test("w4_ntile: no single-task-per-key window over the raw scan") {
    val plan = unwrap(
      SparkEntry.queries("w4_ntile")(spark, sfDir).queryExecution.executedPlan)
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "expected window operators in the w4 plan")
    val bad = windows.filter(w => w.partitionSpec.size < 2 && !overAggregate(w.child))
    assert(bad.isEmpty,
      s"single-key window over non-aggregated input:\n${bad.mkString("\n")}")
  }

  /** A window with NO partition key moves every row to one task — the
    * hardest possible scale killer. The only admissible use is over an
    * already-aggregated bounded frame (e.g. a pct-of-total readout across
    * a handful of group rows), so that is exactly what this asserts for
    * every query on the surface.
    */
  test("no query plans a global (unpartitioned) window over non-aggregated input") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = unwrap(fn(spark, sfDir).queryExecution.executedPlan)
      plan.collect { case w: WindowExec if w.partitionSpec.isEmpty && !overAggregate(w.child) =>
        s"$name: global window over ${unwrap(w.child).nodeName}"
      }
    }
    assert(offenders.isEmpty, s"global windows over raw input:\n${offenders.mkString("\n")}")
  }

  /** Shuffle-count pins for the round-15 training-assembly lanes: each
    * lane's scale story is "N shuffles and no more", so the plan must not
    * silently grow one (a stray repartition, a lost map-side combine, a
    * join that stopped broadcasting). Counted as Exchange nodes in the
    * FINAL adaptive plan (AQE may remove but never add exchanges vs the
    * cap). bpe2's replace chain must additionally stay inside whole-stage
    * codegen (asserted below — a non-codegen expression in the 8-replace
    * chain would cost a virtual call per merge per token).
    */
  test("training-assembly lanes: shuffle counts stay at their designed caps") {
    val caps = Map(
      // ONE per-doc aggregate + the presentation orderBy's range exchange
      "bpe2_apply_merges" -> 2,
      // same budget through the mapPartitions applier
      "bpe2b_apply_merges_scalable" -> 2,
      // word count + vocab pair agg + top-k ordering
      "bpe1_pair_counts" -> 3,
      // the datacard aggregate (countDistinct's exact two-phase form costs
      // a second exchange — the price of an EXACT dup count) + the orderBy
      "c7_corpus_datacard" -> 3,
      // ONE groupBy(_shard) fold + the per-(shard,seq) readout aggregate
      "pk2_whole_doc_packing" -> 2)
    val offenders = caps.toSeq.sortBy(_._1).flatMap { case (name, cap) =>
      val qe = SparkEntry.queries(name)(spark, sfDir).queryExecution
      qe.toRdd.count() // finalize the adaptive plan
      val plan = unwrap(qe.executedPlan).toString
      val n = "Exchange".r.findAllMatchIn(plan).size
      if (n > cap) Some(s"$name: $n exchanges, designed cap $cap") else None
    }
    assert(offenders.isEmpty, s"shuffle growth:\n${offenders.mkString("\n")}")
    // the replace-chain applier must run inside whole-stage codegen
    val bpe2qe = SparkEntry.queries("bpe2_apply_merges")(spark, sfDir).queryExecution
    bpe2qe.toRdd.count()
    assert(bpe2qe.executedPlan.toString.contains("*("),
      "bpe2's merge chain fell out of whole-stage codegen")
  }
}
