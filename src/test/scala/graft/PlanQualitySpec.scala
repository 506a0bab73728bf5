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
    * construction, so the nested loop is the intended bounded scan:
    *  - t6_tfidf: one-row corpus-size aggregate.
    *  - e2_cosine_topk: brute-force baseline — broadcast query set vs
    *    streamed corpus under a non-equi (a_id =!= b_id) condition.
    *  - e2d_ann_ivf: IVF assignment — every vector scores against the
    *    nCells(=16) broadcast centroids (|corpus| x nCells, linear in corpus).
    *  - e2e_ann_recall: contains e2's brute-force branch as its ground truth.
    *  - e2f_ivf_recall: same brute-force ground-truth branch + the IVF
    *    centroid assignment (16 broadcast centroids).
    *  - t9_bigram_lm: one-row vocabulary-size aggregate (same shape as
    *    t6_tfidf's corpus-size scalar).
    */
  private val boundedBroadcastBnl =
    Set("t6_tfidf", "e2_cosine_topk", "e2d_ann_ivf", "e2e_ann_recall", "e2f_ivf_recall",
      "t9_bigram_lm")

  test("no query plans a cartesian product; BNL only on bounded broadcasts") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct")
      val bnl = plan.contains("BroadcastNestedLoop") && !boundedBroadcastBnl(name)
      if (cartesian || bnl) Some(s"$name: ${if (cartesian) "CartesianProduct" else "BroadcastNestedLoopJoin"}")
      else None
    }
    assert(offenders.isEmpty, s"degenerate join plans:\n${offenders.mkString("\n")}")
  }
}
