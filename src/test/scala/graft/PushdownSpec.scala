package graft

/** Scan-efficiency gate: the selective predicates of the TPC-H-shaped
  * queries must reach the parquet scan as PushedFilters, and projections
  * must prune the read schema — at 100 TB the scan is the dominant cost and
  * a filter evaluated post-scan instead of in the reader is a silent
  * regression no correctness check would catch.
  */
class PushdownSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q1: shipdate range filter is pushed to the lineitem scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q3: all three dimension filters are pushed") {
    val p = plan("q3_topk_revenue")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
    assert(p.contains("LessThan(o_orderdate"), p)
    assert(p.contains("GreaterThan(l_shipdate"), p)
  }

  test("q1: scan output is pruned to the referenced columns") {
    val p = plan("q1_pricing_summary")
    // the lineitem scan must not read the full 11-column schema (the
    // ReadSchema field truncates in toString; the scan's output list does not)
    val read = """FileScan parquet \[([^\]]*)\]""".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    val cols = read.split(",").map(_.takeWhile(_ != '#').trim).filter(_.nonEmpty).toSet
    assert(cols == Set("l_quantity", "l_extendedprice", "l_discount",
      "l_returnflag", "l_linestatus", "l_shipdate"), s"read: $cols")
  }

  test("sj1 star join: fact scan pruned to join key + aggregate inputs") {
    val p = plan("sj1_star_join")
    // first FileScan in the plan is the lineitem fact side
    val read = """FileScan parquet \[([^\]]*)\]""".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    val factCols = read.map(_.split(",").map(_.takeWhile(_ != '#').trim)
      .filter(_.nonEmpty).toSet)
      .find(_.contains("l_orderkey")).getOrElse(Set.empty)
    assert(factCols == Set("l_orderkey", "l_extendedprice", "l_discount",
      "l_returnflag"), s"fact read: $factCols")
  }

  private def scanCols(p: String): Seq[Set[String]] =
    """FileScan parquet \[([^\]]*)\]""".r.findAllMatchIn(p).map(_.group(1)
      .split(",").map(_.takeWhile(_ != '#').trim).filter(_.nonEmpty).toSet).toSeq

  test("sp1/up1: documents scan pruned — md5 split and mixture never read the 5-column row") {
    // sp1 needs only (doc_id, lang); text/source/n_chars must not be read
    assert(scanCols(plan("sp1_hash_split")).forall(c =>
      c.subsetOf(Set("doc_id", "lang"))), scanCols(plan("sp1_hash_split")).toString)
    // up1 tokenizes text per source: (doc_id, source, text), never lang/n_chars
    assert(scanCols(plan("up1_mixture_upsample")).forall(c =>
      c.subsetOf(Set("doc_id", "source", "text"))),
      scanCols(plan("up1_mixture_upsample")).toString)
  }
}
