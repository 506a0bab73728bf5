package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.{ScalableWindow, Temporal}

/** General relational surface over the TPC-H-ish tables: aggregation shapes,
  * join strategies (broadcast for dims, semi/anti/outer), window functions,
  * set ops, top-k (SURVEY.md §2.3, §2.5, §2.6 E5-E6 generalized).
  *
  * Determinism discipline: money math goes through DECIMAL(18,2/4) so sums
  * are order-insensitive and bit-identical to DuckDB; every query has a total
  * ORDER BY; DuckDB integer SUM/COUNT are cast to BIGINT to match Spark longs.
  */
object RelationalQueries {
  import ParityQueries.QFn

  private def dec2(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
  private def dec4(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")

  private val eventTypes = Seq("click", "purchase", "view", "signup", "error")

  /** The v1 pivot's wide frame (shared by the pivot and unpivot queries). */
  private def pivotWide(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("user_bucket", (col("user_id") % 10).cast("int"))
      .groupBy("user_bucket")
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
      .na.fill(0L)
  /** revenue term: extendedprice * (1 - discount), exact decimal. */
  private def revenue = dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec4(col("l_discount")))

  /** q2's shared ANSI text (s1/ex1 discipline): the correlated MIN whose
    * subquery is itself a JOIN CHAIN (supplier→lineitem→nation→region) —
    * the decorrelation pattern cs1's single-table form does not cover.
    * Spark rewrites it to a per-part aggregate over the joined subquery
    * plus an equi-join back on (partkey, min) — no per-row re-execution.
    * s_acctbal equality is an exact double SELECTION (MIN does no
    * arithmetic), so the tie-set is engine-identical.
    */
  private def q2Sql(part: String, supplier: String, lineitem: String,
                    nation: String, region: String): String =
    s"""SELECT DISTINCT s_name, s_acctbal, p_partkey, p_name
       |FROM $part, $supplier, $lineitem, $nation, $region
       |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
       |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |  AND r_name = 'EUROPE' AND p_size = 10
       |  AND s_acctbal = (SELECT MIN(s2.s_acctbal)
       |                   FROM $supplier s2, $lineitem l2, $nation n2, $region r2
       |                   WHERE l2.l_partkey = p_partkey
       |                     AND s2.s_suppkey = l2.l_suppkey
       |                     AND s2.s_nationkey = n2.n_nationkey
       |                     AND n2.n_regionkey = r2.r_regionkey
       |                     AND r2.r_name = 'EUROPE')
       |ORDER BY s_name, p_partkey""".stripMargin

  /** q22's shared ANSI text (s1/ex1 discipline): one statement, two engines —
    * Spark runs it over temp views, DuckDB over the parquet views.
    */
  private def q22Sql(customer: String, orders: String): String =
    s"""WITH pos AS (
       |  SELECT c_mktsegment, c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
       |  FROM $customer WHERE c_acctbal > 0.0)
       |SELECT c_mktsegment,
       |  CAST(COUNT(*) AS BIGINT) AS numcust,
       |  CAST(SUM(bal) AS DOUBLE) AS totacctbal
       |FROM pos
       |WHERE bal > (SELECT CAST(SUM(bal) AS DOUBLE) / COUNT(*) FROM pos)
       |  AND NOT EXISTS (SELECT 1 FROM $orders
       |                  WHERE o_custkey = c_custkey
       |                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q15's shared ANSI text (s1/ex1 discipline). */
  private def q15Sql(lineitem: String, supplier: String): String =
    s"""WITH rev AS (
       |  SELECT l_suppkey AS supplier_no,
       |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
       |      * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS total_revenue
       |  FROM $lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
       |FROM $supplier JOIN rev ON s_suppkey = supplier_no
       |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
       |ORDER BY s_suppkey""".stripMargin

  val queries: Map[String, QFn] = Registry.uniqueMap[QFn]("RelationalQueries.queries")(
    // TPC-H Q1 shape: scan-heavy partial+final hash aggregate.
    "q1_pricing_summary" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(revenue).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // TPC-H Q3 shape: two shuffled joins + broadcast-able filter dim, top-k.
    "q3_topk_revenue" -> ((s, d) => {
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(revenue).cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: star join — all dims broadcast, one shuffle on the fact.
    "q5_region_volume" -> ((s, d) => {
      val r = Tables.region(s, d)
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(revenue).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    }),

    // Window rank: top-3 orders per customer (E5 generalized per-group top-k).
    "w1_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    }),

    // Top-3 per customer via the native one-pass bounded-heap aggregate
    // (functions.TopKStruct): identical result to w1's window form, but the
    // shuffle carries at most k rows per (group, partition) instead of the
    // whole fact table — the 100 TB path for group-wise top-k. Descending
    // price / ascending orderkey encode as (price, -orderkey) largest-first.
    "w1b_topk_agg" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(call_function("topk_struct",
          struct(col("o_totalprice"), (-col("o_orderkey")).as("neg_ok")),
          struct(col("o_orderkey"), col("o_totalprice")),
          lit(3)).as("top"))
        .select(col("o_custkey"), posexplode(col("top")))
        .select(col("o_custkey"), (col("pos") + 1).cast("int").as("rn"),
          col("col.o_orderkey").as("o_orderkey"),
          col("col.o_totalprice").as("o_totalprice"))
        .orderBy("o_custkey", "rn")),

    // Running per-user sum over event time (prefix sums are order-fixed, so
    // double addition sequences match DuckDB bit-for-bit).
    "w2_running_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("running_value", round(sum(col("value")).over(w), 2))
        .select("user_id", "event_id", "running_value")
        .orderBy("user_id", "event_id")
    }),

    // Left-semi: customers having at least one finished order.
    "j2_semi_join" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // Left-anti: customers with no orders at all.
    "j3_anti_join" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // Outer join + conditional count: orders per nation including empty nations.
    "j4_outer_count" -> ((s, d) => {
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      n.join(c, col("n_nationkey") === col("c_nationkey"), "left_outer")
        .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("n_name"))
        .agg(sum(when(col("o_orderkey").isNotNull, 1L).otherwise(0L)).as("n_orders"))
        .orderBy("n_name")
    }),

    // Set op: customer keys that never appear in orders (EXCEPT).
    "set1_except" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_custkey").as("custkey"))
        .except(Tables.orders(s, d).select(col("o_custkey").as("custkey")))
        .orderBy("custkey")),

    // Set op: customers that DO order (INTERSECT — dedups both sides).
    "set2_intersect" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_custkey").as("custkey"))
        .intersect(Tables.orders(s, d).select(col("o_custkey").as("custkey")))
        .orderBy("custkey")),

    // Multi-dimensional aggregate: ROLLUP over (returnflag, linestatus) —
    // subtotal rows come free from one pass (partial aggregation covers all
    // grouping sets; no per-level rescan).
    "r1_rollup_volume" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    // Multi-dimensional aggregate: full CUBE over (lang, source) with an
    // explicit grouping_id so subtotal rows disambiguate from real NULL keys.
    // Like rollup, one pass: partial aggregation expands all grouping sets.
    "r2_cube_docs" -> ((s, d) =>
      Tables.documents(s, d)
        .cube(col("lang"), col("source"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"))
        .select("gid", "lang", "source", "n")
        .orderBy(col("gid"), asc_nulls_first("lang"), asc_nulls_first("source"))),

    // Arbitrary GROUPING SETS (neither rollup nor cube): per-returnflag and
    // per-linestatus marginals plus the grand total, one scan.
    "gs1_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("l_gs1")
      s.sql(
        """SELECT grouping_id() AS gid, l_returnflag, l_linestatus,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          |  COUNT(*) AS n
          |FROM l_gs1
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    }),

    // Offset windows: per-user lag/lead over event time — inter-event gaps
    // in both directions (stream-adjacent sessionization building block).
    "w3_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("epoch", unix_timestamp(col("ts")))
        .withColumn("gap_prev_s", col("epoch") - lag(col("epoch"), 1).over(w))
        .withColumn("gap_next_s", lead(col("epoch"), 1).over(w) - col("epoch"))
        .select("user_id", "event_id", "epoch", "gap_prev_s", "gap_next_s")
        .orderBy("user_id", "event_id")
    }),

    // Distribution window: value quartile within each event type (ntile over
    // a total order, so bucket boundaries are deterministic), then the
    // per-bucket value range as the aggregate readout. event_type has ~5
    // distinct values, so a plain PARTITION BY event_type window would sort
    // N/5 rows on one task at scale — [[ScalableWindow.ntile]] computes the
    // identical SQL-standard buckets with the sort sliced |keys| x 64 ways.
    "w4_ntile" -> ((s, d) =>
      ScalableWindow.ntile(Tables.events(s, d),
          part = "event_type", value = "value", tie = "event_id",
          k = 4, as = "quartile")
        .groupBy(col("event_type"), col("quartile"))
        .agg(count(lit(1)).as("n"),
          round(min(col("value")), 2).as("lo_value"),
          round(max(col("value")), 2).as("hi_value"))
        .orderBy("event_type", "quartile")),

    // Rank-family windows in one pass, partitioned by user_id — a key whose
    // cardinality GROWS with the data, so window parallelism scales (the
    // round-7 verdict flagged the previous event_type keying: 5 partitions =
    // 5 tasks at any scale). Ordering by value alone keeps REAL tie
    // semantics: rank/dense_rank/percent_rank/cume_dist depend only on the
    // multiset of values within a user, so the result is deterministic even
    // with duplicate values; rounding to 4 keeps cross-engine hash parity.
    "w6_rank_family" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("value"))
      Tables.events(s, d)
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .withColumn("pct_rank", round(percent_rank().over(w), 4))
        .withColumn("cume", round(cume_dist().over(w), 4))
        .select("user_id", "event_id", "rnk", "drnk", "pct_rank", "cume")
        .orderBy("user_id", "event_id")
    }),

    // RANGE-frame window: per-user trailing-1-hour event count/value sum —
    // frame membership is value-based (epoch seconds), so tied timestamps
    // are all peers and the result is order-insensitive by construction.
    "w5_rolling_range" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("epoch"))
        .rangeBetween(-3599, Window.currentRow)
      Tables.events(s, d)
        .withColumn("epoch", unix_timestamp(col("ts")))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h", sum(dec2(col("value"))).over(w).cast("double"))
        .select("user_id", "event_id", "epoch", "n_1h", "sum_1h")
        .orderBy("user_id", "event_id")
    }),

    // Set op: UNION ALL (bag semantics — the dedup-free complement of
    // set1/set2) with per-source provenance counts.
    "set3_union_all" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_custkey").as("custkey"), lit("customer").as("src"))
        .unionByName(
          Tables.orders(s, d).select(col("o_custkey").as("custkey"), lit("orders").as("src")))
        .groupBy("custkey")
        .agg(count(lit(1)).as("n_rows"), countDistinct(col("src")).as("n_sources"))
        .orderBy("custkey")),

    // Pivot: event counts per user bucket x event_type as columns — the
    // wide-format reshape; equals conditional aggregation, which is exactly
    // what the oracle spells out.
    "v1_pivot_events" -> ((s, d) => pivotWide(s, d).orderBy("user_bucket")),

    // Unpivot (melt): the wide pivot back to long form — zero-filled combos
    // become explicit n=0 rows, which is exactly what distinguishes the
    // roundtrip from a plain groupBy (the oracle spells out the stack).
    "v2_unpivot_events" -> ((s, d) =>
      pivotWide(s, d)
        .unpivot(Array(col("user_bucket")), eventTypes.map(col).toArray, "event_type", "n")
        .orderBy("user_bucket", "event_type")),

    // Exact distinct per group (expensive two-shuffle shape, kept exact).
    "a4_count_distinct" -> ((s, d) =>
      Tables.events(s, d).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")),

    // Ordered-statistics aggregate: exact interpolated percentiles. Exact
    // (not approx_percentile) so the result is order-independent and both
    // engines share the linear-interpolation definition; quantities are
    // small integers stored as doubles, so interpolation is bit-stable.
    // DOMAIN GUARD: Spark's exact percentile/median buffer a value->count
    // map PER GROUP, so executor memory scales with DISTINCT values per
    // group — fine for l_quantity (a ~50-value domain, asserted in
    // InvariantsSpec), wrong for unbounded-domain columns (prices, floats):
    // point those at a5b's mergeable approx sketch instead.
    "a5_percentiles" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.75)").as("p75"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // HLL++ approximate distinct — the 100 TB path (single shuffle, sketch
    // mergeable). The estimate itself is engine-specific, so the oracle
    // checks a bounded QUALITY GATE instead (the e2e_ann_recall pattern):
    // per group, emit the exact distinct count (oracle-recomputable) plus
    // whether the HLL estimate landed within 3x the configured rsd of it —
    // the oracle pins the gate TRUE, so HLL drift past the bound turns the
    // row red. 3x rsd because rsd is ONE standard error (a ~68% interval
    // per group); 3 sigma holds deterministically for the seeds/cardinali-
    // ties here while still failing on any real estimator regression.
    "e4_approx_distinct" -> ((s, d) => {
      val rsd = 0.02
      Tables.events(s, d).groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), rsd).as("_approx"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("_approx") - col("exact_users")).cast("double")
            <= lit(3 * rsd) * col("exact_users").cast("double")).as("within_bound"))
        .orderBy("event_type")
    }),

    // Correlated scalar subquery (TPC-H Q17 shape) — exercises Catalyst's
    // decorrelation into an aggregate+join plan. Quantities are small
    // integers stored as doubles, so AVG is exact and the comparison is
    // deterministic across engines.
    "s1_scalar_subquery" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("l_s1")
      s.sql(
        """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          |  COUNT(*) AS n
          |FROM l_s1 l1
          |WHERE l_quantity < (SELECT 0.2 * AVG(l_quantity)
          |                    FROM l_s1 l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin)
    }),

    // Sessionization: native session_window (30 min gap) per user. The
    // oracle reproduces session_window's gap semantics — an event exactly
    // 30 minutes after the previous one still MERGES (verified in
    // StreamingPipelineSpec); only a strictly larger gap starts a new
    // session — with gaps-and-islands window functions.
    "e9b_session_windows" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
          unix_timestamp(min(col("ts"))).as("session_start"),
          (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts")))).as("duration_sec"))
        .select("user_id", "session_start", "n_events", "duration_sec")
        .orderBy("user_id", "session_start")),

    // As-of join: attribute each purchase to the user's most recent click
    // at-or-before it (backward inclusive). Right side pre-deduped to one
    // row per (user_id, ts) for determinism. Oracle: DuckDB ASOF LEFT JOIN.
    "aj1_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts").as("click_ts"))
        .agg(max(col("event_id")).as("click_id"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("buy_id"), col("user_id"), col("ts"))
      Temporal.joinAsOf(buys, clicks, Seq("user_id"), "ts", "click_ts",
          payload = Seq("click_id", "click_ts"))
        .select(col("buy_id"), col("user_id"),
          unix_timestamp(col("ts")).as("buy_epoch"),
          col("click_id"),
          unix_timestamp(col("click_ts")).as("click_epoch"))
        .orderBy("buy_id")
    }),

    // Forward as-of join: each purchase attributed to the user's NEXT click
    // at-or-after it — joinAsOf's forward direction (same single-shuffle
    // union+window plan, reversed ordering). Oracle: correlated MIN subquery.
    "aj2_asof_forward" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts").as("click_ts"))
        .agg(max(col("event_id")).as("click_id"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("buy_id"), col("user_id"), col("ts"))
      Temporal.joinAsOf(buys, clicks, Seq("user_id"), "ts", "click_ts",
          payload = Seq("click_id", "click_ts"), direction = "forward")
        .select(col("buy_id"), col("user_id"),
          unix_timestamp(col("ts")).as("buy_epoch"),
          col("click_id"),
          unix_timestamp(col("click_ts")).as("click_epoch"))
        .orderBy("buy_id")
    }),

    // Tolerance-bounded as-of: latest click within the trailing 30 minutes,
    // else null — the attribution-window form (a plain as-of match farther
    // than the window is discarded row-locally; same single shuffle).
    "aj3_asof_tolerance" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts").as("click_ts"))
        .agg(max(col("event_id")).as("click_id"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("buy_id"), col("user_id"), col("ts"))
      Temporal.joinAsOfWithin(buys, clicks, Seq("user_id"), "ts", "click_ts",
          payload = Seq("click_id", "click_ts"), toleranceSec = 1800)
        .select(col("buy_id"), col("user_id"),
          unix_timestamp(col("ts")).as("buy_epoch"),
          col("click_id"),
          unix_timestamp(col("click_ts")).as("click_epoch"))
        .orderBy("buy_id")
    }),

    // Range (interval) join via band bucketing: returned lineitems shipped
    // in the 7 days up to an urgent order's date — an equi-join on 8-day
    // bands + residual filter, never a nested-loop plan. Oracle: the plain
    // theta join BETWEEN, same pairs.
    "rj1_range_join" -> ((s, d) => {
      // order_month is computed on the (small) interval side, not per pair
      val intervals = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT" && year(col("o_orderdate")) === 1995)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM").as("order_month"),
          (unix_date(col("o_orderdate").cast("date")) - 7).cast("long").as("lo_day"),
          unix_date(col("o_orderdate").cast("date")).cast("long").as("hi_day"))
      val points = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          unix_date(col("l_shipdate").cast("date")).cast("long").as("ship_day"))
      // per-order partial first: n_orders without a distinct-aggregate
      // Expand (orders with >=1 pair == rows of the partial), n_pairs by sum
      Temporal.bandRangeJoin(points, "ship_day", intervals, "lo_day", "hi_day", bandWidth = 8L)
        .groupBy(col("o_orderkey"), col("order_month"))
        .agg(count(lit(1)).as("pairs_per_order"))
        .groupBy("order_month")
        .agg(count(lit(1)).as("n_orders"), sum(col("pairs_per_order")).as("n_pairs"))
        .orderBy("order_month")
    }),

    // Null-aware anti join: NOT IN plans a distinct join family from j3's
    // NOT EXISTS (a single null in the subquery empties the result, so the
    // join must track null presence on the build side).
    "j5_null_aware_anti" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("c_j5")
      Tables.orders(s, d).createOrReplaceTempView("o_j5")
      s.sql(
        """SELECT c_custkey, c_name FROM c_j5
          |WHERE c_custkey NOT IN (SELECT o_custkey FROM o_j5 WHERE o_orderstatus = 'P')
          |ORDER BY c_custkey""".stripMargin)
    }),

    // TPC-H Q17 shape (small-quantity-order revenue): the correlated
    // 0.2*AVG threshold decorrelates to a per-part aggregate self-joined
    // back to the fact. Scale discipline: the brand filter is a broadcast
    // semi-join applied BEFORE the per-part average — the aggregate and the
    // self-join only ever see the selected brand's lineitems (~1/25 of the
    // fact), not the whole table; both sides of the threshold join share
    // the l_partkey shuffle key. The threshold is one IEEE multiply of an
    // exact-integer-sum average, bit-identical across engines.
    "q17_small_qty_revenue" -> ((s, d) => {
      val parts = Tables.part(s, d)
        .filter(col("p_brand") === "Brand#23")
        .select(col("p_partkey"))
      val l23 = Tables.lineitem(s, d)
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      val thresh = l23.groupBy(col("l_partkey").as("t_partkey"))
        .agg((lit(0.2) * avg(col("l_quantity"))).as("qty_thresh"))
      l23.join(thresh, col("l_partkey") === col("t_partkey"))
        .filter(col("l_quantity") < col("qty_thresh"))
        .agg((sum(dec2(col("l_extendedprice"))).cast("double") / 7.0).as("avg_yearly"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q18 shape: HAVING on an aggregate, then join the surviving keys
    // back to the fact — the aggregate side is tiny after the filter, so the
    // join back is broadcast-able at any scale.
    "q18_large_orders" -> ((s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(dec2(col("l_quantity"))).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      Tables.orders(s, d)
        .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          dec2(col("o_totalprice")).cast("double").as("o_totalprice"),
          col("sum_qty").cast("double").as("sum_qty"))
        .orderBy("o_orderkey")
    }),

    // Numeric binning histogram: fixed-width buckets over order totals —
    // single-pass groupBy on a computed key, the building block for any
    // distribution readout. Bucket boundaries use one IEEE division + floor,
    // bit-identical across engines.
    "h1_histogram" -> ((s, d) =>
      Tables.orders(s, d)
        .withColumn("bucket", floor(col("o_totalprice") / lit(20000.0)).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy("bucket")),

    // H2 equi-depth (equal-frequency) histogram over a high-cardinality
    // column via [[ScalableWindow.ntile]] on a CONSTANT partition key — the
    // single-group global sort is exactly the one-task shape the sliced
    // rewrite exists to kill (parallelism = slices, never 1), and h1's
    // equal-width twin shows the two binning policies side by side.
    "h2_equidepth_histogram" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"), lit("all").as("g"))
      ScalableWindow.ntile(o, "g", "o_totalprice", "o_orderkey", k = 10, as = "bucket")
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy("bucket")
    }),

    // TPC-H Q4 shape: order-priority check — EXISTS over the fact table
    // plans as ONE semi-join on l_orderkey (no per-row subquery), then a
    // small aggregate.
    "q4_priority_check" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("o_q4")
      Tables.lineitem(s, d).createOrReplaceTempView("l_q4")
      s.sql(
        """SELECT o_orderpriority, COUNT(*) AS order_count
          |FROM o_q4
          |WHERE EXISTS (SELECT 1 FROM l_q4
          |              WHERE l_orderkey = o_orderkey
          |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    }),

    // TPC-H Q6 shape (forecast revenue change): pure scan + one map-side-
    // combined aggregate, every predicate pushed to the parquet reader —
    // the simplest possible 100 TB plan (zero shuffles beyond the final
    // 1-row combine). Discounts are exact hundredths stored as doubles, so
    // the range literals compare bit-identically on both engines.
    "q6_forecast_revenue" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01"
          && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(dec2(col("l_extendedprice")) * dec4(col("l_discount")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))),

    // TPC-H Q14 shape (promotion effect): one broadcast dim join + one
    // conditional aggregate; the promo share is a single IEEE division of
    // two exact decimal sums, deterministic across engines.
    "q14_promo_effect" -> ((s, d) => {
      val rev = revenue
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-07-01")
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast("decimal(18,4)")))
            .as("_promo"),
          sum(rev).as("_all"))
        .select(
          round(lit(100.0) * col("_promo").cast("double") / col("_all").cast("double"), 6)
            .as("promo_pct"),
          col("_all").cast("double").as("total_revenue"))
    }),

    // TPC-H Q7 shape (volume shipping): revenue between two nations by ship
    // year. Scale shape: BOTH dimension chains are pre-filtered to the two
    // nations BEFORE touching the fact table (supplier and the orders side
    // shrink ~12x), every dim join broadcasts, and the only shuffle is the
    // lineitem ⨝ orders equi-join. The pair condition reduces to
    // supp_nation <> cust_nation once both sides are restricted to the pair.
    "q7_volume_shipping" -> ((s, d) => {
      val pair = Seq("NATION_1", "NATION_2")
      val n1 = Tables.nation(s, d).filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d).filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      val sup = Tables.supplier(s, d)
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .select("s_suppkey", "supp_nation")
      val cust = Tables.customer(s, d)
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .select("c_custkey", "cust_nation")
      val ord = Tables.orders(s, d)
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "cust_nation")
      Tables.lineitem(s, d)
        .filter(col("l_shipdate").between("1996-01-01", "1997-12-31"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .withColumn("l_year", year(col("l_shipdate")))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum(revenue).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q10 shape (returned items): top-20 customers by lost revenue in
    // a quarter. Scale shape: both filters (returnflag, date window) push
    // to the scans, dims broadcast, and the final top-k plans as
    // TakeOrderedAndProject (per-partition heap + driver merge of 20-row
    // heads), never a global sort. c_custkey tiebreak makes the cut
    // deterministic across engines.
    "q10_returned_items" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-04-01")
        .select("o_orderkey", "o_custkey")
      Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(revenue).cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q21 shape (waiting suppliers): the classic EXISTS + NOT EXISTS
    // decorrelation where BOTH subqueries are self-joins on the FACT table —
    // "lines of the same order from a DIFFERENT supplier". Adapted predicate:
    // the testdata lacks l_commitdate/l_receiptdate, so the per-line "problem"
    // marker is l_returnflag = 'R' (suppliers solely responsible for a
    // returned line in a multi-supplier finished order). Scale shape: the
    // probe side shrinks FIRST (returnflag filter + broadcast nation-filtered
    // supplier, ~1/|nations| of suppliers), then ALL THREE remaining joins —
    // the 'F'-orders semi, the other-supplier-exists semi, and the
    // other-R-supplier anti — are shuffled equi-joins keyed on l_orderkey
    // with the supplier inequality as a residual, so one exchange partitioning
    // is reused and the fact-sized build sides never broadcast (merge hints
    // pin the 100 TB plan at test scale too; no BNL, no cartesian).
    "q21_waiting_suppliers" -> ((s, d) => {
      val sup = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name")
      val l = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey", "l_returnflag")
      // Probe shrinks FIRST via a broadcast LEFT SEMI (an inner join here
      // gets floated above the merge joins by Catalyst's join reorder, making
      // the shuffled probe |nations| times larger); s_name attaches AFTER the
      // aggregation, when the result is |suppliers-of-one-nation| rows.
      val l1 = l.filter(col("l_returnflag") === "R")
        .join(broadcast(sup.select("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"), "left_semi")
      val others = l.select(col("l_orderkey").as("x_orderkey"), col("l_suppkey").as("x_suppkey"))
      val othersR = l.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("y_orderkey"), col("l_suppkey").as("y_suppkey"))
      val fOrders = Tables.orders(s, d).filter(col("o_orderstatus") === "F").select("o_orderkey")
      l1
        .join(fOrders.hint("merge"), col("l_orderkey") === col("o_orderkey"), "left_semi")
        .join(others.hint("merge"),
          col("l_orderkey") === col("x_orderkey") && col("l_suppkey") =!= col("x_suppkey"),
          "left_semi")
        .join(othersR.hint("merge"),
          col("l_orderkey") === col("y_orderkey") && col("l_suppkey") =!= col("y_suppkey"),
          "left_anti")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("_cnt"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        // second aggregate over |suppliers| rows: the oracle groups by
        // s_name, and supplier NAMES need not be unique (a scaled corpus
        // replicates them) — suppkey-grouped counts roll up per name
        .groupBy(col("s_name"))
        .agg(sum(col("_cnt")).as("numwait"))
        .orderBy(desc("numwait"), col("s_name"))
    }),

    // TPC-H Q20 shape (excess stock): the last classic decorrelation
    // pattern — a nested IN-chain whose inner filter is a CORRELATED
    // aggregate threshold. The testdata has no partsupp table, so the CTE
    // derives one from lineitem (all-time shipped quantity per
    // (part, supplier) stands in for ps_availqty), and a qualifying pair is
    // one whose stock exceeds twice its 1996 shipments — the correlated SUM
    // scoped to the pair, exactly Q20's availqty predicate. Identical SQL
    // runs on DuckDB. Catalyst decorrelates the scalar SUM to a grouped
    // aggregate equi-joined on the pair key and plans the two INs as
    // semi-joins (part side broadcasts after its LIKE filter, and the semi
    // is pushed BELOW both lineitem aggregates, so only 'red'-part rows
    // ever aggregate) — no per-row re-execution, no BNL; at 100 TB the only
    // big shuffles are the two lineitem aggregates on the same
    // (partkey, suppkey) key. Quantity sums
    // run as exact DECIMALs on both engines, so the threshold comparison is
    // ulp-proof (a double SUM could flip a boundary pair per merge order).
    // The correlated-SUM-returns-no-rows case is NULL > NULL = false on
    // both engines: pairs with no 1996 shipments never qualify.
    "q20_excess_stock" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q20")
      Tables.part(s, d).createOrReplaceTempView("part_q20")
      Tables.supplier(s, d).createOrReplaceTempView("supplier_q20")
      Tables.nation(s, d).createOrReplaceTempView("nation_q20")
      s.sql(q20Sql("lineitem_q20", "part_q20", "supplier_q20", "nation_q20"))
    }),

    // TPC-H Q11 shape (important stock): grouped aggregate filtered by a
    // HAVING threshold that is a GLOBAL scalar subquery over the same
    // scoped input — the one decorrelation family q20 doesn't cover (its
    // scalar is per-pair-correlated; this one is corpus-global, evaluated
    // once and broadcast into the filter). partsupp derives from lineitem
    // as in q20 (pair value = all-time extendedprice mass), the scope is
    // one nation's suppliers, and the threshold is 3x the average per-part
    // value rather than Q11's fixed fraction — TPC-H itself scales that
    // fraction by 1/SF because a fixed share dilutes as |parts| grows; an
    // average-multiple is scale-free, so the query returns rows at every
    // SF without text changes. Identical SQL runs on DuckDB; AQE reuses
    // the scoped exchange for the per-part and global aggregates. Both
    // sides of the comparison are exact DECIMAL sums cast to double with
    // identical expression text — one IEEE multiply/divide per engine,
    // bit-identical.
    "q11_important_stock" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q11")
      Tables.supplier(s, d).createOrReplaceTempView("supplier_q11")
      Tables.nation(s, d).createOrReplaceTempView("nation_q11")
      s.sql(q11Sql("lineitem_q11", "supplier_q11", "nation_q11"))
    }),

    // TPC-H Q8 shape (national market share): ratio-of-conditional-aggregate
    // over TWO independent dimension chains meeting at the fact — supplier
    // side tags the volume's nation, customer→nation→region side restricts
    // the market. Scale shape: every dim chain broadcasts (region filter
    // shrinks customers before the orders join), the only shuffle is
    // lineitem ⨝ orders, and the share is one IEEE division of two exact
    // decimal sums (q14 discipline).
    "q8_market_share" -> ((s, d) => {
      val rev = revenue
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val sup = Tables.supplier(s, d)
        .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
        .select("s_suppkey", "supp_nation")
      val n1 = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("c_nk"))
      val cust = Tables.customer(s, d)
        .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
        .select("c_custkey")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate").between("1996-01-01", "1997-12-31"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_type") === "STANDARD")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3", rev)
            .otherwise(lit(0).cast("decimal(18,4)"))).as("_nat"),
          sum(rev).as("_all"))
        .select(col("o_year"),
          round(col("_nat").cast("double") / col("_all").cast("double"), 6).as("mkt_share"),
          col("_all").cast("double").as("total_volume"))
        .orderBy("o_year")
    }),

    // TPC-H Q9 shape (product-type profit): nation × order-year profit over a
    // 5-way join with a part-name filter. Adapted amount: the testdata has no
    // partsupp/ps_supplycost, so cost = p_retailprice × l_quantity (exact
    // decimal product). Cross-engine determinism: revenue and cost are summed
    // as SEPARATE exact decimals and subtracted once as doubles — sidestepping
    // engine-specific decimal-subtraction precision/scale coercion entirely.
    // Scale shape: part filter broadcasts (it prunes the fact ~1/4 before
    // anything shuffles), supplier/nation broadcast, single lineitem ⨝ orders
    // shuffle for the year column.
    "q9_product_profit" -> ((s, d) => {
      val rev = revenue
      val cost = dec2(col("p_retailprice")) * dec2(col("l_quantity"))
      val sup = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_name").contains("red"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("nation"), col("o_year"))
        .agg(sum(rev).as("_rev"), sum(cost).as("_cost"), count(lit(1)).as("n_items"))
        .select(col("nation"), col("o_year"),
          (col("_rev").cast("double") - col("_cost").cast("double")).as("sum_profit"),
          col("n_items"))
        .orderBy("nation", "o_year")
    }),

    // TPC-H Q13 shape (customer order-count distribution): LEFT OUTER join
    // with a condition filter, then a distribution-of-counts re-aggregate.
    // Scale shape: orders aggregates FIRST (map-side-combined, shuffle =
    // |custkeys-with-orders|), then one key join against customer and a tiny
    // second aggregate — the fact table is never shuffled wide. Zero-order
    // customers come from the LEFT join's nulls, coalesced to 0.
    "q13_order_distribution" -> ((s, d) => {
      val ordCnt = Tables.orders(s, d)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cnt"))
      Tables.customer(s, d).select(col("c_custkey"))
        .join(ordCnt, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    }),

    // TPC-H Q19 shape (disjunctive predicate pushdown): OR-of-ANDs mixing
    // part and lineitem attributes. Scale shape: the part-only disjunction
    // (brand, size) filters the dim BEFORE it broadcasts, the quantity
    // UNION BOUND (1..50 here spans all branches; kept explicit as the
    // derivable coarse filter) pushes to the fact scan, and the full mixed
    // disjunction evaluates as a post-join residual — the classic
    // "push what you can, residual the rest" discipline.
    "q19_disjunctive_filter" -> ((s, d) => {
      val p = Tables.part(s, d).filter(
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15)) ||
        (col("p_brand") === "Brand#14" && col("p_size").between(5, 25)) ||
        (col("p_brand") === "Brand#22" && col("p_size").between(20, 40)))
      Tables.lineitem(s, d)
        .filter(col("l_quantity").between(1, 50))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15)
            && col("l_quantity").between(1, 21)) ||
          (col("p_brand") === "Brand#14" && col("p_size").between(5, 25)
            && col("l_quantity").between(15, 35)) ||
          (col("p_brand") === "Brand#22" && col("p_size").between(20, 40)
            && col("l_quantity").between(30, 50)))
        .agg(sum(revenue).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q2 shape (min-cost supplier): correlated MIN whose subquery is
    // a 4-way join chain, shared ANSI text — see [[q2Sql]]. Scale shape
    // after Spark's decorrelation: the region-restricted supplier side
    // builds ONCE (broadcast dims), the per-part MIN is a map-side-combined
    // aggregate over the part-supplier incidence, and the outer join back
    // is an equi-join on (partkey, acctbal) — never a per-part re-scan.
    "q2_min_cost_supplier" -> ((s, d) => {
      Tables.part(s, d).createOrReplaceTempView("p_q2")
      Tables.supplier(s, d).createOrReplaceTempView("s_q2")
      Tables.lineitem(s, d).createOrReplaceTempView("l_q2")
      Tables.nation(s, d).createOrReplaceTempView("n_q2")
      Tables.region(s, d).createOrReplaceTempView("r_q2")
      s.sql(q2Sql("p_q2", "s_q2", "l_q2", "n_q2", "r_q2"))
    }),

    // TPC-H Q22 shape (global-scalar filter + anti-join): positive-balance
    // customers above the GLOBAL average balance with no recent orders.
    // One shared ANSI text (the s1/ex1 discipline — DuckDB runs the same
    // statement): Spark decorrelates the NOT EXISTS to a shuffled LEFT ANTI
    // on o_custkey and evaluates the scalar subquery once (subquery reuse,
    // not a per-row probe). The average is one IEEE division of an exact
    // decimal sum by a count — deterministic on both engines. The date
    // bound pre-filters orders BEFORE the anti join's shuffle.
    "q22_dormant_accounts" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("c_q22")
      Tables.orders(s, d).createOrReplaceTempView("o_q22")
      s.sql(q22Sql("c_q22", "o_q22"))
    }),

    // TPC-H Q15 shape (argmax against a global scalar): per-supplier quarter
    // revenue, keep the supplier(s) hitting the global MAX. Shared ANSI text
    // (s1/ex1 discipline). Scale shape: the `rev` aggregate is date-pruned
    // at the scan and map-side-combined (shuffle = |suppliers| rows); Spark
    // evaluates the CTE twice — once under the scalar MAX subquery, once in
    // the main join — the documented price of the shared-text discipline
    // here (both passes are the same pruned scan+combine; a caller that
    // cares caches `rev`). The equality filter + supplier join touch only
    // |suppliers| rows. Exact decimal revenue makes the MAX tie-set
    // deterministic — no ulp-dependent argmax flapping.
    "q15_top_supplier" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("l_q15")
      Tables.supplier(s, d).createOrReplaceTempView("s_q15")
      s.sql(q15Sql("l_q15", "s_q15"))
    }),

    // TPC-H Q12 shape (priority by line status): one fact ⨝ fact equi-join
    // (date window pushed to the lineitem scan, orders projected to
    // key+priority before its shuffle) feeding two-way conditional counts —
    // the canonical CASE-sum pivot over a join. Adapted: lineitem has no
    // l_shipmode, so l_linestatus is the group.
    "q12_priority_by_status" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
        .select("l_orderkey", "l_linestatus")
      val o = Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy("l_linestatus")
    }),

    // TPC-H Q16 shape (distinct suppliers per part class, with an excluded-
    // supplier anti-join): COUNT DISTINCT after an anti join. Scale shape:
    // the brand filter broadcasts into the fact scan, the exclusion list
    // (negative-balance suppliers — the NOT IN complaints stand-in; key is
    // non-null so plain LEFT ANTI matches NOT IN) is dim-sized and
    // broadcasts, and the distinct-aggregate runs Spark's two-phase expand
    // (partial distinct per partition before the final shuffle).
    "q16_supplier_variety" -> ((s, d) => {
      val p = Tables.part(s, d)
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .select(col("p_partkey"), col("p_brand"),
          (col("p_size") % 5).cast("int").as("size_class"))
      val excluded = Tables.supplier(s, d)
        .filter(col("s_acctbal") < 0).select("s_suppkey")
      Tables.lineitem(s, d).select("l_partkey", "l_suppkey")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("size_class"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), col("p_brand"), col("size_class"))
    }),

    // R3 cohort retention (product analytics): users bucketed by first-seen
    // week, counted in each later active week — two map-side-combined
    // aggregates plus one key join, shuffle = |users| + |user-weeks|. The
    // week arithmetic is exact integer epoch math (both week-truncations
    // are multiples of 604800 s apart, and `div` truncates identically on
    // both engines).
    "r3_cohort_retention" -> ((s, d) => {
      val e = Tables.events(s, d)
      val first = e.groupBy(col("user_id"))
        .agg(unix_timestamp(date_trunc("week", min(col("ts")))).as("cohort_epoch"))
      val active = e
        .select(col("user_id"), unix_timestamp(date_trunc("week", col("ts"))).as("wk_epoch"))
        .distinct()
      active.join(first, "user_id")
        .withColumn("week_no", expr("(wk_epoch - cohort_epoch) div 604800"))
        .groupBy("cohort_epoch", "week_no")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_epoch", "week_no")
    }),

    // O1 3-sigma outlier screen (data-quality gate): per-group mean/stddev
    // from EXACT decimal power sums (a6 discipline — order-insensitive,
    // engine-identical), broadcast back over the fact scan to count rows
    // outside mean ± 3σ. Two passes, both map-side-combined; the stats side
    // is |groups| rows.
    "o1_outliers" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val stats = l.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("l_extendedprice"))).cast("double").as("sx"),
          sum(dec2(col("l_extendedprice")) * dec2(col("l_extendedprice")))
            .cast("double").as("sxx"))
        .withColumn("mean", col("sx") / col("n"))
        .withColumn("sd", sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - lit(1))))
      l.join(broadcast(stats), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("l_extendedprice") > col("mean") + lit(3.0) * col("sd"), 1L)
            .when(col("l_extendedprice") < col("mean") - lit(3.0) * col("sd"), 1L)
            .otherwise(0L)).as("n_outliers"))
        .orderBy("l_returnflag")
    }),

    // F1 funnel analysis: users progressing view -> click -> purchase in
    // timestamp order (first-touch mins per stage, strict ordering) — ONE
    // conditional aggregate over the events scan, one tiny rollup. The
    // standard product-analytics shape, shuffle = |users| rows.
    "f1_funnel" -> ((s, d) => {
      val e = Tables.events(s, d)
      val perUser = e.groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("t_view"),
          min(when(col("event_type") === "click", col("ts"))).as("t_click"),
          min(when(col("event_type") === "purchase", col("ts"))).as("t_buy"))
      perUser.agg(
        sum(when(col("t_view").isNotNull, 1L).otherwise(0L)).as("n_view"),
        sum(when(col("t_view") < col("t_click"), 1L).otherwise(0L)).as("n_view_click"),
        sum(when(col("t_view") < col("t_click") && col("t_click") < col("t_buy"), 1L)
          .otherwise(0L)).as("n_full_funnel"))
    }),

    // PR1 top-half-percent screen via the scalable PERCENT_RANK (same
    // constant-key regime as h2 — global order statistics at parallelism =
    // slices). Filter on the unrounded rank: (pos-1)/(n-1) is the identical
    // integer-derived double on both engines.
    "pr1_percent_rank" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"), lit("all").as("g"))
      ScalableWindow.percentRank(o, "g", "o_totalprice", "o_orderkey", as = "pr")
        .filter(col("pr") >= 0.995)
        .select(col("o_orderkey"), col("o_totalprice"), round(col("pr"), 6).as("pr"))
        .orderBy("o_orderkey")
    }),

    // Moment-based statistics (stddev, correlation) from EXACT decimal
    // power sums — the mergeable formulation: partial aggregation combines
    // by addition, so the result is order-insensitive under any partitioning
    // (Welford-style stddev_samp/corr builtins are not reproducible across
    // engines/partitionings). The final algebra runs in double with an
    // identical expression tree on both sides, so every IEEE op rounds
    // identically.
    "a6_moment_stats" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("l_a6")
      s.sql(
        """WITH m AS (
          |  SELECT l_returnflag,
          |    COUNT(*) AS n,
          |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
          |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
          |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
          |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
          |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
          |  FROM l_a6 GROUP BY l_returnflag)
          |SELECT l_returnflag, n,
          |  sx / n AS mean_qty,
          |  SQRT((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
          |  (sxy - sx * sy / n)
          |    / (SQRT(sxx - sx * sx / n) * SQRT(syy - sy * sy / n)) AS corr_qty_price
          |FROM m ORDER BY l_returnflag""".stripMargin)
    }),

    // Skew-safe salted equi-join (Skew.saltedJoin): probe rows salt on a
    // deterministic hash, the build side replicates across salts, and the
    // result is exactly the plain inner join — which is what the oracle
    // checks. The shape AQE skew-split can't cover (streaming / replicated
    // build cheaper than a straggler).
    "x2_salted_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val cust = Tables.customer(s, d)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      graft.operators.Skew.saltedJoin(ev, cust, Seq("user_id"),
          saltFrom = col("event_id"), buckets = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("value"))).cast("double").as("sum_value"))
        .orderBy("c_mktsegment")
    }),

    // Skew-safe two-stage (salted) aggregation; result identical to the plain
    // groupBy, which is exactly what the oracle checks. Salt is deterministic.
    "x1_salted_agg" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("salt", col("event_id") % 8)
        .groupBy(col("event_type"), col("salt"))
        .agg(sum(dec2(col("value"))).as("part_sum"), count(lit(1)).as("part_n"))
        .groupBy(col("event_type"))
        .agg(sum(col("part_sum")).cast("double").as("sum_value"),
          sum(col("part_n")).as("n"))
        .orderBy("event_type")),

    // LISTAGG (SQL:2016 string aggregation, Spark 4.0+): distinct market
    // segments per nation, order fixed WITHIN GROUP so the concatenation is
    // deterministic. Scale shape: one hash aggregate; the aggregated string
    // is bounded by the segment domain (5 values), never by row count.
    "sa1_string_agg" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("c_sa1")
      Tables.nation(s, d).createOrReplaceTempView("n_sa1")
      s.sql(
        """SELECT n_name,
          |  listagg(DISTINCT c_mktsegment, ',') WITHIN GROUP (ORDER BY c_mktsegment) AS segments,
          |  COUNT(*) AS n_customers
          |FROM c_sa1 JOIN n_sa1 ON c_nationkey = n_nationkey
          |GROUP BY n_name ORDER BY n_name""".stripMargin)
    }),

    // Inverse-distribution aggregates: exact median plus deterministic mode
    // (Spark's mode(expr, true) returns the LOWEST value among tied
    // frequencies — the oracle reproduces exactly that with min-of-argmax,
    // since DuckDB's native mode() breaks ties arbitrarily). Quantities are
    // small integers stored as doubles, so the even-count median midpoint is
    // exact in binary. Same DOMAIN GUARD as a5: exact median/mode buffer
    // per-group value maps — bounded here by l_quantity's ~50-value domain
    // (InvariantsSpec), use a5b's sketch for unbounded domains.
    "md1_mode_median" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("l_md1")
      s.sql(
        """SELECT l_returnflag,
          |  median(l_quantity) AS med_qty,
          |  mode(l_quantity, true) AS mode_qty,
          |  COUNT(*) AS n
          |FROM l_md1 GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }),

    // Correlated LATERAL subquery with per-row ORDER BY + LIMIT (top-2
    // customer names per nation). Catalyst decorrelates this into a
    // window-rank-filter over one shuffled join — no per-row re-execution —
    // which is also why it holds at scale. Identical SQL runs on DuckDB.
    // c_custkey tiebreaks the LIMIT cutoff so determinism is by construction,
    // not a data property of c_name uniqueness (round-7 advice).
    "lat1_lateral_topk" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("c_lat1")
      Tables.nation(s, d).createOrReplaceTempView("n_lat1")
      s.sql(
        """SELECT n_nationkey, t.c_name
          |FROM n_lat1, LATERAL (SELECT c_name FROM c_lat1
          |                      WHERE c_nationkey = n_nationkey
          |                      ORDER BY c_name, c_custkey LIMIT 2) t
          |ORDER BY n_nationkey, c_name""".stripMargin)
    }),

    // TPC-H Q2 shape: correlated scalar-aggregate subquery (each customer's
    // cheapest order). Catalyst decorrelates to ONE aggregate on o_custkey
    // joined back as an equi-join — no per-row re-execution; the o_orderkey
    // tiebreak makes a customer with two min-price orders deterministic.
    "cs1_correlated_min" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("o_cs1")
      Tables.customer(s, d).createOrReplaceTempView("c_cs1")
      s.sql(
        """SELECT c_custkey, c_mktsegment,
          |  MIN(o_orderkey) AS cheapest_order,
          |  CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS cheapest_price
          |FROM c_cs1 JOIN o_cs1 ON o_custkey = c_custkey
          |WHERE o_totalprice = (SELECT MIN(o2.o_totalprice) FROM o_cs1 o2
          |                      WHERE o2.o_custkey = c_custkey)
          |GROUP BY c_custkey, c_mktsegment
          |ORDER BY c_custkey""".stripMargin)
    }),

    // Multi-way star join: fact lineitem against four dims in one DAG —
    // orders (shuffled: fact-sized), customer (shuffled), nation + region
    // (broadcast: bounded) — revenue per region x returnflag. The canonical
    // warehouse shape: dims prune BEFORE the fact aggregate, and only the
    // two fact-sized joins shuffle.
    "sj1_star_join" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("l_returnflag"))
        .agg(sum(revenue).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "l_returnflag")),

    // Correlated EXISTS + NOT EXISTS (customers with at least one order and
    // no order above the threshold): Catalyst plans the pair as one semi-
    // join plus one anti-join on o_custkey — both plain shuffled equi-joins,
    // no per-row subquery execution.
    "ex1_exists" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("c_ex1")
      Tables.orders(s, d).createOrReplaceTempView("o_ex1")
      s.sql(
        """SELECT c_mktsegment, COUNT(*) AS n_customers
          |FROM c_ex1 c
          |WHERE EXISTS (SELECT 1 FROM o_ex1 o WHERE o.o_custkey = c.c_custkey)
          |  AND NOT EXISTS (SELECT 1 FROM o_ex1 o WHERE o.o_custkey = c.c_custkey
          |                  AND o.o_totalprice > 300000)
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    }),

    // Linear-regression aggregates (slope/intercept/R²) from exact DECIMAL
    // sums, final arithmetic in DOUBLE with the IDENTICAL expression text on
    // both engines — the same order-insensitivity discipline as a6 (native
    // regr_slope/regr_r2 accumulate in floating point, so their last ulps
    // are merge-order-dependent and unhashable). One map-side-combined
    // aggregate over the fact table.
    "ra1_regression_stats" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("l_ra1")
      s.sql(regressionSql("l_ra1"))
    }),

    // SCD Type-2 dimension versioning ([[graft.operators.Scd]]): customers
    // crossing an order-volume threshold re-segment to 'VIP' effective at
    // their latest order date — the operator closes the old segment row and
    // opens the new one, leaving history queryable by time. One open-slice
    // equi-join + union; the update side is aggregate-sized, so AQE
    // broadcasts it.
    "scd1_dim_versioning" -> ((s, d) =>
      versionedSegments(s, d).orderBy(col("c_custkey"), col("valid_from"))),

    // CDC apply ([[graft.operators.Cdc.applyLog]]): the events stream read
    // as a change log over the customer snapshot — 'error' events tombstone
    // the key, anything else upserts the segment; last writer (ts, then
    // event_id) wins. The log collapses through the k=1 bounded-heap
    // aggregate (shuffle ≤ 1 row per key, never a full-log sort).
    "cdc1_apply_log" -> ((s, d) => {
      val base = Tables.customer(s, d)
        .select(col("c_custkey").as("k"), col("c_mktsegment").as("segment"))
      val log = Tables.events(s, d).select(
        col("user_id").as("k"),
        when(col("event_type") === "error", "delete").otherwise("upsert").as("op"),
        col("event_type").as("segment"),
        col("ts"), col("event_id"))
      graft.operators.Cdc.applyLog(base, log, "k", Seq("segment"),
          "op", "ts", "event_id")
        .orderBy("k")
    }),

    // Snapshot diff ([[graft.operators.Integrity.snapshotDiff]]): WHERE two
    // table versions diverge — one full-outer key join, output proportional
    // to the delta. Versions here: per-customer order rollups before vs
    // including 1997 (so the diff mixes 'added' and 'changed' keys).
    "diff1_snapshot_diff" -> ((s, d) => {
      val o = Tables.orders(s, d)
      def snap(df: DataFrame) = df.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(dec2(col("o_totalprice"))).cast("double").as("total_price"))
      val oldV = snap(o.filter(col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp")))
      graft.operators.Integrity.snapshotDiff(oldV, snap(o), "o_custkey",
          Seq("n_orders", "total_price"))
        .orderBy("o_custkey")
    }),

    // Point-in-time (as-of) lookup against the Type-2 dimension: each order
    // resolves the segment version VALID AT its order date — key equi-join
    // plus interval predicates, so the plan is a plain hash join (the range
    // test is a post-join filter, never a cross product). The companion to
    // scd1: versioning is only useful if facts can time-travel against it.
    "scd2_pointintime" -> ((s, d) => {
      val ver = versionedSegments(s, d)
      val o = Tables.orders(s, d)
      o.join(ver, o("o_custkey") === ver("c_custkey") &&
          o("o_orderdate") >= ver("valid_from") &&
          (ver("valid_to").isNull || o("o_orderdate") < ver("valid_to")))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(dec2(col("o_totalprice"))).cast("double").as("total_price"))
        .orderBy("segment")
    }))

  /** scd1/scd2's shared fixture: the customer segment dimension versioned by
    * an order-volume promotion batch ([[graft.operators.Scd.applyBatch]]).
    */
  private def versionedSegments(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment").as("segment"),
        lit("1995-01-01 00:00:00").cast("timestamp").as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"))
    val updates = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(count(lit(1)).as("n_orders"), max(col("o_orderdate")).as("eff"))
      .filter(col("n_orders") >= 14)
      .select(col("c_custkey"), lit("VIP").as("segment"), col("eff"))
    graft.operators.Scd.applyBatch(dim, updates, "c_custkey", Seq("segment"), "eff")
  }

  /** ra1's exact-sums regression SQL — shared verbatim with the oracle so
    * the double arithmetic is bit-identical on both engines. Zero-variance
    * groups (all-equal x, or all-equal y for r2) get NULL through explicit
    * CASE guards: Spark's non-ANSI x/0 is NULL while DuckDB's IEEE default
    * is inf/nan, so an unguarded denominator would hash-diverge the moment
    * this SQL is reused on a degenerate column (round-7 advice).
    */
  private def regressionSql(table: String): String =
    s"""WITH m AS (
       |  SELECT l_returnflag,
       |    COUNT(*) AS n,
       |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
       |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
       |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
       |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
       |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
       |  FROM $table GROUP BY l_returnflag)
       |SELECT l_returnflag, n,
       |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
       |       ELSE (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS slope,
       |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
       |       ELSE (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n END AS intercept,
       |  CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0 THEN NULL
       |       ELSE ((n * sxy - sx * sy) * (n * sxy - sx * sy))
       |              / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END AS r2
       |FROM m ORDER BY l_returnflag""".stripMargin

  /** Shared ANSI text for the Q20 shape — the SAME string runs on Spark
    * (over per-query temp views) and on DuckDB (over the raw tables), so
    * the decorrelation exercise and the oracle compare share one source of
    * truth. Exact-DECIMAL quantity sums on both sides keep the correlated
    * threshold comparison ulp-proof; the s_suppkey output column keeps rows
    * identity-stable even where supplier NAMES repeat at scale.
    */
  private def q20Sql(lineitem: String, part: String,
                     supplier: String, nation: String): String =
    s"""WITH partsupp AS (
       |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
       |         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS ps_availqty
       |  FROM $lineitem GROUP BY 1, 2)
       |SELECT s_suppkey, s_name
       |FROM $supplier JOIN $nation ON s_nationkey = n_nationkey
       |WHERE n_name = 'NATION_3'
       |  AND s_suppkey IN (
       |    SELECT ps_suppkey FROM partsupp
       |    WHERE ps_partkey IN (SELECT p_partkey FROM $part WHERE p_name LIKE 'red%')
       |      AND ps_availqty > (
       |        SELECT 2 * SUM(CAST(l_quantity AS DECIMAL(18,2))) FROM $lineitem
       |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
       |          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'))
       |ORDER BY s_name, s_suppkey""".stripMargin

  /** Shared ANSI text for the Q11 shape (same one-source-of-truth contract
    * as [[q20Sql]]).
    */
  private def q11Sql(lineitem: String, supplier: String, nation: String): String =
    s"""WITH ps AS (
       |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
       |         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_value
       |  FROM $lineitem GROUP BY 1, 2),
       |scoped AS (
       |  SELECT ps_partkey, ps_value
       |  FROM ps JOIN $supplier ON s_suppkey = ps_suppkey
       |          JOIN $nation ON n_nationkey = s_nationkey
       |  WHERE n_name = 'NATION_3')
       |SELECT ps_partkey, CAST(SUM(ps_value) AS DOUBLE) AS part_value
       |FROM scoped
       |GROUP BY ps_partkey
       |HAVING CAST(SUM(ps_value) AS DOUBLE) >
       |  (SELECT 3 * CAST(SUM(ps_value) AS DOUBLE) / COUNT(DISTINCT ps_partkey)
       |   FROM scoped)
       |ORDER BY part_value DESC, ps_partkey""".stripMargin

  val oracleSql: Map[String, String] = Registry.uniqueMap[String]("RelationalQueries.oracleSql")(
    "q20_excess_stock" -> q20Sql("lineitem", "part", "supplier", "nation"),
    "q11_important_stock" -> q11Sql("lineitem", "supplier", "nation"),

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_topk_revenue" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q5_region_volume" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "w1_topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    // same relation as w1 — the aggregate form must reproduce the window form
    "w1b_topk_agg" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "w2_running_sum" ->
      """SELECT user_id, event_id,
        |  ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin,

    "j2_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "j3_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "j4_outer_count" ->
      """SELECT n_name,
        |  CAST(SUM(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orders
        |FROM nation
        |LEFT JOIN customer ON n_nationkey = c_nationkey
        |LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "set1_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders
        |ORDER BY custkey""".stripMargin,

    "set2_intersect" ->
      """SELECT c_custkey AS custkey FROM customer
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders
        |ORDER BY custkey""".stripMargin,

    "r1_rollup_volume" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "v1_pivot_events" ->
      """SELECT CAST(user_id % 10 AS INTEGER) AS user_bucket,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
        |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
        |FROM events GROUP BY 1 ORDER BY user_bucket""".stripMargin,

    "v2_unpivot_events" ->
      """WITH wide AS (
        |  SELECT CAST(user_id % 10 AS INTEGER) AS user_bucket,
        |    COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |    COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |    COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
        |    COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |    COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
        |  FROM events GROUP BY 1)
        |SELECT user_bucket, event_type, n FROM (
        |  SELECT user_bucket, 'click' AS event_type, click AS n FROM wide
        |  UNION ALL SELECT user_bucket, 'purchase', purchase FROM wide
        |  UNION ALL SELECT user_bucket, 'view', view FROM wide
        |  UNION ALL SELECT user_bucket, 'signup', signup FROM wide
        |  UNION ALL SELECT user_bucket, 'error', error FROM wide) t
        |ORDER BY user_bucket, event_type""".stripMargin,

    "a5_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "a4_count_distinct" ->
      """SELECT event_type,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // e4: the oracle recomputes the exact side and pins the HLL quality
    // gate TRUE — the estimate itself is engine-specific, but its bounded
    // accuracy against the exact count is not.
    "e4_approx_distinct" ->
      """SELECT event_type,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS within_bound
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "s1_scalar_subquery" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  COUNT(*) AS n
        |FROM lineitem l1
        |WHERE l_quantity < (SELECT 0.2 * AVG(l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin,

    "e9b_session_windows" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (
        |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM e)
        |SELECT user_id,
        |  -- FLOOR: Spark's unix_timestamp truncates sub-second timestamps,
        |  -- DuckDB's CAST(double AS BIGINT) rounds
        |  CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS session_start,
        |  COUNT(*) AS n_events,
        |  CAST(FLOOR(epoch(MAX(ts))) AS BIGINT)
        |    - CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS duration_sec
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "r2_cube_docs" ->
      """SELECT CAST(GROUPING(lang, source) AS BIGINT) AS gid, lang, source, COUNT(*) AS n
        |FROM documents
        |GROUP BY CUBE (lang, source)
        |ORDER BY gid, lang ASC NULLS FIRST, source ASC NULLS FIRST""".stripMargin,

    "gs1_grouping_sets" ->
      """SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "w3_lag_lead" ->
      """SELECT user_id, event_id,
        |  CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch,
        |  CAST(FLOOR(epoch(ts)) AS BIGINT)
        |    - LAG(CAST(FLOOR(epoch(ts)) AS BIGINT), 1) OVER w AS gap_prev_s,
        |  LEAD(CAST(FLOOR(epoch(ts)) AS BIGINT), 1) OVER w
        |    - CAST(FLOOR(epoch(ts)) AS BIGINT) AS gap_next_s
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "w4_ntile" ->
      """SELECT event_type, quartile, COUNT(*) AS n,
        |  ROUND(MIN(value), 2) AS lo_value,
        |  ROUND(MAX(value), 2) AS hi_value
        |FROM (
        |  SELECT event_type, value,
        |    NTILE(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS quartile
        |  FROM events) t
        |GROUP BY event_type, quartile
        |ORDER BY event_type, quartile""".stripMargin,

    "w6_rank_family" ->
      """SELECT user_id, event_id,
        |  RANK() OVER w AS rnk,
        |  DENSE_RANK() OVER w AS drnk,
        |  ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
        |  ROUND(CUME_DIST() OVER w, 4) AS cume
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY value)
        |ORDER BY user_id, event_id""".stripMargin,

    "w5_rolling_range" ->
      """SELECT user_id, event_id,
        |  CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch,
        |  COUNT(*) OVER w AS n_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
        |  RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "set3_union_all" ->
      """SELECT custkey, COUNT(*) AS n_rows,
        |  CAST(COUNT(DISTINCT src) AS BIGINT) AS n_sources
        |FROM (
        |  SELECT c_custkey AS custkey, 'customer' AS src FROM customer
        |  UNION ALL
        |  SELECT o_custkey AS custkey, 'orders' AS src FROM orders) u
        |GROUP BY custkey ORDER BY custkey""".stripMargin,

    "aj1_asof_join" ->
      """WITH clicks AS (
        |  SELECT user_id, ts AS click_ts, MAX(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
        |buys AS (
        |  SELECT event_id AS buy_id, user_id, ts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT b.buy_id, b.user_id,
        |  CAST(FLOOR(epoch(b.ts)) AS BIGINT) AS buy_epoch,
        |  c.click_id,
        |  CAST(FLOOR(epoch(c.click_ts)) AS BIGINT) AS click_epoch
        |FROM buys b ASOF LEFT JOIN clicks c
        |  ON b.user_id = c.user_id AND c.click_ts <= b.ts
        |ORDER BY buy_id""".stripMargin,

    "aj2_asof_forward" ->
      """WITH clicks AS (
        |  SELECT user_id, ts AS click_ts, MAX(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
        |buys AS (
        |  SELECT event_id AS buy_id, user_id, ts
        |  FROM events WHERE event_type = 'purchase'),
        |nxt AS (
        |  SELECT b.buy_id, b.user_id,
        |    CAST(FLOOR(epoch(b.ts)) AS BIGINT) AS buy_epoch,
        |    (SELECT MIN(c.click_ts) FROM clicks c
        |     WHERE c.user_id = b.user_id AND c.click_ts >= b.ts) AS click_ts
        |  FROM buys b)
        |SELECT n.buy_id, n.user_id, n.buy_epoch, c.click_id,
        |  CAST(FLOOR(epoch(n.click_ts)) AS BIGINT) AS click_epoch
        |FROM nxt n LEFT JOIN clicks c
        |  ON c.user_id = n.user_id AND c.click_ts = n.click_ts
        |ORDER BY buy_id""".stripMargin,

    // aj3: MAX over the window-constrained subquery == the as-of match when
    // it falls inside the window, and NULL when it does not — the exact
    // argument joinAsOfWithin's post-filter relies on.
    "aj3_asof_tolerance" ->
      """WITH clicks AS (
        |  SELECT user_id, ts AS click_ts, MAX(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
        |buys AS (
        |  SELECT event_id AS buy_id, user_id, ts
        |  FROM events WHERE event_type = 'purchase'),
        |lastw AS (
        |  SELECT b.buy_id, b.user_id, b.ts,
        |    (SELECT MAX(c.click_ts) FROM clicks c
        |     WHERE c.user_id = b.user_id AND c.click_ts <= b.ts
        |       AND c.click_ts >= b.ts - INTERVAL 30 MINUTE) AS click_ts
        |  FROM buys b)
        |SELECT l.buy_id, l.user_id,
        |  CAST(FLOOR(epoch(l.ts)) AS BIGINT) AS buy_epoch,
        |  c.click_id,
        |  CAST(FLOOR(epoch(l.click_ts)) AS BIGINT) AS click_epoch
        |FROM lastw l LEFT JOIN clicks c
        |  ON c.user_id = l.user_id AND c.click_ts = l.click_ts
        |ORDER BY buy_id""".stripMargin,

    "rj1_range_join" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
        |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
        |  COUNT(*) AS n_pairs
        |FROM orders JOIN lineitem
        |  ON l_shipdate >= o_orderdate - INTERVAL 7 DAY
        | AND l_shipdate <= o_orderdate
        |WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1995
        |  AND l_returnflag = 'R'
        |GROUP BY 1 ORDER BY order_month""".stripMargin,

    "j5_null_aware_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "q17_small_qty_revenue" ->
      """WITH l23 AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_brand = 'Brand#23'),
        |thresh AS (
        |  SELECT l_partkey AS t_partkey, 0.2 * AVG(l_quantity) AS qty_thresh
        |  FROM l23 GROUP BY l_partkey)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
        |         AS avg_yearly,
        |       COUNT(*) AS n_items
        |FROM l23 JOIN thresh ON l_partkey = t_partkey
        |WHERE l_quantity < qty_thresh""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
        |SELECT o_orderkey, o_custkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
        |  CAST(sum_qty AS DOUBLE) AS sum_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |ORDER BY o_orderkey""".stripMargin,

    "h1_histogram" ->
      """SELECT CAST(FLOOR(o_totalprice / 20000.0) AS BIGINT) AS bucket,
        |  COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,

    "h2_equidepth_histogram" ->
      """SELECT CAST(bucket AS INTEGER) AS bucket, COUNT(*) AS n,
        |  MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM (SELECT o_totalprice,
        |        NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
        |      FROM orders) t
        |GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q4_priority_check" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q14_promo_effect" ->
      """SELECT
        |  ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev
        |                               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |    / CAST(SUM(rev) AS DOUBLE), 6) AS promo_pct,
        |  CAST(SUM(rev) AS DOUBLE) AS total_revenue
        |FROM (
        |  SELECT p_type, CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS rev
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00') t""".stripMargin,

    "q7_volume_shipping" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(SUM(vol) AS DOUBLE) AS revenue, COUNT(*) AS n_items
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
        |    CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS vol
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON n1.n_nationkey = s_nationkey
        |  JOIN nation n2 ON n2.n_nationkey = c_nationkey
        |  WHERE n1.n_name IN ('NATION_1', 'NATION_2')
        |    AND n2.n_name IN ('NATION_1', 'NATION_2')
        |    AND n1.n_name <> n2.n_name
        |    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                       AND TIMESTAMP '1997-12-31 00:00:00') t
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation ON n_nationkey = c_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q21_waiting_suppliers" ->
      """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM lineitem l1
        |JOIN orders   ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |JOIN nation   ON n_nationkey = s_nationkey AND n_name = 'NATION_3'
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin,

    "q8_market_share" ->
      """SELECT o_year,
        |  ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol
        |                      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |    / CAST(SUM(vol) AS DOUBLE), 6) AS mkt_share,
        |  CAST(SUM(vol) AS DOUBLE) AS total_volume
        |FROM (
        |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS vol,
        |    n2.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part     ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders   ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n1 ON n1.n_nationkey = c_nationkey
        |  JOIN region   ON r_regionkey = n1.n_regionkey
        |  JOIN nation n2 ON n2.n_nationkey = s_nationkey
        |  WHERE r_name = 'EUROPE'
        |    AND p_type = 'STANDARD'
        |    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                        AND TIMESTAMP '1997-12-31 00:00:00') t
        |GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q9_product_profit" ->
      """SELECT n_name AS nation,
        |  CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
        |  - CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))
        |    * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN part     ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN orders   ON o_orderkey = l_orderkey
        |JOIN nation   ON n_nationkey = s_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q13_order_distribution" ->
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
        |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q19_disjunctive_filter" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
        |   OR (p_brand = 'Brand#14' AND p_size BETWEEN 5 AND 25 AND l_quantity BETWEEN 15 AND 35)
        |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 20 AND 40 AND l_quantity BETWEEN 30 AND 50)""".stripMargin,

    "q2_min_cost_supplier" ->
      q2Sql("part", "supplier", "lineitem", "nation", "region"),

    "q22_dormant_accounts" -> q22Sql("customer", "orders"),

    "q15_top_supplier" -> q15Sql("lineitem", "supplier"),

    "q12_priority_by_status" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q16_supplier_variety" ->
      """SELECT p_brand, CAST(p_size % 5 AS INTEGER) AS size_class,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2 ORDER BY supplier_cnt DESC, p_brand, size_class""".stripMargin,

    "r3_cohort_retention" ->
      """WITH first AS (
        |  SELECT user_id,
        |    CAST(epoch(date_trunc('week', MIN(ts))) AS BIGINT) AS cohort_epoch
        |  FROM events GROUP BY user_id),
        |act AS (
        |  SELECT DISTINCT user_id,
        |    CAST(epoch(date_trunc('week', ts)) AS BIGINT) AS wk_epoch
        |  FROM events)
        |SELECT cohort_epoch, (wk_epoch - cohort_epoch) // 604800 AS week_no,
        |  COUNT(*) AS n_users
        |FROM act JOIN first USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "pr1_percent_rank" ->
      """SELECT o_orderkey, o_totalprice, ROUND(pr, 6) AS pr FROM (
        |  SELECT o_orderkey, o_totalprice,
        |    PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey) AS pr
        |  FROM orders) t
        |WHERE pr >= 0.995
        |ORDER BY o_orderkey""".stripMargin,

    "o1_outliers" ->
      """WITH stats AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxx
        |  FROM lineitem GROUP BY l_returnflag),
        |s2 AS (
        |  SELECT l_returnflag, sx / n AS mean,
        |    sqrt((sxx - sx * sx / n) / (n - 1)) AS sd
        |  FROM stats)
        |SELECT l.l_returnflag, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN l.l_extendedprice > s2.mean + 3.0 * s2.sd THEN 1
        |                WHEN l.l_extendedprice < s2.mean - 3.0 * s2.sd THEN 1
        |                ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM lineitem l JOIN s2 USING (l_returnflag)
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin,

    "f1_funnel" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |    MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        |    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
        |  FROM events GROUP BY user_id)
        |SELECT
        |  CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(SUM(CASE WHEN t_view < t_click THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
        |  CAST(SUM(CASE WHEN t_view < t_click AND t_click < t_buy THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
        |FROM pu""".stripMargin,

    "a6_moment_stats" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  sx / n AS mean_qty,
        |  SQRT((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
        |  (sxy - sx * sy / n)
        |    / (SQRT(sxx - sx * sx / n) * SQRT(syy - sy * sy / n)) AS corr_qty_price
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "x2_salted_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "x1_salted_agg" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "sa1_string_agg" ->
      """SELECT n_name,
        |  string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
        |  COUNT(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    // min-of-argmax reproduces Spark's deterministic mode (lowest tied value)
    "md1_mode_median" ->
      """WITH c AS (SELECT l_returnflag, l_quantity AS q, COUNT(*) AS cnt
        |           FROM lineitem GROUP BY 1, 2),
        |w AS (SELECT l_returnflag, q, cnt,
        |        MAX(cnt) OVER (PARTITION BY l_returnflag) AS mx FROM c),
        |md AS (SELECT l_returnflag, MIN(q) AS mode_qty FROM w
        |       WHERE cnt = mx GROUP BY 1),
        |me AS (SELECT l_returnflag, median(l_quantity) AS med_qty, COUNT(*) AS n
        |       FROM lineitem GROUP BY 1)
        |SELECT me.l_returnflag, med_qty, mode_qty, n
        |FROM me JOIN md USING (l_returnflag) ORDER BY l_returnflag""".stripMargin,

    "lat1_lateral_topk" ->
      """SELECT n_nationkey, t.c_name
        |FROM nation, LATERAL (SELECT c_name FROM customer
        |                      WHERE c_nationkey = n_nationkey
        |                      ORDER BY c_name, c_custkey LIMIT 2) t
        |ORDER BY n_nationkey, c_name""".stripMargin,

    "ex1_exists" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |                  AND o.o_totalprice > 300000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "cs1_correlated_min" ->
      """SELECT c_custkey, c_mktsegment,
        |  MIN(o_orderkey) AS cheapest_order,
        |  CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS cheapest_price
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |WHERE o_totalprice = (SELECT MIN(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = c_custkey)
        |GROUP BY c_custkey, c_mktsegment
        |ORDER BY c_custkey""".stripMargin,

    "sj1_star_join" ->
      """SELECT r_name, l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, l_returnflag
        |ORDER BY r_name, l_returnflag""".stripMargin,

    "ra1_regression_stats" -> regressionSql("lineitem"),

    "cdc1_apply_log" ->
      """WITH log AS (
        |  SELECT user_id AS k,
        |    CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
        |    event_type AS segment, ts, event_id
        |  FROM events),
        |latest AS (
        |  SELECT k, op, segment FROM (
        |    SELECT k, op, segment,
        |      ROW_NUMBER() OVER (PARTITION BY k ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM log) t
        |  WHERE rn = 1),
        |base AS (SELECT c_custkey AS k, c_mktsegment AS segment FROM customer)
        |SELECT COALESCE(b.k, l.k) AS k,
        |  CASE WHEN l.k IS NOT NULL THEN l.segment ELSE b.segment END AS segment
        |FROM base b FULL OUTER JOIN latest l ON b.k = l.k
        |WHERE l.op IS NULL OR l.op <> 'delete'
        |ORDER BY k""".stripMargin,

    "diff1_snapshot_diff" ->
      """WITH oldv AS (
        |  SELECT o_custkey, COUNT(*) AS n_orders,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY o_custkey),
        |newv AS (
        |  SELECT o_custkey, COUNT(*) AS n_orders,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |  FROM orders GROUP BY o_custkey)
        |SELECT * FROM (
        |  SELECT COALESCE(o.o_custkey, n.o_custkey) AS o_custkey,
        |    CASE WHEN o.o_custkey IS NULL THEN 'added'
        |         WHEN n.o_custkey IS NULL THEN 'removed'
        |         WHEN o.n_orders IS DISTINCT FROM n.n_orders
        |           OR o.total_price IS DISTINCT FROM n.total_price THEN 'changed'
        |    END AS change_type,
        |    o.n_orders AS old_n_orders, o.total_price AS old_total_price,
        |    n.n_orders AS new_n_orders, n.total_price AS new_total_price
        |  FROM oldv o FULL OUTER JOIN newv n ON o.o_custkey = n.o_custkey) t
        |WHERE change_type IS NOT NULL
        |ORDER BY o_custkey""".stripMargin,

    // scd1: the full Type-2 apply in ANSI SQL. The first-seen branch of the
    // operator is provably empty here (every o_custkey exists in customer),
    // so the oracle covers close + open + pass-through.
    "scd1_dim_versioning" ->
      s"WITH $scdVerSql\nSELECT * FROM ver ORDER BY c_custkey, valid_from",

    // scd2: point-in-time resolution of each order against the versioned
    // dimension (one version matches per order by interval construction).
    "scd2_pointintime" ->
      s"""WITH $scdVerSql
         |SELECT segment, COUNT(*) AS n_orders,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
         |FROM orders o JOIN ver v ON o.o_custkey = v.c_custkey
         |  AND o.o_orderdate >= v.valid_from
         |  AND (v.valid_to IS NULL OR o.o_orderdate < v.valid_to)
         |GROUP BY segment ORDER BY segment""".stripMargin)

  /** The scd1/scd2 versioned-dimension fixture as SQL CTEs (`ver` = the
    * Type-2 output relation) — shared so the point-in-time oracle reads the
    * exact relation the versioning oracle checks.
    */
  private def scdVerSql: String =
    """dim AS (
      |  SELECT c_custkey, c_mktsegment AS segment,
      |         TIMESTAMP '1995-01-01 00:00:00' AS valid_from,
      |         CAST(NULL AS TIMESTAMP) AS valid_to
      |  FROM customer),
      |upd AS (
      |  SELECT o_custkey AS c_custkey, 'VIP' AS segment, MAX(o_orderdate) AS eff
      |  FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 14),
      |chg AS (
      |  SELECT d.c_custkey, u.segment AS new_segment, u.eff
      |  FROM dim d JOIN upd u ON d.c_custkey = u.c_custkey
      |  WHERE d.valid_to IS NULL AND d.segment IS DISTINCT FROM u.segment),
      |ver AS (
      |  SELECT d.c_custkey, d.segment, d.valid_from,
      |         CASE WHEN d.valid_to IS NULL THEN c.eff ELSE d.valid_to END AS valid_to
      |  FROM dim d LEFT JOIN chg c ON d.c_custkey = c.c_custkey
      |  UNION ALL
      |  SELECT c_custkey, new_segment, eff, CAST(NULL AS TIMESTAMP)
      |  FROM chg)""".stripMargin
}
