package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** As-of join and band range join: equivalence with brute-force reference
  * implementations on random data, direction/edge semantics, and the
  * no-nested-loop plan claim.
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)

  // left: 200 probes over 20 keys; right: 100 quotes, unique per (key, ts)
  private val leftDf = Seq.tabulate(200) { i =>
    (i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong)
  }.toDF("probe_id", "k", "t")
  private val rightRows = Seq.tabulate(500) { i =>
    (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong)
  }.distinctBy(r => (r._1, r._2)).take(100)
  private val rightDf = rightRows.toDF("k", "rt", "quote_id")

  test("joinAsOf backward matches the brute-force max-ts-at-or-before match") {
    val got = Temporal.joinAsOf(leftDf, rightDf, Seq("k"), "t", "rt",
        payload = Seq("quote_id", "rt"))
      .select("probe_id", "quote_id", "rt")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet

    val byKey = rightRows.groupBy(_._1)
    val want = leftDf.collect().map { r =>
      val (pid, k, t) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val best = byKey.getOrElse(k, Seq.empty).filter(_._2 <= t)
        .sortBy(_._2).lastOption
      (pid, best.map(_._3), best.map(_._2))
    }.toSet
    assert(got == want)
    assert(got.size == 200) // every left row present (LEFT semantics)
  }

  test("joinAsOf forward matches the brute-force min-ts-at-or-after match") {
    val got = Temporal.joinAsOf(leftDf, rightDf, Seq("k"), "t", "rt",
        payload = Seq("quote_id"), direction = "forward")
      .select("probe_id", "quote_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet

    val byKey = rightRows.groupBy(_._1)
    val want = leftDf.collect().map { r =>
      val (pid, k, t) = (r.getLong(0), r.getLong(1), r.getLong(2))
      (pid, byKey.getOrElse(k, Seq.empty).filter(_._2 >= t).sortBy(_._2).headOption.map(_._3))
    }.toSet
    assert(got == want)
  }

  test("joinAsOfWithin nulls matches farther than the tolerance; rightTs dropped when not in payload") {
    val tol = 50.0
    val out = Temporal.joinAsOfWithin(leftDf, rightDf, Seq("k"), "t", "rt",
      payload = Seq("quote_id"), toleranceSec = tol)
    assert(!out.columns.contains("rt")) // rode along only to evaluate the window
    val got = out.select("probe_id", "quote_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val expect = leftDf.as[(Long, Long, Long)].collect().map { case (pid, k, t) =>
      val cands = rightRows.filter(r => r._1 == k && r._2 <= t)
      val best = if (cands.isEmpty) None else Some(cands.maxBy(_._2))
      pid -> best.filter(b => t - b._2 <= tol).map(_._3)
    }.toMap
    assert(got == expect)
  }

  test("joinAsOf ties are inclusive: an equal-ts right row matches") {
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 10L, 99L)).toDF("k", "rt", "quote_id")
    val back = Temporal.joinAsOf(l, r, Seq("k"), "t", "rt", Seq("quote_id")).head()
    val fwd = Temporal.joinAsOf(l, r, Seq("k"), "t", "rt", Seq("quote_id"),
      direction = "forward").head()
    assert(back.getLong(2) == 99L && fwd.getLong(2) == 99L)
  }

  test("joinAsOf rejects payload/left name clashes and bad directions") {
    intercept[IllegalArgumentException] {
      Temporal.joinAsOf(leftDf, rightDf, Seq("k"), "t", "rt", Seq("k"))
    }
    intercept[IllegalArgumentException] {
      Temporal.joinAsOf(leftDf, rightDf, Seq("k"), "t", "rt", Seq("quote_id"), "nearest")
    }
  }

  test("bandRangeJoin equals the naive theta join, including negative values") {
    val points = Seq.tabulate(300)(i => (i.toLong, rnd.nextLong(400) - 200))
      .toDF("pid", "x")
    val intervals = Seq.tabulate(60) { i =>
      val lo = rnd.nextLong(400) - 220
      (i.toLong, lo, lo + rnd.nextLong(30))
    }.toDF("iid", "lo", "hi")

    for (w <- Seq(1L, 7L, 64L)) {
      val got = Temporal.bandRangeJoin(points, "x", intervals, "lo", "hi", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val want = points.join(intervals, $"x" >= $"lo" && $"x" <= $"hi")
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.size == got.toSet.size, s"w=$w produced duplicate pairs")
      assert(got.toSet == want.toSet, s"w=$w mismatch")
    }
  }

  test("joinAsOf: null timestamps and null keys match nothing, both directions") {
    val l = Seq((1L, Some(1L), Some(100L)), (2L, Some(1L), None),
      (3L, None: Option[Long], Some(100L)))
      .toDF("probe_id", "k", "t")
    val r = Seq((Some(1L), Some(50L), 10L), (Some(1L), Some(150L), 11L),
      (Some(1L), None: Option[Long], 12L), (None: Option[Long], Some(60L), 13L))
      .toDF("k", "rt", "quote_id")
    for (dir <- Seq("backward", "forward")) {
      val out = Temporal.joinAsOf(l, r, Seq("k"), "t", "rt",
          payload = Seq("quote_id"), direction = dir)
        .collect().map(x => x.getLong(0) ->
          (if (x.isNullAt(x.fieldIndex("quote_id"))) None
           else Some(x.getLong(x.fieldIndex("quote_id"))))).toMap
      val wantP1 = if (dir == "backward") 10L else 11L
      assert(out == Map(1L -> Some(wantP1), 2L -> None, 3L -> None),
        s"direction=$dir got $out") // null t / null k rows: no match; null-rt
                                    // and null-k right rows never win
    }
  }

  test("neither operator plans a cartesian or broadcast-nested-loop join") {
    val asOfPlan = Temporal.joinAsOf(leftDf, rightDf, Seq("k"), "t", "rt",
      Seq("quote_id")).queryExecution.executedPlan.toString
    val bandPlan = Temporal.bandRangeJoin(
      leftDf.select($"probe_id", $"t".as("x")), "x",
      rightDf.select($"quote_id", $"rt".as("lo"), ($"rt" + 10).as("hi")), "lo", "hi", 16L)
      .queryExecution.executedPlan.toString
    for (plan <- Seq(asOfPlan, bandPlan); bad <- Seq("CartesianProduct", "BroadcastNestedLoop"))
      assert(!plan.contains(bad), s"found $bad:\n$plan")
  }

  test("joinAsOf refuses inputs that use its reserved internal names") {
    val poisoned = rightDf.withColumnRenamed("quote_id", "__pay")
    intercept[IllegalArgumentException] {
      Temporal.joinAsOf(leftDf, poisoned, Seq("k"), "t", "rt", Seq("__pay"))
    }
    val poisonedLeft = leftDf.withColumnRenamed("probe_id", "__row")
    intercept[IllegalArgumentException] {
      Temporal.joinAsOf(poisonedLeft, rightDf, Seq("k"), "t", "rt", Seq("quote_id"))
    }
  }
}
