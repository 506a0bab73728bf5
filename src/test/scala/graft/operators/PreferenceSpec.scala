package graft.operators

import graft.SparkSpec

/** Preference-pair assembly: argmax/argmin selection with smaller-id tie
  * breaks on BOTH sides, the integer margin floor, singleton-group and
  * null-score hygiene, and exact partitioning invariance.
  */
class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: Seq[(Long, Long, java.lang.Long)], minMargin: Long = 500L) =
    Preference.preferencePairs(
      rows.toDF("prompt", "id", "qfp"), "prompt", "id", "qfp", minMargin)

  test("chosen = max quality, rejected = min quality, margin exact") {
    val out = pairs(Seq(
      (1L, 10L, 9000L: java.lang.Long),
      (1L, 11L, 5000L: java.lang.Long),
      (1L, 12L, 7000L: java.lang.Long))).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_candidates") == 3)
    assert(r.getAs[Long]("chosen_id") == 10L)
    assert(r.getAs[Long]("rejected_id") == 11L)
    assert(r.getAs[Double]("chosen_q") == 0.9)
    assert(r.getAs[Double]("rejected_q") == 0.5)
    assert(r.getAs[Double]("margin") == 0.4)
  }

  test("quality ties break to the SMALLER id on both sides") {
    // all four candidates share qualities pairwise: two at 9000, two at 1000
    val out = pairs(Seq(
      (1L, 42L, 9000L: java.lang.Long),
      (1L, 7L, 9000L: java.lang.Long),
      (1L, 99L, 1000L: java.lang.Long),
      (1L, 13L, 1000L: java.lang.Long))).collect()
    assert(out.head.getAs[Long]("chosen_id") == 7L)    // not 42
    assert(out.head.getAs[Long]("rejected_id") == 13L) // not 99
  }

  test("margin floor drops narrow pairs; boundary kept") {
    val out = pairs(Seq(
      (1L, 1L, 5499L: java.lang.Long), (1L, 2L, 5000L: java.lang.Long), // 499 < 500
      (2L, 3L, 5500L: java.lang.Long), (2L, 4L, 5000L: java.lang.Long)  // 500 kept
    )).collect()
    assert(out.map(_.getAs[Long]("prompt")).toSeq == Seq(2L))
    assert(out.head.getAs[Double]("margin") == 0.05)
  }

  test("singleton groups and null-scored candidates are dropped") {
    val out = pairs(Seq(
      (1L, 1L, 9000L: java.lang.Long),                 // singleton -> no pair
      (2L, 2L, 9000L: java.lang.Long), (2L, 3L, null), // null doesn't count
      (3L, 4L, 9000L: java.lang.Long), (3L, 5L, 1000L: java.lang.Long),
      (3L, 6L, null)                                   // null not in n_candidates
    )).collect()
    assert(out.map(_.getAs[Long]("prompt")).toSeq == Seq(3L))
    assert(out.head.getAs[Long]("n_candidates") == 2)
  }

  test("a null-scored extremum can be neither chosen nor rejected") {
    val out = pairs(Seq(
      (1L, 1L, 9000L: java.lang.Long),
      (1L, 2L, 1000L: java.lang.Long),
      (1L, 3L, null))).collect()
    assert(out.head.getAs[Long]("chosen_id") == 1L)
    assert(out.head.getAs[Long]("rejected_id") == 2L)
  }

  test("incremental state: chained batches equal the one-shot aggregation") {
    val rows = (0L until 300L).map(i => (i % 13, i, (i * 97 % 10000): java.lang.Long))
    val oneShot = pairs(rows).orderBy("prompt").collect().toSeq
    // three disjoint batches, folded pairwise in both association orders
    val parts = (0 until 3).map(k => rows.filter(_._2 % 3 == k))
      .map(p => Preference.preferenceState(
        p.toDF("prompt", "id", "qfp"), "prompt", "id", "qfp"))
    val leftFold = parts.reduce(Preference.mergePreferenceState)
    val rightFold = Preference.mergePreferenceState(parts(0),
      Preference.mergePreferenceState(parts(1), parts(2)))
    for (state <- Seq(leftFold, rightFold)) {
      val chained = Preference.pairsFromState(state, 500L)
        .orderBy("prompt").collect().toSeq
      assert(chained == oneShot)
    }
  }

  test("incremental state: prompts seen in only one batch pass through the merge") {
    val a = Preference.preferenceState(Seq(
      (1L, 1L, 9000L: java.lang.Long), (1L, 2L, 1000L: java.lang.Long)
    ).toDF("prompt", "id", "qfp"), "prompt", "id", "qfp")
    val b = Preference.preferenceState(Seq(
      (2L, 3L, 8000L: java.lang.Long), (2L, 4L, 2000L: java.lang.Long)
    ).toDF("prompt", "id", "qfp"), "prompt", "id", "qfp")
    val out = Preference.pairsFromState(
      Preference.mergePreferenceState(a, b), 500L).orderBy("prompt").collect()
    assert(out.map(_.getAs[Long]("prompt")).toSeq == Seq(1L, 2L))
    assert(out.map(_.getAs[Long]("chosen_id")).toSeq == Seq(1L, 3L))
  }

  test("incremental state: a later batch can flip both chosen and rejected") {
    val day1 = Preference.preferenceState(Seq(
      (1L, 10L, 5000L: java.lang.Long), (1L, 11L, 4000L: java.lang.Long)
    ).toDF("prompt", "id", "qfp"), "prompt", "id", "qfp")
    val day2 = Preference.preferenceState(Seq(
      (1L, 12L, 9000L: java.lang.Long), (1L, 13L, 1000L: java.lang.Long)
    ).toDF("prompt", "id", "qfp"), "prompt", "id", "qfp")
    val r = Preference.pairsFromState(
      Preference.mergePreferenceState(day1, day2), 500L).collect().head
    assert(r.getAs[Long]("chosen_id") == 12L)
    assert(r.getAs[Long]("rejected_id") == 13L)
    assert(r.getAs[Long]("n_candidates") == 4L)
  }

  test("state consumers fail loudly on a reordered/renamed state schema") {
    val good = Preference.preferenceState(Seq(
      (1L, 1L, 9000L: java.lang.Long), (1L, 2L, 1000L: java.lang.Long)
    ).toDF("prompt", "id", "qfp"), "prompt", "id", "qfp")
    // a parquet round-trip / caller select that reorders columns must not
    // silently group on the wrong column
    val reordered = good.select("n_candidates", "prompt", "_cq",
      "chosen_id", "_rq", "rejected_id")
    val ex1 = intercept[IllegalArgumentException] {
      Preference.pairsFromState(reordered, 500L)
    }
    assert(ex1.getMessage.contains("pairsFromState"))
    val ex2 = intercept[IllegalArgumentException] {
      Preference.mergePreferenceState(good, reordered)
    }
    assert(ex2.getMessage.contains("mergePreferenceState"))
    // the canonical shape still flows
    assert(Preference.pairsFromState(good, 500L).count() == 1L)
  }

  test("group advantage: a fractional qfp column fails loudly, not by silent truncation") {
    // cast('long') on a DoubleType score would truncate 0.95 -> 0: total
    // signal loss with no error — the contract is fixed-point integers
    val dblRows = Seq((1L, 1L, 0.95), (1L, 2L, 0.80), (1L, 3L, 0.10))
      .toDF("prompt", "id", "qfp")
    val ex = intercept[IllegalArgumentException] {
      Preference.groupAdvantage(dblRows, "prompt", "id", "qfp")
    }
    assert(ex.getMessage.contains("integral fixed-point"))
  }

  test("group advantage: IntegerType qfp beyond 46340 does not wrap the square") {
    // 50000^2 = 2.5e9 > Int.MaxValue: an un-widened int*int square wraps
    // to a negative partial and poisons the variance (inside the documented
    // |qfp| < 2^30 envelope, so the n*max|qfp| tripwire cannot see it)
    val intRows = Seq((1L, 1L, 50000), (1L, 2L, 60000), (1L, 3L, 70000))
      .toDF("prompt", "id", "qfp") // qfp is IntegerType here
    val got = Preference.groupAdvantage(intRows, "prompt", "id", "qfp")
      .orderBy("id").collect().map(_.getAs[Double]("advantage")).toSeq
    // same data as long — the reference arithmetic
    val want = adv(Seq(
      (1L, 1L, 50000L: java.lang.Long),
      (1L, 2L, 60000L: java.lang.Long),
      (1L, 3L, 70000L: java.lang.Long)))
      .orderBy("id").collect().map(_.getAs[Double]("advantage")).toSeq
    assert(got == want && got == Seq(-1.2247, 0.0, 1.2247))
  }

  private def adv(rows: Seq[(Long, Long, java.lang.Long)]) =
    Preference.groupAdvantage(
      rows.toDF("prompt", "id", "qfp"), "prompt", "id", "qfp")

  test("group advantage: hand-computed z-scores from integer moments") {
    // qfp 1000/2000/3000: n=3, S=6000, SS=14e6 -> varNum = 6e6
    // z = (3q - 6000)/sqrt(6e6): -1.2247, 0, 1.2247
    val out = adv(Seq(
      (1L, 1L, 1000L: java.lang.Long),
      (1L, 2L, 2000L: java.lang.Long),
      (1L, 3L, 3000L: java.lang.Long)))
      .orderBy("id").collect()
    assert(out.map(_.getAs[Double]("advantage")).toSeq ==
      Seq(-1.2247, 0.0, 1.2247))
    assert(out.map(_.getAs[Double]("q")).toSeq == Seq(0.1, 0.2, 0.3))
    assert(out.forall(_.getAs[Long]("n_candidates") == 3))
  }

  test("degenerate groups: zero variance and singletons emit null advantage") {
    val out = adv(Seq(
      (1L, 1L, 5000L: java.lang.Long), (1L, 2L, 5000L: java.lang.Long),
      (2L, 3L, 7000L: java.lang.Long)))
      .orderBy("id").collect()
    assert(out.length == 3)
    assert(out.forall(_.isNullAt(out.head.fieldIndex("advantage"))))
  }

  test("group advantage: the moment-overflow tripwire raises instead of wrapping") {
    // n * max|qfp| = 2 * 1.1e9 > 2^31: n*ss - s*s would exceed 2^63
    val rows = Seq(
      (1L, 1L, 1100000000L: java.lang.Long),
      (1L, 2L, 1099999993L: java.lang.Long))
    val thrown = intercept[Throwable] { adv(rows).collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(thrown).exists(_.contains("overflow")), msgs(thrown).mkString(" | "))
  }

  test("null-scored candidates are outside both the moments and the output") {
    val out = adv(Seq(
      (1L, 1L, 1000L: java.lang.Long),
      (1L, 2L, 3000L: java.lang.Long),
      (1L, 3L, null))).orderBy("id").collect()
    assert(out.length == 2)                                // id 3 absent
    assert(out.forall(_.getAs[Long]("n_candidates") == 2)) // not 3
    // n=2, S=4000, SS=10e6 -> varNum = 4e6; z = (2q-4000)/2000 = ±1
    assert(out.map(_.getAs[Double]("advantage")).toSeq == Seq(-1.0, 1.0))
  }

  test("property: pairs and advantages match a naive in-memory reference on random data") {
    val rnd = new scala.util.Random(20260814)
    val rows = (0L until 400L).flatMap { i =>
      // random prompt domain, ~8% null scores, duplicate qualities likely
      val q: java.lang.Long = if (rnd.nextInt(12) == 0) null else (rnd.nextInt(50) * 100L)
      Some((rnd.nextInt(23).toLong, i, q))
    }
    // naive reference: group in memory, sort, pick extremes with the
    // documented tie-breaks, margin-filter
    val byPrompt = rows.filter(_._3 != null).groupBy(_._1)
    val refPairs = byPrompt.toSeq.flatMap { case (p, cs) =>
      val n = cs.size
      if (n < 2) None else {
        val chosen = cs.minBy(c => (-c._3.toLong, c._2))
        val rejected = cs.minBy(c => (c._3.toLong, c._2))
        val margin = chosen._3.toLong - rejected._3.toLong
        if (margin < 500) None
        else Some((p, n.toLong, chosen._2, rejected._2,
          chosen._3.toLong / 10000.0, rejected._3.toLong / 10000.0, margin / 10000.0))
      }
    }.sortBy(_._1)
    val gotPairs = pairs(rows).orderBy("prompt").collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(gotPairs == refPairs)
    // advantages: z = (n*q - S)/sqrt(n*SS - S^2), rounded 4
    val refAdv = byPrompt.toSeq.flatMap { case (p, cs) =>
      val n = cs.size.toLong
      val s = cs.map(_._3.toLong).sum
      val ss = cs.map(c => c._3.toLong * c._3.toLong).sum
      val varNum = n * ss - s * s
      cs.map { c =>
        val adv: java.lang.Double =
          if (n < 2 || varNum <= 0) null
          else BigDecimal((n * c._3.toLong - s).toDouble / math.sqrt(varNum.toDouble))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (c._2, p, n, adv)
      }
    }.sortBy(_._1)
    val gotAdv = adv(rows).orderBy("id").collect().toSeq.map(r =>
      (r.getLong(1), r.getLong(0), r.getLong(2),
        if (r.isNullAt(4)) null else (r.getDouble(4): java.lang.Double)))
    assert(gotAdv.size == refAdv.size)
    gotAdv.zip(refAdv).foreach { case ((id, p, n, a), (rid, rp, rn, ra)) =>
      assert(id == rid && p == rp && n == rn, s"row $id")
      assert(a == ra, s"advantage mismatch for id $id: $a vs $ra")
    }
  }

  test("partitioning invariance: 1, 3, and 16 partitions agree exactly") {
    val rows = (0L until 200L).map(i => (i % 11, i, (i * 37 % 10000): java.lang.Long))
    val base = pairs(rows).orderBy("prompt").collect().toSeq
    val baseAdv = adv(rows).orderBy("id").collect().toSeq
    for (n <- Seq(1, 3, 16)) {
      val df = rows.toDF("prompt", "id", "qfp").repartition(n)
      val re = Preference.preferencePairs(df, "prompt", "id", "qfp", 500L)
        .orderBy("prompt").collect().toSeq
      assert(re == base, s"pairs diverged at $n partitions")
      val reAdv = Preference.groupAdvantage(df, "prompt", "id", "qfp")
        .orderBy("id").collect().toSeq
      assert(reAdv == baseAdv, s"advantage diverged at $n partitions")
    }
  }
}
