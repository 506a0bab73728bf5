package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** The host-drift sentinel battery (see the in-method comment). Exposed
    * so InvariantsSpec can hold the sentinel pin file in lockstep.
    * m2_image_decode joined in round 18 (verdict item 4): the codec-bound
    * `mapPartitions` class (m1–m7 — ImageIO/PCM decode dominates, not
    * codegen/shuffle) had no sentinel, and the round-16 incident showed an
    * unspanned class can elevate invisibly — the m-lane ~2× cold readings
    * the extra warm pass below exists for are exactly codec-JIT noise the
    * other four sentinels read straight through.
    * e2e1_production_export joined in round 19 (verdict item 6): the
    * composed-DAG class — multi-stage lineage with localCheckpoints across
    * stage boundaries — which none of the five single-shape sentinels
    * spans; the r16 and r18 incidents both showed unspanned classes
    * elevate invisibly, and e2e1 is the wall-clock a production user sees.
    */
  val sentinelNames: Seq[String] =
    Seq("t2_quality_score", "t9_bigram_lm", "j2_semi_join", "pg1_pagerank",
      "m2_image_decode", "e2e1_production_export")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JMH-style warmup epoch: run the full query set once untimed, then time
    // the second epoch. First-encounter costs (whole-stage codegen compiles,
    // JIT of interpreted higher-order-function evaluators, regex/timestamp
    // parser paths, parquet reader init) are tens of seconds and otherwise
    // land arbitrarily on whichever queries run first, drowning the actual
    // per-query signal the benchmark exists to measure.
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // Second warm pass for the image (ImageIO) lane only: codec JIT needs
    // more than one encounter — BASELINE.md's m2 adjudication traced the
    // recurring ~2x cold readings to exactly this, and a per-round false
    // alarm is worth 5 extra untimed seconds (round-14 verdict item 7).
    SparkEntry.queries.filter(_._1.matches("m\\d+_.*")).foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // Host-drift SENTINEL battery (round 16 — mechanizes BASELINE.md's
    // manual adjudication protocol, which three rounds of m2/c1/d11/t9
    // re-chasing followed by hand): three warm queries spanning the
    // noise-sensitive plan classes — t2 (codegen-lambda-dense scan), t9
    // (lambda + shuffle aggregate), j2 (shuffle-bound relational) — are
    // timed min-of-3 BEFORE the epochs; their aggregate ratio against
    // their own pins is the run's host-drift factor. A per-query ratio
    // elevation that tracks the sentinels is host band, not regression —
    // the emitted `drift` and drift-normalized vs_baseline make that a
    // one-number read instead of a same-session control re-timing.
    // pg1 joined the battery after the round-16 final-commit run showed a
    // SHUFFLE-side band (every CC/iterative lane +15-30% together) that
    // t2/t9/j2 read straight through at 0.86 — the three original classes
    // (codegen-lambda scan, lambda+shuffle agg, shuffle-bound join) don't
    // span the multi-round iterative class whose per-round scheduler+
    // exchange costs band independently.
    val sentinelNames = Bench.sentinelNames
    // A sentinel that THROWS must not record a near-zero wall: its ~0 s
    // reading would collapse `drift` toward 0 and inflate every
    // drift-normalized ratio by orders of magnitude — the adjudication
    // metric would report a massive global regression (or mask a real
    // host band) instead of saying "a sentinel is broken". Failed
    // sentinels are dropped from the battery; the epochs below still
    // record the failure as that query's own timing row.
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
      catch { case _: Throwable => None }
    }
    val sentinelTimes: Map[String, Double] =
      sentinelNames.filter(SparkEntry.queries.contains).flatMap { name =>
        val runs = (1 to 3).flatMap(_ => timeOnce(SparkEntry.queries(name)))
        if (runs.size < 3) {
          System.err.println(s"Bench: sentinel $name FAILED — excluded from drift")
          None
        } else Some(name -> runs.min)
      }.toMap
    // Timed epochs in name order (Map hash order varies with the query set,
    // which would shuffle noise across rounds). Three timed epochs, min per
    // query: this host shows transient multi-second scheduler stalls that
    // land on a random query per run (observed identical-binary totals of
    // 34s..227s), and C2 JIT of hot loops can still finish during the first
    // timed epoch; the per-query minimum is the standard estimator for the
    // actual cost under that kind of one-sided noise (round 2's d4 recorded
    // 10.9s in BENCH against a reproducible 2.3s steady state).
    def epoch(): Map[String, Double] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }.toMap
    // SPARK_GRAFT_EPOCHS: the driver contract stays 3; the one-off sf1
    // scale probe (SURVEY §6.2) sets 1 — at 10x data, min-of-3 buys little
    // and costs an hour.
    val nEpochs = sys.env.getOrElse("SPARK_GRAFT_EPOCHS", "3").toInt
    val epochs = Seq.fill(nEpochs)(epoch())
    // Locale.ROOT: f"" uses the JVM default locale, which under e.g. de_DE
    // emits "0,7374" — invalid JSON for the machine-parsed bench lines.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val keys = epochs.head.keys.toSeq.sorted
    val results = keys.map(k => k -> epochs.map(_(k)).min).toMap
    // Median alongside min: min is the estimator (one-sided scheduler-stall
    // noise, see above) but it can hide regressions that only show under
    // contention; emitting both lets round-over-round audits check either.
    val medians = keys.map(k => k -> epochs.map(_(k)).sorted.apply(epochs.length / 2)).toMap
    def jmap(m: Map[String, Double]): String =
      keys.map(k => "\"" + k + "\":" + fmt(m(k))).mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Pinned per-query baseline (quiet-host min-of-3 at sf0.1, recorded in
    // BASELINE.md and mirrored as a flat {"query": sec} classpath resource):
    // the 2x gate and regression calls become one-number reads instead of a
    // manual re-timing session. Ratios are only meaningful at the baseline's
    // scale factor; at other SFs they are emitted anyway and readers ignore
    // them. Queries newer than the pin simply have no ratio.
    // ONE pin parser for both resources — the two files must never parse
    // differently (numeric-valued keys only; a _comment string is skipped)
    def loadPins(resource: String): Map[String, Double] = {
      val in = getClass.getResourceAsStream(resource)
      if (in == null) Map.empty
      else try {
        val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
        """"([a-z0-9_]+)"\s*:\s*([0-9.]+)""".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } finally in.close()
    }
    val baseline = loadPins("/graft/bench_baseline.json")
    val common = keys.filter(baseline.contains)
    val ratios = common.map(k => k -> results(k) / baseline(k)).toMap
    val vsBaseline =
      if (common.isEmpty) -1.0
      else common.map(results).sum / common.map(baseline).sum
    // Sentinel pins live in their OWN resource, minted under the battery's
    // OWN protocol (back-to-back warm min-of-3 straight after the warm-up
    // epochs, quiet pin host — i.e. exactly how the battery reads them).
    // Round 16's battery divided battery readings by interleaved-3-epoch /
    // QBench pins instead: drift read 0.66 while the surface read 1.09,
    // and the "normalized" ratios amplified the discrepancy to 2.8-3.1x —
    // noise amplification, not adjudication (round-16 verdict item 2).
    // Falls back to the epoch-protocol pins only when the sentinel file is
    // absent (a fresh checkout), where approximate drift beats none.
    val sentinelBaseline: Map[String, Double] = {
      // fall back ONLY when the resource is ABSENT (fresh checkout):
      // a present-but-unparseable pin file must surface as drift = -1
      // (no pinned sentinels), not silently divide by the epoch pins —
      // that is the exact noise-amplification mode this split removed
      val in = getClass.getResourceAsStream("/graft/sentinel_baseline.json")
      if (in == null) baseline
      else { in.close(); loadPins("/graft/sentinel_baseline.json") }
    }
    // drift = MEDIAN of per-sentinel wall/pin ratios (sentinels with no pin
    // are skipped; -1 when none are pinned, e.g. a fresh checkout). The
    // normalized vs_baseline divides the drift factor out.
    // Median, not Σwall/Σpin (round 20): the sum-ratio weights sentinels by
    // wall seconds, so ONE elevated heavy sentinel owns the factor — the
    // round-20 adjudication run read m2's battery at 2.26× (the codec-JIT
    // band, cleared by a dedicated min-of-3 at 0.83× the same hour), which
    // dragged sum-ratio drift to 1.43 while the other five sentinels sat at
    // 0.72–1.23 (median 1.05, host at par) — and the drift-NORMALIZED
    // ratios then divided m2's own epoch elevation by its own band (0.92),
    // masking exactly the lane the battery exists to flag. The median moves
    // only when the host band is broad (a genuine drift shifts most
    // classes), never on a single banding sentinel.
    val sentCommon = sentinelTimes.keys.toSeq.filter(sentinelBaseline.contains).sorted
    val drift =
      if (sentCommon.isEmpty) -1.0
      else {
        val rs = sentCommon.map(k => sentinelTimes(k) / sentinelBaseline(k)).sorted
        if (rs.size % 2 == 1) rs(rs.size / 2)
        else (rs(rs.size / 2 - 1) + rs(rs.size / 2)) / 2.0
      }
    // Output contract: the driver's tail capture truncates long stdout (82
    // queries overflowed a single line in round 3 -> BENCH parsed:null), so
    // the per-query detail lines go FIRST and the short machine-readable
    // total line goes LAST where tail capture is guaranteed to retain it.
    println(s"""{"metric":"detail_min","queries":${jmap(results)},"sf":"$sfDir"}""")
    println(s"""{"metric":"detail_median","queries":${jmap(medians)},"sf":"$sfDir"}""")
    // raw sentinel seconds: every artifact doubles as a battery-protocol
    // pin-minting record — computed (and, below, emitted) even on a fresh
    // checkout with no pins in common, the exact scenario that needs one
    val sentSecJson = sentinelTimes.keys.toSeq.sorted
      .map(k => "\"" + k + "\":" + fmt(sentinelTimes(k))).mkString("{", ",", "}")
    if (common.nonEmpty) {
      val worst = common.sortBy(k => -ratios(k)).take(10)
        .map(k => "\"" + k + "\":" + fmt(ratios(k))).mkString("{", ",", "}")
      // worst ratios with the drift factor divided out: a query whose
      // normalized ratio sits near 1.0 while its raw ratio is elevated is
      // riding the host band the sentinels measured, not regressing
      val worstNorm =
        if (drift <= 0) "{}"
        else common.sortBy(k => -ratios(k)).take(10)
          .map(k => "\"" + k + "\":" + fmt(ratios(k) / drift)).mkString("{", ",", "}")
      val sentJson = sentCommon
        .map(k => "\"" + k + "\":" + fmt(sentinelTimes(k) / sentinelBaseline(k))).mkString("{", ",", "}")
      println(s"""{"metric":"vs_baseline_detail","value":${fmt(vsBaseline)},"unit":"ratio","drift":${fmt(drift)},"vs_baseline_drift_norm":${fmt(if (drift > 0) vsBaseline / drift else -1.0)},"sentinels":$sentJson,"sentinels_sec":$sentSecJson,"queries":$worst,"queries_drift_norm":$worstNorm,"n_baselined":${common.size},"n_unbaselined":${keys.size - common.size},"sf":"$sfDir"}""")
    } else if (sentinelTimes.nonEmpty) {
      // fresh checkout (no per-query pins): still record the minting data
      println(s"""{"metric":"sentinels_sec","sentinels_sec":$sentSecJson,"sf":"$sfDir"}""")
    }
    val slowest = keys.sortBy(k => -results(k)).take(10)
      .map(k => "\"" + k + "\":" + fmt(results(k))).mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","vs_baseline":${fmt(vsBaseline)},"drift":${fmt(drift)},"queries":$slowest,"sf":"$sfDir"}""")
    spark.stop()
  }
}
