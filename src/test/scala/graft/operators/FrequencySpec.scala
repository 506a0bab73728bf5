package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Sketch-then-verify heavy hitters: the MG completeness guarantee makes the
  * verified output EXACT — equal to the brute-force groupBy answer — for any
  * partitioning of the input.
  */
class FrequencySpec extends SparkSpec {
  import spark.implicits._

  private def exact(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val n = df.count()
    df.groupBy("item").agg(count(lit(1)).as("freq"))
      .filter(col("freq") * (k + 1L) > n)
      .orderBy(desc("freq"), col("item"))
      .as[(String, Long)].collect().toSeq
  }

  test("matches the exact groupBy answer on a skewed stream, any partitioning") {
    // 3 heavy items in a sea of unique light items; gamma sits just above
    // the strict n/(k+1) = 10% threshold (exactly-at-threshold is excluded)
    val rows = Seq.fill(300)("alpha") ++ Seq.fill(200)("beta") ++
      Seq.fill(120)("gamma") ++ (1 to 380).map(i => s"light_$i")
    for (parts <- Seq(1, 7, 32)) {
      val df = spark.sparkContext.parallelize(rows, parts).toDF("item")
      val got = Frequency.heavyHitters(df, col("item"), k = 9)
        .as[(String, Long)].collect().toSeq
      assert(got == exact(df, 9), s"parts=$parts got=$got")
      assert(got.map(_._1) == Seq("alpha", "beta", "gamma"))
    }
  }

  test("no item above threshold -> empty result (sketch candidates all verified away)") {
    val df = (1 to 500).map(i => s"u_${i % 100}").toDF("item") // 1% shares, k=9
    assert(Frequency.heavyHitters(df, col("item"), k = 9).isEmpty)
  }

  test("nulls are ignored on both passes") {
    val df = (Seq.fill(50)(Some("hot")) ++ Seq.fill(20)(Option.empty[String]) ++
      (1 to 30).map(i => Some(s"u$i"))).toDF("item")
    // n = 80 non-null; hot: 50*(3+1)=200 > 80 -> kept
    val got = Frequency.heavyHitters(df, col("item"), k = 3)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("hot", 50L)), got)
  }

  test("mg_sketch alone: candidate superset holds under adversarial order") {
    // guarantee: any item with freq > n/(k+1) is among the sketch entries,
    // however the input is ordered or partitioned
    val rows = Seq.fill(120)("big") ++ (1 to 480).map(i => s"x$i")
    for (seed <- Seq(1, 2, 3)) {
      val shuffled = new scala.util.Random(seed).shuffle(rows)
      val df = spark.sparkContext.parallelize(shuffled, 16).toDF("item")
      val cands = df.agg(call_function("mg_sketch", col("item"), lit(4)).as("c"))
        .select(explode(col("c.item")))
        .as[String].collect().toSet
      assert(cands.contains("big"), s"seed=$seed cands=$cands") // 120*5 > 600
      assert(cands.size <= 4)
    }
  }

  test("count-min: est >= exact always, and the eps*N error bound holds on this stream") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 2000).map(_ => s"w_${rnd.nextInt(60)}")
    val df = spark.sparkContext.parallelize(rows, 8).toDF("item")
    val depth = 4; val width = 64 // narrow width to force real collisions
    val counters = Frequency.countMinCounters(df, col("item"), depth, width)
    val probes = rows.distinct.toDF("item")
    val est = Frequency.countMinEstimate(counters, probes, depth, width)
      .as[(String, Long)].collect().toMap
    val exact = rows.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    exact.foreach { case (w, n) =>
      assert(est(w) >= n, s"$w: est ${est(w)} < exact $n")
      // e*N/width with e ~= 2.718: generous deterministic cap for seed 7
      assert(est(w) - n <= math.ceil(math.E * rows.size / width).toLong,
        s"$w: overestimate ${est(w) - n}")
    }
    // an item never seen estimates 0 unless every row collides
    assert(est.values.forall(_ >= 0))
  }

  test("count-min counters merge by addition: halves summed == whole") {
    val rows = (1 to 1000).map(i => s"t_${i % 37}")
    val (a, b) = rows.splitAt(500)
    val whole = Frequency.countMinCounters(rows.toDF("item"), col("item"), 3, 32)
      .as[(Int, Long, Long)].collect().toSeq.sorted
    val merged = Frequency.countMinCounters(a.toDF("item"), col("item"), 3, 32)
      .union(Frequency.countMinCounters(b.toDF("item"), col("item"), 3, 32))
      .groupBy("j", "idx").agg(sum("cnt").as("cnt"))
      .as[(Int, Long, Long)].collect().toSeq.sorted
    assert(whole == merged)
  }
}
