package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Training-set assembly: deterministic hash splits and sequence packing. */
class SplitsSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit: deterministic, order-independent, fractions approximately honored") {
    val ids = (1L to 2000L).toDF("id")
    val split = Splits.hashSplit(ids, "id", "s1",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    assert(math.abs(counts("train") - 1600.0) < 100, counts) // ±~2.5σ
    assert(counts("val") > 100 && counts("test") > 100, counts)
    // pure function of (salt, id): same assignment under reversed input order
    val again = Splits.hashSplit(ids.orderBy(desc("id")), "id", "s1",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.except(again).isEmpty && again.except(split).isEmpty)
    // a different salt re-rolls membership
    val rerolled = Splits.hashSplit(ids, "id", "s2",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.except(rerolled).count() > 0)
  }

  test("hashSplit: single bucket degenerates to a constant") {
    val out = Splits.hashSplit(Seq(1L, 2L).toDF("id"), "id", "x", Seq("all" -> 1.0))
    assert(out.select("split").distinct().as[String].collect().toSeq == Seq("all"))
  }

  test("componentSplit: dup clusters share a split, singletons key by own id, no pair straddles") {
    val ids = (1L to 300L).toDF("doc_id")
    // pair graph: a chain {1,2,3} and a pair {10,11}; everything else singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val asg = Splits.componentSplit(ids, "doc_id", pairs, "a", "b", "cs", fr)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(asg.size == 300)
    // whole components co-located
    assert(asg(1L) == asg(2L) && asg(2L) == asg(3L))
    assert(asg(10L) == asg(11L))
    // no near-dup pair straddles splits — the operator's defining property
    Seq((1L, 2L), (2L, 3L), (10L, 11L), (1L, 3L)).foreach { case (a, b) =>
      assert(asg(a) == asg(b), s"pair ($a,$b) straddles: ${asg(a)} vs ${asg(b)}")
    }
    // singletons key by their own id — identical to plain hashSplit
    val plain = Splits.hashSplit(ids, "doc_id", "cs", fr)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (20L to 300L).foreach(i => assert(asg(i) == plain(i), s"singleton $i re-keyed"))
    // cluster members follow the COMPONENT representative's draw (min id)
    assert(asg(2L) == plain(1L) && asg(11L) == plain(10L))
  }

  test("componentSplit: an input `comp` column passes through untouched; reserved names refuse") {
    // round-14 advice: the old working columns were `comp`/`_skey` — a
    // caller frame already carrying `comp` hit an ambiguous-column
    // AnalysisException and `_skey` was silently overwritten. Internal
    // names are now collision-proof, and the (improbable) reserved names
    // fail fast instead of corrupting.
    val ids = (1L to 50L).toDF("doc_id").withColumn("comp", col("doc_id") * 2)
    val pairs = Seq((1L, 2L)).toDF("a", "b")
    val fr = Seq("train" -> 0.8, "test" -> 0.2)
    val out = Splits.componentSplit(ids, "doc_id", pairs, "a", "b", "cs", fr)
    assert(out.columns.toSeq == Seq("doc_id", "comp", "split"))
    assert(out.filter(col("comp") =!= col("doc_id") * 2).isEmpty)
    intercept[IllegalArgumentException] {
      Splits.componentSplit(ids.withColumn("__cs_key", lit(1)),
        "doc_id", pairs, "a", "b", "cs", fr)
    }
  }

  test("upsample: integer factor repeats exactly; fractional factor hits expectation") {
    val ids = (1L to 1000L).toDF("id")
    val exact = Splits.upsample(ids, "id", "u1", lit(3.0))
    assert(exact.count() == 3000)
    assert(exact.groupBy("id").count().filter(col("count") =!= 3).isEmpty)
    val frac = Splits.upsample(ids, "id", "u1", lit(1.5)).count()
    assert(math.abs(frac - 1500.0) < 60, s"got $frac") // ±~4σ of Binomial(1000,.5)
    // deterministic: same salt reproduces the same multiset
    val again = Splits.upsample(ids, "id", "u1", lit(1.5)).count()
    assert(frac == again)
    // sub-1 factor downsamples deterministically
    val down = Splits.upsample(ids, "id", "u1", lit(0.25)).count()
    assert(math.abs(down - 250.0) < 60, s"got $down")
  }

  test("upsample: near-1.0 fractional part clamps instead of inverting the bound") {
    val ids = (1L to 1000L).toDF("id")
    // nextDown(1.0) is the one double < 1 whose product with 2^32 rounds to
    // exactly 2^32: unclamped, format_string prints the 9-char '100000000'
    // and `h < bound` flips to matching only hashes that start with '0'
    // (~1/16 of rows). Clamped to ffffffff, every row draws its copy.
    val n = Splits.upsample(ids, "id", "u1", lit(Math.nextDown(1.0))).count()
    assert(n == 1000L, s"got $n")
    // negative factor: clamped to 0 — rows drop, nothing explodes
    assert(Splits.upsample(ids, "id", "u1", lit(-2.5)).count() == 0L)
  }

  test("weightedSample: weight-biased, deterministic, partitioning-invariant") {
    val rows = (1L to 1000L).map(i => (i, if (i <= 100) 1000 else 1))
    val df = spark.sparkContext.parallelize(rows, 8).toDF("id", "w")
    val got = Splits.weightedSample(df, "id", "s1", col("w"), k = 50)
      .select("rank", "id").as[(Long, Long)].collect().toSeq
    assert(got.size == 50 && got.map(_._1) == (1L to 50L))
    // 100 heavy ids (x1000 weight) should dominate the sample
    assert(got.count(_._2 <= 100L) > 40, s"heavy ids in sample: ${got.count(_._2 <= 100L)}")
    // identical under a different partitioning and input order
    val again = Splits.weightedSample(
      spark.sparkContext.parallelize(rows.reverse, 3).toDF("id", "w"),
      "id", "s1", col("w"), k = 50)
      .select("rank", "id").as[(Long, Long)].collect().toSeq
    assert(got == again)
    // re-salting re-rolls the selection
    val other = Splits.weightedSample(df, "id", "s2", col("w"), k = 50)
      .select("id").as[Long].collect().toSet
    assert(other != got.map(_._2).toSet)
  }

  test("weightedSample: non-positive and null weights are excluded, not top-ranked") {
    // w < 0 flips the exponent sign (u^(1/w) >= 1), which without the guard
    // would put every invalid row ahead of every legitimate one
    val df = Seq((1L, 5.0), (2L, 5.0), (3L, -10.0), (4L, 0.0), (6L, Double.NaN))
      .toDF("id", "w")
      .union(Seq((5L, Option.empty[Double])).toDF("id", "w"))
    val got = Splits.weightedSample(df, "id", "s1", col("w"), k = 5)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L), got)
  }

  test("packSequences: concat-and-cut window assignment matches hand computation") {
    // one group, one shard; tokens 300,300,300,300 at ctx 512:
    // starts at 0,300,600,900 -> seq_ids 0,0,1,1
    val docs = Seq(("a", 1L, 300), ("a", 2L, 300), ("a", 3L, 300), ("a", 4L, 300))
      .toDF("g", "id", "n")
    val packed = Splits.packSequences(docs, "g", "id", col("n"), ctxLen = 512)
      .select("id", "seq_id").as[(Long, Long)].collect().toMap
    assert(packed == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("packSequences: shards cumsum independently (no cross-shard coupling)") {
    val docs = Seq(("a", 1L, 400), ("a", 1025L, 400), ("a", 1026L, 400))
      .toDF("g", "id", "n")
    val packed = Splits.packSequences(docs, "g", "id", col("n"),
        ctxLen = 512, shardSize = 1024)
      .select("id", "_shard", "seq_id").as[(Long, Long, Long)].collect().toSet
    // doc 1025 starts a FRESH shard stream: its cum restarts at 0
    assert(packed == Set((1L, 0L, 0L), (1025L, 1L, 0L), (1026L, 1L, 0L)))
  }

  test("deterministicShuffle: per-shard positions are contiguous ranks; assignment matches the brute-force window") {
    val df = (1L to 500L).toDF("id")
    val got = Splits.deterministicShuffle(df, "id", "s", nShards = 4)
      .select("id", "shard", "pos").as[(Long, Int, Long)].collect()
    // brute-force reference: same key arithmetic, driver-side sort
    val ref = (1L to 500L).map { id =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"s:$id".getBytes("UTF-8"))
      // md5Lower64: last 8 digest bytes assembled in REVERSE (byte 15 most
      // significant, byte 8 least — DuckDB md5_number_lower), signed shift
      val unsigned = (0 until 8).map(i => BigInt(d(8 + i) & 0xff) << (8 * i)).sum
      id -> (unsigned - (BigInt(1) << 63)).toLong
    }.toMap
    val want = ref.toSeq.groupBy { case (_, k) => (((k % 4) + 4) % 4).toInt }
      .flatMap { case (sh, xs) =>
        xs.sortBy { case (id, k) => (k, id) }.zipWithIndex
          .map { case ((id, _), i) => (id, sh, (i + 1).toLong) }
      }.toSet
    assert(got.toSet == want)
  }

  test("deterministicShuffle: invariant to input partitioning; salt re-rolls the permutation") {
    val df = (1L to 300L).toDF("id")
    val a = Splits.deterministicShuffle(df.repartition(13), "id", "e1", 4)
      .select("id", "shard", "pos").as[(Long, Int, Long)].collect().toSet
    val b = Splits.deterministicShuffle(df.repartition(2), "id", "e1", 4)
      .select("id", "shard", "pos").as[(Long, Int, Long)].collect().toSet
    assert(a == b)
    val c = Splits.deterministicShuffle(df, "id", "e2", 4)
      .select("id", "shard", "pos").as[(Long, Int, Long)].collect().toSet
    assert(a != c) // different salt, different permutation
    // every shard's positions are exactly 1..n_shard under any salt
    Seq(a, c).foreach { s =>
      s.groupBy(_._2).foreach { case (_, xs) =>
        assert(xs.map(_._3).toSeq.sorted == (1L to xs.size).toSeq)
      }
    }
  }

  test("packSequencesWhole: hand-computed greedy no-split packing") {
    // ctx 512: docs 300,300 -> overflow at second (600>512) -> seqs 0,1;
    // then 200 fits seq 1 (300+200=500); 900 oversized -> seq 2 alone;
    // 10 -> seq 3 (900+10 overflows); 0-token doc stays in seq 3
    val docs = Seq((1L, 300L), (2L, 300L), (3L, 200L), (4L, 900L), (5L, 10L), (6L, 0L))
      .toDF("id", "n")
    val got = Splits.packSequencesWhole(docs, "id", col("n"), ctxLen = 512)
      .select("id", "seq_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L, 6L -> 3L))
  }

  test("packSequencesWhole: zero-token docs never evict and never admit sharing (review finding)") {
    // (0-token, oversized): the oversized doc still effectively holds the
    // sequence alone (the empty doc adds nothing); (oversized, 0-token):
    // the empty doc must STAY with it, not be evicted to an all-padding
    // sequence; null token counts coalesce to 0
    val docs = Seq((1L, Some(0L)), (2L, Some(900L)), (3L, None), (4L, Some(100L)))
      .toDF("id", "n")
    val got = Splits.packSequencesWhole(docs, "id", col("n"), ctxLen = 512)
      .select("id", "seq_id").as[(Long, Long)].collect().toMap
    // 1: fill 0 seq 0; 2: no eviction (fill=0) -> seq 0, fill 900;
    // 3 (null->0): stays seq 0; 4: overflows (900+100>512) -> seq 1
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("packSequencesWhole: no doc straddles a boundary; shards pack independently") {
    val docs = (1L to 50L).map(id => (id, 100L + (id % 7) * 50)).toDF("id", "n")
    val out = Splits.packSequencesWhole(docs, "id", col("n"), ctxLen = 512, shardSize = 16)
      .as[(Long, Long, Long, Long)].collect() // shard, id, seq_id, n_tokens
    // a sequence's sum exceeds ctx only with exactly ONE positive-token doc
    out.groupBy(r => (r._1, r._3)).foreach { case (_, rs) =>
      assert(rs.map(_._4).sum <= 512 || rs.count(_._4 > 0) == 1)
    }
    // shard boundary: id 16 starts shard 1 with a fresh seq 0
    assert(out.find(_._2 == 16L).get._3 == 0L)
    // deterministic under repartition
    val out2 = Splits.packSequencesWhole(docs.repartition(7), "id", col("n"),
      ctxLen = 512, shardSize = 16).as[(Long, Long, Long, Long)].collect()
    assert(out.toSet == out2.toSet)
  }

  test("deterministicShard agrees with deterministicShuffle's shard column") {
    val df = (1L to 200L).toDF("id")
    val full = Splits.deterministicShuffle(df, "id", "s9", 4)
      .select("id", "shard").as[(Long, Int)].collect().toMap
    val only = Splits.deterministicShard(df, "id", "s9", 4)
      .select("id", "shard").as[(Long, Int)].collect().toMap
    assert(only == full)
  }

  test("deterministicShuffle: reserved column names refuse loudly") {
    val df = (1L to 10L).toDF("id").withColumn("shard", lit(0))
    val e = intercept[IllegalArgumentException] {
      Splits.deterministicShuffle(df, "id", "s", 4)
    }
    assert(e.getMessage.contains("reserved"))
  }
}
