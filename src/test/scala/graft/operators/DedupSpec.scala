package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}

/** D-series dedup family (charter): exact, fingerprint, MinHash+LSH,
  * SimHash, n-gram Jaccard.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs away fast", "en"),
    (2L, "the quick brown fox jumps over the lazy dog and runs away fast", "en"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog and walks away fast", "en"),  // near dup of 1
    (4L, "completely different content about spark distributed engines here", "en"),
    (5L, "der schnelle braune fuchs springt ueber den faulen hund gerade", "de")
  ).toDF("doc_id", "text", "lang")

  test("exact dedup: min id kept, dupes counted") {
    val out = Dedup.exact(docs, Seq("text"), "doc_id")
      .orderBy("doc_id").select("doc_id", "n_dupes").as[(Long, Long)].collect()
    assert(out.length == 4)
    assert(out.head == (1L, 2L)) // docs 1+2 collapse
  }

  test("fingerprint dedup: whitespace/case variants collapse") {
    val v = Seq((1L, "Hello   World"), (2L, "hello world"), (3L, "other")).toDF("doc_id", "text")
    val out = Dedup.exactByFingerprint(v, "text", "doc_id").orderBy("doc_id")
      .select("doc_id", "n_dupes").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("minhash LSH: exact dup pair found with jaccard 1.0; near dup found") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", 32, 16, 0.05)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.contains((1L, 2L, 1.0)))
    assert(pairs.exists { case (a, b, j) => a == 1L && b == 3L && j > 0.3 && j < 1.0 })
  }

  test("simhash: identical texts share a signature, disjoint texts differ (32 and 64 bit)") {
    for (sigOf <- Seq(Dedup.simhash32 _, Dedup.simhash64 _)) {
      val sig = sigOf(docs, "doc_id", "text").as[(Long, Long)].collect().toMap
      assert(sig(1L) == sig(2L))
      assert(sig(1L) != sig(4L))
      assert(sig.size == 5)
    }
    // 64-bit signatures actually use the high bits (a 32-bit sig shifted
    // into a long would leave them zero)
    val s64 = Dedup.simhash64(docs, "doc_id", "text").as[(Long, Long)].collect()
    assert(s64.exists { case (_, s) => (s >>> 32) != 0L })
  }

  test("simhash near-dup pairs: exact dups at distance 0, verified hamming, no distant pairs") {
    val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxDist = 3)
      .as[(Long, Long, Int)].collect().toMap2
    assert(pairs.get((1L, 2L)).contains(0)) // exact dup: distance 0
    // reported distances match a driver-side popcount of the 64-bit sigs
    val sig = Dedup.simhash64(docs, "doc_id", "text").as[(Long, Long)].collect().toMap
    pairs.foreach { case ((a, b), h) =>
      assert(java.lang.Long.bitCount(sig(a) ^ sig(b)) == h && h <= 3)
    }
    // doc 4 is unrelated to 1/2: if it ever pairs, pigeonhole found a real
    // ≤3-bit collision, which the assertion above already validated — but
    // with these texts the distance is far larger, so no pair exists
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((2L, 4L)))
  }

  test("portable simhash (d3c witness): sigs in [0, 2^32), pairs == brute force") {
    // signature range: 32 bits packed from md5 nibbles — always non-negative
    // and < 2^32, so the oracle's signed BIGINT arithmetic agrees
    val sigs = Dedup.simhashPortableSigs(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sigs.size == 5)
    sigs.values.foreach(s => assert(s >= 0L && s < (1L << 32), s))
    assert(sigs(1L) == sigs(2L)) // identical text, identical signature
    // equivalence property: banded pairs == brute-force Hamming <= 3 pairs
    // over the same signatures (completeness AND exactness of the witness)
    val got = Dedup.simhashPortableNearDup(docs, "doc_id", "text", maxDist = 3)
      .as[(Long, Long, Int)].collect().toSet
    val expect = (for {
      (a, sa) <- sigs.toSeq; (b, sb) <- sigs.toSeq if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
    assert(got.exists(_._3 == 0), "exact-dup pair should appear at distance 0")
  }

  test("portable simhash at 64 bits (d3d witness): sign-bit pack, pairs == brute force") {
    // 64-bit md5-nibble signatures: bit 63 lands on the BIGINT sign, so
    // signatures may be negative — the pack must still round-trip through
    // banding (arithmetic shift + mask) and xor/popcount identically.
    val sigs = Dedup.simhashPortableSigs(docs, "doc_id", "text", bits = 64)
      .as[(Long, Long)].collect().toMap
    assert(sigs.size == 5)
    assert(sigs(1L) == sigs(2L)) // identical text, identical signature
    val got = Dedup.simhashPortableNearDup64(docs, "doc_id", "text", maxDist = 3)
      .as[(Long, Long, Int)].collect().toSet
    val expect = (for {
      (a, sa) <- sigs.toSeq; (b, sb) <- sigs.toSeq if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
    assert(got.exists(_._3 == 0), "exact-dup pair should appear at distance 0")
  }

  test("pigeonhole banding is COMPLETE and EXACT for Hamming <= k on seeded 64-bit sigs") {
    // property (verdict item): pairs found by banding == brute-force pairs
    // with bit_count(sig_a ^ sig_b) <= maxDist. The corpus mixes random
    // signatures (far apart w.h.p.) with mutated copies at controlled
    // Hamming distances 0..6, so both sides of the boundary are populated.
    val rnd = new scala.util.Random(83)
    def flip(sig: Long, nBits: Int): Long = {
      var s = sig
      // distinct bit positions, including bit 63 (sign bit) sometimes
      rnd.shuffle((0 until 64).toList).take(nBits).foreach(b => s ^= (1L << b))
      s
    }
    val base = Vector.fill(40)(rnd.nextLong())
    val mutated = base.zipWithIndex.collect {
      case (s, i) if i % 2 == 0 => flip(s, i % 7) // distances 0,2,4,6,...
    }
    val sigs = (base ++ mutated).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    for (maxDist <- Seq(1, 3)) {
      val got = Dedup.simhashPairsFromSigs(
        sigs.toDF("doc_id", "simhash"), "doc_id", "simhash", maxDist, 64)
        .as[(Long, Long, Int)].collect().toSet
      val expect = (for {
        (a, sa) <- sigs; (b, sb) <- sigs if a < b
        h = java.lang.Long.bitCount(sa ^ sb) if h <= maxDist
      } yield (a, b, h)).toSet
      assert(got == expect, s"maxDist=$maxDist missing=${expect -- got} extra=${got -- expect}")
      assert(expect.nonEmpty, "test corpus produced no close pairs — weaken mutation")
    }
  }

  test("cross-frame banding is COMPLETE and EXACT for Hamming <= k (delta x corpus)") {
    // simhashCrossPairs: the incremental-gate shape — every (delta, corpus)
    // pair within maxDist found via band collisions only, none invented,
    // and NO a < b cut (the gate's semantics are directional)
    val rnd = new scala.util.Random(97)
    def flip(sig: Long, nBits: Int): Long = {
      var s = sig
      rnd.shuffle((0 until 64).toList).take(nBits).foreach(b => s ^= (1L << b))
      s
    }
    val corpus = Vector.fill(30)(rnd.nextLong()).zipWithIndex
      .map { case (s, i) => (100L + i, s) }
    // delta: mutations of corpus sigs at distances 0..6 plus fresh randoms
    val delta = corpus.take(14).zipWithIndex.map { case ((_, s), i) => (i.toLong, flip(s, i % 7)) } ++
      Vector.fill(10)(rnd.nextLong()).zipWithIndex.map { case (s, i) => (50L + i, s) }
    for (maxDist <- Seq(1, 3)) {
      val got = Dedup.simhashCrossPairs(
        delta.toDF("doc_id", "simhash"), corpus.toDF("doc_id", "simhash"),
        "doc_id", "simhash", maxDist, 64)
        .as[(Long, Long, Int)].collect().toSet
      val expect = (for {
        (a, sa) <- delta; (b, sb) <- corpus
        h = java.lang.Long.bitCount(sa ^ sb) if h <= maxDist
      } yield (a, b, h)).toSet
      assert(got == expect, s"maxDist=$maxDist missing=${expect -- got} extra=${got -- expect}")
      assert(expect.nonEmpty, "test corpus produced no close cross pairs — weaken mutation")
    }
  }

  private implicit class ToMap2[A, B, C](s: Array[(A, B, C)]) {
    def toMap2: Map[(A, B), C] = s.map(t => ((t._1, t._2), t._3)).toMap
  }

  test("ngram jaccard: blocking prevents cross-language pairs, threshold filters") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang", 0.05)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(pairs.contains(("en", 1L, 2L, 1.0)))
    assert(pairs.forall(_._1 == "en"))            // doc 5 alone in its block
    assert(!pairs.exists(p => p._2 == 4L || p._3 == 4L)) // unrelated text below threshold
  }

  test("portable minhash finds the same exact/near dup pairs as the xxhash path") {
    val pairs = Dedup.minhashLshPortable(docs, "doc_id", "text", 16, 8, 0.05)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.contains((1L, 2L, 1.0)))
    assert(pairs.exists { case (a, b, j) => a == 1L && b == 3L && j > 0.3 && j < 1.0 })
  }

  test("incremental gate: exact dup and near dup of the corpus dropped, fresh doc survives") {
    val corpus = docs.filter($"doc_id" <= 2) // holds the canonical text
    val delta = Seq(
      (10L, "the quick brown fox jumps over the lazy dog and runs away fast", "en"),  // exact
      (11L, "THE  quick brown fox jumps over the lazy dog and runs away fast", "en"), // exact mod normalization
      (12L, "the quick brown fox jumps over the lazy dog and walks away fast", "en"), // near
      (13L, "completely different content about spark distributed engines here", "en") // fresh
    ).toDF("doc_id", "text", "lang")
    val kept = Dedup.incrementalSurvivors(corpus, delta, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(13L), s"kept=$kept")
    // survivors against an unrelated corpus: everything passes
    val all = Dedup.incrementalSurvivors(docs.filter($"doc_id" === 5), delta,
      "doc_id", "text").count()
    assert(all == 4)
  }

  test("indexed gate matches the one-shot gate on the same corpus/delta") {
    val corpus = docs.filter($"doc_id" <= 3)
    val delta = docs.filter($"doc_id" >= 4)
      .union(Seq((6L, "the quick brown fox jumps over the lazy dog and runs away fast", "en"))
        .toDF("doc_id", "text", "lang"))
    val oneShot = Dedup.incrementalSurvivors(corpus, delta, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("idx_eq").toString
    Dedup.buildDedupIndex(corpus, "doc_id", "text", dir)
    val indexed = Dedup.incrementalSurvivorsIndexed(dir, delta, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(oneShot == indexed && indexed == Set(4L, 5L), s"oneShot=$oneShot indexed=$indexed")
  }

  test("compactDedupIndex: duplicate appends collapse to distinct rows, gate unchanged") {
    val corpus = docs.filter($"doc_id" <= 2)
    val dir = java.nio.file.Files.createTempDirectory("idx_cp").toString
    Dedup.buildDedupIndex(corpus, "doc_id", "text", dir)
    val admitted = Seq((40L, "totally novel sentence about columnar shuffles and page indexes"))
      .toDF("doc_id", "text")
    // simulate the crash window: the same batch appended twice
    Dedup.appendToDedupIndex(admitted, "doc_id", "text", dir)
    Dedup.appendToDedupIndex(admitted, "doc_id", "text", dir)
    val report = Dedup.compactDedupIndex(spark, dir)
    report.foreach { case (sub, (before, after)) =>
      assert(after < before, s"$sub: $before -> $after (no shrink)")
    }
    // the compacted index still gates: dup of the admitted doc dropped, fresh kept
    val survivors = Dedup.incrementalSurvivorsIndexed(dir,
      Seq((50L, "totally novel sentence about columnar shuffles and page indexes"),
        (51L, "and now for something completely different entirely"))
        .toDF("doc_id", "text"),
      "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(51L), survivors)
  }

  test("sentenceDedup: first occurrence kept in order, counts right, clean docs untouched") {
    val v = Seq(
      (1L, "A first. B second! A first. C third? B second."), // A,B dup once each
      (2L, "Only one sentence"),
      (3L, "Same. Same. Same.")                               // collapses to one
    ).toDF("doc_id", "text")
    val out = Dedup.sentenceDedup(v, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_sents", "n_kept", "cleaned")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 5L, 3L, "A first B second C third"), // original order preserved
      (2L, 1L, 1L, "Only one sentence"),
      (3L, 3L, 1L, "Same")))
  }

  test("minhash signatures: deterministic across runs") {
    val a = Dedup.minhashSignatures(docs, "doc_id", "text", 8).orderBy("doc_id").collect()
    val b = Dedup.minhashSignatures(docs, "doc_id", "text", 8).orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("edit-distance near-dup: exact dup at 0, one-word swap counted, far texts dropped") {
    val pairs = Dedup.editDistanceNearDup(docs, "doc_id", "text", "lang",
      lenWindow = 16, maxDist = 10)
      .as[(String, Long, Long, Int)].collect().toSeq
    assert(pairs.contains(("en", 1L, 2L, 0)))             // exact dup
    assert(pairs.exists { case (_, a, b, d) => a == 1L && b == 3L && d > 0 && d <= 10 })
    assert(!pairs.exists(p => p._2 == 4L || p._3 == 4L))  // unrelated text: dist > 10
    assert(pairs.forall(_._1 == "en"))                    // doc 5 blocked by lang
  }

  test("edit-distance near-dup: straddling a bucket boundary still pairs") {
    // lengths 20 and 24 with W=4 land in adjacent buckets (5 and 6) — the
    // two-bucket emission must still generate the candidate
    val v = Seq((1L, "aaaaaaaaaaaaaaaaaaaa", "x"), (2L, "aaaaaaaaaaaaaaaaaaaabbbb", "x"))
      .toDF("doc_id", "text", "lang")
    val pairs = Dedup.editDistanceNearDup(v, "doc_id", "text", "lang", 4, 4)
      .as[(String, Long, Long, Int)].collect().toSeq
    assert(pairs == Seq(("x", 1L, 2L, 4)))
  }

  test("connected components: chain and triangle collapse to min label; pairs once") {
    // components: {1,2,3} (chain via pairs), {7,8,9} (triangle), {4,6} —
    // chain 1-2, 2-3 needs propagation across two hops
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L), (8L, 9L), (7L, 9L), (4L, 6L))
      .toDF("a", "b")
    val comp = Dedup.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 7L, 4L -> 4L, 6L -> 4L))
  }

  test("connected components: long path converges (diameter > 2)") {
    val pairs = (1L until 8L).map(i => (i, i + 1)).toDF("a", "b")
    val comp = Dedup.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(comp.values.toSet == Set(1L) && comp.size == 8)
  }

  test("connected components: STRING ids converge across multiple hops") {
    // regression: convergence used sum(comp cast long), which is null for
    // string ids — labelSum stayed 0 and the loop declared convergence after
    // one round, mislabeling any component with diameter > 1. The chain
    // d1..d5 needs several propagation rounds to collapse to "d1".
    val pairs = Seq(("d1", "d2"), ("d2", "d3"), ("d3", "d4"), ("d4", "d5"),
      ("x1", "x2")).toDF("a", "b")
    val comp = Dedup.connectedComponents(pairs, "a", "b")
      .as[(String, String)].collect().toMap
    assert(comp == Map("d1" -> "d1", "d2" -> "d1", "d3" -> "d1",
      "d4" -> "d1", "d5" -> "d1", "x1" -> "x1", "x2" -> "x1"))
  }

  test("edit-distance near-dup rejects lenWindow=0 / negative maxDist") {
    intercept[IllegalArgumentException] {
      Dedup.editDistanceNearDup(docs, "doc_id", "text", "lang", 0, 3)
    }
    intercept[IllegalArgumentException] {
      Dedup.editDistanceNearDup(docs, "doc_id", "text", "lang", 4, -1)
    }
  }

  test("editDistanceVerify scores arbitrary candidate pairs, composing with other blockers") {
    // candidates from the n-gram inverted index (a corpus-scaled blocker),
    // verified with the bounded DP — the composed scale path of SURVEY §6.1
    val cands = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang", 0.05)
      .select("a", "b")
    val out = Dedup.editDistanceVerify(cands, docs, "doc_id", "text", "a", "b", 10)
      .as[(Long, Long, Int)].collect().toSeq
    assert(out.contains((1L, 2L, 0)))                                 // exact dup
    assert(out.exists { case (a, b, d) => a == 1L && b == 3L && d > 0 && d <= 10 })
    // a far pair fed in explicitly is dropped by the bound, not mis-scored
    val far = Seq((1L, 4L)).toDF("a", "b")
    assert(Dedup.editDistanceVerify(far, docs, "doc_id", "text", "a", "b", 10).isEmpty)
  }

  test("editDistanceNearDupBlocked (production lane): equals its composition, both band families") {
    // the round-14 default: MinHash blocking → bounded-DP verify. Pin it to
    // the explicit composition it packages, in BOTH band families, and to
    // the expected geometry (exact dup at 0, near dup small, far pair gone).
    // 32 perms / 16 bands = 2-row bands: enough collision probability for
    // the 1-3 near pair in BOTH hash families (the 16/8 xxhash layout misses
    // it on this 5-doc corpus — banding is probabilistic, and the existing
    // xxhash test uses 32/16 for the same reason)
    for (portable <- Seq(true, false)) {
      val composed = Dedup.editDistanceNearDupBlocked(docs, "doc_id", "text",
        maxDist = 10, numPerms = 32, bands = 16, candThreshold = 0.05,
        portable = portable)
        .orderBy("a", "b").as[(Long, Long, Int)].collect().toSeq
      val cands =
        if (portable) Dedup.minhashLshPortable(docs, "doc_id", "text", 32, 16, 0.05)
        else Dedup.minhashLsh(docs, "doc_id", "text", 32, 16, 0.05)
      val inline = Dedup.editDistanceVerify(cands, docs, "doc_id", "text", "a", "b", 10)
        .orderBy("a", "b").as[(Long, Long, Int)].collect().toSeq
      assert(composed == inline, s"portable=$portable: $composed != $inline")
      assert(composed.contains((1L, 2L, 0)), s"portable=$portable missing exact dup")
      assert(composed.exists { case (a, b, d) => a == 1L && b == 3L && d > 0 && d <= 10 },
        s"portable=$portable missing near dup")
      assert(!composed.exists { case (a, b, _) => b == 4L || a == 4L },
        s"portable=$portable paired the unrelated doc")
    }
  }

  test("editDistanceVerify strict mode fails fast on an id-space mismatch") {
    // default (lenient) mode: an unknown id silently drops out of the inner
    // join — the documented semantics; strict mode surfaces it instead of
    // letting a stale/mismatched candidate set read as "no near-dups"
    val phantom = Seq((1L, 999L)).toDF("a", "b")
    assert(Dedup.editDistanceVerify(phantom, docs, "doc_id", "text", "a", "b", 10).isEmpty)
    val e = intercept[IllegalArgumentException] {
      Dedup.editDistanceVerify(phantom, docs, "doc_id", "text", "a", "b", 10,
        strict = true).count()
    }
    assert(e.getMessage.contains("id-space mismatch"))
    // strict with a fully-matched pair set passes through unchanged
    val ok = Seq((1L, 2L)).toDF("a", "b")
    assert(Dedup.editDistanceVerify(ok, docs, "doc_id", "text", "a", "b", 10,
      strict = true).count() == 1)
  }

  test("connected components: diameter-60 path converges in logarithmic rounds, under default maxIter") {
    // the round-14 scale cliff: the old min-label propagation needed
    // O(diameter) rounds and hard-failed its maxIter=25 require on exactly
    // this shape (a templated-boilerplate dup chain). Large-star/small-star
    // must label the whole path in O(log n) alternating rounds.
    val pairs = (0L until 60L).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(pairs, "a", "b")
    val comp = labels.as[(Long, Long)].collect().toMap
    assert(comp.size == 61 && comp.values.toSet == Set(0L))
    assert(rounds <= 10, s"expected logarithmic rounds on a diameter-60 path, got $rounds")
  }

  test("connected components: self-pair-only node labels itself") {
    val pairs = Seq((1L, 2L), (9L, 9L)).toDF("a", "b")
    val comp = Dedup.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 9L -> 9L))
  }

  test("connected components: empty pair set yields empty labels") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.connectedComponents(empty, "a", "b").isEmpty)
  }

  test("connected components: star graph (one hub, 1e5 leaves) converges; salt spreads the hub") {
    // the boilerplate-template shape: one node carrying every edge. The
    // salted push must spread the hub's edge list across the salt buckets
    // (otherwise every propagation round re-runs a max-degree straggler).
    val n = 100000L
    val pairs = spark.range(1L, n + 1L)
      .select(lit(0L).as("a"), col("id").as("b"))
    val comp = Dedup.connectedComponents(pairs, "a", "b")
    assert(comp.count() == n + 1)
    assert(comp.filter(col("comp") =!= 0L).isEmpty)
    // the salting premise: the deterministic per-edge salt (hash of the far
    // endpoint, exactly as the push join computes it) splits the hub's 1e5
    // edges near-uniformly — no bucket carries more than 2x the even share
    val buckets = 16
    val dist = pairs
      .select(pmod(
        xxhash64(col("b")),
        lit(buckets)).as("salt"))
      .groupBy("salt").count().as[(Long, Long)].collect().toMap
    assert(dist.size == buckets, s"only ${dist.size}/$buckets salt buckets hit")
    assert(dist.values.max <= 2L * n / buckets,
      s"hot bucket ${dist.values.max} exceeds 2x even share ${2L * n / buckets}")
  }

  test("connected components: salted push is exactly the plain join (random graphs + union-find)") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 3) {
      val nodes = 60
      val edges = Seq.fill(90)((rnd.nextInt(nodes).toLong, rnd.nextInt(nodes).toLong))
        .filter { case (a, b) => a != b }
      val pairs = edges.toDF("a", "b")
      val salted = Dedup.connectedComponents(pairs, "a", "b")
        .as[(Long, Long)].collect().toMap
      val plain = Dedup.connectedComponents(pairs, "a", "b", saltBuckets = 1)
        .as[(Long, Long)].collect().toMap
      assert(salted == plain, s"trial $trial: salted != unsalted")
      // driver-side union-find oracle
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      for ((a, b) <- edges) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = parent.keys.map(k => k -> find(k)).toMap
      assert(salted == expect, s"trial $trial: disagrees with union-find")
    }
  }

  test("edit-distance blocking is COMPLETE when lenWindow >= maxDist (random corpus)") {
    // property: against a brute-force all-pairs reference, the blocked
    // operator must report exactly the pairs with dist <= maxDist, because
    // dist >= |len diff| and the two-bucket emission covers |len diff| <= W
    val rnd = new scala.util.Random(29)
    val alpha = "abcd"
    def doc(): String =
      Seq.fill(6 + rnd.nextInt(30))(alpha(rnd.nextInt(alpha.length))).mkString
    val corpus = (1L to 60L).map { i =>
      val base = doc()
      // half the docs are mutations of an earlier doc -> plenty of near pairs
      (i, if (i % 2 == 0 && i > 1) base.patch(rnd.nextInt(base.length), "xy", rnd.nextInt(3)) else base, "x")
    }
    val maxDist = 8
    val df = corpus.toDF("doc_id", "text", "lang")
    val got = Dedup.editDistanceNearDup(df, "doc_id", "text", "lang",
      lenWindow = maxDist, maxDist = maxDist)
      .select("a", "b", "dist").as[(Long, Long, Int)].collect().toSet
    def lev(s: String, t: String): Int = {
      val dp = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to s.length; j <- 1 to t.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      dp(s.length)(t.length)
    }
    val expect = (for {
      (a, ta, _) <- corpus; (b, tb, _) <- corpus if a < b
      d = lev(ta, tb) if d <= maxDist
    } yield (a, b, d)).toSet
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
  }

  test("crossDocSentenceDedup: boilerplate survives only in the earliest doc, rebuild ordered") {
    val corpus = Seq(
      (1L, "Welcome to our site. Unique alpha content here. Welcome to our site."),
      (2L, "Welcome to our site. Unique beta content instead."),
      (3L, "Totally original document. Unique beta content instead."),
      (4L, "Welcome to our site.") // pure boilerplate → keeps nothing
    ).toDF("doc_id", "text")
    val out = Dedup.crossDocSentenceDedup(corpus, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_sents", "n_kept", "cleaned")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      // doc 1: 3 sentences, within-doc repeat collapses AND it owns both
      (1L, 3L, 2L, "Welcome to our site Unique alpha content here"),
      // doc 2: loses the boilerplate to doc 1, owns "Unique beta content instead"
      (2L, 2L, 1L, "Unique beta content instead"),
      // doc 3: loses "Unique beta..." to doc 2, keeps its original sentence
      (3L, 2L, 1L, "Totally original document"),
      // doc 4: everything owned elsewhere — kept row with empty rebuild
      (4L, 1L, 0L, "")))
  }

  test("connectedComponentsIncremental: merges old components, labels new ids, keeps untouched") {
    val old = Dedup.connectedComponents(
      Seq((1L, 2L), (10L, 11L), (20L, 21L)).toDF("a", "b"), "a", "b")
    // delta bridges comps 1 and 10, attaches new id 30 to comp 20's member,
    // and introduces a fresh isolated pair (40, 41)
    val out = Dedup.connectedComponentsIncremental(old,
        Seq((2L, 10L), (21L, 30L), (40L, 41L)).toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L,
      20L -> 20L, 21L -> 20L, 30L -> 20L, 40L -> 40L, 41L -> 40L))
  }

  test("connectedComponentsIncremental == batch CC on a random graph, chained batches") {
    val rnd = new scala.util.Random(73)
    val edges = (0 until 120).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val batch = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toSet
    val slices = edges.grouped(40).toSeq
    var labels = Dedup.connectedComponents(slices.head.toDF("a", "b"), "a", "b")
    for (s <- slices.tail)
      labels = Dedup.connectedComponentsIncremental(labels, s.toDF("a", "b"), "a", "b")
    assert(labels.as[(Long, Long)].collect().toSet == batch)
  }

  test("dupSpanStats: window counts match a driver-side slide, short docs drop") {
    // doc 1 and 2 share an 11-token verbatim run (→ two shared 10-windows
    // each); doc 3 repeats a span within itself; doc 4 is fresh; doc 5 is
    // under 10 tokens and must emit no row
    val shared = "one two three four five six seven eight nine ten eleven"
    val corpus = Seq(
      (1L, s"$shared unique tail alpha"),
      (2L, s"prefix beta $shared"),
      (3L, "a b c d e f g h i j a b c d e f g h i j"),
      (4L, "fresh words entirely distinct from any other document in corpus"),
      (5L, "too short")
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanStats(corpus, "doc_id", "text", window = 10)
      .orderBy("doc_id")
      .select("doc_id", "n_windows", "n_dup").as[(Long, Long, Long)].collect().toSeq
    // driver-side slide over the same tokenizer arithmetic
    def toks(t: String) = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val wins = corpus.as[(Long, String)].collect().toSeq.flatMap { case (id, t) =>
      val tk = toks(t)
      if (tk.length < 10) Seq.empty
      else (0 to tk.length - 10).map(i => (id, tk.slice(i, i + 10).mkString(" ")))
    }
    val global = wins.groupBy(_._2).view.mapValues(_.size).toMap
    val expect = wins.groupBy(_._1).map { case (id, ws) =>
      (id, ws.size.toLong, ws.count(w => global(w._2) >= 2).toLong)
    }.toSeq.sortBy(_._1)
    assert(got == expect, s"got=$got expect=$expect")
    assert(!got.exists(_._1 == 5L))
    assert(got.find(_._1 == 3L).get._3 > 0) // within-doc repeat counts as dup
    assert(got.find(_._1 == 4L).get._3 == 0)
  }

  test("contaminationPairsBloom == contaminationPairs at any fpp (no false negatives)") {
    // a corpus with one heavy contamination, one single-shingle overlap
    // (below minShared), and clean docs — the Bloom lane must return the
    // exact broadcast-join result even at an absurd 0.5 fpp, because false
    // positives die in the verify join and false negatives cannot happen
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta different tail entirely here"),
      (3L, "nothing in common with anything else at all whatsoever truly"),
      (4L, "one shared alpha beta gamma only and then unrelated words follow"),
      (97L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // eval
      (194L, "completely disjoint evaluation document with unique tokens")  // eval
    ).toDF("doc_id", "text")
    val train = corpus.filter($"doc_id" % 97 =!= 0)
    val evalDocs = corpus.filter($"doc_id" % 97 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("train_id", "eval_id")
        .as[(Long, Long, Long)].collect().toSeq
    val exact = rows(Dedup.contaminationPairs(train, evalDocs, "doc_id", "text", 2))
    assert(exact.nonEmpty && exact.forall(_._2 == 97L))
    for (fpp <- Seq(0.5, 0.01))
      assert(rows(Dedup.contaminationPairsBloom(train, evalDocs, "doc_id", "text",
        minShared = 2, fpp = fpp)) == exact, s"fpp=$fpp diverged")
  }

  test("removeDupSpans: first occurrence kept, others cut; overlapping spans union; short docs untouched") {
    val docs = Seq(
      (1L, "a b c d e f"),          // canonical holder of span (a b c)
      (2L, "x a b c y z"),          // non-canonical (a b c) at pos 2 -> cut 2-4
      (3L, "a b c a b c a b c"),    // every window duplicated -> fully erased
      (4L, "p q r"),                // unique window -> untouched
      (5L, "hi")                    // shorter than window -> no windows, untouched
    ).toDF("doc_id", "text")
    val got = Dedup.removeDupSpans(docs, "doc_id", "text", window = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 6L, 6L, 0L, "a b c d e f"),
      (2L, 6L, 3L, 3L, "x y z"),
      (3L, 9L, 0L, 9L, ""),
      (4L, 3L, 3L, 0L, "p q r"),
      (5L, 1L, 1L, 0L, "hi")))
  }

  test("incremental span removal: chained batches == whole-corpus on cross-batch dups") {
    // batch boundaries split duplicate-span families every way that
    // matters: canonical in batch 1 with copies in batches 2 and 3
    // ("a b c"), a span duplicated WITHIN a later batch only ("u v w"),
    // and a batch-3 copy of a batch-2-introduced span ("m n o")
    val b1 = Seq((1L, "a b c d e f"), (2L, "p q r")).toDF("doc_id", "text")
    val b2 = Seq((3L, "x a b c y z"), (4L, "m n o k l j")).toDF("doc_id", "text")
    val b3 = Seq((5L, "u v w h u v w g u v w"), (6L, "t m n o s")).toDF("doc_id", "text")
    val whole = Dedup.removeDupSpans(b1.unionAll(b2).unionAll(b3), "doc_id", "text", window = 3)
      .orderBy("doc_id").as[(Long, Long, Long, Long, String)].collect().toSeq
    val idx1 = Dedup.spanIndexFrame(b1, "doc_id", "text", window = 3)
    val out2 = Dedup.removeDupSpansIncremental(idx1, b2, "doc_id", "text", window = 3)
    val idx2 = idx1.unionAll(Dedup.spanIndexFrame(b2, "doc_id", "text", window = 3))
    val out3 = Dedup.removeDupSpansIncremental(idx2, b3, "doc_id", "text", window = 3)
    val chained = Dedup.removeDupSpans(b1, "doc_id", "text", window = 3)
      .unionAll(out2).unionAll(out3)
      .orderBy("doc_id").as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(chained == whole)
    // sanity on the fixture's intent: doc 3 lost its copy of (a b c),
    // doc 6 lost its copy of (m n o), doc 5 kept only the first (u v w)
    assert(whole.find(_._1 == 3L).get._5 == "x y z")
    assert(whole.find(_._1 == 6L).get._5 == "t s")
    assert(whole.find(_._1 == 5L).get._5 == "u v w h g")
  }

  test("incremental span removal: persisted index round-trip + replay idempotency via excludeIds") {
    val dir = java.nio.file.Files.createTempDirectory("span_idx").toString
    val b1 = Seq((1L, "a b c d e f"), (2L, "p q r")).toDF("doc_id", "text")
    val b2 = Seq((3L, "x a b c y z"), (4L, "m n o k l j m n o")).toDF("doc_id", "text")
    Dedup.buildSpanIndex(b1, "doc_id", "text", dir, window = 3)
    val fromDisk = Dedup.removeDupSpansIncrementalIndexed(dir, b2, "doc_id", "text", window = 3)
      .orderBy("doc_id").as[(Long, Long, Long, Long, String)].collect().toSeq
    val inline = Dedup.removeDupSpansIncremental(
        Dedup.spanIndexFrame(b1, "doc_id", "text", window = 3), b2, "doc_id", "text", window = 3)
      .orderBy("doc_id").as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(fromDisk == inline)
    // crash-replay: b2's spans were already appended by a failed attempt;
    // excluding the delta's own ids must reproduce the identical output
    Dedup.appendToSpanIndex(b2, "doc_id", "text", dir, window = 3)
    val replay = Dedup.removeDupSpansIncrementalIndexed(dir, b2, "doc_id", "text", window = 3,
        excludeIds = Some(b2.select("doc_id")))
      .orderBy("doc_id").as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(replay == inline)
    // and WITHOUT exclusion the delta is cut by its own index entries —
    // the failure mode the parameter exists to prevent
    val unexcluded = Dedup.removeDupSpansIncrementalIndexed(dir, b2, "doc_id", "text", window = 3)
      .orderBy("doc_id").as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(unexcluded.find(_._1 == 3L).get._5 == "") // every span self-matched → erased
  }

  test("contaminationFractions: hand-computed overlap, no double count from repeated train shingles, shingle-less eval absent") {
    val train = Seq(
      (1L, "a b c d e f"),          // shingles: "a b c","b c d","c d e","d e f"
      (2L, "a b c d e f"),          // the SAME shingles again — semi join must not double count
      (3L, "x y z w v u")
    ).toDF("doc_id", "text")
    val evalDocs = Seq(
      (10L, "a b c d q r"),         // 4 shingles: "a b c","b c d","c d q","d q r" -> 2 matched
      (11L, "p q"),                 // < 3 tokens: no shingles -> absent from output
      (12L, "m n o p q r")          // 4 shingles, 0 matched
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationFractions(train, evalDocs, "doc_id", "text", threshold = 0.5)
      .orderBy("eval_id")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      (10L, 4L, 2L, 0.5, true),
      (12L, 4L, 0L, 0.0, false)))
  }

  test("incremental contamination: chained batches == one-shot audit; replay appends are harmless; empty state reads clean") {
    val train = Seq(
      (1L, "a b c d e f"),
      (2L, "g h i j k l"),
      (3L, "x y z w v u")
    ).toDF("doc_id", "text")
    val evalDocs = Seq(
      (10L, "a b c d q r"),         // matches batch {1}
      (12L, "g h i m n o"),         // matches batch {2}
      (13L, "m n o p q r")          // matches nothing
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("cont_idx").toString
    Dedup.buildContaminationIndex(evalDocs, "doc_id", "text", dir)
    def verdicts() = Dedup.contaminationVerdictsIndexed(spark, dir, threshold = 0.25)
      .orderBy("eval_id").as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    // before any batch: totals present, zero matched, nothing contaminated
    assert(verdicts() == Seq(
      (10L, 4L, 0L, 0.0, false), (12L, 4L, 0L, 0.0, false), (13L, 4L, 0L, 0.0, false)))
    // probe batch 1 then batch 2: final verdicts == the one-shot audit
    Dedup.contaminationGateBatch(dir, train.filter($"doc_id" <= 1), "doc_id", "text")
    Dedup.contaminationGateBatch(dir, train.filter($"doc_id" > 1), "doc_id", "text")
    val oneShot = Dedup.contaminationFractions(train, evalDocs, "doc_id", "text",
      threshold = 0.25).orderBy("eval_id")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(verdicts() == oneShot)
    // an at-least-once REPLAY of batch 2 appends duplicate pairs; the
    // distinct-count verdict pass must be unchanged — no marker protocol
    Dedup.contaminationGateBatch(dir, train.filter($"doc_id" > 1), "doc_id", "text")
    assert(verdicts() == oneShot)
    // rebuild clears accumulated matched state
    Dedup.buildContaminationIndex(evalDocs, "doc_id", "text", dir)
    assert(verdicts().forall(_._3 == 0L))
  }
}
