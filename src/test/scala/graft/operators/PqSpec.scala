package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PqSpec extends SparkSpec {
  import spark.implicits._

  /** The SimilaritySpec clustered geometry: 8 Gaussian direction clusters in
    * 16 dims — separable enough that recall gates have margin, noisy enough
    * that PQ actually has quantization work to do.
    */
  private def clusteredCorpus(seed: Int, n: Int = 400, dims: Int = 16) = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(8)(Array.fill(dims)(rnd.nextGaussian().toFloat))
    (0 until n).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => x + rnd.nextGaussian().toFloat * 0.15f))
    }.toDF("vec_id", "embedding")
  }

  test("train: deterministic, full m x ksub x subDim shape") {
    val corpus = clusteredCorpus(31)
    val m1 = Pq.train(corpus, m = 4, ksub = 8, sampleSize = 400, iters = 6)
    val m2 = Pq.train(corpus, m = 4, ksub = 8, sampleSize = 400, iters = 6)
    assert(m1.m == 4 && m1.ksub == 8 && m1.subDim == 4)
    assert(m1.books.flatten.map(_.toSeq).toSeq ==
      m2.books.flatten.map(_.toSeq).toSeq) // run-to-run deterministic
  }

  test("PqModel round-trips through its persisted frame exactly") {
    val model = Pq.train(clusteredCorpus(37), m = 4, ksub = 8,
      sampleSize = 400, iters = 4)
    val back = Pq.PqModel.fromDF(model.toDF(spark))
    assert(back.m == model.m && back.ksub == model.ksub &&
      back.subDim == model.subDim)
    assert(back.books.flatten.map(_.toSeq).toSeq ==
      model.books.flatten.map(_.toSeq).toSeq)
  }

  test("encodeCol: engine codes equal the driver-side argmin, smaller code wins ties") {
    val corpus = clusteredCorpus(41, n = 120)
    val model = Pq.train(corpus, m = 4, ksub = 8, sampleSize = 120, iters = 6)
    val got = corpus
      .withColumn("codes", Pq.encodeCol(col("embedding"), model))
      .select("vec_id", "embedding", "codes")
      .as[(Long, Array[Float], Array[Int])].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, emb, codes) =>
      assert(codes.length == model.m, s"vec $id: ${codes.length} codes")
      // replicate the expression's exact arithmetic: float->double products
      // accumulated left to right, score = dot/||x|| - 0.5*||c||^2, argmax
      // with ties to the smaller code
      val nrmSqrt = math.sqrt(emb.map(x => x.toDouble * x.toDouble).sum)
      for (s <- 0 until model.m) {
        val sub = emb.slice(s * model.subDim, (s + 1) * model.subDim)
        val scores = (0 until model.ksub).map { c =>
          val book = model.books(s)(c)
          val d = sub.zip(book).map { case (x, y) => x.toDouble * y.toDouble }.sum
          d / nrmSqrt - 0.5 * book.map(x => x.toDouble * x.toDouble).sum
        }
        val best = scores.zipWithIndex.maxBy { case (sc, c) => (sc, -c) }._2
        assert(codes(s) == best, s"vec $id sub $s: got ${codes(s)}, want $best")
      }
    }
  }

  test("encodeCol: zero-norm vector gets code 0 in every subspace") {
    val model = Pq.train(clusteredCorpus(43), m = 4, ksub = 8,
      sampleSize = 400, iters = 4)
    val z = Seq((0L, Array.fill(16)(0.0f))).toDF("vec_id", "embedding")
    val codes = z
      .withColumn("codes", Pq.encodeCol(col("embedding"), model))
      .select("codes").as[Array[Int]].head()
    assert(codes.toSeq == Seq.fill(4)(0))
  }

  test("ADC score: sums the per-subspace table entries for the assigned codes") {
    val corpus = clusteredCorpus(47, n = 60)
    val model = Pq.train(corpus, m = 4, ksub = 8, sampleSize = 60, iters = 6)
    // score every corpus vector against one query; check ADC == the sum of
    // the driver-computed table lookups (the expression's own arithmetic)
    val q = corpus.filter($"vec_id" === 0)
      .select(col("embedding")).as[Array[Float]].head()
    val qn = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
    val tables = (0 until model.m).map { s =>
      val sub = q.slice(s * model.subDim, (s + 1) * model.subDim)
      (0 until model.ksub).map { c =>
        sub.zip(model.books(s)(c)).map { case (x, y) => x.toDouble * y.toDouble }.sum / qn
      }
    }
    val rows = corpus
      .withColumn("codes", Pq.encodeCol(col("embedding"), model))
      .withColumn("tables", Pq.adcTablesCol(typedLit(q), model))
      .withColumn("adc", Pq.adcScoreCol(col("codes"), col("tables")))
      .select("codes", "adc").as[(Array[Int], Double)].collect()
    rows.foreach { case (codes, adc) =>
      val want = codes.zipWithIndex.map { case (c, s) => tables(s)(c) }.sum
      assert(math.abs(adc - want) < 1e-12, s"adc=$adc want=$want")
    }
  }

  test("native ADC score == composed aggregate(zip_with) bit-for-bit, incl. null contract") {
    import org.apache.spark.sql.functions._
    // random (codes, tables) rows at the production 16x256 shape, plus the
    // null/mismatch edge cases the composed HOF form defined the contract for
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val codes = Array.fill(16)(rnd.nextInt(256))
      val tables = Array.fill(16)(Array.fill(256)(rnd.nextDouble() * 2 - 1))
      (i.toLong, codes, tables)
    }
    val df = rows.toDF("id", "codes", "tables").localCheckpoint()
    val composed = aggregate(
      zip_with(col("codes"), col("tables"), (cd, tb) => element_at(tb, cd + 1)),
      lit(0.0), (acc, v) => acc + v)
    val got = df
      .select(col("id"), Pq.adcScoreCol(col("codes"), col("tables")).as("native"),
        composed.as("hof"))
      .as[(Long, Double, Double)].collect()
    assert(got.length == 200)
    // bit-identical, not approximately equal: same operands, same order
    got.foreach { case (id, n, h) =>
      assert(java.lang.Double.doubleToRawLongBits(n)
        == java.lang.Double.doubleToRawLongBits(h), s"id=$id native=$n hof=$h")
    }
    // null arrays -> null result (both forms)
    val nulls = Seq((1L, null: Array[Int], Array(Array(0.5)))).toDF("id", "codes", "tables")
    assert(nulls.select(Pq.adcScoreCol(col("codes"), col("tables"))).head().isNullAt(0))
    // mismatched lengths -> null (the zip_with-pads-then-element_at(null) path)
    val mism = Seq((1L, Array(0, 1), Array(Array(0.5)))).toDF("id", "codes", "tables")
    assert(mism.select(Pq.adcScoreCol(col("codes"), col("tables"))).head().isNullAt(0))
    // out-of-range code -> null, NOT an adjacent-memory read (codes written
    // under a larger-ksub model than the tables; element_at parity)
    for (bad <- Seq(Array(2, 0), Array(-1, 0))) {
      val oob = Seq((1L, bad, Array(Array(0.5, 0.6), Array(0.7, 0.8))))
        .toDF("id", "codes", "tables")
      assert(oob.select(Pq.adcScoreCol(col("codes"), col("tables"))).head().isNullAt(0),
        s"code ${bad.head} must yield null")
    }
  }

  test("ADC candidate scoring stays inside whole-stage codegen (the reason PqAdcScore exists)") {
    import org.apache.spark.sql.functions._
    val corpus = clusteredCorpus(83, n = 256, dims = 64)
    val model = Pq.train(corpus, m = 16, ksub = 256, sampleSize = 256, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("pqadc").toString
    corpus.withColumn("codes", Pq.encodeCol(col("embedding"), model))
      .select("vec_id", "codes").write.parquet(s"$dir/codes")
    val q = corpus.filter($"vec_id" === 0)
      .select(col("embedding")).as[Array[Float]].head()
    val df = spark.read.parquet(s"$dir/codes")
      .withColumn("tables", Pq.adcTablesCol(typedLit(q), model))
      .select(col("vec_id"), Pq.adcScoreCol(col("codes"), col("tables")).as("approx"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen stage in:\n$plan")
    assert(df.count() == 256)
  }

  test("IVF-PQ recall gate: recall@5 >= 0.8 on the clustered seeded corpus") {
    // the e2h discipline for the compressed lane: ADC shortlist + exact
    // re-rank must hold the same floor the raw IVF lane holds
    val corpus = clusteredCorpus(23)
    val queries = corpus.filter($"vec_id" < 24)
    val exact = Similarity.bruteForceTopK(queries, corpus, 5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val approx = Pq.ivfPqTopKWithCentroids(queries, corpus,
      Similarity.kmeansCentroids(corpus, nCells = 8, sampleSize = 400, iters = 8),
      Pq.train(corpus, m = 8, ksub = 16, sampleSize = 400, iters = 8),
      5, nProbe = 2, rerankFactor = 8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF-PQ recall@5 = $recall")
  }

  test("ivfPqTopKIndexed == inline IVF-PQ; PQ extent is smaller on disk than raw") {
    val corpus = clusteredCorpus(29)
    val queries = corpus.filter($"vec_id" < 24)
    val cents = Similarity.kmeansCentroids(corpus, nCells = 8, sampleSize = 400, iters = 8)
    val model = Pq.train(corpus, m = 4, ksub = 16, sampleSize = 400, iters = 8)
    val dir = java.nio.file.Files.createTempDirectory("pqidx").toString
    Pq.buildPqIndex(corpus, cents, model, dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("a_id", "rn").as[(Long, Int, Long, Double)].collect().toSeq
    val inline = rows(Pq.ivfPqTopKWithCentroids(queries, corpus, cents, model,
      5, nProbe = 2, rerankFactor = 4))
    val indexed = rows(Pq.ivfPqTopKIndexed(dir, queries, 5, nProbe = 2,
      rerankFactor = 4))
    assert(indexed == inline && inline.nonEmpty)
    // the compression claim, measured: the codes extent (the one ADC scans)
    // must be materially smaller than the raw assigned extent
    def bytes(sub: String): Long = {
      val d = new java.io.File(s"$dir/$sub")
      d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    val raw = bytes("assigned"); val pq = bytes("codes")
    assert(pq > 0 && raw > 0 && pq * 2 < raw,
      s"PQ extent not smaller: codes=$pq raw=$raw")
  }

  test("index appends keep the PQ extent coherent; search sees appended vectors") {
    // the one-index-many-consumers contract: appendToSemanticIndex must
    // extend `codes` alongside `assigned` whenever a PQ extent exists —
    // otherwise every append silently shrinks the compressed search corpus
    val corpus = clusteredCorpus(59)
    val base = corpus.filter($"vec_id" < 300)
    val extra = corpus.filter($"vec_id" >= 300).select("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(base, nCells = 8, sampleSize = 300, iters = 8)
    val model = Pq.train(base, m = 4, ksub = 16, sampleSize = 300, iters = 8)
    val dir = java.nio.file.Files.createTempDirectory("pqappend").toString
    Pq.buildPqIndex(base, cents, model, dir)
    Similarity.appendToSemanticIndex(extra, dir)
    assert(spark.read.parquet(s"$dir/codes").count() ==
      spark.read.parquet(s"$dir/assigned").count())
    // a query whose true nearest neighbors are appended vectors must find
    // them through the compressed lane
    val queries = corpus.filter($"vec_id" >= 396).select("vec_id", "embedding")
    val hits = Pq.ivfPqTopKIndexed(dir, queries, 5, nProbe = 8, rerankFactor = 8)
      .filter($"b_id" >= 300).count()
    assert(hits > 0, "appended vectors invisible to the PQ lane")
    // and the indexed result equals inline over the full corpus
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("a_id", "rn").as[(Long, Int, Long, Double)].collect().toSeq
    assert(rows(Pq.ivfPqTopKIndexed(dir, queries, 5, nProbe = 2, rerankFactor = 4)) ==
      rows(Pq.ivfPqTopKWithCentroids(queries, corpus, cents, model, 5,
        nProbe = 2, rerankFactor = 4)))
  }

  test("compactSemanticIndex also compacts the codes extent exactly-distinct") {
    val corpus = clusteredCorpus(61, n = 100)
    val cents = Similarity.kmeansCentroids(corpus, nCells = 4, sampleSize = 100, iters = 4)
    val model = Pq.train(corpus, m = 4, ksub = 8, sampleSize = 100, iters = 4)
    val dir = java.nio.file.Files.createTempDirectory("pqcompact").toString
    Pq.buildPqIndex(corpus.filter($"vec_id" < 80), cents, model, dir)
    val extra = corpus.filter($"vec_id" >= 80).select("vec_id", "embedding")
    Similarity.appendToSemanticIndex(extra, dir) // committed append
    Similarity.appendToSemanticIndex(extra, dir) // crash-window duplicate
    assert(spark.read.parquet(s"$dir/codes").count() == 120)
    Similarity.compactSemanticIndex(spark, dir)
    assert(spark.read.parquet(s"$dir/codes").count() == 100)
    assert(spark.read.parquet(s"$dir/assigned").count() == 100)
  }

  test("rebuilding the semantic index wipes a stale PQ extent") {
    // buildSemanticIndex over a NEW corpus must not leave codes encoded
    // from the old one — the compressed search fails loudly (missing
    // extent) until addPqExtent is re-run
    val corpus = clusteredCorpus(67, n = 100)
    val cents = Similarity.kmeansCentroids(corpus, nCells = 4, sampleSize = 100, iters = 4)
    val model = Pq.train(corpus, m = 4, ksub = 8, sampleSize = 100, iters = 4)
    val dir = java.nio.file.Files.createTempDirectory("pqwipe").toString
    Pq.buildPqIndex(corpus, cents, model, dir)
    assert(new java.io.File(s"$dir/codes").exists())
    Similarity.buildSemanticIndex(corpus.filter($"vec_id" < 50), cents, dir)
    assert(!new java.io.File(s"$dir/codes").exists() &&
      !new java.io.File(s"$dir/codebooks").exists())
  }

  test("encodeCol stays inside whole-stage codegen at production (m, ksub)") {
    // the reason PqEncode exists: the composed struct-argmax form blew
    // Janino's 64 KB method limit at 8x16 and dropped the stage to
    // interpreted eval. The native expression must keep a parquet-backed
    // encode inside a codegen stage even at the 16x256 production shape.
    val corpus = clusteredCorpus(71, n = 256, dims = 64)
    val model = Pq.train(corpus, m = 16, ksub = 256, sampleSize = 256, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("pqcg").toString
    corpus.write.parquet(s"$dir/t")
    val df = spark.read.parquet(s"$dir/t")
      .select(col("vec_id"), Pq.encodeCol(col("embedding"), model).as("codes"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen stage in:\n$plan")
    assert(df.count() == 256)
  }

  test("rebuilding the PQ index overwrites both extents (rerun-safe)") {
    val corpus = clusteredCorpus(53, n = 100)
    val cents = Similarity.kmeansCentroids(corpus, nCells = 4, sampleSize = 100, iters = 4)
    val model = Pq.train(corpus, m = 4, ksub = 8, sampleSize = 100, iters = 4)
    val dir = java.nio.file.Files.createTempDirectory("pqidx2").toString
    Pq.buildPqIndex(corpus, cents, model, dir)
    val n1 = spark.read.parquet(s"$dir/codes").count()
    Pq.buildPqIndex(corpus, cents, model, dir) // rerun: no duplication
    val n2 = spark.read.parquet(s"$dir/codes").count()
    assert(n1 == 100 && n2 == 100)
  }
}
