package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Product quantization (PQ) for the persisted ANN index — the compressed
  * lane next to [[Similarity.ivfTopKIndexed]]'s raw-float search (Jégou,
  * Douze, Schmid 2011, "Product Quantization for Nearest Neighbor Search").
  *
  * Why: at 100 TB the float32 `assigned` extent dominates index storage and,
  * worse, every ANN probe ships raw `dims × 4` bytes per candidate through
  * the scoring join. PQ splits each L2-normalized vector into `m` subvectors
  * and stores one codebook id per subspace — `m` small ints instead of
  * `dims` floats (64-dim float32 → 8 codes: ~16-30x smaller scan) — and
  * scores candidates with asymmetric distance computation (ADC): the query
  * precomputes `m × ksub` subspace dot tables once, then every candidate
  * costs `m` table lookups instead of a `dims`-wide dot. Exactness is
  * restored where it matters: the ADC shortlist (top `k·rerankFactor` per
  * query) re-ranks with the exact cosine against the raw extent — only
  * |queries|·k·rerankFactor raw rows are ever touched per batch.
  *
  * Cosine contract: corpus and query vectors are L2-normalized before
  * encoding/table building, so subspace dots sum to the full cosine
  * (dot(q̂, x̂) = Σ_s dot(q̂_s, x̂_s)) and ADC approximates cosine directly.
  *
  * Determinism: the training sample (xxhash64 order), codebook init (first
  * `ksub` sample subvectors), Lloyd iteration order, encoding tie-breaks
  * (smaller code wins), and ADC arithmetic are all functions of the data
  * alone — same discipline as [[Similarity.kmeansCentroids]].
  */
object Pq {

  /** Driver-side codebook set: `books(sub)(code)` is the centroid subvector
    * of subspace `sub` for `code`. Size m·ksub·subDim floats — e.g.
    * 8·16·8 = 1024 floats — broadcast-bounded by construction regardless of
    * corpus size (the trainer's sample is capped, not the corpus).
    */
  final case class PqModel(m: Int, subDim: Int, ksub: Int,
                           books: Array[Array[Array[Float]]]) {
    require(books.length == m && books.forall(_.length == ksub) &&
      books.forall(_.forall(_.length == subDim)), "inconsistent codebook shape")
    def dims: Int = m * subDim

    /** Long-form frame (sub, code, cvec) — the persisted index layout. */
    def toDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      (for { s <- 0 until m; c <- 0 until ksub }
        yield (s, c, books(s)(c).toSeq)).toDF("sub", "code", "cvec")
    }
  }

  object PqModel {
    /** Rebuild from the persisted (sub, code, cvec) frame. The collect is
      * m·ksub rows — the codebook IS driver-scale state by design.
      */
    def fromDF(df: DataFrame): PqModel = {
      val rows = df.select(col("sub").cast("int"), col("code").cast("int"),
          col("cvec")).collect()
      require(rows.nonEmpty, "PqModel.fromDF: empty codebook frame")
      val m = rows.map(_.getInt(0)).max + 1
      val ksub = rows.map(_.getInt(1)).max + 1
      require(rows.length == m * ksub,
        s"PqModel.fromDF: ${rows.length} rows != $m x $ksub")
      val books = Array.ofDim[Array[Float]](m, ksub)
      rows.foreach { r =>
        books(r.getInt(0))(r.getInt(1)) = r.getSeq[Float](2).toArray
      }
      PqModel(m, books(0)(0).length, ksub, books.map(_.toArray))
    }
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0.0) v else v.map(_ / n)
  }

  /** Train PQ codebooks: deterministic sample (first `sampleSize` rows in
    * xxhash64(vec_id) order — a per-partition TakeOrdered, one linear scan,
    * no full shuffle, so sampling cost is corpus-scan-bounded at any N),
    * L2-normalize, split into `m` subvectors, and run plain L2 Lloyd per
    * subspace on the driver over the ≤ sampleSize × dims sample. Init is
    * the first `ksub` sample subvectors; empty cells keep their previous
    * centroid — the [[Similarity.kmeansCentroids]] contract, applied per
    * subspace. The codebooks are m·ksub·subDim floats total — the trainer's
    * driver footprint never grows with the corpus.
    */
  def train(corpus: DataFrame, m: Int = 8, ksub: Int = 16,
            sampleSize: Int = 2048, iters: Int = 8): PqModel = {
    require(m >= 1 && ksub >= 1 && sampleSize >= ksub && iters >= 0,
      s"m=$m ksub=$ksub sampleSize=$sampleSize iters=$iters")
    val sample: Array[Array[Double]] = corpus
      .select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(sampleSize)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "Pq.train: empty corpus")
    val dims = sample.head.length
    require(dims % m == 0, s"Pq.train: dims=$dims not divisible by m=$m")
    val subDim = dims / m
    val pts = sample.map(normalize)
    val books = Array.tabulate(m) { s =>
      val subs = pts.map(_.slice(s * subDim, (s + 1) * subDim))
      val k = math.min(ksub, subs.length)
      var cents: Array[Array[Double]] = subs.take(k).map(_.clone())
      // The argmin scan is iters·|subs|·k·subDim mult-adds (268M at c8's
      // 8·2048·256·4·16-subspace budget) and dominated wall, not the Spark
      // side — flatten the codebook into ONE row-major array (no per-access
      // double indirection) and early-exit the accumulation: d is a sum of
      // squares, monotone nondecreasing in i, so breaking at d >= bestD
      // skips work without ever changing the argmin or any tie outcome.
      val flat = new Array[Double](k * subDim)
      for (_ <- 0 until iters) {
        var c = 0
        while (c < k) {
          System.arraycopy(cents(c), 0, flat, c * subDim, subDim); c += 1
        }
        val sums = Array.fill(k)(new Array[Double](subDim))
        val counts = new Array[Int](k)
        subs.foreach { p =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            var d = 0.0; var i = 0; val off = c * subDim
            while (i < subDim && d < bestD) {
              val t = p(i) - flat(off + i); d += t * t; i += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var i = 0
          while (i < subDim) { sums(best)(i) += p(i); i += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(k) { c =>
          if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c))
        }
      }
      // a thin sample (< ksub rows) is the degenerate case kmeansCentroids
      // also accepts: pad by repeating the last centroid so the model shape
      // stays m×ksub (codes past k are never EMITTED by the encoder because
      // a duplicate centroid can never win the argmax tie-break)
      val padded = if (k == ksub) cents
        else cents ++ Array.fill(ksub - k)(cents.last.clone())
      padded.map(_.map(_.toFloat))
    }
    PqModel(m, subDim, ksub, books)
  }

  /** The model's flattened codebook literal (codeword-major) — the single
    * array literal both codec expressions carry as a reference object.
    */
  private def booksLit(model: PqModel): Column =
    typedLit(model.books.flatten.flatten)

  /** PQ code assignment as a column: for each subspace the argmin over
    * codewords of ‖x̂_s − c‖², computed as argmax (dot(x_s, c)/‖x‖ − ½‖c‖²)
    * — the normalization folds into the score, so the raw embedding is read
    * once and the norm is computed inside the expression. Native
    * [[graft.functions.PqEncode]]: constant generated-code size at any
    * (m, ksub) — the composed struct-argmax form blew Janino's 64 KB method
    * limit at 8×16 and dropped the whole stage to interpreted eval. Ties
    * break toward the SMALLER code; zero-norm vectors get code 0 in every
    * subspace (no direction — and their exact re-rank cosine is NULL-ish
    * the same way the raw lane's is).
    */
  def encodeCol(emb: Column, model: PqModel): Column =
    call_function("pq_encode", emb, booksLit(model),
      lit(model.m), lit(model.ksub))

  /** The query-side ADC tables as a column: `tables[s][c] = dot(q_s, c)/‖q‖`
    * ([[graft.functions.PqTables]] — m·ksub short dots, once per QUERY row;
    * candidates then score with `m` table lookups).
    */
  def adcTablesCol(emb: Column, model: PqModel): Column =
    call_function("pq_tables", emb, booksLit(model),
      lit(model.m), lit(model.ksub))

  /** ADC score: Σ_s tables[s][codes[s]] ≈ cosine(q, x). m table lookups per
    * candidate — the whole point: candidate scoring never touches floats
    * wider than the tables already broadcast with the query. Native
    * [[graft.functions.PqAdcScore]] (round 16): the composed
    * `aggregate(zip_with(...))` form was a CodegenFallback that dropped the
    * candidate stream's ONE projection out of whole-stage codegen and
    * memcpy'd each joined row's m·ksub table — 3.2 s of c8's 7.4 s probe
    * wall. Value-identical (same left-to-right double accumulation;
    * PqSpec pins native == composed on random inputs).
    */
  def adcScoreCol(codes: Column, tables: Column): Column =
    call_function("pq_adc_score", codes, tables)

  /** Add the PQ extent to an EXISTING semantic index
    * ([[Similarity.buildSemanticIndex]]'s layout): persists the codebooks
    * and a (cell, vec_id, codes) extent encoded from the index's own
    * `assigned` rows. The raw extent STAYS — it is the re-rank store and the
    * dedup gate's corpus side; what PQ changes is which extent the ANN
    * candidate scan reads (m ints/row instead of dims floats/row).
    */
  def addPqExtent(spark: SparkSession, dir: String, model: PqModel): Unit = {
    // `codebooks` is the PQ-coherence MARKER (appendAssignedToSemanticIndex
    // gates on it; the indexed search reads it), so it is removed FIRST and
    // written LAST: every crash window leaves the index either fully
    // PQ-coherent or visibly PQ-less (reads fail loudly on the missing
    // extent, appends skip codes, a rerun re-encodes from the current
    // `assigned`). Marker-first ordering would let a crash strand a
    // codebooks extent whose codes are missing or encoded under an older
    // model — appends would then silently grow a codes extent that lacks
    // the base corpus.
    val cbPath = new org.apache.hadoop.fs.Path(s"$dir/codebooks")
    val fs = cbPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(cbPath)) fs.delete(cbPath, true)
    spark.read.parquet(s"$dir/assigned")
      .withColumn("codes", encodeCol(col("embedding"), model))
      .select(col("cell"), col("vec_id"), col("codes"))
      .write.mode("overwrite").parquet(s"$dir/codes")
    model.toDF(spark).write.mode("overwrite").parquet(s"$dir/codebooks")
  }

  /** Build a full IVF-PQ index: the semantic index (centroids + raw
    * assignment — [[Similarity.buildSemanticIndex]], including its
    * streaming-marker invalidation contract) plus the PQ extent.
    */
  def buildPqIndex(corpus: DataFrame, centroids: DataFrame, model: PqModel,
                   dir: String): Unit = {
    Similarity.buildSemanticIndex(corpus, centroids, dir)
    addPqExtent(corpus.sparkSession, dir, model)
  }

  /** IVF-PQ search over a persisted index: probe `nProbe` cells, score the
    * probed cells' PQ codes with ADC, shortlist top k·rerankFactor per
    * query, then re-rank the shortlist with the exact cosine against the
    * raw extent. Same output shape as [[Similarity.ivfTopKIndexed]].
    */
  def ivfPqTopKIndexed(indexDir: String, queries: DataFrame, k: Int,
                       nProbe: Int, rerankFactor: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    searchCore(queries,
      spark.read.parquet(s"$indexDir/codes"),
      spark.read.parquet(s"$indexDir/assigned"),
      spark.read.parquet(s"$indexDir/centroids"),
      PqModel.fromDF(spark.read.parquet(s"$indexDir/codebooks")),
      k, nProbe, rerankFactor)
  }

  /** Inline IVF-PQ (assignment + encoding computed on the fly) — the
    * oracle-gated form (e2l): identical search semantics to
    * [[ivfPqTopKIndexed]] without the disk round-trip; PqSpec pins the
    * indexed == inline equivalence.
    */
  def ivfPqTopKWithCentroids(queries: DataFrame, corpus: DataFrame,
                             centroids: DataFrame, model: PqModel, k: Int,
                             nProbe: Int, rerankFactor: Int = 4): DataFrame = {
    // Repartition BEFORE the checkpoint: assignCells ends in an exchange
    // that AQE coalesces to ONE partition at these byte sizes (10k rows of
    // embeddings ≈ 3 MB « the 64 MB advisory target), and localCheckpoint
    // FREEZES that layout — every downstream consumer then runs
    // single-task, including the pq_encode scan (m·ksub·subDim ≈ 16k
    // multiply-adds per row: compute-dense far beyond its byte size, the
    // one case where AQE's byte-based coalescing is exactly wrong).
    // Measured on c8's probe: 4.8 s single-task stage → 0.6 s at 32 tasks.
    val spark = corpus.sparkSession
    val assigned = Similarity
      .assignCells(corpus.select(col("vec_id"), col("embedding")), centroids)
      .withColumn("nrm", Vectors.norm2(col("embedding")))
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint() // feeds the codes extent AND the re-rank raw side
    val codes = assigned
      .withColumn("codes", encodeCol(col("embedding"), model))
      .select(col("cell"), col("vec_id"), col("codes"))
    // dedupPairs = false: the codes extent derives from assignCells'
    // groupBy(vec_id) output — one code row per vector, so the ADC stream
    // is duplicate-free and the shortlist skips a whole exchange
    searchCore(queries, codes, assigned, centroids, model, k, nProbe,
      rerankFactor, dedupPairs = false)
  }

  /** The probe → ADC-score → shortlist → exact-re-rank chain shared by the
    * indexed and inline forms. Queries probe their `nProbe` nearest cells
    * (rounded csim, ties by cell — [[Similarity.assignCells]]'s chain, so
    * IVF and IVF-PQ probe identical cells); candidates are the probed
    * cells' code rows; the raw extent is touched ONLY by the shortlist
    * join (broadcast — |queries|·k·rerankFactor rows by construction).
    *
    * `dedupPairs`: a code row's vector lives in exactly one cell, so the
    * ADC stream is duplicate-free UNLESS `codesExtent` is the persisted
    * `codes` extent, whose append crash window tolerates duplicate rows
    * (the [[Similarity.compactSemanticIndex]] contract) — the indexed
    * entry keeps the distinct, the inline entry skips the exchange.
    */
  private def searchCore(queries: DataFrame, codesExtent: DataFrame,
                         rawExtent: DataFrame, centroids: DataFrame,
                         model: PqModel, k: Int, nProbe: Int,
                         rerankFactor: Int,
                         dedupPairs: Boolean = true): DataFrame = {
    require(k >= 1 && nProbe >= 1 && rerankFactor >= 1,
      s"k=$k nProbe=$nProbe rerankFactor=$rerankFactor")
    // probe cut via the shared topk_struct heap (Similarity.probeCells):
    // ≤ nProbe rows per query cross the probe exchange instead of a full
    // |queries|·nCells window sort — identical probed-cell set (csim ties
    // by cell, the assignCells chain)
    val queryCells = Similarity.probeCells(queries, centroids, nProbe)
      .select(col("cell"), col("vec_id").as("a_id"),
        adcTablesCol(col("embedding"), model).as("tables"))
    // ADC pass: only (cell, vec_id, codes) rows flow here — never raw floats.
    // approx is rounded to 6 decimals so the shortlist cut is reproducible;
    // duplicate extent rows score identically (codes and tables are
    // cell-independent), so the indexed path's distinct() collapses exactly.
    val scored = codesExtent
      .select(col("cell"), col("vec_id").as("b_id"), col("codes"))
      .join(broadcast(queryCells), Seq("cell"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("approx", round(adcScoreCol(col("codes"), col("tables")), 6))
      .select("a_id", "b_id", "approx")
    val shortlist = if (dedupPairs) scored.distinct() else scored
    // shortlist cut as a bounded heap: ≤ k·rerankFactor rows per query ship
    // through the exchange, no per-query full sort of the ADC candidates
    val shortlistIds = Similarity
      .topKCut(shortlist, "approx", k * rerankFactor, Seq("b_id"))
      .select("a_id", "b_id")
    val qRaw = queries.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
      .withColumn("norm_a", Vectors.norm2(col("ea")))
    val reranked = rawExtent
      .select(col("vec_id").as("b_id"), col("embedding").as("eb"),
        col("nrm").as("norm_b"))
      .join(broadcast(shortlistIds), Seq("b_id"))
      .join(broadcast(qRaw), Seq("a_id"))
      .withColumn("cosine", round(
        Vectors.cosine(col("ea"), col("eb"), col("norm_a"), col("norm_b")), 4))
    Similarity.topKCut(reranked, "cosine", k, Seq("b_id", "cosine"))
  }
}
