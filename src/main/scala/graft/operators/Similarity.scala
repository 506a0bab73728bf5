package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Similarity search over embedding columns (charter E2).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k for a bounded query set —
  *    broadcast the queries, stream the corpus once. Linear in corpus size,
  *    no shuffle on the corpus side; correct baseline and the oracle target.
  *  - [[lshTopK]]: sign-random-projection bucketing — corpus is hashed to
  *    2^nPlanes buckets, candidates only join within a bucket. This is the
  *    100 TB path: candidate generation is a hash-partitioned equi-join, and
  *    recall is traded via nPlanes/multi-probe rather than scan width.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    * @param queries (id, embedding) — must be small enough to broadcast.
    * @param corpus  (id, embedding)
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
      .withColumn("norm_a", Vectors.norm2(col("ea")))
    val c = corpus.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
      .withColumn("norm_b", Vectors.norm2(col("eb")))
    val scored = c.join(broadcast(q), col("a_id") =!= col("b_id"))
      .withColumn("cosine", round(
        Vectors.cosine(col("ea"), col("eb"), col("norm_a"), col("norm_b")), 4))
    val w = Window.partitionBy(col("a_id")).orderBy(desc("cosine"), col("b_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("a_id", "rn", "b_id", "cosine")
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket.
    * Same output shape as [[bruteForceTopK]]; recall < 1 by construction.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, nPlanes: Int = 6,
              dims: Int = 64): DataFrame = {
    val q = queries.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
      .withColumn("bucket", Vectors.lshBucketFast(col("ea"), nPlanes, dims))
      .withColumn("norm_a", Vectors.norm2(col("ea")))
    val c = corpus.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
      .withColumn("bucket", Vectors.lshBucketFast(col("eb"), nPlanes, dims))
      .withColumn("norm_b", Vectors.norm2(col("eb")))
    val scored = c.join(broadcast(q), Seq("bucket")).filter(col("a_id") =!= col("b_id"))
      .withColumn("cosine", round(
        Vectors.cosine(col("ea"), col("eb"), col("norm_a"), col("norm_b")), 4))
    val w = Window.partitionBy(col("a_id")).orderBy(desc("cosine"), col("b_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("a_id", "rn", "b_id", "cosine", "bucket")
  }

  /** IVF-style ANN: a deterministic coarse quantizer (the first `nCells`
    * corpus vectors stand in for k-means centroids — swap in trained
    * centroids at production time) assigns every vector to its
    * nearest-centroid cell; a query probes its `nProbe` nearest cells and
    * scores only those inverted lists. Same output shape as
    * [[bruteForceTopK]]; recall is traded via nProbe, and candidate work is
    * |corpus|·nCells/nProbe-proportional rather than |corpus|² — the other
    * canonical 100 TB path next to [[lshTopK]].
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = corpus.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("cvec"))
    val cw = Window.partitionBy(col("vec_id")).orderBy(desc("csim"), col("cell"))

    def assign(df: DataFrame, keep: Int): DataFrame =
      df.join(broadcast(cents))
        .withColumn("csim", Vectors.cosine(col("embedding"), col("cvec")))
        .withColumn("crn", row_number().over(cw))
        .filter(col("crn") <= keep)
        .drop("cvec", "csim", "crn")

    val corpusCells = assign(corpus.select(col("vec_id"), col("embedding")), 1)
      .select(col("cell"), col("vec_id").as("b_id"), col("embedding").as("eb"))
      .withColumn("norm_b", Vectors.norm2(col("eb")))
    val queryCells = assign(queries.select(col("vec_id"), col("embedding")), nProbe)
      .select(col("cell"), col("vec_id").as("a_id"), col("embedding").as("ea"))
      .withColumn("norm_a", Vectors.norm2(col("ea")))

    val scored = corpusCells.join(broadcast(queryCells), Seq("cell"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("cosine", round(
        Vectors.cosine(col("ea"), col("eb"), col("norm_a"), col("norm_b")), 4))
    // a (query, corpus) pair can meet in several probed cells — dedup first
    val w = Window.partitionBy(col("a_id")).orderBy(desc("cosine"), col("b_id"))
    scored.select("a_id", "b_id", "cosine").distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("a_id", "rn", "b_id", "cosine")
  }

  /** Embedding-cosine near-duplicate pairs: all (a<b) pairs in the same LSH
    * bucket with cosine ≥ threshold. Bucketing bounds the pair blowup.
    */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double, nPlanes: Int = 6,
                         dims: Int = 64): DataFrame = {
    val c = corpus.select(col("vec_id"), col("embedding"))
      .withColumn("bucket", Vectors.lshBucketFast(col("embedding"), nPlanes, dims))
      .withColumn("nrm", Vectors.norm2(col("embedding")))
    val a = c.select(col("bucket"), col("vec_id").as("a"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = c.select(col("bucket"), col("vec_id").as("b"), col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("bucket")).filter(col("a") < col("b"))
      .withColumn("cosine", round(
        Vectors.cosine(col("ea"), col("eb"), col("na"), col("nb")), 4))
      .filter(col("cosine") >= threshold)
      .select("a", "b", "cosine")
  }
}
