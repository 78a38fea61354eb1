package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY §2.7 X3):
  * brute-force cosine top-k as the exact baseline, and a sign-LSH
  * bucketed variant as the 100-TB path.
  *
  * Float discipline: dot products fold the array STRICTLY left-to-right
  * with every element cast to double first (`aggregate(zip_with(...))`).
  * IEEE +,*,/,sqrt are correctly rounded, so an oracle that folds in the
  * same order (DuckDB `list_reduce`) produces BIT-IDENTICAL doubles —
  * scores can be hash-compared with no rounding tricks.
  *
  * Scale:
  *  - brute force broadcasts the (small) query set and streams the
  *    corpus once — no corpus shuffle at all until the per-query top-k
  *    window, whose input is |queries|·k candidates after the per-
  *    partition pre-filter;
  *  - the bucketed variant joins on the sign-LSH bucket, so each query
  *    only meets ~corpus/2^bits vectors (approximate recall, exact
  *    rescoring inside the bucket) — the IVF pattern without a trained
  *    codebook.
  */
object SimilarityOps {

  /** Strict left-fold dot product with per-element double casts.
    * Backed by the native codegen'd [[graft.functions.VectorDot]]
    * expression (tight primitive loop inside whole-stage codegen);
    * bit-identical to the composable higher-order-function form
    * [[dotFold]] by construction. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.VectorDot(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** The same fold expressed with array built-ins (zip_with+aggregate)
    * — kept as the no-custom-code reference implementation; tests
    * assert bit-equality with [[dot]]. */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbours for each query vector.
    *
    * @param queries (query_id, embedding) — small; broadcast
    * @param corpus  (vec_id, embedding)
    * @return (query_id, neighbor_id, rank, score), rank 1..k by
    *         (score DESC, neighbor_id ASC), self-matches excluded
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     k: Int): DataFrame = {
    val scored = corpus.join(broadcast(queries))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_embedding"), col("embedding")).as("score"))
    topK(scored, k)
  }

  /** Sign-LSH bucket: one bit per sampled dimension (1 iff >= 0),
    * concatenated to a string key. `dims` are fixed hyperplane proxies —
    * deterministic, data-independent, mirrorable in SQL. */
  def signBucket(embedding: Column, dims: Seq[Int]): Column =
    concat(dims.map(d =>
      when(element_at(embedding, d + 1) >= 0f, lit("1")).otherwise(lit("0"))
    ): _*)

  /** Approximate top-k: candidates share the query's sign-LSH bucket
    * (equi-join on the bucket key), exact cosine rescoring inside.
    * Recall < 1 by construction; the oracle runs the same algorithm. */
  def bucketedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                   dims: Seq[Int] = Seq(0, 1, 2, 3)): DataFrame = {
    val qb = queries.withColumn("bucket", signBucket(col("q_embedding"), dims))
    val cb = corpus.withColumn("bucket", signBucket(col("embedding"), dims))
    val scored = cb.join(broadcast(qb), "bucket")
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_embedding"), col("embedding")).as("score"))
    topK(scored, k)
  }

  /** Per-query top-k with deterministic (score DESC, id ASC) ranking. */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "score")
  }

  /** IVF assignment: each vector goes to its nearest centroid by dot
    * product (rank by dot DESC, centroid_id ASC for determinism).
    * `centroids` is tiny and broadcast; one pass over the corpus.
    * Returns corpus columns + `centroid_id`. */
  def assignCentroids(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = corpus.join(broadcast(centroids))
      .withColumn("_dot", dot(col("embedding"), col("c_embedding")))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("_dot").desc, col("centroid_id"))
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_dot", "c_embedding")
  }

  /** IVF top-k (nprobe=1): queries and corpus are both assigned to
    * centroids; each query rescored exactly against its own cell only.
    * The trained-codebook ANN pattern with a deterministic codebook
    * (sampled corpus vectors) so the oracle can replay it. Approximate
    * by construction — like [[bucketedTopK]], recall trades against the
    * centroid fan-out. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
              k: Int): DataFrame = {
    val corpusCells = assignCentroids(corpus, centroids)
    val queryCells = assignCentroids(
      queries.select(col("query_id").as("vec_id"),
        col("q_embedding").as("embedding")), centroids)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"), col("centroid_id"))
    val scored = corpusCells.join(broadcast(queryCells), "centroid_id")
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_embedding"), col("embedding")).as("score"))
    topK(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs over one corpus: bucketed
    * self-join (sign-LSH), threshold on exact cosine. X2's embedding
    * variant. */
  def cosineNearDuplicates(corpus: DataFrame, threshold: Double,
                           dims: Seq[Int] = Seq(0, 1, 2, 3)): DataFrame = {
    val b = corpus.withColumn("bucket", signBucket(col("embedding"), dims))
    val l = b.select(col("bucket"), col("vec_id").as("id_a"),
      col("embedding").as("e_a"))
    val r = b.select(col("bucket"), col("vec_id").as("id_b"),
      col("embedding").as("e_b"))
    l.join(r, "bucket")
      .filter(col("id_a") < col("id_b"))
      .withColumn("score", cosine(col("e_a"), col("e_b")))
      .filter(col("score") >= threshold)
      .select("id_a", "id_b", "score")
  }
}
