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
  *  - the bucketed variants join on an LSH bucket key, so total join
  *    work is Σ_b |bucket_b|·|queries in b| (self-join: Σ_b |bucket_b|²)
  *    — ≈ n²/2^bits for balanced buckets. The code width `bits` and
  *    table count are PARAMETERS ([[hyperplaneBucket]]): size bits ≈
  *    log2(n / targetBucketRows) as the corpus grows, add tables for
  *    recall. Exact rescoring happens inside buckets only;
  *  - the IVF variant ([[ivfTopK]]) is the trained-codebook version of
  *    the same pattern: nlist cells ([[sampleCentroids]], nlist ≈ √n),
  *    nprobe cells probed per query.
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
    * deterministic, data-independent, mirrorable in SQL. Kept as the
    * simple 4-bit oracle fixture; the scale path is
    * [[hyperplaneBucket]]/[[hyperplaneTopK]], whose code width and table
    * count are parameters. */
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

  // -------------------------------------------------------------------
  // Parameterized random-hyperplane LSH (the 100-TB scale path)
  // -------------------------------------------------------------------

  /** Deterministic ±1 hyperplane coefficient for (table, bit, dim): one
    * 64-bit LCG scramble of a linear index mix (Knuth MMIX constants),
    * sign taken from a high bit. Driver-side constant — BOTH the Spark
    * plan and the DuckDB oracle SQL are generated from this function, so
    * cross-engine equality holds by construction (the same literal ±1
    * arrays appear in both plans). Rademacher (±1) entries are a
    * standard random-projection family — unlike coordinate signs they
    * mix every dimension, so correlated dimensions no longer skew the
    * bucket histogram. */
  def planeSign(table: Int, bit: Int, dim: Int): Double = {
    val mixed = table * 1000003L + bit * 8191L + dim * 131L + 12345L
    val x = mixed * 6364136223846793005L + 1442695040888963407L
    if (((x >>> 32) & 1L) == 0L) 1.0 else -1.0
  }

  /** The ±1 hyperplane for (table, bit) over `dim` dimensions. */
  def plane(table: Int, bit: Int, dim: Int = 64): Seq[Double] =
    (0 until dim).map(d => planeSign(table, bit, d))

  /** `bits`-bit random-hyperplane code (SimHash over real vectors): bit
    * j = (embedding · plane(table, j) >= 0). Collision probability per
    * bit for angle θ is 1 − θ/π, so a `bits`-bit code splits a corpus of
    * n vectors into ~2^bits buckets and the bucketed self-join cost is
    * Σ_b |bucket_b|² — ≈ n²/2^bits when balanced. Size `bits` ≈
    * log2(n / targetBucketRows): 2000 fixture vectors → 8 bits; 10^9
    * vectors at 1k rows/bucket → 20 bits. `table` redraws the
    * hyperplanes — probing T tables raises recall from p^bits to
    * 1 − (1 − p^bits)^T at T× candidate cost.
    *
    * Each bit is one [[dot]] against a literal ±1 array — a tight
    * codegen'd loop, bits×dim multiply-adds per row, no shuffle. */
  def hyperplaneBucket(embedding: Column, bits: Int, table: Int = 0,
                       dim: Int = 64): Column =
    concat((0 until bits).map { j =>
      val proj = dot(embedding, array(plane(table, j, dim).map(lit): _*))
      when(proj >= 0d, lit("1")).otherwise(lit("0"))
    }: _*)

  /** One (tbl, bkt) struct per hash table, for explode-joining. */
  private def tableBuckets(e: Column, bits: Int, tables: Int,
                           dim: Int): Column =
    array((0 until tables).map(t =>
      struct(lit(t).as("tbl"),
        hyperplaneBucket(e, bits, t, dim).as("bkt"))): _*)

  /** Approximate top-k over parameterized hyperplane LSH: each side is
    * exploded to one row per hash table, candidates equi-join on
    * (tbl, bkt), exact cosine rescoring, candidate pairs deduped across
    * tables BEFORE the top-k window.
    *
    * Scale shape: queries broadcast (×tables rows), corpus streamed once
    * (the explode is scan-side, no shuffle); only (query, neighbor,
    * score) triples — never embeddings — cross the dedup shuffle. */
  def hyperplaneTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     bits: Int, tables: Int = 1,
                     dim: Int = 64): DataFrame = {
    val qb = queries
      .select(col("query_id"), col("q_embedding"),
        explode(tableBuckets(col("q_embedding"), bits, tables, dim))
          .as("_tb"))
      .select(col("query_id"), col("q_embedding"),
        col("_tb.tbl").as("tbl"), col("_tb.bkt").as("bkt"))
    val cb = corpus
      .select(col("vec_id"), col("embedding"),
        explode(tableBuckets(col("embedding"), bits, tables, dim))
          .as("_tb"))
      .select(col("vec_id"), col("embedding"),
        col("_tb.tbl").as("tbl"), col("_tb.bkt").as("bkt"))
    val scored = cb.join(broadcast(qb), Seq("tbl", "bkt"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_embedding"), col("embedding")).as("score"))
      .dropDuplicates("query_id", "neighbor_id")
    topK(scored, k)
  }

  /** Near-duplicate pairs over parameterized hyperplane LSH: bucketed
    * self-join per hash table, exact-cosine threshold, pairs deduped
    * across tables. The parameterized X2c — [[cosineNearDuplicates]]
    * with `bits`/`tables` capacity instead of the fixed 4-bit code. */
  def hyperplaneNearDuplicates(corpus: DataFrame, threshold: Double,
                               bits: Int, tables: Int = 1,
                               dim: Int = 64): DataFrame = {
    val b = corpus
      .select(col("vec_id"), col("embedding"),
        explode(tableBuckets(col("embedding"), bits, tables, dim))
          .as("_tb"))
      .select(col("vec_id"), col("embedding"),
        col("_tb.tbl").as("tbl"), col("_tb.bkt").as("bkt"))
    val l = b.select(col("tbl"), col("bkt"), col("vec_id").as("id_a"),
      col("embedding").as("e_a"))
    val r = b.select(col("tbl"), col("bkt"), col("vec_id").as("id_b"),
      col("embedding").as("e_b"))
    l.join(r, Seq("tbl", "bkt"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("score", cosine(col("e_a"), col("e_b")))
      .filter(col("score") >= threshold)
      .select("id_a", "id_b", "score")
      .dropDuplicates("id_a", "id_b")
  }

  /** Per-query top-k with deterministic (score DESC, id ASC) ranking. */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "score")
  }

  /** Deterministic IVF codebook: `nlist` corpus vectors sampled by
    * md5-of-id order. md5 scrambles vec_id, so the sample is a uniform
    * pseudo-random draw, yet fully deterministic and replayable in SQL
    * (`ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT nlist`). The
    * distributed plan is a TakeOrdered (per-partition top-nlist, then a
    * tree-merge of nlist-row heaps) — no global sort, scale-safe at any
    * corpus size. The sampled vec_id doubles as the centroid_id. Size
    * nlist ≈ √n (or n / targetCellRows) as the corpus grows; a trained
    * k-means codebook can replace this sample without touching the
    * assignment/search plan. */
  def sampleCentroids(corpus: DataFrame, nlist: Int): DataFrame =
    corpus
      .orderBy(md5(col("vec_id").cast("string")))
      .limit(nlist)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("c_embedding"))

  /** IVF assignment: each vector is ranked against every centroid by
    * dot product (rank by dot DESC, centroid_id ASC for determinism)
    * and keeps its `nprobe` nearest cells. `centroids` is tiny and
    * broadcast; one pass over the corpus. Returns corpus columns +
    * `centroid_id` (one row per kept cell). */
  def assignCentroids(corpus: DataFrame, centroids: DataFrame,
                      nprobe: Int = 1): DataFrame = {
    val scored = corpus.join(broadcast(centroids))
      .withColumn("_dot", dot(col("embedding"), col("c_embedding")))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("_dot").desc, col("centroid_id"))
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= nprobe)
      .drop("_rn", "_dot", "c_embedding")
  }

  /** IVF top-k: corpus vectors live in their single nearest cell;
    * each query probes its `nprobe` nearest cells and is rescored
    * exactly against those cells' members only. The trained-codebook
    * ANN pattern with a deterministic codebook ([[sampleCentroids]]) so
    * the oracle can replay it. Approximate by construction — recall
    * rises with nprobe (more cells probed) at proportional rescoring
    * cost; a corpus vector meets a query at most once (one cell per
    * corpus vector, distinct probe cells per query), so no dedup is
    * needed before the top-k window. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
              k: Int, nprobe: Int = 1): DataFrame = {
    val corpusCells = assignCentroids(corpus, centroids)
    val queryCells = assignCentroids(
      queries.select(col("query_id").as("vec_id"),
        col("q_embedding").as("embedding")), centroids, nprobe)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"), col("centroid_id"))
    val scored = corpusCells.join(broadcast(queryCells), "centroid_id")
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_embedding"), col("embedding")).as("score"))
    topK(scored, k)
  }

  /** X2f — semantic dedup (the SemDeDup recipe, Abbas et al. 2023,
    * arXiv:2303.09540): assign every vector to its single nearest
    * centroid cell, search near-duplicate pairs ONLY within a cell
    * (exact pairwise cosine there), and drop every vector that has a
    * smaller-id near-twin — the min-id representative of each
    * duplicate pair survives.
    *
    * Scale shape: the centroid table is tiny and broadcast; the only
    * corpus-keyed exchange is the cell self-join on `centroid_id`.
    * Cell population is corpus/nlist on average — size nlist ≈
    * n/targetCellRows so a cell's pair count stays bounded; this
    * within-cell quadratic IS the SemDeDup design (clustering exists
    * precisely to keep the pairwise step off the full corpus). Recall
    * is bounded by cell agreement — near-identical vectors share a
    * nearest centroid unless they straddle a cell boundary — the same
    * knob-vs-recall trade the ANN recall audits (X3d) measure.
    *
    * @return `corpus` rows whose vector has no smaller-id near-twin
    *         in its cell (survivors, all original columns) */
  def semanticDedup(corpus: DataFrame, centroids: DataFrame,
                    threshold: Double): DataFrame = {
    val cells = assignCentroids(corpus, centroids)
    val l = cells.select(col("centroid_id"), col("vec_id").as("id_a"),
      col("embedding").as("e_a"))
    val r = cells.select(col("centroid_id"), col("vec_id").as("id_b"),
      col("embedding").as("e_b"))
    val dropped = l.join(r, "centroid_id")
      .filter(col("id_a") < col("id_b"))
      .filter(cosine(col("e_a"), col("e_b")) >= threshold)
      .select(col("id_b").as("vec_id")).distinct()
    corpus.join(dropped, Seq("vec_id"), "left_anti")
  }

  /** X2f' — semantic DECONTAMINATION: [[semanticDedup]]'s cell-bounded
    * pairwise shape ACROSS tables — drop every corpus vector with a
    * near-duplicate (cosine ≥ threshold) in `blocklist`, comparing
    * only within shared IVF cells. The embedding-space twin of the
    * n-gram decontaminators in [[DedupOps]]: benchmark rows whose
    * paraphrase survives a lexical scrub still collide here.
    *
    * Scale shape: both sides assign against the same broadcast
    * codebook; the only corpus-keyed exchange is the cell join, and
    * the per-cell cross product is (corpus/nlist) × (blocklist/nlist)
    * — the blocklist is benchmark-sized, so each cell's comparison
    * count stays blocklist-bounded, never corpus². */
  def semanticDecontaminate(corpus: DataFrame, blocklist: DataFrame,
                            centroids: DataFrame,
                            threshold: Double): DataFrame = {
    val cCells = assignCentroids(corpus, centroids)
      .select(col("centroid_id"), col("vec_id"),
        col("embedding").as("e_c"))
    val bCells = assignCentroids(blocklist, centroids)
      .select(col("centroid_id"), col("embedding").as("e_b"))
    val contaminated = cCells.join(bCells, "centroid_id")
      .filter(cosine(col("e_c"), col("e_b")) >= threshold)
      .select("vec_id").distinct()
    corpus.join(contaminated, Seq("vec_id"), "left_anti")
  }

  // -------------------------------------------------------------------
  // X3e — Lloyd k-means codebook training
  // -------------------------------------------------------------------

  /** X3e — Lloyd's k-means refinement of an IVF codebook [Lloyd 1982]:
    * `iters` rounds of (assign every vector to its nearest centroid by
    * squared Euclidean distance → recompute each centroid as the mean
    * of its cell). The [[sampleCentroids]] Scaladoc promises "a trained
    * k-means codebook can replace this sample without touching the
    * assignment/search plan" — this is that trainer; feed its output to
    * [[ivfTopK]] / [[semanticDedup]].
    *
    * Scale shape (the part that matters at 100 TB): the codebook is
    * collected to the driver each round (nlist × dim doubles — the same
    * tiny-model class as [[graft.ext.Sampling.planMix]]'s per-stratum
    * rates) and re-enters the next round's plan as LITERAL arrays, so
    * assignment is pure scan-side expression work — argmin over a
    * literal centroid array via `array_min(struct(d2, cid))`, zero
    * joins, zero corpus shuffle (unlike [[assignCentroids]], whose
    * per-vector ranking window exists to support nprobe>1 and costs a
    * corpus-keyed exchange). The mean update posexplodes to
    * (centroid, dim) keys whose partial aggregation collapses map-side:
    * the only exchange per round carries ≤ nlist·dim rows per map task.
    * Total: `iters` corpus scans, no corpus-sized shuffle anywhere.
    *
    * Cross-engine float discipline: d2 = ((x·x − 2·(x·c)) + c·c) with
    * every dot a strict left fold ([[dot]]); cell means quantize each
    * element to integer micros (`round(v·10⁶)` — the float→double cast,
    * multiply, and round are each identical across engines, and a
    * DECIMAL cast is NOT: Spark and DuckDB disagree by one scale-6 unit
    * on some floats) summed as exact BIGINTs — order-free — then
    * `((Σ/10⁶)/n)` in doubles, so the refined centroids are
    * bit-identical in DuckDB's replay. An emptied cell drops from the
    * codebook (standard Lloyd degeneracy; both engines agree by
    * construction).
    *
    * @param init (centroid_id, c_embedding) — e.g. [[sampleCentroids]]
    * @return (centroid_id, c_embedding array<double>, cell_size) after
    *         `iters` rounds */
  def kmeansRefine(corpus: DataFrame, init: DataFrame,
                   iters: Int): DataFrame =
    lloydAssembleWithSize(kmeansStats(corpus, init, iters))

  /** [[kmeansRefine]]'s final-round cell statistics in exploded form:
    * one row per (centroid_id, 1-based dimension) with the refined
    * coordinate and the cell population — the oracle-comparable shape
    * (scalar cells, no array columns). */
  def kmeansStats(corpus: DataFrame, init: DataFrame,
                  iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    var book = collectBook(init.select(col("centroid_id").cast("long"),
      col("c_embedding").cast("array<double>").as("c_embedding")))
    var last = lloydStep(corpus, book)
    for (_ <- 2 to iters) {
      book = collectBook(lloydAssemble(last))
      last = lloydStep(corpus, book)
    }
    last
  }

  /** [[kmeansRefine]] with convergence detection: sample an nlist
    * codebook ([[sampleCentroids]]), run Lloyd rounds until the largest
    * centroid movement (driver-side Euclidean over the tiny codebook)
    * drops below `tol` or `maxIters` is hit. The movement check costs
    * nothing extra — each round's codebook is already collected to
    * build the next round's literal plan. Convergence is Lloyd's
    * guarantee (SSE is non-increasing and the state space of
    * assignments is finite); `maxIters` bounds the worst case.
    *
    * @return (centroid_id, c_embedding array<double>, cell_size) at
    *         the converged (or maxIters-th) codebook */
  def kmeansTrain(corpus: DataFrame, nlist: Int, maxIters: Int = 10,
                  tol: Double = 1e-6): DataFrame = {
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    var book = collectBook(sampleCentroids(corpus, nlist)
      .select(col("centroid_id").cast("long"),
        col("c_embedding").cast("array<double>").as("c_embedding")))
    var last = lloydStep(corpus, book)
    var moved = Double.MaxValue
    var iters = 1
    while (moved > tol && iters < maxIters) {
      val next = collectBook(lloydAssemble(last))
      val prev = book.toMap
      moved = next.map { case (cid, vs) =>
        prev.get(cid) match {
          case Some(old) => math.sqrt(vs.zip(old)
            .map { case (a, b) => (a - b) * (a - b) }.sum)
          case None => Double.MaxValue // respawned/renumbered cell
        }
      }.max
      if (moved > tol) { book = next; last = lloydStep(corpus, book); iters += 1 }
    }
    lloydAssembleWithSize(last)
  }

  /** (centroid_id, pos, c_val, cell_size) → assembled codebook with
    * cell populations (the [[kmeansRefine]] return shape). */
  private def lloydAssembleWithSize(stats: DataFrame): DataFrame =
    stats.groupBy("centroid_id")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("c_val")))),
        s => s.getField("c_val")).as("c_embedding"),
        max("cell_size").as("cell_size"))

  /** Driver-side codebook snapshot, ordered by centroid id. */
  private def collectBook(cents: DataFrame): Seq[(Long, Seq[Double])] =
    cents.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
      .toSeq.sortBy(_._1)

  /** (centroid_id, pos, c_val, cell_size) → (centroid_id, c_embedding). */
  private def lloydAssemble(stats: DataFrame): DataFrame =
    stats.groupBy("centroid_id")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("c_val")))),
        s => s.getField("c_val")).as("c_embedding"))

  /** One Lloyd round against a literal codebook: scan-side argmin
    * assignment, then the (centroid, dim) decimal-exact mean. */
  private def lloydStep(corpus: DataFrame,
                        book: Seq[(Long, Seq[Double])]): DataFrame = {
    require(book.nonEmpty, "k-means codebook emptied out")
    val scored = array(book.map { case (cid, vals) =>
      val c = array(vals.map(lit): _*)
      // c·c folded driver-side with the same strict left fold the
      // engines use — identical IEEE op sequence, identical bits
      val cc = vals.foldLeft(0.0)((a, v) => a + v * v)
      struct(((col("_xx") - lit(2.0) * dot(col("embedding"), c)) + lit(cc))
        .as("d2"), lit(cid).as("cid"))
    }: _*)
    corpus
      .withColumn("_xx", dot(col("embedding"), col("embedding")))
      .withColumn("centroid_id", array_min(scored).getField("cid"))
      .select(col("centroid_id"),
        posexplode(col("embedding")).as(Seq("pos0", "v")))
      .groupBy(col("centroid_id"), (col("pos0") + 1).as("pos"))
      .agg(sum(round(col("v").cast("double") * lit(1000000.0))
        .cast("long")).as("_s"), count(lit(1)).as("cell_size"))
      .select(col("centroid_id"), col("pos"),
        (col("_s").cast("double") / lit(1000000.0) / col("cell_size"))
          .as("c_val"),
        col("cell_size"))
  }

  /** X3f — INT8 scalar quantization of embeddings: per-vector absmax
    * scale (`amax/127`), code_i = clamp(floor(x_i/scale + 0.5)) ∈
    * [-127, 127] — the standard 4× memory/bandwidth lever a 100-TB
    * vector corpus applies before ANN (FAISS's SQ8; reconstruction
    * error ≤ scale/2 per element, spec-proven). Every arithmetic step
    * (float→double cast, division, +0.5, floor) is IEEE-exact and
    * engine-portable, so the codes are oracle-checkable bit-for-bit —
    * deliberately floor(x+0.5), NOT round(), whose half-even vs
    * half-away tie rule differs across engines. All-zero vectors
    * quantize to all-zero codes with scale 0 (guarded identically in
    * the oracle). Scan-local: no shuffle, no UDF — array lambdas
    * codegen like the rest of the family. */
  def quantizeInt8(corpus: DataFrame, idCol: String = "vec_id",
                   embCol: String = "embedding"): DataFrame = {
    val x = col(embCol)
    val amax = array_max(transform(x, v => abs(v.cast("double"))))
    val scale = amax / lit(127.0)
    val codes = when(amax === 0.0,
      transform(x, _ => lit(0)))
      .otherwise(transform(x, v =>
        greatest(lit(-127), least(lit(127),
          floor(v.cast("double") / (amax / lit(127.0)) + lit(0.5))
            .cast("int")))))
    corpus.select(col(idCol), x.as(embCol))
      .withColumn("codes", codes)
      .withColumn("scale", scale)
  }

  /** Dequantize int8 codes back to doubles (`code * scale`) — the read
    * path a quantized ANN index uses. */
  def dequantizeInt8(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale)

  // -------------------------------------------------------------------
  // X3h — Johnson–Lindenstrauss random projection (dimensionality
  // reduction before ANN)
  // -------------------------------------------------------------------

  /** Seed namespace for the projection planes: a table id far outside
    * the LSH hash-table range (0..tables), so [[rpPlane]] never reuses
    * a [[hyperplaneBucket]] hyperplane. */
  val RpSeedTable = 777

  /** The ±1 Rademacher projection row for output coordinate `j` —
    * same seed-derived family as [[plane]] (Achlioptas 2003 showed ±1
    * entries satisfy the Johnson–Lindenstrauss guarantee), same
    * cross-engine contract: BOTH the Spark plan and the DuckDB oracle
    * embed these literals, so projections agree bit-for-bit. */
  def rpPlane(j: Int, dim: Int = 64): Seq[Double] =
    plane(RpSeedTable, j, dim)

  /** X3h — random projection of an embedding to `outDim` dimensions:
    * output coordinate j = embedding · rpPlane(j). The JL lemma bounds
    * pairwise-distance distortion at O(sqrt(ln n / outDim)), which is
    * what lets a 100-TB corpus run its CANDIDATE search in outDim/dim
    * of the memory bandwidth (4× here) and exact-rescore survivors in
    * full precision — the dimensionality sibling of [[quantizeInt8]]'s
    * precision lever, and the front half of every
    * compressed-vector-index read path.
    *
    * Cosine needs no 1/sqrt(outDim) JL scaling: the factor cancels in
    * score ratios, so the raw ±1 sums are projected coordinates as-is.
    * Scan-local, zero shuffle: each coordinate is one codegen'd [[dot]]
    * against a literal ±1 array (outDim×dim multiply-adds per row), and
    * every sum folds floats-cast-to-double strictly left, so the
    * projected values themselves are oracle-checkable. */
  def rpProject(embedding: Column, outDim: Int, dim: Int = 64): Column =
    array((0 until outDim).map(j =>
      dot(embedding, array(rpPlane(j, dim).map(lit): _*))): _*)

  // -------------------------------------------------------------------
  // X3g — product quantization (PQ) + asymmetric-distance search (ADC)
  // -------------------------------------------------------------------

  /** X3g — deterministic PQ codebook [Jégou, Douze, Schmid, TPAMI 2011]:
    * the embedding splits into `m` contiguous `dsub`-dim subspaces; each
    * subspace gets `ksub` centroids. Like [[sampleCentroids]], the
    * centroids are corpus vectors drawn in md5(vec_id) order — a
    * uniform pseudo-random draw that DuckDB replays exactly — sliced
    * per subspace; `code` is the 0-based md5 rank, shared across
    * subspaces. A [[kmeansRefine]]-trained codebook can replace this
    * sample without touching the encode/search plans.
    *
    * @return (sub, code, c_sub array<double>) — m·ksub tiny rows */
  def pqCodebook(corpus: DataFrame, m: Int, dsub: Int,
                 ksub: Int): DataFrame = {
    val byMd5 = Window.orderBy(md5(col("vec_id").cast("string")))
    corpus
      .orderBy(md5(col("vec_id").cast("string"))).limit(ksub)
      .withColumn("code", (row_number().over(byMd5) - 1).cast("int"))
      .select(col("code"), explode(array((0 until m).map(s =>
        struct(lit(s).as("sub"),
          slice(col("embedding"), s * dsub + 1, dsub)
            .cast("array<double>").as("c_sub"))): _*)).as("e"))
      .select(col("e.sub").as("sub"), col("code"), col("e.c_sub").as("c_sub"))
  }

  /** Driver-side codebook literal for the scan-side encoder — m·ksub·dsub
    * doubles, the same tiny-model class as [[kmeansStats]]' codebook. */
  def pqCollectBook(corpus: DataFrame, m: Int, dsub: Int,
                    ksub: Int): Seq[(Int, Int, Seq[Double])] =
    pqCodebook(corpus, m, dsub, ksub).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
      .toSeq.sortBy(t => (t._1, t._2))

  /** The collected codebook re-entered as the broadcastable frame
    * [[pqTopK]] consumes — ONE driver collect serves both the
    * encoder's literal arrays and the search's distance table. */
  def pqBookFrame(spark: org.apache.spark.sql.SparkSession,
                  book: Seq[(Int, Int, Seq[Double])]): DataFrame = {
    import spark.implicits._
    book.toDF("sub", "code", "c_sub")
  }

  /** X3g — PQ encode: each vector compresses to `m` sub-codes (argmin
    * squared-L2 in each subspace against the LITERAL codebook — the
    * same zero-join, zero-shuffle scan shape as [[kmeansStats]]'
    * assignment; ties break toward the smaller code). 64 float dims →
    * 8 bytes at the default geometry: a 32× memory lever, the
    * compressed tier below [[quantizeInt8]]'s 4×. Float discipline:
    * d2 = ((x·x − 2·(x·c)) + c·c), dots strict left folds, c·c folded
    * driver-side with the same op sequence — bit-replayable in SQL.
    *
    * `keep` carries extra columns through (e.g. a cell assignment —
    * [[graft.ext.IvfPqIndex]] encodes and clusters in ONE pass instead
    * of joining two corpus scans).
    * @return (vec_id, codes array<int>, keep…) */
  def pqEncode(corpus: DataFrame, book: Seq[(Int, Int, Seq[Double])],
               m: Int, dsub: Int, keep: Seq[String] = Nil): DataFrame = {
    val bySub = book.groupBy(_._1)
    val codeCols = (0 until m).map { s =>
      val sl = slice(col("embedding"), s * dsub + 1, dsub)
      val xx = dot(sl, sl)
      val scored = array(bySub(s).sortBy(_._2).map { case (_, j, c) =>
        val cc = c.foldLeft(0.0)((a, v) => a + v * v)
        struct(((xx - lit(2.0) * dot(sl, array(c.map(lit): _*))) + lit(cc))
          .as("d2"), lit(j).as("code"))
      }: _*)
      array_min(scored).getField("code")
    }
    corpus.select(col("vec_id") +: array(codeCols: _*).as("codes") +:
      keep.map(col): _*)
  }

  /** X3g' — asymmetric-distance top-k over PQ codes (the ADC read
    * path): each query precomputes a distance table — its partial
    * inner product against every (subspace, centroid) — and a code's
    * score is the sum of m table lookups; the full-precision vector is
    * never touched. Approximate by construction (quantization error);
    * [[pqEncode]]'s recall audit prices it.
    *
    * Scale shape: the distance table is |queries|·m·ksub rows, built
    * from the broadcast codebook and broadcast again for the lookup
    * join — the corpus side moves only (vec_id, sub, code) triples,
    * never embeddings. Partial sums quantize to exact BIGINT micros
    * (order-free), and the per-(query, vector) aggregation collapses
    * the m dimension map-side before the only corpus-keyed exchange.
    *
    * ID-SPACE CONTRACT: `excludeSelf = true` (the default) drops
    * neighbors whose `vec_id` EQUALS the `query_id` — correct only
    * when queries are drawn FROM the corpus and share its id space
    * (the recall-audit fixture's shape). A DISJOINT query set whose
    * ids happen to collide with corpus ids would silently lose valid
    * neighbors to that filter — pass `excludeSelf = false` there.
    *
    * @return (query_id, neighbor_id, rank, score_micros), rank 1..k by
    *         (score DESC, neighbor_id ASC), self-matches excluded only
    *         under `excludeSelf` */
  def pqTopK(queries: DataFrame, codes: DataFrame, codebook: DataFrame,
             k: Int, dsub: Int, excludeSelf: Boolean = true): DataFrame = {
    val dtab = queries.crossJoin(broadcast(codebook))
      .select(col("query_id"), col("sub"), col("code"),
        round(dot(slice(col("q_embedding"), col("sub") * dsub + 1,
          lit(dsub)), col("c_sub")) * lit(1000000.0)).cast("long")
          .as("pdot_micros"))
    val exploded = codes
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("sub", "code")))
    val scored = exploded.join(broadcast(dtab), Seq("sub", "code"))
      .filter(if (excludeSelf) col("query_id") =!= col("vec_id")
              else lit(true))
      .groupBy("query_id", "vec_id")
      .agg(sum("pdot_micros").as("score_micros"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_micros").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), col("score_micros"))
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
