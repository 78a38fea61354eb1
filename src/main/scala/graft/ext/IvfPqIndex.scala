package graft.ext

import graft.pipeline.Snapshot
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** IVF-PQ — the classic IVFADC composition [Jégou, Douze, Schmid,
  * TPAMI 2011] over BOTH persisted-index layers: the corpus clusters
  * into centroid cells ([[IvfIndex]]'s storage layout) and each
  * vector stores only its PQ codes ([[PqIndex]]'s 32× compression)
  * INSIDE its cell fragment:
  *
  * ```
  * <indexDir>/centroids   (centroid_id, c_embedding)      — nlist rows
  * <indexDir>/codebook    (sub, code, c_sub)              — m·ksub rows
  * <indexDir>/cells       (vec_id, codes) BY centroid_id  — 8 B/vector
  * <indexDir>/_ivfpq_meta corpus version + geometry
  * ```
  *
  * A search then pays THREE nested reductions: partition pruning
  * drops every unprobed cell fragment at plan time (O(nprobe/nlist)
  * of the index), ADC scores the probed cells from broadcast distance
  * tables without touching a single full-precision vector, and the
  * exact rerank reads only |queries|·shortlist embeddings back from
  * the corpus. This is the memory/IO shape FAISS's IVFADC runs at
  * billion-vector scale, expressed as three Catalyst joins. (Classic
  * IVFADC encodes RESIDUALS against the cell centroid; this variant
  * codes raw vectors with one global book — the same simplification
  * the recall audits already price for PQ, and the rerank stage
  * absorbs the difference.)
  *
  * Same lifecycle contract as the parents: build stamps the corpus
  * version; refresh assigns + encodes the commit-window delta
  * ([[IndexDelta.appendedSince]] — O(appended rows), no corpus
  * re-scan; raises on removed rows) as a fast-append sidecar; search
  * refuses a stale index. */
object IvfPqIndex {

  /** `cellsVersion`: crash detector for the idempotence guard — see
    * [[PqIndex.Meta]]. */
  final case class Meta(corpusVersion: Long, cellsVersion: Long,
                        nlist: Int, m: Int, dsub: Int, ksub: Int)

  def centroidsDir(indexDir: String): String = s"$indexDir/centroids"
  def codebookDir(indexDir: String): String = s"$indexDir/codebook"
  def cellsDir(indexDir: String): String = s"$indexDir/cells"
  private def metaFile(indexDir: String) =
    Paths.get(indexDir, "_ivfpq_meta")

  def meta(indexDir: String): Option[Meta] = {
    val f = metaFile(indexDir)
    if (!Files.exists(f)) None
    else {
      val p = new String(Files.readAllBytes(f),
        java.nio.charset.StandardCharsets.UTF_8).trim.split("\\s+")
      Some(Meta(p(0).toLong, p(1).toLong, p(2).toInt, p(3).toInt,
        p(4).toInt, p(5).toInt))
    }
  }

  private def writeMeta(indexDir: String, m: Meta): Unit = {
    Files.createDirectories(Paths.get(indexDir))
    val tmp = Paths.get(indexDir, "_ivfpq_meta.tmp")
    Files.write(tmp,
      (s"${m.corpusVersion} ${m.cellsVersion} ${m.nlist} ${m.m} " +
        s"${m.dsub} ${m.ksub}\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, metaFile(indexDir),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  private def corpusVersionOf(corpusPath: String): Long =
    Snapshot.currentVersion(corpusPath).getOrElse(
      throw new IllegalStateException(
        s"IVF-PQ index requires a versioned corpus snapshot at " +
          s"$corpusPath"))

  private def cellsRead(spark: SparkSession, indexDir: String): DataFrame =
    Snapshot.read(spark, cellsDir(indexDir))
      .withColumn("centroid_id", col("centroid_id").cast("long"))

  /** Assign to cells and PQ-encode in ONE pass over `vectors`: the
    * encode is a scan-side projection (literal codebook) applied
    * directly onto the assignment's output — no second corpus scan,
    * no vec_id join/shuffle. */
  private def assignAndEncode(spark: SparkSession, vectors: DataFrame,
                              centroids: DataFrame,
                              book: Seq[(Int, Int, Seq[Double])],
                              m: Int, dsub: Int): DataFrame =
    SimilarityOps.pqEncode(
      SimilarityOps.assignCentroids(vectors, centroids, 1)
        .withColumn("centroid_id", col("centroid_id").cast("long")),
      book, m, dsub, keep = Seq("centroid_id"))

  /** Build: sample centroids, train the PQ book, store codes
    * CLUSTERED BY CELL. @return vectors indexed */
  def build(spark: SparkSession, corpusPath: String, indexDir: String,
            nlist: Int, m: Int, dsub: Int, ksub: Int): Long = {
    val version = corpusVersionOf(corpusPath)
    val corpus = Snapshot.read(spark, corpusPath)
    val centroids = SimilarityOps.sampleCentroids(corpus, nlist)
    Snapshot.createOrReplace(centroids, centroidsDir(indexDir),
      keepVersions = 1)
    val book = SimilarityOps.pqCollectBook(corpus, m, dsub, ksub)
    Snapshot.createOrReplace(SimilarityOps.pqBookFrame(spark, book),
      codebookDir(indexDir), keepVersions = 1)
    Snapshot.createOrReplacePartitioned(
      assignAndEncode(spark, corpus, centroids, book, m, dsub),
      cellsDir(indexDir), Seq("centroid_id"), keepVersions = 1)
    writeMeta(indexDir, Meta(version,
      Snapshot.currentVersion(cellsDir(indexDir)).getOrElse(0L),
      nlist, m, dsub, ksub))
    cellsRead(spark, indexDir).count()
  }

  /** Assign + encode the commit-window delta as a fast-append
    * sidecar — O(appended rows); raises (version gate stays stale)
    * when the window removed rows. @return newly indexed vectors */
  def refresh(spark: SparkSession, corpusPath: String,
              indexDir: String): Long = {
    val im = meta(indexDir).getOrElse(throw new IllegalStateException(
      s"no IVF-PQ index at $indexDir (build first)"))
    val version = corpusVersionOf(corpusPath)
    if (version == im.corpusVersion) return 0L
    val appended = IndexDelta.appendedSince(spark, corpusPath,
      im.corpusVersion, version, "IVF-PQ index")
    val cellsLive = Snapshot.currentVersion(cellsDir(indexDir))
    val fresh =
      if (cellsLive.contains(im.cellsVersion)) appended
      else appended.join(cellsRead(spark, indexDir).select("vec_id"),
        Seq("vec_id"), "left_anti")
    val delta = fresh.localCheckpoint()
    val n = delta.count()
    if (n > 0) {
      val centroids = Snapshot.read(spark, centroidsDir(indexDir))
      val book = Snapshot.read(spark, codebookDir(indexDir))
        .select("sub", "code", "c_sub").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
        .toSeq.sortBy(t => (t._1, t._2))
      Snapshot.morCommit(spark, cellsDir(indexDir), deletes = None,
        appends = Some(assignAndEncode(spark, delta, centroids, book,
          im.m, im.dsub)),
        operation = "append")
    }
    writeMeta(indexDir, im.copy(corpusVersion = version,
      cellsVersion =
        Snapshot.currentVersion(cellsDir(indexDir)).getOrElse(0L)))
    n
  }

  /** The IVFADC read: probe `nprobe` cells per query (fragment-pruned
    * codes scan), ADC-score the probed cells against broadcast
    * distance tables, shortlist, exact-rerank against the corpus.
    * @param queries (query_id, q_embedding)
    * @return (query_id, neighbor_id, rank, score_micros) */
  def search(spark: SparkSession, corpusPath: String, indexDir: String,
             queries: DataFrame, k: Int, nprobe: Int, shortlist: Int,
             excludeSelf: Boolean = true): DataFrame = {
    val im = meta(indexDir).getOrElse(throw new IllegalStateException(
      s"no IVF-PQ index at $indexDir (build first)"))
    val version = corpusVersionOf(corpusPath)
    if (version != im.corpusVersion)
      throw new IllegalStateException(
        s"IVF-PQ index at $indexDir is STALE: it indexes corpus " +
          s"version ${im.corpusVersion} but the live corpus is " +
          s"v$version — run IvfPqIndex.refresh or rebuild")
    val centroids = Snapshot.read(spark, centroidsDir(indexDir))
    val qcells = SimilarityOps.assignCentroids(
        queries.select(col("query_id").as("vec_id"),
          col("q_embedding").as("embedding")), centroids, nprobe)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"), col("centroid_id"))
      .localCheckpoint()
    val probes = qcells.select("centroid_id").distinct()
      .collect().map(_.getLong(0)).toSeq
    // per-query partial inner products against the broadcast codebook
    val dtab = queries.crossJoin(
        broadcast(Snapshot.read(spark, codebookDir(indexDir))))
      .select(col("query_id"), col("sub"), col("code"),
        round(SimilarityOps.dot(
          slice(col("q_embedding"), col("sub") * im.dsub + 1,
            lit(im.dsub)), col("c_sub")) * lit(1000000.0)).cast("long")
          .as("pdot_micros"))
    // fragment-pruned codes scan, scoped to each query's OWN probes
    val exploded = cellsRead(spark, indexDir)
      .filter(col("centroid_id").isin(probes: _*))
      .join(broadcast(qcells.select("query_id", "centroid_id")),
        "centroid_id")
      .select(col("query_id"), col("vec_id"),
        posexplode(col("codes")).as(Seq("sub", "code")))
    val cand = exploded.join(broadcast(dtab),
        Seq("query_id", "sub", "code"))
      .filter(if (excludeSelf) col("query_id") =!= col("vec_id")
              else lit(true))
      .groupBy("query_id", "vec_id")
      .agg(sum("pdot_micros").as("adc_micros"))
    val ws = Window.partitionBy("query_id")
      .orderBy(col("adc_micros").desc, col("vec_id"))
    val short = cand.withColumn("_rn", row_number().over(ws))
      .filter(col("_rn") <= shortlist)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_micros").desc, col("neighbor_id"))
    short
      .join(Snapshot.read(spark, corpusPath)
        .select(col("vec_id").as("neighbor_id"), col("embedding")),
        "neighbor_id")
      .join(broadcast(queries), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        round(SimilarityOps.dot(col("q_embedding"), col("embedding"))
          * lit(1000000.0)).cast("long").as("score_micros"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "score_micros")
  }
}
