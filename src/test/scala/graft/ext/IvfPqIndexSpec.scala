package graft.ext

import graft.{SparkSpec, Tables}
import graft.pipeline.Snapshot
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** IVFADC composition pins: the three nested reductions (fragment
  * pruning, ADC, rerank) compose over persisted tables, refresh is
  * delta-exact, stale raises, and at full probe width the result
  * degenerates to the plain two-stage PQ search (the IVF layer only
  * ever NARROWS the candidate set). */
class IvfPqIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val (nlist, m, dsub, ksub) = (8, 8, 8, 16)

  test("build/refresh/search compose; full-probe GLOBAL-BOOK search " +
    "equals the plain PQ two-stage read; probes prune fragments") {
    val emb = Tables.embeddings(spark, sf)
    val root = Files.createTempDirectory("ivfpq").toString
    val corpus = s"$root/corpus"
    val idx = s"$root/ivfpq"
    Snapshot.createOrReplace(emb, corpus, keepVersions = 3)
    // residual = false: only the raw-vector single-book variant can
    // degenerate to the plain PQ read at full probe width (the
    // residual book is trained on different vectors by design)
    assert(IvfPqIndex.build(spark, corpus, idx, nlist, m, dsub, ksub,
      residual = false) == emb.count())

    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"))
    val res = IvfPqIndex.search(spark, corpus, idx, queries,
      k = 5, nprobe = 2, shortlist = 40)
    val explained = res.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*centroid_id".r
        .findFirstIn(explained).isDefined,
      s"probes must prune cell fragments:\n$explained")
    assert(res.count() > 0)

    // probing EVERY cell removes the IVF narrowing entirely — the
    // result must equal PqIndex's plain two-stage read over the same
    // codebook (same md5 draw over the same corpus)
    val pqIdx = s"$root/pq"
    PqIndex.build(spark, corpus, pqIdx, m, dsub, ksub)
    val full = IvfPqIndex.search(spark, corpus, idx, queries,
        k = 5, nprobe = nlist, shortlist = 40)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val plain = PqIndex.search(spark, corpus, pqIdx, queries,
        k = 5, shortlist = 40)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(full == plain,
      "full-probe IVFADC must degenerate to the plain PQ read")

    // lifecycle: corpus append, stale raise, delta-exact refresh
    val extra = emb.withColumn("vec_id", col("vec_id") + 1000000L)
    Snapshot.createOrReplace(emb.unionByName(extra), corpus,
      keepVersions = 3)
    assert(intercept[IllegalStateException] {
      IvfPqIndex.search(spark, corpus, idx, queries, 5, 2, 40)
    }.getMessage.contains("STALE"))
    assert(IvfPqIndex.refresh(spark, corpus, idx) == emb.count())
    assert(IvfPqIndex.refresh(spark, corpus, idx) == 0L)
    assert(Snapshot.morVersions(IvfPqIndex.cellsDir(idx)).nonEmpty)
    val r2 = IvfPqIndex.search(spark, corpus, idx, queries, 5, 2, 40)
    assert(r2.filter(col("neighbor_id") >= 1000000L).count() > 0,
      "appended vectors must be reachable after refresh")

    // corpus DELETE propagates onto the cell-clustered codes: the
    // whole synthetic +1000000 wave goes, codes shrink back, and no
    // deleted id is served
    Snapshot.morCommit(spark, corpus,
      deletes = Some(Snapshot.read(spark, corpus)
        .filter(col("vec_id") >= 1000000L)),
      appends = None, operation = "delete")
    assert(IvfPqIndex.refresh(spark, corpus, idx) == 0L)
    assert(Snapshot.read(spark, IvfPqIndex.cellsDir(idx)).count()
      == emb.count(), "deleted codes must be gone")
    val r3 = IvfPqIndex.search(spark, corpus, idx, queries, 5, 2, 40)
    assert(r3.filter(col("neighbor_id") >= 1000000L).isEmpty,
      "deleted vectors must not be served")
  }

  /** Mean recall@5 of `approx` against exact inner-product top-5. */
  private def recallOf(approx: org.apache.spark.sql.DataFrame,
                       exact: Set[(Long, Long)],
                       nQueries: Long): Double = {
    val got = approx.select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    got.count(exact.contains).toDouble / (nQueries * 5.0)
  }

  private def exactTop5(emb: org.apache.spark.sql.DataFrame,
                        queries: org.apache.spark.sql.DataFrame)
      : Set[(Long, Long)] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    emb.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        SimilarityOps.dot(col("q_embedding"), col("embedding"))
          .as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
  }

  test("residual encoding at the flagship operating point: recall at " +
    "the CURRENT nprobe/shortlist >= the global book at 2x the " +
    "shortlist; refresh composes through the residual arm") {
    // the flagship query's geometry: sf0.01 corpus (2k vectors),
    // nlist 32, nprobe 2, shortlist 40 — q_ivfpq_recall's exact knobs
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select("vec_id", "embedding").localCheckpoint()
    val root = Files.createTempDirectory("ivfpqr").toString
    val corpus = s"$root/corpus"
    Snapshot.createOrReplace(emb, corpus, keepVersions = 3)
    val residIdx = s"$root/resid"
    val globalIdx = s"$root/global"
    IvfPqIndex.build(spark, corpus, residIdx, 32, m, dsub, ksub)
    assert(IvfPqIndex.meta(residIdx).exists(_.residual))
    IvfPqIndex.build(spark, corpus, globalIdx, 32, m, dsub, ksub,
      residual = false)

    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding")).localCheckpoint()
    val nQ = queries.count()
    val exact = exactTop5(emb, queries)
    val rResid = recallOf(IvfPqIndex.search(spark, corpus, residIdx,
      queries, k = 5, nprobe = 2, shortlist = 40), exact, nQ)
    val rGlobal2x = recallOf(IvfPqIndex.search(spark, corpus, globalIdx,
      queries, k = 5, nprobe = 2, shortlist = 80), exact, nQ)
    assert(rResid >= rGlobal2x,
      s"residual recall@5 (shortlist 40) $rResid must be >= global " +
        s"recall@5 (shortlist 80) $rGlobal2x")

    // the residual arm refreshes like the others: fast-append delta,
    // residualized under the FROZEN centroids and book
    val extra = emb.withColumn("vec_id", col("vec_id") + 1000000L)
    Snapshot.morCommit(spark, corpus, deletes = None,
      appends = Some(extra), operation = "append")
    assert(IvfPqIndex.refresh(spark, corpus, residIdx) == emb.count())
    val r2 = IvfPqIndex.search(spark, corpus, residIdx, queries,
      k = 5, nprobe = 2, shortlist = 40)
    assert(r2.filter(col("neighbor_id") >= 1000000L).count() > 0,
      "appended vectors must be reachable through the residual index")
  }

  test("residual encoding's quantization win on clustered vectors: " +
    "recall strictly dominates the global book at EQUAL shortlist " +
    "when the coarse quantizer explains variance") {
    // the fixture's vectors are isotropic (unit-norm, no cluster
    // structure) — there a coarse quantizer explains no variance and
    // residual coding cannot help (avg ||x - c|| > ||x||, measured).
    // Real embedding corpora cluster heavily; derive a clustered
    // corpus from the fixture deterministically: anchor(i) = fixture
    // row (vec_id % 12), vector = normalize(anchor + 0.3 * own)
    val raw = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").localCheckpoint()
    val anchors = raw.orderBy("vec_id").limit(12)
      .select((col("vec_id") % 12).as("aid"),
        col("embedding").as("a_embedding"))
    val mixed = raw.withColumn("aid", col("vec_id") % 12)
      .join(broadcast(anchors), "aid")
      .withColumn("mix", zip_with(col("a_embedding"), col("embedding"),
        (a, x) => a.cast("double") + lit(0.3) * x.cast("double")))
    val emb = mixed
      .withColumn("embedding", transform(col("mix"),
        x => x / sqrt(SimilarityOps.dot(col("mix"), col("mix")))))
      .select("vec_id", "embedding").localCheckpoint()

    val root = Files.createTempDirectory("ivfpqc").toString
    val corpus = s"$root/corpus"
    Snapshot.createOrReplace(emb, corpus, keepVersions = 3)
    val residIdx = s"$root/resid"
    val globalIdx = s"$root/global"
    IvfPqIndex.build(spark, corpus, residIdx, 16, m, dsub, ksub)
    IvfPqIndex.build(spark, corpus, globalIdx, 16, m, dsub, ksub,
      residual = false)

    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding")).localCheckpoint()
    val nQ = queries.count()
    val exact = exactTop5(emb, queries)
    // full probe isolates quantization error from probe misses; equal
    // shortlist isolates the book from the rerank width
    val rs = Seq(12, 16).map { s =>
      val rr = recallOf(IvfPqIndex.search(spark, corpus, residIdx,
        queries, k = 5, nprobe = 16, shortlist = s), exact, nQ)
      val rg = recallOf(IvfPqIndex.search(spark, corpus, globalIdx,
        queries, k = 5, nprobe = 16, shortlist = s), exact, nQ)
      assert(rr >= rg,
        s"residual recall $rr must be >= global $rg at shortlist $s")
      (rr, rg)
    }
    assert(rs.exists { case (rr, rg) => rr > rg },
      s"residual must STRICTLY beat the global book somewhere: $rs")
  }
}
