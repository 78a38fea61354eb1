package graft.streaming

import graft.{SparkSpec, Tables}
import graft.ext.PqIndex
import graft.pipeline.Snapshot
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Streaming ANN-index maintenance pins: per-batch O(delta) corpus
  * appends + index refreshes, id-keyed idempotence across a
  * checkpoint-restart replay, and a search that serves the streamed
  * state without a rebuild. */
class StreamingIndexSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batches append corpus + refresh the PQ index O(delta); " +
    "a restart replays nothing; search serves the streamed state") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val root = Files.createTempDirectory("stridx").toString
    val vecDir = s"$root/vectors"
    val corpus = s"$root/corpus"
    val idx = s"$root/pq"
    val cp = s"$root/cp"

    // wave 1 bootstraps corpus + index
    val w1 = emb.filter(col("vec_id") % 3 === 0).localCheckpoint()
    w1.write.parquet(vecDir)
    val q1 = StreamingIndex.startPq(spark, vecDir, corpus, idx, cp,
      m = 8, dsub = 8, ksub = 16)
    q1.awaitTermination(60000)
    assert(Snapshot.read(spark, corpus).count() == w1.count())
    assert(PqIndex.meta(idx).isDefined)
    val codesAfter1 =
      Snapshot.read(spark, PqIndex.codesDir(idx)).count()
    assert(codesAfter1 == w1.count())

    // wave 2: new vectors + an OVERLAP (replayed ids must not dup)
    val w2 = emb.filter(col("vec_id") % 3 =!= 0)
      .unionByName(w1.limit(20)).localCheckpoint()
    w2.write.mode("append").parquet(vecDir)
    val q2 = StreamingIndex.startPq(spark, vecDir, corpus, idx, cp,
      m = 8, dsub = 8, ksub = 16)
    q2.awaitTermination(60000)
    assert(Snapshot.read(spark, corpus).count() == emb.count(),
      "overlapping ids must not duplicate in the corpus")
    assert(Snapshot.read(spark, PqIndex.codesDir(idx)).count()
      == emb.count(), "the index must cover exactly the corpus")
    assert(Snapshot.morVersions(corpus).nonEmpty,
      "wave-2 appends must be fast-append sidecars, not rewrites")

    // idle restart: nothing new, nothing changes
    val v = Snapshot.currentVersion(corpus)
    val q3 = StreamingIndex.startPq(spark, vecDir, corpus, idx, cp,
      m = 8, dsub = 8, ksub = 16)
    q3.awaitTermination(60000)
    assert(Snapshot.currentVersion(corpus) == v)

    // the maintained index serves without any rebuild
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"))
    val res = PqIndex.search(spark, corpus, idx, queries, 5, 40)
    assert(res.count() > 0)
    assert(res.filter(col("neighbor_id") % 3 =!= 0).count() > 0,
      "wave-2 vectors must be reachable through the streamed index")
  }

  test("a restart on a FRESH checkpoint (batch ids restart at 0) is " +
    "not mistaken for a replay: new vectors in the re-fed batch " +
    "reach the corpus and the index") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val root = Files.createTempDirectory("strfcp").toString
    val vecDir = s"$root/vectors"
    val corpus = s"$root/corpus"
    val idx = s"$root/pq"
    // the corpus pre-exists (the crash-heal contract), so cp1's ONE
    // file arrives as batchId 0 and leaves a batch-marked fast-append
    // as the NEWEST corpus commit
    val w0 = emb.filter(col("vec_id") % 3 === 0).localCheckpoint()
    val w1 = emb.filter(col("vec_id") % 3 === 1).localCheckpoint()
    Snapshot.createOrReplace(w0, corpus, keepVersions = 2)
    w1.coalesce(1).write.parquet(vecDir)
    StreamingIndex.startPq(spark, vecDir, corpus, idx, s"$root/cp1",
      m = 8, dsub = 8, ksub = 16).awaitTermination(60000)
    assert(Snapshot.read(spark, corpus).count()
      == w0.count() + w1.count())
    // new vectors land, and the stream restarts on a FRESH checkpoint:
    // its first batch is ALSO batchId 0 and holds old + new files — an
    // unscoped batch marker would flag it replayed against cp1's b0
    // commit and drop the new vectors silently
    val w2 = emb.filter(col("vec_id") % 3 === 2).localCheckpoint()
    w2.coalesce(1).write.mode("append").parquet(vecDir)
    StreamingIndex.startPq(spark, vecDir, corpus, idx, s"$root/cp2",
      m = 8, dsub = 8, ksub = 16).awaitTermination(60000)
    assert(Snapshot.read(spark, corpus).count() == emb.count(),
      "the fresh-checkpoint batch must append its NEW vectors")
    assert(Snapshot.read(spark, graft.ext.PqIndex.codesDir(idx))
      .count() == emb.count(),
      "the refresh must cover the re-fed batch's new vectors")
  }

  test("a crash between the bootstrap corpus write and the index " +
    "build heals: the next batch re-runs the bootstrap instead of " +
    "wedging on a meta-less refresh") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val root = Files.createTempDirectory("strboot").toString
    val vecDir = s"$root/vectors"
    val corpus = s"$root/corpus"
    val idx = s"$root/pq"
    val cp = s"$root/cp"
    val w1 = emb.filter(col("vec_id") % 2 === 0).localCheckpoint()
    // the crash state: the corpus landed, the index never built
    Snapshot.createOrReplace(w1, corpus, keepVersions = 2)
    assert(PqIndex.meta(idx).isEmpty)
    w1.write.parquet(vecDir)
    StreamingIndex.startPq(spark, vecDir, corpus, idx, cp,
      m = 8, dsub = 8, ksub = 16).awaitTermination(60000)
    assert(PqIndex.meta(idx).isDefined,
      "the replayed batch must re-run the bootstrap build")
    assert(Snapshot.read(spark, corpus).count() == w1.count(),
      "the overlap dedup must keep the corpus duplicate-free")
    assert(Snapshot.read(spark, PqIndex.codesDir(idx)).count()
      == w1.count())
  }

  test("startIvfPq maintains the IVFADC index per batch; the streamed " +
    "index is search-IDENTICAL to one batch-built on the bootstrap " +
    "wave and refreshed with the rest") {
    import graft.ext.IvfPqIndex
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val root = Files.createTempDirectory("strivfpq").toString
    val vecDir = s"$root/vectors"
    val corpus = s"$root/corpus"
    val idx = s"$root/ivfpq"
    val cp = s"$root/cp"
    val (nlist, m, dsub, ksub) = (8, 8, 8, 16)

    val w1 = emb.filter(col("vec_id") % 3 === 0).localCheckpoint()
    val w2 = emb.filter(col("vec_id") % 3 =!= 0).localCheckpoint()
    w1.write.parquet(vecDir)
    StreamingIndex.startIvfPq(spark, vecDir, corpus, idx, cp,
      nlist, m, dsub, ksub).awaitTermination(60000)
    assert(IvfPqIndex.meta(idx).exists(_.residual),
      "the streamed index must carry the residual default")
    w2.write.mode("append").parquet(vecDir)
    StreamingIndex.startIvfPq(spark, vecDir, corpus, idx, cp,
      nlist, m, dsub, ksub).awaitTermination(60000)
    assert(Snapshot.read(spark, corpus).count() == emb.count())
    assert(Snapshot.read(spark, IvfPqIndex.cellsDir(idx)).count()
      == emb.count(), "the streamed index must cover the corpus")
    assert(Snapshot.morVersions(IvfPqIndex.cellsDir(idx)).nonEmpty,
      "streamed code deltas must land as fast-append sidecars")

    // batch twin: same bootstrap wave builds, the rest refreshes —
    // identical centroids/books (same md5 draws over the same
    // bootstrap corpus), so the search must match row-for-row
    val corpus2 = s"$root/corpus2"
    val idx2 = s"$root/ivfpq2"
    Snapshot.createOrReplace(w1, corpus2, keepVersions = 2)
    IvfPqIndex.build(spark, corpus2, idx2, nlist, m, dsub, ksub)
    Snapshot.morCommit(spark, corpus2, deletes = None,
      appends = Some(w2), operation = "append")
    IvfPqIndex.refresh(spark, corpus2, idx2)

    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"))
    import spark.implicits._
    val streamed = IvfPqIndex.search(spark, corpus, idx, queries,
        k = 5, nprobe = 2, shortlist = 40)
      .select("query_id", "rank", "neighbor_id", "score_micros")
      .as[(Long, Int, Long, Long)].collect().toSet
    val batch = IvfPqIndex.search(spark, corpus2, idx2, queries,
        k = 5, nprobe = 2, shortlist = 40)
      .select("query_id", "rank", "neighbor_id", "score_micros")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(streamed == batch,
      "streamed IVFADC search must equal the batch-built lifecycle")
  }

  test("text arm: streamed inverted-index maintenance is search-" +
    "identical to the batch-built lifecycle over the same corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val root = Files.createTempDirectory("strtext").toString
    val docsDir = s"$root/docs"
    val corpus = s"$root/corpus"
    val idx = s"$root/text"
    val cp = s"$root/cp"
    val w1 = docs.filter(col("doc_id") % 3 === 0).localCheckpoint()
    val w2 = docs.filter(col("doc_id") % 3 =!= 0).localCheckpoint()

    // wave 1 bootstraps corpus + index; wave 2 refreshes through the
    // commit window (plus an id OVERLAP the dedup must drop)
    w1.coalesce(1).write.parquet(docsDir)
    StreamingIndex.startText(spark, docsDir, corpus, idx, cp)
      .awaitTermination(60000)
    assert(graft.ext.TextIndex.meta(idx).isDefined)
    w2.unionByName(w1.limit(10)).coalesce(1)
      .write.mode("append").parquet(docsDir)
    StreamingIndex.startText(spark, docsDir, corpus, idx, cp)
      .awaitTermination(60000)
    assert(Snapshot.read(spark, corpus).count() == docs.count(),
      "overlapping ids must not duplicate in the corpus")
    assert(Snapshot.read(spark, graft.ext.TextIndex.doclensDir(idx))
      .count() == docs.count(), "the index must cover the corpus")

    // batch twin
    val corpus2 = s"$root/corpus2"
    val idx2 = s"$root/text2"
    Snapshot.createOrReplace(w1, corpus2, keepVersions = 2)
    graft.ext.TextIndex.build(spark, corpus2, idx2)
    Snapshot.morCommit(spark, corpus2, deletes = None,
      appends = Some(w2), operation = "append")
    graft.ext.TextIndex.refresh(spark, corpus2, idx2)

    val qt = spark.createDataFrame(
      graft.queries.ExtQueries.Bm25Queries).toDF("query_id", "term")
    import spark.implicits._
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "doc_id", "score")
        .as[(String, Int, Long, Double)].collect().toSet
    val streamed = asSet(graft.ext.TextIndex.search(
      spark, corpus, idx, qt, k = 10))
    assert(streamed == asSet(graft.ext.TextIndex.search(
      spark, corpus2, idx2, qt, k = 10)),
      "streamed text-index search must equal the batch lifecycle")
    assert(streamed == asSet(graft.ext.TextOps.bm25TopK(
      docs, qt, k = 10)),
      "and both must equal the derive-per-query scorer")
  }
}
