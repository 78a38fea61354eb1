package graft.ext

import graft.{SparkSpec, Tables}
import graft.pipeline.Snapshot
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Persisted PQ index lifecycle pins: build-once/query-many, O(delta)
  * refresh through a fast-append sidecar, and the staleness contract
  * (a search against an index whose corpus moved raises). */
class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val (m, dsub, ksub) = (8, 8, 16)

  test("build/refresh/search: refresh encodes ONLY the delta as a " +
    "fast-append sidecar, search refuses stale, results equal the " +
    "derive-per-query two-stage path") {
    val emb = Tables.embeddings(spark, sf)
    val root = Files.createTempDirectory("pqidx").toString
    val corpus = s"$root/corpus"
    val idx = s"$root/pq"
    val v1 = emb.filter(col("vec_id") % 10 =!= 7)
    Snapshot.createOrReplace(v1, corpus, keepVersions = 3)
    val encoded = PqIndex.build(spark, corpus, idx, m, dsub, ksub)
    assert(encoded == v1.count())
    assert(PqIndex.meta(idx).map(_.corpusVersion).contains(1L))

    val queries = v1.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"))
    val fromIndex = PqIndex.search(spark, corpus, idx, queries,
        k = 5, shortlist = 40)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    // the same two-stage search derived per-query (the r11 path) —
    // identical codebook (same corpus, same md5 draw), so identical
    // shortlist and rerank
    val book = SimilarityOps.pqCollectBook(v1, m, dsub, ksub)
    val cand = SimilarityOps.pqTopK(queries,
        SimilarityOps.pqEncode(v1, book, m, dsub),
        SimilarityOps.pqBookFrame(spark, book), 40, dsub)
      .select(col("query_id"), col("neighbor_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("s").desc, col("neighbor_id"))
    val derived = cand
      .join(v1.select(col("vec_id").as("neighbor_id"), col("embedding")),
        "neighbor_id")
      .join(broadcast(queries), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        round(SimilarityOps.dot(col("q_embedding"), col("embedding"))
          * lit(1000000.0)).cast("long").as("s"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(fromIndex == derived,
      "persisted-index search must equal the derive-per-query path")

    // the corpus moves (v2 adds the held-out 10%) — search must refuse
    Snapshot.createOrReplace(emb, corpus, keepVersions = 3)
    val stale = intercept[IllegalStateException] {
      PqIndex.search(spark, corpus, idx, queries, 5, 40)
    }
    assert(stale.getMessage.contains("STALE"))

    // refresh: exactly the delta, committed as a MOR append sidecar —
    // the base code files are untouched
    val baseCodeFiles = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(java.nio.file.Paths.get(PqIndex.codesDir(idx)))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSet
      finally s.close()
    }
    val delta = PqIndex.refresh(spark, corpus, idx)
    assert(delta == emb.count() - v1.count())
    assert(Snapshot.morVersions(PqIndex.codesDir(idx)).nonEmpty,
      "the delta must land as a fast-append sidecar")
    val afterCodeFiles = {
      import scala.jdk.CollectionConverters._
      val s = Files.list(java.nio.file.Paths.get(PqIndex.codesDir(idx)))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSet
      finally s.close()
    }
    assert(afterCodeFiles == baseCodeFiles,
      "refresh must not rewrite base code files")
    // idempotent: a second refresh is a no-op
    assert(PqIndex.refresh(spark, corpus, idx) == 0L)

    // the refreshed index serves again and the appended vectors are
    // searchable (they appear as neighbors)
    val r2 = PqIndex.search(spark, corpus, idx, queries, 5, 40)
    assert(r2.count() > 0)
    assert(r2.filter(col("neighbor_id") % 10 === 7).count() > 0,
      "appended vectors must be reachable through the refreshed codes")
  }

  test("fast-append window: refresh consumes exactly the appended " +
    "sidecar; a delete-carrying window PROPAGATES — deleted and " +
    "updated vectors stop being served without a rebuild") {
    val emb = Tables.embeddings(spark, sf)
    val root = Files.createTempDirectory("pqidxw").toString
    val corpus = s"$root/corpus"
    val idx = s"$root/pq"
    val v1 = emb.filter(col("vec_id") % 10 =!= 7).localCheckpoint()
    val tail = emb.filter(col("vec_id") % 10 === 7).localCheckpoint()
    Snapshot.createOrReplace(v1, corpus, keepVersions = 3)
    PqIndex.build(spark, corpus, idx, m, dsub, ksub)

    // two fast-append commits in one window: the delta is their union
    Snapshot.morCommit(spark, corpus, deletes = None,
      appends = Some(tail.limit(50)), operation = "append")
    Snapshot.morCommit(spark, corpus, deletes = None,
      appends = Some(tail.except(tail.limit(50))), operation = "append")
    assert(PqIndex.refresh(spark, corpus, idx) == tail.count())
    assert(Snapshot.read(spark, PqIndex.codesDir(idx)).count()
      == emb.count())

    // pick a vector the index currently SERVES as a top neighbor,
    // then DELETE it from the corpus: refresh must propagate the
    // delete onto the codes table (no rebuild) and stamp fresh
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"))
    val victimId = PqIndex.search(spark, corpus, idx, queries, 5, 40)
      .orderBy("query_id", "rank")
      .select("neighbor_id").head().getLong(0)
    val victim = emb.filter(col("vec_id") === victimId).localCheckpoint()
    Snapshot.morCommit(spark, corpus, deletes = Some(victim),
      appends = None, operation = "delete")
    assert(PqIndex.refresh(spark, corpus, idx) == 0L,
      "a delete-only window appends nothing")
    assert(PqIndex.meta(idx).map(_.corpusVersion)
      == Snapshot.currentVersion(corpus),
      "the propagated refresh must stamp the live version")
    assert(Snapshot.read(spark, PqIndex.codesDir(idx)).count()
      == emb.count() - 1, "the victim's code must be gone")
    val afterDelete = PqIndex.search(spark, corpus, idx, queries, 5, 40)
    assert(afterDelete.filter(col("neighbor_id") === victimId).isEmpty,
      "a deleted vector must never be served as a neighbor")

    // UPDATE = delete + append of the same key in ONE commit: the
    // refresh upserts the code (exactly one code row for the key)
    val targetId = emb.filter(col("vec_id") =!= victimId)
      .orderBy("vec_id").limit(1).head().getLong(0)
    val oldRow = emb.filter(col("vec_id") === targetId).localCheckpoint()
    val newRow = oldRow.withColumn("embedding",
      org.apache.spark.sql.functions.transform(col("embedding"),
        x => x * lit(-1.0f))).localCheckpoint()
    Snapshot.morCommit(spark, corpus, deletes = Some(oldRow),
      appends = Some(newRow), operation = "overwrite")
    assert(PqIndex.refresh(spark, corpus, idx) == 1L,
      "the update's replacement row must re-encode")
    assert(Snapshot.read(spark, PqIndex.codesDir(idx))
      .filter(col("vec_id") === targetId).count() == 1L,
      "an updated key must hold exactly one code row")
    assert(Snapshot.read(spark, PqIndex.codesDir(idx)).count()
      == emb.count() - 1)
    assert(PqIndex.search(spark, corpus, idx, queries, 5, 40).count()
      > 0, "the upserted index must keep serving")
  }

  test("position-delete window: refresh resolves (file, pos) pairs " +
    "to keys by reading ONLY the referenced files, and propagates") {
    val emb = Tables.embeddings(spark, sf)
    val root = Files.createTempDirectory("pqidxp").toString
    val corpus = s"$root/corpus"
    val idx = s"$root/pq"
    Snapshot.createOrReplace(emb, corpus, keepVersions = 3)
    PqIndex.build(spark, corpus, idx, m, dsub, ksub)
    // position-delete three vectors (the DELETE-FROM MOR shape)
    val hits = Snapshot.readLineage(spark, corpus)
      .filter(col("vec_id") % 97 === 3)
    val nVictims = hits.count()
    assert(nVictims > 0, "fixture must contain victims")
    Snapshot.morCommit(spark, corpus, deletes = None, appends = None,
      operation = "delete", posDeletes = Some(hits))
    assert(PqIndex.refresh(spark, corpus, idx) == 0L)
    assert(Snapshot.read(spark, PqIndex.codesDir(idx)).count()
      == emb.count() - nVictims,
      "position-deleted vectors' codes must be gone")
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"))
    val res = PqIndex.search(spark, corpus, idx, queries, 5, 40)
    assert(res.filter(col("neighbor_id") % 97 === 3).isEmpty,
      "position-deleted vectors must not be served")
  }

  test("compacting one index component keeps the build tokens " +
    "coherent: search still serves (no false MID-REBUILD)") {
    val emb = Tables.embeddings(spark, sf)
    val root = Files.createTempDirectory("pqidxm").toString
    val corpus = s"$root/corpus"
    val idx = s"$root/pq"
    val v1 = emb.filter(col("vec_id") % 10 =!= 7).localCheckpoint()
    val tail = emb.filter(col("vec_id") % 10 === 7).localCheckpoint()
    Snapshot.createOrReplace(v1, corpus, keepVersions = 3)
    PqIndex.build(spark, corpus, idx, m, dsub, ksub)
    // a refresh stacks a sidecar on the codes table; compacting it is
    // the documented maintenance — layout-only, so the build token
    // must ride into the rewritten dir
    Snapshot.morCommit(spark, corpus, deletes = None,
      appends = Some(tail), operation = "append")
    PqIndex.refresh(spark, corpus, idx)
    Snapshot.rewritePositionDeletes(spark, PqIndex.codesDir(idx))
    Snapshot.compact(spark, PqIndex.codesDir(idx), targetFiles = 1)
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"))
    val res = PqIndex.search(spark, corpus, idx, queries, 5, 40)
    assert(res.count() > 0,
      "a compacted component must not read as mid-rebuild")
  }

  test("refresh auto-compaction bounds the codes table's sidecar " +
    "stack: the per-batch maintenance loop cannot grow the read tax " +
    "without bound") {
    val emb = Tables.embeddings(spark, sf)
    val root = Files.createTempDirectory("pqidxac").toString
    val corpus = s"$root/corpus"
    val idx = s"$root/pq"
    Snapshot.createOrReplace(emb.filter(col("vec_id") % 5 === 0),
      corpus, keepVersions = 2)
    PqIndex.build(spark, corpus, idx, m, dsub, ksub)
    (1 to 4).foreach { w =>
      Snapshot.morCommit(spark, corpus, deletes = None,
        appends = Some(emb.filter(col("vec_id") % 5 === w)),
        operation = "append")
      assert(PqIndex.refresh(spark, corpus, idx,
        compactAfterCommits = 2) > 0L)
      assert(Snapshot.morVersions(PqIndex.codesDir(idx)).size < 2,
        "the stack must sawtooth under the threshold")
    }
    assert(Snapshot.read(spark, PqIndex.codesDir(idx)).count()
      == emb.count(), "compaction must not change the codes")
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"))
    assert(PqIndex.search(spark, corpus, idx, queries, 5, 40)
      .count() > 0, "the compacted index must keep serving")
  }

  test("crashed refresh (codes committed, meta not): the detector " +
    "sees the moved codes table and the replay self-heals as an " +
    "UPSERT — no duplicate codes, deletes stay applied") {
    val emb = Tables.embeddings(spark, sf)
    val root = Files.createTempDirectory("pqidxc").toString
    val corpus = s"$root/corpus"
    val idx = s"$root/pq"
    val v1 = emb.filter(col("vec_id") % 10 =!= 7).localCheckpoint()
    val tail = emb.filter(col("vec_id") % 10 === 7).localCheckpoint()
    Snapshot.createOrReplace(v1, corpus, keepVersions = 3)
    PqIndex.build(spark, corpus, idx, m, dsub, ksub)
    // snapshot the meta BEFORE the refresh, run the refresh, then
    // restore the old meta — exactly the state a crash between the
    // codes commit and the meta write leaves behind
    val metaFile = java.nio.file.Paths.get(idx, "_pq_meta")
    val preMeta = Files.readAllBytes(metaFile)
    // a window that BOTH appends and deletes: the hardest replay —
    // a blind re-append would duplicate, a blind skip would lose the
    // delete, a skip-appends-apply-deletes would drop the appended key
    val victim = v1.orderBy("vec_id").limit(1).localCheckpoint()
    val victimId = victim.head().getLong(0)
    Snapshot.morCommit(spark, corpus, deletes = Some(victim),
      appends = Some(tail), operation = "overwrite")
    assert(PqIndex.refresh(spark, corpus, idx) == tail.count())
    Files.write(metaFile, preMeta)
    // replayed refresh: the same window re-derives, the codes table
    // sits PAST the meta's codesVersion → upsert replay (delete every
    // touched key, re-append) — idempotent by construction
    assert(PqIndex.refresh(spark, corpus, idx) == tail.count())
    val codes = Snapshot.read(spark, PqIndex.codesDir(idx))
    assert(codes.count() == emb.count() - 1,
      "the replay must neither duplicate codes nor resurrect the " +
        "deleted vector")
    assert(codes.groupBy("vec_id").count()
      .filter(col("count") > 1).isEmpty,
      "no key may hold more than one code row after the replay")
    assert(codes.filter(col("vec_id") === victimId).isEmpty)
    assert(PqIndex.meta(idx).map(_.corpusVersion)
      == Snapshot.currentVersion(corpus),
      "the healed meta must stamp the live corpus version")
  }
}
