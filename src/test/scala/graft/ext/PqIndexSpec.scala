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
    "sidecar; a delete-carrying window raises and keeps the version " +
    "gate stale") {
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

    // a DELETE commit moves the corpus; refresh must refuse (an
    // append-only index cannot un-serve removed vectors) and the
    // version gate must stay stale so search keeps refusing
    val victim = emb.orderBy("vec_id").limit(1).localCheckpoint()
    Snapshot.morCommit(spark, corpus, deletes = Some(victim),
      appends = None, operation = "delete")
    val e = intercept[IllegalStateException] {
      PqIndex.refresh(spark, corpus, idx)
    }
    assert(e.getMessage.contains("rebuild"))
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"))
    val stale = intercept[IllegalStateException] {
      PqIndex.search(spark, corpus, idx, queries, 5, 40)
    }
    assert(stale.getMessage.contains("STALE"),
      "a failed refresh must not have stamped the index fresh")
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

  test("crashed refresh (codes committed, meta not): the detector " +
    "sees the moved codes table, the id guard dedupes, and the " +
    "re-run heals without duplicate codes") {
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
    Snapshot.morCommit(spark, corpus, deletes = None,
      appends = Some(tail), operation = "append")
    assert(PqIndex.refresh(spark, corpus, idx) == tail.count())
    Files.write(metaFile, preMeta)
    // replayed refresh: delta re-derived from the same window, but the
    // codes table moved past the meta's codesVersion → the guard
    // anti-joins the delta and nothing re-encodes
    assert(PqIndex.refresh(spark, corpus, idx) == 0L)
    assert(Snapshot.read(spark, PqIndex.codesDir(idx)).count()
      == emb.count(), "the replay must not duplicate codes")
    assert(PqIndex.meta(idx).map(_.corpusVersion)
      == Snapshot.currentVersion(corpus),
      "the healed meta must stamp the live corpus version")
  }
}
