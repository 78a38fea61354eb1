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

  test("build/refresh/search compose; full-probe search equals the " +
    "plain PQ two-stage read; probes prune fragments") {
    val emb = Tables.embeddings(spark, sf)
    val root = Files.createTempDirectory("ivfpq").toString
    val corpus = s"$root/corpus"
    val idx = s"$root/ivfpq"
    Snapshot.createOrReplace(emb, corpus, keepVersions = 3)
    assert(IvfPqIndex.build(spark, corpus, idx, nlist, m, dsub, ksub)
      == emb.count())

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
  }
}
