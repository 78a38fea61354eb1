package graft.ext

import graft.{SparkSpec, Tables}
import graft.pipeline.Snapshot
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Persisted IVF index pins: cell-clustered storage whose search
  * PRUNES unprobed cell fragments at plan time, O(delta) refresh,
  * staleness contract, and equivalence with the derive-per-query
  * ivfTopK path. */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val nlist = 16

  test("build/refresh/search: fragment-pruned probes, delta-exact " +
    "refresh, stale raise, results equal ivfTopK") {
    val emb = Tables.embeddings(spark, sf)
    val root = Files.createTempDirectory("ivfidx").toString
    val corpus = s"$root/corpus"
    val idx = s"$root/ivf"
    val v1 = emb.filter(col("vec_id") % 10 =!= 7)
    Snapshot.createOrReplace(v1, corpus, keepVersions = 3)
    assert(IvfIndex.build(spark, corpus, idx, nlist) == v1.count())

    val queries = v1.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"))
    val res = IvfIndex.search(spark, corpus, idx, queries,
      k = 5, nprobe = 2)
    // PLAN PIN: the cells scan must prune unprobed fragments — the
    // probe filter reaches PartitionFilters on the scan
    val explained = res.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*centroid_id".r
        .findFirstIn(explained).isDefined,
      s"probes must prune cell fragments:\n$explained")
    // results equal the derive-per-query path on the same codebook
    val fromIndex = res.select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val derived = SimilarityOps.ivfTopK(queries, v1,
        SimilarityOps.sampleCentroids(v1, nlist), 5, nprobe = 2)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(fromIndex == derived,
      "persisted-index search must equal ivfTopK")

    // corpus moves: stale raise, then delta-exact refresh as a
    // fast-append sidecar, idempotent
    Snapshot.createOrReplace(emb, corpus, keepVersions = 3)
    assert(intercept[IllegalStateException] {
      IvfIndex.search(spark, corpus, idx, queries, 5, 2)
    }.getMessage.contains("STALE"))
    val delta = IvfIndex.refresh(spark, corpus, idx)
    assert(delta == emb.count() - v1.count())
    assert(Snapshot.morVersions(IvfIndex.cellsDir(idx)).nonEmpty,
      "the delta must land as a fast-append sidecar")
    assert(IvfIndex.refresh(spark, corpus, idx) == 0L)
    val r2 = IvfIndex.search(spark, corpus, idx, queries, 5, 2)
    assert(r2.count() > 0)
    assert(r2.filter(col("neighbor_id") % 10 === 7).count() > 0,
      "appended vectors must be reachable through the refreshed cells")
  }
}
