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

  test("corpus DELETE propagates onto the cells table: IVF is the " +
    "family that CANNOT mask orphans (search scores stored cell " +
    "embeddings, never joining back to the corpus)") {
    val emb = Tables.embeddings(spark, sf)
    val root = Files.createTempDirectory("ivfdel").toString
    val corpus = s"$root/corpus"
    val idx = s"$root/ivf"
    Snapshot.createOrReplace(emb, corpus, keepVersions = 3)
    IvfIndex.build(spark, corpus, idx, nlist)
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"))
    // the currently-served top neighbor of the first query — the
    // vector whose orphaned cell row WOULD come back as a neighbor
    // if the delete only reached the corpus
    val victimId = IvfIndex.search(spark, corpus, idx, queries, 5, 2)
      .orderBy("query_id", "rank")
      .select("neighbor_id").head().getLong(0)
    Snapshot.morCommit(spark, corpus,
      deletes = Some(emb.filter(col("vec_id") === victimId)),
      appends = None, operation = "delete")
    assert(IvfIndex.refresh(spark, corpus, idx) == 0L,
      "a delete-only window assigns nothing")
    assert(IvfIndex.meta(idx).map(_.corpusVersion)
      == Snapshot.currentVersion(corpus),
      "the propagated refresh must stamp the live version")
    assert(Snapshot.read(spark, IvfIndex.cellsDir(idx))
      .filter(col("vec_id") === victimId).isEmpty,
      "the victim's cell row must be gone")
    assert(IvfIndex.search(spark, corpus, idx, queries, 5, 2)
      .filter(col("neighbor_id") === victimId).isEmpty,
      "a deleted vector must never be served from stored cells")
  }

  test("a rebuild that died between its component swaps is DETECTED: " +
    "mismatched build tokens raise instead of probing new centroids " +
    "against old cells") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val root = Files.createTempDirectory("ivftok").toString
    val corpus = s"$root/corpus"
    val idx = s"$root/ivf"
    Snapshot.createOrReplace(emb, corpus, keepVersions = 2)
    IvfIndex.build(spark, corpus, idx, 8)
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"))
    assert(IvfIndex.search(spark, corpus, idx, queries, 5, 2).count() > 0)
    // simulate the mixed window: the centroids swap of a NEW build
    // landed (fresh token) but the cells swap never did
    Snapshot.createOrReplaceWithMeta(
      SimilarityOps.sampleCentroids(emb, 8),
      IvfIndex.centroidsDir(idx), keepVersions = 1,
      "_graft_index_build", "interrupted-rebuild-token")
    val e = intercept[IllegalStateException] {
      IvfIndex.search(spark, corpus, idx, queries, 5, 2)
    }
    assert(e.getMessage.contains("MID-REBUILD"), e.getMessage)
  }

  test("rebalance_index under drift: frozen centroids skew and decay " +
    "recall for drifted queries; the Lloyd-trained re-cluster " +
    "restores it; below threshold the CALL is a no-op") {
    graft.catalog.TableStore.reset(spark)
    val emb = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").orderBy("vec_id").localCheckpoint()
    val base = emb.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val x0 = base.map(_._2)
    // the md5-first corpus row = the first sampled centroid — drift
    // leans toward its cell (the skew signal) while six sub-clusters
    // of orthogonal structure scatter their tails (the recall decay)
    val c0 = SimilarityOps.sampleCentroids(emb, 8).limit(1)
      .collect().head.getSeq[Float](1).map(_.toDouble).toArray
    val drift = (0 until 6).flatMap { j =>
      (0 until 50).map { t =>
        val sub = x0(100 + j)
        val noise = x0((200 + j * 50 + t) % x0.length)
        val v = (0 until 64).map(i =>
          0.3 * c0(i) + sub(i) + 0.8 * noise(i)).toArray
        val n = math.sqrt(v.map(a => a * a).sum)
        (100000L + j * 50 + t, v.map(a => (a / n).toFloat).toSeq)
      }
    }.toDF("vec_id", "embedding")
    val root = Files.createTempDirectory("ivfdrift").toString
    val corpus = s"$root/corpus"
    val idx = s"$root/ivf"
    Snapshot.createOrReplace(emb, corpus, keepVersions = 2)
    IvfIndex.build(spark, corpus, idx, 8)
    Snapshot.morCommit(spark, corpus, deletes = None,
      appends = Some(drift), operation = "append")
    IvfIndex.refresh(spark, corpus, idx)

    val all = Snapshot.read(spark, corpus).localCheckpoint()
    val queries = all.filter(col("vec_id") >= 100000L &&
        col("vec_id") % 10 === 0)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding")).localCheckpoint()
    val nQ = queries.count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    val exact = all.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        SimilarityOps.dot(col("q_embedding"), col("embedding"))
          .as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    def recall(): Double = {
      val got = IvfIndex.search(spark, corpus, idx, queries, 5, 2)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      got.count(exact.contains).toDouble / (nQ * 5.0)
    }
    val pre = recall()
    assert(pre < 0.95,
      s"frozen-centroid assignment must decay drifted recall: $pre")

    new graft.catalog.TableStore(spark)
      .registerSnapshot("drift", "corpus", corpus)
    // below threshold: measured, not fired
    val idle = spark.sql(s"""CALL iceberg.system.rebalance_index(
      table => 'drift.corpus', index_dir => '$idx',
      threshold => 99.0)""").collect().head
    assert(idle.getLong(0) == 0L, "below threshold must not rebuild")
    assert(idle.getLong(1) > 2 * idle.getLong(2),
      s"drift must SKEW the frozen cells: $idle")
    assert(recall() == pre, "a no-op call must not change the index")
    // at threshold 2 the skew fires: Lloyd-trained re-cluster
    val fired = spark.sql(s"""CALL iceberg.system.rebalance_index(
      table => 'drift.corpus', index_dir => '$idx',
      threshold => 2.0)""").collect().head
    assert(fired.getLong(0) == 1L, s"skew must trigger the rebuild: $fired")
    val post = recall()
    assert(post >= pre + 0.05 && post >= 0.95,
      s"the trained re-cluster must restore recall: $pre -> $post")
  }
}
