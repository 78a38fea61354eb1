package graft.ext

import graft.{SparkSpec, Tables}
import graft.pipeline.Snapshot
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Persisted inverted-index lifecycle pins: tokenize-once/query-many,
  * O(delta) refresh through the commit window, delete propagation that
  * SHIFTS the scores (df + corpus stats follow the corpus), the
  * signed-increment stats contract, upsert crash replay, and the
  * term-bucket fragment pruning that makes search O(queried buckets). */
class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def queryTerms = spark.createDataFrame(
    graft.queries.ExtQueries.Bm25Queries).toDF("query_id", "term")

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "rank", "doc_id", "score")
      .as[(String, Int, Long, Double)].collect().toSet

  test("build/search equals the derive-per-query bm25TopK bit-for-bit; " +
    "search refuses a stale index; fast-append refresh consumes " +
    "exactly the appended docs and re-equals") {
    val docs = Tables.documents(spark, sf)
    val root = Files.createTempDirectory("txtidx").toString
    val corpus = s"$root/corpus"
    val idx = s"$root/text"
    val v1 = docs.filter(col("doc_id") % 10 =!= 7).localCheckpoint()
    val tail = docs.filter(col("doc_id") % 10 === 7).localCheckpoint()
    Snapshot.createOrReplace(v1, corpus, keepVersions = 3)
    assert(TextIndex.build(spark, corpus, idx) == v1.count())

    val fromIndex = TextIndex.search(spark, corpus, idx, queryTerms,
      k = 10)
    assert(asSet(fromIndex)
      == asSet(TextOps.bm25TopK(v1, queryTerms, k = 10)),
      "persisted search must equal the derive-per-query scorer " +
        "bit-for-bit (shared formula)")

    // the postings scan must prune to the queried terms' buckets
    val explained = fromIndex.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*term_bucket".r
        .findFirstIn(explained).isDefined,
      s"search must prune unqueried term-bucket fragments:\n$explained")

    // corpus moves — search must refuse until refresh
    Snapshot.morCommit(spark, corpus, deletes = None,
      appends = Some(tail), operation = "append")
    val stale = intercept[IllegalStateException] {
      TextIndex.search(spark, corpus, idx, queryTerms, 10)
    }
    assert(stale.getMessage.contains("STALE"))

    assert(TextIndex.refresh(spark, corpus, idx) == tail.count())
    assert(TextIndex.refresh(spark, corpus, idx) == 0L,
      "a second refresh must be a no-op")
    assert(Snapshot.morVersions(TextIndex.postingsDir(idx)).nonEmpty,
      "the delta must land as a fast-append sidecar")
    assert(asSet(TextIndex.search(spark, corpus, idx, queryTerms, 10))
      == asSet(TextOps.bm25TopK(docs, queryTerms, k = 10)),
      "the refreshed index must equal the derive path over the grown " +
        "corpus — df, N and avgdl all moved with the append")
  }

  test("delete propagation: a removed doc leaves postings, doclens AND " +
    "the corpus stats — surviving docs' scores shift exactly as a " +
    "fresh derive computes them") {
    val docs = Tables.documents(spark, sf)
    val root = Files.createTempDirectory("txtdel").toString
    val corpus = s"$root/corpus"
    val idx = s"$root/text"
    Snapshot.createOrReplace(docs, corpus, keepVersions = 3)
    TextIndex.build(spark, corpus, idx)
    val victims = docs.filter(col("doc_id") % 10 === 3).localCheckpoint()
    Snapshot.morCommit(spark, corpus, deletes = Some(victims),
      appends = None, operation = "delete")
    assert(TextIndex.refresh(spark, corpus, idx) == 0L,
      "a delete-only window indexes nothing new")
    assert(TextIndex.meta(idx).map(_.corpusVersion)
      == Snapshot.currentVersion(corpus),
      "the propagated refresh must stamp the live version")
    assert(Snapshot.read(spark, TextIndex.postingsDir(idx))
      .filter(col("doc_id") % 10 === 3).isEmpty,
      "deleted docs' postings must be gone")
    assert(Snapshot.read(spark, TextIndex.doclensDir(idx))
      .filter(col("doc_id") % 10 === 3).isEmpty,
      "deleted docs' length rows must be gone")
    // signed-increment stats must equal a recompute from the survivors
    val survivors = docs.filter(col("doc_id") % 10 =!= 3)
    val st = Snapshot.read(spark, TextIndex.statsDir(idx)).head()
    val expect = survivors.agg(count(lit(1)),
      sum(size(TextOps.tokens(col("text"))).cast("long"))).head()
    assert(st.getLong(0) == expect.getLong(0)
      && st.getLong(1) == expect.getLong(1),
      s"stats must decrement exactly: $st vs $expect")
    val res = TextIndex.search(spark, corpus, idx, queryTerms, 10)
    assert(res.filter(col("doc_id") % 10 === 3).isEmpty,
      "a deleted doc must never be served")
    assert(asSet(res)
      == asSet(TextOps.bm25TopK(survivors, queryTerms, k = 10)),
      "survivor scores must reflect the smaller corpus (df/N/avgdl)")
  }

  test("update = delete + append of one key in ONE commit: the index " +
    "upserts — exactly one doclens row, the new text is what scores") {
    val docs = Tables.documents(spark, sf).localCheckpoint()
    val root = Files.createTempDirectory("txtupd").toString
    val corpus = s"$root/corpus"
    val idx = s"$root/text"
    Snapshot.createOrReplace(docs, corpus, keepVersions = 3)
    TextIndex.build(spark, corpus, idx)
    val targetId = docs.orderBy("doc_id").limit(1).head().getLong(0)
    val oldRow = docs.filter(col("doc_id") === targetId).localCheckpoint()
    val newRow = oldRow.withColumn("text",
      lit("zzzuniqueterm zzzuniqueterm plus a few more words"))
      .localCheckpoint()
    Snapshot.morCommit(spark, corpus, deletes = Some(oldRow),
      appends = Some(newRow), operation = "overwrite")
    assert(TextIndex.refresh(spark, corpus, idx) == 1L)
    assert(Snapshot.read(spark, TextIndex.doclensDir(idx))
      .filter(col("doc_id") === targetId).count() == 1L,
      "an updated key must hold exactly one doclens row")
    val qt = Seq(("u1", "zzzuniqueterm")).toDF("query_id", "term")
    val hit = TextIndex.search(spark, corpus, idx, qt, 5)
    assert(hit.count() == 1 && hit.head().getLong(1) == targetId,
      "the replacement text must be what the index serves")
    // stats moved by the length difference
    val st = Snapshot.read(spark, TextIndex.statsDir(idx)).head()
    val expect = Snapshot.read(spark, corpus).agg(count(lit(1)),
      sum(size(TextOps.tokens(col("text"))).cast("long"))).head()
    assert(st.getLong(0) == expect.getLong(0)
      && st.getLong(1) == expect.getLong(1))
  }

  test("crashed refresh (tables committed, meta not): the replay " +
    "self-heals as an UPSERT and recomputes stats from the healed " +
    "doclens — no duplicates, deletes stay applied, stats exact") {
    val docs = Tables.documents(spark, sf)
    val root = Files.createTempDirectory("txtcrash").toString
    val corpus = s"$root/corpus"
    val idx = s"$root/text"
    val v1 = docs.filter(col("doc_id") % 10 =!= 7).localCheckpoint()
    val tail = docs.filter(col("doc_id") % 10 === 7).localCheckpoint()
    Snapshot.createOrReplace(v1, corpus, keepVersions = 3)
    TextIndex.build(spark, corpus, idx)
    val metaFile = java.nio.file.Paths.get(idx, "_text_meta")
    val preMeta = Files.readAllBytes(metaFile)
    // the hardest window: a delete AND an append in one commit
    val victim = v1.orderBy("doc_id").limit(1).localCheckpoint()
    val victimId = victim.head().getLong(0)
    Snapshot.morCommit(spark, corpus, deletes = Some(victim),
      appends = Some(tail), operation = "overwrite")
    assert(TextIndex.refresh(spark, corpus, idx) == tail.count())
    Files.write(metaFile, preMeta)
    assert(TextIndex.refresh(spark, corpus, idx) == tail.count(),
      "the replay re-derives the same window")
    val doclens = Snapshot.read(spark, TextIndex.doclensDir(idx))
    assert(doclens.count() == docs.count() - 1,
      "the replay must neither duplicate rows nor resurrect the " +
        "deleted doc")
    assert(doclens.groupBy("doc_id").count()
      .filter(col("count") > 1).isEmpty,
      "no doc may hold more than one doclens row after the replay")
    assert(doclens.filter(col("doc_id") === victimId).isEmpty)
    val st = Snapshot.read(spark, TextIndex.statsDir(idx)).head()
    val expect = Snapshot.read(spark, corpus).agg(count(lit(1)),
      sum(size(TextOps.tokens(col("text"))).cast("long"))).head()
    assert(st.getLong(0) == expect.getLong(0)
      && st.getLong(1) == expect.getLong(1),
      "the crash replay must recompute stats exactly")
    assert(asSet(TextIndex.search(spark, corpus, idx, queryTerms, 10))
      == asSet(TextOps.bm25TopK(Snapshot.read(spark, corpus),
        queryTerms, k = 10)))
  }

  test("POSITIONAL index: phraseCount equals the derive-per-query " +
    "anchor scan (incl. a repeated-word phrase), survives a refresh " +
    "window, and a positionless index refuses phrase search") {
    val docs = Tables.documents(spark, sf)
    val root = Files.createTempDirectory("txtpos").toString
    val corpus = s"$root/corpus"
    val idx = s"$root/text"
    val phrases = Seq("p1" -> "join column", "p2" -> "batch batch")
    val v1 = docs.filter(col("doc_id") % 10 =!= 7).localCheckpoint()
    Snapshot.createOrReplace(v1, corpus, keepVersions = 3)
    TextIndex.build(spark, corpus, idx, positional = true)
    def hitsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("phrase_id", "doc_id", "n_hits")
        .as[(String, Long, Long)].collect().toSet
    val fromIndex = hitsOf(
      TextIndex.phraseCount(spark, corpus, idx, phrases))
    assert(fromIndex.nonEmpty, "fixture must contain the phrases")
    assert(fromIndex == hitsOf(TextOps.phraseCounts(v1, phrases)),
      "index phrase counts must equal the anchor scan")
    // "batch batch batch" = 2 overlapping occurrences of "batch
    // batch" — the repeated-word phrase must not double- or
    // under-count (each anchor needs BOTH term indexes)
    val triple = v1.filter(col("text").contains("batch batch batch"))
    if (!triple.isEmpty) {
      val id = triple.head().getLong(0)
      assert(fromIndex.exists { case (p, d, n) =>
        p == "p2" && d == id && n >= 2 })
    }
    // a refresh window extends the positional postings
    Snapshot.morCommit(spark, corpus, deletes = None,
      appends = Some(docs.filter(col("doc_id") % 10 === 7)),
      operation = "append")
    assert(TextIndex.refresh(spark, corpus, idx) > 0L)
    assert(hitsOf(TextIndex.phraseCount(spark, corpus, idx, phrases))
      == hitsOf(TextOps.phraseCounts(docs, phrases)),
      "refreshed positional postings must cover the appended docs")
    // BM25 search still serves from the positional layout
    assert(asSet(TextIndex.search(spark, corpus, idx, queryTerms, 10))
      == asSet(TextOps.bm25TopK(docs, queryTerms, k = 10)))
    // a positionless index refuses loudly
    val idx2 = s"$root/text2"
    TextIndex.build(spark, corpus, idx2)
    assert(intercept[IllegalStateException] {
      TextIndex.phraseCount(spark, corpus, idx2, phrases)
    }.getMessage.contains("no positions"))
  }

  test("refresh auto-compaction bounds both MOR component stacks " +
    "(sawtooth) without changing the index content") {
    val docs = Tables.documents(spark, sf)
    val root = Files.createTempDirectory("txtcomp").toString
    val corpus = s"$root/corpus"
    val idx = s"$root/text"
    Snapshot.createOrReplace(docs.filter(col("doc_id") % 5 === 0),
      corpus, keepVersions = 2)
    TextIndex.build(spark, corpus, idx)
    (1 to 4).foreach { w =>
      Snapshot.morCommit(spark, corpus, deletes = None,
        appends = Some(docs.filter(col("doc_id") % 5 === w)),
        operation = "append")
      assert(TextIndex.refresh(spark, corpus, idx,
        compactAfterCommits = 2) > 0L)
      Seq(TextIndex.postingsDir(idx), TextIndex.doclensDir(idx))
        .foreach(d => assert(Snapshot.morVersions(d).size < 2,
          s"the stack at $d must sawtooth under the threshold"))
    }
    assert(Snapshot.read(spark, TextIndex.doclensDir(idx)).count()
      == docs.count(), "compaction must not change the index")
    assert(asSet(TextIndex.search(spark, corpus, idx, queryTerms, 10))
      == asSet(TextOps.bm25TopK(docs, queryTerms, k = 10)),
      "the compacted index must serve identically")
  }

  test("a rebuild that died after ALL component swaps but before the " +
    "meta write (coherent tokens, unchanged corpus version, different " +
    "bucket geometry) is refused by search — not silently scored " +
    "with the old bucket count against new-layout postings") {
    val docs = Tables.documents(spark, sf).limit(200).localCheckpoint()
    val root = Files.createTempDirectory("txtidxmid").toString
    val corpus = s"$root/corpus"
    val idx = s"$root/text"
    Snapshot.createOrReplace(docs, corpus, keepVersions = 2)
    TextIndex.build(spark, corpus, idx, termBuckets = 4)
    val metaPath = java.nio.file.Paths.get(idx, "_text_meta")
    val oldMeta = Files.readAllBytes(metaPath)
    // the second build swaps all three components (new coherent
    // token, new 8-bucket layout)…
    TextIndex.build(spark, corpus, idx, termBuckets = 8)
    // …then "dies" before its meta write: restore the 4-bucket meta
    Files.write(metaPath, oldMeta)
    val e = intercept[IllegalStateException] {
      TextIndex.search(spark, corpus, idx, queryTerms, 10)
    }
    assert(e.getMessage.contains("MID-REBUILD"),
      s"search must refuse the unstamped components: ${e.getMessage}")
  }
}
