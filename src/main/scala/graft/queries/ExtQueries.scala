package graft.queries

import graft.Tables
import graft.ext.{DedupOps, Multimodal, Sketches, SimilarityOps, TextOps}
import graft.quality.{Expectations, Metrics}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Oracle-checked queries for the LLM-training-data extension operators
  * (SURVEY §2.7 X1–X6) over `documents.parquet` / `embeddings.parquet` /
  * `events.parquet`.
  *
  * The fixture corpus has no duplicates, so dedup queries run over
  * [[corpusWithTwins]]: the corpus unioned with deterministic exact
  * twins (`doc_id % 10 == 0` → id+100000) and near twins
  * (`doc_id % 10 == 5` → id+200000, last 5 words dropped) — both
  * mirrored 1:1 in the oracle CTE, so survivors and pair sets are fully
  * checked.
  *
  * Cross-engine determinism notes (see also RelationalQueries):
  *  - md5/sha256 of identical strings are identical;
  *  - int/int divisions and strict left-fold double sums are IEEE
  *    correctly-rounded op sequences → bit-identical;
  *  - `ln` (tf-idf) is the single not-formally-identical op; its output
  *    is quantized through DECIMAL(18,6) then compared as DOUBLE on both
  *    sides (DECIMAL bytes hash differently across engines);
  *  - generated SQL (simhash bits, language argmax) comes from the SAME
  *    Scala constants as the DataFrame code.
  */
object ExtQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Fixture capacity for the parameterized ANN paths (the operators
    * scale these with the corpus; 2000 sf0.1 vectors → 8-bit codes ≈
    * 8 rows/bucket, nlist 32 ≈ 62 rows/cell). */
  val LshBits = 8
  val LshTables = 2
  val IvfNlist = 32
  val IvfNprobe = 2

  /** Lloyd rounds for the k-means codebook trainer (X3e): enough to
    * show real refinement while the oracle's unrolled CTE chain stays
    * readable. */
  val KmeansIters = 2

  /** X3h random-projection output width: 64 → 16 dims, the same 4×
    * footprint lever as SQ8 but on the dimension axis. */
  val RpDim = 16

  /** X3g PQ geometry: 8 subspaces × 8 dims, 16 centroids each — 64
    * float dims → 8 sub-codes (32× compression), codebook small enough
    * for the oracle's unrolled replay. */
  val PqM = 8
  val PqDsub = 8
  val PqKsub = 16

  /** X6d expectation contract over `orders`: completeness/uniqueness
    * hold in the fixture; the price cap and status set are deliberately
    * tighter than the data so the audit exercises failures too. */
  val OrderExpectations: Seq[Expectations.Expectation] = Seq(
    Expectations.Complete("o_custkey"),
    Expectations.Unique(Seq("o_orderkey")),
    Expectations.InRange("o_totalprice", 1.0, 300000.0),
    Expectations.InSet("o_orderstatus", Seq("O", "F")),
    Expectations.Matches("o_orderpriority", "^[1-5]-[A-Z]"))

  /** BM25 keyword queries (X4e) — one (query_id, term) row per
    * keyword; the oracle's VALUES list is generated from the same
    * constant. */
  val Bm25Queries: Seq[(String, String)] = Seq(
    "k1" -> "data", "k1" -> "table",
    "k2" -> "spark", "k2" -> "stream",
    "k3" -> "fast", "k3" -> "slow", "k3" -> "value")

  /** X4e''' phrase fixture — (phrase_id, space-separated phrase);
    * p3 repeats a word, the anchor check's hardest case ("batch batch
    * batch" is TWO overlapping occurrences of "batch batch"). */
  val PhraseQueries: Seq[(String, String)] = Seq(
    "p1" -> "join column", "p2" -> "sort table scan",
    "p3" -> "batch batch")

  /** The one BM25 oracle (X4e) — shared by `q_bm25` and the
    * persisted-index lifecycle queries, parameterized on the corpus
    * slice (empty = all of documents; a WHERE clause replays a
    * delete-propagated corpus). The formula text stays symbolic
    * ((1.2 + 1.0) is an IEEE ADD at runtime in BOTH engines). */
  private def bm25OracleSql(corpusWhere: String): String = s"""
      WITH qt(query_id, term) AS (VALUES
        ${Bm25Queries.map { case (q, t) => s"('$q', '$t')" }
          .mkString(", ")}),
      tf AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl,
               w AS term, count(*) AS tf
        FROM (SELECT doc_id, text,
                     unnest(string_split(text, ' ')) AS w
              FROM documents $corpusWhere)
        GROUP BY doc_id, dl, term
      ),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      stats AS (
        SELECT count(DISTINCT doc_id) AS n,
               sum(len(string_split(text, ' '))) AS dlsum
        FROM documents $corpusWhere
      ),
      s AS (
        SELECT qt.query_id, tf.doc_id,
               CAST(
                 ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5)) *
                 (tf.tf * (1.2 + 1.0)) /
                 (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl /
                   (CAST(stats.dlsum AS DOUBLE) / stats.n)))
               AS DECIMAL(18,6)) AS s
        FROM tf JOIN qt USING (term) JOIN df USING (term)
        CROSS JOIN stats
      ),
      agg AS (
        SELECT query_id, doc_id, CAST(sum(s) AS DOUBLE) AS score
        FROM s GROUP BY query_id, doc_id
      ),
      r AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
        FROM agg
      )
      SELECT query_id, doc_id, rank, score
      FROM r WHERE rank <= 10
      ORDER BY query_id, rank"""

  /** X11d mix-planner fixture: 50/30/20 over three sources, budget 40 —
    * small enough that rates land strictly below 100 at every SF. */
  val MixTargets: Map[String, Double] =
    Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)
  val MixBudget = 40L

  /** DuckDB CASE twin of the mix-share dispatch, generated from
    * [[MixTargets]]. */
  private def mixShareSql: String =
    "CASE " + MixTargets.toSeq.sortBy(_._1).map { case (k, v) =>
      s"WHEN source = '$k' THEN $v" }.mkString(" ") + " ELSE 0.0 END"

  private def mixRatesCte: String = s"""
      mc AS (SELECT source, count(*) AS cnt FROM documents
             GROUP BY source),
      mt AS (SELECT source, cnt,
               CAST(floor(($mixShareSql) * $MixBudget) AS BIGINT)
                 AS quota
             FROM mc),
      mr AS (SELECT source, cnt, quota,
               CAST(least(100, floor(100 * quota / cnt)) AS BIGINT)
                 AS rate_pct
             FROM mt)"""

  // -------------------------------------------------------------------
  // Twin corpus (shared by X1/X2 queries)
  // -------------------------------------------------------------------

  def corpusWithTwins(docs: DataFrame): DataFrame = {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val base = docs.select(cols.map(col): _*)
    val exact = base.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 100000)
    val toks = split(col("text"), " ")
    val shortText = concat_ws(" ", slice(toks, lit(1), size(toks) - 5))
    val near = base.filter(col("doc_id") % 10 === 5)
      .withColumn("doc_id", col("doc_id") + 200000)
      .withColumn("text", shortText)
      .withColumn("n_chars", length(col("text")).cast(LongType))
    base.unionByName(exact).unionByName(near)
  }

  private val twinsCte: String = """
    twins AS (
      SELECT doc_id, text, lang, source, n_chars FROM documents
      UNION ALL
      SELECT doc_id + 100000, text, lang, source, n_chars
      FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 200000,
             array_to_string(w[1:len(w)-5], ' '),
             lang, source,
             CAST(length(array_to_string(w[1:len(w)-5], ' ')) AS BIGINT)
      FROM (SELECT *, string_split(text, ' ') AS w FROM documents)
      WHERE doc_id % 10 = 5
    )"""

  /** Embedding corpus with perturbed near-twins (X2c fixture):
    * vec_id % 50 == 0 → id+100000, per-dim +0.01·((i%3)-1), everything
    * cast to double. Shared by q_embed_near_dup / q_embed_near_dup_lsh. */
  def embTwins(emb: DataFrame): DataFrame = {
    val perturbed = transform(sequence(lit(1), lit(64)),
      i => element_at(col("embedding"), i).cast("double")
        + lit(0.01) * ((i % 3) - 1))
    val twins = emb.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        perturbed.as("embedding"))
    emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
      .unionByName(twins)
  }

  private val embTwinsCte: String = """
    corpus AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
      FROM embeddings
      UNION ALL
      SELECT vec_id + 100000,
             list_transform(range(1, 65),
               i -> embedding[i]::DOUBLE + (0.01)::DOUBLE * ((i % 3) - 1))
      FROM embeddings WHERE vec_id % 50 = 0
    )"""

  /** Shared CTE chain producing the MinHash/LSH near-dup `paired`
    * relation (twin corpus → shingles → banded buckets → candidates →
    * exact Jaccard) — consumed by q_near_dup and q_dup_clusters. */
  private lazy val nearDupCtes: String = s"""$twinsCte,
      toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM twins),
      sh AS (SELECT doc_id, ${shSql("w")} AS shingles FROM toks),
      sig AS (
        SELECT doc_id, shingles,
               list_transform(shingles,
                 x -> ('0x' || md5(x)[1:8])::BIGINT) AS bases
        FROM sh
      ),
      bands AS (${bandsSql("sig")}),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
      ),
      paired AS (
        SELECT id_a, id_b,
          len(list_intersect(sa.shingles, sb.shingles))::DOUBLE /
          (len(sa.shingles) + len(sb.shingles)
            - len(list_intersect(sa.shingles, sb.shingles)))::DOUBLE
          AS jaccard
        FROM cand
        JOIN sh sa ON sa.doc_id = id_a
        JOIN sh sb ON sb.doc_id = id_b
      )"""

  /** Decontamination CTE chain over `twins` (needs [[nearDupCtes]] in
    * scope for `bands`/`sh`), parameterized by the blocklist's WHERE
    * and the Jaccard threshold: ends with `dcont(cid)` = corpus ids
    * near-duplicating any blocklist doc. Per-doc independent, so it
    * composes with any upstream per-doc filter. */
  private def deconCtesFor(blkWhere: String, minJ: Double): String = s"""
      blk AS (SELECT doc_id, text FROM documents WHERE $blkWhere),
      btoks AS (SELECT doc_id, string_split(text, ' ') AS w FROM blk),
      bsh AS (SELECT doc_id, ${shSql("w")} AS shingles FROM btoks),
      bsig AS (
        SELECT doc_id, shingles,
               list_transform(shingles,
                 x -> ('0x' || md5(x)[1:8])::BIGINT) AS bases
        FROM bsh
      ),
      bbands AS (${bandsSql("bsig")}),
      dcand AS (
        SELECT DISTINCT c.doc_id AS cid, b.doc_id AS bid
        FROM bands c JOIN bbands b
          ON c.band = b.band AND c.band_key = b.band_key
      ),
      dcont AS (
        SELECT DISTINCT cid FROM dcand
        JOIN sh sc ON sc.doc_id = dcand.cid
        JOIN bsh sb ON sb.doc_id = dcand.bid
        WHERE len(list_intersect(sc.shingles, sb.shingles))::DOUBLE /
              (len(sc.shingles) + len(sb.shingles)
                - len(list_intersect(sc.shingles, sb.shingles)))::DOUBLE
              >= $minJ
      )"""

  /** The benchmark-blocklist instance shared by q_decontaminate and the
    * curation pipeline. */
  private lazy val deconCtes: String =
    deconCtesFor("doc_id % 10 = 0", 0.4)

  /** Curation CTE chain over `twins` (needs [[nearDupCtes]] +
    * [[deconCtes]] in scope): gate → dedup survivors → decontaminated
    * `clean(doc_id, source, b)` → quota `ranked` (rk ≤ 40 keeps). */
  private lazy val curationCtes: String = """
      q AS (
        SELECT *, len(string_split(text, ' ')) AS ntok,
               len(list_distinct(string_split(text, ' ')))::DOUBLE /
                 len(string_split(text, ' '))::DOUBLE AS dr
        FROM twins
      ),
      gated AS (
        SELECT doc_id, text, source FROM q
        WHERE ntok >= 10 AND dr >= 0.3
      ),
      hashed AS (
        SELECT *, sha256(trim(lower(text))) AS h FROM gated
      ),
      surv AS (
        SELECT doc_id FROM (
          SELECT doc_id,
                 row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
          FROM hashed)
        WHERE rn = 1
      ),
      clean AS (
        SELECT g.doc_id, g.source,
               ('0x' || md5(CAST(g.doc_id AS VARCHAR))[1:8])::BIGINT
                 % 100 AS b
        FROM gated g JOIN surv USING (doc_id)
        WHERE g.doc_id NOT IN (SELECT cid FROM dcont)
      ),
      ranked AS (
        SELECT *, row_number() OVER
          (PARTITION BY source ORDER BY b, doc_id) AS rk
        FROM clean
      )"""

  /** DuckDB twin of [[DedupOps.hammingDist]] — same per-position CASE
    * sum, generated from the same bit-width constant. */
  private def hammingSql(a: String, b: String): String =
    (1 to DedupOps.SimHashBits).map(i =>
      s"CASE WHEN $a[$i:$i] <> $b[$i:$i] THEN 1 ELSE 0 END")
      .mkString(" + ")

  /** The same per-position sum at [[Multimodal.DHashBits]] width, for
    * the perceptual-hash pairs oracle. */
  private def hamming64Sql(a: String, b: String): String =
    (1 to Multimodal.DHashBits).map(i =>
      s"CASE WHEN $a[$i:$i] <> $b[$i:$i] THEN 1 ELSE 0 END")
      .mkString(" + ")

  /** Shared oracle CTE chain recomputing [[Multimodal.imageDHash]] over
    * [[Multimodal.rampImageTable]] WITHOUT decoding: the ramp gray
    * value is closed-form in (id, x, y), and the +24 brightness shift
    * cancels in every gradient comparison, so the oracle omits it —
    * which is exactly the invariance the operator claims. Ends with
    * `hashes(media_id, dhash)`. */
  private val rampHashCtes: String = s"""
      ids AS (
        SELECT doc_id AS base, doc_id AS media_id FROM documents
        UNION ALL
        SELECT doc_id, doc_id + ${Multimodal.RampBrightTwin}
        FROM documents WHERE doc_id % 50 = 0
        UNION ALL
        SELECT doc_id, doc_id + ${Multimodal.RampJitterTwin}
        FROM documents WHERE doc_id % 70 = 0
      ),
      p AS (
        SELECT media_id,
               (base * 3) % 48 + 16 AS w,
               (base * 5) % 31 + 16 AS h,
               (base * 13) % 96
                 + CASE WHEN media_id >= ${Multimodal.RampJitterTwin}
                        THEN 1 ELSE 0 END AS a,
               (base * 7) % 9 + 3 AS bx,
               (base * 11) % 13 + 2 AS by
        FROM ids
      ),
      bits AS (
        SELECT media_id, y, x,
               CASE WHEN
                 (a + bx * (((x+1)*w)//9) + by * ((y*h)//8)
                    + ((((x+1)*w)//9) * ((y*h)//8))//7) % 96
                 > (a + bx * ((x*w)//9) + by * ((y*h)//8)
                    + (((x*w)//9) * ((y*h)//8))//7) % 96
               THEN '1' ELSE '0' END AS b
        FROM p CROSS JOIN range(0, 8) ty(y) CROSS JOIN range(0, 8) tx(x)
      ),
      hashes AS (
        SELECT media_id, string_agg(b, '' ORDER BY y, x) AS dhash
        FROM bits GROUP BY media_id
      )"""

  /** DuckDB shingle-set expression over a word-list column `w`. */
  private def shSql(w: String, n: Int = 3): String =
    s"""list_distinct(CASE WHEN len($w) < $n
         THEN [array_to_string($w, ' ')]
         ELSE list_transform(range(0, len($w) - $n + 1),
                i -> array_to_string($w[i+1:i+$n], ' ')) END)"""

  /** Shared curation chain (gate → dedup survivors → decontaminate →
    * quota 40/source), text retained — consumed by q_curation_pipeline
    * (+ split) and q_curation_packed (+ split + packing). Stage
    * boundaries are localCheckpoint'd: the dedup output feeds three
    * decontamination consumers and the clean corpus feeds the quota
    * histogram + data path; unpinned, the whole upstream chain
    * re-executes per consumer (measured 10.4 s vs 4 s). A cluster run
    * writes tables here (README "Materialize to tables"). */
  private def curatedCapped(s: SparkSession, d: String): DataFrame = {
    val corpus = corpusWithTwins(Tables.documents(s, d))
    val toks = split(col("text"), " ")
    val gated = corpus
      .filter(size(toks) >= 10 &&
        size(array_distinct(toks)).cast("double")
          / size(toks).cast("double") >= 0.3)
      .select(col("doc_id"), col("text"), col("source"))
    val deduped = DedupOps.exactDedup(gated)
      .drop("content_hash", "dup_count")
      .localCheckpoint()
    val block = Tables.documents(s, d)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text"))
    val clean = DedupOps.decontaminate(deduped, block, minJaccard = 0.4)
      .localCheckpoint()
    graft.ext.Sampling.quotaSample(clean, "doc_id", "source", n = 40)
  }

  // -------------------------------------------------------------------
  // Queries
  // -------------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    // X1 — exact dedup over content hash.
    "q_doc_dedup" -> ((s, d) =>
      DedupOps.exactDedup(corpusWithTwins(Tables.documents(s, d)))
        .select(col("doc_id"), col("content_hash"), col("dup_count"))
        .orderBy("doc_id")),

    // X4 — global word counts.
    "q_word_counts" -> ((s, d) =>
      TextOps.wordCounts(Tables.documents(s, d)).orderBy("word")),

    // X4 — tf-idf.
    "q_tfidf" -> ((s, d) =>
      TextOps.tfidf(Tables.documents(s, d)).orderBy("doc_id", "word")),

    // X4j — hashing-trick featurizer: fixed-dim sparse term vectors
    // with no vocabulary pass (the fastText/VW input shape); bucket =
    // engine-portable md5 hash mod 64.
    "q_feature_hash" -> ((s, d) =>
      TextOps.featureHash(Tables.documents(s, d), dim = 64)
        .orderBy("doc_id", "bucket")),

    // X4g — BPE pair statistics (round 1 of tokenizer induction):
    // frequency-weighted adjacent-char pair counts over the vocabulary.
    "q_bpe_pairs" -> ((s, d) =>
      TextOps.bpePairCounts(Tables.documents(s, d))
        .orderBy("lsym", "rsym")),

    // X4g' — BPE merge trainer, 8 rounds. Driver-coordinated argmax
    // loop (Clusters-style BSP); deterministic merge table,
    // oracle-checked against an 8-round CTE unroll (bpeRoundsSql) the
    // same way q_kmeans unrolls Lloyd.
    "q_bpe_merges" -> ((s, d) =>
      TextOps.bpeTrain(Tables.documents(s, d), merges = BpeMerges)
        .orderBy("rank")),

    // X4g'' — train 8 merges, then tokenize the corpus with them
    // scan-side: per-doc BPE token count next to the whitespace count
    // (the compression the tokenizer buys). Oracle re-derives the
    // merge table from the same unrolled CTE and counts v8 symbols.
    "q_bpe_tokenize" -> ((s, d) => {
      val merges = TextOps.bpeTrain(Tables.documents(s, d),
          merges = BpeMerges)
        .orderBy("rank").select("lsym", "rsym")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      Tables.documents(s, d).select(col("doc_id"),
        size(TextOps.tokens(col("text"))).as("n_words"),
        TextOps.bpeTokenCount(col("text"), merges).as("n_bpe_tokens"))
        .orderBy("doc_id")
    }),

    // X4f — unigram-NLL quality scores: per-doc average −ln p(word)
    // under the corpus's own unigram model; the DECIMAL-quantized sum
    // makes the double oracle-exact.
    "q_perplexity" -> ((s, d) =>
      TextOps.unigramNll(Tables.documents(s, d)).orderBy("doc_id")),

    // X4e — BM25 ranked keyword retrieval: the query-term broadcast
    // prunes the posting lists before any scoring; per-term scores are
    // DECIMAL-quantized so the per-doc sum is order-independent.
    "q_bm25" -> ((s, d) => {
      val qt = s.createDataFrame(Bm25Queries).toDF("query_id", "term")
      TextOps.bm25TopK(Tables.documents(s, d), qt, k = 10)
        .orderBy("query_id", "rank")
    }),

    // X4e' — PERSISTED inverted-index lifecycle (the text sibling of
    // q_pq_index/q_ivf_index): build tokenizes the 90% corpus into
    // term-bucket-partitioned postings, the held-out 10% lands as a
    // FAST-APPEND MOR commit — so the refresh's commit-window delta
    // discovery reads exactly the appended sidecar, never the corpus
    // — refresh indexes exactly the delta (REQUIRED, then a no-op),
    // and the search reads ONLY the queried terms' bucket fragments
    // (pruning REQUIRED via the formatted plan). The search scores
    // through the SAME shared formula as q_bm25 (TextOps.bm25Rank),
    // so the oracle is the full-corpus BM25 recompute.
    "q_text_index" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val root = java.nio.file.Files.createTempDirectory("txtidxq")
        .toString
      val corpus = s"$root/corpus"
      val idx = s"$root/text"
      val v1 = docs.filter(col("doc_id") % 10 =!= 7)
      graft.pipeline.Snapshot.createOrReplace(v1, corpus,
        keepVersions = 3)
      graft.ext.TextIndex.build(s, corpus, idx)
      graft.pipeline.Snapshot.morCommit(s, corpus, deletes = None,
        appends = Some(docs.filter(col("doc_id") % 10 === 7)),
        operation = "append")
      val delta = graft.ext.TextIndex.refresh(s, corpus, idx)
      require(delta == docs.count() - v1.count(),
        s"refresh must index exactly the appended docs: $delta")
      require(graft.ext.TextIndex.refresh(s, corpus, idx) == 0L,
        "a second refresh must be a no-op")
      val qt = s.createDataFrame(Bm25Queries).toDF("query_id", "term")
      val res = graft.ext.TextIndex.search(s, corpus, idx, qt, k = 10)
      val explained = res.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode
          .fromString("formatted"))
      require(explained.contains("PartitionFilters") &&
        "PartitionFilters: \\[[^\\]]*term_bucket".r
          .findFirstIn(explained).isDefined,
        s"the search must prune unqueried term buckets:\n$explained")
      res.orderBy("query_id", "rank")
    }),

    // X4e''' — PHRASE SEARCH from the POSITIONAL index: build stores
    // per-posting sorted position arrays (Lucene's positions file, as
    // a column), the held-out slice fast-appends and refresh extends
    // the positional postings, and the phrase read prunes to the
    // phrase terms' bucket fragments then runs the ANCHOR check (an
    // occurrence at a needs every term_idx present at a + idx; a
    // repeated-word phrase votes once per index). The oracle replays
    // the anchor method over zipped unnest positions in DuckDB —
    // integer counts, hash-exact.
    "q_phrase_search" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val root = java.nio.file.Files.createTempDirectory("txtphq")
        .toString
      val corpus = s"$root/corpus"
      val idx = s"$root/text"
      val v1 = docs.filter(col("doc_id") % 10 =!= 7)
      graft.pipeline.Snapshot.createOrReplace(v1, corpus,
        keepVersions = 3)
      graft.ext.TextIndex.build(s, corpus, idx, positional = true)
      graft.pipeline.Snapshot.morCommit(s, corpus, deletes = None,
        appends = Some(docs.filter(col("doc_id") % 10 === 7)),
        operation = "append")
      require(graft.ext.TextIndex.refresh(s, corpus, idx)
        == docs.count() - v1.count(),
        "refresh must index exactly the appended docs")
      val res = graft.ext.TextIndex.phraseCount(s, corpus, idx,
        PhraseQueries)
      val explained = res.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode
          .fromString("formatted"))
      require(explained.contains("PartitionFilters") &&
        "PartitionFilters: \\[[^\\]]*term_bucket".r
          .findFirstIn(explained).isDefined,
        s"phrase search must prune unqueried term buckets:\n$explained")
      res.orderBy("phrase_id", "doc_id")
    }),

    // X4e'' — DELETE PROPAGATION through the text index: a corpus
    // DELETE resolves from the window's sidecars (O(window delta),
    // no rebuild) into a doc-keyed equality delete on postings AND
    // doclens, and the 1-row stats table decrements by the removed
    // docs' lengths — REQUIRED: zero docs re-indexed, the version
    // stamped fresh, no deleted doc served. The oracle recomputes
    // BM25 over exactly the survivors: df, N and avgdl ALL shift, so
    // a stale stats table or a lingering posting would hash-mismatch.
    "q_text_index_delete" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val root = java.nio.file.Files.createTempDirectory("txtdelq")
        .toString
      val corpus = s"$root/corpus"
      val idx = s"$root/text"
      graft.pipeline.Snapshot.createOrReplace(docs, corpus,
        keepVersions = 3)
      graft.ext.TextIndex.build(s, corpus, idx)
      graft.pipeline.Snapshot.morCommit(s, corpus,
        deletes = Some(docs.filter(col("doc_id") % 10 === 3)),
        appends = None, operation = "delete")
      require(graft.ext.TextIndex.refresh(s, corpus, idx) == 0L,
        "a delete-only window must index nothing new")
      require(graft.ext.TextIndex.meta(idx).map(_.corpusVersion)
        == graft.pipeline.Snapshot.currentVersion(corpus),
        "the propagated refresh must stamp the live version")
      require(graft.pipeline.Snapshot.read(s,
          graft.ext.TextIndex.postingsDir(idx))
        .filter(col("doc_id") % 10 === 3).isEmpty,
        "deleted docs' postings must be gone")
      val qt = s.createDataFrame(Bm25Queries).toDF("query_id", "term")
      graft.ext.TextIndex.search(s, corpus, idx, qt, k = 10)
        .orderBy("query_id", "rank")
    }),

    // X4i/X1 — chunk-level exact dedup: the chunker composed into the
    // dedup family — repeated 64-token spans (boilerplate, license
    // headers, shared templates) collapse to their min-key survivor
    // ACROSS documents, the action version of X2g's span detection.
    "q_chunk_dedup" -> ((s, d) => {
      val chunks = TextOps.chunkDocs(Tables.documents(s, d))
        .select((col("doc_id") * 1000 + col("chunk_id")).as("chunk_key"),
          col("chunk_text"))
      DedupOps.exactDedup(chunks, idCol = "chunk_key",
          textCol = "chunk_text")
        .select(floor(col("chunk_key") / 1000).cast("long").as("doc_id"),
          (col("chunk_key") % 1000).as("chunk_id"), col("dup_count"))
        .orderBy("doc_id", "chunk_id")
    }),

    // X4e'/X4i — chunk-level retrieval (the RAG composition): chunker
    // → BM25 over the 64-token chunks, so a hit addresses a span, not
    // a whole document. chunk_key = doc_id·1000 + chunk_id keeps the
    // span addressable; split back out for the result table.
    "q_chunk_retrieval" -> ((s, d) => {
      val chunks = TextOps.chunkDocs(Tables.documents(s, d))
        .select((col("doc_id") * 1000 + col("chunk_id")).as("chunk_key"),
          col("chunk_text"))
      val qt = s.createDataFrame(Bm25Queries).toDF("query_id", "term")
      TextOps.bm25TopK(chunks, qt, k = 10, idCol = "chunk_key",
          textCol = "chunk_text")
        .select(col("query_id"),
          floor(col("chunk_key") / 1000).cast("long").as("doc_id"),
          (col("chunk_key") % 1000).as("chunk_id"),
          col("rank"), col("score"))
        .orderBy("query_id", "rank")
    }),

    // X4 — heuristic language ID.
    "q_lang_id" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          TextOps.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),

    // X4 — quality features.
    "q_quality" -> ((s, d) =>
      TextOps.qualityFeatures(Tables.documents(s, d)).orderBy("doc_id")),

    // X2 — MinHash/LSH near-dup pairs (banded join, no all-pairs).
    "q_near_dup" -> ((s, d) =>
      DedupOps.nearDuplicates(corpusWithTwins(Tables.documents(s, d)),
        minJaccard = 0.4)
        .orderBy("id_a", "id_b")),

    // X2i — edit-distance verified pairs: banded candidates scored by
    // Levenshtein over a 400-char prefix — the fuzzy-match/record-
    // linkage member of the dedup family (order-sensitive where
    // Jaccard is bag-of-shingles).
    "q_edit_distance" -> ((s, d) =>
      DedupOps.editDistancePairs(corpusWithTwins(Tables.documents(s, d)))
        .orderBy("id_a", "id_b")),

    // X2h — MinHash estimate-quality audit: signature-agreement
    // estimate vs exact Jaccard per banded candidate pair, with the
    // absolute error — the dial-vs-accuracy evidence for NumHashes.
    "q_minhash_est" -> ((s, d) =>
      DedupOps.minhashEstimates(corpusWithTwins(Tables.documents(s, d)))
        .orderBy("id_a", "id_b")),

    // X2d — EXACT n-gram Jaccard pairs via inverted shingle index with
    // a df-cap: the deterministic audit path beside X2's banded recall.
    "q_ngram_jaccard" -> ((s, d) =>
      DedupOps.ngramJaccardPairs(corpusWithTwins(Tables.documents(s, d)),
        minJaccard = 0.4)
        .orderBy("id_a", "id_b")),

    // X2d' (r11) — q_ngram_jaccard's df-cap census on the SAME twin
    // corpus: how many shingles (and how much posting mass) the cap
    // hides from the pair detector.
    "q_ngram_jaccard_audit" -> ((s, d) =>
      DedupOps.ngramJaccardAudit(corpusWithTwins(Tables.documents(s, d)))
        .orderBy("metric")),

    // X2e — decontamination: the twin corpus scrubbed of everything
    // near-duplicating the doc_id%10=0 blocklist (those originals and
    // their exact twins go; unrelated docs and the %10=5 near-twins
    // stay).
    "q_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val block = docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("text"))
      DedupOps.decontaminate(corpusWithTwins(docs), block,
        minJaccard = 0.4)
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // X2j — exact n-gram contamination: any verbatim 8-gram hit vs
    // the doc_id%10=0 blocklist scrubs the doc — those originals and
    // their exact twins go; the %10=5 near twins share no blocklist
    // 8-grams and stay. Membership-style decontamination beside X2e's
    // Jaccard threshold.
    "q_exact_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val block = docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("text"))
      DedupOps.exactContamination(corpusWithTwins(docs), block,
        shingleSize = 8)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // Composition flagship — quality gate → exact-dedup survivors →
    // decontamination → per-source quota (40) → train/test split, each
    // stage the library operator, end-to-end oracle-checked.
    "q_curation_pipeline" -> ((s, d) =>
      graft.ext.Sampling.trainTestSplit(curatedCapped(s, d), "doc_id",
          testPct = 10)
        .select(col("doc_id"), col("source"), col("split"))
        .orderBy("doc_id")),

    // Composition flagship, final artifact — the curated TRAIN split
    // packed into 256-token chunks: per-(chunk, doc) spans ready for a
    // sequence writer. Raw corpus → training sequences, one
    // oracle-checked query.
    "q_curation_packed" -> ((s, d) => {
      val train = graft.ext.Sampling
        .trainTestSplit(curatedCapped(s, d), "doc_id", testPct = 10)
        .filter(col("split") === "train")
        .select(col("doc_id"), col("text"))
      graft.ext.Packing.chunkSpans(
        graft.ext.Packing.packingPlan(train, budget = 256, shards = 8),
        budget = 256)
        .orderBy("doc_id", "chunk")
    }),

    // X1''/X2e' — incremental NEAR-dedup through the NON-BROADCAST
    // decontamination path (the archive is corpus-sized, so its bands
    // shuffle-join instead of broadcasting): scrub tonight's twins of
    // near-dups of the whole base corpus at 0.95 — exact twins
    // (jaccard 1.0) vanish, truncated near twins (≈0.93) survive.
    "q_incremental_near_dedup" -> ((s, d) => {
      val base = Tables.documents(s, d)
      val incoming = corpusWithTwins(base)
        .filter(col("doc_id") >= 100000)
      DedupOps.decontaminate(incoming,
          base.select(col("doc_id"), col("text")),
          minJaccard = 0.95, broadcastBlocklist = false)
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // X1' — incremental dedup: the twin slice (exact + near twins) as
    // tonight's ingest against the base corpus as the archive — exact
    // twins are archive duplicates and vanish, near twins survive.
    "q_incremental_dedup" -> ((s, d) => {
      val base = Tables.documents(s, d)
      val incoming = corpusWithTwins(base)
        .filter(col("doc_id") >= 100000)
      DedupOps.incrementalExactDedup(base, incoming)
        .select(col("doc_id"), col("content_hash"), col("dup_count"))
        .orderBy("doc_id")
    }),

    // X6' — per-source corpus health report: docs, token volume, mean
    // length, exact duplicate count (hash-distinct) — the dataset
    // owner's first query; one partial-agg shuffle on source.
    "q_corpus_report" -> ((s, d) => {
      val t = corpusWithTwins(Tables.documents(s, d))
        .withColumn("ntok", size(split(col("text"), " ")))
        .withColumn("h", TextOps.fingerprint(col("text")))
      t.groupBy("source").agg(
          count(lit(1)).as("docs"),
          sum("ntok").as("tokens"),
          (sum("ntok").cast("double") / count(lit(1)).cast("double"))
            .as("mean_tokens"),
          countDistinct("h").as("distinct_docs"))
        .withColumn("dup_docs", col("docs") - col("distinct_docs"))
        .orderBy("source")
    }),

    // X11d — training-mix planner: target shares + budget → per-source
    // quotas and keep-rates (src0 50% / src1 30% / src2 20% of 40).
    "q_mix_rates" -> ((s, d) =>
      graft.ext.Sampling.mixRates(Tables.documents(s, d), "source",
        MixTargets, MixBudget)
        .orderBy("source")),

    // X11d' — the planned mix APPLIED: planMix rates drive the
    // id-stable stratified sample (composition, end-to-end checked).
    "q_mix_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val rates = graft.ext.Sampling.planMix(docs, "source",
        MixTargets, MixBudget)
      graft.ext.Sampling.stratifiedSample(docs, "doc_id", "source", rates)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    }),

    // X16 — sequence-packing planner: id-stable shard, per-shard token
    // cumsum, fixed-budget chunk ids (concat-and-chunk, zero waste).
    "q_packing_plan" -> ((s, d) =>
      graft.ext.Packing.packingPlan(Tables.documents(s, d),
        budget = 256, shards = 8)
        .orderBy("doc_id")),

    // X16/X4g composed — the packing planner driven by the REAL BPE
    // tokenizer instead of the whitespace heuristic: train 8 merges on
    // the corpus, count BPE tokens per doc with the greedy-leftmost
    // fold, pack on THOSE counts. Oracle re-derives the merge list and
    // the counts via the unrolled CTE chain, then replays the cumsum.
    "q_packing_bpe" -> ((s, d) => {
      val merges = TextOps.bpeTrain(Tables.documents(s, d),
          merges = BpeMerges)
        .orderBy("rank").select("lsym", "rsym")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      val counted = Tables.documents(s, d).select(col("doc_id"),
        TextOps.bpeTokenCount(col("text"), merges).as("n_tokens"))
      graft.ext.Packing.packingPlanCounts(counted, budget = 256,
        shards = 8).orderBy("doc_id")
    }),

    // X16b — per-(chunk, doc) spans: what a chunk writer consumes;
    // boundary-spanning docs yield one row per overlapped chunk.
    "q_packing_spans" -> ((s, d) =>
      graft.ext.Packing.chunkSpans(
        graft.ext.Packing.packingPlan(Tables.documents(s, d),
          budget = 256, shards = 8), budget = 256)
        .orderBy("doc_id", "chunk")),

    // X13' — multi-signal duplicate clustering: edges from THREE
    // independent detectors (MinHash bands, SimHash prefixes, exact
    // n-gram Jaccard) unioned into ONE component run — the production
    // shape where each detector catches pairs the others miss and the
    // cluster survivor must be consistent across all of them.
    "q_multi_signal_clusters" -> ((s, d) => {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      // ONE corpus scan + ONE shingling shared by all three detectors
      // (r20, guide §1.2/§5): the MinHash and exact-n-gram detectors
      // consume the same distinct 3-shingle sets and SimHash
      // re-tokenizes text from the same checkpoint — r19 checkpointed
      // only the raw twin corpus and each detector re-scanned and
      // re-shingled it. The detectors still build CONCURRENTLY: each
      // construction runs eager internal checkpoints (signature /
      // posting tables), independent jobs the scheduler interleaves.
      val twins = graft.ext.Spread.widen(
        corpusWithTwins(Tables.documents(s, d)))
      val shingled = twins
        .select(col("doc_id"), col("text"),
          DedupOps.shingleSet(col("text"), 3).as("sh"))
        .localCheckpoint()
      // no .distinct() here: connectedComponents dedups its edge set
      // after the undirected doubling anyway — an extra pre-distinct
      // would just add a pair-keyed shuffle
      val detectors = Seq(
        Future(DedupOps.nearDuplicatesFromShingles(
          shingled.select("doc_id", "sh"), minJaccard = 0.4)
          .select("id_a", "id_b")),
        Future(DedupOps.simhashPairs(shingled, 6)
          .select("id_a", "id_b")),
        Future(DedupOps.ngramJaccardPairsFromShingles(
          shingled.select("doc_id", "sh"), minJaccard = 0.4)
          .select("id_a", "id_b")))
      val edges = Await.result(Future.sequence(detectors), Duration.Inf)
        .reduce(_ unionByName _)
      graft.ext.Clusters.connectedComponents(edges)
        .select(col("id").as("doc_id"), col("cluster_id"),
          (col("id") === col("cluster_id")).as("is_canonical"))
        .orderBy("doc_id")
    }),

    // X13 — duplicate clusters: connected components over the near-dup
    // pairs (min-label propagation); canonical survivor = smallest id.
    "q_dup_clusters" -> ((s, d) => {
      val pairs = DedupOps.nearDuplicates(
        corpusWithTwins(Tables.documents(s, d)), minJaccard = 0.4)
      graft.ext.Clusters.connectedComponents(pairs)
        .select(col("id").as("doc_id"), col("cluster_id"),
          (col("id") === col("cluster_id")).as("is_canonical"))
        .orderBy("doc_id")
    }),

    // X13'' — quality-based survivor: same clusters as X13, but the
    // canonical pick is the LONGEST member (n_chars, ties → min id) —
    // the keep-the-best-copy decision a curation pipeline makes,
    // where the min-id label is only the cluster's name.
    "q_cluster_canonical" -> ((s, d) => {
      val twins = corpusWithTwins(Tables.documents(s, d))
      val cl = graft.ext.Clusters.connectedComponents(
        DedupOps.nearDuplicates(twins, minJaccard = 0.4))
      val scored = cl.join(
        twins.select(col("doc_id").as("id"), col("n_chars")), "id")
      graft.ext.Clusters.canonical(scored, scoreCol = "n_chars")
        .select(col("id").as("doc_id"), col("cluster_id"),
          col("canonical_id"), col("is_canonical"))
        .orderBy("doc_id")
    }),

    // X2b — SimHash signatures.
    "q_simhash" -> ((s, d) =>
      DedupOps.withSimhash(Tables.documents(s, d)).orderBy("doc_id")),

    // X2b' — simhash near-dup pairs over the twin corpus (prefix-bucket
    // candidates, hamming ≤ 6 keeps exact twins at 0 and the
    // truncated near-twins' drift).
    "q_simhash_pairs" -> ((s, d) =>
      DedupOps.simhashPairs(corpusWithTwins(Tables.documents(s, d)), 6)
        .orderBy("id_a", "id_b")),

    // X2b'' — multi-table rotation: 4 rotated 8-bit prefix tables over
    // the same 32-bit signature, union-dedup candidates — recovers the
    // pairs the single prefix misses when the differing bits land in
    // the first 8 positions.
    "q_simhash_pairs_multi" -> ((s, d) =>
      DedupOps.simhashPairsMulti(
        corpusWithTwins(Tables.documents(s, d)), 6)
        .orderBy("id_a", "id_b")),

    // X3 — exact cosine top-k, broadcast queries, no corpus shuffle.
    "q_topk_sim" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("q_embedding"))
      SimilarityOps.bruteForceTopK(queries, emb, 5)
        .withColumnRenamed("rank", "rnk")
        .orderBy("query_id", "rnk")
    }),

    // X3b — sign-LSH bucketed ANN (the 100-TB path).
    "q_topk_bucketed" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("q_embedding"))
      SimilarityOps.bucketedTopK(queries, emb, 5)
        .withColumnRenamed("rank", "rnk")
        .orderBy("query_id", "rnk")
    }),

    // X4b — winnowing (rolling-hash) fingerprints: local-edit-robust
    // passage fingerprints, exploded to (doc, fingerprint) rows.
    "q_fingerprints" -> ((s, d) =>
      TextOps.fingerprintTable(Tables.documents(s, d))
        .orderBy("doc_id", "fp")),

    // X4i — RAG chunker: overlapping 64-token windows (16 overlap),
    // scan-side only — chunk ids/offsets/lengths plus the chunk text.
    "q_chunks" -> ((s, d) =>
      TextOps.chunkDocs(Tables.documents(s, d))
        .orderBy("doc_id", "chunk_id")),

    // X2g — duplicated-passage pairs over the winnow fingerprints:
    // df-capped posting-list self-join, pairs sharing >= 2 fingerprint
    // spans, containment = shared / min(|fps|) — the repeated-substring
    // dedup signal whole-doc hashing misses.
    "q_span_dup" -> ((s, d) =>
      DedupOps.spanDuplicates(Tables.documents(s, d))
        .orderBy("id_a", "id_b")),

    // X2g' (r11) — the df-cap OBSERVABILITY twin (the r10 100× soak
    // found the cap silently zeroing recall once family size exceeds
    // it): the winnow-fingerprint posting census under q_span_dup's
    // exact cap, integer-exact so the drop counts oracle-check.
    "q_span_dup_audit" -> ((s, d) =>
      DedupOps.spanDuplicateAudit(Tables.documents(s, d))
        .orderBy("metric")),

    // X3c — IVF top-k at parameterized capacity: md5-sampled codebook
    // (nlist=32), nearest-centroid assignment, queries probe nprobe=2
    // cells, exact rescoring inside probed cells.
    "q_topk_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = SimilarityOps.sampleCentroids(emb, IvfNlist)
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("q_embedding"))
      SimilarityOps.ivfTopK(queries, emb, centroids, 5, IvfNprobe)
        .withColumnRenamed("rank", "rnk")
        .orderBy("query_id", "rnk")
    }),

    // X3e — Lloyd k-means codebook training: 2 rounds of scan-side
    // argmin assignment (literal broadcast codebook, zero corpus
    // shuffle) + decimal-exact (centroid, dim) mean update, seeded by
    // the md5-sampled codebook. Output = refined centroid coordinates
    // (exploded to scalar cells) + cell populations.
    "q_kmeans" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val init = SimilarityOps.sampleCentroids(emb, IvfNlist)
      SimilarityOps.kmeansStats(emb, init, KmeansIters)
        .orderBy("centroid_id", "pos")
    }),

    // X3b' — parameterized random-hyperplane LSH top-k (the real scale
    // path: 8-bit codes × 2 hash tables = 16 seed-derived Rademacher
    // hyperplanes, generated from SimilarityOps.plane on BOTH engines).
    "q_topk_lsh" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("q_embedding"))
      SimilarityOps.hyperplaneTopK(queries, emb, 5, LshBits, LshTables)
        .withColumnRenamed("rank", "rnk")
        .orderBy("query_id", "rnk")
    }),

    // X3d — ANN recall audit ("measure, don't guess"): per-query
    // recall@5 of the hyperplane-LSH path against the exact brute-force
    // top-k — the capacity dial (bits × tables) gets a measured number,
    // not a hope. Both sides are deterministic, so the recall itself is
    // oracle-checked.
    "q_ann_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("q_embedding"))
      val exact = SimilarityOps.bruteForceTopK(queries, emb, 5)
        .select(col("query_id"), col("neighbor_id"))
      val approx = SimilarityOps
        .hyperplaneTopK(queries, emb, 5, LshBits, LshTables)
        .select(col("query_id"), col("neighbor_id"))
      val hits = exact.join(approx, Seq("query_id", "neighbor_id"),
          "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("hits"))
      queries.select(col("query_id"))
        .join(hits, Seq("query_id"), "left")
        .withColumn("hits", coalesce(col("hits"), lit(0L)))
        .withColumn("recall_at_5", col("hits").cast("double") / 5.0)
        .orderBy("query_id")
    }),

    // X3d' — the same recall audit for the IVF path: how much does
    // nprobe=2 of nlist=32 cells miss vs exact? Oracle-checked like
    // the LSH audit.
    "q_ann_recall_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = SimilarityOps.sampleCentroids(emb, IvfNlist)
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("q_embedding"))
      val exact = SimilarityOps.bruteForceTopK(queries, emb, 5)
        .select(col("query_id"), col("neighbor_id"))
      val approx = SimilarityOps
        .ivfTopK(queries, emb, centroids, 5, IvfNprobe)
        .select(col("query_id"), col("neighbor_id"))
      val hits = exact.join(approx, Seq("query_id", "neighbor_id"),
          "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("hits"))
      queries.select(col("query_id"))
        .join(hits, Seq("query_id"), "left")
        .withColumn("hits", coalesce(col("hits"), lit(0L)))
        .withColumn("recall_at_5", col("hits").cast("double") / 5.0)
        .orderBy("query_id")
    }),

    // X3d'' — the IVF recall audit under the TRAINED codebook (X3e):
    // the same nprobe=2 search with kmeans-refined centroids, so the
    // measured recall shows what Lloyd refinement buys over the raw
    // md5 sample — the before/after evidence for training the index.
    "q_ann_recall_kmeans" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val trained = SimilarityOps.kmeansRefine(emb,
        SimilarityOps.sampleCentroids(emb, IvfNlist), KmeansIters)
        .select(col("centroid_id"), col("c_embedding"))
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("q_embedding"))
      val exact = SimilarityOps.bruteForceTopK(queries, emb, 5)
        .select(col("query_id"), col("neighbor_id"))
      val approx = SimilarityOps
        .ivfTopK(queries, emb, trained, 5, IvfNprobe)
        .select(col("query_id"), col("neighbor_id"))
      val hits = exact.join(approx, Seq("query_id", "neighbor_id"),
          "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("hits"))
      queries.select(col("query_id"))
        .join(hits, Seq("query_id"), "left")
        .withColumn("hits", coalesce(col("hits"), lit(0L)))
        .withColumn("recall_at_5", col("hits").cast("double") / 5.0)
        .orderBy("query_id")
    }),

    // X2c — embedding-cosine near-dup over a corpus with perturbed
    // twins: sign-LSH bucketed self-join, exact-cosine threshold.
    "q_embed_near_dup" -> ((s, d) =>
      SimilarityOps.cosineNearDuplicates(
        embTwins(Tables.embeddings(s, d)), 0.99)
        .orderBy("id_a", "id_b")),

    // X3f' (r10) — the recall audit quantization earns: exact top-5
    // over the raw corpus vs top-5 over the int8-reconstructed corpus
    // with full-precision queries (asymmetric distance, the standard
    // quantized-retrieval read shape). The oracle re-derives the
    // reconstruction bit-for-bit and replays both searches.
    "q_ann_recall_sq8" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("q_embedding"))
      val exact = SimilarityOps.bruteForceTopK(queries, emb, 5)
        .select(col("query_id"), col("neighbor_id"))
      val dq = SimilarityOps.quantizeInt8(emb)
        .select(col("vec_id"),
          SimilarityOps.dequantizeInt8(col("codes"), col("scale"))
            .as("embedding"))
      val approx = SimilarityOps.bruteForceTopK(queries, dq, 5)
        .select(col("query_id"), col("neighbor_id"))
      val hits = exact.join(approx, Seq("query_id", "neighbor_id"),
          "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("hits"))
      queries.select(col("query_id"))
        .join(hits, Seq("query_id"), "left")
        .withColumn("hits", coalesce(col("hits"), lit(0L)))
        .withColumn("recall_at_5", col("hits").cast("double") / 5.0)
        .orderBy("query_id")
    }),

    // X3f (r10) — INT8 scalar quantization (FAISS SQ8 shape): absmax
    // per-vector scale, codes via floor(x/scale + 0.5) — deliberately
    // NOT round(), whose tie rule differs across engines — clamped to
    // [-127,127]. Scan-local array lambdas, zero shuffle; the oracle
    // recomputes codes bit-for-bit and both summary columns use the
    // integer/micros disciplines (exact code l2², micros-quantized
    // scale).
    "q_embed_quantize" -> ((s, d) => {
      val q = SimilarityOps.quantizeInt8(Tables.embeddings(s, d))
      q.select(col("vec_id"),
        concat_ws(",", col("codes")).as("codes_str"),
        aggregate(col("codes"), lit(0L),
          (acc, c) => acc + c.cast("long") * c.cast("long"))
          .as("code_l2sq"),
        floor(col("scale") * lit(1000000.0) + lit(0.5)).cast("long")
          .as("scale_micros"))
        .orderBy("vec_id")
    }),

    // X3h — Johnson–Lindenstrauss random projection: every embedding
    // reduced 64 → 16 dims through seed-derived ±1 Rademacher planes
    // (scan-local, zero shuffle). The projected coordinates are strict
    // left-fold sums, so the VALUES are oracle-checked bit-for-bit —
    // the oracle embeds the same literal planes.
    "q_rp_project" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          posexplode(SimilarityOps.rpProject(col("embedding"), RpDim))
            .as(Seq("pos", "val")))
        .orderBy("vec_id", "pos")),

    // X3h' — the recall audit the projection earns: exact top-5 in the
    // full 64-dim space vs top-5 computed ENTIRELY in the projected
    // 16-dim space (the candidate-generation read shape: project once,
    // search small, rescore survivors in full precision — this audit
    // deliberately skips the rescore to price the projection alone).
    "q_ann_recall_rp" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val proj = emb.select(col("vec_id"),
        SimilarityOps.rpProject(col("embedding"), RpDim).as("embedding"))
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("q_embedding"))
      val pQueries = proj.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("q_embedding"))
      val exact = SimilarityOps.bruteForceTopK(queries, emb, 5)
        .select(col("query_id"), col("neighbor_id"))
      val approx = SimilarityOps.bruteForceTopK(pQueries, proj, 5)
        .select(col("query_id"), col("neighbor_id"))
      val hits = exact.join(approx, Seq("query_id", "neighbor_id"),
          "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("hits"))
      queries.select(col("query_id"))
        .join(hits, Seq("query_id"), "left")
        .withColumn("hits", coalesce(col("hits"), lit(0L)))
        .withColumn("recall_at_5", col("hits").cast("double") / 5.0)
        .orderBy("query_id")
    }),

    // X3g — product quantization: every embedding encodes to 8
    // sub-codes against the deterministic md5-sampled codebook
    // (scan-side literal argmin, zero shuffle). Codes oracle-checked
    // bit-for-bit.
    "q_pq_encode" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.pqEncode(emb,
        SimilarityOps.pqCollectBook(emb, PqM, PqDsub, PqKsub), PqM, PqDsub)
        .select(col("vec_id"), concat_ws(",", col("codes")).as("codes_str"))
        .orderBy("vec_id")
    }),

    // X3g' — the recall audit PQ earns: exact inner-product top-5 vs
    // ADC top-5 over 8-byte codes (distance-table lookups in exact
    // BIGINT micros; the corpus side never touches an embedding).
    "q_ann_recall_pq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("q_embedding"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id")
        .orderBy(col("score").desc, col("neighbor_id"))
      val exact = emb.crossJoin(broadcast(queries))
        .filter(col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          SimilarityOps.dot(col("q_embedding"), col("embedding"))
            .as("score"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select("query_id", "neighbor_id")
      // one md5 sample + collect serves both the encoder's literals
      // and the ADC distance table
      val book = SimilarityOps.pqCollectBook(emb, PqM, PqDsub, PqKsub)
      val codes = SimilarityOps.pqEncode(emb, book, PqM, PqDsub)
      val approx = SimilarityOps.pqTopK(queries, codes,
        SimilarityOps.pqBookFrame(s, book), 5, PqDsub)
        .select(col("query_id"), col("neighbor_id"))
      val hits = exact.join(approx, Seq("query_id", "neighbor_id"),
          "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("hits"))
      queries.select(col("query_id"))
        .join(hits, Seq("query_id"), "left")
        .withColumn("hits", coalesce(col("hits"), lit(0L)))
        .withColumn("recall_at_5", col("hits").cast("double") / 5.0)
        .orderBy("query_id")
    }),

    // X3g'' — the PRODUCTION two-stage read: ADC generates a 4k-wide
    // candidate shortlist from 8-byte codes (the cheap pass over the
    // whole corpus), exact full-precision dot rescores ONLY the
    // shortlist — recall recovers toward exact at shortlist/corpus
    // bandwidth cost, the whole point of a compressed first stage.
    // X3c' — PERSISTED IVF index lifecycle (the cell-clustered
    // sibling of q_pq_index): build clusters the 90% corpus into
    // centroid-partitioned cell fragments, the held-out 10% lands as
    // a FAST-APPEND MOR commit — so the refresh's commit-window
    // delta discovery reads exactly the appended sidecar, never the
    // corpus — refresh assigns exactly the delta (REQUIRED, then a
    // no-op), and the search reads ONLY the probed cell fragments
    // (fragment pruning REQUIRED via the formatted plan). Oracle
    // replays the lifecycle: centroids from the pre-append subset,
    // assignment of everything against them, nprobe-cell exact
    // rescoring.
    "q_ivf_index" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val root = java.nio.file.Files.createTempDirectory("ivfidxq")
        .toString
      val corpus = s"$root/corpus"
      val idx = s"$root/ivf"
      val v1 = emb.filter(col("vec_id") % 10 =!= 7)
      graft.pipeline.Snapshot.createOrReplace(v1, corpus,
        keepVersions = 3)
      graft.ext.IvfIndex.build(s, corpus, idx, IvfNlist)
      graft.pipeline.Snapshot.morCommit(s, corpus, deletes = None,
        appends = Some(emb.filter(col("vec_id") % 10 === 7)),
        operation = "append")
      val delta = graft.ext.IvfIndex.refresh(s, corpus, idx)
      require(delta == emb.count() - v1.count(),
        s"refresh must assign exactly the appended vectors: $delta")
      require(graft.ext.IvfIndex.refresh(s, corpus, idx) == 0L,
        "a second refresh must be a no-op")
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("q_embedding"))
      val res = graft.ext.IvfIndex.search(s, corpus, idx, queries,
        k = 5, nprobe = IvfNprobe)
      val explained = res.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode
          .fromString("formatted"))
      require(explained.contains("PartitionFilters") &&
        "PartitionFilters: \\[[^\\]]*centroid_id".r
          .findFirstIn(explained).isDefined,
        s"the search must prune unprobed cell fragments:\n$explained")
      res.withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")
    }),

    // X3h' — IVF-PQ (the IVFADC composition, Jégou et al. 2011): the
    // persisted index stores PQ CODES clustered by centroid cell, and
    // the search pays three nested reductions — fragment pruning
    // (REQUIRED via the formatted plan), ADC over only the probed
    // cells, exact rerank of the shortlist. The oracle replays all
    // three joins; IvfPqIndexSpec additionally pins that full-probe
    // IVFADC degenerates to the plain PQ two-stage read.
    "q_ivfpq_index" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val root = java.nio.file.Files.createTempDirectory("ivfpqq")
        .toString
      val corpus = s"$root/corpus"
      val idx = s"$root/ivfpq"
      graft.pipeline.Snapshot.createOrReplace(emb, corpus,
        keepVersions = 2)
      graft.ext.IvfPqIndex.build(s, corpus, idx, IvfNlist,
        PqM, PqDsub, PqKsub)
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("q_embedding"))
      val res = graft.ext.IvfPqIndex.search(s, corpus, idx, queries,
        k = 5, nprobe = IvfNprobe, shortlist = 40)
      val explained = res.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode
          .fromString("formatted"))
      require(explained.contains("PartitionFilters") &&
        "PartitionFilters: \\[[^\\]]*centroid_id".r
          .findFirstIn(explained).isDefined,
        s"the ADC scan must prune unprobed cell fragments:\n$explained")
      res.orderBy("query_id", "rank")
    }),

    // X3c'' — DELETE PROPAGATION through the persisted-index family:
    // build clusters the FULL corpus, a DELETE commit removes a slice,
    // and refresh propagates it from the window's delete sidecars
    // (O(window delta), no rebuild, no corpus re-scan) as a key-scoped
    // equality delete on the cells table — REQUIRED: zero rows
    // re-assigned, the version gate stamped fresh, and the search
    // serving from STORED cell embeddings (the family that cannot mask
    // orphans with a corpus join) never returns a deleted vector.
    // Oracle replays build-time centroids (full-corpus md5 sample) and
    // the assignment, minus the deleted slice.
    "q_index_delete" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val root = java.nio.file.Files.createTempDirectory("ivfdelq")
        .toString
      val corpus = s"$root/corpus"
      val idx = s"$root/ivf"
      graft.pipeline.Snapshot.createOrReplace(emb, corpus,
        keepVersions = 3)
      graft.ext.IvfIndex.build(s, corpus, idx, IvfNlist)
      graft.pipeline.Snapshot.morCommit(s, corpus,
        deletes = Some(emb.filter(col("vec_id") % 10 === 3)),
        appends = None, operation = "delete")
      require(graft.ext.IvfIndex.refresh(s, corpus, idx) == 0L,
        "a delete-only window must assign nothing")
      require(graft.ext.IvfIndex.meta(idx).map(_.corpusVersion)
        == graft.pipeline.Snapshot.currentVersion(corpus),
        "the propagated refresh must stamp the live version")
      require(graft.pipeline.Snapshot.read(s,
          graft.ext.IvfIndex.cellsDir(idx))
        .filter(col("vec_id") % 10 === 3).isEmpty,
        "deleted vectors' cell rows must be gone")
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("q_embedding"))
      graft.ext.IvfIndex.search(s, corpus, idx, queries,
          k = 5, nprobe = IvfNprobe)
        .withColumnRenamed("rank", "rnk").orderBy("query_id", "rnk")
    }),

    // X3h'' — the recall audit the IVFADC composition ships with
    // (every approximate operator carries one): recall@5 of the
    // persisted three-stage read vs exact inner-product top-5, per
    // query. Two compounding approximations are being priced — cell
    // probing (a true neighbor outside the probed cells is
    // unreachable) and PQ quantization (mostly recovered by the
    // rerank) — so this audit bounds the composition, not either
    // layer alone.
    "q_ivfpq_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val root = java.nio.file.Files.createTempDirectory("ivfpqr")
        .toString
      val corpus = s"$root/corpus"
      val idx = s"$root/ivfpq"
      graft.pipeline.Snapshot.createOrReplace(emb, corpus,
        keepVersions = 2)
      graft.ext.IvfPqIndex.build(s, corpus, idx, IvfNlist,
        PqM, PqDsub, PqKsub)
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("q_embedding"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id")
        .orderBy(col("score").desc, col("neighbor_id"))
      val exact = emb.crossJoin(broadcast(queries))
        .filter(col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          SimilarityOps.dot(col("q_embedding"), col("embedding"))
            .as("score"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select("query_id", "neighbor_id")
      val approx = graft.ext.IvfPqIndex.search(s, corpus, idx, queries,
          k = 5, nprobe = IvfNprobe, shortlist = 40)
        .select("query_id", "neighbor_id")
      val hits = exact.join(approx, Seq("query_id", "neighbor_id"),
          "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("hits"))
      queries.select(col("query_id"))
        .join(hits, Seq("query_id"), "left")
        .withColumn("hits", coalesce(col("hits"), lit(0L)))
        .withColumn("recall_at_5", col("hits").cast("double") / 5.0)
        .orderBy("query_id")
    }),

    // X3g'' — PERSISTED PQ index lifecycle: build on the 90% corpus,
    // append the held-out 10% via a COPY-ON-WRITE replace — so the
    // refresh exercises the REBASED arm of its delta discovery (the
    // exact Snapshot.diff against the retained indexed version;
    // q_ivf_index exercises the fast-append arm) — refresh (REQUIRED
    // to encode exactly the delta as a fast-append sidecar, then be a
    // no-op), and serve the two-stage ADC+rerank read from the
    // PERSISTED codebook/codes tables. The oracle replays the whole
    // lifecycle: codebook sampled from the PRE-append subset, codes
    // over everything — the search result matches only if the stored
    // index, the incremental encode, and the staleness-gated read all
    // agree with the math.
    "q_pq_index" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val root = java.nio.file.Files.createTempDirectory("pqidxq")
        .toString
      val corpus = s"$root/corpus"
      val idx = s"$root/pq"
      val v1 = emb.filter(col("vec_id") % 10 =!= 7)
      graft.pipeline.Snapshot.createOrReplace(v1, corpus,
        keepVersions = 3)
      graft.ext.PqIndex.build(s, corpus, idx, PqM, PqDsub, PqKsub)
      graft.pipeline.Snapshot.createOrReplace(emb, corpus,
        keepVersions = 3)
      val delta = graft.ext.PqIndex.refresh(s, corpus, idx)
      require(delta == emb.count() - v1.count(),
        s"refresh must encode exactly the appended vectors: $delta")
      require(graft.ext.PqIndex.refresh(s, corpus, idx) == 0L,
        "a second refresh must be a no-op")
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("q_embedding"))
      graft.ext.PqIndex.search(s, corpus, idx, queries,
          k = 5, shortlist = 40)
        .orderBy("query_id", "rank")
    }),

    "q_ann_recall_pq_rerank" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("q_embedding"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id")
        .orderBy(col("score").desc, col("neighbor_id"))
      val exact = emb.crossJoin(broadcast(queries))
        .filter(col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          SimilarityOps.dot(col("q_embedding"), col("embedding"))
            .as("score"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select("query_id", "neighbor_id")
      val book = SimilarityOps.pqCollectBook(emb, PqM, PqDsub, PqKsub)
      val codes = SimilarityOps.pqEncode(emb, book, PqM, PqDsub)
      // stage 1: wide ADC shortlist; stage 2: exact rescore of the
      // shortlist only (join back to full vectors by id)
      val shortlist = SimilarityOps.pqTopK(queries, codes,
        SimilarityOps.pqBookFrame(s, book), 40, PqDsub)
        .select(col("query_id"), col("neighbor_id"))
      val rescored = shortlist
        .join(emb.select(col("vec_id").as("neighbor_id"),
          col("embedding")), "neighbor_id")
        .join(broadcast(queries), "query_id")
        .select(col("query_id"), col("neighbor_id"),
          SimilarityOps.dot(col("q_embedding"), col("embedding"))
            .as("score"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select("query_id", "neighbor_id")
      val hits = exact.join(rescored, Seq("query_id", "neighbor_id"),
          "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("hits"))
      queries.select(col("query_id"))
        .join(hits, Seq("query_id"), "left")
        .withColumn("hits", coalesce(col("hits"), lit(0L)))
        .withColumn("recall_at_5", col("hits").cast("double") / 5.0)
        .orderBy("query_id")
    }),

    // X2c' — the same pair search through the parameterized hyperplane
    // LSH (8-bit × 2 tables), pairs deduped across tables.
    "q_embed_near_dup_lsh" -> ((s, d) =>
      SimilarityOps.hyperplaneNearDuplicates(
        embTwins(Tables.embeddings(s, d)), 0.99, LshBits, LshTables)
        .orderBy("id_a", "id_b")),

    // X2f — SemDeDup semantic dedup: IVF-cell clustering (broadcast
    // 32-centroid codebook) + within-cell exact-cosine pairs at 0.99;
    // the perturbed twins land in their original's cell and are
    // dropped, originals survive. Survivor ID LIST is oracle-checked.
    "q_semantic_dedup" -> ((s, d) => {
      val corpus = embTwins(Tables.embeddings(s, d))
      val cents = SimilarityOps.sampleCentroids(corpus, IvfNlist)
      SimilarityOps.semanticDedup(corpus, cents, 0.99)
        .select("vec_id").orderBy("vec_id")
    }),

    // X2f' — semantic DECONTAMINATION: corpus = the plain embeddings,
    // blocklist = perturbed copies of every 50th vector (a paraphrased
    // "benchmark" no lexical scrub would catch); the contaminated
    // originals land in their twin's IVF cell and are dropped, every
    // other vector survives. Survivor ID list is the oracle.
    "q_semantic_decontaminate" -> ((s, d) => {
      val corpus = Tables.embeddings(s, d).select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double"))
          .as("embedding"))
      val blocklist = Tables.embeddings(s, d)
        .filter(col("vec_id") % 50 === 0)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(sequence(lit(1), lit(64)),
            i => element_at(col("embedding"), i).cast("double")
              + lit(0.01) * ((i % 3) - 1)).as("embedding"))
      val cents = SimilarityOps.sampleCentroids(corpus, IvfNlist)
      SimilarityOps.semanticDecontaminate(corpus, blocklist, cents, 0.99)
        .select("vec_id").orderBy("vec_id")
    }),

    // X5 — multimodal media table + stubbed decode features. The
    // histogram array is serialized to CSV for the compare (the
    // hash-compare layer can't sort list cells); the library keeps it
    // as a real array<int>.
    "q_multimodal" -> ((s, d) =>
      Multimodal.extractFeatures(
        Multimodal.mediaTable(Tables.documents(s, d)))
        .withColumn("histogram", concat_ws(",", col("histogram")))
        .orderBy("media_id")),

    // X5' (r10) — REAL image decode end-to-end: render a deterministic
    // two-band PNG per document through the JDK's actual PNG encoder,
    // decode the bytes back through the actual decoder (mapPartitions
    // batch shape, codec per partition), and emit exact per-channel
    // pixel sums. Every render parameter is a closed-form function of
    // the id, so the oracle recomputes the expected features WITHOUT
    // decoding — the decode round-trip is what the hash-compare then
    // proves. PNG is lossless: sums are exact integers, no float
    // discipline needed.
    "q_image_decode" -> ((s, d) =>
      Multimodal.decodeImages(
        Multimodal.imageTable(Tables.documents(s, d)))
        .orderBy("media_id")),

    // X5'''' (r10) — REAL audio decode: WAV/PCM16 payloads written and
    // read back through the JDK's own WAVE codec (javax.sound.sampled,
    // no external libs); samples are closed-form in (id, index), so
    // the oracle recomputes the exact absolute-amplitude sum over a
    // generated index range. Completes X5: image, video-frame and
    // audio arms all run real codecs end-to-end.
    "q_audio_decode" -> ((s, d) =>
      Multimodal.decodeAudio(
        Multimodal.audioTable(Tables.documents(s, d)))
        .orderBy("media_id")),

    // X5''' (r10) — REAL resize round trip: decode → nearest-neighbor
    // 8×8 thumbnail → re-encode PNG → decode again. Nearest-neighbor
    // on the two-band source always samples 4 top + 4 bottom rows
    // (y·h/8 < h/2 ⟺ y < 4 for every even h), so the thumbnail's
    // exact sums are closed-form and the whole two-codec round trip
    // hash-checks.
    "q_image_resize" -> ((s, d) =>
      Multimodal.decodeImages(
        Multimodal.resizeImages(
          Multimodal.imageTable(Tables.documents(s, d)), 8, 8))
        .orderBy("media_id")),

    // X5'' (r10) — REAL strided frame sampling: each "video" payload is
    // a frame-count header + length-prefixed PNG frames (frame f seeds
    // its render with id*31+f); sampling decodes every 2nd frame
    // through the JDK codec and SKIPS the rest by length prefix (no
    // pixel work — the point of sampling). Oracle recomputes each
    // sampled frame's exact feature row from the closed-form seed.
    "q_frame_sample" -> ((s, d) =>
      Multimodal.sampleFrames(
        Multimodal.videoTable(Tables.documents(s, d), frames = 6),
        stride = 2)
        .orderBy("media_id", "frame_idx")),

    // X5p (r11) — perceptual hash over REAL decoded pixels: gradient-
    // ramp PNGs (closed-form in the id) rendered and decoded through
    // the JDK codec, downsampled 9×8, dHash = 64 horizontal gradient
    // signs. The corpus plants brightness-shifted twins (different
    // bytes, SAME hash) and jitter twins (small Hamming distance) —
    // the duplicate classes checksum-based X1 dedup cannot see.
    "q_image_dhash" -> ((s, d) =>
      Multimodal.imageDHash(
        Multimodal.rampImageTable(Tables.documents(s, d)))
        .orderBy("media_id")),

    // X5p' (r11) — the multimodal near-dup pairs those hashes earn:
    // 16-bit prefix buckets (never all-pairs), full 64-bit Hamming
    // verify via two bit_count(xor) longs. Brightness twins land at
    // distance 0, jitter twins at small positive distances.
    "q_image_dup_pairs" -> ((s, d) =>
      Multimodal.dhashPairs(
        Multimodal.imageDHash(
          Multimodal.rampImageTable(Tables.documents(s, d))),
        maxDist = 6)
        .orderBy("id_a", "id_b")),

    // X6 — data-quality metrics table.
    "q_quality_metrics" -> ((s, d) =>
      Metrics.documentMetrics(Tables.documents(s, d))
        .unionByName(Metrics.eventMetrics(Tables.events(s, d)))
        .orderBy("metric")),

    // X6d — declarative expectation audit (the deequ role): five named
    // constraints over orders in ONE aggregation pass; two fail by
    // construction (price cap, status set) so both branches of
    // `passed` are exercised.
    "q_expectations" -> ((s, d) =>
      Expectations.audit(Tables.orders(s, d), OrderExpectations)
        .orderBy("check_name")),

    // X6d' — row-level quarantine: rows failing any row-level
    // expectation exit with a stable comma-joined `reasons` column;
    // zero shuffle (one codegen'd predicate projection).
    "q_quarantine" -> ((s, d) =>
      Expectations.quarantine(
        Tables.orders(s, d)
          .select("o_orderkey", "o_custkey", "o_totalprice",
            "o_orderstatus", "o_orderpriority"),
        OrderExpectations.filter(!_.isInstanceOf[Expectations.Unique]))
        .orderBy("o_orderkey")),

    // X6c — z-score anomaly gate: per-event-type outliers beyond 3σ,
    // moments from one exact integer-micros pass (order-free sums).
    "q_value_outliers" -> ((s, d) =>
      Metrics.valueOutliers(Tables.events(s, d)
          .select("event_id", "event_type", "value"),
        Seq("event_type"), "value", 3.0)
        .orderBy("event_id")),

    // X6b — ANALYZE-twin per-column statistics: nulls, KMV NDV,
    // numeric min/max, avg string length — the CBO stats table.
    "q_table_stats" -> ((s, d) =>
      Metrics.columnStats(Tables.documents(s, d),
        Seq("doc_id", "lang", "source", "n_chars"), k = 256)
        .orderBy("column")),

    // X7 — as-of join: attribute each click event to the user's latest
    // purchase at-or-before it (backward inclusive; nulls when none).
    // `ts` is compared at microsecond grain on both engines (DuckDB's
    // TIMESTAMP truncates the parquet nanos to µs on read; Spark's raw
    // long-nanos are floored to match), so the compare never touches
    // timestamp representation. Oracle is DuckDB's native ASOF JOIN.
    "q_asof" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("ts", expr("ts div 1000"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("purchase_id"),
          col("value").as("purchase_value"))
      graft.ext.AsOfJoin.backward(clicks, purchases, "user_id", "ts", "ts",
        Seq("purchase_id", "purchase_value"))
        .orderBy("event_id")
    }),

    // X7' — forward variant: each click to the user's NEXT purchase
    // at-or-after it ("did the click convert, and to what").
    "q_asof_forward" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("ts", expr("ts div 1000"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("purchase_id"),
          col("value").as("purchase_value"))
      graft.ext.AsOfJoin.forward(clicks, purchases, "user_id", "ts", "ts",
        Seq("purchase_id", "purchase_value"))
        .orderBy("event_id")
    }),

    // X10 — KMV distinct sketch: approximate distinct users per event
    // type, side by side with the exact count. The sketch arithmetic is
    // replayed verbatim by the oracle (same md5-derived 60-bit hashes),
    // so the APPROXIMATION itself is hash-compared, not just its error.
    "q_kmv_distinct" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val est = graft.ext.Sketches.kmvDistinct(
        ev, Seq("event_type"), "user_id", k = 64)
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_exact"))
      est.join(exact, Seq("event_type")).orderBy("event_type")
    }),

    // X10d — histogram quantile sketch: p50/p90 estimated from a
    // 64-bin counter table, laid beside the exact discrete quantiles
    // (the q_value_quantiles formula) with the absolute error — the
    // bounded-state quantile path for 100 TB, self-auditing like the
    // KMV and CMS rows.
    "q_hist_quantiles" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val est = graft.ext.Sketches.histQuantiles(ev, Seq("event_type"),
        "value", 64, Seq(("p50", 0.5), ("p90", 0.9)))
      val byVal = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy(col("value"), col("event_id"))
      val all = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type")
      val exact = ev.filter(col("value").isNotNull)
        .select(col("event_type"), col("value"), col("event_id"))
        .withColumn("rn", row_number().over(byVal))
        .withColumn("n", count(lit(1)).over(all))
        .filter(col("rn") === ceil(col("n") * lit(0.5))
          || col("rn") === ceil(col("n") * lit(0.9)))
        .select(col("event_type"),
          when(col("rn") === ceil(col("n") * lit(0.5)), lit("p50"))
            .otherwise(lit("p90")).as("quantile"),
          col("value").as("exact_value"))
      est.join(exact, Seq("event_type", "quantile"))
        .withColumn("abs_err", abs(col("est_value") - col("exact_value")))
        .orderBy("event_type", "quantile")
    }),

    // X10c — count-min sketch: token frequencies from a 4×16 counter
    // table beside the exact counts. The width is deliberately small
    // (vocab > width) so bucket collisions are live and the min-over-
    // rows estimate is exercised as a true OVERestimate; the sketch
    // arithmetic is replayed verbatim by the oracle.
    "q_cms_heavy_hitters" -> ((s, d) => {
      // ONE occurrence-sized pass (the exact frequency table); the
      // sketch is then built from vocabulary-sized counts — identical
      // counters by linearity, proven in SketchesSpec.
      val exact = Tables.documents(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n_exact"))
        .localCheckpoint()
      val sk = Sketches.cmsSketchWeighted(exact, "word",
        col("n_exact"), depth = 4, width = 16)
      val est = Sketches.cmsEstimate(exact, "word", sk, depth = 4,
        width = 16)
      est.join(exact, "word").orderBy("word")
    }),

    // X10b — KMV set operations: shingle-vocabulary overlap between two
    // source groups, estimated from two 256-long sketches alone (the
    // corpora are never joined). Deterministic md5 arithmetic → the
    // union/Jaccard/intersection ESTIMATES are oracle-checked
    // cell-for-cell, not just bounded.
    "q_kmv_overlap" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      def shingleStream(srcs: Seq[String]) = docs
        .filter(col("source").isInCollection(srcs))
        .select(explode(
          graft.ext.TextOps.shingles(col("text"), 3)).as("sh"))
      graft.ext.Sketches.kmvOverlap(
        shingleStream((0 to 4).map(i => s"src$i")),
        shingleStream((5 to 9).map(i => s"src$i")),
        "sh", k = 256)
    }),

    // X11 — deterministic hash-bucket train/test split over documents
    // (id-stable across reruns/partitionings, unlike randomSplit).
    "q_split" -> ((s, d) =>
      graft.ext.Sampling.trainTestSplit(
        Tables.documents(s, d).select("doc_id"), "doc_id", testPct = 10)
        .orderBy("doc_id")),

    // X11b — stratified sample: per-language keep-rates (the training
    // mix knob); id-stable bucket, pure scan-side filter, no shuffle.
    "q_stratified_sample" -> ((s, d) =>
      graft.ext.Sampling.stratifiedSample(
        Tables.documents(s, d).select("doc_id", "lang"),
        "doc_id", "lang",
        Map("en" -> 60, "de" -> 30, "fr" -> 10, "zh" -> 100))
        .orderBy("doc_id")),

    // X11c — per-source quota cap: ≤10 docs per source, selected by the
    // id-stable (bucket, id) order; only the boundary bucket is ranked.
    "q_source_quota" -> ((s, d) =>
      graft.ext.Sampling.quotaSample(
        Tables.documents(s, d).select("doc_id", "source"),
        "doc_id", "source", n = 10)
        .orderBy("doc_id")),

    // X4c — repetition signals (Gopher-style quality gates): top-token
    // fraction, duplicate-bigram fraction, distinct-token ratio. All
    // scan-local array lambdas, zero shuffle.
    "q_repetition" -> ((s, d) =>
      TextOps.repetitionFeatures(Tables.documents(s, d))
        .orderBy("doc_id")),

    // X4d — corpus token-length histogram per language (8-token buckets).
    "q_length_hist" -> ((s, d) =>
      TextOps.lengthHistogram(Tables.documents(s, d))
        .orderBy("lang", "bucket")),

    // X14 — PII scrubbing: deterministic synthetic PII (email, IP, card
    // number derived from doc_id) appended to each document, then
    // redacted by the shared regex set. Both engines run the SAME
    // patterns from Mask's constants; per-row compute, no shuffle.
    "q_pii_scrub" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.privacy.Mask.scrubPii(concat(
            col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com from 10.0."), col("doc_id") % 255,
            lit(".7 card 4111 1111 1111 1111"))).as("clean"))
        .orderBy("doc_id")),

    // X12 — range join: attribution windows. Every click in the hour
    // BEFORE each purchase of the same user (inclusive bounds), via the
    // bucketed interval join (bucket = window width → ≤2 buckets per
    // interval). Timestamps in µs as in q_asof.
    "q_range_join" -> ((s, d) => {
      val hourUs = 3600L * 1000000L
      val ev = Tables.events(s, d).withColumn("ts", expr("ts div 1000"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("event_id").as("click_id"))
      val windows = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"),
          (col("ts") - hourUs).as("w_start"), col("ts").as("w_end"),
          col("event_id").as("purchase_id"))
      graft.ext.RangeJoin.intervalJoin(clicks, windows, "user_id",
        "ts", "w_start", "w_end", hourUs)
        .select("user_id", "click_id", "purchase_id", "ts")
        .orderBy("purchase_id", "click_id")
    })
  )

  // -------------------------------------------------------------------
  // Oracle SQL
  // -------------------------------------------------------------------

  /** DuckDB twin of [[DedupOps.simhash]], generated from the same
    * constants. `hx` is the per-token 8-hex-digit list column. */
  private def simhashSql(hx: String): String = {
    val bits = (0 until DedupOps.SimHashBits).map { b =>
      val digitPos = b / 4 + 1
      val shift = 3 - b % 4
      s"""CASE WHEN 2 * list_sum(list_transform($hx,
            h -> ((strpos('0123456789abcdef', h[$digitPos:$digitPos]) - 1)
                  >> $shift) & 1)) - len($hx) > 0
          THEN '1' ELSE '0' END"""
    }
    s"concat(${bits.mkString(", ")})"
  }

  /** DuckDB twin of [[TextOps.langId]]'s fold (same marker table, same
    * strictly-greater tie behavior: first entry wins ties). */
  private def langIdSql(w: String): String = {
    def score(markers: Seq[String]): String =
      s"len(list_intersect($w, [${markers.map(m => s"'$m'").mkString(",")}]))"
    val scored = TextOps.LangMarkers.map { case (l, m) => (l, score(m)) }
    scored.tail.foldLeft((scored.head._2, s"'${scored.head._1}'")) {
      case ((bestS, bestL), (lang, s)) =>
        (s"(CASE WHEN $s > ($bestS) THEN $s ELSE ($bestS) END)",
          s"(CASE WHEN $s > ($bestS) THEN '$lang' ELSE $bestL END)")
    }._2
  }

  /** DuckDB twin of [[DedupOps.withSignature]]+[[DedupOps.bandedSignatures]]:
    * per-band SELECTs (UNION ALL) computing md5 over the band's affine
    * minhashes, generated from the same hashParams constants. */
  private def bandsSql(sigCte: String): String = {
    def mh(i: Int): String = {
      val (a, b) = DedupOps.hashParams(i)
      s"""list_min(list_transform(bases,
            h -> (h * $a + $b) % ${DedupOps.MinHashPrime}))"""
    }
    (0 until DedupOps.Bands).map { band =>
      val parts = (band * DedupOps.RowsPerBand until
        (band + 1) * DedupOps.RowsPerBand).map(mh)
      s"""SELECT doc_id, $band AS band,
            md5(${parts.mkString(" || '|' || ")}) AS band_key
          FROM $sigCte"""
    }.mkString(" UNION ALL ")
  }

  /** DuckDB sequential-fold dot product over 1-based list columns. */
  private def dotSql(a: String, b: String, dim: Int = 64): String =
    s"""list_reduce(list_transform(range(1, ${dim + 1}),
          i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y)"""

  private def cosSql(a: String, b: String, dim: Int = 64): String =
    s"(${dotSql(a, b, dim)}) / (sqrt(${dotSql(a, a, dim)}) * " +
      s"sqrt(${dotSql(b, b, dim)}))"

  /** DuckDB literal for [[SimilarityOps.rpPlane]] — the SAME ±1
    * Rademacher row the Spark plan embeds for projection coordinate j. */
  private def rpPlaneList(j: Int): String =
    "[" + SimilarityOps.rpPlane(j)
      .map(v => if (v > 0) "1" else "-1").mkString(",") + "]"

  /** DuckDB twin of one [[SimilarityOps.rpProject]] coordinate: the
    * strict left-fold dot of `e` against the literal plane. */
  private def rpCoordSql(e: String, j: Int): String =
    s"""list_reduce(list_transform(range(1, 65),
        i -> $e[i]::DOUBLE * (${rpPlaneList(j)}[i])::DOUBLE),
        (x, y) -> x + y)"""

  /** DuckDB list of all [[RpDim]] projected coordinates of `e`. */
  private def rpListSql(e: String): String =
    "[" + (0 until RpDim).map(j => rpCoordSql(e, j)).mkString(", ") + "]"

  /** Squared Euclidean distance with the exact association the Spark
    * plan uses: ((x·x − 2·(x·c)) + c·c), every dot a strict left fold. */
  private def d2Sql(x: String, c: String): String =
    s"(${dotSql(x, x)}) - 2 * (${dotSql(x, c)}) + (${dotSql(c, c)})"

  /** The PQ subspace slice of embedding `e` for subspace column `s`
    * (1-based inclusive DuckDB slice — [[PqDsub]] elements). */
  private def pqSliceSql(e: String, s: String): String =
    s"($e[($s*$PqDsub+1):($s*$PqDsub+$PqDsub)])"

  /** DuckDB replay of [[SimilarityOps.pqCodebook]] +
    * [[SimilarityOps.pqEncode]]: md5-ranked sample sliced per subspace,
    * then per-(vector, subspace) argmin by (d2, code). Emits
    * `pqbook(sub, code, c_sub)` and `pqenc(vec_id, sub, code)`. */
  /** The PQ codebook+encode CTE pair; `sampleWhere` scopes the
    * codebook's md5 sample (q_pq_index trains on the pre-append corpus
    * subset while encoding everything). */
  private def pqCteWith(sampleWhere: String): String = {
    val x = pqSliceSql("e.embedding", "b.sub")
    s"""
      pqsamp AS (
        SELECT embedding, rn - 1 AS code FROM (
          SELECT embedding, row_number() OVER
            (ORDER BY md5(CAST(vec_id AS VARCHAR))) AS rn
          FROM embeddings $sampleWhere)
        WHERE rn <= $PqKsub
      ),
      pqbook AS (
        SELECT s.sub, p.code,
               list_transform(${pqSliceSql("p.embedding", "s.sub")},
                 x -> x::DOUBLE) AS c_sub
        FROM pqsamp p
        CROSS JOIN (SELECT unnest(range(0, $PqM)) AS sub) s
      ),
      pqenc AS (
        SELECT vec_id, sub, code FROM (
          SELECT e.vec_id, b.sub, b.code,
                 row_number() OVER (PARTITION BY e.vec_id, b.sub
                   ORDER BY (${dotSql(x, x, PqDsub)}) -
                     2 * (${dotSql(x, "b.c_sub", PqDsub)}) +
                     (${dotSql("b.c_sub", "b.c_sub", PqDsub)}),
                   b.code) AS rn
          FROM embeddings e CROSS JOIN pqbook b)
        WHERE rn = 1
      )"""
  }

  private val pqCte: String = pqCteWith("")

  /** DuckDB replay of the RESIDUAL IVF-PQ index ([[graft.ext
    * .IvfPqIndex]], classic IVFADC): centroid sample, single-cell
    * assignment, residual lists `x − centroid(cell)` (exact
    * float→double casts, double subtraction — bit-identical to the
    * Spark `zip_with`), the PQ book trained on the md5-sampled
    * RESIDUALS, and the per-(vector, subspace) argmin encode over
    * residuals. Emits `c(centroid_id, ce)`, `res(vec_id, centroid_id,
    * r)`, `pqbook(sub, code, c_sub)`, `pqenc(vec_id, centroid_id,
    * sub, code)`. */
  private val ivfPqResidCte: String = {
    val x = pqSliceSql("r.r", "b.sub")
    s"""
      c AS (
        SELECT vec_id AS centroid_id, embedding AS ce
        FROM embeddings
        ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT $IvfNlist
      ),
      assign AS (
        SELECT vec_id, centroid_id FROM (
          SELECT e.vec_id, c.centroid_id,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${dotSql("e.embedding", "ce")} DESC,
                            c.centroid_id) AS rn
          FROM embeddings e CROSS JOIN c
        ) WHERE rn = 1
      ),
      res AS (
        SELECT e.vec_id, a.centroid_id,
               list_transform(range(1, 65),
                 i -> e.embedding[i]::DOUBLE - c.ce[i]::DOUBLE) AS r
        FROM embeddings e
        JOIN assign a ON a.vec_id = e.vec_id
        JOIN c ON c.centroid_id = a.centroid_id
      ),
      pqsamp AS (
        -- the book trains on ranks (nlist, nlist+ksub] of the md5
        -- order: DISJOINT from the centroid sample (a centroid's own
        -- residual is zero — overlap would degenerate the book)
        SELECT r AS embedding, rn - $IvfNlist - 1 AS code FROM (
          SELECT r, row_number() OVER
            (ORDER BY md5(CAST(vec_id AS VARCHAR))) AS rn
          FROM res)
        WHERE rn > $IvfNlist AND rn <= ${IvfNlist + PqKsub}
      ),
      pqbook AS (
        SELECT s.sub, p.code,
               list_transform(${pqSliceSql("p.embedding", "s.sub")},
                 x -> x::DOUBLE) AS c_sub
        FROM pqsamp p
        CROSS JOIN (SELECT unnest(range(0, $PqM)) AS sub) s
      ),
      pqenc AS (
        SELECT vec_id, centroid_id, sub, code FROM (
          SELECT r.vec_id, r.centroid_id, b.sub, b.code,
                 row_number() OVER (PARTITION BY r.vec_id, b.sub
                   ORDER BY (${dotSql(x, x, PqDsub)}) -
                     2 * (${dotSql(x, "b.c_sub", PqDsub)}) +
                     (${dotSql("b.c_sub", "b.c_sub", PqDsub)}),
                   b.code) AS rn
          FROM res r CROSS JOIN pqbook b)
        WHERE rn = 1
      )"""
  }

  /** The shared search tail of the residual IVFADC oracle: probed
    * cells with the `q·c_cell` partial dot, distance table, ADC =
    * qcd + Σ lookups, shortlist, exact rerank. Emits `q`, `qc`,
    * `dtab`, `ascored`, `aranked`, `shortlist`, `rescored`,
    * `rranked`. */
  private val ivfPqResidSearchCte: String = s"""
      q AS (
        SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings WHERE vec_id % 100 = 0
      ),
      qc AS (
        SELECT query_id, centroid_id, qcd FROM (
          SELECT q.query_id, c.centroid_id,
                 CAST(round((${dotSql("q.qe", "ce")}) * 1000000.0)
                   AS BIGINT) AS qcd,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY ${dotSql("q.qe", "ce")} DESC,
                            c.centroid_id) AS rn
          FROM q CROSS JOIN c
        ) WHERE rn <= $IvfNprobe
      ),
      dtab AS (
        SELECT q.query_id, b.sub, b.code,
               CAST(round((${dotSql(pqSliceSql("q.qe", "b.sub"), "b.c_sub",
                 PqDsub)}) * 1000000.0) AS BIGINT) AS pdot
        FROM q CROSS JOIN pqbook b
      ),
      ascored AS (
        SELECT d.query_id, e.vec_id AS neighbor_id,
               qc.qcd + sum(d.pdot) AS adc
        FROM pqenc e
        JOIN qc ON qc.centroid_id = e.centroid_id
        JOIN dtab d ON d.query_id = qc.query_id
          AND d.sub = e.sub AND d.code = e.code
        WHERE d.query_id <> e.vec_id
        GROUP BY d.query_id, e.vec_id, qc.qcd
      ),
      aranked AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rnk
        FROM ascored
      ),
      shortlist AS (SELECT query_id, neighbor_id FROM aranked
                    WHERE rnk <= 40),
      rescored AS (
        -- rank by the SAME quantized value as the engine's rerank
        SELECT s.query_id, s.neighbor_id,
               CAST(round((${dotSql("q.qe", "e.embedding")})
                 * 1000000.0) AS BIGINT) AS score_micros
        FROM shortlist s
        JOIN embeddings e ON e.vec_id = s.neighbor_id
        JOIN q ON q.query_id = s.query_id
      ),
      rranked AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id
           ORDER BY score_micros DESC, neighbor_id) AS rnk
        FROM rescored
      )"""

  /** One Lloyd round in DuckDB: nearest-centroid assignment of
    * `from` vectors against centroid CTE `cents` (argmin by (d2, id)),
    * then the DECIMAL(18,6)-exact per-(centroid, dim) mean. Emits the
    * `assign`/`means` CTE pair for round `n`. */
  private def lloydRoundSql(n: Int, cents: String): String = s"""
      a$n AS (
        SELECT vec_id, embedding, centroid_id FROM (
          SELECT e.vec_id, e.embedding, c.centroid_id,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${d2Sql("e.embedding", "ce")},
                            c.centroid_id) AS rn
          FROM embeddings e CROSS JOIN $cents c
        ) WHERE rn = 1
      ),
      m$n AS (
        SELECT centroid_id, i AS pos,
               CAST(SUM(CAST(ROUND(embedding[i]::DOUBLE * 1000000.0)
                 AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT(*) AS c_val,
               COUNT(*) AS cell_size
        FROM a$n CROSS JOIN range(1, 65) t(i)
        GROUP BY centroid_id, i
      ),
      c$n AS (
        SELECT centroid_id, list(c_val ORDER BY pos) AS ce
        FROM m$n GROUP BY centroid_id
      )"""

  /** DuckDB CTE chain unrolling `n` rounds of [[TextOps.bpeTrain]]'s
    * (count pairs → arg-max → merge-apply) loop — the exact technique
    * q_kmeans uses for Lloyd rounds. The greedy-leftmost merge fold
    * ([[TextOps]] `mergePair`) becomes a string-accumulator
    * `list_reduce`: symbols joined by '|' (never in the corpus charset,
    * lowercase+space only); when the accumulator's LAST symbol equals
    * lsym and the next element equals rsym, append rsym bare (extending
    * "…|l" to "…|lr" — the merge), else append "|x". The
    * `right(acc, len+1) = '|' || lsym` test is exactly "last symbol ==
    * lsym": a longer last symbol puts a non-'|' char at that offset, a
    * shorter one drags a mid-string '|' into the comparison — and a
    * just-merged "lr" can never re-match as "l", so merges don't chain,
    * matching the fold. Ties break (count DESC, lsym, rsym) on both
    * engines. */
  private def bpeRoundsSql(n: Int): String = {
    val v0 = """v0 AS (
        SELECT word, count(*) AS freq,
               list_transform(range(1, length(word)+1),
                 i -> word[i:i]) AS sym
        FROM (SELECT unnest(string_split(text, ' ')) AS word
              FROM documents)
        GROUP BY word)"""
    val rounds = (1 to n).map { k =>
      s"""p$k AS (
        SELECT pr.l AS lsym, pr.r AS rsym,
               CAST(sum(freq) AS BIGINT) AS pair_count
        FROM (SELECT freq, unnest(list_transform(range(1, len(sym)),
                       i -> {'l': sym[i], 'r': sym[i+1]})) AS pr
              FROM v${k - 1} WHERE len(sym) >= 2)
        GROUP BY pr.l, pr.r),
      m$k AS (SELECT lsym, rsym, pair_count FROM p$k
        ORDER BY pair_count DESC, lsym, rsym LIMIT 1),
      v$k AS (
        SELECT word, freq,
          string_split(list_reduce(sym, (acc, x) ->
            CASE WHEN (acc = m$k.lsym
                       OR right(acc, length(m$k.lsym)+1) = '|' || m$k.lsym)
                      AND x = m$k.rsym
                 THEN acc || x ELSE acc || '|' || x END), '|') AS sym
        FROM v${k - 1}, m$k)"""
    }
    (v0 +: rounds).mkString("WITH ", ",\n      ", "")
  }

  private val BpeMerges = 8

  /** DuckDB byte value at 1-based byte position `p` of an md5 hex
    * string column `h`. */
  private def byteAt(h: String, p: Int): String = {
    def digit(pos: Int) = s"(strpos('0123456789abcdef', $h[$pos:$pos]) - 1)"
    s"(${digit(2 * p - 1)} * 16 + ${digit(2 * p)})"
  }

  private val topkOracle: String = s"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe
      FROM embeddings WHERE vec_id % 100 = 0
    ),
    scored AS (
      SELECT query_id, e.vec_id AS neighbor_id,
             ${cosSql("qe", "e.embedding")} AS score
      FROM embeddings e, q WHERE e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT *, row_number() OVER
        (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, rnk, score
    FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk"""

  private def bucketSql(e: String): String =
    "concat(" + Seq(0, 1, 2, 3).map(d =>
      s"CASE WHEN $e[${d + 1}] >= 0 THEN '1' ELSE '0' END").mkString(", ") + ")"

  /** DuckDB literal for [[SimilarityOps.plane]] — the SAME seed-derived
    * ±1 coefficients the Spark plan embeds, so the two engines compute
    * identical projections by construction. */
  private def planeList(table: Int, bit: Int): String =
    "[" + SimilarityOps.plane(table, bit)
      .map(v => if (v > 0) "1" else "-1").mkString(",") + "]"

  /** DuckDB twin of [[SimilarityOps.hyperplaneBucket]]: per-bit strict
    * left-fold projection against the literal plane, >= 0 → '1'. */
  private def hyperBucketSql(e: String, table: Int): String =
    "concat(" + (0 until LshBits).map { j =>
      val proj = s"""list_reduce(list_transform(range(1, 65),
          i -> $e[i]::DOUBLE * (${planeList(table, j)}[i])::DOUBLE),
          (x, y) -> x + y)"""
      s"CASE WHEN ($proj) >= 0 THEN '1' ELSE '0' END"
    }.mkString(", ") + ")"

  /** Per-table bucket rows (UNION ALL), mirroring the Spark explode. */
  private def lshTablesSql(selectCols: String, e: String,
                           from: String): String =
    (0 until LshTables).map(t =>
      s"""SELECT $selectCols, $t AS tbl,
            ${hyperBucketSql(e, t)} AS bkt FROM $from""")
      .mkString(" UNION ALL ")

  private val topkBucketedOracle: String = s"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe,
             ${bucketSql("embedding")} AS bucket
      FROM embeddings WHERE vec_id % 100 = 0
    ),
    c AS (
      SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket
      FROM embeddings
    ),
    scored AS (
      SELECT query_id, c.vec_id AS neighbor_id,
             ${cosSql("qe", "c.embedding")} AS score
      FROM c JOIN q USING (bucket) WHERE c.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT *, row_number() OVER
        (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, rnk, score
    FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk"""

  val oracles: Map[String, String] = Map(
    "q_doc_dedup" -> s"""
      WITH $twinsCte,
      hashed AS (
        SELECT doc_id, sha256(trim(lower(text))) AS content_hash,
               text, lang, source, n_chars
        FROM twins
      ),
      ranked AS (
        SELECT doc_id, content_hash,
               count(*) OVER (PARTITION BY content_hash) AS dup_count,
               row_number() OVER
                 (PARTITION BY content_hash ORDER BY doc_id) AS rn
        FROM hashed
      )
      SELECT doc_id, content_hash, CAST(dup_count AS BIGINT) AS dup_count
      FROM ranked WHERE rn = 1 ORDER BY doc_id""",

    "q_word_counts" -> """
      SELECT w AS word, count(*) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY w ORDER BY word""",

    "q_feature_hash" -> """
      SELECT doc_id,
             ('0x' || md5(w)[1:8])::BIGINT % 64 AS bucket,
             count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents)
      GROUP BY 1, 2 ORDER BY doc_id, bucket""",

    "q_tfidf" -> """
      WITH tf AS (
        SELECT doc_id, w AS word, count(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY doc_id, w
      ),
      df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
      n AS (SELECT count(DISTINCT doc_id) AS n FROM documents)
      SELECT doc_id, word, tf, df,
             CAST(CAST(tf * (ln((n + 1.0) / (df + 1.0)) + 1.0)
               AS DECIMAL(18,6)) AS DOUBLE) AS tfidf
      FROM tf JOIN df USING (word), n
      ORDER BY doc_id, word""",

    "q_bpe_pairs" -> """
      WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
      ),
      wc AS (SELECT word, count(*) AS freq FROM tok GROUP BY word),
      p AS (
        SELECT unnest(list_transform(range(1, length(word)),
                 i -> {'lsym': word[i:i], 'rsym': word[i+1:i+1]})) AS pr,
               freq
        FROM wc WHERE length(word) >= 2
      )
      SELECT pr.lsym AS lsym, pr.rsym AS rsym,
             CAST(sum(freq) AS BIGINT) AS pair_count
      FROM p GROUP BY pr.lsym, pr.rsym
      ORDER BY lsym, rsym""",

    "q_bpe_merges" -> (bpeRoundsSql(BpeMerges) + "\n      " +
      (1 to BpeMerges).map(k =>
        s"SELECT $k AS rank, lsym, rsym, lsym || rsym AS merged, " +
          s"pair_count FROM m$k").mkString(" UNION ALL ") +
      " ORDER BY rank"),

    "q_bpe_tokenize" -> (bpeRoundsSql(BpeMerges) + s""",
      tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
              FROM documents)
      SELECT doc_id, CAST(count(*) AS INTEGER) AS n_words,
             CAST(sum(len(v$BpeMerges.sym)) AS INTEGER) AS n_bpe_tokens
      FROM tok JOIN v$BpeMerges USING (word)
      GROUP BY doc_id ORDER BY doc_id"""),

    "q_packing_bpe" -> (bpeRoundsSql(BpeMerges) + s""",
      tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
              FROM documents),
      bt AS (SELECT doc_id,
                    CAST(sum(len(v$BpeMerges.sym)) AS INTEGER)
                      AS n_tokens
             FROM tok JOIN v$BpeMerges USING (word)
             GROUP BY doc_id),
      t AS (
        SELECT doc_id, n_tokens,
               ('0x' || md5(CAST(doc_id AS VARCHAR))[1:8])::BIGINT % 8
                 AS shard
        FROM bt
      ),
      c AS (SELECT *, CAST(sum(n_tokens) OVER
              (PARTITION BY shard ORDER BY doc_id) AS BIGINT)
              AS end_off FROM t)
      SELECT doc_id, n_tokens, shard, end_off - n_tokens AS start_off,
             (end_off - n_tokens) // 256 AS chunk_id,
             (end_off - n_tokens) % 256 AS offset_in_chunk
      FROM c ORDER BY doc_id"""),

    "q_perplexity" -> """
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
      ),
      wc AS (SELECT word, count(*) AS wc FROM tok GROUP BY word),
      t AS (SELECT count(*) AS t FROM tok),
      s AS (
        SELECT doc_id,
               CAST(-ln(wc / t) AS DECIMAL(18,6)) AS nlp
        FROM tok JOIN wc USING (word) CROSS JOIN t
      )
      SELECT doc_id, count(*) AS n_tokens,
             CAST(sum(nlp) AS DOUBLE) / count(*) AS nll
      FROM s GROUP BY doc_id
      ORDER BY doc_id""",

    "q_bm25" -> bm25OracleSql(""),

    // X4e' — the persisted-index lifecycle serves the SAME shared
    // BM25 formula, so the oracle is the full-corpus recompute (the
    // final corpus after build + fast-append + refresh IS documents).
    "q_text_index" -> bm25OracleSql(""),

    // X4e'' — delete propagation: the final corpus is documents MINUS
    // the deleted slice, and df/N/avgdl all shift with it — the
    // oracle recomputes BM25 over exactly the survivors.
    "q_text_index_delete" ->
      bm25OracleSql("WHERE doc_id % 10 <> 3"),

    // X4e''' — the anchor method replayed: zipped unnests give
    // (word, 0-based pos), each occurrence votes for anchor
    // pos − term_idx, an anchor with n distinct voting indexes is one
    // phrase occurrence.
    "q_phrase_search" -> s"""
      WITH ph(phrase_id, term_idx, term) AS (VALUES
        ${PhraseQueries.flatMap { case (id, p) =>
          p.split(" ").zipWithIndex.map { case (t, i) =>
            s"('$id', $i, '$t')" } }.mkString(", ")}),
      phn(phrase_id, n) AS (VALUES
        ${PhraseQueries.map { case (id, p) =>
          s"('$id', ${p.split(" ").length})" }.mkString(", ")}),
      tok AS (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS w,
               unnest(range(0, len(string_split(text, ' ')))) AS pos
        FROM documents
      ),
      anch AS (
        SELECT ph.phrase_id, tok.doc_id,
               tok.pos - ph.term_idx AS anchor,
               count(DISTINCT ph.term_idx) AS k
        FROM tok JOIN ph ON tok.w = ph.term
        GROUP BY 1, 2, 3
      ),
      hits AS (
        SELECT a.phrase_id, a.doc_id
        FROM anch a JOIN phn USING (phrase_id) WHERE a.k = phn.n
      )
      SELECT phrase_id, doc_id, count(*) AS n_hits
      FROM hits GROUP BY 1, 2
      ORDER BY phrase_id, doc_id""",

    // X4i/X1 — chunker CTE + the q_doc_dedup survivor formula at chunk
    // granularity.
    "q_chunk_dedup" -> """
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS w,
               len(string_split(text, ' ')) AS n
        FROM documents
      ), ch AS (
        SELECT doc_id, unnest(range(0, CASE WHEN n <= 64 THEN 1
                 ELSE CAST(FLOOR((n - 64 + 48 - 1)::DOUBLE / 48.0)
                   AS BIGINT) + 1 END)) AS chunk_id, w
        FROM t
      ), chunks AS (
        SELECT doc_id * 1000 + chunk_id AS chunk_key,
               array_to_string(w[chunk_id*48+1 : chunk_id*48+64], ' ')
                 AS chunk_text
        FROM ch
      ), ranked AS (
        SELECT chunk_key,
               count(*) OVER (PARTITION BY
                 sha256(trim(lower(chunk_text)))) AS dup_count,
               row_number() OVER (PARTITION BY
                 sha256(trim(lower(chunk_text))) ORDER BY chunk_key)
                 AS rn
        FROM chunks
      )
      SELECT CAST(FLOOR(chunk_key / 1000) AS BIGINT) AS doc_id,
             chunk_key % 1000 AS chunk_id,
             CAST(dup_count AS BIGINT) AS dup_count
      FROM ranked WHERE rn = 1 ORDER BY doc_id, chunk_id""",

    // X4e'/X4i — chunker CTE feeding the identical BM25 chain, keyed
    // by chunk_key = doc_id*1000 + chunk_id.
    "q_chunk_retrieval" -> s"""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS w,
               len(string_split(text, ' ')) AS n
        FROM documents
      ), ch AS (
        SELECT doc_id, unnest(range(0, CASE WHEN n <= 64 THEN 1
                 ELSE CAST(FLOOR((n - 64 + 48 - 1)::DOUBLE / 48.0)
                   AS BIGINT) + 1 END)) AS chunk_id, w
        FROM t
      ), chunks AS (
        SELECT doc_id * 1000 + chunk_id AS chunk_key,
               array_to_string(w[chunk_id*48+1 : chunk_id*48+64], ' ')
                 AS chunk_text
        FROM ch
      ),
      qt(query_id, term) AS (VALUES
        ${Bm25Queries.map { case (q, t) => s"('$q', '$t')" }
          .mkString(", ")}),
      tf AS (
        SELECT chunk_key, len(string_split(chunk_text, ' ')) AS dl,
               tok AS term, count(*) AS tf
        FROM (SELECT chunk_key, chunk_text,
                     unnest(string_split(chunk_text, ' ')) AS tok
              FROM chunks)
        GROUP BY chunk_key, dl, term
      ),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      stats AS (
        SELECT count(DISTINCT chunk_key) AS n,
               sum(len(string_split(chunk_text, ' '))) AS dlsum
        FROM chunks
      ),
      s AS (
        SELECT qt.query_id, tf.chunk_key,
               CAST(
                 ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5)) *
                 (tf.tf * (1.2 + 1.0)) /
                 (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl /
                   (CAST(stats.dlsum AS DOUBLE) / stats.n)))
               AS DECIMAL(18,6)) AS s
        FROM tf JOIN qt USING (term) JOIN df USING (term)
        CROSS JOIN stats
      ),
      agg AS (
        SELECT query_id, chunk_key, CAST(sum(s) AS DOUBLE) AS score
        FROM s GROUP BY query_id, chunk_key
      ),
      r AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id ORDER BY score DESC, chunk_key) AS rank
        FROM agg
      )
      SELECT query_id,
             CAST(FLOOR(chunk_key / 1000) AS BIGINT) AS doc_id,
             chunk_key % 1000 AS chunk_id, rank, score
      FROM r WHERE rank <= 10
      ORDER BY query_id, rank""",

    "q_lang_id" -> s"""
      SELECT doc_id, lang, ${langIdSql("string_split(text, ' ')")}
        AS lang_pred
      FROM documents ORDER BY doc_id""",

    "q_quality" -> s"""
      WITH t AS (SELECT *, string_split(text, ' ') AS w FROM documents)
      SELECT doc_id,
        CAST(len(w) AS INT) AS n_tokens,
        CAST(length(text) AS INT) AS n_chars,
        (length(text) - len(w) + 1)::DOUBLE / len(w)::DOUBLE
          AS mean_token_len,
        len(list_intersect(w, ['a','the']))::DOUBLE / len(w)::DOUBLE
          AS stopword_presence,
        len(list_distinct(w))::DOUBLE / len(w)::DOUBLE AS distinct_ratio,
        CAST(len(regexp_extract_all(lower(text),
          '${TextOps.TokenRegex}')) AS INT) AS regex_tokens
      FROM t ORDER BY doc_id""",

    "q_near_dup" -> s"""
      WITH $nearDupCtes
      SELECT id_a, id_b, jaccard FROM paired
      WHERE jaccard >= 0.4 ORDER BY id_a, id_b""",

    // X2i — the banded `cand` pairs scored by Levenshtein over the
    // 400-char prefix, capped at 100 edits.
    "q_edit_distance" -> s"""
      WITH $nearDupCtes,
      pfx AS (SELECT doc_id, substr(text, 1, 400) AS p FROM twins)
      SELECT id_a, id_b,
             CAST(levenshtein(a.p, b.p) AS INT) AS edit_dist
      FROM cand
      JOIN pfx a ON a.doc_id = id_a
      JOIN pfx b ON b.doc_id = id_b
      WHERE levenshtein(a.p, b.p) <= 100
      ORDER BY id_a, id_b""",

    // X2h — the same candidate/verify chain, plus per-pair signature
    // agreement: estimate = matching minhash positions / NumHashes.
    "q_minhash_est" -> {
      def mh(i: Int): String = {
        val (a, b) = DedupOps.hashParams(i)
        s"""list_min(list_transform(bases,
              h -> (h * $a + $b) % ${DedupOps.MinHashPrime}))"""
      }
      val sigList = (0 until DedupOps.NumHashes).map(mh).mkString(", ")
      val agree = (1 to DedupOps.NumHashes).map(i =>
        s"CASE WHEN a.msig[$i] = b.msig[$i] THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""
      WITH $nearDupCtes,
      msig AS (SELECT doc_id, [$sigList] AS msig FROM sig)
      SELECT id_a, id_b, matches, est_jaccard, jaccard,
             abs(est_jaccard - jaccard) AS abs_err
      FROM (
        SELECT p.id_a, p.id_b, ($agree) AS matches,
               ($agree)::DOUBLE / ${DedupOps.NumHashes}.0 AS est_jaccard,
               p.jaccard
        FROM paired p
        JOIN msig a ON a.doc_id = p.id_a
        JOIN msig b ON b.doc_id = p.id_b
      ) ORDER BY id_a, id_b"""
    },

    // X2d — exact inverted-index twin: posting list → df cap (50) →
    // shared-shingle candidate join → count intersection → Jaccard over
    // the retained sets. Same df cap and threshold as the Spark plan.
    "q_ngram_jaccard" -> s"""
      WITH $twinsCte,
      toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM twins),
      sh AS (SELECT doc_id, ${shSql("w")} AS shingles FROM toks),
      posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
      dfc AS (SELECT shingle, count(*) AS df FROM posting GROUP BY shingle),
      keep AS (
        SELECT p.doc_id, p.shingle
        FROM posting p JOIN dfc ON p.shingle = dfc.shingle
        WHERE dfc.df <= 50
      ),
      sizes AS (SELECT doc_id, count(*) AS sz FROM keep GROUP BY doc_id),
      ipairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS icnt
        FROM keep a JOIN keep b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      )
      SELECT id_a, id_b,
             icnt::DOUBLE / (sa.sz + sb.sz - icnt)::DOUBLE AS jaccard
      FROM ipairs
      JOIN sizes sa ON sa.doc_id = ipairs.id_a
      JOIN sizes sb ON sb.doc_id = ipairs.id_b
      WHERE icnt::DOUBLE / (sa.sz + sb.sz - icnt)::DOUBLE >= 0.4
      ORDER BY id_a, id_b""",

    // q_ngram_jaccard's shingle chain, rolled up to the df census
    "q_ngram_jaccard_audit" -> s"""
      WITH $twinsCte,
      toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM twins),
      sh AS (SELECT doc_id, ${shSql("w")} AS shingles FROM toks),
      posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
      dfc AS (SELECT shingle, count(*) AS df FROM posting
              GROUP BY shingle)
      SELECT metric, value FROM (
        SELECT 'fp_postings' AS metric,
               CAST(coalesce(sum(df), 0) AS BIGINT) AS value FROM dfc
        UNION ALL
        SELECT 'fp_distinct', CAST(count(*) AS BIGINT) FROM dfc
        UNION ALL
        SELECT 'fp_dropped_distinct',
               CAST(coalesce(sum(CASE WHEN df > 50 THEN 1 ELSE 0 END),
                 0) AS BIGINT) FROM dfc
        UNION ALL
        SELECT 'fp_dropped_postings',
               CAST(coalesce(sum(CASE WHEN df > 50 THEN df ELSE 0 END),
                 0) AS BIGINT) FROM dfc
      ) ORDER BY metric""",

    // X2e — decontamination twin: corpus bands × blocklist bands on
    // (band, band_key), exact-Jaccard verify vs blocklist shingle sets,
    // NOT IN scrub. Reuses the near-dup CTE chain for the corpus side.
    "q_decontaminate" -> s"""
      WITH $nearDupCtes,
      $deconCtes
      SELECT doc_id, n_chars FROM twins
      WHERE doc_id NOT IN (SELECT cid FROM dcont)
      ORDER BY doc_id""",

    // X2j — exact-contamination twin: md5 of each 8-gram on both
    // sides, membership join, any hit scrubs the doc.
    "q_exact_decontaminate" -> s"""
      WITH $twinsCte,
      toks8 AS (SELECT doc_id, string_split(text, ' ') AS w FROM twins),
      csh AS (SELECT doc_id, md5(sh) AS h
              FROM (SELECT doc_id, unnest(${shSql("w", 8)}) AS sh
                    FROM toks8)),
      btoks AS (SELECT doc_id, string_split(text, ' ') AS w
                FROM documents WHERE doc_id % 10 = 0),
      bsh AS (SELECT DISTINCT md5(sh) AS h
              FROM (SELECT unnest(${shSql("w", 8)}) AS sh FROM btoks)),
      hits AS (SELECT doc_id FROM csh JOIN bsh USING (h)
               GROUP BY doc_id HAVING count(*) >= 1)
      SELECT doc_id, source, n_chars FROM twins
      WHERE doc_id NOT IN (SELECT doc_id FROM hits)
      ORDER BY doc_id""",

    // Composition flagship — the full curation chain over one corpus:
    // quality gate → exact-dedup survivors → decontamination scrub →
    // per-source quota → train/test split. Every stage is per-doc
    // independent of the others' filtering EXCEPT dedup (whole
    // duplicate groups share text, so they pass/fail the gate
    // together) and quota (computed over exactly the arriving set on
    // both engines) — the oracle chains the same algebra.
    "q_curation_pipeline" -> s"""
      WITH $nearDupCtes,
      $deconCtes,
      $curationCtes
      SELECT doc_id, source,
             CASE WHEN b < 10 THEN 'test' ELSE 'train' END AS split
      FROM ranked WHERE rk <= 40 ORDER BY doc_id""",

    // Final artifact twin: curated train docs → packing plan → spans.
    "q_curation_packed" -> s"""
      WITH $nearDupCtes,
      $deconCtes,
      $curationCtes,
      cur AS (SELECT doc_id FROM ranked WHERE rk <= 40 AND b >= 10),
      pt AS (
        SELECT t.doc_id,
               CAST(len(string_split(t.text, ' ')) AS INT) AS n_tokens,
               ('0x' || md5(CAST(t.doc_id AS VARCHAR))[1:8])::BIGINT % 8
                 AS shard
        FROM twins t JOIN cur USING (doc_id)
      ),
      pc AS (SELECT *, CAST(sum(n_tokens) OVER
               (PARTITION BY shard ORDER BY doc_id) AS BIGINT)
               AS end_off FROM pt),
      pp AS (SELECT doc_id, n_tokens, shard,
                    end_off - n_tokens AS start_off, end_off FROM pc),
      pe AS (
        SELECT doc_id, n_tokens, shard, start_off,
               unnest(range(start_off // 256, (end_off - 1) // 256 + 1))
                 AS chunk
        FROM pp
      )
      SELECT doc_id, n_tokens, shard, start_off, chunk,
             greatest(chunk * 256, start_off) - start_off AS tok_from,
             least((chunk + 1) * 256, start_off + n_tokens) - start_off
               AS tok_to
      FROM pe ORDER BY doc_id, chunk""",

    // X1''/X2e' — incremental near-dedup twin: whole-corpus blocklist,
    // 0.95 threshold, corpus restricted to the twin slice.
    "q_incremental_near_dedup" -> s"""
      WITH $nearDupCtes,
      ${deconCtesFor("1 = 1", 0.95)}
      SELECT doc_id, n_chars FROM twins
      WHERE doc_id >= 100000
        AND doc_id NOT IN (SELECT cid FROM dcont)
      ORDER BY doc_id""",

    // X1' — incremental twin: in-batch survivor ranking, then NOT IN
    // the archive's distinct hash set.
    "q_incremental_dedup" -> s"""
      WITH $twinsCte,
      inc AS (SELECT * FROM twins WHERE doc_id >= 100000),
      hashed AS (
        SELECT doc_id, sha256(trim(lower(text))) AS content_hash
        FROM inc
      ),
      ranked AS (
        SELECT doc_id, content_hash,
               count(*) OVER (PARTITION BY content_hash) AS dup_count,
               row_number() OVER
                 (PARTITION BY content_hash ORDER BY doc_id) AS rn
        FROM hashed
      ),
      seen AS (
        SELECT DISTINCT sha256(trim(lower(text))) AS h FROM documents
      )
      SELECT doc_id, content_hash, CAST(dup_count AS BIGINT) AS dup_count
      FROM ranked
      WHERE rn = 1 AND content_hash NOT IN (SELECT h FROM seen)
      ORDER BY doc_id""",

    // X6' — corpus report twin.
    "q_corpus_report" -> s"""
      WITH $twinsCte,
      t AS (
        SELECT source,
               CAST(len(string_split(text, ' ')) AS INT) AS ntok,
               sha256(trim(lower(text))) AS h
        FROM twins
      )
      SELECT source, count(*) AS docs,
             CAST(sum(ntok) AS BIGINT) AS tokens,
             CAST(sum(ntok) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS mean_tokens,
             count(DISTINCT h) AS distinct_docs,
             count(*) - count(DISTINCT h) AS dup_docs
      FROM t GROUP BY source ORDER BY source""",

    // X11d — mix twin: share CASE generated from the same constants.
    "q_mix_rates" -> s"""
      WITH $mixRatesCte
      SELECT * FROM mr ORDER BY source""",

    "q_mix_sample" -> s"""
      WITH $mixRatesCte
      SELECT d.doc_id, d.source
      FROM documents d JOIN mr USING (source)
      WHERE ('0x' || md5(CAST(d.doc_id AS VARCHAR))[1:8])::BIGINT % 100
            < mr.rate_pct
      ORDER BY d.doc_id""",

    // X16 — packing twin: same md5 shard hash, same cumsum windows.
    "q_packing_plan" -> """
      WITH t AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
               ('0x' || md5(CAST(doc_id AS VARCHAR))[1:8])::BIGINT % 8
                 AS shard
        FROM documents
      ),
      c AS (SELECT *, CAST(sum(n_tokens) OVER
              (PARTITION BY shard ORDER BY doc_id) AS BIGINT)
              AS end_off FROM t)
      SELECT doc_id, n_tokens, shard, end_off - n_tokens AS start_off,
             (end_off - n_tokens) // 256 AS chunk_id,
             (end_off - n_tokens) % 256 AS offset_in_chunk
      FROM c ORDER BY doc_id""",

    "q_packing_spans" -> """
      WITH t AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
               ('0x' || md5(CAST(doc_id AS VARCHAR))[1:8])::BIGINT % 8
                 AS shard
        FROM documents
      ),
      c AS (SELECT *, CAST(sum(n_tokens) OVER
              (PARTITION BY shard ORDER BY doc_id) AS BIGINT)
              AS end_off FROM t),
      p AS (SELECT doc_id, n_tokens, shard,
                   end_off - n_tokens AS start_off, end_off FROM c),
      e AS (
        SELECT doc_id, n_tokens, shard, start_off,
               unnest(range(start_off // 256, (end_off - 1) // 256 + 1))
                 AS chunk
        FROM p
      )
      SELECT doc_id, n_tokens, shard, start_off, chunk,
             greatest(chunk * 256, start_off) - start_off AS tok_from,
             least((chunk + 1) * 256, start_off + n_tokens) - start_off
               AS tok_to
      FROM e ORDER BY doc_id, chunk""",

    // X13 — recursive-CTE twin of the min-label components: reach(v,u)
    // = transitive closure over the bidirectional pair edges; label =
    // min reachable id.
    "q_dup_clusters" -> s"""
      WITH RECURSIVE $nearDupCtes,
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM paired WHERE jaccard >= 0.4
        UNION
        SELECT id_b, id_a FROM paired WHERE jaccard >= 0.4
      ),
      verts AS (SELECT DISTINCT src AS id FROM edges),
      reach(v, u) AS (
        SELECT id, id FROM verts
        UNION
        SELECT r.v, e.dst FROM reach r JOIN edges e ON e.src = r.u
      )
      SELECT v AS doc_id, min(u) AS cluster_id,
             v = min(u) AS is_canonical
      FROM reach GROUP BY v ORDER BY doc_id""",

    // X13'' — same transitive closure, survivor = longest member
    // (max n_chars, ties → min doc_id) via one window rank.
    "q_cluster_canonical" -> s"""
      WITH RECURSIVE $nearDupCtes,
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM paired WHERE jaccard >= 0.4
        UNION
        SELECT id_b, id_a FROM paired WHERE jaccard >= 0.4
      ),
      verts AS (SELECT DISTINCT src AS id FROM edges),
      reach(v, u) AS (
        SELECT id, id FROM verts
        UNION
        SELECT r.v, e.dst FROM reach r JOIN edges e ON e.src = r.u
      ),
      cl AS (SELECT v AS doc_id, min(u) AS cluster_id
             FROM reach GROUP BY v),
      scored AS (
        SELECT cl.doc_id, cl.cluster_id, t.n_chars FROM cl
        JOIN twins t USING (doc_id)
      ),
      surv AS (
        SELECT cluster_id, doc_id AS canonical_id FROM (
          SELECT cluster_id, doc_id,
                 row_number() OVER (PARTITION BY cluster_id
                   ORDER BY n_chars DESC, doc_id) AS rk
          FROM scored) WHERE rk = 1
      )
      SELECT s.doc_id, s.cluster_id, surv.canonical_id,
             s.doc_id = surv.canonical_id AS is_canonical
      FROM scored s JOIN surv USING (cluster_id)
      ORDER BY doc_id""",

    // X13' — the three detectors' pair CTEs (minhash `paired` from
    // nearDupCtes, simhash renamed sx/ss/ssig, ngram posting chain
    // reusing nearDupCtes' `sh` shingle sets) unioned into one edge
    // set, then the same recursive transitive closure as X13.
    "q_multi_signal_clusters" -> s"""
      WITH RECURSIVE $nearDupCtes,
      sx AS (
        SELECT doc_id,
               list_transform(string_split(text, ' '),
                 tk -> md5(tk)[1:${DedupOps.SimHashBits / 4}]) AS hx
        FROM twins
      ),
      ss AS (SELECT doc_id, ${simhashSql("hx")} AS simhash FROM sx),
      ssig AS (SELECT doc_id, simhash, simhash[1:8] AS bucket FROM ss),
      spairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM ssig a JOIN ssig b
          ON a.bucket = b.bucket AND a.doc_id < b.doc_id
        WHERE ${hammingSql("a.simhash", "b.simhash")} <= 6
      ),
      posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
      dfc AS (SELECT shingle, count(*) AS df FROM posting
              GROUP BY shingle),
      keep AS (
        SELECT p.doc_id, p.shingle
        FROM posting p JOIN dfc ON p.shingle = dfc.shingle
        WHERE dfc.df <= 50
      ),
      sizes AS (SELECT doc_id, count(*) AS sz FROM keep
                GROUP BY doc_id),
      ipairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS icnt
        FROM keep a JOIN keep b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ),
      npairs AS (
        SELECT id_a, id_b FROM ipairs
        JOIN sizes sa ON sa.doc_id = ipairs.id_a
        JOIN sizes sb ON sb.doc_id = ipairs.id_b
        WHERE icnt::DOUBLE / (sa.sz + sb.sz - icnt)::DOUBLE >= 0.4
      ),
      edges0 AS (
        SELECT id_a, id_b FROM paired WHERE jaccard >= 0.4
        UNION
        SELECT id_a, id_b FROM spairs
        UNION
        SELECT id_a, id_b FROM npairs
      ),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM edges0
        UNION
        SELECT id_b, id_a FROM edges0
      ),
      verts AS (SELECT DISTINCT src AS id FROM edges),
      reach(v, u) AS (
        SELECT id, id FROM verts
        UNION
        SELECT r.v, e.dst FROM reach r JOIN edges e ON e.src = r.u
      )
      SELECT v AS doc_id, min(u) AS cluster_id,
             v = min(u) AS is_canonical
      FROM reach GROUP BY v ORDER BY doc_id""",

    "q_simhash" -> s"""
      WITH t AS (
        SELECT doc_id,
               list_transform(string_split(text, ' '),
                 tk -> md5(tk)[1:${DedupOps.SimHashBits / 4}]) AS hx
        FROM documents
      ),
      s AS (SELECT doc_id, ${simhashSql("hx")} AS simhash FROM t)
      SELECT doc_id, simhash, simhash[1:8] AS bucket
      FROM s ORDER BY doc_id""",

    "q_simhash_pairs" -> s"""
      WITH $twinsCte,
      t AS (
        SELECT doc_id,
               list_transform(string_split(text, ' '),
                 tk -> md5(tk)[1:${DedupOps.SimHashBits / 4}]) AS hx
        FROM twins
      ),
      s AS (SELECT doc_id, ${simhashSql("hx")} AS simhash FROM t),
      sig AS (SELECT doc_id, simhash, simhash[1:8] AS bucket FROM s)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(${hammingSql("a.simhash", "b.simhash")} AS INT)
               AS hamming
      FROM sig a JOIN sig b
        ON a.bucket = b.bucket AND a.doc_id < b.doc_id
      WHERE ${hammingSql("a.simhash", "b.simhash")} <= 6
      ORDER BY id_a, id_b""",

    // X2b'' — rotation arithmetic mirrored: table t's bucket is 8
    // chars of the doubled bit-string starting at t·(32/tables)+1
    // (string rotation), candidates unioned across tables, then the
    // same exact hamming verify.
    "q_simhash_pairs_multi" -> s"""
      WITH $twinsCte,
      t AS (
        SELECT doc_id,
               list_transform(string_split(text, ' '),
                 tk -> md5(tk)[1:${DedupOps.SimHashBits / 4}]) AS hx
        FROM twins
      ),
      s AS (SELECT doc_id, ${simhashSql("hx")} AS simhash FROM t),
      sig AS (SELECT doc_id, simhash FROM s),
      bands AS (
        SELECT doc_id, simhash, tbl,
               substring(simhash || simhash,
                 tbl * ${DedupOps.SimHashBits / 4} + 1, 8) AS bucket
        FROM sig, (SELECT unnest([0, 1, 2, 3]) AS tbl)
      ),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.tbl = b.tbl AND a.bucket = b.bucket
         AND a.doc_id < b.doc_id
      )
      SELECT id_a, id_b,
             CAST(${hammingSql("sa.simhash", "sb.simhash")} AS INT)
               AS hamming
      FROM cand
      JOIN sig sa ON sa.doc_id = cand.id_a
      JOIN sig sb ON sb.doc_id = cand.id_b
      WHERE ${hammingSql("sa.simhash", "sb.simhash")} <= 6
      ORDER BY id_a, id_b""",

    "q_topk_sim" -> topkOracle,
    "q_topk_bucketed" -> topkBucketedOracle,

    "q_fingerprints" -> s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
                 FROM documents),
      sg AS (SELECT doc_id,
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                 ELSE list_transform(range(0, len(w) - 3 + 1),
                        i -> array_to_string(w[i+1:i+3], ' ')) END AS s
             FROM t),
      hs AS (SELECT doc_id,
               list_transform(s, x -> ('0x' || md5(x)[1:8])::BIGINT) AS h
             FROM sg),
      mins AS (SELECT doc_id,
                 CASE WHEN len(h) < 4 THEN [list_min(h)]
                   ELSE list_transform(range(0, len(h) - 4 + 1),
                          i -> list_min(h[i+1:i+4])) END AS m
               FROM hs)
      SELECT doc_id, unnest(list_distinct(m)) AS fp
      FROM mins ORDER BY doc_id, fp""",

    "q_chunks" -> """
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS w,
               len(string_split(text, ' ')) AS n
        FROM documents
      ), c AS (
        SELECT doc_id, w,
               unnest(range(0, CASE WHEN n <= 64 THEN 1
                 ELSE CAST(FLOOR((n - 64 + 48 - 1)::DOUBLE / 48.0)
                   AS BIGINT) + 1 END)) AS chunk_id
        FROM t
      )
      SELECT doc_id, chunk_id, chunk_id * 48 AS start_tok,
             CAST(len(w[chunk_id*48+1 : chunk_id*48+64]) AS BIGINT)
               AS n_tok,
             array_to_string(w[chunk_id*48+1 : chunk_id*48+64], ' ')
               AS chunk_text
      FROM c ORDER BY doc_id, chunk_id""",

    "q_span_dup" -> s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
                 FROM documents),
      sg AS (SELECT doc_id,
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                 ELSE list_transform(range(0, len(w) - 3 + 1),
                        i -> array_to_string(w[i+1:i+3], ' ')) END AS s
             FROM t),
      hs AS (SELECT doc_id,
               list_transform(s, x -> ('0x' || md5(x)[1:8])::BIGINT) AS h
             FROM sg),
      mins AS (SELECT doc_id,
                 CASE WHEN len(h) < 4 THEN [list_min(h)]
                   ELSE list_transform(range(0, len(h) - 4 + 1),
                          i -> list_min(h[i+1:i+4])) END AS m
               FROM hs),
      fps AS (SELECT doc_id, unnest(list_distinct(m)) AS fp FROM mins),
      dft AS (SELECT fp, count(*) AS df FROM fps GROUP BY fp),
      kept AS (SELECT f.doc_id, f.fp
               FROM fps f JOIN dft USING (fp) WHERE df <= 50),
      sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
      pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       count(*) AS shared_fps
                FROM kept a JOIN kept b USING (fp)
                WHERE a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT id_a, id_b, shared_fps,
             shared_fps::DOUBLE / least(sa.n, sb.n)::DOUBLE AS containment
      FROM pairs
      JOIN sizes sa ON pairs.id_a = sa.doc_id
      JOIN sizes sb ON pairs.id_b = sb.doc_id
      WHERE shared_fps >= 2
      ORDER BY id_a, id_b""",

    // the same winnow chain as q_span_dup, rolled up to the df census
    "q_span_dup_audit" -> s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
                 FROM documents),
      sg AS (SELECT doc_id,
               CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                 ELSE list_transform(range(0, len(w) - 3 + 1),
                        i -> array_to_string(w[i+1:i+3], ' ')) END AS s
             FROM t),
      hs AS (SELECT doc_id,
               list_transform(s, x -> ('0x' || md5(x)[1:8])::BIGINT) AS h
             FROM sg),
      mins AS (SELECT doc_id,
                 CASE WHEN len(h) < 4 THEN [list_min(h)]
                   ELSE list_transform(range(0, len(h) - 4 + 1),
                          i -> list_min(h[i+1:i+4])) END AS m
               FROM hs),
      fps AS (SELECT doc_id, unnest(list_distinct(m)) AS fp FROM mins),
      dft AS (SELECT fp, count(*) AS df FROM fps GROUP BY fp)
      SELECT metric, value FROM (
        SELECT 'fp_postings' AS metric,
               CAST(coalesce(sum(df), 0) AS BIGINT) AS value FROM dft
        UNION ALL
        SELECT 'fp_distinct', CAST(count(*) AS BIGINT) FROM dft
        UNION ALL
        SELECT 'fp_dropped_distinct',
               CAST(coalesce(sum(CASE WHEN df > 50 THEN 1 ELSE 0 END),
                 0) AS BIGINT) FROM dft
        UNION ALL
        SELECT 'fp_dropped_postings',
               CAST(coalesce(sum(CASE WHEN df > 50 THEN df ELSE 0 END),
                 0) AS BIGINT) FROM dft
      ) ORDER BY metric""",

    "q_ivf_index" -> s"""
      WITH c AS (
        SELECT vec_id AS centroid_id, embedding AS ce
        FROM embeddings WHERE vec_id % 10 <> 7
        ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT $IvfNlist
      ),
      assign AS (
        SELECT vec_id, embedding, centroid_id FROM (
          SELECT e.vec_id, e.embedding, c.centroid_id,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${dotSql("e.embedding", "ce")} DESC,
                            c.centroid_id) AS rn
          FROM embeddings e CROSS JOIN c
        ) WHERE rn = 1
      ),
      q AS (
        SELECT vec_id AS query_id, embedding AS qe, centroid_id FROM (
          SELECT e.vec_id, e.embedding, c.centroid_id,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${dotSql("e.embedding", "ce")} DESC,
                            c.centroid_id) AS rn
          FROM embeddings e CROSS JOIN c
          WHERE e.vec_id % 100 = 0
        ) WHERE rn <= $IvfNprobe
      ),
      scored AS (
        SELECT query_id, a.vec_id AS neighbor_id,
               ${cosSql("qe", "a.embedding")} AS score
        FROM assign a JOIN q USING (centroid_id)
        WHERE a.vec_id <> q.query_id
      ),
      ranked AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
        FROM scored
      )
      SELECT query_id, neighbor_id, rnk, score
      FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""",

    "q_index_delete" -> s"""
      WITH c AS (
        SELECT vec_id AS centroid_id, embedding AS ce
        FROM embeddings
        ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT $IvfNlist
      ),
      assign AS (
        SELECT vec_id, embedding, centroid_id FROM (
          SELECT e.vec_id, e.embedding, c.centroid_id,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${dotSql("e.embedding", "ce")} DESC,
                            c.centroid_id) AS rn
          FROM embeddings e CROSS JOIN c
        ) WHERE rn = 1
      ),
      q AS (
        SELECT vec_id AS query_id, embedding AS qe, centroid_id FROM (
          SELECT e.vec_id, e.embedding, c.centroid_id,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${dotSql("e.embedding", "ce")} DESC,
                            c.centroid_id) AS rn
          FROM embeddings e CROSS JOIN c
          WHERE e.vec_id % 100 = 0
        ) WHERE rn <= $IvfNprobe
      ),
      scored AS (
        SELECT query_id, a.vec_id AS neighbor_id,
               ${cosSql("qe", "a.embedding")} AS score
        FROM assign a JOIN q USING (centroid_id)
        WHERE a.vec_id <> q.query_id AND a.vec_id % 10 <> 3
      ),
      ranked AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
        FROM scored
      )
      SELECT query_id, neighbor_id, rnk, score
      FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""",

    "q_topk_ivf" -> s"""
      WITH c AS (
        SELECT vec_id AS centroid_id, embedding AS ce
        FROM embeddings
        ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT $IvfNlist
      ),
      assign AS (
        SELECT vec_id, embedding, centroid_id FROM (
          SELECT e.vec_id, e.embedding, c.centroid_id,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${dotSql("e.embedding", "ce")} DESC,
                            c.centroid_id) AS rn
          FROM embeddings e CROSS JOIN c
        ) WHERE rn = 1
      ),
      q AS (
        SELECT vec_id AS query_id, embedding AS qe, centroid_id FROM (
          SELECT e.vec_id, e.embedding, c.centroid_id,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${dotSql("e.embedding", "ce")} DESC,
                            c.centroid_id) AS rn
          FROM embeddings e CROSS JOIN c
          WHERE e.vec_id % 100 = 0
        ) WHERE rn <= $IvfNprobe
      ),
      scored AS (
        SELECT query_id, a.vec_id AS neighbor_id,
               ${cosSql("qe", "a.embedding")} AS score
        FROM assign a JOIN q USING (centroid_id)
        WHERE a.vec_id <> q.query_id
      ),
      ranked AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
        FROM scored
      )
      SELECT query_id, neighbor_id, rnk, score
      FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""",

    "q_kmeans" -> s"""
      WITH c0 AS (
        SELECT vec_id AS centroid_id, embedding AS ce
        FROM embeddings
        ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT $IvfNlist
      ),
      ${(1 to KmeansIters).map(n =>
        lloydRoundSql(n, if (n == 1) "c0" else s"c${n - 1}"))
        .mkString(",")}
      SELECT centroid_id, pos, c_val, cell_size
      FROM m$KmeansIters ORDER BY centroid_id, pos""",

    "q_topk_lsh" -> s"""
      WITH q AS (
        SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings WHERE vec_id % 100 = 0
      ),
      qt AS (${lshTablesSql("query_id, qe", "qe", "q")}),
      ct AS (${lshTablesSql("vec_id, embedding", "embedding",
                            "embeddings")}),
      scored AS (
        SELECT DISTINCT query_id, c.vec_id AS neighbor_id,
               ${cosSql("qe", "c.embedding")} AS score
        FROM ct c JOIN qt ON c.tbl = qt.tbl AND c.bkt = qt.bkt
        WHERE c.vec_id <> qt.query_id
      ),
      ranked AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
        FROM scored
      )
      SELECT query_id, neighbor_id, rnk, score
      FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""",

    // X3d — recall twin: both CTE chains composed, hit counting by
    // id-set intersection, LEFT JOIN keeps zero-recall queries.
    "q_ann_recall" -> s"""
      WITH q AS (
        SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings WHERE vec_id % 100 = 0
      ),
      scored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
               ${cosSql("qe", "e.embedding")} AS score
        FROM embeddings e, q WHERE e.vec_id <> q.query_id
      ),
      ranked AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
        FROM scored
      ),
      exact AS (SELECT query_id, neighbor_id FROM ranked WHERE rnk <= 5),
      qt AS (${lshTablesSql("query_id, qe", "qe", "q")}),
      ct AS (${lshTablesSql("vec_id, embedding", "embedding",
                            "embeddings")}),
      ascored AS (
        SELECT DISTINCT query_id, c.vec_id AS neighbor_id,
               ${cosSql("qe", "c.embedding")} AS score
        FROM ct c JOIN qt ON c.tbl = qt.tbl AND c.bkt = qt.bkt
        WHERE c.vec_id <> qt.query_id
      ),
      aranked AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
        FROM ascored
      ),
      approx AS (SELECT query_id, neighbor_id FROM aranked
                 WHERE rnk <= 5),
      hits AS (
        SELECT e.query_id, count(*) AS hits
        FROM exact e JOIN approx a
          ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
        GROUP BY e.query_id
      )
      SELECT q.query_id, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
             coalesce(h.hits, 0)::DOUBLE / 5.0 AS recall_at_5
      FROM q LEFT JOIN hits h ON h.query_id = q.query_id
      ORDER BY q.query_id""",

    // X3d' — IVF recall twin: brute chain + IVF chain, hit counting.
    "q_ann_recall_ivf" -> s"""
      WITH bq AS (
        SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings WHERE vec_id % 100 = 0
      ),
      bscored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
               ${cosSql("qe", "e.embedding")} AS score
        FROM embeddings e, bq WHERE e.vec_id <> bq.query_id
      ),
      branked AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
        FROM bscored
      ),
      exact AS (SELECT query_id, neighbor_id FROM branked
                WHERE rnk <= 5),
      c AS (
        SELECT vec_id AS centroid_id, embedding AS ce
        FROM embeddings
        ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT $IvfNlist
      ),
      assign AS (
        SELECT vec_id, embedding, centroid_id FROM (
          SELECT e.vec_id, e.embedding, c.centroid_id,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${dotSql("e.embedding", "ce")} DESC,
                            c.centroid_id) AS rn
          FROM embeddings e CROSS JOIN c
        ) WHERE rn = 1
      ),
      iq AS (
        SELECT vec_id AS query_id, embedding AS qe, centroid_id FROM (
          SELECT e.vec_id, e.embedding, c.centroid_id,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${dotSql("e.embedding", "ce")} DESC,
                            c.centroid_id) AS rn
          FROM embeddings e CROSS JOIN c
          WHERE e.vec_id % 100 = 0
        ) WHERE rn <= $IvfNprobe
      ),
      iscored AS (
        SELECT query_id, a.vec_id AS neighbor_id,
               ${cosSql("qe", "a.embedding")} AS score
        FROM assign a JOIN iq USING (centroid_id)
        WHERE a.vec_id <> iq.query_id
      ),
      iranked AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
        FROM iscored
      ),
      approx AS (SELECT query_id, neighbor_id FROM iranked
                 WHERE rnk <= 5),
      hits AS (
        SELECT e.query_id, count(*) AS hits
        FROM exact e JOIN approx a
          ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
        GROUP BY e.query_id
      )
      SELECT bq.query_id, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
             coalesce(h.hits, 0)::DOUBLE / 5.0 AS recall_at_5
      FROM bq LEFT JOIN hits h ON h.query_id = bq.query_id
      ORDER BY bq.query_id""",

    // X3d'' — IVF recall with the kmeans-trained codebook: brute chain
    // + 2 Lloyd rounds + IVF chain against the refined centroids.
    "q_ann_recall_kmeans" -> s"""
      WITH bq AS (
        SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings WHERE vec_id % 100 = 0
      ),
      bscored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
               ${cosSql("qe", "e.embedding")} AS score
        FROM embeddings e, bq WHERE e.vec_id <> bq.query_id
      ),
      branked AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
        FROM bscored
      ),
      exact AS (SELECT query_id, neighbor_id FROM branked
                WHERE rnk <= 5),
      c0 AS (
        SELECT vec_id AS centroid_id, embedding AS ce
        FROM embeddings
        ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT $IvfNlist
      ),
      ${(1 to KmeansIters).map(n =>
        lloydRoundSql(n, if (n == 1) "c0" else s"c${n - 1}"))
        .mkString(",")},
      assign AS (
        SELECT vec_id, embedding, centroid_id FROM (
          SELECT e.vec_id, e.embedding, c.centroid_id,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${dotSql("e.embedding", "ce")} DESC,
                            c.centroid_id) AS rn
          FROM embeddings e CROSS JOIN c$KmeansIters c
        ) WHERE rn = 1
      ),
      iq AS (
        SELECT vec_id AS query_id, embedding AS qe, centroid_id FROM (
          SELECT e.vec_id, e.embedding, c.centroid_id,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${dotSql("e.embedding", "ce")} DESC,
                            c.centroid_id) AS rn
          FROM embeddings e CROSS JOIN c$KmeansIters c
          WHERE e.vec_id % 100 = 0
        ) WHERE rn <= $IvfNprobe
      ),
      iscored AS (
        SELECT query_id, a.vec_id AS neighbor_id,
               ${cosSql("qe", "a.embedding")} AS score
        FROM assign a JOIN iq USING (centroid_id)
        WHERE a.vec_id <> iq.query_id
      ),
      iranked AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
        FROM iscored
      ),
      approx AS (SELECT query_id, neighbor_id FROM iranked
                 WHERE rnk <= 5),
      hits AS (
        SELECT e.query_id, count(*) AS hits
        FROM exact e JOIN approx a
          ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
        GROUP BY e.query_id
      )
      SELECT bq.query_id, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
             coalesce(h.hits, 0)::DOUBLE / 5.0 AS recall_at_5
      FROM bq LEFT JOIN hits h ON h.query_id = bq.query_id
      ORDER BY bq.query_id""",

    "q_embed_near_dup_lsh" -> s"""
      WITH $embTwinsCte,
      bt AS (${lshTablesSql("vec_id, e", "e", "corpus")}),
      pairs AS (
        SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b,
               ${cosSql("x.e", "y.e")} AS score
        FROM bt x JOIN bt y ON x.tbl = y.tbl AND x.bkt = y.bkt
        WHERE x.vec_id < y.vec_id
      )
      SELECT id_a, id_b, score FROM pairs
      WHERE score >= 0.99 ORDER BY id_a, id_b""",

    "q_ann_recall_sq8" -> s"""
      WITH q AS (
        SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings WHERE vec_id % 100 = 0
      ),
      scored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
               ${cosSql("qe", "e.embedding")} AS score
        FROM embeddings e, q WHERE e.vec_id <> q.query_id
      ),
      ranked AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
        FROM scored
      ),
      exact AS (SELECT query_id, neighbor_id FROM ranked WHERE rnk <= 5),
      amx AS (
        SELECT vec_id,
               list_max(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE)))) AS amax,
               embedding
        FROM embeddings),
      dq AS (
        SELECT vec_id,
               CASE WHEN amax = 0
                 THEN list_transform(embedding, x -> 0.0)
                 ELSE list_transform(embedding, x ->
                   CAST(greatest(-127.0, least(127.0,
                     floor(CAST(x AS DOUBLE) / (amax / 127.0) + 0.5)))
                     AS DOUBLE) * (amax / 127.0))
               END AS embedding
        FROM amx),
      ascored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
               ${cosSql("qe", "e.embedding")} AS score
        FROM dq e, q WHERE e.vec_id <> q.query_id
      ),
      aranked AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
        FROM ascored
      ),
      approx AS (SELECT query_id, neighbor_id FROM aranked
                 WHERE rnk <= 5),
      hits AS (
        SELECT e.query_id, count(*) AS hits
        FROM exact e JOIN approx a
          ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
        GROUP BY e.query_id
      )
      SELECT q.query_id, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
             coalesce(h.hits, 0)::DOUBLE / 5.0 AS recall_at_5
      FROM q LEFT JOIN hits h ON h.query_id = q.query_id
      ORDER BY q.query_id""",

    "q_embed_quantize" -> """
      WITH q AS (
        SELECT vec_id,
               list_max(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE)))) AS amax,
               embedding
        FROM embeddings),
      c AS (
        SELECT vec_id, amax,
               CASE WHEN amax = 0
                 THEN list_transform(embedding, x -> 0)
                 ELSE list_transform(embedding, x ->
                   CAST(greatest(-127.0, least(127.0,
                     floor(CAST(x AS DOUBLE) / (amax / 127.0) + 0.5)))
                     AS INT))
               END AS codes
        FROM q)
      SELECT vec_id,
             array_to_string(codes, ',') AS codes_str,
             CAST(list_sum(list_transform(codes,
               c -> CAST(c AS BIGINT) * c)) AS BIGINT) AS code_l2sq,
             CAST(floor(amax / 127.0 * 1000000.0 + 0.5) AS BIGINT)
               AS scale_micros
      FROM c ORDER BY vec_id""",

    // X3h — projected coordinates recomputed from the same literal ±1
    // planes, exploded with 0-based positions to match posexplode.
    "q_rp_project" -> s"""
      SELECT vec_id, u.pos AS pos, u.val AS val FROM (
        SELECT vec_id, unnest([${(0 until RpDim).map(j =>
          s"{'pos': $j, 'val': ${rpCoordSql("embedding", j)}}")
          .mkString(", ")}]) AS u
        FROM embeddings)
      ORDER BY vec_id, pos""",

    // X3h' — recall twin: brute chain in 64-dim vs brute chain over the
    // projected 16-dim lists, hit counting by id-set intersection.
    "q_ann_recall_rp" -> s"""
      WITH q AS (
        SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings WHERE vec_id % 100 = 0
      ),
      scored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
               ${cosSql("qe", "e.embedding")} AS score
        FROM embeddings e, q WHERE e.vec_id <> q.query_id
      ),
      ranked AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
        FROM scored
      ),
      exact AS (SELECT query_id, neighbor_id FROM ranked WHERE rnk <= 5),
      proj AS (
        SELECT vec_id, ${rpListSql("embedding")} AS pe FROM embeddings
      ),
      pq AS (
        SELECT vec_id AS query_id, pe AS qpe
        FROM proj WHERE vec_id % 100 = 0
      ),
      pscored AS (
        SELECT query_id, p.vec_id AS neighbor_id,
               ${cosSql("qpe", "p.pe", RpDim)} AS score
        FROM proj p, pq WHERE p.vec_id <> pq.query_id
      ),
      pranked AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
        FROM pscored
      ),
      approx AS (SELECT query_id, neighbor_id FROM pranked
                 WHERE rnk <= 5),
      hits AS (
        SELECT e.query_id, count(*) AS hits
        FROM exact e JOIN approx a
          ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
        GROUP BY e.query_id
      )
      SELECT q.query_id, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
             coalesce(h.hits, 0)::DOUBLE / 5.0 AS recall_at_5
      FROM q LEFT JOIN hits h ON h.query_id = q.query_id
      ORDER BY q.query_id""",

    // X3g — PQ codes recomputed through the same md5 sample + argmin.
    "q_pq_encode" -> s"""
      WITH $pqCte
      SELECT vec_id, array_to_string(list(code ORDER BY sub), ',')
               AS codes_str
      FROM pqenc GROUP BY vec_id ORDER BY vec_id""",

    // X3g' — recall twin: exact inner-product top-5 vs the ADC chain
    // (distance table in BIGINT micros, summed per (query, vector)).
    "q_ann_recall_pq" -> s"""
      WITH $pqCte,
      q AS (
        SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings WHERE vec_id % 100 = 0
      ),
      scored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
               ${dotSql("qe", "e.embedding")} AS score
        FROM embeddings e, q WHERE e.vec_id <> q.query_id
      ),
      ranked AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
        FROM scored
      ),
      exact AS (SELECT query_id, neighbor_id FROM ranked WHERE rnk <= 5),
      dtab AS (
        SELECT q.query_id, b.sub, b.code,
               CAST(round((${dotSql(pqSliceSql("q.qe", "b.sub"), "b.c_sub",
                 PqDsub)}) * 1000000.0) AS BIGINT) AS pdot
        FROM q CROSS JOIN pqbook b
      ),
      ascored AS (
        SELECT d.query_id, e.vec_id AS neighbor_id,
               sum(d.pdot) AS score_micros
        FROM pqenc e JOIN dtab d ON d.sub = e.sub AND d.code = e.code
        WHERE d.query_id <> e.vec_id
        GROUP BY 1, 2
      ),
      aranked AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id
           ORDER BY score_micros DESC, neighbor_id) AS rnk
        FROM ascored
      ),
      approx AS (SELECT query_id, neighbor_id FROM aranked
                 WHERE rnk <= 5),
      hits AS (
        SELECT e.query_id, count(*) AS hits
        FROM exact e JOIN approx a
          ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
        GROUP BY e.query_id
      )
      SELECT q.query_id, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
             coalesce(h.hits, 0)::DOUBLE / 5.0 AS recall_at_5
      FROM q LEFT JOIN hits h ON h.query_id = q.query_id
      ORDER BY q.query_id""",

    // X3g'' — residual-IVFADC twin: ADC (q·c_cell + Σ residual-book
    // lookups) shortlist (40) → exact rescore → 5.
    "q_ivfpq_recall" -> s"""
      WITH $ivfPqResidCte,
      $ivfPqResidSearchCte,
      approx AS (SELECT query_id, neighbor_id FROM rranked
                 WHERE rnk <= 5),
      xscored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
               ${dotSql("qe", "e.embedding")} AS score
        FROM embeddings e, q WHERE e.vec_id <> q.query_id
      ),
      xranked AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
        FROM xscored
      ),
      exact AS (SELECT query_id, neighbor_id FROM xranked
                WHERE rnk <= 5),
      hits AS (
        SELECT e.query_id, count(*) AS hits
        FROM exact e JOIN approx a
          ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
        GROUP BY e.query_id
      )
      SELECT q.query_id, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
             coalesce(h.hits, 0)::DOUBLE / 5.0 AS recall_at_5
      FROM q LEFT JOIN hits h ON h.query_id = q.query_id
      ORDER BY q.query_id""",

    "q_ivfpq_index" -> s"""
      WITH $ivfPqResidCte,
      $ivfPqResidSearchCte
      SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank,
             score_micros
      FROM rranked WHERE rnk <= 5 ORDER BY query_id, rank""",

    "q_pq_index" -> s"""
      WITH ${pqCteWith("WHERE vec_id % 10 <> 7")},
      q AS (
        SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings WHERE vec_id % 100 = 0
      ),
      dtab AS (
        SELECT q.query_id, b.sub, b.code,
               CAST(round((${dotSql(pqSliceSql("q.qe", "b.sub"), "b.c_sub",
                 PqDsub)}) * 1000000.0) AS BIGINT) AS pdot
        FROM q CROSS JOIN pqbook b
      ),
      ascored AS (
        SELECT d.query_id, e.vec_id AS neighbor_id,
               sum(d.pdot) AS score_micros
        FROM pqenc e JOIN dtab d ON d.sub = e.sub AND d.code = e.code
        WHERE d.query_id <> e.vec_id
        GROUP BY 1, 2
      ),
      aranked AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id
           ORDER BY score_micros DESC, neighbor_id) AS rnk
        FROM ascored
      ),
      shortlist AS (SELECT query_id, neighbor_id FROM aranked
                    WHERE rnk <= 40),
      rescored AS (
        SELECT s.query_id, s.neighbor_id,
               CAST(round((${dotSql("q.qe", "e.embedding")})
                 * 1000000.0) AS BIGINT) AS score_micros
        FROM shortlist s
        JOIN embeddings e ON e.vec_id = s.neighbor_id
        JOIN q ON q.query_id = s.query_id
      ),
      rranked AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id
           ORDER BY score_micros DESC, neighbor_id) AS rnk
        FROM rescored
      )
      SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rank,
             score_micros
      FROM rranked WHERE rnk <= 5 ORDER BY query_id, rank""",

    "q_ann_recall_pq_rerank" -> s"""
      WITH $pqCte,
      q AS (
        SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings WHERE vec_id % 100 = 0
      ),
      scored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
               ${dotSql("qe", "e.embedding")} AS score
        FROM embeddings e, q WHERE e.vec_id <> q.query_id
      ),
      ranked AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
        FROM scored
      ),
      exact AS (SELECT query_id, neighbor_id FROM ranked WHERE rnk <= 5),
      dtab AS (
        SELECT q.query_id, b.sub, b.code,
               CAST(round((${dotSql(pqSliceSql("q.qe", "b.sub"), "b.c_sub",
                 PqDsub)}) * 1000000.0) AS BIGINT) AS pdot
        FROM q CROSS JOIN pqbook b
      ),
      ascored AS (
        SELECT d.query_id, e.vec_id AS neighbor_id,
               sum(d.pdot) AS score_micros
        FROM pqenc e JOIN dtab d ON d.sub = e.sub AND d.code = e.code
        WHERE d.query_id <> e.vec_id
        GROUP BY 1, 2
      ),
      aranked AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id
           ORDER BY score_micros DESC, neighbor_id) AS rnk
        FROM ascored
      ),
      shortlist AS (SELECT query_id, neighbor_id FROM aranked
                    WHERE rnk <= 40),
      rescored AS (
        SELECT s.query_id, s.neighbor_id,
               ${dotSql("q.qe", "e.embedding")} AS score
        FROM shortlist s
        JOIN embeddings e ON e.vec_id = s.neighbor_id
        JOIN q ON q.query_id = s.query_id
      ),
      rranked AS (
        SELECT *, row_number() OVER
          (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
        FROM rescored
      ),
      approx AS (SELECT query_id, neighbor_id FROM rranked
                 WHERE rnk <= 5),
      hits AS (
        SELECT e.query_id, count(*) AS hits
        FROM exact e JOIN approx a
          ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
        GROUP BY e.query_id
      )
      SELECT q.query_id, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
             coalesce(h.hits, 0)::DOUBLE / 5.0 AS recall_at_5
      FROM q LEFT JOIN hits h ON h.query_id = q.query_id
      ORDER BY q.query_id""",

    "q_embed_near_dup" -> s"""
      WITH $embTwinsCte,
      b AS (SELECT vec_id, e, ${bucketSql("e")} AS bucket FROM corpus),
      pairs AS (
        SELECT x.vec_id AS id_a, y.vec_id AS id_b,
               ${cosSql("x.e", "y.e")} AS score
        FROM b x JOIN b y USING (bucket)
        WHERE x.vec_id < y.vec_id
      )
      SELECT id_a, id_b, score FROM pairs
      WHERE score >= 0.99 ORDER BY id_a, id_b""",

    "q_semantic_dedup" -> s"""
      WITH $embTwinsCte,
      c AS (
        SELECT vec_id AS centroid_id, e AS ce FROM corpus
        ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT $IvfNlist
      ),
      assign AS (
        SELECT vec_id, e, centroid_id FROM (
          SELECT x.vec_id, x.e, c.centroid_id,
                 row_number() OVER (PARTITION BY x.vec_id
                   ORDER BY ${dotSql("x.e", "ce")} DESC,
                            c.centroid_id) AS rn
          FROM corpus x CROSS JOIN c
        ) WHERE rn = 1
      ),
      dropped AS (
        SELECT DISTINCT b.vec_id
        FROM assign a JOIN assign b USING (centroid_id)
        WHERE a.vec_id < b.vec_id
          AND ${cosSql("a.e", "b.e")} >= 0.99
      )
      SELECT vec_id FROM corpus
      WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
      ORDER BY vec_id""",

    "q_semantic_decontaminate" -> s"""
      WITH corpus AS (
        SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
        FROM embeddings
      ),
      blocklist AS (
        SELECT vec_id + 100000 AS vec_id,
               list_transform(range(1, 65),
                 i -> embedding[i]::DOUBLE + (0.01)::DOUBLE * ((i % 3) - 1)) AS e
        FROM embeddings WHERE vec_id % 50 = 0
      ),
      c AS (
        SELECT vec_id AS centroid_id, e AS ce FROM corpus
        ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT $IvfNlist
      ),
      ca AS (
        SELECT vec_id, e, centroid_id FROM (
          SELECT x.vec_id, x.e, c.centroid_id,
                 row_number() OVER (PARTITION BY x.vec_id
                   ORDER BY ${dotSql("x.e", "ce")} DESC,
                            c.centroid_id) AS rn
          FROM corpus x CROSS JOIN c
        ) WHERE rn = 1
      ),
      ba AS (
        SELECT vec_id, e, centroid_id FROM (
          SELECT x.vec_id, x.e, c.centroid_id,
                 row_number() OVER (PARTITION BY x.vec_id
                   ORDER BY ${dotSql("x.e", "ce")} DESC,
                            c.centroid_id) AS rn
          FROM blocklist x CROSS JOIN c
        ) WHERE rn = 1
      ),
      contaminated AS (
        SELECT DISTINCT ca.vec_id
        FROM ca JOIN ba USING (centroid_id)
        WHERE ${cosSql("ca.e", "ba.e")} >= 0.99
      )
      SELECT vec_id FROM corpus
      WHERE vec_id NOT IN (SELECT vec_id FROM contaminated)
      ORDER BY vec_id""",

    "q_multimodal" -> s"""
      WITH m AS (SELECT doc_id AS media_id, md5(text) AS h,
                        length(text) AS nb FROM documents)
      SELECT media_id,
        'text/plain' AS media_type,
        CAST(nb AS BIGINT) AS n_bytes,
        h AS checksum,
        CAST(${byteAt("h", 1)} % 64 + 1 AS INT) AS width,
        CAST(${byteAt("h", 2)} % 64 + 1 AS INT) AS height,
        concat(${byteAt("h", 3)}, ',', ${byteAt("h", 4)}, ',',
               ${byteAt("h", 5)}, ',', ${byteAt("h", 6)}) AS histogram
      FROM m ORDER BY media_id""",

    "q_image_decode" -> """
      SELECT doc_id AS media_id,
             CAST(doc_id % 48 + 16 AS INT) AS width,
             CAST((doc_id % 16) * 2 + 16 AS INT) AS height,
             CAST((doc_id % 48 + 16) * ((doc_id % 16) + 8)
                  * ((doc_id * 7) % 256 + (doc_id * 19) % 256)
               AS BIGINT) AS sum_r,
             CAST((doc_id % 48 + 16) * ((doc_id % 16) + 8)
                  * ((doc_id * 11) % 256 + (doc_id * 23) % 256)
               AS BIGINT) AS sum_g,
             CAST((doc_id % 48 + 16) * ((doc_id % 16) + 8)
                  * ((doc_id * 17) % 256 + (doc_id * 29) % 256)
               AS BIGINT) AS sum_b
      FROM documents ORDER BY media_id""",

    "q_audio_decode" -> """
      WITH t AS (SELECT doc_id, r.range AS i
                 FROM documents, range(0, 800) r)
      SELECT doc_id AS media_id,
             CAST(8000 AS INT) AS sample_rate,
             CAST(1 AS INT) AS channels,
             CAST(800 AS BIGINT) AS n_samples,
             CAST(SUM(ABS((doc_id * 31 + i * 7) % 2048 - 1024))
               AS BIGINT) AS sum_abs
      FROM t GROUP BY doc_id ORDER BY media_id""",

    "q_image_resize" -> """
      SELECT doc_id AS media_id,
             CAST(8 AS INT) AS width,
             CAST(8 AS INT) AS height,
             CAST(32 * ((doc_id * 7) % 256 + (doc_id * 19) % 256)
               AS BIGINT) AS sum_r,
             CAST(32 * ((doc_id * 11) % 256 + (doc_id * 23) % 256)
               AS BIGINT) AS sum_g,
             CAST(32 * ((doc_id * 17) % 256 + (doc_id * 29) % 256)
               AS BIGINT) AS sum_b
      FROM documents ORDER BY media_id""",

    "q_frame_sample" -> """
      WITH fr AS (SELECT * FROM (VALUES (0), (2), (4)) t(f)),
      s AS (SELECT doc_id, f, doc_id * 31 + f AS seed
            FROM documents, fr)
      SELECT doc_id AS media_id,
             CAST(f AS INT) AS frame_idx,
             CAST(seed % 48 + 16 AS INT) AS width,
             CAST((seed % 16) * 2 + 16 AS INT) AS height,
             CAST((seed % 48 + 16) * ((seed % 16) + 8)
                  * ((seed * 7) % 256 + (seed * 19) % 256)
               AS BIGINT) AS sum_r,
             CAST((seed % 48 + 16) * ((seed % 16) + 8)
                  * ((seed * 11) % 256 + (seed * 23) % 256)
               AS BIGINT) AS sum_g,
             CAST((seed % 48 + 16) * ((seed % 16) + 8)
                  * ((seed * 17) % 256 + (seed * 29) % 256)
               AS BIGINT) AS sum_b
      FROM s ORDER BY media_id, frame_idx""",

    "q_image_dhash" -> s"""
      WITH $rampHashCtes
      SELECT media_id, dhash FROM hashes ORDER BY media_id""",

    "q_image_dup_pairs" -> s"""
      WITH $rampHashCtes,
      pb AS (
        SELECT media_id, dhash, substr(dhash, 1, 16) AS bucket
        FROM hashes
      ),
      pairs AS (
        SELECT a.media_id AS id_a, b.media_id AS id_b,
               (${hamming64Sql("a.dhash", "b.dhash")}) AS hamming
        FROM pb a JOIN pb b USING (bucket)
        WHERE a.media_id < b.media_id
      )
      SELECT id_a, id_b, CAST(hamming AS INT) AS hamming
      FROM pairs WHERE hamming <= 6 ORDER BY id_a, id_b""",

    "q_expectations" -> """
      WITH a AS (
        SELECT 'complete(o_custkey)' AS check_name,
               count(*) FILTER (o_custkey IS NULL) AS violations,
               count(*) AS total FROM orders
        UNION ALL
        SELECT 'unique(o_orderkey)',
               -- mirror the engine's null contract exactly: the Unique
               -- minuend counts only fully-non-null-keyed rows (a NULL
               -- key identifies nothing), so a fixture with NULL keys
               -- cannot produce a false oracle mismatch
               count(*) FILTER (o_orderkey IS NOT NULL)
                 - count(DISTINCT o_orderkey), count(*) FROM orders
        UNION ALL
        SELECT 'in_range(o_totalprice)',
               count(*) FILTER (o_totalprice IS NOT NULL AND
                 NOT (o_totalprice >= 1.0 AND o_totalprice <= 300000.0)),
               count(*) FROM orders
        UNION ALL
        SELECT 'in_set(o_orderstatus)',
               count(*) FILTER (o_orderstatus IS NOT NULL AND
                 o_orderstatus NOT IN ('O', 'F')),
               count(*) FROM orders
        UNION ALL
        SELECT 'matches(o_orderpriority)',
               count(*) FILTER (o_orderpriority IS NOT NULL AND
                 NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z]')),
               count(*) FROM orders
      )
      SELECT check_name, CAST(violations AS BIGINT) AS violations,
             total, violations = 0 AS passed
      FROM a ORDER BY check_name""",

    "q_quarantine" -> """
      SELECT * FROM (
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus,
               o_orderpriority,
               concat_ws(',',
                 CASE WHEN o_custkey IS NULL
                      THEN 'complete(o_custkey)' END,
                 CASE WHEN o_totalprice IS NOT NULL AND
                        NOT (o_totalprice >= 1.0 AND o_totalprice <= 300000.0)
                      THEN 'in_range(o_totalprice)' END,
                 CASE WHEN o_orderstatus IS NOT NULL AND
                        o_orderstatus NOT IN ('O', 'F')
                      THEN 'in_set(o_orderstatus)' END,
                 CASE WHEN o_orderpriority IS NOT NULL AND
                        NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z]')
                      THEN 'matches(o_orderpriority)' END) AS reasons
        FROM orders)
      WHERE reasons <> '' ORDER BY o_orderkey""",

    "q_quality_metrics" -> """
      WITH d AS (
        SELECT 'n_docs' AS metric, count(*) AS value FROM documents
        UNION ALL
        SELECT 'empty_docs', count(*) FILTER (length(trim(text)) = 0)
        FROM documents
        UNION ALL
        SELECT 'short_docs', count(*) FILTER (n_chars < 100) FROM documents
        UNION ALL
        SELECT 'dup_texts', count(*) - count(DISTINCT text) FROM documents
        UNION ALL
        SELECT 'n_langs', count(DISTINCT lang) FROM documents
        UNION ALL
        SELECT 'n_events', count(*) FROM events
        UNION ALL
        SELECT 'error_events', count(*) FILTER (event_type = 'error')
        FROM events
        UNION ALL
        SELECT 'null_values', count(*) FILTER (value IS NULL) FROM events
      )
      SELECT metric, CAST(value AS BIGINT) AS value
      FROM d ORDER BY metric""",

    "q_asof" -> """
      WITH c AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts, value
        FROM events WHERE event_type = 'click'
      ), p AS (
        SELECT user_id, epoch_us(ts) AS ts,
               event_id AS purchase_id, value AS purchase_value
        FROM events WHERE event_type = 'purchase'
      )
      SELECT c.event_id, c.user_id, c.ts, c.value,
             p.purchase_id AS asof_purchase_id,
             p.purchase_value AS asof_purchase_value
      FROM c ASOF LEFT JOIN p
        ON c.user_id = p.user_id AND c.ts >= p.ts
      ORDER BY c.event_id""",

    "q_asof_forward" -> """
      WITH c AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts, value
        FROM events WHERE event_type = 'click'
      ), p AS (
        SELECT user_id, epoch_us(ts) AS ts,
               event_id AS purchase_id, value AS purchase_value
        FROM events WHERE event_type = 'purchase'
      )
      SELECT c.event_id, c.user_id, c.ts, c.value,
             p.purchase_id AS asof_purchase_id,
             p.purchase_value AS asof_purchase_value
      FROM c ASOF LEFT JOIN p
        ON c.user_id = p.user_id AND c.ts <= p.ts
      ORDER BY c.event_id""",

    "q_kmv_distinct" -> """
      WITH h AS (
        SELECT DISTINCT event_type,
               ('0x' || md5(CAST(user_id AS VARCHAR))[1:15])::BIGINT AS h
        FROM events
      ), r AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM h
      ), kmv AS (
        SELECT event_type,
               CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                    ELSE 63.0 * 1152921504606846976.0 / max(h) END
                 AS est_distinct
        FROM r WHERE rn <= 64 GROUP BY event_type
      )
      SELECT kmv.event_type, kmv.est_distinct, x.n_exact
      FROM kmv JOIN (
        SELECT event_type, count(DISTINCT user_id) AS n_exact
        FROM events GROUP BY event_type
      ) x ON kmv.event_type = x.event_type
      ORDER BY kmv.event_type""",

    "q_value_outliers" -> """
      WITH q AS (
        SELECT event_id, event_type, value,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS qv
        FROM events WHERE value IS NOT NULL
      ), stats AS (
        SELECT event_type, count(*) AS n, SUM(qv) AS s1,
               SUM(CAST(qv AS DECIMAL(19,0)) * CAST(qv AS DECIMAL(19,0)))
                 AS s2
        FROM q GROUP BY event_type
      ), m AS (
        SELECT event_type, n,
               (CAST(s1 AS DOUBLE) / 1000000.0) / n AS mean,
               (CAST(s2 AS DOUBLE) / 1000000000000.0) / n AS ex2
        FROM stats
      ), v AS (
        SELECT event_type, mean, ex2 - mean * mean AS var
        FROM m WHERE ex2 - mean * mean > 0
      )
      SELECT e.event_id, e.event_type, e.value,
             (e.value - mean) / sqrt(var) AS z
      FROM events e JOIN v USING (event_type)
      WHERE e.value IS NOT NULL
        AND abs((e.value - mean) / sqrt(var)) > 3.0
      ORDER BY event_id""",

    "q_hist_quantiles" -> """
      WITH stats AS (
        SELECT event_type, min(value) AS mn, max(value) AS mx,
               count(*) AS n
        FROM events WHERE value IS NOT NULL GROUP BY event_type
      ), b AS (
        SELECT e.event_type,
               LEAST(63, CASE WHEN mx = mn THEN 0
                 ELSE FLOOR((e.value - mn) / ((mx - mn) / 64.0))
                 END)::BIGINT AS bin
        FROM events e JOIN stats USING (event_type)
        WHERE e.value IS NOT NULL
      ), c AS (
        SELECT event_type, bin, count(*) AS cnt FROM b GROUP BY 1, 2
      ), cum AS (
        SELECT event_type, bin,
               sum(cnt) OVER (PARTITION BY event_type ORDER BY bin)
                 AS cumc
        FROM c
      ), qpick AS (
        SELECT cum.event_type, 'p50' AS quantile, min(bin) AS qbin
        FROM cum JOIN stats USING (event_type)
        WHERE cumc >= CEIL(n * 0.5) GROUP BY 1
        UNION ALL
        SELECT cum.event_type, 'p90', min(bin)
        FROM cum JOIN stats USING (event_type)
        WHERE cumc >= CEIL(n * 0.9) GROUP BY 1
      ), est AS (
        SELECT qpick.event_type, quantile,
               mn + qbin * ((mx - mn) / 64.0) AS est_value
        FROM qpick JOIN stats USING (event_type)
      ), r AS (
        SELECT event_type, value,
               row_number() OVER
                 (PARTITION BY event_type ORDER BY value, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events WHERE value IS NOT NULL
      ), exact AS (
        SELECT event_type,
               CASE WHEN rn = ceil(n * 0.5) THEN 'p50' ELSE 'p90' END
                 AS quantile,
               value AS exact_value
        FROM r WHERE rn = ceil(n * 0.5) OR rn = ceil(n * 0.9)
      )
      SELECT est.event_type, est.quantile, est_value, exact_value,
             abs(est_value - exact_value) AS abs_err
      FROM est JOIN exact USING (event_type, quantile)
      ORDER BY event_type, quantile""",

    "q_table_stats" -> """
      WITH stacked AS (
        SELECT 'doc_id' AS col, CAST(doc_id AS VARCHAR) AS val,
               CAST(doc_id AS DOUBLE) AS num FROM documents
        UNION ALL SELECT 'lang', lang, NULL FROM documents
        UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR),
               CAST(n_chars AS DOUBLE) FROM documents
        UNION ALL SELECT 'source', source, NULL FROM documents
      ), base AS (
        SELECT col, count(CASE WHEN val IS NULL THEN 1 END) AS nulls,
               min(num) AS min_num, max(num) AS max_num,
               SUM(length(val))::DOUBLE / COUNT(val)::DOUBLE AS avg_len
        FROM stacked GROUP BY col
      ), h AS (
        SELECT DISTINCT col, ('0x' || md5(val)[1:15])::BIGINT AS h
        FROM stacked WHERE val IS NOT NULL
      ), r AS (
        SELECT col, h,
               row_number() OVER (PARTITION BY col ORDER BY h) AS rn
        FROM h
      ), kmv AS (
        SELECT col,
               CASE WHEN count(*) < 256 THEN CAST(count(*) AS DOUBLE)
                    ELSE 255.0 * 1152921504606846976.0 / max(h) END
                 AS ndv_est
        FROM r WHERE rn <= 256 GROUP BY col
      )
      SELECT b.col AS "column", nulls, kmv.ndv_est, min_num, max_num,
             avg_len
      FROM base b LEFT JOIN kmv ON b.col = kmv.col
      ORDER BY "column"
      """,

    "q_cms_heavy_hitters" -> """
      WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
      ),
      pairs AS (
        SELECT word, i,
               ('0x' || md5(CAST(i AS VARCHAR) || ':' || word)[1:8])
                 ::BIGINT % 16 AS bucket
        FROM tok CROSS JOIN range(0, 4) r(i)
      ),
      sketch AS (
        SELECT i, bucket, count(*) AS cnt FROM pairs GROUP BY i, bucket
      ),
      cand AS (SELECT DISTINCT word, i, bucket FROM pairs),
      est AS (
        SELECT word, min(cnt) AS est_count
        FROM cand JOIN sketch USING (i, bucket) GROUP BY word
      ),
      exact AS (SELECT word, count(*) AS n_exact FROM tok GROUP BY word)
      SELECT word, est_count, n_exact
      FROM est JOIN exact USING (word)
      ORDER BY word""",

    "q_kmv_overlap" -> s"""
      WITH wa AS (
        SELECT string_split(text, ' ') AS w FROM documents
        WHERE source IN ('src0','src1','src2','src3','src4')
      ), wb AS (
        SELECT string_split(text, ' ') AS w FROM documents
        WHERE source IN ('src5','src6','src7','src8','src9')
      ), ka AS (
        SELECT DISTINCT ('0x' || md5(sh)[1:15])::BIGINT AS h
        FROM (SELECT unnest(${shSql("w")}) AS sh FROM wa)
        ORDER BY h LIMIT 256
      ), kb AS (
        SELECT DISTINCT ('0x' || md5(sh)[1:15])::BIGINT AS h
        FROM (SELECT unnest(${shSql("w")}) AS sh FROM wb)
        ORDER BY h LIMIT 256
      ), u AS (
        SELECT h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
          SELECT h, 1 AS in_a, 0 AS in_b FROM ka
          UNION ALL SELECT h, 0 AS in_a, 1 AS in_b FROM kb)
        GROUP BY h ORDER BY h LIMIT 256
      ), agg AS (
        SELECT count(*) AS m, max(h) AS hk,
               sum(in_a * in_b) AS nboth
        FROM u
      ), est AS (
        SELECT CASE WHEN m < 256 THEN CAST(m AS DOUBLE)
                    ELSE 255.0 * 1152921504606846976.0 / hk END
                 AS union_est,
               CAST(nboth AS DOUBLE) / m AS jaccard_est
        FROM agg
      )
      SELECT union_est, jaccard_est,
             union_est * jaccard_est AS intersect_est
      FROM est""",

    "q_split" -> """
      SELECT doc_id,
             ('0x' || md5(CAST(doc_id AS VARCHAR))[1:8])::BIGINT % 100
               AS bucket,
             CASE WHEN ('0x' || md5(CAST(doc_id AS VARCHAR))[1:8])::BIGINT
                       % 100 < 10
                  THEN 'test' ELSE 'train' END AS split
      FROM documents
      ORDER BY doc_id""",

    // X11b — same id-stable bucket, thresholded per stratum ('es' has
    // no rate → 0% kept)
    "q_stratified_sample" -> """
      SELECT doc_id, lang FROM documents
      WHERE ('0x' || md5(CAST(doc_id AS VARCHAR))[1:8])::BIGINT % 100
            < CASE lang WHEN 'en' THEN 60 WHEN 'de' THEN 30
                        WHEN 'fr' THEN 10 WHEN 'zh' THEN 100 ELSE 0 END
      ORDER BY doc_id""",

    // X11c — full ranking is fine at oracle scale; the Spark side must
    // produce the identical kept set via its histogram+boundary plan.
    "q_source_quota" -> """
      SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                 ORDER BY ('0x' || md5(CAST(doc_id AS VARCHAR))[1:8])::BIGINT % 100,
                          doc_id) AS rk
        FROM documents)
      WHERE rk <= 10 ORDER BY doc_id""",

    // X4c — int-over-int IEEE divisions, bit-identical across engines.
    "q_repetition" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      g AS (SELECT doc_id, w,
              CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
                   ELSE list_transform(range(0, len(w) - 1),
                          i -> array_to_string(w[i+1:i+2], ' ')) END AS g2
            FROM toks)
      SELECT doc_id,
             len(w) AS n_tokens,
             list_max(list_transform(list_distinct(w),
                 x -> len(list_filter(w, y -> y = x))))::DOUBLE
               / len(w)::DOUBLE AS top_token_frac,
             (len(g2) - len(list_distinct(g2)))::DOUBLE / len(g2)::DOUBLE
               AS dup_bigram_frac,
             len(list_distinct(w))::DOUBLE / len(w)::DOUBLE AS distinct_ratio
      FROM g ORDER BY doc_id""",

    // X4d
    "q_length_hist" -> """
      SELECT lang,
             CAST(floor(len(string_split(text, ' ')) / 8.0) AS BIGINT) AS bucket,
             count(*) AS cnt
      FROM documents GROUP BY 1, 2 ORDER BY lang, bucket""",

    "q_pii_scrub" -> s"""
      SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(
               text || ' contact user' || doc_id
                    || '@example.com from 10.0.' || (doc_id % 255)
                    || '.7 card 4111 1111 1111 1111',
               '${graft.privacy.Mask.EmailRe}', '<EMAIL>', 'g'),
               '${graft.privacy.Mask.IpRe}', '<IP>', 'g'),
               '${graft.privacy.Mask.LongNumRe}', '<NUM>', 'g') AS clean
      FROM documents ORDER BY doc_id""",

    "q_range_join" -> """
      WITH c AS (
        SELECT user_id, epoch_us(ts) AS ts, event_id AS click_id
        FROM events WHERE event_type = 'click'
      ), p AS (
        SELECT user_id, epoch_us(ts) AS p_ts, event_id AS purchase_id
        FROM events WHERE event_type = 'purchase'
      )
      SELECT c.user_id, c.click_id, p.purchase_id, c.ts
      FROM c JOIN p
        ON c.user_id = p.user_id
       AND c.ts BETWEEN p.p_ts - 3600000000 AND p.p_ts
      ORDER BY p.purchase_id, c.click_id"""
  )
}
