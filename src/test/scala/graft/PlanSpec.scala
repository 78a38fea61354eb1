package graft

import graft.queries.{ExtQueries, PipelineQueries, RelationalQueries}
import org.apache.spark.sql.DataFrame

/** Physical-plan assertions locking in the scale-design wins: broadcast
  * joins stay broadcast, no accidental cartesian products, the silver
  * dedup path shuffles exactly once, and scans actually receive the
  * pushed filters / pruned columns. A regression here is invisible to
  * result-compare tests (the answer stays right, 100-TB behavior
  * doesn't) — this suite is the guard.
  *
  * Runs against the sf0.001 fixture dir (real parquet scans are needed
  * for pushdown/pruning assertions).
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Execute (so AQE finalizes its plan) and render ONLY the final
    * physical plan (AdaptiveSparkPlan.toString appends the initial plan
    * too, which would double-count operators). */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  /** Formatted explain (full, untruncated node details — needed for
    * PushedFilters/ReadSchema assertions). */
  private def formatted(df: DataFrame): String = {
    df.collect()
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  private def relPlan(name: String): String =
    finalPlan(RelationalQueries.queries(name)(spark, sf))

  test("q3/q5/q14 star joins: broadcast hash joins, no cartesian " +
    "product, no shuffled nested loop") {
    for (q <- Seq("q3_shipping_priority", "q5_revenue_by_nation",
      "q14_promo_revenue")) {
      val plan = relPlan(q)
      assert(plan.contains("BroadcastHashJoin"), s"$q lost its broadcast:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$q grew a cartesian:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$q grew a nested-loop join:\n$plan")
    }
  }

  test("silver rebuild: exactly one exchange feeds the dedup window") {
    // bronze checkpointed like the real pipeline (a stored table) — the
    // synth generator's own offset-window shuffle is fixture cost, not
    // part of the rebuild plan under test
    val bronze = graft.cdc.Synth.bronze(Tables.orders(spark, sf))
      .localCheckpoint()
    val plan = finalPlan(
      graft.pipeline.Silver.rebuild(bronze))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"silver rebuild should shuffle once (saw $exchanges):\n$plan")
  }

  test("q_filter_project: predicates reach the parquet scan, unused " +
    "columns are pruned") {
    val plan = formatted(RelationalQueries.queries("q_filter_project")(spark, sf))
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThan(l_quantity,45.0)") &&
      plan.contains("EqualTo(l_returnflag,R)"),
      s"filters not pushed to the scan:\n$plan")
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_tax") && !readSchema.contains("l_shipdate"),
      s"column pruning lost:\n$readSchema")
  }

  test("q1 aggregation is partial (map-side combine) before its single " +
    "shuffle and stays inside whole-stage codegen") {
    val plan = relPlan("q1_pricing_summary")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"q1 should shuffle once (saw $exchanges):\n$plan")
    // partial + final HashAggregate pair around the exchange
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan)
    // `*(N)` prefixes mark whole-stage-codegen'd operators
    assert(plan.contains("*("), plan)
  }

  test("hyperplane LSH top-k: queries broadcast, corpus streams " +
    "(shuffles are only the pair dedup + rank window, and they carry " +
    "id/score triples, not embeddings)") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter("vec_id % 100 = 0")
      .select(org.apache.spark.sql.functions.col("vec_id").as("query_id"),
        org.apache.spark.sql.functions.col("embedding").as("q_embedding"))
    val df = graft.ext.SimilarityOps.hyperplaneTopK(queries, emb, 5,
      bits = 8, tables = 2)
    val plan = finalPlan(df)
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // dedup + rank window shuffle; the corpus side itself never shuffles
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"LSH top-k grew shuffles (saw $exchanges):\n$plan")
    // no embedding column crosses a shuffle: every exchange's input is
    // the projected (query_id, neighbor_id, score) shape
    val exchangeLines = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toList
    assert(exchangeLines.forall(!_.contains("embedding")), plan)
  }

  test("q_split: zero shuffles (pure per-row hash bucketing) and the " +
    "scan reads only the id column") {
    val df = ExtQueries.queries("q_split")(spark, sf)
    val plan = formatted(df)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"split grew a shuffle:\n$plan")
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && !readSchema.contains("text"),
      s"split reads more than the id:\n$readSchema")
  }

  test("kmv sketch: partial-aggregated, at most two hash exchanges " +
    "(distinct + window; final per-group agg reuses the window " +
    "partitioning)") {
    val plan = finalPlan(graft.ext.Sketches.kmvDistinct(
      Tables.events(spark, sf), Seq("event_type"), "user_id", 64))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"kmv grew shuffles (saw $exchanges):\n$plan")
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan)
  }

  test("silver rebuild moves <20% of the raw payload bytes through " +
    "its shuffle (typed projection precedes the dedup exchange)") {
    import org.apache.spark.sql.functions._
    val bronze = graft.cdc.Synth.bronze(Tables.orders(spark, sf))
      .localCheckpoint()
    val rawPayload = bronze
      .agg(sum(length(col("v")))).head().getLong(0)
    val shuffled = graft.quality.ShuffleAudit.shuffleWriteBytes(
      graft.pipeline.Silver.rebuild(bronze))
    assert(shuffled > 0, "expected the dedup window's exchange to run")
    assert(shuffled < rawPayload / 5,
      s"silver shuffle moved $shuffled of $rawPayload raw bytes — " +
        "projection before the key shuffle regressed")
  }

  test("q_pivot_events: pivot is a single-shuffle aggregation") {
    val plan = relPlan("q_pivot_events")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"pivot should shuffle once (saw $exchanges):\n$plan")
  }

  test("ngram-jaccard: candidate join is shingle-keyed (no cartesian, " +
    "no nested loop) and payload text never crosses an exchange") {
    val docs = graft.queries.ExtQueries.corpusWithTwins(
      Tables.documents(spark, sf))
    val plan = finalPlan(graft.ext.DedupOps.ngramJaccardPairs(
      docs, minJaccard = 0.4))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // every exchange moves (id, shingle)-shaped rows or aggregates —
    // never the document text
    val exchangeLines = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchangeLines.nonEmpty)
    assert(!exchangeLines.exists(_.contains("text")), plan)
  }

  test("ngram-jaccard df-cap: no window over the shingle — df comes " +
    "from a partial aggregation, heavy shingles leave by broadcast " +
    "anti-join") {
    val docs = graft.queries.ExtQueries.corpusWithTwins(
      Tables.documents(spark, sf))
    val plan = finalPlan(graft.ext.DedupOps.ngramJaccardPairs(
      docs, minJaccard = 0.4))
    // a Window over shingle would serialize a stop-word shingle's full
    // posting list on one reducer before the df filter could drop it
    assert(!plan.contains("Window"),
      s"df-cap regressed to a window:\n$plan")
    assert(plan.contains("partial_count"),
      s"df lost its map-side combine:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"heavy-shingle anti-join lost its broadcast:\n$plan")
  }

  test("exact dedup: survivor selection is a partial aggregation on " +
    "the content hash — no window over the dup group") {
    val docs = graft.queries.ExtQueries.corpusWithTwins(
      Tables.documents(spark, sf))
    val plan = finalPlan(graft.ext.DedupOps.exactDedup(docs))
    // a window over content_hash puts every copy of a degenerate dup
    // group (empty/boilerplate docs) on ONE reducer; the groupBy
    // collapses each group map-side before the exchange
    assert(!plan.contains("Window"),
      s"survivor selection regressed to a window:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("partial_count"),
      s"survivor agg lost its map-side combine:\n$plan")
  }

  test("incremental dedup: both sides partial-aggregated, no text in " +
    "any exchange, anti-join stays hash-keyed") {
    val base = Tables.documents(spark, sf)
    val incoming = graft.queries.ExtQueries.corpusWithTwins(base)
      .filter(org.apache.spark.sql.functions.col("doc_id") >= 100000)
    val plan = finalPlan(
      graft.ext.DedupOps.incrementalExactDedup(base, incoming))
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_"), plan)
    val exchangeLines = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchangeLines.nonEmpty)
    assert(!exchangeLines.exists(_.contains("text")),
      s"document text crossed an exchange:\n$plan")
  }

  test("corpus report: one logical aggregation pass — partial aggs " +
    "before every exchange, no text shuffled") {
    val plan = finalPlan(
      ExtQueries.queries("q_corpus_report")(spark, sf))
    assert(plan.contains("partial_"), plan)
    val exchangeLines = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(!exchangeLines.exists(_.contains("text")),
      s"document text crossed an exchange:\n$plan")
  }

  test("multi-table simhash: no pair-keyed exchange — cross-table " +
    "dedup is the scan-side first-colliding-table filter, so the only " +
    "hash exchanges are the (tbl, bucket) candidate join's") {
    val docs = graft.queries.ExtQueries.corpusWithTwins(
      Tables.documents(spark, sf))
    val plan = finalPlan(graft.ext.DedupOps.simhashPairsMulti(docs, 6))
    val exchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.forall(l => l.contains("tbl") && l.contains("bucket")),
      s"found a non-(tbl,bucket) exchange — dropDuplicates crept back:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("packing plan: exactly one hash exchange (the shard id) and no " +
    "document text crosses it") {
    val plan = finalPlan(graft.ext.Packing.packingPlan(
      Tables.documents(spark, sf), budget = 128, shards = 4))
    val exchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.length == 1,
      s"packing should shuffle once, on the shard:\n$plan")
    assert(!exchanges.exists(_.contains("text")), plan)
  }

  test("brute-force top-k: corpus side has no shuffle before the " +
    "per-query top-k window") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter("vec_id % 100 = 0")
      .select(org.apache.spark.sql.functions.col("vec_id").as("query_id"),
        org.apache.spark.sql.functions.col("embedding").as("q_embedding"))
    val plan = finalPlan(
      graft.ext.SimilarityOps.bruteForceTopK(queries, emb, 5))
    // one exchange for the rank window; the join itself must broadcast
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"top-k should shuffle once (saw $exchanges):\n$plan")
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("q_repetition: zero hash shuffles — every signal is a " +
    "scan-local array lambda") {
    val plan = finalPlan(ExtQueries.queries("q_repetition")(spark, sf))
    // the only exchange is the output orderBy's range partitioning
    assert(!plan.contains("Exchange hashpartitioning"),
      s"repetition signals grew a shuffle:\n$plan")
  }

  test("q_source_quota: data side joins the boundary table by " +
    "broadcast — no full-stratum shuffle of the corpus for the join") {
    val df = graft.ext.Sampling.quotaSample(
      Tables.documents(spark, sf).select("doc_id", "source"),
      "doc_id", "source", n = 10)
    val plan = finalPlan(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"boundary join lost its broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q_bloom_join: bloom prefilter is planned on the probe side " +
    "and the exact join stays a semi join") {
    val df = RelationalQueries.queries("q_bloom_join")(spark, sf)
    val plan = finalPlan(df)
    assert(plan.contains("might_contain"),
      s"bloom prefilter missing from the plan:\n$plan")
    assert(plan.contains("LeftSemi"), s"exact semi join missing:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q6: every predicate reaches the parquet scan; the only " +
    "exchange carries one partial-agg row per partition") {
    val df = RelationalQueries.queries("q6_forecast_revenue")(spark, sf)
    val fmt = formatted(df)
    assert(fmt.contains("PushedFilters") &&
      fmt.contains("l_quantity") && fmt.contains("l_shipdate"),
      s"q6 lost its pushdown:\n$fmt")
    val plan = finalPlan(df)
    assert(plan.linesIterator.count(_.contains("Exchange")) <= 1,
      s"q6 grew extra exchanges:\n$plan")
  }

  test("q18: the HAVING survivors broadcast into orders — the raw " +
    "fact never joins a dim by shuffle") {
    val plan = relPlan("q18_large_orders")
    assert(plan.contains("BroadcastHashJoin"),
      s"q18 lost the survivor broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q19: part broadcasts with the OR-of-ANDs as residual; the " +
    "part scan reads only the 3 predicate columns") {
    val df = RelationalQueries.queries("q19_bracket_revenue")(spark, sf)
    val plan = finalPlan(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"q19 lost its broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    val fmt = formatted(df)
    val partSchema = fmt.linesIterator
      .filter(_.contains("ReadSchema")).toSeq
      .filter(_.contains("p_partkey"))
    assert(partSchema.nonEmpty &&
      partSchema.forall(l => !l.contains("p_name") &&
        !l.contains("p_retailprice")),
      s"q19 part scan reads unused columns:\n$fmt")
  }

  test("q22: the scalar-subquery threshold attaches as a 1-row " +
    "broadcast, never a collect(); the anti join survives") {
    val plan = relPlan("q22_idle_customers")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"q22 threshold not attached in-plan:\n$plan")
    assert(plan.contains("LeftAnti"), s"q22 lost its anti join:\n$plan")
  }

  test("semantic dedup: the codebook attaches by broadcast (scoring " +
    "all 32 centroids per vector is the intent) and the dropped-id " +
    "anti join survives; no unplanned cartesian") {
    val plan = finalPlan(ExtQueries.queries("q_semantic_dedup")(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"codebook lost its broadcast:\n$plan")
    assert(plan.contains("LeftAnti"),
      s"survivor anti join missing:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q_bm25: query terms prune by broadcast BEFORE the tf " +
    "aggregation — no shuffle of the full-vocabulary postings") {
    val df = ExtQueries.queries("q_bm25")(spark, sf)
    val plan = finalPlan(df)
    // tf feeds both the score and the df branch → the subplan is
    // instantiated twice; BOTH corpus explodes are pruned by the
    // query-term broadcast BEFORE their partial aggregation, so no
    // full-vocabulary posting list ever reaches an exchange.
    assert(plan.linesIterator.count(_.contains("Generate explode")) == 2,
      s"bm25 grew extra corpus explodes:\n$plan")
    assert(plan.linesIterator
      .count(_.contains("BroadcastHashJoin [term")) >= 2,
      s"bm25 lost the pruning broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("span-dup: fingerprint self-join never broadcasts a posting " +
    "list, df-cap is a partial agg, no document text in exchanges") {
    val docs = Tables.documents(spark, sf)
    val plan = finalPlan(graft.ext.DedupOps.spanDuplicates(docs))
    // the SHUFFLE_HASH pin: the candidate self-join must stay
    // fp-keyed — AQE broadcasting the inverted index is the 100-TB
    // failure mode (same class the ngram-jaccard pin guards)
    assert(plan.linesIterator.exists(l =>
      l.contains("ShuffledHashJoin [fp") && l.contains("Inner")),
      s"span-dup candidate join left the shuffled-hash shape:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("partial_count"),
      s"span-dup df lost its map-side combine:\n$plan")
    val exchangeLines = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchangeLines.nonEmpty &&
      !exchangeLines.exists(_.contains("text")), plan)
  }

  test("kmeans: assignment is scan-side (no corpus join, no window) — " +
    "the only exchange carries (centroid, dim) partial aggregates") {
    val emb = Tables.embeddings(spark, sf)
    val stats = graft.ext.SimilarityOps.kmeansStats(emb,
      graft.ext.SimilarityOps.sampleCentroids(emb, 8), 1)
    val plan = finalPlan(stats)
    // literal-codebook argmin: no join or window anywhere in the
    // per-round plan — a ranking-window assignment would shuffle the
    // corpus once per Lloyd round
    assert(!plan.contains("Window"), s"kmeans assignment regressed " +
      s"to a ranking window:\n$plan")
    assert(!plan.contains("Join"), s"kmeans assignment regressed to " +
      s"a centroid join:\n$plan")
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"kmeans mean update lost its map-side combine:\n$plan")
    // embeddings never cross an exchange — only (centroid, pos)
    // aggregates do
    val exchangeLines = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchangeLines.nonEmpty &&
      !exchangeLines.exists(_.contains("embedding#")), plan)
  }

  test("group top-k: bounded-heap aggregate — object-hash partial/" +
    "final pair, NO window anywhere in the plan") {
    val plan = finalPlan(graft.ext.GroupTopK.topKPerGroup(
      Tables.orders(spark, sf), Seq("o_orderpriority"),
      "o_totalprice", "o_orderkey", 3))
    assert(!plan.contains("Window"),
      s"group top-k regressed to a ranking window:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"bounded-heap aggregate lost its object-hash plan:\n$plan")
    assert(plan.contains("partial_top_k_rows"),
      s"top-k lost its map-side partial:\n$plan")
  }

  test("chunkDocs: zero shuffles — tokenize, sequence-explode, and " +
    "slice are all scan-side") {
    val plan = finalPlan(graft.ext.TextOps.chunkDocs(
      Tables.documents(spark, sf)))
    assert(!plan.contains("Exchange"),
      s"RAG chunking must stay scan-side:\n$plan")
    assert(plan.contains("Generate explode"), plan)
  }

  test("kmeans: shuffle bytes are CODEBOOK-sized, not corpus-sized — " +
    "8x the vectors moves <2x the bytes through exchanges") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf).localCheckpoint()
    val parts = emb.rdd.getNumPartitions
    // 8x the vectors in the SAME number of map tasks (coalesce is
    // shuffle-free): the partial-agg contract is nlist×dim rows PER
    // MAP TASK regardless of how many vectors the task scans
    val big = (0 until 8).map(k =>
        emb.withColumn("vec_id", col("vec_id") + lit(k * 1000000L)))
      .reduce(_ unionByName _).coalesce(parts).localCheckpoint()
    val init = graft.ext.SimilarityOps.sampleCentroids(emb, 8)
    def bytes(corpus: org.apache.spark.sql.DataFrame): Long =
      graft.quality.ShuffleAudit.shuffleWriteBytes(
        graft.ext.SimilarityOps.kmeansStats(corpus, init, 1))
    val small = bytes(emb)
    val large = bytes(big)
    assert(small > 0, "expected the (centroid, dim) mean exchange")
    assert(large < small * 2,
      s"kmeans shuffled $large bytes for 8x vectors vs $small — the " +
        "per-map-task codebook bound broke (assignment stopped being " +
        "scan-side, or the mean update lost partial aggregation)")
  }

  test("q2/q11 decorrelation: the doubly-referenced per-part " +
    "aggregate computes once (ReusedExchange on its shuffle), and the " +
    "only broadcast hints are the fixed-size dim chains — the " +
    "sf-proportional part-keyed frames (q2 wantedParts/best) and " +
    "q16's supplier exclusion list carry none") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    def hints(df: DataFrame): Int =
      df.queryExecution.analyzed.collect { case h: ResolvedHint => h }.length
    val q2 = RelationalQueries.queries("q2_min_cost_supplier")(spark, sf)
    // q2's hint sites: nation, region, supplier⋈nation⋈region = 3;
    // the hinted frame sits under `regional`, which the DAG references
    // twice (best + join-back), so the analyzed TREE carries each hint
    // twice. Any hint creeping back onto a part-keyed frame breaks ==.
    assert(hints(q2) == 6,
      s"q2 broadcast-hint set changed (saw ${hints(q2)}, want 6 = dim chain ×2)")
    val q2plan = finalPlan(q2)
    assert(q2plan.contains("ReusedExchange"),
      s"q2 supply aggregate computed twice — exchange reuse lost:\n$q2plan")
    val q11 = RelationalQueries.queries("q11_important_parts")(spark, sf)
    // (nation, region, regionalSup) ×2 references + the 1-row threshold
    assert(hints(q11) == 7,
      s"q11 broadcast-hint set changed (saw ${hints(q11)}, want 7)")
    val q11plan = finalPlan(q11)
    assert(q11plan.contains("ReusedExchange"),
      s"q11 per-part aggregate computed twice — exchange reuse lost:\n$q11plan")
    val q16 = RelationalQueries.queries("q16_supplier_counts")(spark, sf)
    assert(hints(q16) == 0,
      s"q16 must leave broadcast-vs-shuffle to AQE (saw ${hints(q16)} hints)")
  }

  test("r11 third-session ops: scd2 build is ONE data shuffle; pq " +
    "encode is shuffle-free; feature hash partial-aggs; the ADC " +
    "lookup join broadcasts the distance table") {
    def dataExchanges(plan: String): Int =
      "Exchange hashpartitioning".r.findAllIn(plan).size +
        "Exchange SinglePartition".r.findAllIn(plan).size
    // SCD2 build: the lead window's key exchange and nothing else
    // before the output sort
    val scd2 = finalPlan(PipelineQueries.queries("q_scd2_build")(spark, sf))
    assert(dataExchanges(scd2) == 1,
      s"scd2 build must shuffle exactly once on the key:\n$scd2")
    // PQ encode: scan-side literal argmin — ZERO shuffles before the
    // output sort, no join anywhere
    val enc = finalPlan(ExtQueries.queries("q_pq_encode")(spark, sf))
    assert(dataExchanges(enc) == 0, s"pq encode must not shuffle:\n$enc")
    assert(!enc.contains("Join"), s"pq encode must not join:\n$enc")
    // feature hash: one partial-aggregated shuffle on (doc, bucket)
    val fh = finalPlan(ExtQueries.queries("q_feature_hash")(spark, sf))
    assert(fh.contains("partial_count"),
      s"feature hash lost map-side combine:\n$fh")
    // ADC: the (sub, code) lookup joins BROADCAST; the corpus is never
    // shuffled for the lookup itself
    val emb = Tables.embeddings(spark, sf)
    val book = graft.ext.SimilarityOps.pqCollectBook(emb, 8, 8, 16)
    val adc = finalPlan(graft.ext.SimilarityOps.pqTopK(
      emb.filter(org.apache.spark.sql.functions.col("vec_id") % 100 === 0)
        .selectExpr("vec_id AS query_id", "embedding AS q_embedding"),
      graft.ext.SimilarityOps.pqEncode(emb, book, 8, 8),
      graft.ext.SimilarityOps.pqBookFrame(spark, book), 5, 8))
    assert(adc.contains("BroadcastHashJoin"),
      s"ADC lookup must broadcast the distance table:\n$adc")
    assert(!adc.contains("SortMergeJoin"),
      s"ADC lookup must never sort-merge the corpus:\n$adc")
  }

  test("column stats: stacked scan + partial aggs; NDV dedup is " +
    "(column, hash)-keyed, never value-row-keyed") {
    val docs = Tables.documents(spark, sf)
    val plan = finalPlan(graft.quality.Metrics.columnStats(docs,
      Seq("doc_id", "lang", "source", "n_chars")))
    assert(plan.contains("partial_count") || plan.contains("partial_min"),
      s"column stats lost map-side combine:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    // the raw text column was never selected: pruned at the scan
    assert(!plan.contains("text#"),
      s"column stats read columns it does not analyze:\n$plan")
  }
}
