package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, id-stable sampling and dataset splitting — the
  * train/test partitioner a training-data pipeline needs. Spark's
  * `randomSplit` depends on partitioning and a seed-per-partition RNG;
  * re-running it after a repartition reassigns rows. Hash-bucketing on
  * a stable id never does: a document keeps its split across reruns,
  * cluster sizes, and engines (md5 is engine-portable, so assignment
  * is oracle-checkable).
  *
  * Bucket = first 8 md5 hex chars of the id's string form, mod 100 —
  * uniform over buckets; per-row compute only, no shuffle at all.
  */
object Sampling {

  /** Stable bucket in [0, 100) for an id column. */
  def bucket100(id: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(100))

  /** Adds `bucket` and a `split` label: buckets [0, testPct) → "test",
    * the rest → "train". */
  def trainTestSplit(df: DataFrame, idCol: String, testPct: Int): DataFrame = {
    require(testPct > 0 && testPct < 100, s"testPct in (0,100), got $testPct")
    df.withColumn("bucket", bucket100(col(idCol)))
      .withColumn("split",
        when(col("bucket") < testPct, lit("test")).otherwise(lit("train")))
  }

  /** Deterministic pct% sample: rows whose bucket falls below `pct`. */
  def sample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(bucket100(col(idCol)) < pct)

  /** Deterministic STRATIFIED sample: per-stratum keep-percentage
    * (strata absent from `pcts` keep 0%) — the language/source-mixing
    * knob of a training-data pipeline ("60% en, 30% de, 10% fr"), as a
    * pure per-row filter. Same id-stable bucket as [[sample]], so rows
    * keep their fate across reruns and engines and the per-stratum
    * rates compose with [[trainTestSplit]]; zero shuffle, and the
    * bucket predicate sits directly on the scan. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       pcts: Map[String, Int]): DataFrame = {
    require(pcts.values.forall(p => p >= 0 && p <= 100),
      s"percentages in [0,100], got $pcts")
    val pctCol = pcts.toSeq.sortBy(_._1).foldLeft(lit(0)) {
      case (acc, (k, v)) =>
        when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(bucket100(col(idCol)) < pctCol)
  }

  /** X11d — training-MIX planner: per-stratum keep-rates that hit a
    * target corpus composition under a total document budget — the
    * arithmetic between "we want 50% web, 30% wiki, 20% books, 40k
    * docs" and the [[stratifiedSample]] percentages that implement it.
    * quota_s = ⌊share_s · budget⌋; rate_s = min(100, ⌊100·quota_s /
    * count_s⌋) — a stratum smaller than its quota keeps 100% (the mix
    * then under-fills; reweighting the remainder is the caller's policy
    * decision, not silently taken here). Strata absent from `targets`
    * rate 0. One partial-agg count per stratum; exact integer/IEEE
    * arithmetic, oracle-checked. */
  def mixRates(docs: DataFrame, stratumCol: String,
               targets: Map[String, Double],
               budgetDocs: Long): DataFrame = {
    require(targets.values.forall(v => v >= 0 && v <= 1),
      s"shares in [0,1], got $targets")
    require(budgetDocs > 0, s"budget must be positive, got $budgetDocs")
    val share = targets.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (k, v)) =>
        when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    docs.groupBy(stratumCol).agg(count(lit(1)).as("cnt"))
      .withColumn("quota", floor(share * budgetDocs).cast("long"))
      .withColumn("rate_pct",
        least(lit(100L),
          floor(lit(100L) * col("quota") / col("cnt"))).cast("long"))
  }

  /** [[mixRates]] as the Map [[stratifiedSample]] consumes. Driver-side
    * collect is right here: one row per stratum (sources/languages —
    * thousands at most), the same class as a checkpoint scalar. */
  def planMix(docs: DataFrame, stratumCol: String,
              targets: Map[String, Double],
              budgetDocs: Long): Map[String, Int] =
    mixRates(docs, stratumCol, targets, budgetDocs)
      .select(col(stratumCol).cast("string"), col("rate_pct"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1).toInt).toMap

  /** Per-stratum quota cap: keep at most `n` rows per stratum (the
    * "max N documents per domain" de-biasing pass of a web-scale
    * corpus), selected deterministically by (bucket, id) so the kept
    * set is id-stable across reruns and engines.
    *
    * Scale design: a naive `row_number()` window ranks EVERY row of a
    * stratum on one reducer — a hot domain with 10^9 pages serializes
    * on it. Here the full ranking never happens: a tiny
    * (stratum, bucket) histogram (≤100 rows per stratum) decides per
    * stratum which WHOLE buckets fall inside the quota, and only the
    * single boundary bucket (~1% of the stratum) pays an exact per-id
    * rank; everything below the boundary passes through a broadcast
    * semi-filter with no window at all. The data-sized shuffles are one
    * partial-agg histogram pass and the boundary slice's rank.
    *
    * Ties: `idCol` must be unique per stratum — equal ids straddling
    * the boundary would make the kept SET engine-dependent.
    *
    * NULL strata are a stratum of their own (SQL GROUP BY semantics,
    * matching the naive `row_number` twin and the DuckDB oracle) — the
    * boundary joins are null-safe, so NULL-stratum rows are capped at
    * `n` like any other stratum, not silently dropped.
    *
    * Degenerate-stratum hardening: the boundary bucket is ~1% of its
    * stratum, so its exact rank serializes ~10⁷ rows on one reducer
    * once a single stratum reaches ~10⁹ rows. When the histogram says
    * the boundary bucket holds more than `hotBoundary` rows, THAT
    * stratum's boundary selection recurses one level: a second
    * id-stable bucket (salted md5, independent of level 1) splits the
    * boundary bucket ~100-way, whole sub-buckets below the sub-boundary
    * pass with no window, and only the sub-boundary (~0.01% of the
    * stratum) pays the exact rank. Inside a recursed boundary the kept
    * rows are the deterministic (sub-bucket, id) prefix rather than the
    * plain id prefix — still id-stable and engine-reproducible (the
    * salt arithmetic mirrors in SQL), documented here because the two
    * orders differ; cold strata are bit-identical to the naive twin. */
  def quotaSample(df: DataFrame, idCol: String, stratumCol: String,
                  n: Int, hotBoundary: Long = 10000000L): DataFrame = {
    require(n > 0, s"quota must be positive, got $n")
    // NULL-safe equi-join on the stratum (GROUP BY already treats NULL
    // as a group; every join here must agree or NULL-stratum rows
    // silently vanish). `<=>` keys still plan as hash joins.
    def nsJoin(l: DataFrame, r: DataFrame): DataFrame = {
      val rr = r.withColumnRenamed(stratumCol, "_nsk")
      l.join(rr, col(stratumCol) <=> col("_nsk")).drop("_nsk")
    }
    val outCols = df.columns.map(col).toIndexedSeq
    val withB = df.withColumn("_qb", bucket100(col(idCol)))
    val hist = withB.groupBy(col(stratumCol), col("_qb"))
      .agg(count(lit(1)).as("_cnt"))
    val wcum = Window.partitionBy(stratumCol).orderBy("_qb")
    // rows ranked BEFORE this bucket within the stratum
    val cum = hist.withColumn("_prev",
      sum("_cnt").over(wcum) - col("_cnt"))
    val taken = cum.filter(col("_prev") < n)
    val bounds = taken.groupBy(stratumCol).agg(max("_qb").as("_bmax"))
    // The boundary frame is TINY (≤ one row per stratum) and every
    // union branch below consumes it as a broadcast build side.
    // Checkpointed, the histogram→window→boundary subtree executes
    // once and each branch's broadcast reads a leaf — unpinned, the
    // 4-way union re-plans (and, without exchange reuse, re-runs) the
    // whole subtree per branch (r19 plan: 146 Exchanges / 48 scans of
    // the input checkpoint on the curation queries; guide §3.3 plan
    // truncation).
    val boundary = nsJoin(taken, bounds)
      .filter(col("_qb") === col("_bmax"))
      .select(col(stratumCol), col("_bmax"),
        (lit(n.toLong) - col("_prev")).as("_take"),
        col("_cnt").as("_bcnt"))
      .localCheckpoint()
    val joined = nsJoin(withB, broadcast(boundary))
    val below = joined.filter(col("_qb") < col("_bmax"))
    val wRank = Window.partitionBy(stratumCol).orderBy(idCol)
    val atBoundary = joined.filter(col("_qb") === col("_bmax"))
    val cold = atBoundary.filter(col("_bcnt") <= hotBoundary)
      .withColumn("_rk", row_number().over(wRank))
      .filter(col("_rk") <= col("_take"))

    // no hot stratum (the common case, read off the checkpointed
    // per-stratum boundary stats — a metadata-scale peek, not a data
    // scan): the two hot-path branches are provably empty, so don't
    // plan them — halves the union and drops the second-level
    // histogram subtree from the plan entirely
    if (boundary.filter(col("_bcnt") > hotBoundary).isEmpty)
      return below.select(outCols: _*)
        .unionByName(cold.select(outCols: _*))

    // hot boundary: salted second-level bucket, same histogram shape
    val hot = atBoundary.filter(col("_bcnt") > hotBoundary)
      .withColumn("_qb2",
        bucket100(concat(col(idCol).cast("string"), lit(":q2"))))
    val hist2 = hot.groupBy(col(stratumCol), col("_qb2"))
      .agg(count(lit(1)).as("_cnt2"), first("_take").as("_t"))
    val cum2 = hist2.withColumn("_prev2",
      sum("_cnt2").over(Window.partitionBy(stratumCol).orderBy("_qb2"))
        - col("_cnt2"))
    val taken2 = cum2.filter(col("_prev2") < col("_t"))
    val bounds2 = taken2.groupBy(stratumCol).agg(max("_qb2").as("_bmax2"))
    val boundary2 = nsJoin(taken2, bounds2)
      .filter(col("_qb2") === col("_bmax2"))
      .select(col(stratumCol), col("_bmax2"),
        (col("_t") - col("_prev2")).as("_take2"))
      .localCheckpoint() // tiny, consumed by two branches — as above
    val joined2 = nsJoin(hot.drop("_bmax", "_take", "_bcnt"),
      broadcast(boundary2))
    val below2 = joined2.filter(col("_qb2") < col("_bmax2"))
    val atB2 = joined2.filter(col("_qb2") === col("_bmax2"))
      .withColumn("_rk", row_number().over(wRank))
      .filter(col("_rk") <= col("_take2"))

    below.select(outCols: _*)
      .unionByName(cold.select(outCols: _*))
      .unionByName(below2.select(outCols: _*))
      .unionByName(atB2.select(outCols: _*))
  }
}
