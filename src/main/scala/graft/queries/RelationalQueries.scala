package graft.queries

import graft.Tables
import graft.ext.{Resample, SkewJoin}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Analytics queries over the star schema — the reference's query-level
  * surface (Trino SQL in README + SURVEY §2.2–2.4 operators), expressed
  * Spark-first. These are the queries where scale design shows: filters
  * push to the parquet scan, dimension joins are broadcast, aggregations
  * are partial (map-side combine) before the key shuffle.
  *
  * Cross-engine float discipline: every SUM/AVG over doubles casts its
  * operand to DECIMAL first (exact, order-independent accumulation —
  * identical in Spark and DuckDB), then the result back to DOUBLE.
  * A dyadic double can never sit exactly on a decimal rounding tie, so
  * the double→decimal cast itself is engine-agnostic.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Exact decimal-accumulated sum of a double expression, as double. */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(27, 6))).cast(DoubleType)
  /** Order-independent average via exact sum / count. */
  private def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Oracle-side twin of [[dsum]]/[[davg]]. */
  private def oSum(e: String) =
    s"CAST(SUM(CAST($e AS DECIMAL(27,6))) AS DOUBLE)"
  private def oAvg(e: String) = s"${oSum(e)} / COUNT(*)"

  val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Static-list pivot as single-shuffle conditional aggregation. */
  def pivotEventCounts(events: DataFrame): DataFrame =
    events.groupBy("user_id")
      .agg(
        count(when(col("event_type") === EventTypes.head, 1))
          .as(s"n_${EventTypes.head}"),
        EventTypes.tail.map(t =>
          count(when(col("event_type") === t, 1)).as(s"n_$t")): _*)

  val queries: Map[String, Q] = Map(
    // TPC-H Q1 shape: the canonical partial-agg + single key shuffle.
    "q1_pricing_summary" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Projection + filter + cast + scalar exprs (P1–P3); pushdown check.
    "q_filter_project" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45.0 && col("l_returnflag") === "R")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast(IntegerType).as("qty_int"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("net_price"),
          upper(col("l_linestatus")).as("status_uc"))
        .orderBy("l_orderkey", "l_linenumber")),

    // J2 — TPC-H Q3 shape: filtered dim broadcast + two fact shuffles.
    // The customer side is small after the segment filter → broadcast;
    // orders⋈lineitem shuffles on the order key once.
    "q3_shipping_priority" -> ((s, d) => {
      val cutoff = lit("1997-06-01").cast(TimestampType)
      val cust = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // J2 — TPC-H Q5 shape: full star join, every dimension broadcast,
    // single fact shuffle on the join key chain.
    "q5_revenue_by_nation" -> ((s, d) => {
      val lo = lit("1996-01-01").cast(TimestampType)
      val hi = lit("1997-01-01").cast(TimestampType)
      val asia = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val nat = Tables.nation(s, d)
        .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select("o_orderkey", "o_custkey")
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(cust, col("o_custkey") === col("c_custkey")
          && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // J2 — TPC-H Q14 shape: lineitem ⋈ broadcast part, conditional
    // revenue ratio per ship month. part is the star schema's widest
    // dimension (2k rows at sf0.01, 20M at SF100 — still ~2 GB, still
    // broadcastable); the fact side never shuffles before the monthly
    // rollup. promo_pct divides two decimal-exact sums — one IEEE
    // divide, identical in both engines.
    "q14_promo_revenue" -> ((s, d) => {
      val lo = lit("1997-01-01").cast(TimestampType)
      val hi = lit("1997-07-01").cast(TimestampType)
      val part = Tables.part(s, d).select("p_partkey", "p_type")
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
      val net = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
        .agg(
          dsum(when(col("p_type") === "PROMO", net).otherwise(lit(0.0)))
            .as("promo_revenue"),
          dsum(net).as("total_revenue"))
        .withColumn("promo_pct",
          lit(100.0) * col("promo_revenue") / col("total_revenue"))
        .orderBy("ship_month")
    }),

    // Extension window agg over the event stream (batch twin of the
    // streaming tumbling window): date_trunc bucket + two-key groupBy.
    "q_events_window" -> ((s, d) =>
      Tables.events(s, d)
        // ts is long nanos (nanosAsLong); integer div keeps exactness
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        .groupBy(
          date_format(date_trunc("hour", col("ts")),
            "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          dsum(col("value")).as("sum_value"))
        .orderBy("window_start", "event_type")),

    // Session windows per user (30-min gap) — Spark's session_window in
    // batch mode; the oracle replays it as gaps-and-islands SQL. One
    // shuffle on the session key (user), state bounded per user.
    "q_user_sessions" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        .groupBy(session_window(col("ts"), "30 minutes"),
          col("user_id"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(
          col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("session_start"),
          date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss")
            .as("session_end"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start")),

    // Ordered-funnel analysis over the event stream: users completing
    // view → click → purchase IN EVENT-TIME ORDER (each stage's
    // timestamp strictly after the previous stage's first completion
    // — the product-analytics staple a windowed count can't express).
    // Two window passes over ONE user-keyed exchange (no sort: frames
    // span the whole partition); the final stage counts collapse to
    // three scalars.
    "q_funnel" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
      val staged = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          expr("ts div 1000").as("ts_us"))
        .withColumn("t1", min(when(col("event_type") === "view",
          col("ts_us"))).over(w))
        .withColumn("t2", min(when(col("event_type") === "click" &&
          col("ts_us") > col("t1"), col("ts_us"))).over(w))
        .withColumn("t3", min(when(col("event_type") === "purchase" &&
          col("ts_us") > col("t2"), col("ts_us"))).over(w))
      val perUser = staged.groupBy("user_id")
        .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
      perUser.agg(
        count(when(col("t1").isNotNull, 1)).as("u1"),
        count(when(col("t2").isNotNull, 1)).as("u2"),
        count(when(col("t3").isNotNull, 1)).as("u3"))
        .select(explode(array(
          struct(lit("1_view").as("stage"), col("u1").as("users")),
          struct(lit("2_click").as("stage"), col("u2").as("users")),
          struct(lit("3_purchase").as("stage"), col("u3").as("users"))))
          .as("s"))
        .select(col("s.stage").as("stage"), col("s.users").as("users"))
        .orderBy("stage")
    }),

    // RANGE-frame sliding window — the time-based frame the ROWS-frame
    // running totals can't express: each event sums the PRECEDING
    // HOUR's values for its type (value-based bounds on the micros
    // axis, so sparse and dense regions window correctly). One
    // key-shuffle + in-partition sort, state bounded by the hour span.
    "q_sliding_window" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("ts_us")
        .rangeBetween(-3600000000L, 0L)
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          expr("ts div 1000").as("ts_us"), col("value"))
        .withColumn("hour_cnt", count(lit(1)).over(w))
        .withColumn("hour_sum",
          sum(round(col("value") * 100).cast("long")).over(w))
        .select(col("event_id"), col("event_type"), col("hour_cnt"),
          col("hour_sum"))
        .orderBy("event_id")
    }),

    // GROUPING SETS — the explicit third form beside ROLLUP/CUBE, run
    // as SQL text (independent per-flag and per-status marginals plus
    // the grand total in ONE statement; Spark plans it as a single
    // Expand + aggregate, not three scans).
    "q_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("li_gsets")
      s.sql(s"""
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
                 AS sum_qty
        FROM li_gsets
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY returnflag, linestatus""")
    }),

    // X22 — cohort retention: users grouped by their first-signup
    // epoch-week; retention(cohort, k) = distinct users of the cohort
    // active k weeks later / cohort size. Epoch-week arithmetic is
    // pure integer division (engine-portable); two partial-agg
    // shuffles (per-user first signup, per-(cohort, offset) actives)
    // plus a user-keyed join — the product-analytics matrix every
    // growth dashboard draws.
    "q_retention" -> ((s, d) => {
      val e = Tables.events(s, d).select(col("user_id"),
        expr("ts div 86400000000000 div 7").as("week"),
        col("event_type"))
      val cohorts = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("week").as("cohort_week"))
      val activity = e.select("user_id", "week").distinct()
      val actives = activity.join(cohorts, "user_id")
        .withColumn("offset_weeks", col("week") - col("cohort_week"))
        .filter(col("offset_weeks") >= 0)
        .groupBy("cohort_week", "offset_weeks")
        .agg(countDistinct("user_id").as("active_users"))
      val sizes = cohorts.groupBy("cohort_week")
        .agg(count(lit(1)).as("cohort_size"))
      actives.join(sizes, "cohort_week")
        .withColumn("retention", col("active_users").cast("double") /
          col("cohort_size"))
        .orderBy("cohort_week", "offset_weeks")
    }),

    // X9''''' — per-type value series projected onto a regular 6-hour
    // grid with linear interpolation between the surrounding events
    // (gap-filling before any fixed-step rolling statistic). One
    // key-shuffle, two in-partition window passes; the interpolation
    // expression is IEEE-mirrored so VALUES hash-compare.
    "q_resample" -> ((s, d) =>
      Resample.interpolate(
        Tables.events(s, d)
          .select(col("event_type"), expr("ts div 1000").as("ts_us"),
            col("value"), col("event_id")),
        Seq("event_type"), "ts_us", "value", "event_id",
        stepMicros = 21600000000L)
        .orderBy("event_type", "grid_ts")),

    // ROLLUP hierarchy totals; subtotal rows surfaced via coalesce so
    // both engines sort identically (no engine-specific NULL ordering).
    "q_rollup_returns" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n_rows"), col("sum_qty"))
        .orderBy("returnflag", "linestatus")),

    // Anti join: customers with no order above the threshold.
    "q_customers_no_orders" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val ord = Tables.orders(s, d)
        .filter(col("o_totalprice") > 250000.0).select("o_custkey")
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // Semi join: customers that do have high-value orders.
    "q_big_spenders" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val big = Tables.orders(s, d)
        .filter(col("o_totalprice") > 300000.0).select("o_custkey")
      cust.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // Exact moment statistics: variance/stddev derived from DECIMAL
    // sum/sumsq (never the engine's own streaming variance — those
    // accumulate in different orders and drift cross-engine).
    "q_stats_by_flag" -> ((s, d) => {
      val qty = col("l_quantity")
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          min(qty).as("min_qty"), max(qty).as("max_qty"),
          dsum(qty).as("sum_qty"),
          dsum(qty * qty).as("sum_qty2"))
        .select(
          col("l_returnflag"), col("n"), col("min_qty"), col("max_qty"),
          (col("sum_qty") / col("n")).as("mean_qty"),
          ((col("sum_qty2") - col("sum_qty") * col("sum_qty") / col("n"))
            / (col("n") - 1)).as("var_qty"))
        .orderBy("l_returnflag")
    }),

    // Bloom-pruned semi join (BloomJoin.semiJoin): the build side's key
    // set travels as an in-plan bloom sketch that drops non-matching
    // lineitem rows scan-side, BEFORE the probe exchange; the exact
    // left-semi join then removes bloom false positives, so the result
    // is identical to the oracle's plain IN-subquery.
    "q_bloom_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
      val big = Tables.orders(s, d)
        .filter(col("o_totalprice") > 400000.0)
        .select("o_orderkey")
      graft.ext.BloomJoin.semiJoin(li, "l_orderkey", big, "o_orderkey")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Skew-salted fact⋈fact join (SkewJoin.salted): orders replicated
    // 8×, lineitem salted by row hash — identical result to the plain
    // equi-join (the oracle), with every hot order key spread over 8
    // reducers. The post-join agg is decimal-exact → salt-order-proof.
    "q_salted_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o_orderkey"),
          col("l_extendedprice"), col("l_discount"))
      val ord = Tables.orders(s, d)
        .select("o_orderkey", "o_orderpriority")
      SkewJoin.salted(li, ord, "o_orderkey", salts = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
        .orderBy("o_orderpriority")
    }),

    // Pivot with a static value list, written as conditional aggregation
    // — ONE shuffle and full codegen, where `groupBy().pivot()` plans
    // two (pair-agg + pivotfirst). PlanSpec pins the single exchange;
    // RelationalExtraSpec proves it row-identical to the pivot() form.
    "q_pivot_events" -> ((s, d) =>
      pivotEventCounts(Tables.events(s, d)).orderBy("user_id")),

    // lag/lead over the per-user event timeline: microsecond gap to the
    // previous event and the type of the next one. (user_id, ts) is
    // unique, but the order key still includes event_id so the plan is
    // deterministic at any scale.
    "q_event_gaps" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("ts", expr("ts div 1000"))
        .select(
          col("event_id"), col("user_id"), col("ts"),
          (col("ts") - lag(col("ts"), 1).over(w)).as("gap_us"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .orderBy("event_id")
    }),

    // Ranking-function family over one window: rank, dense_rank, ntile
    // quartiles per order priority by total price. One shuffle (the
    // window), deterministic order key includes the id.
    "q_order_ranks" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .filter(col("o_totalprice") > 400000.0)
        .select(col("o_orderpriority"), col("o_orderkey"),
          col("o_totalprice"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"))
        .orderBy("o_orderpriority", "rnk", "o_orderkey")
    }),

    // X19 — skew-immune group top-k: the bounded-heap aggregate
    // (state ≤ k at every stage) replacing the row_number window whose
    // hot group would serialize on one reducer. Top-3 orders per
    // priority by (totalprice DESC, orderkey).
    "q_topk_groups" -> ((s, d) =>
      graft.ext.GroupTopK.topKPerGroup(Tables.orders(s, d),
        Seq("o_orderpriority"), "o_totalprice", "o_orderkey", 3)
        .orderBy("o_orderpriority", "rank")),

    // X9's relative-rank siblings: percent_rank = (rank−1)/(n−1) and
    // cume_dist = peers≤ / n — both int/int IEEE divisions with the
    // unique (price, key) tie-break, so the doubles hash-match.
    "q_order_percentiles" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .filter(col("o_totalprice") > 400000.0)
        .select(col("o_orderpriority"), col("o_orderkey"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("o_orderpriority", "o_orderkey")
    }),

    // CUBE: all grouping-set combinations of (returnflag, linestatus)
    // — the ROLLUP twin's full lattice; subtotals surfaced via coalesce
    // as in q_rollup_returns.
    "q_cube_returns" -> ((s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n_rows"), col("sum_qty"))
        .orderBy("returnflag", "linestatus")),

    // Discrete per-group quantiles (p50/p90 as actual data elements via
    // row_number against ceil(q·n) — no interpolation, so the doubles
    // compare bit-exact cross-engine; same formula on both sides).
    "q_value_quantiles" -> ((s, d) => {
      val byVal = Window.partitionBy("event_type")
        .orderBy(col("value"), col("event_id"))
      val all = Window.partitionBy("event_type")
      Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select(col("event_type"), col("value"), col("event_id"))
        .withColumn("rn", row_number().over(byVal))
        .withColumn("n", count(lit(1)).over(all))
        .filter(col("rn") === ceil(col("n") * lit(0.5))
          || col("rn") === ceil(col("n") * lit(0.9)))
        .select(col("event_type"),
          when(col("rn") === ceil(col("n") * lit(0.5)), lit("p50"))
            .otherwise(lit("p90")).as("quantile"),
          col("value"))
        .orderBy("event_type", "quantile")
    }),

    // X18 — z-order curve value over (hour-bucket, value-bucket): the
    // Morton interleave that clusters rows close in BOTH dimensions,
    // so row-group min/max stats prune 2-D range queries. Exact 64-bit
    // integer arithmetic, oracle-checked cell-for-cell.
    "q_zorder" -> ((s, d) =>
      Tables.events(s, d).filter(col("value").isNotNull)
        .select(col("event_id"),
          graft.ext.Layout.zValue(
            expr("ts div 1000000000 div 3600 % 65536"),
            floor(col("value") / 10)).as("z"))
        .orderBy("z", "event_id")),

    // X9' — SAMPLED quantiles: the 100-TB path for per-group quantiles
    // (the exact form above rank-sorts every row of a group — right for
    // a report, wrong for a 10¹⁰-row group). An id-stable 20% sample
    // (X11's md5 bucket — deterministic, so the sampled quantile itself
    // is oracle-checkable cell-for-cell) cuts the sorted volume 5×
    // while the estimate stays a REAL data value from the group.
    "q_value_quantiles_sampled" -> ((s, d) => {
      val sampled = graft.ext.Sampling.sample(
        Tables.events(s, d).filter(col("value").isNotNull),
        "event_id", 20)
      val byVal = Window.partitionBy("event_type")
        .orderBy(col("value"), col("event_id"))
      val all = Window.partitionBy("event_type")
      sampled
        .select(col("event_type"), col("value"), col("event_id"))
        .withColumn("rn", row_number().over(byVal))
        .withColumn("n", count(lit(1)).over(all))
        .filter(col("rn") === ceil(col("n") * lit(0.5))
          || col("rn") === ceil(col("n") * lit(0.9)))
        .select(col("event_type"),
          when(col("rn") === ceil(col("n") * lit(0.5)), lit("p50"))
            .otherwise(lit("p90")).as("quantile"),
          col("value"))
        .orderBy("event_type", "quantile")
    }),

    // Window FRAMES (rows-based): per-customer running total
    // (UNBOUNDED PRECEDING) and 3-row moving average over the order
    // timeline — the frame family the ranking/lag queries don't touch.
    // One shuffle (the window key); sums are DECIMAL-exact so the
    // running doubles are bit-identical cross-engine at every row.
    "q_running_totals" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mov = w.rowsBetween(-2, Window.currentRow)
      Tables.orders(s, d)
        .filter(col("o_totalprice") > 350000.0)
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_totalprice"),
          sum(col("o_totalprice").cast(DecimalType(27, 6))).over(run)
            .cast(DoubleType).as("running_total"),
          (sum(col("o_totalprice").cast(DecimalType(27, 6))).over(mov)
            .cast(DoubleType) / count(lit(1)).over(mov)).as("moving_avg"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // X9'''' (r11) — per-group OLS trend (slope of spend over time):
    // the grouped linear-regression primitive behind "is this
    // customer's/source's volume trending up?" dashboards. ONE
    // partial-agg shuffle carries five exact BIGINT moments
    // (n, Σx, Σy, Σx², Σxy) — never the rows — so a 10⁹-row group
    // costs the same exchange bytes as a 10-row one; slope =
    // (nΣxy−ΣxΣy)/(nΣx²−(Σx)²) is ONE IEEE division of exact
    // integers, bit-identical cross-engine. x is centered (day−9000)
    // and y is exact cents so the int64 moments cannot overflow at
    // any realistic group size (~2e16 per term at 1M orders/group).
    "q_trend_slopes" -> ((s, d) => {
      val x = (datediff(col("o_orderdate").cast(DateType),
        lit("1970-01-01").cast(DateType)) - lit(9000)).cast(LongType)
      val y = round(col("o_totalprice") * 100.0).cast(LongType)
      Tables.orders(s, d)
        .select(col("o_custkey"), x.as("x"), y.as("y"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
        .filter(col("n") >= 5)
        .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
        .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
        .filter(col("den") =!= 0)
        .select(col("o_custkey"), col("n"), col("num"), col("den"),
          (col("num").cast(DoubleType) / col("den").cast(DoubleType))
            .as("slope_cents_per_day"))
        .orderBy("o_custkey")
    }),

    // TPC-H Q6 shape: the pure-scan aggregate — every predicate reaches
    // the parquet reader (PushedFilters), zero shuffles, one partial agg
    // folded on the driver. The 100-TB plan IS the sf0.01 plan.
    "q6_forecast_revenue" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType)
          && col("l_shipdate") < lit("1998-01-01").cast(TimestampType)
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount"))
          .as("revenue"))),

    // TPC-H Q4 shape (adapted: fixture has no commit/receipt dates, so
    // the EXISTS predicate is l_shipdate > o_orderdate): a LEFT SEMI
    // join with a non-equi residual condition — each order counted once
    // no matter how many lineitems qualify. One shuffle pair on the
    // order key, then a 5-group partial agg.
    "q4_order_priority" -> ((s, d) => {
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast(TimestampType)
          && col("o_orderdate") < lit("1997-04-01").cast(TimestampType))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
      ord.join(li, col("o_orderkey") === col("l_orderkey")
          && col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q10 shape: returned-item revenue per customer. The fact
    // join (lineitem⋈orders) shuffles on the order key ONCE, the
    // revenue agg reduces to one row per customer BEFORE the customer
    // table joins (so customer — 15M rows at SF100 — joins a
    // pre-reduced side, not the raw fact), nation broadcasts.
    "q10_returned_items" -> ((s, d) => {
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast(TimestampType)
          && col("o_orderdate") < lit("1997-04-01").cast(TimestampType))
        .select("o_orderkey", "o_custkey")
      val li = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val rev = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
      rev.join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q13 shape: customer order-count distribution. Orders reduce
    // to (custkey, count) by partial agg FIRST (the fact never joins
    // raw), then a LEFT OUTER from customer keeps the zero-order
    // customers, and a second tiny agg builds the histogram.
    "q13_order_distribution" -> ((s, d) => {
      val cnt = Tables.orders(s, d)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      Tables.customer(s, d)
        .join(cnt, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(coalesce(col("n_orders"), lit(0L)).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q18 shape: large-volume orders. The HAVING filter runs on
    // the partial-aggregated (orderkey, sum_qty) pairs — at any scale
    // the >300 survivors are a vanishing fraction, so they BROADCAST
    // into orders and customer; no full fact⋈dim shuffle ever happens.
    "q18_large_orders" -> ((s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(dsum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 300.0)
      Tables.orders(s, d)
        .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q19 shape (adapted to fixture columns: brand/size/quantity
    // brackets instead of container/shipmode): disjunctive-predicate
    // join — part broadcasts, the OR-of-ANDs evaluates as a residual
    // filter inside the broadcast hash join, and only the equi-key
    // l_partkey = p_partkey drives matching (never a nested loop).
    "q19_bracket_revenue" -> ((s, d) => {
      val part = Tables.part(s, d).select("p_partkey", "p_brand", "p_size")
      val li = Tables.lineitem(s, d)
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15)
            && col("l_quantity").between(1, 21)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 20)
            && col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 25)
            && col("l_quantity").between(20, 40)))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
    }),

    // TPC-H Q7 shape: volume shipping between two nations. Both nation
    // dims broadcast (each pre-filtered to the 2-nation pair), supplier
    // broadcast; the fact chain shuffles on the order key once, then on
    // the customer key. The OR-of-pairs evaluates as a residual after
    // both nation names are attached.
    "q7_volume_shipping" -> ((s, d) => {
      val n1 = Tables.nation(s, d)
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey").as("n1_key"),
          col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d)
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey").as("n2_key"),
          col("n_name").as("cust_nation"))
      val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType)
          && col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
        .select("l_orderkey", "l_suppkey", "l_shipdate",
          "l_extendedprice", "l_discount")
      li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_1"
            && col("cust_nation") === "NATION_2")
          || (col("supp_nation") === "NATION_2"
            && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          date_format(col("l_shipdate"), "yyyy").as("l_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q8 shape: national market share — conditional revenue ratio
    // per order year. Region→customer side restricts the market; the
    // supplier's nation feeds the CASE. Part and both nation dims
    // broadcast; two fact shuffles (order key, customer key); the
    // share divides two DECIMAL-exact sums.
    "q8_market_share" -> ((s, d) => {
      val asia = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val custNat = Tables.nation(s, d)
        .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cn_key"))
      val supNat = Tables.nation(s, d)
        .select(col("n_nationkey").as("sn_key"),
          col("n_name").as("supp_nation"))
      val part = Tables.part(s, d)
        .filter(col("p_type") === "STANDARD").select("p_partkey")
      val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
        .join(broadcast(supNat), col("s_nationkey") === col("sn_key"))
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType)
          && col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
        .join(broadcast(custNat), col("c_nationkey") === col("cn_key"))
      val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_partkey", "l_suppkey",
          "l_extendedprice", "l_discount")
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(date_format(col("o_orderdate"), "yyyy").as("o_year"))
        .agg(
          dsum(when(col("supp_nation") === "NATION_3", vol)
            .otherwise(lit(0.0))).as("nation_volume"),
          dsum(vol).as("total_volume"))
        .withColumn("mkt_share",
          col("nation_volume") / col("total_volume"))
        .orderBy("o_year")
    }),

    // TPC-H Q15 shape: top supplier by quarterly revenue — a reused
    // aggregate ("view") plus an in-plan scalar-subquery max; the
    // equality filter works because both sides are the same
    // DECIMAL-exact double.
    "q15_top_supplier" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType)
          && col("l_shipdate") < lit("1997-04-01").cast(TimestampType))
        .groupBy(col("l_suppkey"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("total_revenue"))
      val top = rev.agg(max(col("total_revenue")).as("max_revenue"))
      rev.join(broadcast(top))
        .filter(col("total_revenue") === col("max_revenue"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q17 shape: small-quantity-order revenue — a correlated
    // per-part average decorrelated into a partial-agg aggregate
    // joined back on the part key; part pre-filtered and broadcast
    // into BOTH the fact scan and the average (so the avg computes
    // over brand parts only, never the whole fact table).
    "q17_small_quantity" -> ((s, d) => {
      val part = Tables.part(s, d)
        .filter(col("p_brand") === "Brand#23").select("p_partkey")
      val li = Tables.lineitem(s, d)
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      val avgQty = li.groupBy(col("l_partkey").as("ap_key"))
        .agg((dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
      li.join(broadcast(avgQty), col("l_partkey") === col("ap_key"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
    }),

    // TPC-H Q22 shape (adapted: mktsegment stands in for the phone
    // country code): scalar-subquery average — computed in-plan and
    // broadcast as a 1-row cross join, never collect()ed — filters
    // customers above the mean balance, anti-joined against orders.
    // davg is decimal-exact sum / count, so the threshold double is
    // bit-identical in both engines.
    "q22_idle_customers" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val avgBal = cust.filter(col("c_acctbal") > 0.0)
        .agg(davg(col("c_acctbal")).as("avg_bal"))
      cust.join(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(Tables.orders(s, d)
            .filter(col("o_totalprice") > 300000.0).select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("numcust"),
          dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("c_mktsegment")
    }),

    // TPC-H Q2 shape (adapted: the fixture has no partsupp, so the
    // supply relation derives from lineitem — min unit price per
    // (part, supplier) pair). The correlated scalar subquery
    // ("cost = min cost among regional suppliers of THIS part")
    // decorrelates into a per-part min aggregate joined back on
    // (partkey, cost-equality). The supplier→nation→region dim chain
    // broadcasts (fixed-size dims); the part-keyed frames
    // (wantedParts, best) are sf-proportional, so they carry NO
    // broadcast hint — AQE picks broadcast only while they fit under
    // the threshold, and falls back to a shuffle join at scale. Both
    // join-backs key on l_partkey, so they reuse the supply
    // aggregate's partitioning when shuffled. min over IEEE divisions
    // is exact and order-independent, so the equality join is
    // engine-stable.
    "q2_min_cost_supplier" -> ((s, d) => {
      val regionalSup = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val wantedParts = Tables.part(s, d)
        .filter(col("p_size") <= 15 && col("p_type") === "STANDARD")
        .select("p_partkey", "p_name")
      val supply = Tables.lineitem(s, d)
        .join(wantedParts.select("p_partkey"),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(min(col("l_extendedprice") / col("l_quantity"))
          .as("supply_cost"))
      val regional = supply.join(broadcast(regionalSup),
        col("l_suppkey") === col("s_suppkey"))
      val best = regional.groupBy(col("l_partkey").as("bp_key"))
        .agg(min(col("supply_cost")).as("min_cost"))
      regional
        .join(best, col("l_partkey") === col("bp_key")
          && col("supply_cost") === col("min_cost"))
        .join(wantedParts,
          col("l_partkey") === col("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"), col("supply_cost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // TPC-H Q9 shape (adapted: p_retailprice stands in for the absent
    // ps_supplycost): profit per supplier nation per order year over
    // name-matched parts. Part (LIKE-filtered) and supplier⋈nation
    // broadcast; the only fact shuffle is lineitem⋈orders on the
    // order key, then a 25×year partial agg. The per-row profit is a
    // fixed IEEE expression tree, summed decimal-exact.
    "q9_product_profit" -> ((s, d) => {
      val redParts = Tables.part(s, d)
        .filter(col("p_name").like("red%"))
        .select("p_partkey", "p_retailprice")
      val supNat = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val profit = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
        lit(0.5) * col("p_retailprice") * col("l_quantity")
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice", "l_discount")
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supNat), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          date_format(col("o_orderdate"), "yyyy").as("o_year"))
        .agg(dsum(profit).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // TPC-H Q11 shape (adapted: "stock value" = shipped
    // extendedprice×quantity for suppliers in one region): per-part
    // value vs a global scalar threshold — the HAVING-vs-scalar-
    // subquery plan. The threshold aggregate is declared over the
    // SAME per-part frame and broadcasts as a 1-row cross join;
    // whether the per-part aggregation physically computes once
    // depends on exchange reuse (PlanSpec pins the ReusedExchange),
    // and even without it the second pass is over the pre-aggregated
    // exchange input, never a second fact scan from parquet. Both
    // sides of the comparison are decimal-exact doubles.
    "q11_important_parts" -> ((s, d) => {
      val regionalSup = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey")
      val perPart = Tables.lineitem(s, d)
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .join(broadcast(regionalSup),
          col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(dsum(col("l_extendedprice") * col("l_quantity"))
          .as("part_value"))
      val threshold = perPart
        .agg((dsum(col("part_value")) * lit(0.001)).as("cutoff"))
      perPart.join(broadcast(threshold))
        .filter(col("part_value") > col("cutoff"))
        .select("l_partkey", "part_value")
        .orderBy(col("part_value").desc, col("l_partkey"))
    }),

    // TPC-H Q12 shape (adapted: the fixture has no
    // commit/receipt/shipmode, so "late" is shipdate > orderdate +
    // 60 days and returnflag stands in for shipmode): priority-split
    // conditional counts over late lines. The ship-year range pushes
    // to the scan; one shuffle on the order key; the non-equi
    // lateness predicate evaluates as a join residual.
    "q12_priority_shipping" -> ((s, d) => {
      // coalesce(false): a NULL priority row must land in the LOW
      // bucket, matching the ELSE branch of the oracle's CASE — with
      // bare isin, count(when(!high,1)) would drop it from both.
      val high = coalesce(
        col("o_orderpriority").isin("1-URGENT", "2-HIGH"), lit(false))
      Tables.orders(s, d)
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
        .join(
          Tables.lineitem(s, d)
            .filter(col("l_shipdate") >=
                lit("1997-01-01").cast(TimestampType)
              && col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
            .select("l_orderkey", "l_shipdate", "l_returnflag"),
          col("o_orderkey") === col("l_orderkey")
            && col("l_shipdate") >
              col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(count(when(high, 1)).as("high_line_count"),
          count(when(!high, 1)).as("low_line_count"))
        .orderBy("l_returnflag")
    }),

    // TPC-H Q16 shape (adapted: lineitem is the part-supplier
    // relation; negative account balance stands in for the complaint
    // comment): distinct-supplier counts per part attribute triple,
    // with a NOT-IN exclusion list. Neither the excluded-supplier
    // set nor the attr-filtered part frame carries a broadcast
    // hint — both grow with sf, so AQE decides broadcast-vs-shuffle
    // from measured sizes; countDistinct plans as the standard
    // two-phase (expand + partial) aggregate, never a whole-group
    // collect.
    "q16_supplier_counts" -> ((s, d) => {
      val parts = Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#23" && col("p_type") =!= "PROMO"
          && col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val excluded = Tables.supplier(s, d)
        .filter(col("s_acctbal") < 0.0).select("s_suppkey")
      Tables.lineitem(s, d)
        .select("l_partkey", "l_suppkey")
        .join(excluded,
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(parts, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // TPC-H Q20 shape (adapted: the availqty>½·shipped correlation
    // becomes a per-(supplier,part) shipped-quantity threshold —
    // the fixture has no partsupp): the nested-IN chain
    // supplier ← lineitem ← part, each level a LEFT SEMI join with
    // the small side broadcast. The HAVING runs on the partial-agg
    // (suppkey, partkey) pairs; the qualifying supplier set is tiny
    // at any scale, so the outer semi joins broadcast too.
    "q20_promotion_suppliers" -> ((s, d) => {
      val redParts = Tables.part(s, d)
        .filter(col("p_name").like("red%")).select("p_partkey")
      val qualified = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType)
          && col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(broadcast(redParts),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum(col("l_quantity")).as("ship_qty"))
        .filter(col("ship_qty") > 40.0)
        .select("l_suppkey")
      val asiaNations = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey")
      Tables.supplier(s, d)
        .join(broadcast(qualified),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(asiaNations),
          col("s_nationkey") === col("n_nationkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    }),

    // TPC-H Q21 shape (adapted lateness as in Q12): suppliers who
    // were the SOLE late shipper on a multi-supplier finished order.
    // The EXISTS/NOT-EXISTS pair over two lineitem self-aliases
    // decorrelates into ONE per-order aggregate — distinct suppliers
    // and distinct LATE suppliers — joined back on the order key:
    // l1 qualifies iff l1 is late ∧ suppliers ≥ 2 ∧ late-suppliers
    // = 1 (then the only late supplier IS l1's). Both the stats agg
    // and the join-back reuse the same order-key partitioning; the
    // supplier⋈nation⋈region chain broadcasts at the end, after the
    // fact has reduced to qualifying rows.
    "q21_waiting_suppliers" -> ((s, d) => {
      val ordF = Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(ordF, col("l_orderkey") === col("o_orderkey"))
        .withColumn("is_late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      val stats = li.groupBy(col("l_orderkey").as("st_key"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(when(col("is_late"), col("l_suppkey")))
            .as("n_late_supp"))
      val asiaSup = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name")
      li.filter(col("is_late"))
        .join(stats, col("l_orderkey") === col("st_key"))
        .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
        .join(broadcast(asiaSup), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    })
  )

  val oracles: Map[String, String] = Map(
    "q_running_totals" -> """
      SELECT o_custkey, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
             o_totalprice,
             CAST(sum(CAST(o_totalprice AS DECIMAL(27,6))) OVER
               (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS running_total,
             CAST(sum(CAST(o_totalprice AS DECIMAL(27,6))) OVER
               (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
               AS DOUBLE)
             / count(*) OVER
               (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
               AS moving_avg
      FROM orders
      WHERE o_totalprice > 350000.0
      ORDER BY o_custkey, o_orderkey""",

    "q_trend_slopes" -> """
      WITH t AS (
        SELECT o_custkey,
               CAST(date_diff('day', DATE '1970-01-01',
                 CAST(o_orderdate AS DATE)) - 9000 AS BIGINT) AS x,
               CAST(round(o_totalprice * 100.0) AS BIGINT) AS y
        FROM orders
      ),
      g AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM t GROUP BY o_custkey
      )
      SELECT o_custkey, n,
             n * sxy - sx * sy AS num,
             n * sxx - sx * sx AS den,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents_per_day
      FROM g
      WHERE n >= 5 AND n * sxx - sx * sx <> 0
      ORDER BY o_custkey""",

    "q6_forecast_revenue" -> s"""
      SELECT ${oSum("l_extendedprice * l_discount")} AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24""",

    "q4_order_priority" -> """
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders o
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    "q10_returned_items" -> s"""
      SELECT c_custkey, c_name,
             ${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
             c_acctbal, n_name
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey
      LIMIT 20""",

    "q13_order_distribution" -> """
      SELECT c_count, COUNT(*) AS custdist
      FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
      )
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC""",

    "q18_large_orders" -> s"""
      SELECT c_name, c_custkey, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
             o_totalprice, sum_qty
      FROM (
        SELECT l_orderkey, ${oSum("l_quantity")} AS sum_qty
        FROM lineitem GROUP BY l_orderkey
      ) big
      JOIN orders ON o_orderkey = big.l_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE sum_qty > 300.0
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 100""",

    "q19_bracket_revenue" -> s"""
      SELECT ${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 21)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
               AND l_quantity BETWEEN 10 AND 30)
         OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 20 AND 40)""",

    "q7_volume_shipping" -> s"""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             strftime(l_shipdate, '%Y') AS l_year,
             ${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year""",

    "q8_market_share" -> s"""
      SELECT strftime(o_orderdate, '%Y') AS o_year,
             ${oSum("CASE WHEN ns.n_name = 'NATION_3' " +
               "THEN l_extendedprice * (1.0 - l_discount) " +
               "ELSE 0.0 END")} AS nation_volume,
             ${oSum("l_extendedprice * (1.0 - l_discount)")}
               AS total_volume,
             ${oSum("CASE WHEN ns.n_name = 'NATION_3' " +
               "THEN l_extendedprice * (1.0 - l_discount) " +
               "ELSE 0.0 END")}
             / ${oSum("l_extendedprice * (1.0 - l_discount)")}
               AS mkt_share
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ns ON s_nationkey = ns.n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation nc ON c_nationkey = nc.n_nationkey
      JOIN region ON nc.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY o_year
      ORDER BY o_year""",

    "q15_top_supplier" -> s"""
      WITH revenue AS (
        SELECT l_suppkey,
               ${oSum("l_extendedprice * (1.0 - l_discount)")}
                 AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
      )
      SELECT s_suppkey, s_name, total_revenue
      FROM revenue JOIN supplier ON l_suppkey = s_suppkey
      WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      ORDER BY s_suppkey""",

    "q17_small_quantity" -> s"""
      WITH li AS (
        SELECT l_partkey, l_quantity, l_extendedprice
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#23'
      ),
      a AS (
        SELECT l_partkey AS ap_key,
               ${oSum("l_quantity")} / COUNT(*) AS avg_qty
        FROM li GROUP BY l_partkey
      )
      SELECT ${oSum("l_extendedprice")} / 7.0 AS avg_yearly
      FROM li JOIN a ON l_partkey = ap_key
      WHERE l_quantity < 0.2 * avg_qty""",

    "q22_idle_customers" -> s"""
      SELECT c_mktsegment, COUNT(*) AS numcust,
             ${oSum("c_acctbal")} AS totacctbal
      FROM customer
      WHERE c_acctbal > (
          SELECT ${oSum("c_acctbal")} / COUNT(*)
          FROM customer WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_totalprice > 300000.0)
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",

    "q1_pricing_summary" -> s"""
      SELECT l_returnflag, l_linestatus,
        ${oSum("l_quantity")} AS sum_qty,
        ${oSum("l_extendedprice")} AS sum_base_price,
        ${oSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
        ${oSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
        ${oAvg("l_quantity")} AS avg_qty,
        ${oAvg("l_extendedprice")} AS avg_price,
        ${oAvg("l_discount")} AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q_filter_project" -> """
      SELECT l_orderkey, l_linenumber,
        CAST(l_quantity AS INT) AS qty_int,
        l_extendedprice * (1.0 - l_discount) AS net_price,
        upper(l_linestatus) AS status_uc
      FROM lineitem
      WHERE l_quantity > 45.0 AND l_returnflag = 'R'
      ORDER BY l_orderkey, l_linenumber""",

    "q3_shipping_priority" -> s"""
      SELECT l_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
             o_orderpriority,
             ${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10""",

    "q5_revenue_by_nation" -> s"""
      SELECT n_name,
             ${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey
        AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""",

    "q14_promo_revenue" -> s"""
      SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
             ${oSum("CASE WHEN p_type = 'PROMO' " +
               "THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
               AS promo_revenue,
             ${oSum("l_extendedprice * (1.0 - l_discount)")}
               AS total_revenue,
             100.0 * ${oSum("CASE WHEN p_type = 'PROMO' " +
               "THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
               / ${oSum("l_extendedprice * (1.0 - l_discount)")}
               AS promo_pct
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
      GROUP BY ship_month
      ORDER BY ship_month""",

    "q_events_window" -> s"""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
             event_type,
             count(*) AS n_events,
             ${oSum("value")} AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY window_start, event_type""",

    "q_sliding_window" -> """
      SELECT event_id, event_type,
             count(*) OVER w AS hour_cnt,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w
               AS BIGINT) AS hour_sum
      FROM (SELECT event_id, event_type, epoch_us(ts) AS ts_us, value
            FROM events)
      WINDOW w AS (PARTITION BY event_type ORDER BY ts_us
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY event_id""",

    "q_grouping_sets" -> s"""
      SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             coalesce(l_linestatus, 'ALL') AS linestatus,
             count(*) AS n_rows,
             ${oSum("l_quantity")} AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY returnflag, linestatus""",

    "q_retention" -> """
      WITH e AS (
        SELECT user_id, epoch_us(ts) // 86400000000 // 7 AS week,
               event_type
        FROM events
      ),
      cohorts AS (
        SELECT user_id, min(week) AS cohort_week FROM e
        WHERE event_type = 'signup' GROUP BY 1
      ),
      activity AS (SELECT DISTINCT user_id, week FROM e),
      actives AS (
        SELECT cohort_week, week - cohort_week AS offset_weeks,
               count(DISTINCT a.user_id) AS active_users
        FROM activity a JOIN cohorts USING (user_id)
        WHERE week - cohort_week >= 0
        GROUP BY 1, 2
      ),
      sizes AS (
        SELECT cohort_week, count(*) AS cohort_size
        FROM cohorts GROUP BY 1
      )
      SELECT cohort_week, offset_weeks, active_users, cohort_size,
             CAST(active_users AS DOUBLE) / cohort_size AS retention
      FROM actives JOIN sizes USING (cohort_week)
      ORDER BY cohort_week, offset_weeks""",

    "q_resample" -> """
      WITH e AS (
        SELECT event_type, epoch_us(ts) AS ts_us, value, event_id
        FROM events
      ),
      grid AS (
        SELECT event_type,
               unnest(generate_series(
                 ((lo + 21600000000 - 1) // 21600000000) * 21600000000,
                 (hi // 21600000000) * 21600000000,
                 21600000000)) AS t
        FROM (SELECT event_type, min(ts_us) AS lo, max(ts_us) AS hi
              FROM e GROUP BY 1)
      ),
      u AS (
        SELECT event_type, ts_us AS t, value AS v, event_id AS id,
               0 AS is_grid
        FROM e
        UNION ALL
        SELECT event_type, t, NULL, NULL, 1 FROM grid
      ),
      w AS (
        SELECT *,
          last_value(v IGNORE NULLS) OVER
            (PARTITION BY event_type
             ORDER BY t, is_grid, id NULLS LAST
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v0,
          last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
            OVER (PARTITION BY event_type
             ORDER BY t, is_grid, id NULLS LAST
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t0,
          first_value(v IGNORE NULLS) OVER
            (PARTITION BY event_type
             ORDER BY t, is_grid, id NULLS LAST
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS v1,
          first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
            OVER (PARTITION BY event_type
             ORDER BY t, is_grid, id NULLS LAST
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS t1
        FROM u
      )
      SELECT event_type, t AS grid_ts,
             CASE WHEN v1 IS NULL OR t1 = t0 THEN v0
                  ELSE v0 + (v1 - v0) *
                    (CAST(t - t0 AS DOUBLE) / CAST(t1 - t0 AS DOUBLE))
             END AS value
      FROM w WHERE is_grid = 1 AND v0 IS NOT NULL
      ORDER BY event_type, grid_ts""",

    "q_funnel" -> """
      WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
      ),
      s1 AS (
        SELECT user_id, min(ts_us) AS t1 FROM e
        WHERE event_type = 'view' GROUP BY 1
      ),
      s2 AS (
        SELECT e.user_id, min(ts_us) AS t2
        FROM e JOIN s1 USING (user_id)
        WHERE event_type = 'click' AND ts_us > t1 GROUP BY 1
      ),
      s3 AS (
        SELECT e.user_id, min(ts_us) AS t3
        FROM e JOIN s2 USING (user_id)
        WHERE event_type = 'purchase' AND ts_us > t2 GROUP BY 1
      )
      SELECT '1_view' AS stage, count(*) AS users FROM s1
      UNION ALL SELECT '2_click', count(*) FROM s2
      UNION ALL SELECT '3_purchase', count(*) FROM s3
      ORDER BY stage""",

    "q_user_sessions" -> s"""
      WITH marked AS (
        SELECT user_id, event_id, ts, value,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
               THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ),
      sessions AS (
        SELECT *, sum(new_session) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
      )
      SELECT user_id,
        strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
          AS session_end,
        count(*) AS n_events,
        ${oSum("value")} AS sum_value
      FROM sessions
      GROUP BY user_id, sid
      ORDER BY user_id, session_start""",

    "q_rollup_returns" -> s"""
      SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             coalesce(l_linestatus, 'ALL') AS linestatus,
             count(*) AS n_rows,
             ${oSum("l_quantity")} AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus""",

    "q_customers_no_orders" -> """
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_totalprice > 250000.0)
      ORDER BY c_custkey""",

    "q_big_spenders" -> """
      SELECT c_custkey, c_name
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_totalprice > 300000.0)
      ORDER BY c_custkey""",

    "q_stats_by_flag" -> s"""
      WITH agg AS (
        SELECT l_returnflag,
               count(*) AS n,
               min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
               ${oSum("l_quantity")} AS sum_qty,
               ${oSum("l_quantity * l_quantity")} AS sum_qty2
        FROM lineitem GROUP BY l_returnflag
      )
      SELECT l_returnflag, n, min_qty, max_qty,
             sum_qty / n AS mean_qty,
             (sum_qty2 - sum_qty * sum_qty / n) / (n - 1) AS var_qty
      FROM agg ORDER BY l_returnflag""",

    "q_bloom_join" -> """
      SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                           WHERE o_totalprice > 400000.0)
      ORDER BY l_orderkey, l_linenumber""",

    "q_salted_join" -> s"""
      SELECT o_orderpriority,
             count(*) AS n_items,
             ${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    "q_pivot_events" -> """
      SELECT user_id,
             count(*) FILTER (event_type = 'click')    AS n_click,
             count(*) FILTER (event_type = 'error')    AS n_error,
             count(*) FILTER (event_type = 'purchase') AS n_purchase,
             count(*) FILTER (event_type = 'signup')   AS n_signup,
             count(*) FILTER (event_type = 'view')     AS n_view
      FROM events
      GROUP BY user_id
      ORDER BY user_id""",

    "q_event_gaps" -> """
      SELECT event_id, user_id, epoch_us(ts) AS ts,
             epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
             lead(event_type) OVER w AS next_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY event_id""",

    "q_order_ranks" -> """
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             rank() OVER w AS rnk,
             dense_rank() OVER w AS drnk,
             ntile(4) OVER w AS quartile
      FROM orders
      WHERE o_totalprice > 400000.0
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey)
      ORDER BY o_orderpriority, rnk, o_orderkey""",

    "q_topk_groups" -> """
      SELECT o_orderpriority, CAST(rn AS INT) AS rank, o_orderkey,
             o_totalprice
      FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
              row_number() OVER (PARTITION BY o_orderpriority
                ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders)
      WHERE rn <= 3
      ORDER BY o_orderpriority, rank""",

    "q_order_percentiles" -> """
      SELECT o_orderpriority, o_orderkey,
             percent_rank() OVER w AS pct_rank,
             cume_dist() OVER w AS cume
      FROM orders
      WHERE o_totalprice > 400000.0
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey)
      ORDER BY o_orderpriority, o_orderkey""",

    "q_cube_returns" -> s"""
      SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             coalesce(l_linestatus, 'ALL') AS linestatus,
             count(*) AS n_rows,
             ${oSum("l_quantity")} AS sum_qty
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus""",

    "q_value_quantiles" -> """
      WITH r AS (
        SELECT event_type, value, event_id,
               row_number() OVER
                 (PARTITION BY event_type ORDER BY value, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events WHERE value IS NOT NULL
      )
      SELECT event_type,
             CASE WHEN rn = ceil(n * 0.5) THEN 'p50' ELSE 'p90' END
               AS quantile,
             value
      FROM r
      WHERE rn = ceil(n * 0.5) OR rn = ceil(n * 0.9)
      ORDER BY event_type, quantile""",

    "q_zorder" -> s"""
      SELECT event_id,
             ${graft.ext.Layout.zValueSql(
               "((epoch_us(ts) // 1000000) // 3600) % 65536",
               "CAST(floor(value / 10) AS BIGINT)")} AS z
      FROM events WHERE value IS NOT NULL
      ORDER BY z, event_id""",

    "q_value_quantiles_sampled" -> """
      WITH s AS (
        SELECT event_type, value, event_id FROM events
        WHERE value IS NOT NULL
          AND ('0x' || md5(CAST(event_id AS VARCHAR))[1:8])::BIGINT
              % 100 < 20
      ),
      r AS (
        SELECT event_type, value, event_id,
               row_number() OVER
                 (PARTITION BY event_type ORDER BY value, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM s
      )
      SELECT event_type,
             CASE WHEN rn = ceil(n * 0.5) THEN 'p50' ELSE 'p90' END
               AS quantile,
             value
      FROM r
      WHERE rn = ceil(n * 0.5) OR rn = ceil(n * 0.9)
      ORDER BY event_type, quantile""",

    "q2_min_cost_supplier" -> """
      WITH regional_sup AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
      ),
      wanted AS (
        SELECT p_partkey, p_name FROM part
        WHERE p_size <= 15 AND p_type = 'STANDARD'
      ),
      supply AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS supply_cost
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM wanted)
        GROUP BY l_partkey, l_suppkey
      ),
      regional AS (
        SELECT * FROM supply JOIN regional_sup ON l_suppkey = s_suppkey
      )
      SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
      FROM regional
      JOIN (SELECT l_partkey AS bp_key, min(supply_cost) AS min_cost
            FROM regional GROUP BY l_partkey) best
        ON l_partkey = bp_key AND supply_cost = min_cost
      JOIN wanted ON l_partkey = p_partkey
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      LIMIT 100""",

    "q9_product_profit" -> s"""
      SELECT n_name AS nation,
             strftime(o_orderdate, '%Y') AS o_year,
             ${oSum("l_extendedprice * (1.0 - l_discount) " +
               "- 0.5 * p_retailprice * l_quantity")} AS sum_profit
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      WHERE p_name LIKE 'red%'
      GROUP BY 1, 2
      ORDER BY 1, 2 DESC""",

    "q11_important_parts" -> s"""
      WITH per_part AS (
        SELECT l_partkey,
               ${oSum("l_extendedprice * l_quantity")} AS part_value
        FROM lineitem
        WHERE l_suppkey IN (
            SELECT s_suppkey FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE')
        GROUP BY l_partkey
      )
      SELECT l_partkey, part_value
      FROM per_part
      WHERE part_value > (SELECT ${oSum("part_value")} * 0.001
                          FROM per_part)
      ORDER BY part_value DESC, l_partkey""",

    "q12_priority_shipping" -> """
      SELECT l_returnflag,
             count(*) FILTER (
               o_orderpriority IN ('1-URGENT', '2-HIGH'))
               AS high_line_count,
             count(*) FILTER (
               o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               OR o_orderpriority IS NULL)
               AS low_line_count
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    "q16_supplier_counts" -> """
      SELECT p_brand, p_type, p_size,
             count(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_brand <> 'Brand#23' AND p_type <> 'PROMO'
        AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0.0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",

    "q20_promotion_suppliers" -> s"""
      SELECT s_suppkey, s_name, s_acctbal
      FROM supplier
      WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'red%')
            AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY l_suppkey, l_partkey
          HAVING ${oSum("l_quantity")} > 40.0)
        AND s_nationkey IN (
          SELECT n_nationkey FROM nation
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA')
      ORDER BY s_suppkey""",

    "q21_waiting_suppliers" -> """
      SELECT s_name, count(*) AS numwait
      FROM lineitem l1
      JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
      JOIN supplier ON s_suppkey = l1.l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
      WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > o_orderdate
                            + INTERVAL 60 DAY)
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 100"""
  )
}
