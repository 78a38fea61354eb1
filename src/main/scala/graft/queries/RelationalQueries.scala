package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
        .orderBy("l_orderkey", "l_linenumber"))
  )

  val oracles: Map[String, String] = Map(
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
      ORDER BY l_orderkey, l_linenumber"""
  )
}
