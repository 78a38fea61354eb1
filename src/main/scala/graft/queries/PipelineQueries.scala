package graft.queries

import graft.Tables
import graft.cdc.{Checkpoints, Synth}
import graft.pipeline.Silver
import graft.privacy.Mask
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked queries covering the reference's CDC pipeline surface
  * (SURVEY §2.1–2.5): bronze ingestion shape, envelope parse, both silver
  * materializations, checkpointing, privacy masking.
  *
  * Determinism contract with the DuckDB oracle (SURVEY §7.4):
  *  - timestamps leave as formatted strings (no tz/precision ambiguity)
  *  - every result has a total-order ORDER BY
  *  - no current_timestamp / rand anywhere
  *  - JSON is concat-built on both sides (byte-identical)
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  val Salt = "SALT123"

  private def tsToStr(df: DataFrame, c: String): DataFrame =
    df.withColumn(c, date_format(col(c), "yyyy-MM-dd HH:mm:ss"))

  val queries: Map[String, Q] = Map(
    "q_cdc_bronze" -> ((s, d) =>
      tsToStr(Synth.bronze(Tables.orders(s, d)), "kafka_ts")
        .orderBy("partition", "offset")),

    "q_cdc_parse" -> ((s, d) =>
      Silver.changes(Synth.bronze(Tables.orders(s, d)))
        .select(col("partition"), col("offset"), col("order_id"),
          col("user_id"), col("amount_eur"), col("status"), col("op"),
          col("ts_ms"))
        .orderBy("partition", "offset")),

    "q_cdc_silver_rebuild" -> ((s, d) =>
      tsToStr(Silver.rebuild(Synth.bronze(Tables.orders(s, d))),
        "last_change_ts").orderBy("order_id")),

    "q_cdc_silver_merge" -> ((s, d) => {
      val bronze = Synth.bronze(Tables.orders(s, d))
      tsToStr(Silver.mergeBatch(Silver.rebuild(bronze).limit(0), bronze),
        "last_change_ts").orderBy("order_id")
    }),

    "q_cdc_silver_incremental" -> ((s, d) =>
      tsToStr(Silver.incremental(Synth.bronze(Tables.orders(s, d)), 3),
        "last_change_ts").orderBy("order_id")),

    "q_cdc_checkpoint" -> ((s, d) => {
      val bronze = Synth.bronze(Tables.orders(s, d))
      val last = bronze.agg(max("offset")).collect()(0).getLong(0)
      val cp = Checkpoints.advance(Checkpoints.empty(s), "orders_silver",
        last, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
      cp.select("pipeline", "last_offset").orderBy("pipeline")
    }),

    "q_privacy_current" -> ((s, d) => {
      val silver = Silver.rebuild(Synth.bronze(Tables.orders(s, d)))
      tsToStr(Mask.pseudonymize(silver, "user_id", Salt, "user_key"),
        "last_change_ts").orderBy("order_id")
    })
  )

  // ---------------------------------------------------------------------
  // DuckDB oracle SQL. `EVO` mirrors Synth.changeEvents + offset
  // assignment 1:1; `SILVER_*` mirror the two materialization semantics.
  // ---------------------------------------------------------------------

  /** epoch-ms → 'yyyy-MM-dd HH:mm:ss' string, second-truncating, tz-free
    * (mirrors Envelope.lastChangeTs + date_format under UTC session). */
  private def tsStr(expr: String): String =
    s"strftime(make_timestamp((($expr // 1000) * 1000000)::BIGINT), '%Y-%m-%d %H:%M:%S')"

  private val evoCte: String = s"""
    base AS (
      SELECT o_orderkey AS k, o_custkey AS u, o_totalprice AS p,
             o_orderstatus AS s, o_orderdate AS d
      FROM orders
    ),
    ev AS (
      SELECT k, u, epoch_ms(d) AS ts_ms, 'c' AS op,
             CAST(printf('%.2f', p) AS DOUBLE) AS amt, s AS st
      FROM base
      UNION ALL
      SELECT k, u, epoch_ms(d) + 3600000, 'u',
             CAST(('1' || printf('%.2f', p)) AS DOUBLE), 'updated'
      FROM base WHERE k % 3 = 0
      UNION ALL
      SELECT k, u, epoch_ms(d) + 7200000, 'd',
             CASE WHEN k % 3 = 0 THEN CAST(('1' || printf('%.2f', p)) AS DOUBLE)
                  ELSE CAST(printf('%.2f', p) AS DOUBLE) END,
             CASE WHEN k % 3 = 0 THEN 'updated' ELSE s END
      FROM base WHERE k % 17 = 0
    ),
    evo AS (SELECT *, row_number() OVER (PARTITION BY k % 4 ORDER BY ts_ms, k) AS off FROM ev)"""

  private val silverSelect: String = s"""
    SELECT CAST(k AS INT) AS order_id, CAST(u AS INT) AS user_id,
           amt AS amount_eur, st AS status,
           ${tsStr("ts_ms")} AS last_change_ts
    FROM ranked WHERE rn = 1"""

  private val silverRebuildSql: String = s"""
    WITH $evoCte,
    ranked AS (
      SELECT *, row_number() OVER
        (PARTITION BY k ORDER BY ts_ms DESC, off DESC) AS rn
      FROM evo WHERE op <> 'd'
    )
    $silverSelect ORDER BY order_id"""

  private val silverMergeSql: String = s"""
    WITH $evoCte,
    ranked AS (
      SELECT *, row_number() OVER
        (PARTITION BY k ORDER BY ts_ms DESC, off DESC) AS rn
      FROM evo
    )
    $silverSelect AND op <> 'd' ORDER BY order_id"""

  private val bronzeSql: String = """
    WITH base AS (
      SELECT o_orderkey AS k, o_custkey AS u, o_totalprice AS p,
             o_orderstatus AS s, o_orderdate AS d
      FROM orders
    ),
    imgs AS (
      SELECT *,
        CASE WHEN k % 5 = 0 THEN ' ' || printf('%.2f', p) || ' '
             ELSE printf('%.2f', p) END AS amt_c,
        CASE WHEN k % 5 = 0 THEN ' 1' || printf('%.2f', p) || ' '
             ELSE '1' || printf('%.2f', p) END AS amt_u,
        strftime(d, '%Y-%m-%d %H:%M:%S') AS cat
      FROM base
    ),
    withimg AS (
      SELECT *,
        '{"order_id":' || k || ',"user_id":' || u || ',"amount_eur":"' ||
          amt_c || '","status":"' || s || '","created_at":"' || cat ||
          '"}' AS ins_img,
        '{"order_id":' || k || ',"user_id":' || u || ',"amount_eur":"' ||
          amt_u || '","status":"updated","created_at":"' || cat ||
          '"}' AS upd_img
      FROM imgs
    ),
    ev AS (
      SELECT k, epoch_ms(d) AS ts_ms,
        '{"before":null,"after":' || ins_img || ',"op":"c","ts_ms":' ||
          epoch_ms(d) || '}' AS env
      FROM withimg
      UNION ALL
      SELECT k, epoch_ms(d) + 3600000,
        '{"before":' || ins_img || ',"after":' || upd_img ||
          ',"op":"u","ts_ms":' || (epoch_ms(d) + 3600000) || '}'
      FROM withimg WHERE k % 3 = 0
      UNION ALL
      SELECT k, epoch_ms(d) + 7200000,
        '{"before":' || CASE WHEN k % 3 = 0 THEN upd_img ELSE ins_img END ||
          ',"after":null,"op":"d","ts_ms":' || (epoch_ms(d) + 7200000) || '}'
      FROM withimg WHERE k % 17 = 0
    ),
    evo AS (SELECT *, row_number() OVER (PARTITION BY k % 4 ORDER BY ts_ms, k) AS "offset" FROM ev)
    SELECT 'pg.public.orders' AS topic, CAST(k % 4 AS INT) AS "partition",
      "offset",
      strftime(make_timestamp(((ts_ms // 1000) * 1000000)::BIGINT), '%Y-%m-%d %H:%M:%S') AS kafka_ts,
      '{"order_id":' || k || '}' AS k,
      CASE WHEN k % 11 = 0 THEN env
           ELSE '{"payload":' || env || '}' END AS v
    FROM evo ORDER BY "partition", "offset""""

  val oracles: Map[String, String] = Map(
    "q_cdc_bronze" -> bronzeSql,

    "q_cdc_parse" -> s"""
      WITH $evoCte
      SELECT CAST(k % 4 AS INT) AS "partition", off AS "offset",
             CAST(k AS INT) AS order_id,
             CAST(u AS INT) AS user_id, amt AS amount_eur, st AS status,
             op, ts_ms
      FROM evo ORDER BY "partition", "offset"""",

    "q_cdc_silver_rebuild" -> silverRebuildSql,
    "q_cdc_silver_merge" -> silverMergeSql,
    "q_cdc_silver_incremental" -> silverMergeSql,

    "q_cdc_checkpoint" -> s"""
      WITH $evoCte
      SELECT 'orders_silver' AS pipeline,
             CAST(max(off) AS BIGINT) AS last_offset
      FROM evo""",

    "q_privacy_current" -> s"""
      WITH $evoCte,
      ranked AS (
        SELECT *, row_number() OVER
          (PARTITION BY k ORDER BY ts_ms DESC, off DESC) AS rn
        FROM evo WHERE op <> 'd'
      )
      SELECT CAST(k AS INT) AS order_id,
             sha256(CAST(CAST(u AS INT) AS VARCHAR) || '::$Salt') AS user_key,
             amt AS amount_eur, st AS status,
             ${tsStr("ts_ms")} AS last_change_ts
      FROM ranked WHERE rn = 1 ORDER BY order_id"""
  )
}
