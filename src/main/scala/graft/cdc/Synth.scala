package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic synthesis of a Debezium-shaped CDC event log from the
  * driver's `orders.parquet` (FIXTURES.md §B "synthesis recipe"). The
  * reference ingests this exact envelope shape from Kafka topic
  * `pg.public.orders` (`/root/reference/jobs/ingest_orders_raw.py:36-51`,
  * `/root/reference/connectors/debezium-postgres.json:14-15`); with no
  * kafka jar locally, the event log is materialized as a DataFrame with
  * identical columns.
  *
  * Event plan per order key `k` (all arithmetic mirrored 1:1 in the
  * DuckDB oracle SQL — no randomness, no wall clock):
  *   - op `c` at `ts_ms = epoch_ms(o_orderdate)`, after = insert image
  *   - op `u` at `+1h` iff `k % 3 == 0` (amount = "1" prepended to the
  *     insert amount string — a pure string transform, so both engines
  *     produce byte-identical update amounts with no float re-rounding;
  *     `%.2f` of `p * 1.1` rounds differently in Java vs C on near-tie
  *     doubles like 9795.005 — status "updated")
  *   - op `d` at `+2h` iff `k % 17 == 0` (after = null, before = last image)
  * Pollution: iff `k % 5 == 0` the amount string is ` <amt> ` (leading/
  * trailing spaces — exercises the reference's regex cleanup,
  * `build_orders_silver.py:81`). Bare-envelope variant (no `payload`
  * wrapper, `build_orders_silver.py:28`): iff `k % 11 == 0`.
  *
  * JSON is built by string concat — NOT `to_json` — so the oracle can
  * reproduce byte-identical strings with `printf`/`strftime`/`||`.
  *
  * Scale note: offsets are assigned PER KAFKA PARTITION
  * (`Window.partitionBy(partition)`), mirroring Kafka's real ordering
  * contract — offsets are only ordered within a partition. This keeps
  * the fixture generator shuffle-parallel (no single-partition global
  * sort). A key's events all land in one partition (`k % 4`), so
  * `(ts_ms, offset)` remains a total order per key — exactly what the
  * LWW dedup needs.
  */
object Synth {

  val Topic = "pg.public.orders"

  private def jstr(inner: Column*): Column = concat(inner: _*)

  /** `%.2f`-formatted amount (matches DuckDB `printf('%.2f', x)`). */
  private def amt2(c: Column): Column = format_string("%.2f", c)

  /** JSON row image `{"order_id":N,...}` built via concat. */
  private def image(orderId: Column, userId: Column, amount: Column,
                    status: Column, createdAt: Column): Column = jstr(
    lit("{\"order_id\":"), orderId.cast("string"),
    lit(",\"user_id\":"), userId.cast("string"),
    lit(",\"amount_eur\":\""), amount, lit("\""),
    lit(",\"status\":\""), status, lit("\""),
    lit(",\"created_at\":\""), date_format(createdAt, "yyyy-MM-dd HH:mm:ss"),
    lit("\"}")
  )

  private def envelope(before: Column, after: Column, op: String,
                       tsMs: Column): Column = jstr(
    lit("{\"before\":"), before,
    lit(",\"after\":"), after,
    lit(",\"op\":\""), lit(op),
    lit("\",\"ts_ms\":"), tsMs.cast("string"), lit("}")
  )

  /** Build the raw CDC event stream from `orders`: one row per event with
    * columns (order_key long, ts_ms long, op string, env string).
    */
  def changeEvents(orders: DataFrame): DataFrame = {
    val k = col("o_orderkey")
    // o_orderdate arrives as TIMESTAMP_NTZ from parquet; unix_millis
    // requires TIMESTAMP (tz-aware). The session runs UTC, so the cast
    // interprets the naive value as UTC — exactly DuckDB's epoch_ms.
    val baseTs = unix_millis(col("o_orderdate").cast("timestamp"))
    def polluted(a: Column): Column =
      when(k % 5 === 0, concat(lit(" "), a, lit(" "))).otherwise(a)

    val insertImage = image(k, col("o_custkey"),
      polluted(amt2(col("o_totalprice"))), col("o_orderstatus"),
      col("o_orderdate"))
    val updateImage = image(k, col("o_custkey"),
      polluted(concat(lit("1"), amt2(col("o_totalprice")))), lit("updated"),
      col("o_orderdate"))
    val lastImage = when(k % 3 === 0, updateImage).otherwise(insertImage)

    val inserts = orders.select(
      k.as("order_key"), baseTs.as("ts_ms"), lit("c").as("op"),
      envelope(lit("null"), insertImage, "c", baseTs).as("env"))
    val updates = orders.filter(k % 3 === 0).select(
      k.as("order_key"), (baseTs + 3600000L).as("ts_ms"), lit("u").as("op"),
      envelope(insertImage, updateImage, "u", baseTs + 3600000L).as("env"))
    val deletes = orders.filter(k % 17 === 0).select(
      k.as("order_key"), (baseTs + 7200000L).as("ts_ms"), lit("d").as("op"),
      envelope(lastImage, lit("null"), "d", baseTs + 7200000L).as("env"))

    inserts.unionByName(updates).unionByName(deletes)
  }

  /** Bronze table exactly as the reference ingests it
    * (`ingest_orders_raw.py:25-33`, minus the nondeterministic
    * `ingested_at` audit column): topic, partition, offset, kafka_ts, k, v.
    */
  def bronze(orders: DataFrame): DataFrame = {
    val ev = changeEvents(orders)
      .withColumn("partition", (col("order_key") % 4).cast("int"))
    val w = Window.partitionBy(col("partition"))
      .orderBy(col("ts_ms"), col("order_key"))
    ev
      .withColumn("offset", row_number().over(w).cast("long"))
      .select(
        lit(Topic).as("topic"),
        col("partition"),
        col("offset"),
        Envelope.lastChangeTs(col("ts_ms")).as("kafka_ts"),
        concat(lit("{\"order_id\":"), col("order_key").cast("string"),
          lit("}")).as("k"),
        when(col("order_key") % 11 === 0, col("env"))
          .otherwise(concat(lit("{\"payload\":"), col("env"), lit("}")))
          .as("v"))
  }
}
