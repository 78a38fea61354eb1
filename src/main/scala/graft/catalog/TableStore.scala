package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import scala.collection.mutable

/** Namespaced table/view registry — the reference's catalog surface
  * (SURVEY §2.1 S6/S7/S8/S9/S10) re-expressed without a lakehouse
  * catalog service.
  *
  * Reference semantics being mirrored:
  *  - `CREATE NAMESPACE IF NOT EXISTS`
  *    (`/root/reference/jobs/ingest_orders_raw.py:22`)
  *  - `CREATE TABLE IF NOT EXISTS` with declared schema
  *    (`ingest_orders_raw.py:24-34`)
  *  - `CREATE VIEW` for the privacy layer (`README.md:106-116`)
  *  - `SHOW SCHEMAS` / `SHOW TABLES` (`README.md:200-201`)
  *  - temp-view staging for MERGE sources (`merge_orders_silver.py:132`)
  *
  * Every registration is reachable from `spark.sql` under its QUALIFIED
  * name — `silver.orders_current_priv`, or the reference's full
  * `iceberg.silver.orders_current_priv` spelling — via
  * [[ResolveGraftRelations]], the analyzer rule [[graft.GraftExtensions]]
  * injects (the same `spark.sql.extensions` mechanism Iceberg's own
  * extension jar uses, `/root/reference/jobs/merge_orders_silver.py:15`).
  * A flat `<namespace>_<table>` temp view is kept as well for sessions
  * built without the extension. In a cluster deployment the same
  * interface fronts a metastore; here it is in-session state (the
  * reference's REST catalog is also just a service wrapping a map of
  * table → storage location).
  */
class TableStore(val spark: SparkSession) {

  private val namespaces = mutable.SortedSet.empty[String]
  private val tables = mutable.SortedMap.empty[String, DataFrame]
  private val views = mutable.SortedSet.empty[String]

  private def key(ns: String, name: String) = s"$ns.$name"

  /** S6 — CREATE NAMESPACE IF NOT EXISTS. */
  def createNamespace(ns: String): Unit = namespaces += ns

  def listNamespaces(): Seq[String] = namespaces.toSeq

  /** Register (or replace) a table under `ns.name`: resolvable from
    * `spark.sql` as `ns.name` (and `iceberg.ns.name`), plus the flat
    * `ns_name` temp view. */
  def register(ns: String, name: String, df: DataFrame): Unit = {
    createNamespace(ns)
    tables(key(ns, name)) = df
    df.queryExecution.analyzed // force analysis at registration time
    TableStore.registry(spark).put(
      Seq(ns, name).map(_.toLowerCase(java.util.Locale.ROOT)), df)
    df.createOrReplaceTempView(s"${ns}_$name")
  }

  /** S7 — CREATE TABLE IF NOT EXISTS with a declared schema: registers
    * an empty frame only when absent; returns the current table. */
  def createTableIfNotExists(ns: String, name: String,
                             schema: StructType): DataFrame = {
    if (!tables.contains(key(ns, name)))
      register(ns, name, spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
    table(ns, name)
  }

  /** S8 — CREATE VIEW: same registration, flagged as a view (a Spark
    * temp view IS lazy — the masking projection re-evaluates at query
    * time exactly like the reference's Trino view). */
  def createView(ns: String, name: String, df: DataFrame): Unit = {
    register(ns, name, df)
    views += key(ns, name)
  }

  /** Current table state — the shared registry first (a SQL MERGE may
    * have replaced the snapshot since registration), the local map as
    * fallback. */
  def table(ns: String, name: String): DataFrame =
    TableStore.registry(spark)
      .get(Seq(ns, name).map(_.toLowerCase(java.util.Locale.ROOT)))
      .getOrElse(tables(key(ns, name)))

  def table(qualified: String): DataFrame = {
    val Array(ns, name) = qualified.split("\\.", 2)
    table(ns, name)
  }

  /** S9 — SHOW SCHEMAS as a DataFrame. */
  def showSchemas(): DataFrame = {
    import spark.implicits._
    listNamespaces().toDF("namespace")
  }

  /** S9 — SHOW TABLES [IN ns] as a DataFrame (is_view mirrors engines
    * that list views alongside tables). */
  def showTables(ns: String = ""): DataFrame = {
    import spark.implicits._
    tables.keys.toSeq
      .filter(k => ns.isEmpty || k.startsWith(s"$ns."))
      .map { k =>
        val Array(n, t) = k.split("\\.", 2)
        (n, t, views.contains(k))
      }
      .toDF("namespace", "table_name", "is_view")
  }

  /** S10 — temp-view staging for a MERGE source. */
  def stage(name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(name)
}

object TableStore {

  // Per-session qualified-name registry read by ResolveGraftRelations.
  // Shared across TableStore instances on the same session (like a
  // catalog service shared by all clients); weak keys let sessions be
  // collected.
  private val registries =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        scala.collection.concurrent.TrieMap[Seq[String], DataFrame]]())

  private[catalog] def registry(s: SparkSession) = {
    val existing = registries.get(s)
    if (existing != null) existing
    else registries.synchronized {
      val again = registries.get(s)
      if (again != null) again
      else {
        val fresh =
          scala.collection.concurrent.TrieMap.empty[Seq[String], DataFrame]
        registries.put(s, fresh)
        fresh
      }
    }
  }
}
