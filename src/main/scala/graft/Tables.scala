package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet test tables (TESTDATA.md /
  * FIXTURES.md §A). One parquet directory per scale factor; every
  * `SparkEntry.queries` entry receives the directory as its second arg.
  *
  * At cluster scale these would be catalog tables (partitioned/bucketed
  * parquet or a lakehouse format); the loader isolates that decision so
  * the operator library never hard-codes paths.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")

  /** The events stream table. Contract: `ts` is LONG epoch NANOS —
    * every downstream op (windows, as-of joins, gap/session analysis,
    * z-order) does exact integer arithmetic on it. The fixture has
    * carried `ts` as parquet TIMESTAMP(NANOS) (read as long via the
    * legacy nanosAsLong conf) and as TIMESTAMP(MICROS) in different
    * generations; normalize HERE so the contract survives either
    * physical type. Session time zone is pinned UTC everywhere in this
    * library, so the NTZ→LTZ cast is shift-free. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw
      case _ => raw.withColumn("ts",
        unix_micros(col("ts").cast(TimestampType)) * 1000L)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
