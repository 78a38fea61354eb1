package graft

import graft.queries.RelationalQueries
import org.apache.spark.sql.functions._

/** Cross-checks for relational queries whose shipped form deliberately
  * differs from the textbook Spark API for plan-shape reasons. */
class RelationalExtraSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("conditional-agg pivot is row-identical to groupBy().pivot()") {
    val ev = Tables.events(spark, sf)
    val got = RelationalQueries.pivotEventCounts(ev)
      .orderBy("user_id").collect().toSeq
    val types = RelationalQueries.EventTypes
    val pivoted = ev.groupBy("user_id")
      .pivot("event_type", types).agg(count(lit(1)))
    val want = pivoted.select(
      col("user_id") +:
        types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
      .orderBy("user_id").collect().toSeq
    assert(got == want)
  }

  test("q12's priority buckets are total: a NULL o_orderpriority row " +
    "lands in the LOW bucket (the oracle's CASE/ELSE), not in neither") {
    import spark.implicits._
    // the exact bucket expressions q12_priority_shipping ships
    val high = coalesce(
      col("p").isin("1-URGENT", "2-HIGH"), lit(false))
    val rows = Seq(Some("1-URGENT"), Some("3-MEDIUM"), None)
      .toDF("p")
      .agg(count(when(high, 1)).as("high"),
        count(when(!high, 1)).as("low"))
      .as[(Long, Long)].head()
    // 1 high, 2 low (the NULL row counts low) — buckets sum to 3
    assert(rows == ((1L, 2L)),
      s"NULL priority must count in the low bucket, got $rows")
  }
}
