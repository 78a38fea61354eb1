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
}
