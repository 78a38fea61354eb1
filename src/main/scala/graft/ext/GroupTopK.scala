package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X19 — skew-immune group-wise top-k (the "best k per key" reduction
  * every leaderboard / per-query candidate cut / per-domain sampling
  * pass needs) via the bounded-heap aggregate
  * [[graft.functions.TopKRows]].
  *
  * The window formulation (`row_number` over the group, keep rn ≤ k)
  * co-locates EVERY row of a group on one reducer before ranking — a
  * hot group serializes there; `collect_list`-then-slice keeps partial
  * state proportional to rows seen. This operator's aggregation state
  * is ≤ k entries at every stage — map-side partial, shuffled partial,
  * merged final — so a group costs O(rows·log k) compute and O(k)
  * bytes moved regardless of how hot it is (PlanSpec pins the
  * ObjectHashAggregate partial/final pair and the absence of any
  * Window; RandomizedEquivalenceSpec proves equality with the window
  * formulation).
  */
object GroupTopK {

  /** @return groupCols* :+ (rank 1..k, idCol, valueCol) — rank by
    *         (value DESC, id ASC) within each group */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   valueCol: String, idCol: String, k: Int): DataFrame = {
    val bridge = org.apache.spark.sql.graft.ColumnBridge
    val agg = bridge.column(graft.functions.TopKRows(
      bridge.expression(col(valueCol).cast("double")),
      bridge.expression(col(idCol).cast("long")), k)
      .toAggregateExpression())
    val g = groupCols.map(col)
    df.filter(col(valueCol).isNotNull && col(idCol).isNotNull)
      .groupBy(g: _*)
      .agg(agg.as("_top"))
      .select(g :+ posexplode(col("_top")).as(Seq("_pos", "_t")): _*)
      .select(g :+ (col("_pos") + 1).cast("int").as("rank") :+
        col("_t.id").as(idCol) :+ col("_t.value").as(valueCol): _*)
  }
}
