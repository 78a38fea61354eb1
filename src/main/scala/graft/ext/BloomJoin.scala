package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Bloom-filter join pruning (SURVEY §2.7 X15) — the shuffle-reduction
  * trick behind Spark's own runtime row-level filtering
  * (`InjectRuntimeFilter`), exposed as an explicit operator: build a
  * compact bloom sketch over the build side's join key, prefilter the
  * probe side with `might_contain` BEFORE its exchange, then run the
  * exact join to remove the bloom's false positives. Results are
  * identical to the plain join; what changes is how many probe rows
  * cross the wire.
  *
  * At 100 TB this is the difference between shuffling the full probe
  * table and shuffling only rows that can possibly match: with a
  * selective build side (the usual dimension-filter shape) the probe
  * exchange shrinks by orders of magnitude, and the sketch itself is
  * the only build-side artifact that travels (a few MB regardless of
  * probe size). AQE can't do this for you when the build side exceeds
  * the broadcast threshold — the bloom sketch is the degree between
  * "broadcast the dim" and "shuffle everything".
  *
  * Built from the same Catalyst expressions Spark's optimizer injects
  * ([[BloomFilterAggregate]] / [[BloomFilterMightContain]]) wired
  * through a scalar subquery, so the whole thing stays lazy and
  * in-plan: no driver-side collect, the sketch aggregation runs as a
  * normal partial-then-final aggregate.
  */
object BloomJoin {

  /** `might_contain(bloom(build[buildKey]), probeKey)` as a lazily
    * planned Column: the bloom aggregate runs as a scalar subquery at
    * execution time. False-positive rate follows from `expectedItems`
    * vs the true build-side key cardinality (Spark sizes the sketch at
    * ~8 bits/item → ~3% FP at saturation); callers MUST treat a `true`
    * as "maybe" and re-verify exactly, as [[semiJoin]] does. */
  def mightMatch(build: DataFrame, buildKey: String, probeKey: Column,
                 expectedItems: Long): Column = {
    val bfAgg = ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(col(buildKey))), expectedItems)
        .toAggregateExpression())
    val plan = build.select(bfAgg.as("bf")).queryExecution.analyzed
    ColumnBridge.column(BloomFilterMightContain(
      ScalarSubquery(plan),
      ColumnBridge.expression(xxhash64(probeKey))))
  }

  /** Exact semi-join with bloom pre-pruning: probe rows whose key
    * appears in `build[buildKey]`. The bloom filter drops non-matching
    * probe rows scan-side; the left-semi hash join then removes false
    * positives, so the output is exactly `probeKey IN (build keys)`. */
  def semiJoin(probe: DataFrame, probeKey: String,
               build: DataFrame, buildKey: String,
               expectedItems: Long = 1L << 22): DataFrame =
    probe
      .filter(mightMatch(build, buildKey, col(probeKey), expectedItems))
      .join(build.select(col(buildKey).as(probeKey)).distinct(),
        Seq(probeKey), "left_semi")
}
