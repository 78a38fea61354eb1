package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — points matched to intervals on the same key
  * (`start <= pt <= end`). Spark plans a raw range predicate as a
  * broadcast-nested-loop or cartesian filter, which is quadratic per
  * key; this operator bucketizes time instead: each point lands in one
  * bucket of width `bucketWidth`, each interval explodes to the buckets
  * it covers, and the match becomes a hash equi-join on (key, bucket)
  * followed by the exact range filter. A (point, interval) pair can
  * only meet in the point's single bucket, so no post-join dedup is
  * needed.
  *
  * Scale: shuffle volume is |points| + Σ interval spans/bucketWidth —
  * pick `bucketWidth` near the typical interval length so intervals
  * explode to ~2 buckets. Never all-pairs, never a nested loop
  * (asserted in RangeJoinSpec).
  */
object RangeJoin {

  /** @param points    frame with `key`, point column `pt` (numeric)
    * @param intervals frame with `key`, `start`, `end` (inclusive ends,
    *   same numeric domain as `pt`)
    * @param bucketWidth bucket size in the time domain's units
    * @return every (point row ++ interval row) pair with
    *   `start <= pt <= end`; one hash shuffle on (key, bucket) */
  def intervalJoin(points: DataFrame, intervals: DataFrame, key: String,
                   pt: String, start: String, end: String,
                   bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val p = points.withColumn("_b", expr(s"$pt div $bucketWidth"))
    val iv = intervals.withColumn("_b",
      explode(sequence(expr(s"$start div $bucketWidth"),
        expr(s"$end div $bucketWidth"))))
    p.join(iv, Seq(key, "_b"))
      .filter(col(pt) >= col(start) && col(pt) <= col(end))
      .drop("_b")
  }
}
