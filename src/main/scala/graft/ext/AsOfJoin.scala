package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the single most
  * recent right row with `rightTs <= leftTs` for the same key (backward,
  * inclusive). The attribution/feature-lookup join a training-data
  * pipeline needs (label events joined to the latest state snapshot),
  * absent from Spark's built-in operator set.
  *
  * Spark-first design — union + running last-non-null window, NOT a
  * range join: tag right rows 0 and left rows 1, union, and for each key
  * order by (ts, tag) so a right row at the same timestamp sorts before
  * the left rows it should serve; a running `last(_, ignoreNulls)` over
  * rows-unbounded-preceding then carries the latest right payload
  * forward into every left row. One hash shuffle on the key, O(1)
  * running state per key, output size = |left| — where the naive
  * `l.key = r.key AND r.ts <= l.ts` range join explodes to every
  * (left, earlier-right) pair before its per-left top-1. At 100 TB the
  * union-window shuffles |left|+|right| rows once; the range join is
  * quadratic per key.
  *
  * The right payload travels as ONE struct column through the window
  * (a single last/first(ignoreNulls) fill, unpacked after), so null
  * FIELDS ride along with their row: a right row whose latest match has
  * a null in one payload column still supplies that null — filling each
  * payload column independently would back-fill it from an OLDER right
  * row and emit a mix of two right rows.
  *
  * Preconditions: the two ts columns must share a comparable type, and
  * the right side must be unique per (key, ts) — pre-dedup otherwise
  * (ordering among equal right timestamps is not defined).
  */
object AsOfJoin {

  /** @param rightCols right payload columns to carry; they land on the
    *   output as `<prefix><name>` (null where no right row precedes)
    * @return every left row + as-of right payload; one shuffle on `key` */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, rightCols: Seq[String],
               prefix: String = "asof_"): DataFrame =
    joined(left, right, key, leftTs, rightTs, rightCols, prefix,
      forward = false)

  /** Forward (look-ahead) variant: the single EARLIEST right row with
    * `rightTs >= leftTs` (inclusive) — "next state after the event". */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTs: String, rightTs: String, rightCols: Seq[String],
              prefix: String = "asof_"): DataFrame =
    joined(left, right, key, leftTs, rightTs, rightCols, prefix,
      forward = true)

  /** Tag ordering makes equal timestamps inclusive in both directions:
    * backward puts the right row BEFORE same-ts left rows (tag 0 < 1)
    * and runs `last(ignoreNulls)` over unbounded-preceding..current;
    * forward puts it AFTER (tag 2 > 1) and runs `first(ignoreNulls)`
    * over current..unbounded-following. */
  private def joined(left: DataFrame, right: DataFrame, key: String,
                     leftTs: String, rightTs: String,
                     rightCols: Seq[String], prefix: String,
                     forward: Boolean): DataFrame = {
    val leftSchema = left.schema
    val rightSchema = right.schema
    val leftCols = left.columns.toSeq
    val rightTag = if (forward) 2 else 0
    // One struct holds the whole right payload: left rows carry a NULL
    // struct (skipped by ignoreNulls), right rows a non-null struct even
    // when every field is null — so the fill picks whole rows, never a
    // per-column mix of rows.
    val payType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => rightSchema(c).copy(name = c)))

    val lSide = left.select(
      leftCols.map(col) ++
        Seq(col(leftTs).as("_ts"), lit(1).as("_tag"),
          lit(null).cast(payType).as("_rpay")): _*)
    val rSide = right.select(
      leftCols.map(c =>
        if (c == key) col(key).as(c)
        else lit(null).cast(leftSchema(c).dataType).as(c)) ++
        Seq(col(rightTs).as("_ts"), lit(rightTag).as("_tag"),
          struct(rightCols.map(col): _*).as("_rpay")): _*)

    val ordered = Window.partitionBy(key).orderBy(col("_ts"), col("_tag"))
    val w =
      if (forward)
        ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fill: Column =
      if (forward) first(col("_rpay"), ignoreNulls = true).over(w)
      else last(col("_rpay"), ignoreNulls = true).over(w)

    lSide.unionByName(rSide)
      .withColumn("_rpay", fill)
      .filter(col("_tag") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col("_rpay").getField(c).as(s"$prefix$c")): _*)
  }
}
