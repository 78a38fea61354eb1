package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Linear-interpolation resampling pins: hand-computed values, exact
  * grid-hit passthrough, carry-forward past the last observation, no
  * backwards extrapolation, same-ts tie-break. */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def series(rows: (String, Long, Double, Long)*) =
    rows.toDF("k", "ts", "v", "id")

  private def run(df: org.apache.spark.sql.DataFrame, step: Long) =
    Resample.interpolate(df, Seq("k"), "ts", "v", "id", step)
      .select("k", "grid_ts", "value")
      .as[(String, Long, Double)].collect().toSet

  test("interpolates linearly between surrounding observations") {
    // obs at t=5 (v=10) and t=25 (v=30); grid step 10 → points 10, 20
    val out = run(series(("a", 5L, 10.0, 1L), ("a", 25L, 30.0, 2L)), 10)
    assert(out == Set(
      ("a", 10L, 10.0 + 20.0 * (5.0 / 20.0)),   // 15.0
      ("a", 20L, 10.0 + 20.0 * (15.0 / 20.0)))) // 25.0
  }

  test("a grid point hitting an observation reports it exactly; " +
    "points past the last observation carry it forward") {
    val out = run(series(
      ("a", 10L, 7.0, 1L), ("a", 30L, 9.0, 2L), ("a", 41L, 5.0, 3L)), 10)
    assert(out contains (("a", 10L, 7.0)))
    assert(out contains (("a", 30L, 9.0)))
    assert(out contains (("a", 20L, 8.0)))
    assert(out contains (("a", 40L, 5.0 * 0.0 + 9.0 +
      (5.0 - 9.0) * (10.0 / 11.0))))
  }

  test("no backwards extrapolation; keys independent; same-ts " +
    "observations break ties by id (last wins)") {
    val out = run(series(
      ("a", 15L, 1.0, 1L),                    // grid 10 has no prev
      ("b", 0L, 2.0, 2L), ("b", 0L, 4.0, 3L), // tie: id 3 wins at t=0
      ("b", 20L, 4.0, 4L)), 10)
    assert(!out.exists(r => r._1 == "a" && r._2 == 10L))
    assert(out contains (("b", 0L, 4.0)))
    assert(out contains (("b", 10L, 4.0))) // flat segment stays flat
  }
}
