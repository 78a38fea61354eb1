package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("kmv estimate is within 25% of a 10k-distinct truth at k=256") {
    val df = (1 to 10000).map(i => ("g", s"user$i")).toDF("g", "v")
    val est = Sketches.kmvDistinct(df, Seq("g"), "v", k = 256)
      .select($"est_distinct").as[Double].head()
    assert(math.abs(est - 10000) / 10000.0 < 0.25, s"est=$est")
  }

  test("a group under k distinct reports the exact count") {
    val df = ((1 to 40).map(i => ("small", s"u$i")) ++
      (1 to 40).map(i => ("small", s"u$i"))).toDF("g", "v")
    val est = Sketches.kmvDistinct(df, Seq("g"), "v", k = 64)
      .select($"est_distinct").as[Double].head()
    assert(est == 40.0)
  }

  test("estimate is invariant to row order and duplication") {
    val base = (1 to 1000).map(i => ("g", s"u$i"))
    val a = Sketches.kmvDistinct(base.toDF("g", "v"), Seq("g"), "v", 64)
      .select($"est_distinct").as[Double].head()
    val b = Sketches.kmvDistinct(
      scala.util.Random.shuffle(base ++ base.take(500)).toDF("g", "v"),
      Seq("g"), "v", 64)
      .select($"est_distinct").as[Double].head()
    assert(a == b)
  }
}
