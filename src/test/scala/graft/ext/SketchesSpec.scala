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

  test("kmvOverlap under k distinct is exact (union, jaccard, intersection)") {
    // A = 1..60, B = 41..100 → |A∪B| = 100, |A∩B| = 20, J = 0.2
    val a = (1 to 60).map(i => s"v$i").toDF("x")
    val b = (41 to 100).map(i => s"v$i").toDF("x")
    val r = Sketches.kmvOverlap(a, b, "x", k = 256)
      .select($"union_est", $"jaccard_est", $"intersect_est")
      .as[(Double, Double, Double)].head()
    assert(r._1 == 100.0)
    assert(r._2 == 0.2)
    assert(r._3 == 20.0)
  }

  test("kmvOverlap estimation path lands near a 50%-overlap truth") {
    // A = 1..8000, B = 4001..12000 → union 12000, jaccard = 1/3
    val a = (1 to 8000).map(i => s"v$i").toDF("x")
    val b = (4001 to 12000).map(i => s"v$i").toDF("x")
    val r = Sketches.kmvOverlap(a, b, "x", k = 512)
      .select($"union_est", $"jaccard_est", $"intersect_est")
      .as[(Double, Double, Double)].head()
    assert(math.abs(r._1 - 12000) / 12000.0 < 0.25, s"union=${r._1}")
    assert(math.abs(r._2 - 1.0 / 3) < 0.15, s"jaccard=${r._2}")
    assert(math.abs(r._3 - 4000) / 4000.0 < 0.4, s"intersect=${r._3}")
  }

  test("cms estimate never undercounts, and a wide sketch is exact") {
    val words = (1 to 50).flatMap(i => Seq.fill(i % 5 + 1)(s"w$i"))
    val df = words.toDF("w")
    val exact = words.groupBy(identity).map { case (k, v) => k -> v.size }
    // Narrow sketch: collisions certain → estimates are >= exact.
    val narrow = Sketches.cmsEstimate(df, "w",
      Sketches.cmsSketch(df, "w", 4, 8), 4, 8)
      .as[(String, Long)].collect().toMap
    exact.foreach { case (w, n) => assert(narrow(w) >= n) }
    // Wide sketch: 4 rows × 4096 buckets over 50 values — the chance
    // all 4 rows collide for some value is negligible, so min = exact.
    val wide = Sketches.cmsEstimate(df, "w",
      Sketches.cmsSketch(df, "w", 4, 4096), 4, 4096)
      .as[(String, Long)].collect().toMap
    exact.foreach { case (w, n) => assert(wide(w) == n) }
  }

  test("kmvOverlap is symmetric in union and jaccard") {
    val a = (1 to 3000).map(i => s"v$i").toDF("x")
    val b = (2000 to 5000).map(i => s"v$i").toDF("x")
    val ab = Sketches.kmvOverlap(a, b, "x", 128)
      .select($"union_est", $"jaccard_est").as[(Double, Double)].head()
    val ba = Sketches.kmvOverlap(b, a, "x", 128)
      .select($"union_est", $"jaccard_est").as[(Double, Double)].head()
    assert(ab == ba)
  }

  test("weighted sketch over counts equals the sketch over occurrences") {
    val words = (1 to 40).flatMap(i => Seq.fill(i % 3 + 1)(s"w$i"))
    val occ = words.toDF("w")
    val counts = occ.groupBy("w").agg(count(lit(1)).as("n"))
    val fromOcc = Sketches.cmsSketch(occ, "w", 4, 16)
      .as[(Int, Long, Long)].collect().toSet
    val fromCounts = Sketches.cmsSketchWeighted(counts, "w", $"n", 4, 16)
      .as[(Int, Long, Long)].collect().toSet
    assert(fromOcc == fromCounts)
  }

  test("cms sketches merge by counter addition") {
    val a = (1 to 30).map(i => s"v$i").toDF("w")
    val b = (16 to 45).map(i => s"v$i").toDF("w")
    val merged = Sketches.cmsSketch(a, "w", 4, 32)
      .unionByName(Sketches.cmsSketch(b, "w", 4, 32))
      .groupBy("row", "bucket").agg(sum($"cnt").as("cnt"))
    val direct = Sketches.cmsSketch(a.unionByName(b), "w", 4, 32)
    assert(merged.select("row", "bucket", "cnt")
      .as[(Int, Long, Long)].collect().toSet ==
      direct.select("row", "bucket", "cnt")
        .as[(Int, Long, Long)].collect().toSet)
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

  test("histQuantiles: estimate within one bin width of the exact " +
    "quantile; exact on uniform integers at matching resolution") {
    // values 0..999 in one group: p50 exact = 499 (rank 500), p90
    // exact = 899; with 100 bins of width 9.99 the lower-edge estimate
    // is within one bin width below the exact value
    val df = (0 until 1000).map(v => ("g", v.toDouble)).toDF("g", "v")
    val est = Sketches.histQuantiles(df, Seq("g"), "v", 100,
      Seq(("p50", 0.5), ("p90", 0.9)))
      .select($"quantile", $"est_value").as[(String, Double)]
      .collect().toMap
    val width = 999.0 / 100.0
    assert(math.abs(est("p50") - 499.0) <= width)
    assert(math.abs(est("p90") - 899.0) <= width)
  }

  test("histQuantiles: constant column degenerates to the constant; " +
    "null values are ignored") {
    val df = Seq(("g", Some(7.0)), ("g", Some(7.0)), ("g", None))
      .toDF("g", "v")
    val est = Sketches.histQuantiles(df, Seq("g"), "v", 16,
      Seq(("p50", 0.5)))
      .select($"est_value").as[Double].collect()
    assert(est.toSeq == Seq(7.0))
  }
}
