package graft.ext

import graft.SparkSpec

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  test("components: chain, triangle, isolated pair — label is the " +
    "smallest reachable id") {
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("id_a", "id_b")
    val got = Clusters.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("BSP path (forced by a tiny rowsPerPartition) agrees with the " +
    "single-partition union-find") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("id_a", "id_b")
    val got = Clusters.connectedComponents(pairs, rowsPerPartition = 2L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("non-integral ids (string content hashes) take the generic " +
    "path and agree with the integral result") {
    val pairs = Seq(("h1", "h2"), ("h2", "h3"), ("h3", "h4"),
      ("ha", "hb"), ("hb", "hc"), ("ha", "hc"),
      ("hx", "hy")).toDF("id_a", "id_b")
    val got = Clusters.connectedComponents(pairs)
      .as[(String, String)].collect().toMap
    assert(got == Map("h1" -> "h1", "h2" -> "h1", "h3" -> "h1",
      "h4" -> "h1", "ha" -> "ha", "hb" -> "ha", "hc" -> "ha",
      "hx" -> "hx", "hy" -> "hx"))
  }

  test("mixed INT × BIGINT pairs widen: output id columns are " +
    "LongType and components match the all-BIGINT run") {
    val pairs = Seq((1, 2L), (2, 3L), (3, 4L),
      (10, 11L), (11, 12L), (10, 12L),
      (20, 21L)).toDF("id_a", "id_b")
    val got = Clusters.connectedComponents(pairs)
    assert(got.schema("id").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(got.schema("cluster_id").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(got.as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
    // Same widening on the BSP path (tiny rowsPerPartition forces it).
    val bsp = Clusters.connectedComponents(pairs, rowsPerPartition = 2L)
    assert(bsp.schema("id").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(bsp.as[(Long, Long)].collect().toMap ==
      got.as[(Long, Long)].collect().toMap)
  }

  test("mismatched non-integral id types are rejected at the " +
    "dispatch boundary, not silently cast") {
    val pairs = Seq(("h1", 2L), ("h2", 3L)).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      Clusters.connectedComponents(pairs)
    }
    assert(e.getMessage.contains("share a type"))
  }

  test("canonical picks the highest score per cluster, ties broken " +
    "by smallest id") {
    val clustered = Seq(
      (1L, 1L, 10L), (2L, 1L, 50L), (3L, 1L, 50L), // tie at 50: pick 2
      (7L, 7L, 5L),                                 // singleton
      (8L, 8L, 1L), (9L, 8L, 2L)                    // 9 wins on score
    ).toDF("id", "cluster_id", "score")
    val got = Clusters.canonical(clustered)
      .select("id", "canonical_id", "is_canonical")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set((1L, 2L, false), (2L, 2L, true), (3L, 2L, false),
      (7L, 7L, true), (8L, 9L, false), (9L, 9L, true)))
  }

  test("a long path converges within maxIter via label shortcuts") {
    val n = 24
    val pairs = (1 until n).map(i => (i.toLong, i + 1L))
      .toDF("id_a", "id_b")
    val got = Clusters.connectedComponents(pairs, maxIter = 30)
      .as[(Long, Long)].collect()
    assert(got.length == n && got.forall(_._2 == 1L))
  }
}
