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

  test("a long path converges within maxIter via label shortcuts") {
    val n = 24
    val pairs = (1 until n).map(i => (i.toLong, i + 1L))
      .toDF("id_a", "id_b")
    val got = Clusters.connectedComponents(pairs, maxIter = 30)
      .as[(Long, Long)].collect()
    assert(got.length == n && got.forall(_._2 == 1L))
  }
}
