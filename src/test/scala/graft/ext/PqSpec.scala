package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-quantization pins: codebook geometry, self-coding identity
  * (a sampled centroid encodes to its own code — d2 is exactly 0.0 by
  * the shared fold discipline), and the ADC-equals-exact contract when
  * reconstruction is lossless (every vector its own centroid). */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val M = 2
  private val Dsub = 2
  // four 4-dim vectors with pairwise-distinct subspace slices
  private def corpus: DataFrame = Seq(
    (0L, Seq(1.0f, 0.0f, 0.5f, 0.5f)),
    (1L, Seq(0.0f, 1.0f, 0.25f, 0.75f)),
    (2L, Seq(0.5f, 0.5f, 1.0f, 0.0f)),
    (3L, Seq(0.25f, 0.75f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("codebook has m*ksub rows of dsub-dim slices") {
    val book = SimilarityOps.pqCodebook(corpus, M, Dsub, ksub = 4)
    val rows = book.collect()
    assert(rows.length == M * 4)
    assert(rows.forall(_.getSeq[Double](2).length == Dsub))
    assert(book.select("code").distinct().count() == 4)
  }

  test("a sampled centroid encodes to its own code in every subspace") {
    val book = SimilarityOps.pqCollectBook(corpus, M, Dsub, 4)
    val codes = SimilarityOps.pqEncode(corpus, book, M, Dsub)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    // recover each vec_id's md5 rank through the codebook slices
    val sub0 = book.filter(_._1 == 0).map { case (_, j, c) => (c, j) }.toMap
    corpus.select("vec_id", "embedding").as[(Long, Seq[Float])]
      .collect().foreach { case (id, e) =>
        val own = sub0(e.take(Dsub).map(_.toDouble).toSeq)
        assert(codes(id).head == own, s"vec $id")
        assert(codes(id).length == M)
      }
  }

  test("ADC ranking equals exact inner-product ranking when lossless") {
    val book = SimilarityOps.pqCollectBook(corpus, M, Dsub, 4)
    val codes = SimilarityOps.pqEncode(corpus, book, M, Dsub)
    val queries = corpus.select(col("vec_id").as("query_id"),
      col("embedding").as("q_embedding"))
    val adc = SimilarityOps.pqTopK(queries, codes,
        SimilarityOps.pqCodebook(corpus, M, Dsub, 4), k = 3, Dsub)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // exact inner-product ranks, computed locally
    val vecs = corpus.as[(Long, Seq[Float])].collect().toMap
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0)((s, p) => s + p._1.toDouble * p._2.toDouble)
    vecs.keys.foreach { q =>
      val expect = vecs.keys.filter(_ != q).toSeq
        .sortBy(v => (-dot(vecs(q), vecs(v)), v)).take(3)
      assert(adc(q) == expect, s"query $q")
      assert(!adc(q).contains(q), "self-match excluded")
    }
  }

  test("excludeSelf=false keeps colliding-id neighbors (disjoint " +
    "query sets)") {
    // a DISJOINT query set whose ids collide with corpus ids: query 0
    // is NOT corpus vector 0, so dropping neighbor_id == 0 for it
    // would silently lose a valid (possibly the best) neighbor
    val book = SimilarityOps.pqCollectBook(corpus, M, Dsub, 4)
    val codes = SimilarityOps.pqEncode(corpus, book, M, Dsub)
    val cb = SimilarityOps.pqCodebook(corpus, M, Dsub, 4)
    // the external query with id 0 is corpus vector 0's embedding —
    // under excludeSelf its own nearest code (vector 0) vanishes
    val external = corpus.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"))
    val kept = SimilarityOps.pqTopK(external, codes, cb, k = 4, Dsub,
        excludeSelf = false)
      .select("neighbor_id").as[Long].collect().toSet
    assert(kept.contains(0L),
      "excludeSelf=false must keep the colliding-id neighbor")
    val dropped = SimilarityOps.pqTopK(external, codes, cb, k = 4, Dsub)
      .select("neighbor_id").as[Long].collect().toSet
    assert(!dropped.contains(0L),
      "default excludeSelf drops it (same-id-space contract)")
  }
}
