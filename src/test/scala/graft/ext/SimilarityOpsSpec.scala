package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilarityOpsSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Float*) = xs.toArray

  test("cosine: identical → 1, orthogonal → 0, opposite → -1") {
    val df = Seq(
      (vec(1f, 0f), vec(1f, 0f)),
      (vec(1f, 0f), vec(0f, 1f)),
      (vec(1f, 0f), vec(-1f, 0f))
    ).toDF("a", "b")
    val out = df.select(SimilarityOps.cosine(col("a"), col("b")))
      .as[Double].collect()
    assert(out(0) == 1.0 && out(1) == 0.0 && out(2) == -1.0)
  }

  test("native vec_dot is bit-identical to the zip_with/aggregate fold") {
    val df = Seq.tabulate(50)(i =>
      (i.toLong, Array.tabulate(64)(j => ((i * 31 + j) % 97 / 97.0f - 0.5f))))
      .toDF("vec_id", "embedding")
    val both = df.join(df.withColumnRenamed("embedding", "e2")
      .withColumnRenamed("vec_id", "v2"))
      .select(
        SimilarityOps.dot(col("embedding"), col("e2")).as("native"),
        SimilarityOps.dotFold(col("embedding"), col("e2")).as("fold"))
    assert(both.filter(col("native") =!= col("fold")).count() == 0)
  }

  test("vec_dot matches the fold's null semantics on unequal lengths") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f)),
      (Array(1.0f, 2.0f), Array(3.0f, 4.0f))
    ).toDF("a", "b")
    val rows = df.select(
      SimilarityOps.dot(col("a"), col("b")).as("native"),
      SimilarityOps.dotFold(col("a"), col("b")).as("fold")).collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).getDouble(0) == 11.0 && rows(1).getDouble(1) == 11.0)
  }

  test("vec_dot is registered as a SQL function via GraftExtensions") {
    val out = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .head().getDouble(0)
    assert(out == 11.0)
  }

  test("bruteForceTopK ranks by similarity, excludes self") {
    val corpus = Seq(
      (0L, vec(1f, 0f, 0f)),
      (1L, vec(0.9f, 0.1f, 0f)),
      (2L, vec(0f, 1f, 0f)),
      (3L, vec(-1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val queries = corpus.filter("vec_id = 0")
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"))
    val out = SimilarityOps.bruteForceTopK(queries, corpus, 3)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toMap
    assert(out(1L) == 1 && out(2L) == 2 && out(3L) == 3)
  }

  test("bucketedTopK only pairs within the sign bucket") {
    val corpus = Seq(
      (0L, vec(1f, 1f, 1f, 1f, 0f)),
      (1L, vec(0.5f, 2f, 1f, 1f, 0f)),  // same sign bucket as 0
      (2L, vec(-1f, 1f, 1f, 1f, 0f))    // different bucket
    ).toDF("vec_id", "embedding")
    val queries = corpus.filter("vec_id = 0")
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"))
    val ids = SimilarityOps.bucketedTopK(queries, corpus, 10)
      .select("neighbor_id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }

  test("planeSign is deterministic ±1 and varies across tables/bits") {
    val p0 = SimilarityOps.plane(0, 0)
    assert(p0 == SimilarityOps.plane(0, 0))
    assert(p0.forall(v => v == 1.0 || v == -1.0))
    assert(p0 != SimilarityOps.plane(0, 1))
    assert(p0 != SimilarityOps.plane(1, 0))
    // roughly balanced (a degenerate all-+1 plane would never split)
    assert(math.abs(p0.sum) < 32)
  }

  test("hyperplaneTopK finds brute-force neighbors that share buckets " +
    "and never invents pairs outside them") {
    val corpus = Seq.tabulate(120)(i =>
      (i.toLong, Array.tabulate(64)(j =>
        ((i * 31 + j * 17) % 97 / 97.0f - 0.5f))))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter("vec_id % 40 = 0")
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"))
    val approx = SimilarityOps.hyperplaneTopK(queries, corpus, 5,
      bits = 4, tables = 2)
      .select("query_id", "neighbor_id", "score")
      .as[(Long, Long, Double)].collect()
    val exactScores = SimilarityOps.bruteForceTopK(queries, corpus, 120)
      .select("query_id", "neighbor_id", "score")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, s) => (q, n) -> s }.toMap
    // every approximate score matches the exact cosine for that pair
    assert(approx.nonEmpty)
    approx.foreach { case (q, n, s) => assert(exactScores((q, n)) == s) }
    // no duplicate (query, neighbor) pairs despite 2 hash tables
    val pairs = approx.map { case (q, n, _) => (q, n) }
    assert(pairs.distinct.length == pairs.length)
  }

  test("more hash tables never lose candidates (recall is monotone)") {
    val corpus = Seq.tabulate(80)(i =>
      (i.toLong, Array.tabulate(64)(j =>
        ((i * 13 + j * 7) % 89 / 89.0f - 0.5f))))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter("vec_id % 20 = 0")
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"))
    def pairsAt(tables: Int) =
      SimilarityOps.hyperplaneTopK(queries, corpus, 80, bits = 6,
        tables = tables)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
    assert(pairsAt(1).subsetOf(pairsAt(3)))
  }

  test("hyperplane LSH recall@5 on the sf0.01 fixture corpus: wider " +
    "codes need more tables (the bits/tables capacity trade measured)") {
    // The fixture embeddings are near-random, so true top-5 neighbors
    // sit at ~60-80° — the hard case for sign-LSH: each extra bit
    // multiplies per-table hit probability by cos-angle-dependent
    // p≈0.6. Few bits + more tables must dominate many bits + few.
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val queries = emb.filter("vec_id % 100 = 0")
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(SimilarityOps.bruteForceTopK(queries, emb, 5))
    def recall(bits: Int, tables: Int) = (pairs(
      SimilarityOps.hyperplaneTopK(queries, emb, 5, bits, tables))
      & exact).size.toDouble / exact.size
    val wide = recall(bits = 8, tables = 4)
    val narrow = recall(bits = 3, tables = 8)
    assert(narrow >= 0.6, s"recall@5(3b×8t) = $narrow")
    assert(narrow > wide,
      s"expected 3b×8t ($narrow) > 8b×4t ($wide) on near-random data")
  }

  test("sampleCentroids: deterministic nlist-sized codebook") {
    val corpus = Seq.tabulate(100)(i =>
      (i.toLong, Array.tabulate(8)(j => (i + j).toFloat)))
      .toDF("vec_id", "embedding")
    val a = SimilarityOps.sampleCentroids(corpus, 10)
      .select("centroid_id").as[Long].collect().toSeq
    val b = SimilarityOps.sampleCentroids(corpus, 10)
      .select("centroid_id").as[Long].collect().toSeq
    assert(a == b && a.length == 10 && a.distinct.length == 10)
  }

  test("ivfTopK with nprobe=nlist degenerates to exact brute force") {
    val corpus = Seq.tabulate(60)(i =>
      (i.toLong, Array.tabulate(16)(j =>
        ((i * 29 + j * 11) % 83 / 83.0f - 0.5f))))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter("vec_id % 30 = 0")
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"))
    val centroids = SimilarityOps.sampleCentroids(corpus, 4)
    val ivf = SimilarityOps.ivfTopK(queries, corpus, centroids, 3,
      nprobe = 4)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val exact = SimilarityOps.bruteForceTopK(queries, corpus, 3)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(ivf == exact)
  }

  test("cosineNearDuplicates flags only high-similarity pairs") {
    val corpus = Seq(
      (0L, vec(1f, 0.01f, 0f, 0f)),
      (1L, vec(0.99f, 0.02f, 0f, 0f)),
      (2L, vec(0.1f, 1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val pairs = SimilarityOps.cosineNearDuplicates(corpus, 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("semanticDedup keeps the min-id twin and distinct vectors") {
    // 0/1 are near-twins, 2 is orthogonal, 3 duplicates 2 exactly.
    val corpus = Seq(
      (0L, vec(1f, 0.01f, 0f, 0f)),
      (1L, vec(0.99f, 0.02f, 0f, 0f)),
      (2L, vec(0.1f, 1f, 0f, 0f)),
      (3L, vec(0.1f, 1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val cents = SimilarityOps.sampleCentroids(corpus, 2)
    val kept = SimilarityOps.semanticDedup(corpus, cents, 0.95)
      .select("vec_id").as[Long].collect().toSet
    // Whichever 2 centroids the md5 order samples, each twin pair
    // shares a nearest cell (the members are near-identical), so the
    // min ids {0, 2} survive and {1, 3} are dropped.
    assert(kept == Set(0L, 2L))
  }

  test("semanticDecontaminate drops corpus vectors with a blocklist " +
    "near-twin, keeps the rest — corpus-internal twins are NOT " +
    "deduped") {
    // 0/1 are near-twins of each other (must BOTH survive — dedup is
    // not this op's job); 2 matches the blocklist; 3 is far from it.
    val corpus = Seq(
      (0L, vec(1f, 0.01f, 0f, 0f)),
      (1L, vec(0.99f, 0.02f, 0f, 0f)),
      (2L, vec(0.1f, 1f, 0f, 0f)),
      (3L, vec(0f, 0f, 1f, 0.2f))
    ).toDF("vec_id", "embedding")
    val blocklist = Seq(
      (100L, vec(0.1f, 0.99f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val cents = SimilarityOps.sampleCentroids(corpus, 4)
    val kept = SimilarityOps
      .semanticDecontaminate(corpus, blocklist, cents, 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(0L, 1L, 3L))
    // an empty blocklist drops nothing
    assert(SimilarityOps.semanticDecontaminate(
      corpus, blocklist.limit(0), cents, 0.95).count() == 4L)
  }

  /** Two well-separated blobs around (±10, ...) — a planted clustering
    * Lloyd must recover from any 2-vector init. */
  private def blobCorpus: org.apache.spark.sql.DataFrame =
    Seq.tabulate(40) { i =>
      val sign = if (i % 2 == 0) 1f else -1f
      (i.toLong, Array.tabulate(4)(j =>
        sign * 10f + ((i * 7 + j * 3) % 11) / 11.0f))
    }.toDF("vec_id", "embedding")

  test("kmeansRefine: Lloyd rounds never increase within-cluster SSE " +
    "and cells cover the corpus") {
    val corpus = blobCorpus
    val init = SimilarityOps.sampleCentroids(corpus, 4)
    def sse(cents: org.apache.spark.sql.DataFrame): Double = {
      val book = cents.select(col("centroid_id"),
        col("c_embedding").cast("array<double>")).collect()
        .map(r => r.getSeq[Double](1))
      corpus.select(col("embedding")).collect().map { r =>
        val x = r.getSeq[Float](0).map(_.toDouble)
        book.map(c => x.zip(c).map { case (a, b) =>
          (a - b) * (a - b) }.sum).min
      }.sum
    }
    val r1 = SimilarityOps.kmeansRefine(corpus, init, 1)
    val r2 = SimilarityOps.kmeansRefine(corpus, init, 2)
    val sse0 = sse(init.select(col("centroid_id"),
      col("c_embedding").cast("array<double>").as("c_embedding")))
    // Lloyd's monotonicity, with a hair of slack for the micro
    // quantization of the mean update.
    assert(sse(r1) <= sse0 + 1e-3)
    assert(sse(r2) <= sse(r1) + 1e-3)
    // every corpus row is in exactly one cell
    val total = r2.agg(sum("cell_size")).head().getLong(0)
    assert(total == 40L)
  }

  test("kmeansRefine separates planted blobs and feeds ivfTopK " +
    "unchanged (the trained-codebook swap sampleCentroids promises)") {
    val corpus = blobCorpus
    val trained = SimilarityOps.kmeansRefine(corpus,
      SimilarityOps.sampleCentroids(corpus, 2), 3)
    val cents = trained.select(col("centroid_id"),
      col("c_embedding").as("c_embedding"))
    // the two refined centroids sit in opposite blobs
    val signs = cents.select(element_at(col("c_embedding"), 1))
      .as[Double].collect().map(math.signum).sorted
    assert(signs.toSeq == Seq(-1.0, 1.0))
    // assignment under the trained codebook splits the corpus 20/20
    val sizes = trained.select("cell_size").as[Long].collect().sorted
    assert(sizes.toSeq == Seq(20L, 20L))
    // and the search plan runs unchanged on the trained codebook
    val queries = corpus.filter("vec_id < 2")
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"))
    val hits = SimilarityOps.ivfTopK(queries, corpus, cents, 3, 1)
    assert(hits.count() == 6)
  }

  test("kmeansTrain converges on planted blobs to the same fixed " +
    "point as a long kmeansRefine run") {
    val corpus = blobCorpus
    val trained = SimilarityOps.kmeansTrain(corpus, 2, maxIters = 10)
      .select("centroid_id", "cell_size").as[(Long, Long)]
      .collect().toSet
    val refined = SimilarityOps.kmeansRefine(corpus,
      SimilarityOps.sampleCentroids(corpus, 2), 6)
      .select("centroid_id", "cell_size").as[(Long, Long)]
      .collect().toSet
    // on two clean blobs Lloyd reaches its fixed point within a few
    // rounds — early stop and the long run agree exactly
    assert(trained == refined)
    assert(trained.toSeq.map(_._2).sorted == Seq(20L, 20L))
  }

  test("quantizeInt8: codes bounded, reconstruction error within " +
    "scale/2 per element, zero vectors quantize to zero with scale 0, " +
    "and the operator is scan-local (no exchange)") {
    import org.apache.spark.sql.functions._
    val emb = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(3.0f, 2.0f, -3.0f, 1.5f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = SimilarityOps.quantizeInt8(emb)
    val rows = q.select("vec_id", "embedding", "codes", "scale")
      .as[(Long, Array[Float], Array[Int], Double)]
      .collect().sortBy(_._1)
    rows.foreach { case (id, xs, cs, scale) =>
      assert(cs.length == xs.length)
      assert(cs.forall(c => c >= -127 && c <= 127))
      if (id == 3L) {
        assert(scale == 0.0 && cs.forall(_ == 0))
      } else {
        xs.zip(cs).foreach { case (x, c) =>
          assert(math.abs(x.toDouble - c * scale) <= scale / 2 + 1e-12,
            s"id=$id x=$x c=$c scale=$scale")
        }
        // absmax element hits exactly +/-127
        assert(cs.exists(c => math.abs(c) == 127))
      }
    }
    // dequantize round trip stays within the same bound
    val recon = q.select(col("vec_id"), col("embedding"),
        SimilarityOps.dequantizeInt8(col("codes"), col("scale")).as("r"))
      .as[(Long, Array[Float], Array[Double])].collect()
    recon.filter(_._1 != 3L).foreach { case (_, xs, rs) =>
      xs.zip(rs).foreach { case (x, r) =>
        assert(math.abs(x.toDouble - r) <= 0.5) }
    }
    // scan-local: the physical plan has no exchange
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"quantization grew a shuffle:\n$plan")
  }

  test("rpProject: coordinates equal the manual plane fold, the plan " +
    "is shuffle-free, and cosine survives projection scaling") {
    val df = Seq.tabulate(20)(i =>
      (i.toLong, Array.tabulate(64)(j =>
        ((i * 37 + j * 13) % 101 / 101.0f - 0.5f))))
      .toDF("vec_id", "embedding")
    val proj = df.select(col("vec_id"), col("embedding"),
      SimilarityOps.rpProject(col("embedding"), 16).as("pe"))
    val rows = proj.as[(Long, Array[Float], Array[Double])].collect()
    assert(rows.forall(_._3.length == 16))
    // bit-exact against a driver-side strict left fold of the same
    // ±1 planes (the oracle's definition)
    rows.foreach { case (_, e, pe) =>
      (0 until 16).foreach { j =>
        val plane = SimilarityOps.rpPlane(j)
        var acc = 0.0
        var i = 0
        while (i < 64) { acc += e(i).toDouble * plane(i); i += 1 }
        assert(acc == pe(j), s"coord $j: $acc != ${pe(j)}")
      }
    }
    // scan-local: no exchange anywhere in the projection plan
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"projection grew a shuffle:\n$plan")
    // JL sanity on this fixture: projected cosine of a vector with a
    // scaled copy of itself is exactly 1 (linearity of the projection)
    val scaled = proj.select(col("vec_id"),
      SimilarityOps.rpProject(
        transform(col("embedding"), x => x * 2.0f), 16).as("pe2"),
      col("pe"))
    val cos = scaled
      .select(SimilarityOps.cosine(col("pe"), col("pe2")).as("c"))
      .as[Double].collect()
    cos.foreach(c => assert(math.abs(c - 1.0) < 1e-12, s"cos=$c"))
  }
}
