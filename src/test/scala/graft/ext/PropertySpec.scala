package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Seeded randomized invariant tests for the arithmetic-core operators
  * — properties that must hold on ARBITRARY inputs, not just fixtures
  * (the RandomizedEquivalenceSpec style: fixed seeds, exact repro).
  * Data generation is driver-side; the checked computation runs through
  * the real Spark expressions. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("zValue/zSplit round-trip on arbitrary in-range dimensions, and " +
    "zValue is monotone in each dimension with the other fixed") {
    for (seed <- Seq(3, 41, 271)) {
      val rnd = new Random(seed)
      val max = (1L << Layout.ZBits) - 1
      val pts = Seq.fill(40)((math.abs(rnd.nextLong()) % max,
        math.abs(rnd.nextLong()) % max))
      val (za, zb) = (col("a"), col("b"))
      val (ra, rb) = Layout.zSplit(Layout.zValue(za, zb))
      val rows = pts.toDF("a", "b")
        .select(za, zb, ra.as("ra"), rb.as("rb"),
          Layout.zValue(za, zb).as("z"),
          Layout.zValue(za + 1, zb).as("zak"),
          Layout.zValue(za, zb + 1).as("zbk"))
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      rows.foreach { case (a, b, x, y, z, zak, zbk) =>
        assert(x == a && y == b, s"seed=$seed round-trip broke at ($a,$b)")
        if (a < max) assert(zak > z, s"seed=$seed not monotone in a")
        if (b < max) assert(zbk > z, s"seed=$seed not monotone in b")
      }
    }
  }

  test("zRangesForBox: exact z-set for the box with a generous budget, " +
    "sound superset under a tiny budget, and box queries via ranges + " +
    "residual equal the direct 2-D filter") {
    for (seed <- Seq(19, 83, 311)) {
      val rnd = new Random(seed)
      def box(): (Long, Long, Long, Long) = {
        val alo = rnd.nextInt(200).toLong; val blo = rnd.nextInt(200).toLong
        (alo, alo + rnd.nextInt(60), blo, blo + rnd.nextInt(60))
      }
      val (alo, ahi, blo, bhi) = box()
      def inBox(a: Long, b: Long) =
        a >= alo && a <= ahi && b >= blo && b <= bhi
      def zOf(a: Long, b: Long): Long = (0 until 16).map { i =>
        ((a >> i) & 1L) * (1L << (2 * i)) +
          ((b >> i) & 1L) * (1L << (2 * i + 1))
      }.sum
      def covered(rs: Seq[(Long, Long)], z: Long) =
        rs.exists(r => z >= r._1 && z <= r._2)

      val exact = Layout.zRangesForBox(alo, ahi, blo, bhi,
        maxRanges = 100000)
      val coarse = Layout.zRangesForBox(alo, ahi, blo, bhi, maxRanges = 8)
      // probe a grid around the box: membership must match exactly for
      // the refined ranges; coarse ranges may only ADD points
      for (a <- (alo - 2) to (ahi + 2); b <- (blo - 2) to (bhi + 2)
           if a >= 0 && b >= 0) {
        val z = zOf(a, b)
        assert(covered(exact, z) == inBox(a, b),
          s"seed=$seed exact ranges wrong at ($a,$b)")
        if (inBox(a, b))
          assert(covered(coarse, z), s"seed=$seed coarse dropped ($a,$b)")
      }
      // end-to-end: range predicate + exact residual == direct filter
      val data = Seq.fill(600)((rnd.nextInt(300).toLong,
        rnd.nextInt(300).toLong)).zipWithIndex
        .map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("id", "a", "b")
        .withColumn("z", Layout.zValue(col("a"), col("b")))
      val rangePred = coarse.map { case (lo, hi) =>
        col("z").between(lo, hi) }.reduce(_ || _)
      val viaRanges = data.filter(rangePred)
        .filter(col("a").between(alo, ahi) && col("b").between(blo, bhi))
        .select("id").as[Long].collect().toSet
      val direct = data.filter(
        col("a").between(alo, ahi) && col("b").between(blo, bhi))
        .select("id").as[Long].collect().toSet
      assert(viaRanges == direct, s"seed=$seed")
    }
  }

  test("packing invariants on arbitrary corpora: spans conserve every " +
    "token, tile full chunks to the budget, and never exceed it") {
    val words = Array("aa", "bb", "cc", "dd")
    for (seed <- Seq(7, 99)) {
      val rnd = new Random(seed)
      val budget = 4 + rnd.nextInt(60)
      val docs = Seq.tabulate(30)(i => (i.toLong,
        Seq.fill(1 + rnd.nextInt(40))(words(rnd.nextInt(4)))
          .mkString(" ")))
        .toDF("doc_id", "text")
      val spans = Packing.chunkSpans(
        Packing.packingPlan(docs, budget = budget, shards = 3),
        budget = budget)
        .select($"doc_id", $"n_tokens", $"shard", $"chunk",
          $"tok_from", $"tok_to")
        .as[(Long, Int, Long, Long, Long, Long)].collect()
      // conservation per doc
      spans.groupBy(_._1).foreach { case (id, rows) =>
        val n = rows.head._2.toLong
        assert(rows.map(r => r._6 - r._5).sum == n,
          s"seed=$seed doc $id lost tokens")
      }
      // no chunk over budget; all full but each shard's last
      spans.groupBy(r => (r._3, r._4)).foreach { case ((sh, ch), rows) =>
        val covered = rows.map(r => r._6 - r._5).sum
        assert(covered <= budget.toLong)
        val last = spans.filter(_._3 == sh).map(_._4).max
        if (ch < last) assert(covered == budget.toLong,
          s"seed=$seed shard $sh chunk $ch under-filled: $covered/$budget")
      }
    }
  }

  test("bpeTokenCount is monotone: every extra merge can only shrink " +
    "the token count, floored by the word count") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(50).select($"doc_id", $"text").localCheckpoint()
    val merges = TextOps.bpeTrain(docs, merges = 6)
      .orderBy("rank").select("lsym", "rsym")
      .as[(String, String)].collect().toSeq
    val counts = (0 to merges.length).map { k =>
      docs.select(
        TextOps.bpeTokenCount($"text", merges.take(k)).as("n"),
        org.apache.spark.sql.functions.size(
          TextOps.tokens($"text")).as("w"))
        .as[(Int, Int)].collect()
    }
    for (k <- 1 to merges.length; i <- counts(k).indices) {
      assert(counts(k)(i)._1 <= counts(k - 1)(i)._1,
        s"merge $k grew doc $i")
      assert(counts(k)(i)._1 >= counts(k)(i)._2,
        s"token count under word count at doc $i")
    }
  }

  test("mixRates invariants: quota = floor(share*budget), rates in " +
    "[0,100], under-full strata rate 100, exact floor otherwise") {
    for (seed <- Seq(11, 57)) {
      val rnd = new Random(seed)
      val counts = Seq.fill(4)(1 + rnd.nextInt(500))
      val budget = 1L + rnd.nextInt(300)
      val docs = counts.zipWithIndex.flatMap { case (c, s) =>
        (0 until c).map(i => (s.toLong * 10000 + i, s"s$s"))
      }.toDF("id", "src")
      val shares = counts.indices.map(s => s"s$s" -> 0.25).toMap
      val rates = Sampling.mixRates(docs, "src", shares, budget)
        .select($"src", $"cnt", $"quota", $"rate_pct")
        .as[(String, Long, Long, Long)].collect()
      assert(rates.length == counts.length)
      rates.foreach { case (_, c, q, r) =>
        assert(q == math.floor(0.25 * budget).toLong, s"seed=$seed")
        assert(r >= 0 && r <= 100, s"seed=$seed")
        if (c <= q) assert(r == 100L, s"seed=$seed")
        else assert(r == math.floor(100.0 * q / c).toLong, s"seed=$seed")
      }
    }
  }
}
