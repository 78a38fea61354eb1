package graft

import graft.catalog.TableStore
import graft.cdc.Merge
import graft.ext.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Seeded randomized cross-checks: each custom operator against a
  * brute-force or built-in reference on generated data. Fixed seeds —
  * failures reproduce exactly. These catch the tie/duplicate/boundary
  * semantics a hand-picked fixture misses. */
class RandomizedEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  test("AsOfJoin.backward/forward match the brute-force definition on " +
    "random keyed timelines (ties, absent keys, duplicates)") {
    for (seed <- Seq(11, 42, 97)) {
      val rnd = new Random(seed)
      val left = Seq.tabulate(150)(i =>
        (rnd.nextInt(12).toLong, rnd.nextInt(40).toLong, i.toLong))
        .toDF("k", "ts", "lid")
      // unique (k, ts) on the right, as the operator requires
      val right = Seq.tabulate(150)(_ =>
        (rnd.nextInt(12).toLong, rnd.nextInt(40).toLong))
        .distinct.map { case (k, t) => (k, t, k * 1000 + t) }
        .toDF("k", "ts", "payload")

      val rightRows = right.as[(Long, Long, Long)].collect()
      val back = AsOfJoin.backward(left, right, "k", "ts", "ts",
        Seq("payload"))
        .select($"lid", $"asof_payload")
        .as[(Long, Option[Long])].collect().toMap
      val fwd = AsOfJoin.forward(left, right, "k", "ts", "ts",
        Seq("payload"))
        .select($"lid", $"asof_payload")
        .as[(Long, Option[Long])].collect().toMap
      left.as[(Long, Long, Long)].collect().foreach { case (k, ts, lid) =>
        val before = rightRows.filter(r => r._1 == k && r._2 <= ts)
        val after = rightRows.filter(r => r._1 == k && r._2 >= ts)
        val wantB = if (before.isEmpty) None
          else Some(before.maxBy(_._2)._3)
        val wantF = if (after.isEmpty) None
          else Some(after.minBy(_._2)._3)
        assert(back(lid) == wantB, s"seed=$seed backward lid=$lid")
        assert(fwd(lid) == wantF, s"seed=$seed forward lid=$lid")
      }
    }
  }

  test("AsOfJoin carries NULL payload fields atomically: the matched " +
    "right row's nulls come through, never back-filled from older rows") {
    for (seed <- Seq(7, 301)) {
      val rnd = new Random(seed)
      val left = Seq.tabulate(120)(i =>
        (rnd.nextInt(10).toLong, rnd.nextInt(30).toLong, i.toLong))
        .toDF("k", "ts", "lid")
      // ~40% of payload values are null; `marker` is never null, so a
      // mixed-rows bug shows as (null payload, marker from ANOTHER row)
      val rightRows = Seq.tabulate(120)(_ =>
        (rnd.nextInt(10).toLong, rnd.nextInt(30).toLong))
        .distinct.map { case (k, t) =>
          (k, t,
            if (rnd.nextInt(5) < 2) None else Some(k * 1000 + t),
            k * 1000 + t)
        }
      val right = rightRows.toDF("k", "ts", "payload", "marker")

      val back = AsOfJoin.backward(left, right, "k", "ts", "ts",
        Seq("payload", "marker"))
        .select($"lid", $"asof_payload", $"asof_marker")
        .as[(Long, Option[Long], Option[Long])].collect()
      val leftRows = left.as[(Long, Long, Long)].collect()
      val backMap = back.map(r => r._1 -> (r._2, r._3)).toMap
      leftRows.foreach { case (k, ts, lid) =>
        val before = rightRows.filter(r => r._1 == k && r._2 <= ts)
        val want =
          if (before.isEmpty) (None, None)
          else {
            val m = before.maxBy(_._2)
            (m._3, Some(m._4))
          }
        assert(backMap(lid) == want,
          s"seed=$seed lid=$lid: got ${backMap(lid)}, want $want")
      }
    }
  }

  test("RangeJoin matches the brute-force range predicate on random " +
    "intervals across bucket widths") {
    for (seed <- Seq(5, 77)) {
      val rnd = new Random(seed)
      val pts = Seq.tabulate(120)(i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(500).toLong, i.toLong))
        .toDF("k", "t", "pid")
      val ivs = Seq.tabulate(60) { i =>
        val lo = rnd.nextInt(450).toLong
        (rnd.nextInt(8).toLong, lo, lo + rnd.nextInt(120), i.toLong)
      }.toDF("k", "lo", "hi", "iid")
      val want = pts.join(ivs, Seq("k"))
        .filter($"t" >= $"lo" && $"t" <= $"hi")
        .select($"pid", $"iid").as[(Long, Long)].collect().toSet
      for (w <- Seq(1L, 13L, 100L, 1000L)) {
        val got = RangeJoin.intervalJoin(pts, ivs, "k", "t", "lo", "hi", w)
          .select($"pid", $"iid").as[(Long, Long)].collect()
        assert(got.toSet == want && got.length == want.size,
          s"seed=$seed width=$w")
      }
    }
  }

  test("SQL MERGE INTO equals Merge.mergeCdc on random CDC batches") {
    for (seed <- Seq(3, 123)) {
      val rnd = new Random(seed)
      val target = Seq.tabulate(40)(i =>
        (i, rnd.nextInt(1000), s"s${rnd.nextInt(3)}"))
        .toDF("order_id", "user_id", "status")
      // unique keys in staging (the MERGE cardinality contract)
      val staging = rnd.shuffle((0 until 60).toList).take(35).map { k =>
        (k, rnd.nextInt(1000), s"s${rnd.nextInt(3)}",
          if (rnd.nextInt(4) == 0) "d" else "u")
      }.toDF("order_id", "user_id", "status", "op")

      val want = Merge.mergeCdc(target, staging, Seq("order_id"))
        .as[(Int, Int, String)].collect().toSet

      val store = new TableStore(spark)
      store.register("rnd", s"t_$seed", target)
      store.stage("rnd_staging", staging)
      spark.sql(s"""
        MERGE INTO rnd.t_$seed t USING rnd_staging s
        ON t.order_id = s.order_id
        WHEN MATCHED AND s.op = 'd' THEN DELETE
        WHEN MATCHED AND s.op <> 'd' THEN UPDATE SET
          user_id = s.user_id, status = s.status
        WHEN NOT MATCHED AND s.op <> 'd' THEN
          INSERT (order_id, user_id, status)
          VALUES (s.order_id, s.user_id, s.status)""")
      val got = store.table("rnd", s"t_$seed")
        .as[(Int, Int, String)].collect().toSet
      assert(got == want, s"seed=$seed")
    }
  }

  test("quotaSample equals the naive (bucket, id) window ranking on " +
    "random strata incl. NULLs, at any hotBoundary threshold") {
    import org.apache.spark.sql.expressions.Window
    for (seed <- Seq(5, 77); hot <- Seq(2L, 10000000L)) {
      val rnd = new Random(seed)
      val rows = Seq.tabulate(800)(i => (i.toLong,
        rnd.nextInt(5) match {
          case 0 => null
          case k => s"s$k"
        })).toDF("id", "src")
      val kept = graft.ext.Sampling
        .quotaSample(rows, "id", "src", n = 30, hotBoundary = hot)
        .select($"id").as[Long].collect().sorted.toSeq
      if (hot > 800) {
        // cold everywhere: bit-identical to the naive ranking
        val naive = rows.withColumn("rk",
          row_number().over(Window.partitionBy($"src")
            .orderBy(graft.ext.Sampling.bucket100($"id"), $"id")))
          .filter($"rk" <= 30).select($"id")
          .as[Long].collect().sorted.toSeq
        assert(kept == naive, s"seed=$seed")
      } else {
        // hot path may pick a different (documented) in-boundary order,
        // but per-stratum counts must match the naive cap exactly and
        // the result must be deterministic under repartition
        val naiveCounts = rows.withColumn("rk",
          row_number().over(Window.partitionBy($"src")
            .orderBy(graft.ext.Sampling.bucket100($"id"), $"id")))
          .filter($"rk" <= 30).groupBy($"src").count()
          .as[(Option[String], Long)].collect().toMap
        val keptCounts = graft.ext.Sampling
          .quotaSample(rows, "id", "src", n = 30, hotBoundary = hot)
          .groupBy($"src").count()
          .as[(Option[String], Long)].collect().toMap
        assert(keptCounts == naiveCounts, s"seed=$seed hot=$hot")
        val again = graft.ext.Sampling
          .quotaSample(rows.repartition(7), "id", "src", n = 30,
            hotBoundary = hot)
          .select($"id").as[Long].collect().sorted.toSeq
        assert(kept == again, s"seed=$seed hot=$hot")
      }
    }
  }

  test("incrementalExactDedup equals the brute-force set definition on " +
    "random archives and batches (overlaps, in-batch dups, case/space " +
    "normalization)") {
    for (seed <- Seq(23, 171)) {
      val rnd = new Random(seed)
      val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon")
      def text() = Seq.fill(3 + rnd.nextInt(3))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val archTexts = Seq.fill(25)(text())
      val archive = archTexts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      // incoming: mix of archive repeats (some with case/space noise),
      // fresh texts, and in-batch duplicates
      val incTexts = Seq.fill(40)(rnd.nextInt(3) match {
        case 0 => archTexts(rnd.nextInt(archTexts.size))
        case 1 => "  " + archTexts(rnd.nextInt(archTexts.size))
          .toUpperCase + " "
        case _ => text() + " fresh" + rnd.nextInt(5)
      })
      val incoming = incTexts.zipWithIndex
        .map { case (t, i) => (1000L + i, t) }.toDF("doc_id", "text")
      val got = graft.ext.DedupOps
        .incrementalExactDedup(archive, incoming)
        .select($"doc_id", $"dup_count").as[(Long, Long)]
        .collect().toMap
      def norm(t: String) = t.trim.toLowerCase
      val archSet = archTexts.map(norm).toSet
      val want = incTexts.zipWithIndex
        .map { case (t, i) => (1000L + i, norm(t)) }
        .groupBy(_._2).collect {
          case (n, rows) if !archSet.contains(n) =>
            rows.map(_._1).min -> rows.size.toLong
        }.toMap
      assert(got == want, s"seed=$seed")
    }
  }

  test("simhashPairsMulti equals brute-force: all pairs within maxDist " +
    "whose signatures share ANY rotated 8-bit prefix, each exactly once") {
    for (seed <- Seq(13, 211)) {
      val rnd = new Random(seed)
      val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon",
        "zeta", "eta", "theta", "iota", "kappa", "the", "quick", "dog")
      val docs = Seq.tabulate(60)(i => (i.toLong,
        Seq.fill(6 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))).toDF("doc_id", "text")
      val sigs = graft.ext.DedupOps.withSimhash(docs)
        .select($"doc_id", $"simhash").as[(Long, String)].collect().toMap
      def prefixes(s: String): Seq[String] = {
        val d = s + s
        (0 until 4).map(t => d.substring(t * 8, t * 8 + 8))
      }
      def hamming(a: String, b: String): Int =
        a.zip(b).count { case (x, y) => x != y }
      val want = (for {
        a <- sigs.keys; b <- sigs.keys if a < b
        if prefixes(sigs(a)).zip(prefixes(sigs(b))).exists(p => p._1 == p._2)
        h = hamming(sigs(a), sigs(b)) if h <= 6
      } yield (a, b) -> h).toMap
      val gotRows = graft.ext.DedupOps.simhashPairsMulti(docs, 6)
        .select($"id_a", $"id_b", $"hamming")
        .as[(Long, Long, Int)].collect()
      // exactly once: no duplicate pair rows survive the disjoint union
      assert(gotRows.length == gotRows.map(r => (r._1, r._2)).distinct.length,
        s"seed=$seed duplicate pair rows")
      val got = gotRows.map(r => (r._1, r._2) -> r._3).toMap
      assert(got == want, s"seed=$seed")
    }
  }

  test("GroupTopK equals the row_number window formulation on random " +
    "data across many partitions (exercising partial merges)") {
    import org.apache.spark.sql.expressions.Window
    for (seed <- Seq(5, 23, 77)) {
      val rnd = new Random(seed)
      val rows = Seq.tabulate(500)(i =>
        (s"g${rnd.nextInt(7)}", rnd.nextInt(40).toDouble, i.toLong))
      // duplicate values are common (40 buckets) → the id tie-break is
      // live; 11 partitions force map-side partials and merges
      val df = rows.toDF("g", "v", "id").repartition(11)
      val got = graft.ext.GroupTopK.topKPerGroup(df, Seq("g"), "v", "id", 5)
        .select($"g", $"rank", $"id", $"v")
        .as[(String, Int, Long, Double)].collect().toSet
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
      val want = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select($"g", $"rank", $"id", $"v")
        .as[(String, Int, Long, Double)].collect().toSet
      assert(got == want, s"seed=$seed")
    }
  }

  test("cherrypickBranch equals the set-algebra definition on random " +
    "append-shaped branches over moved live states; non-append " +
    "branches always raise") {
    val rnd = new scala.util.Random(20260813)
    for (trial <- 1 to 6) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"cherryprop$trial").toString + "/t"
      def rows(ids: Seq[Int]) = ids.map(i => (i, s"v$i")).toDF("id", "tag")
      val baseIds = (1 to 20 + rnd.nextInt(30)).toSeq
      graft.pipeline.Snapshot.createOrReplace(rows(baseIds), dir,
        keepVersions = 5)
      // branch = base + a random APPEND (possibly empty)
      val branchAdd = (1000 to 1000 + rnd.nextInt(10)).toSeq
        .filter(_ => rnd.nextBoolean())
      graft.pipeline.Snapshot.writeBranch(rows(baseIds ++ branchAdd),
        dir, "wap")
      // live moves with its own append
      val liveAdd = (2000 to 2000 + rnd.nextInt(10)).toSeq
      graft.pipeline.Snapshot.createOrReplace(rows(baseIds ++ liveAdd),
        dir, keepVersions = 5)
      graft.pipeline.Snapshot.cherrypickBranch(spark, dir, "wap",
        keepVersions = 5)
      val got = spark.read.parquet(dir)
        .as[(Int, String)].collect().toSet
      val want = (baseIds ++ liveAdd ++ branchAdd)
        .map(i => (i, s"v$i")).toSet
      assert(got == want, s"trial $trial: $got vs $want")
      assert(graft.pipeline.Snapshot.branches(dir).isEmpty)

      // a branch that dropped a random base row is refused
      val victim = baseIds(rnd.nextInt(baseIds.size))
      graft.pipeline.Snapshot.writeBranch(
        rows(baseIds.filterNot(_ == victim)), dir, "bad")
      intercept[IllegalStateException] {
        graft.pipeline.Snapshot.cherrypickBranch(spark, dir, "bad") }
      graft.pipeline.Snapshot.dropBranch(dir, "bad")
    }
  }

  test("chunkDocs invariants hold on random docs and (chunk, overlap) " +
    "parameters: lossless reconstruction, exact overlap, offsets") {
    for (seed <- Seq(7, 21, 63)) {
      val rnd = new Random(seed)
      val chunkTokens = 4 + rnd.nextInt(20)
      val overlap = rnd.nextInt(chunkTokens)
      val step = chunkTokens - overlap
      val docs = Seq.tabulate(25) { d =>
        val n = 1 + rnd.nextInt(120)
        (d.toLong, Seq.tabulate(n)(i => s"d${d}t$i").mkString(" "))
      }
      val out = graft.ext.TextOps.chunkDocs(
          docs.toDF("doc_id", "text"), chunkTokens = chunkTokens,
          overlap = overlap)
        .select($"doc_id", $"chunk_id", $"start_tok", $"n_tok",
          $"chunk_text")
        .as[(Long, Long, Long, Long, String)].collect()
        .groupBy(_._1)
      docs.foreach { case (id, text) =>
        val words = text.split(" ").toSeq
        val chunks = out(id).sortBy(_._2)
        val label = s"seed=$seed doc=$id c=$chunkTokens o=$overlap"
        // offsets advance by step, ids are dense from 0
        assert(chunks.map(_._2).toSeq == chunks.indices.map(_.toLong),
          label)
        assert(chunks.forall(c => c._3 == c._2 * step), label)
        // every chunk is the exact token slice it claims
        chunks.foreach { c =>
          val want = words.slice(c._3.toInt, c._3.toInt + chunkTokens)
          assert(c._5.split(" ").toSeq.filter(_.nonEmpty) == want &&
            c._4 == want.length, label)
        }
        // dropping each later chunk's overlap reconstructs the doc
        val rebuilt = chunks.head._5.split(" ").toSeq ++
          chunks.tail.toSeq.flatMap(_._5.split(" ").drop(overlap).toSeq)
        assert(rebuilt == words, label)
        // no chunk beyond the last is emitted (the tail is covered)
        assert(chunks.last._3 + chunkTokens >= words.length, label)
      }
    }
  }

  test("prunedRead equals read+filter on random data, layouts, and " +
    "ranges (nulls, sorted/unsorted, with and without manifests)") {
    import graft.pipeline.{ScanPruning, Snapshot}
    for (seed <- Seq(7, 23, 61)) {
      val rnd = new Random(seed)
      // random rows with NULLs in every column type
      val data = Seq.tabulate(400) { i =>
        (if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(500).toLong),
          if (rnd.nextInt(10) == 0) None
          else Some(rnd.nextDouble() * 100.0),
          if (rnd.nextInt(10) == 0) None
          else Some(f"w${rnd.nextInt(300)}%03d"),
          i.toLong)
      }.toDF("k", "v", "s", "rid")
      val dir = java.nio.file.Files.createTempDirectory(s"rprune$seed")
        .toString + "/t"
      Snapshot.createOrReplace(data, dir)
      // random layout: unsorted, k-sorted (publishes a manifest), or
      // s-sorted
      rnd.nextInt(3) match {
        case 0 => ()
        case 1 => Snapshot.rewriteSorted(spark, dir, 6, Seq(col("k")))
        case 2 => Snapshot.rewriteSorted(spark, dir, 6, Seq(col("s")))
      }
      for (trial <- 0 until 8) {
        val label = s"seed=$seed trial=$trial"
        val (ranges, cond) = rnd.nextInt(4) match {
          case 0 =>
            val lo = rnd.nextInt(500).toLong
            val hi = lo + rnd.nextInt(200)
            (Seq(ScanPruning.ColumnRange("k", Some(lo), Some(hi))),
              col("k") >= lo && col("k") <= hi)
          case 1 =>
            val lo = rnd.nextDouble() * 100
            (Seq(ScanPruning.ColumnRange("v", Some(lo), None)),
              col("v") >= lo)
          case 2 =>
            val lo = f"w${rnd.nextInt(300)}%03d"
            val hi = f"w${rnd.nextInt(300)}%03d"
            (Seq(ScanPruning.ColumnRange("s", Some(lo), Some(hi))),
              col("s") >= lo && col("s") <= hi)
          case 3 =>
            val point = rnd.nextInt(500).toLong
            val slo = f"w${rnd.nextInt(300)}%03d"
            (Seq(ScanPruning.ColumnRange("k", Some(point), Some(point)),
              ScanPruning.ColumnRange("s", Some(slo), None)),
              col("k") === point && col("s") >= slo)
        }
        val got = Snapshot.prunedRead(spark, dir, ranges)
          .select("rid").as[Long].collect().sorted.toSeq
        val want = Snapshot.read(spark, dir).filter(cond)
          .select("rid").as[Long].collect().sorted.toSeq
        assert(got == want, label)
      }
    }
  }

  test("star-rollup maintenance equals the full recompute under RANDOM " +
    "interleaved fact/dim commit sequences (appends, position deletes, " +
    "fan-out, vanished groups) — seeded") {
    val S = graft.pipeline.Snapshot
    val R = graft.pipeline.Rollup
    for (seed <- Seq(5, 83)) {
      val rnd = new Random(seed)
      val root = java.nio.file.Files
        .createTempDirectory(s"rndru$seed").toString
      val (fact, dim, ru) = (s"$root/f", s"$root/d", s"$root/ru")
      def factRows(n: Int, base: Int): Seq[(Long, Long, Option[Double])] =
        Seq.tabulate(n)(i => ((base + i).toLong,
          rnd.nextInt(14).toLong,
          if (rnd.nextInt(5) == 0) None
          else Some(rnd.nextInt(1000) / 10.0)))
      S.createOrReplace(factRows(200, 0).toDF("id", "cust", "qty"),
        fact, keepVersions = 2)
      S.createOrReplace((0 until 12).map(i =>
          (i.toLong, s"s${i % 4}")).toDF("ckey", "seg"),
        dim, keepVersions = 2)
      R.build(spark, fact, ru, Seq("seg"), Seq("qty"),
        minMax = Seq("qty"),
        dims = Seq(R.DimSpec(dim, Seq(("cust", "ckey")))))
      def want(): Set[Seq[Any]] = {
        val f = S.read(spark, fact)
        val d = S.read(spark, dim)
        f.join(d, f("cust") === d("ckey"))
          .groupBy("seg")
          .agg(count(lit(1)).as("cnt"),
            sum(col("qty").cast(
              org.apache.spark.sql.types.DecimalType(27, 6)))
              .cast("double").as("sum_qty"),
            count(col("qty")).as("cnt_qty"),
            min("qty").as("min_qty"), max("qty").as("max_qty"))
          .collect().map(_.toSeq).toSet
      }
      def got(): Set[Seq[Any]] =
        R.read(spark, fact, ru)
          .select("seg", "cnt", "sum_qty", "cnt_qty", "min_qty",
            "max_qty")
          .collect().map(_.toSeq).toSet
      assert(got() == want(), s"seed=$seed build")
      var nextId = 10000
      for (step <- 1 to 6) {
        var committed = false
        if (rnd.nextBoolean()) { // fact append (may fan into any seg)
          S.morCommit(spark, fact, deletes = None,
            appends = Some(factRows(20 + rnd.nextInt(30), nextId)
              .toDF("id", "cust", "qty")),
            operation = "append")
          nextId += 100; committed = true
        }
        if (rnd.nextBoolean()) { // fact position-delete, random slice
          val k = 3 + rnd.nextInt(5)
          val r = rnd.nextInt(k)
          val vic = S.readLineage(spark, fact)
            .filter(col("id") % k === r).localCheckpoint()
          if (vic.limit(1).count() > 0) {
            S.morCommit(spark, fact, deletes = None, appends = None,
              operation = "delete", posDeletes = Some(vic))
            committed = true
          }
        }
        if (rnd.nextBoolean()) { // dim append: fan-out dup OR new key
          val row =
            if (rnd.nextBoolean()) (rnd.nextInt(12).toLong, "s9")
            else ((12 + rnd.nextInt(4)).toLong, s"s${rnd.nextInt(4)}")
          S.morCommit(spark, dim, deletes = None,
            appends = Some(Seq(row).toDF("ckey", "seg")),
            operation = "append")
          committed = true
        }
        if (rnd.nextInt(3) == 0) { // dim position-delete
          val vic = S.readLineage(spark, dim)
            .orderBy("ckey").limit(1 + rnd.nextInt(2))
            .localCheckpoint()
          if (vic.limit(1).count() > 0) {
            S.morCommit(spark, dim, deletes = None, appends = None,
              operation = "delete", posDeletes = Some(vic))
            committed = true
          }
        }
        R.refresh(spark, fact, ru)
        assert(got() == want(), s"seed=$seed step=$step " +
          s"(committed=$committed)")
      }
    }
  }
}
