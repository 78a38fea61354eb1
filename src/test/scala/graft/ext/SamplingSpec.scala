package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = (1L to 5000L).toDF("id")

  test("split fractions land near the requested pct and are exhaustive") {
    val out = Sampling.trainTestSplit(ids, "id", testPct = 10)
    val bygroup = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(bygroup("test") + bygroup("train") == 5000)
    val frac = bygroup("test") / 5000.0
    assert(frac > 0.07 && frac < 0.13, s"test frac $frac")
  }

  test("assignment is id-stable under repartition and re-run") {
    val a = Sampling.trainTestSplit(ids, "id", 10)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    val b = Sampling.trainTestSplit(ids.repartition(17), "id", 10)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("sample(pct) is exactly the rows the split calls test") {
    val sampled = Sampling.sample(ids, "id", 10)
      .as[Long].collect().toSet
    val test = Sampling.trainTestSplit(ids, "id", 10)
      .filter($"split" === "test").select($"id").as[Long].collect().toSet
    assert(sampled == test)
  }

  test("bucketing is uniform-ish: every bucket is populated") {
    val buckets = ids.select(Sampling.bucket100($"id").as("b"))
      .distinct().as[Long].collect().toSet
    assert(buckets == (0L until 100L).toSet)
  }

  test("stratifiedSample keeps per-stratum rates; absent strata keep " +
    "nothing; kept rows are exactly the bucket-threshold rows") {
    val rows = spark.range(0, 2000)
      .select($"id", (when($"id" % 3 === 0, "en")
        .when($"id" % 3 === 1, "de").otherwise("xx")).as("lang"))
    val kept = Sampling.stratifiedSample(rows, "id", "lang",
      Map("en" -> 50, "de" -> 10))
      .select($"id", $"lang").as[(Long, String)].collect()
    assert(!kept.exists(_._2 == "xx"))
    val want = rows
      .withColumn("b", Sampling.bucket100($"id"))
      .filter(($"lang" === "en" && $"b" < 50) ||
        ($"lang" === "de" && $"b" < 10))
      .select($"id", $"lang").as[(Long, String)].collect()
    assert(kept.toSet == want.toSet)
    // rates are approximately honored (bucket uniformity)
    val en = kept.count(_._2 == "en").toDouble / (2000 / 3)
    assert(en > 0.4 && en < 0.6, s"en rate $en")
  }

  test("mixRates: quotas floor the share·budget, a stratum smaller " +
    "than its quota caps at 100%, absent strata rate 0, and planMix " +
    "feeds stratifiedSample") {
    val docs = (Seq.fill(50)("web") ++ Seq.fill(10)("wiki") ++
      Seq.fill(30)("junk")).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "src")
    val rates = Sampling.mixRates(docs, "src",
        Map("web" -> 0.5, "wiki" -> 0.5), budgetDocs = 60)
      .select($"src", $"quota", $"rate_pct")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(rates("web") == (30L, 60L))   // 30 of 50 → 60%
    assert(rates("wiki") == (30L, 100L)) // quota 30 > 10 docs → cap 100
    assert(rates("junk") == (0L, 0L))    // no target share
    val planned = Sampling.planMix(docs, "src",
      Map("web" -> 0.5, "wiki" -> 0.5), budgetDocs = 60)
    val kept = Sampling.stratifiedSample(docs, "id", "src", planned)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(!kept.contains("junk"))
    assert(kept("wiki") == 10)           // 100% of an under-full stratum
    assert(kept("web") <= 50 && kept("web") > 0)
  }

  test("quotaSample matches the naive full ranking, caps every stratum, " +
    "and keeps small strata whole") {
    import org.apache.spark.sql.expressions.Window
    // skewed strata: one hot key (1500 rows), one medium, one tiny (< n)
    val rows = spark.range(0, 2000).select($"id",
      (when($"id" < 1500, "hot").when($"id" < 1995, "med").otherwise("tiny"))
        .as("src"))
    val kept = Sampling.quotaSample(rows, "id", "src", n = 50)
      .select($"id", $"src").as[(Long, String)].collect()
    val byStratum = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byStratum("hot") == 50 && byStratum("med") == 50)
    assert(byStratum("tiny") == 5) // fewer rows than the quota → all kept
    // exact-set equivalence with the naive window ranking
    val naive = rows
      .withColumn("rk", row_number().over(Window.partitionBy($"src")
        .orderBy(Sampling.bucket100($"id"), $"id")))
      .filter($"rk" <= 50).select($"id", $"src")
      .as[(Long, String)].collect()
    assert(kept.toSet == naive.toSet)
  }

  test("quotaSample keeps NULL-stratum rows as a stratum of their own " +
    "(null-safe boundary join), matching the naive window semantics") {
    import org.apache.spark.sql.expressions.Window
    val rows = spark.range(0, 600).select($"id",
      when($"id" % 3 === 0, lit(null).cast("string")).otherwise(lit("a"))
        .as("src"))
    val kept = Sampling.quotaSample(rows, "id", "src", n = 40)
      .select($"id", $"src").as[(Long, Option[String])].collect()
    val byStratum = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byStratum(None) == 40, s"NULL stratum dropped: $byStratum")
    assert(byStratum(Some("a")) == 40)
    val naive = rows
      .withColumn("rk", row_number().over(Window.partitionBy($"src")
        .orderBy(Sampling.bucket100($"id"), $"id")))
      .filter($"rk" <= 40).select($"id", $"src")
      .as[(Long, Option[String])].collect()
    assert(kept.toSet == naive.toSet)
  }

  test("quotaSample hot-boundary recursion: a degenerate stratum takes " +
    "the salted sub-bucket path, still yields exactly n id-stable rows, " +
    "and cold strata stay bit-identical to the naive ranking") {
    import org.apache.spark.sql.expressions.Window
    // one hot stratum (3000 rows, ~30/bucket → its boundary bucket
    // exceeds the forced threshold of 15), one cold stratum (400 rows,
    // ~4/bucket) that must stay on the exact id-prefix path
    val rows = spark.range(0, 3400).select($"id",
      when($"id" < 3000, "hot").otherwise("cold").as("src"))
    val kept = Sampling.quotaSample(rows, "id", "src", n = 60,
        hotBoundary = 15L)
      .select($"id", $"src").as[(Long, String)].collect()
    val byStratum = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byStratum("hot") == 60 && byStratum("cold") == 60)
    // deterministic: a repartitioned rerun keeps the exact same set
    val again = Sampling.quotaSample(rows.repartition(13), "id", "src",
        n = 60, hotBoundary = 15L)
      .select($"id", $"src").as[(Long, String)].collect()
    assert(kept.toSet == again.toSet)
    // cold stratum unchanged vs the naive window ranking
    val naiveCold = rows.filter($"src" === "cold")
      .withColumn("rk", row_number().over(Window.partitionBy($"src")
        .orderBy(Sampling.bucket100($"id"), $"id")))
      .filter($"rk" <= 60).select($"id").as[Long].collect().toSet
    assert(kept.filter(_._2 == "cold").map(_._1).toSet == naiveCold)
    // hot stratum: whole level-1 buckets below the boundary are the
    // same as naive; only the boundary bucket's internal pick differs
    // (documented (sub-bucket, id) order) — and it is itself the
    // deterministic prefix of that order
    val hotRows = rows.filter($"src" === "hot")
      .withColumn("b", Sampling.bucket100($"id"))
    val bounds = Sampling.quotaSample(rows, "id", "src", n = 60)
      .filter($"src" === "hot").select($"id").as[Long].collect().toSet
    val keptHot = kept.filter(_._2 == "hot").map(_._1).toSet
    val boundaryBucket = hotRows
      .withColumn("rk", row_number().over(Window.partitionBy($"src")
        .orderBy($"b", $"id")))
      .filter($"rk" <= 60)
      .agg(max($"b")).as[Long].head()
    val belowBoundary = hotRows.filter($"b" < boundaryBucket)
      .select($"id").as[Long].collect().toSet
    assert(belowBoundary.subsetOf(keptHot))
    assert(belowBoundary.subsetOf(bounds))
    // and the recursed pick matches the explicit (sub-bucket, id) order
    val take = 60 - belowBoundary.size
    val expectHotBoundary = hotRows.filter($"b" === boundaryBucket)
      .withColumn("b2", Sampling.bucket100(
        concat($"id".cast("string"), lit(":q2"))))
      .withColumn("rk", row_number().over(Window.partitionBy($"src")
        .orderBy($"b2", $"id")))
      .filter($"rk" <= take).select($"id").as[Long].collect().toSet
    assert(keptHot == belowBoundary ++ expectHotBoundary)
  }
}
