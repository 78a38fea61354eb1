package graft.catalog

import graft.SparkSpec
import graft.pipeline.{Rollup, Snapshot}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Materialized-view rewrite pins: an aggregate over the base table
  * re-targets the FRESH gold rollup (and only then), the rewrite is
  * bit-identical to the base-side answer for every derivable shape
  * (count/sum-exact/min/max/avg-integral, subset-group roll-up,
  * global aggregate), and every unsafe shape — stale rollup, raw
  * double sum, filters below the aggregate, distinct — is left on the
  * base scan. */
class RollupRewriteSpec extends SparkSpec {
  import spark.implicits._

  /** Does the OPTIMIZED plan read from `dir` (path-boundary exact —
    * the default rollup dir is `<base>.rollup-<name>`, a string
    * PREFIXED by the base path, so substring matching lies)? */
  private def scans(df: DataFrame, dir: String): Boolean =
    df.queryExecution.optimizedPlan.collectLeaves().exists {
      case l: LogicalRelation => l.relation match {
        case f: HadoopFsRelation =>
          f.location.rootPaths.map(_.toUri.getPath).exists(p =>
            p == dir || p.startsWith(s"$dir/"))
        case _ => false
      }
      case _ => false
    }

  /** The same frame with the rewrite forced off — the base-side
    * answer every rewritten result must equal exactly. */
  private def baseline(sql: String): Set[Seq[Any]] = {
    spark.conf.set("spark.graft.rollup.rewrite.enabled", "false")
    try spark.sql(sql).collect().map(_.toSeq).toSet
    finally spark.conf.set("spark.graft.rollup.rewrite.enabled", "true")
  }

  private def fixture(): (String, String) = {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    val root = Files.createTempDirectory("rurw").toString
    val dir = s"$root/facts"
    val facts = (1 to 400).map(i => (i.toLong, s"g${i % 4}",
      s"r${i % 2}", (i % 13).toLong, i.toDouble)).toDF(
      "id", "grp", "region", "qty", "amount")
    Snapshot.createOrReplace(facts, dir, keepVersions = 2)
    store.registerSnapshot("mv", "facts", dir)
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mv.facts', name => 'mv.gold',
      group_by => 'grp,region', sum_cols => 'qty,amount',
      min_max_cols => 'amount')""").collect()
    (dir, new TableStore(spark).properties("mv", "gold")(
      "graft.rollup.dir"))
  }

  test("an exact-match aggregate re-targets the fresh gold table and " +
    "the answer is bit-identical; raw double sums and filters stay " +
    "on the base scan") {
    val (dir, ru) = fixture()
    val q = """SELECT grp, region, count(*) AS c,
      CAST(sum(CAST(amount AS DECIMAL(27,6))) AS DOUBLE) AS s,
      sum(qty) AS q, min(amount) AS mn, max(amount) AS mx,
      avg(qty) AS a
      FROM mv.facts GROUP BY grp, region"""
    val df = spark.sql(q)
    assert(scans(df, ru), "the derivable aggregate must read the gold")
    assert(!scans(df, dir), "…and must NOT touch the base table")
    assert(df.collect().map(_.toSeq).toSet == baseline(q))

    // a raw double sum is order-dependent — never rewritten
    val dbl = spark.sql(
      "SELECT grp, sum(amount) AS s FROM mv.facts GROUP BY grp")
    assert(!scans(dbl, ru) && scans(dbl, dir),
      "sum(double) must stay on the base scan")
    // a WHERE over rollup GROUP columns commutes with the partial
    // aggregation — it re-applies on the gold table
    val keyq = """SELECT grp, count(*) AS c, sum(qty) AS q
      FROM mv.facts WHERE region = 'r1' AND grp <> 'g2' GROUP BY grp"""
    val keyf = spark.sql(keyq)
    assert(scans(keyf, ru) && !scans(keyf, dir),
      "a group-key filter must ride the rewrite")
    assert(keyf.collect().map(_.toSeq).toSet == baseline(keyq))
    // …but a filter over a NON-key column disqualifies
    val flt = spark.sql("SELECT grp, count(*) AS c FROM mv.facts " +
      "WHERE qty > 3 GROUP BY grp")
    assert(!scans(flt, ru) && scans(flt, dir))
    // distinct aggregates are not derivable from the store
    val dst = spark.sql(
      "SELECT grp, count(DISTINCT qty) AS c FROM mv.facts GROUP BY grp")
    assert(!scans(dst, ru) && scans(dst, dir))
  }

  test("a COARSER group-by (subset of the rollup keys) re-aggregates " +
    "the gold table — sums of sums, min of mins — and a GLOBAL " +
    "aggregate derives from it too") {
    val (dir, ru) = fixture()
    val rollq = """SELECT grp, count(*) AS c, sum(qty) AS q,
      min(amount) AS mn FROM mv.facts GROUP BY grp"""
    val roll = spark.sql(rollq)
    assert(scans(roll, ru) && !scans(roll, dir),
      "the subset-group roll-up must read the gold")
    assert(roll.collect().map(_.toSeq).toSet == baseline(rollq))

    val allq = "SELECT count(*) AS c, sum(qty) AS q FROM mv.facts"
    val all = spark.sql(allq)
    assert(scans(all, ru) && !scans(all, dir))
    assert(all.collect().map(_.toSeq).toSet == baseline(allq))

    // SELECT DISTINCT over group columns is an Aggregate with no
    // aggregate functions — the key-only roll-up match
    val dq = "SELECT DISTINCT grp FROM mv.facts"
    val d = spark.sql(dq)
    assert(scans(d, ru) && !scans(d, dir),
      "DISTINCT group keys must read the gold table")
    assert(d.collect().map(_.toSeq).toSet == baseline(dq))
  }

  test("NULLABLE measures: count(m) and avg(m) derive from the " +
    "maintained NON-NULL count — the row count would silently " +
    "overcount — and an all-null group's avg surfaces null") {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    val root = Files.createTempDirectory("rurwnull").toString
    val dir = s"$root/nfacts"
    val facts = ((1 to 300).map(i => (i.toLong, s"g${i % 3}",
        if (i % 5 == 0) None else Some((i % 13).toLong))) ++
      // one group whose measure is ALL null: count(qty) = 0 there and
      // avg(qty) is null — the exact shapes a cnt-based rewrite breaks
      (901 to 905).map(i => (i.toLong, "gz", None: Option[Long])))
      .toDF("id", "grp", "qty")
    Snapshot.createOrReplace(facts, dir, keepVersions = 2)
    store.registerSnapshot("mv", "nfacts", dir)
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mv.nfacts', name => 'mv.ngold',
      group_by => 'grp', sum_cols => 'qty')""").collect()
    val ru = new TableStore(spark).properties("mv", "ngold")(
      "graft.rollup.dir")
    val q = """SELECT grp, count(*) AS c, count(qty) AS cq,
      avg(qty) AS a, sum(qty) AS s FROM mv.nfacts GROUP BY grp"""
    val df = spark.sql(q)
    assert(scans(df, ru) && !scans(df, dir),
      "count(m)/avg(m) over a maintained measure must read the gold")
    assert(df.collect().map(_.toSeq).toSet == baseline(q))
    val gz = df.filter($"grp" === "gz").head()
    assert(gz.getLong(1) == 5L && gz.getLong(2) == 0L
      && gz.isNullAt(3) && gz.isNullAt(4),
      "the all-null group must serve cq=0 and null avg/sum")
    // the global shape re-aggregates the same derivations
    val gq = "SELECT count(qty) AS cq, avg(qty) AS a FROM mv.nfacts"
    val g = spark.sql(gq)
    assert(scans(g, ru) && !scans(g, dir))
    assert(g.collect().map(_.toSeq).toSet == baseline(gq))
    // count over a NON-measure column is not derivable
    val nd = spark.sql(
      "SELECT grp, count(id) AS ci FROM mv.nfacts GROUP BY grp")
    assert(!scans(nd, ru) && scans(nd, dir))
  }

  test("a PARTIAL rollup serves only queries that repeat its " +
    "predicate: the conjunct is consumed, extra group-key filters " +
    "still ride, and a missing or different predicate stays on base") {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    val root = Files.createTempDirectory("rurwpart").toString
    val dir = s"$root/facts"
    val facts = (1 to 400).map(i => (i.toLong, s"g${i % 4}",
      s"r${i % 2}", (i % 13).toLong, i.toDouble)).toDF(
      "id", "grp", "region", "qty", "amount")
    Snapshot.createOrReplace(facts, dir, keepVersions = 2)
    store.registerSnapshot("mv", "facts", dir)
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mv.facts', name => 'mv.hot',
      group_by => 'grp,region', sum_cols => 'qty',
      where => 'qty > 3')""").collect()
    val ru = new TableStore(spark).properties("mv", "hot")(
      "graft.rollup.dir")

    val hit = """SELECT grp, count(*) AS c, sum(qty) AS q
      FROM mv.facts WHERE qty > 3 GROUP BY grp"""
    val hitDf = spark.sql(hit)
    assert(scans(hitDf, ru) && !scans(hitDf, dir),
      "a query repeating the predicate must serve the partial store")
    assert(hitDf.collect().map(_.toSeq).toSet == baseline(hit))

    // predicate + group-key filter: the predicate consumes, the key
    // filter re-applies on the gold table
    val mixed = """SELECT grp, count(*) AS c FROM mv.facts
      WHERE qty > 3 AND region = 'r1' GROUP BY grp"""
    val mixedDf = spark.sql(mixed)
    assert(scans(mixedDf, ru) && !scans(mixedDf, dir))
    assert(mixedDf.collect().map(_.toSeq).toSet == baseline(mixed))

    // no predicate → rows the store never saw → base scan
    val miss1 = spark.sql(
      "SELECT grp, count(*) AS c FROM mv.facts GROUP BY grp")
    assert(!scans(miss1, ru) && scans(miss1, dir))
    // a NARROWER predicate over a NON-KEY column → base scan: the
    // implication holds (qty > 4 ⟹ qty > 3) but the residual cannot
    // re-apply on the gold table (qty is a measure there, its
    // pre-aggregation rows are gone)
    val miss2 = spark.sql("SELECT grp, count(*) AS c FROM mv.facts " +
      "WHERE qty > 4 GROUP BY grp")
    assert(!scans(miss2, ru) && scans(miss2, dir))
  }

  test("PREDICATE IMPLICATION serves the partial store: a strictly-" +
    "narrower range, point, or IN-subset over a gold KEY column " +
    "satisfies the stored predicate (Calcite's implied-filter " +
    "serve) — the query's own filter re-applies on the gold key; a " +
    "wider or boundary-violating predicate stays on base") {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    val root = Files.createTempDirectory("rurwimp").toString
    val dir = s"$root/facts"
    // amount is BIGINT: a raw double sum never rewrites (by design),
    // and these pins are about implication, not measure types
    val facts = (1 to 600).map(i => (i.toLong, s"g${i % 4}",
      s"r${i % 3}", (i % 13).toLong, (i % 7).toLong)).toDF(
      "id", "grp", "region", "qty", "amount")
    Snapshot.createOrReplace(facts, dir, keepVersions = 2)
    store.registerSnapshot("mvi", "facts", dir)
    // RANGE store: qty is a GROUP KEY, the slice is qty > 3
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mvi.facts', name => 'mvi.rng',
      group_by => 'grp,qty', sum_cols => 'amount',
      where => 'qty > 3')""").collect()
    val rng = new TableStore(spark).properties("mvi", "rng")(
      "graft.rollup.dir")
    // IN store: region is a GROUP KEY, the slice is two of its values
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mvi.facts', name => 'mvi.set',
      group_by => 'grp,region', sum_cols => 'qty',
      where => 'region IN (''r0'', ''r2'')')""").collect()
    val set = new TableStore(spark).properties("mvi", "set")(
      "graft.rollup.dir")

    def served(sql: String, ru: String): Unit = {
      val df = spark.sql(sql)
      assert(scans(df, ru) && !scans(df, dir),
        s"must serve the partial store: $sql")
      assert(df.collect().map(_.toSeq).toSet == baseline(sql),
        s"rewrite changed the answer of: $sql")
    }
    def onBase(sql: String, ru: String): Unit = {
      val df = spark.sql(sql)
      assert(!scans(df, ru) && scans(df, dir),
        s"must stay on base (no implication): $sql")
      assert(df.collect().map(_.toSeq).toSet == baseline(sql))
    }

    // range subsumption: qty > 5 ⟹ qty > 3; the int literal rides an
    // analyzer cast to qty's bigint and must still be recognized
    served("SELECT grp, count(*) AS c, sum(amount) AS s " +
      "FROM mvi.facts WHERE qty > 5 GROUP BY grp", rng)
    // inclusive boundary: qty >= 4 ⟹ qty > 3
    served("SELECT grp, count(*) AS c FROM mvi.facts " +
      "WHERE qty >= 4 GROUP BY grp", rng)
    // point-in-range: qty = 7 ⟹ qty > 3
    served("SELECT grp, count(*) AS c FROM mvi.facts " +
      "WHERE qty = 7 GROUP BY grp", rng)
    // IN-list inside the range: every value > 3
    served("SELECT grp, sum(amount) AS s FROM mvi.facts " +
      "WHERE qty IN (5, 9, 12) GROUP BY grp", rng)
    // range + extra key filter: the implied conjunct satisfies the
    // slice, BOTH residuals re-apply on gold keys
    served("SELECT grp, count(*) AS c FROM mvi.facts " +
      "WHERE qty > 5 AND grp = 'g1' GROUP BY grp", rng)
    // BETWEEN analyzes to two conjuncts; the lower bound implies the
    // slice, the upper re-applies on the gold key
    served("SELECT grp, count(*) AS c FROM mvi.facts " +
      "WHERE qty BETWEEN 5 AND 9 GROUP BY grp", rng)
    // IN-subset: {r0} ⊆ {r0, r2}; equality and IN shapes both
    served("SELECT grp, count(*) AS c, sum(qty) AS s " +
      "FROM mvi.facts WHERE region = 'r0' GROUP BY grp", set)
    served("SELECT grp, count(*) AS c FROM mvi.facts " +
      "WHERE region IN ('r2') GROUP BY grp", set)
    // OR of value sets is a set union: {r0} ∪ {r2} ⊆ the slice
    served("SELECT grp, count(*) AS c FROM mvi.facts " +
      "WHERE region = 'r0' OR region = 'r2' GROUP BY grp", set)
    // OR of points within the range slice
    served("SELECT grp, count(*) AS c FROM mvi.facts " +
      "WHERE qty = 5 OR qty IN (9, 12) GROUP BY grp", rng)

    // DATE is an integral domain (whole days): d >= 16th tightens to
    // the same bound as the stored d > 15th
    val dfacts = (1 to 200).map(i => (i.toLong, s"g${i % 4}",
      java.sql.Date.valueOf(f"2024-01-${1 + (i % 28)}%02d"),
      (i % 7).toLong))
      .toDF("id", "grp", "d", "v")
    val ddir = s"$root/dfacts"
    Snapshot.createOrReplace(dfacts, ddir, keepVersions = 2)
    store.registerSnapshot("mvi", "dfacts", ddir)
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mvi.dfacts', name => 'mvi.dates',
      group_by => 'grp,d', sum_cols => 'v',
      where => 'd > DATE ''2024-01-15''')""").collect()
    val dates = new TableStore(spark).properties("mvi", "dates")(
      "graft.rollup.dir")
    locally {
      val q = "SELECT grp, count(*) AS c FROM mvi.dfacts " +
        "WHERE d >= DATE '2024-01-16' GROUP BY grp"
      val df = spark.sql(q)
      assert(scans(df, dates) && !scans(df, ddir),
        "d >= 16th must serve the d > 15th store (date tightening)")
      assert(df.collect().map(_.toSeq).toSet == baseline(q))
      val wider = spark.sql("SELECT grp, count(*) AS c " +
        "FROM mvi.dfacts WHERE d >= DATE '2024-01-15' GROUP BY grp")
      assert(!scans(wider, dates) && scans(wider, ddir),
        "d >= 15th admits the boundary day — base only")
    }

    // WIDER range: qty > 2 includes rows the store never saw
    onBase("SELECT grp, count(*) AS c FROM mvi.facts " +
      "WHERE qty > 2 GROUP BY grp", rng)
    // boundary violation: qty >= 3 admits qty = 3, outside qty > 3
    onBase("SELECT grp, count(*) AS c FROM mvi.facts " +
      "WHERE qty >= 3 GROUP BY grp", rng)
    // IN-list straddling the bound
    onBase("SELECT grp, count(*) AS c FROM mvi.facts " +
      "WHERE qty IN (2, 5) GROUP BY grp", rng)
    // point below the bound
    onBase("SELECT grp, count(*) AS c FROM mvi.facts " +
      "WHERE qty = 3 GROUP BY grp", rng)
    // IN NOT a subset: r1 is outside the slice
    onBase("SELECT grp, count(*) AS c FROM mvi.facts " +
      "WHERE region IN ('r0', 'r1') GROUP BY grp", set)
    // OR straddling the slice, and OR across DIFFERENT columns
    onBase("SELECT grp, count(*) AS c FROM mvi.facts " +
      "WHERE region = 'r0' OR region = 'r1' GROUP BY grp", set)
    onBase("SELECT grp, count(*) AS c FROM mvi.facts " +
      "WHERE region = 'r0' OR grp = 'g1' GROUP BY grp", set)
    // different column entirely
    onBase("SELECT grp, count(*) AS c FROM mvi.facts " +
      "WHERE grp = 'g1' GROUP BY grp", set)
  }

  test("MONOTONE-TRUNC implication (r17): a bare-column bound over a " +
    "date_trunc-sliced store serves when the literal sits ON a " +
    "bucket boundary and implies the slice — `ts >= aligned-Q` and " +
    "`ts < aligned-Q` rewrite to the stored trunc key; misaligned, " +
    "wider, and `<=` bounds stay on base; a narrower trunc-subject " +
    "conjunct subsumes too") {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    val root = Files.createTempDirectory("rurwtt").toString
    val dir = s"$root/facts"
    val facts = (1 to 600).map { i =>
      val day = 1 + (i % 28)
      val hour = i % 24
      (i.toLong, s"g${i % 4}",
        java.sql.Timestamp.valueOf(f"2024-03-$day%02d $hour%02d:15:00"),
        (i % 7).toLong)
    }.toDF("id", "grp", "ts", "v")
    Snapshot.createOrReplace(facts, dir, keepVersions = 2)
    store.registerSnapshot("mvtt", "facts", dir)
    // the time-sliced dashboard MV: day-bucketed, last-weeks slice
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mvtt.facts', name => 'mvtt.recent',
      group_by => 'grp,oday', sum_cols => 'v',
      group_exprs => 'oday:=date_trunc(''day'', ts)',
      where =>
        'date_trunc(''day'', ts) >= TIMESTAMP ''2024-03-10 00:00:00''')
      """).collect()
    val ru = new TableStore(spark).properties("mvtt", "recent")(
      "graft.rollup.dir")
    def served(sql: String): Unit = {
      val df = spark.sql(sql)
      assert(scans(df, ru) && !scans(df, dir),
        s"must serve the time-sliced store: $sql")
      assert(df.collect().map(_.toSeq).toSet == baseline(sql),
        s"rewrite changed the answer of: $sql")
    }
    def onBase(sql: String): Unit = {
      val df = spark.sql(sql)
      assert(!scans(df, ru) && scans(df, dir),
        s"must stay on base: $sql")
      assert(df.collect().map(_.toSeq).toSet == baseline(sql))
    }
    def q(pred: String) = "SELECT grp, count(*) AS c, sum(v) AS s " +
      s"FROM mvtt.facts WHERE $pred GROUP BY grp"

    // aligned bare bound inside the slice: ts >= Q ⟺ oday >= Q
    served(q("ts >= TIMESTAMP '2024-03-12 00:00:00'"))
    // the slice boundary itself
    served(q("ts >= TIMESTAMP '2024-03-10 00:00:00'"))
    // aligned window: `<` keeps whole buckets below Q
    served(q("ts >= TIMESTAMP '2024-03-12 00:00:00' AND " +
      "ts < TIMESTAMP '2024-03-20 00:00:00'"))
    // a narrower trunc-subject conjunct subsumes the stored one
    served(q("date_trunc('day', ts) >= " +
      "TIMESTAMP '2024-03-12 00:00:00'"))
    // …and a misaligned trunc-subject bound still serves: gold keys
    // are bucket starts, so oday >= X re-applies exactly
    served(q("date_trunc('day', ts) >= " +
      "TIMESTAMP '2024-03-12 06:00:00'"))

    // MISALIGNED bare bound: implies the slice but cuts bucket 12
    // mid-day — gold rows aggregate whole buckets; must refuse
    onBase(q("ts >= TIMESTAMP '2024-03-12 06:00:00'"))
    // wider than the slice
    onBase(q("ts >= TIMESTAMP '2024-03-08 00:00:00'"))
    // `<=` admits exactly the bucket-start instant of day 20 — the
    // cut-bucket shape even on an aligned literal
    onBase(q("ts >= TIMESTAMP '2024-03-12 00:00:00' AND " +
      "ts <= TIMESTAMP '2024-03-20 00:00:00'"))
    // upper bound alone never implies the lower-bounded slice
    onBase(q("ts < TIMESTAMP '2024-03-20 00:00:00'"))

    // CROSS-UNIT: a WEEK-trunc bound over the DAY-sliced store — the
    // day lattice contains the week boundaries, so week(ts) >= W
    // (W = Mon 2024-03-11, inside the slice) implies day(ts) >= W,
    // and the week bound re-maps to the day key exactly (W is
    // aligned to both units)
    served(q("date_trunc('week', ts) >= " +
      "TIMESTAMP '2024-03-11 00:00:00'"))
    // a week bound BEFORE the slice start admits day buckets the
    // store never saw
    onBase(q("date_trunc('week', ts) >= " +
      "TIMESTAMP '2024-03-04 00:00:00'"))
  }

  test("CROSS-UNIT trunc implication over a MONTH-sliced store: a " +
    "finer day-trunc (or bare) bound aligned to both units serves — " +
    "day(ts) >= Apr-1 implies month(ts) >= Apr-1 — while bounds " +
    "inside a month bucket, or clearing only the finer alignment, " +
    "stay on base") {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    val root = Files.createTempDirectory("rurwxu").toString
    val dir = s"$root/facts"
    // two months of data, hours spread across the day
    val facts = (1 to 600).map { i =>
      val day = i % 56
      val date = java.time.LocalDateTime.of(2024, 3, 1, i % 24, 15)
        .plusDays(day)
      (i.toLong, s"g${i % 4}", java.sql.Timestamp.valueOf(date),
        (i % 7).toLong)
    }.toDF("id", "grp", "ts", "v")
    Snapshot.createOrReplace(facts, dir, keepVersions = 2)
    store.registerSnapshot("mvxu", "facts", dir)
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mvxu.facts', name => 'mvxu.recent',
      group_by => 'grp,omonth', sum_cols => 'v',
      group_exprs => 'omonth:=date_trunc(''month'', ts)',
      where =>
        'date_trunc(''month'', ts) >= TIMESTAMP ''2024-04-01 00:00:00''')
      """).collect()
    val ru = new TableStore(spark).properties("mvxu", "recent")(
      "graft.rollup.dir")
    def served(sql: String): Unit = {
      val df = spark.sql(sql)
      assert(scans(df, ru) && !scans(df, dir),
        s"must serve the month-sliced store: $sql")
      assert(df.collect().map(_.toSeq).toSet == baseline(sql),
        s"rewrite changed the answer of: $sql")
    }
    def onBase(sql: String): Unit = {
      val df = spark.sql(sql)
      assert(!scans(df, ru) && scans(df, dir), s"must stay on base: $sql")
      assert(df.collect().map(_.toSeq).toSet == baseline(sql))
    }
    def q(pred: String) = "SELECT grp, count(*) AS c, sum(v) AS s " +
      s"FROM mvxu.facts WHERE $pred GROUP BY grp"
    // finer day-trunc bound, aligned to the month too: serves
    served(q("date_trunc('day', ts) >= " +
      "TIMESTAMP '2024-04-01 00:00:00'"))
    // bare bound aligned to the month: serves
    served(q("ts >= TIMESTAMP '2024-04-01 00:00:00'"))
    // day-aligned but MID-month: cuts the April bucket — base
    onBase(q("date_trunc('day', ts) >= " +
      "TIMESTAMP '2024-04-05 00:00:00'"))
    // before the slice start — base
    onBase(q("date_trunc('day', ts) >= " +
      "TIMESTAMP '2024-03-20 00:00:00'"))

    // SEEDED answer-equivalence sweep: random units × random (day,
    // hour) bounds — whatever the serving decision, the answer must
    // be bit-identical to the rewrite-off baseline and never scan
    // gold AND base (the fuzz makes no serving prediction, so it
    // cannot mirror a law bug — it only catches unsound serves)
    val rnd = new scala.util.Random(20260818L)
    var servedN = 0
    (1 to 30).foreach { _ =>
      val month = 3 + rnd.nextInt(2)
      val day = 1 + rnd.nextInt(25)
      val hh = if (rnd.nextBoolean()) 0 else rnd.nextInt(24)
      val lit = f"TIMESTAMP '2024-$month%02d-$day%02d $hh%02d:00:00'"
      val subj = rnd.nextInt(4) match {
        case 0 => "ts"
        case 1 => "date_trunc('day', ts)"
        case 2 => "date_trunc('week', ts)"
        case _ => "date_trunc('month', ts)"
      }
      val op = if (rnd.nextBoolean()) ">=" else "<"
      val sql = q(s"$subj $op $lit")
      val df = spark.sql(sql)
      val (g, b) = (scans(df, ru), scans(df, dir))
      assert(!(g && b), s"gold AND base scanned: $sql")
      if (g) servedN += 1
      assert(df.collect().map(_.toSeq).toSet == baseline(sql),
        s"rewrite changed the answer of: $sql")
    }
    // the deterministic pins above prove serving; the sweep only has
    // to prove SAFETY, so no serving-count floor — but log it so a
    // dead seed is visible
    info(s"cross-unit sweep served $servedN/30")
  }

  test("SEEDED RANDOMIZED implication: random range/point/IN " +
    "predicates over a partial store answer bit-identically with " +
    "the rewrite on and off, serve exactly when the predicate " +
    "implies the slice, and never scan gold AND base") {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    val root = Files.createTempDirectory("rurwimpf").toString
    val dir = s"$root/facts"
    val facts = (1 to 600).map(i => (i.toLong, s"g${i % 4}",
      (i % 13).toLong, (i % 7).toLong))
      .toDF("id", "grp", "qty", "amount")
    Snapshot.createOrReplace(facts, dir, keepVersions = 2)
    store.registerSnapshot("mvf", "facts", dir)
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mvf.facts', name => 'mvf.slice',
      group_by => 'grp,qty', sum_cols => 'amount',
      where => 'qty >= 4')""").collect()
    val ru = new TableStore(spark).properties("mvf", "slice")(
      "graft.rollup.dir")
    val rnd = new scala.util.Random(20260816L)
    var servedN = 0
    (1 to 60).foreach { _ =>
      val x = rnd.nextInt(13)
      val (pred, impliesSlice) = rnd.nextInt(6) match {
        case 0 => (s"qty > $x", x >= 3)
        case 1 => (s"qty >= $x", x >= 4)
        case 2 => (s"qty = $x", x >= 4)
        case 3 =>
          val y = rnd.nextInt(13)
          (s"(qty = $x OR qty = $y)", x >= 4 && y >= 4)
        case 4 =>
          val vs = Seq.fill(1 + rnd.nextInt(2))(rnd.nextInt(13))
          (s"(qty = $x OR qty IN (${vs.mkString(", ")}))",
            x >= 4 && vs.forall(_ >= 4))
        case _ =>
          val vs = Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(13))
          (s"qty IN (${vs.mkString(", ")})", vs.forall(_ >= 4))
      }
      val q = s"SELECT grp, count(*) AS c, sum(amount) AS s " +
        s"FROM mvf.facts WHERE $pred GROUP BY grp"
      val df = spark.sql(q)
      val fromGold = scans(df, ru)
      assert(fromGold == impliesSlice,
        s"serving must track implication exactly: $q " +
          s"(served=$fromGold, implies=$impliesSlice)")
      if (fromGold) { servedN += 1
        assert(!scans(df, dir), s"gold AND base scanned: $q") }
      assert(df.collect().map(_.toSeq).toSet == baseline(q),
        s"rewrite changed the answer of: $q")
    }
    assert(servedN >= 15 && servedN <= 55,
      s"sanity: the seed must exercise both directions ($servedN/60)")
  }

  test("an IS NOT NULL slice is satisfied by ANY comparison on the " +
    "key (a true comparison rejects a null subject) — the " +
    "hand-written `WHERE key IS NOT NULL` partial MV serves narrower " +
    "range/IN/point queries without repeating the predicate; an " +
    "unrelated-column query stays on base") {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    val root = Files.createTempDirectory("rurwnn").toString
    val dir = s"$root/facts"
    val facts = (1 to 600).map(i => (i.toLong, s"g${i % 4}",
      if (i % 11 == 0) None else Some((i % 13).toLong),
      (i % 7).toLong)).toDF("id", "grp", "qty", "amount")
    Snapshot.createOrReplace(facts, dir, keepVersions = 2)
    store.registerSnapshot("mvnn", "facts", dir)
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mvnn.facts', name => 'mvnn.nn',
      group_by => 'grp,qty', sum_cols => 'amount',
      where => 'qty IS NOT NULL')""").collect()
    val ru = new TableStore(spark).properties("mvnn", "nn")(
      "graft.rollup.dir")
    def served(sql: String): Unit = {
      val df = spark.sql(sql)
      assert(scans(df, ru) && !scans(df, dir),
        s"must serve the IS-NOT-NULL store: $sql")
      assert(df.collect().map(_.toSeq).toSet == baseline(sql),
        s"rewrite changed the answer of: $sql")
    }
    def onBase(sql: String): Unit = {
      val df = spark.sql(sql)
      assert(!scans(df, ru) && scans(df, dir), s"must stay on base: $sql")
      assert(df.collect().map(_.toSeq).toSet == baseline(sql))
    }
    def q(pred: String) = "SELECT grp, count(*) AS c, " +
      s"sum(amount) AS s FROM mvnn.facts WHERE $pred GROUP BY grp"
    served(q("qty > 5"))
    served(q("qty IN (4, 9)"))
    served(q("qty = 7 AND grp = 'g1'"))
    served(q("qty IS NOT NULL")) // verbatim — consumed
    // a filter that does not constrain qty admits the null-qty rows
    // the store never saw
    onBase(q("grp = 'g1'"))
  }

  test("a DST session zone REFUSES the monotone-trunc serve: sub-day " +
    "truncation is not monotone across fall-back (repeated local " +
    "times), so the bare-bound lift must not fire — answers stay " +
    "correct on the base scan") {
    val tzKey = "spark.sql.session.timeZone"
    val prevTz = spark.conf.get(tzKey)
    spark.conf.set(tzKey, "America/Los_Angeles")
    try {
      TableStore.reset(spark)
      val store = new TableStore(spark)
      val root = Files.createTempDirectory("rurwdst").toString
      val dir = s"$root/facts"
      val facts = (1 to 300).map { i =>
        (i.toLong, s"g${i % 4}",
          java.sql.Timestamp.valueOf(
            f"2024-03-${1 + (i % 28)}%02d ${i % 24}%02d:15:00"),
          (i % 7).toLong)
      }.toDF("id", "grp", "ts", "v")
      Snapshot.createOrReplace(facts, dir, keepVersions = 2)
      store.registerSnapshot("mvdst", "facts", dir)
      spark.sql("""CALL iceberg.system.create_rollup(
        table => 'mvdst.facts', name => 'mvdst.recent',
        group_by => 'grp,oday', sum_cols => 'v',
        group_exprs => 'oday:=date_trunc(''day'', ts)',
        where => 'date_trunc(''day'', ts) >= TIMESTAMP ''2024-03-10 00:00:00''')
        """).collect()
      val ru = new TableStore(spark).properties("mvdst", "recent")(
        "graft.rollup.dir")
      val q = "SELECT grp, count(*) AS c, sum(v) AS s " +
        "FROM mvdst.facts WHERE ts >= TIMESTAMP " +
        "'2024-03-12 00:00:00' GROUP BY grp"
      val df = spark.sql(q)
      assert(!scans(df, ru) && scans(df, dir),
        "a DST-zone trunc slice must refuse the bare-bound serve")
      assert(df.collect().map(_.toSeq).toSet == baseline(q))
    } finally spark.conf.set(tzKey, prevTz)
  }

  test("SEEDED RANDOMIZED trunc implication: random bare- and " +
    "trunc-subject bounds over a time-sliced store serve exactly " +
    "when aligned-and-implying, answer bit-identically either way") {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    val root = Files.createTempDirectory("rurwttf").toString
    val dir = s"$root/facts"
    val facts = (1 to 600).map { i =>
      val day = 1 + (i % 28)
      val hour = i % 24
      (i.toLong, s"g${i % 4}",
        java.sql.Timestamp.valueOf(f"2024-03-$day%02d $hour%02d:45:00"),
        (i % 7).toLong)
    }.toDF("id", "grp", "ts", "v")
    Snapshot.createOrReplace(facts, dir, keepVersions = 2)
    store.registerSnapshot("mvtf", "facts", dir)
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mvtf.facts', name => 'mvtf.recent',
      group_by => 'grp,oday', sum_cols => 'v',
      group_exprs => 'oday:=date_trunc(''day'', ts)',
      where =>
        'date_trunc(''day'', ts) >= TIMESTAMP ''2024-03-10 00:00:00''')
      """).collect()
    val ru = new TableStore(spark).properties("mvtf", "recent")(
      "graft.rollup.dir")
    val rnd = new scala.util.Random(20260817L)
    var servedN = 0
    (1 to 40).foreach { _ =>
      val day = 1 + rnd.nextInt(28)
      val hh = if (rnd.nextBoolean()) 0 else rnd.nextInt(24)
      val lit = f"TIMESTAMP '2024-03-$day%02d $hh%02d:00:00'"
      val (pred, expectServe) = rnd.nextInt(3) match {
        // bare bound: serves iff bucket-aligned AND implying
        case 0 => (s"ts >= $lit", hh == 0 && day >= 10)
        // trunc subject: gold keys re-apply any bound exactly, so
        // serving tracks implication alone (X >= slice start)
        case 1 => (s"date_trunc('day', ts) >= $lit",
          day > 10 || (day == 10))
        // aligned window: both ends must remap, lower must imply
        case _ =>
          val d2 = math.min(day + 1 + rnd.nextInt(10), 28)
          (f"ts >= $lit%s AND ts < TIMESTAMP '2024-03-$d2%02d 00:00:00'",
            hh == 0 && day >= 10)
      }
      val q = s"SELECT grp, count(*) AS c, sum(v) AS s " +
        s"FROM mvtf.facts WHERE $pred GROUP BY grp"
      val df = spark.sql(q)
      val fromGold = scans(df, ru)
      assert(fromGold == expectServe,
        s"serving must track aligned implication exactly: $q " +
          s"(served=$fromGold, expected=$expectServe)")
      if (fromGold) { servedN += 1
        assert(!scans(df, dir), s"gold AND base scanned: $q") }
      assert(df.collect().map(_.toSeq).toSet == baseline(q),
        s"rewrite changed the answer of: $q")
    }
    assert(servedN >= 8 && servedN <= 35,
      s"sanity: the seed must exercise both directions ($servedN/40)")
  }

  /** Does the OPTIMIZED plan read any BASE DATA file of `dir` —
    * i.e. a leaf under the table dir that is NOT a `_mor` window
    * sidecar? The compensation pin: a stale-served query may read
    * the window sidecars but never the base's data files. */
  private def scansBaseData(df: DataFrame, dir: String): Boolean =
    df.queryExecution.optimizedPlan.collectLeaves().exists {
      case l: LogicalRelation => l.relation match {
        case f: HadoopFsRelation =>
          f.location.rootPaths.map(_.toUri.getPath).exists(p =>
            (p == dir || p.startsWith(s"$dir/")) &&
              !p.contains("/_mor/"))
        case _ => false
      }
      case _ => false
    }

  test("a STALE rollup serves by COMPENSATION — store ⊎ signed " +
    "window delta, reading the gold store and the window sidecars " +
    "but never the base data files; min/max ride an append-only " +
    "window AND (r19) delete-bearing windows via the affected-group " +
    "arm; an EQUALITY window (the default CDC MERGE shape) serves " +
    "by the affected-group form with min/max exact; the staleness " +
    "budget and the session flag fall back to the base; refresh " +
    "re-arms the plain store serve") {
    val (dir, ru) = fixture()
    val q = "SELECT grp, count(*) AS c FROM mv.facts GROUP BY grp"
    assert(scans(spark.sql(q), ru))
    // base moves by an APPEND → the very same query now serves the
    // compensated store: gold + the window sidecar, zero base data
    Snapshot.morCommit(spark, dir, deletes = None,
      appends = Some(Seq((9999L, "g1", "r1", 5L, 5.0))
        .toDF("id", "grp", "region", "qty", "amount")),
      operation = "append")
    val comp = spark.sql(q)
    assert(scans(comp, ru),
      "a priceably-stale rollup must serve by compensation")
    assert(!scansBaseData(comp, dir),
      "the compensated serve must never read base data files")
    assert(comp.collect().map(_.toSeq).toSet == baseline(q),
      "the compensated answer must equal the live base recompute")
    // sums, non-null counts, avg — and, over an APPEND-ONLY window,
    // min/max — all compensate
    val qAll = """SELECT grp, count(*) AS c, sum(qty) AS s,
      count(qty) AS cq, avg(qty) AS a, min(amount) AS mn,
      max(amount) AS mx FROM mv.facts GROUP BY grp"""
    val compAll = spark.sql(qAll)
    assert(scans(compAll, ru) && !scansBaseData(compAll, dir),
      "min/max must compensate over an append-only window")
    assert(compAll.collect().map(_.toSeq).toSet == baseline(qAll))
    // staleness budget 0 disables compensation → base plan
    spark.conf.set("spark.graft.mv.maxStalenessCommits", "0")
    try {
      val off = spark.sql(q)
      assert(!scans(off, ru) && scansBaseData(off, dir),
        "maxStalenessCommits=0 must force the base plan")
      assert(off.collect().map(_.toSeq).toSet == baseline(q))
    } finally
      spark.conf.unset("spark.graft.mv.maxStalenessCommits")
    // a POSITION-delete window still compensates the subtractable
    // set (counts/sums) via the signed arm; min/max — the deleted
    // row may have been the extremum — route through the
    // AFFECTED-GROUP arm since r19 (per-group full recompute), so
    // they serve too instead of falling to base
    val victim = Snapshot.readLineage(spark, dir)
      .filter(col("id") === 1L).localCheckpoint()
    Snapshot.morCommit(spark, dir, deletes = None, appends = None,
      operation = "delete", posDeletes = Some(victim))
    val compDel = spark.sql(q)
    assert(scans(compDel, ru),
      "a position-delete window must still compensate counts")
    assert(compDel.collect().map(_.toSeq).toSet == baseline(q))
    val mmDel = spark.sql(
      "SELECT grp, min(amount) AS mn FROM mv.facts GROUP BY grp")
    assert(scans(mmDel, ru),
      "min/max must serve a position-delete window through the " +
        "affected-group arm (r19)")
    assert(mmDel.collect().map(_.toSeq).toSet == baseline(
      "SELECT grp, min(amount) AS mn FROM mv.facts GROUP BY grp"))
    // an EQUALITY-delete window — the engine's DEFAULT delete mode,
    // the CDC MERGE shape — compensates by the AFFECTED-GROUP form:
    // untouched groups read from the store (anti-join), touched
    // groups recompute from the pruned live base; min/max are EXACT
    // here (per-group full recompute), unlike the signed arm above
    Snapshot.morCommit(spark, dir,
      deletes = Some(Seq((9999L, "g1", "r1", 5L, 5.0))
        .toDF("id", "grp", "region", "qty", "amount")),
      appends = None, operation = "delete")
    val eq = spark.sql(q)
    assert(scans(eq, ru),
      "an equality window must serve by affected-group compensation")
    assert(eq.collect().map(_.toSeq).toSet == baseline(q))
    val eqAll = spark.sql(qAll)
    assert(scans(eqAll, ru),
      "min/max must serve through the affected-group arm")
    assert(eqAll.collect().map(_.toSeq).toSet == baseline(qAll))
    // refresh → fresh again → the PLAIN store serves (no window read)
    spark.sql("CALL iceberg.system.refresh_rollup(table => 'mv.gold')")
      .collect()
    val fresh = spark.sql(q)
    assert(scans(fresh, ru) && !scansBaseData(fresh, dir))
    assert(fresh.collect().map(_.toSeq).toSet == baseline(q))

    spark.conf.set("spark.graft.rollup.rewrite.enabled", "false")
    try assert(!scans(spark.sql(q), ru),
      "the session flag must force the base plan")
    finally
      spark.conf.set("spark.graft.rollup.rewrite.enabled", "true")
  }

  test("GROUP-column aggregates derive from the gold key columns: " +
    "count(DISTINCT g), min/max(g), count(g) — other distinct shapes " +
    "never rewrite") {
    val (dir, ru) = fixture()
    val q = """SELECT grp, count(DISTINCT region) AS dr,
      min(region) AS mnr, max(region) AS mxr, count(region) AS cr,
      count(*) AS c FROM mv.facts GROUP BY grp"""
    val df = spark.sql(q)
    assert(scans(df, ru) && !scans(df, dir),
      "group-column aggregates must serve from the gold store")
    assert(df.collect().map(_.toSeq).toSet == baseline(q))
    // the GLOBAL cardinality query — the dashboard count-distinct
    val g = "SELECT count(DISTINCT grp) AS n FROM mv.facts"
    val gf = spark.sql(g)
    assert(scans(gf, ru) && !scans(gf, dir))
    assert(gf.collect().map(_.toSeq).toSet == baseline(g))
    // distinct over a NON-key column is not derivable
    val bad = spark.sql(
      "SELECT grp, count(DISTINCT qty) AS n FROM mv.facts GROUP BY grp")
    assert(!scans(bad, ru) && scans(bad, dir))
    // sum(DISTINCT g) is not a served shape either
    val sd = spark.sql(
      "SELECT grp, sum(DISTINCT qty) AS n FROM mv.facts GROUP BY grp")
    assert(!scans(sd, ru) && scans(sd, dir))
    // HAVING rides for free: the filter sits ABOVE the rewritten
    // aggregate, so the rule serves the inner Aggregate unchanged
    val hq = """SELECT grp, count(*) AS c FROM mv.facts GROUP BY grp
      HAVING count(*) > 90"""
    val hf = spark.sql(hq)
    assert(scans(hf, ru) && !scans(hf, dir),
      "HAVING must not block the rewrite of the aggregate beneath it")
    assert(hf.collect().map(_.toSeq).toSet == baseline(hq))
  }

  test("EXPRESSION group keys rewrite: GROUP BY the same expression " +
    "re-targets the gold derived key; a different expression stays " +
    "on base; filters and count(DISTINCT) over the key ride") {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    val root = Files.createTempDirectory("rurwe").toString
    val dir = s"$root/facts"
    val facts = (1 to 400).map(i => (i.toLong, s"g${i % 4}",
      (i % 13).toLong)).toDF("id", "grp", "qty")
    Snapshot.createOrReplace(facts, dir, keepVersions = 2)
    store.registerSnapshot("mve", "facts", dir)
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mve.facts', name => 'mve.gold',
      group_by => 'bucket,grp', sum_cols => 'qty',
      group_exprs => 'bucket:=id % 10')""").collect()
    val ru = new TableStore(spark).properties("mve", "gold")(
      "graft.rollup.dir")
    val q = """SELECT id % 10 AS bucket, count(*) AS c, sum(qty) AS s
      FROM mve.facts GROUP BY id % 10"""
    val df = spark.sql(q)
    assert(scans(df, ru) && !scans(df, dir),
      "grouping by the stored expression must read the gold")
    assert(df.collect().map(_.toSeq).toSet == baseline(q))
    // a filter over the expression key rides the rewrite
    val fq = """SELECT grp, count(*) AS c FROM mve.facts
      WHERE id % 10 = 3 GROUP BY grp"""
    val ff = spark.sql(fq)
    assert(scans(ff, ru) && !scans(ff, dir),
      "a filter over the expression key must ride the rewrite")
    assert(ff.collect().map(_.toSeq).toSet == baseline(fq))
    // count(DISTINCT <expression key>) derives from the gold key
    val dq = "SELECT count(DISTINCT id % 10) AS n FROM mve.facts"
    val dfq = spark.sql(dq)
    assert(scans(dfq, ru) && !scans(dfq, dir))
    assert(dfq.collect().map(_.toSeq).toSet == baseline(dq))
    // a DIFFERENT expression is not the stored key
    val bad = spark.sql(
      "SELECT id % 7 AS b, count(*) AS c FROM mve.facts GROUP BY id % 7")
    assert(!scans(bad, ru) && scans(bad, dir))
  }

  test("EXPRESSION measures (TPC-H Q1 shape): sum over a derived " +
    "measure rewrites via the exact-decimal idiom; the raw double " +
    "sum of the same expression stays on base") {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    val root = Files.createTempDirectory("rurwm").toString
    val dir = s"$root/facts"
    val facts = (1 to 400).map(i => (i.toLong, s"g${i % 4}",
      (i % 13).toDouble, (i % 7) / 10.0)).toDF(
      "id", "grp", "price", "disc")
    Snapshot.createOrReplace(facts, dir, keepVersions = 2)
    store.registerSnapshot("mvm", "facts", dir)
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mvm.facts', name => 'mvm.gold',
      group_by => 'grp', sum_cols => 'revenue',
      group_exprs => 'revenue:=price * (1 - disc)')""").collect()
    val ru = new TableStore(spark).properties("mvm", "gold")(
      "graft.rollup.dir")
    val q = """SELECT grp, count(*) AS c,
      CAST(sum(CAST(price * (1 - disc) AS DECIMAL(27,6))) AS DOUBLE)
        AS revenue
      FROM mvm.facts GROUP BY grp"""
    val df = spark.sql(q)
    assert(scans(df, ru) && !scans(df, dir),
      "the exact-decimal sum of the derived measure must read gold")
    assert(df.collect().map(_.toSeq).toSet == baseline(q))
    // count over the derived measure = its maintained non-null count
    val cq = """SELECT grp, count(price * (1 - disc)) AS c
      FROM mvm.facts GROUP BY grp"""
    val cf = spark.sql(cq)
    assert(scans(cf, ru) && !scans(cf, dir))
    assert(cf.collect().map(_.toSeq).toSet == baseline(cq))
    // the raw double sum is order-dependent — never rewritten
    val raw = spark.sql("""SELECT grp, sum(price * (1 - disc)) AS r
      FROM mvm.facts GROUP BY grp""")
    assert(!scans(raw, ru) && scans(raw, dir))
    // min/max over a derived measure ride the same mechanism (the
    // alias listed in min_max_cols)
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mvm.facts', name => 'mvm.gold2',
      group_by => 'grp', sum_cols => 'revenue',
      min_max_cols => 'revenue', rollup_dir => '""" + root +
      """/ru2', group_exprs => 'revenue:=price * (1 - disc)')""")
      .collect()
    val ru2 = new TableStore(spark).properties("mvm", "gold2")(
      "graft.rollup.dir")
    val mq = """SELECT grp, min(price * (1 - disc)) AS mn,
      max(price * (1 - disc)) AS mx FROM mvm.facts GROUP BY grp"""
    val mf = spark.sql(mq)
    assert(scans(mf, ru2) && !scans(mf, dir),
      "min/max over the derived measure must read gold")
    assert(mf.collect().map(_.toSeq).toSet == baseline(mq))
  }

  test("JOIN rollup rewrite: a star-join aggregate re-targets the " +
    "gold store; the bare-fact aggregate and a moved dim do not") {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    val root = Files.createTempDirectory("rurwj").toString
    val (fdir, ddir) = (s"$root/fact", s"$root/dim")
    val facts = (1 to 400).map(i =>
      (i.toLong, (i % 10).toLong, (i % 13).toLong))
      .toDF("id", "cust_id", "qty")
    val dim = (0 until 10).map(i => (i.toLong, s"seg${i % 3}"))
      .toDF("cust_key", "segment")
    Snapshot.createOrReplace(facts, fdir, keepVersions = 2)
    Snapshot.createOrReplace(dim, ddir, keepVersions = 2)
    store.registerSnapshot("mvj", "facts", fdir)
    store.registerSnapshot("mvj", "cust", ddir)
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mvj.facts', name => 'mvj.gold',
      group_by => 'segment', sum_cols => 'qty',
      joins => 'mvj.cust:cust_id=cust_key')""").collect()
    val ru = new TableStore(spark).properties("mvj", "gold")(
      "graft.rollup.dir")
    val q = """SELECT segment, count(*) AS c, sum(qty) AS s
      FROM mvj.facts f JOIN mvj.cust c ON f.cust_id = c.cust_key
      GROUP BY segment"""
    val df = spark.sql(q)
    assert(scans(df, ru) && !scans(df, fdir) && !scans(df, ddir),
      "the star-join aggregate must read ONLY the gold store")
    assert(df.collect().map(_.toSeq).toSet == baseline(q))
    // the REVERSED equality must canonicalize to the same join
    val qr = """SELECT segment, count(*) AS c
      FROM mvj.facts f JOIN mvj.cust c ON c.cust_key = f.cust_id
      GROUP BY segment"""
    val dfr = spark.sql(qr)
    assert(scans(dfr, ru),
      "ON a = b and ON b = a are the same join")
    assert(dfr.collect().map(_.toSeq).toSet == baseline(qr))
    // the bare-fact aggregate is a DIFFERENT plan — never served by
    // the join store (its groups count joined multiplicity)
    val bare = spark.sql(
      "SELECT cust_id, count(*) AS c FROM mvj.facts GROUP BY cust_id")
    assert(!scans(bare, ru) && scans(bare, fdir))
    // a moved dim COMPENSATES since r19 (the dim-side affected-group
    // arm): the query still reads the gold store — plus the dim
    // window and the touched slice of the fact — and answers exactly
    // the live recompute. (99L matches no fact row, so the touched
    // set is empty — the serve is pure store.)
    Snapshot.morCommit(spark, ddir, deletes = None,
      appends = Some(Seq((99L, "seg9")).toDF("cust_key", "segment")),
      operation = "append")
    val stale = spark.sql(q)
    assert(scans(stale, ru),
      "a moved dim must serve by dim-window compensation (r19)")
    assert(stale.collect().map(_.toSeq).toSet == baseline(q))
    // a dim append whose key HITS fact rows re-segments them: the
    // compensated serve must still read the store and still equal
    // the live recompute (cust 3 moves seg0 → seg9)
    Snapshot.morCommit(spark, ddir,
      deletes = Some(Seq((3L, "seg0")).toDF("cust_key", "segment")),
      appends = Some(Seq((3L, "seg9")).toDF("cust_key", "segment")),
      operation = "merge")
    val reseg = spark.sql(q)
    assert(scans(reseg, ru),
      "a re-segmenting dim MERGE must serve by compensation")
    assert(reseg.collect().map(_.toSeq).toSet == baseline(q))
    // budget 0 still falls back to the base plan
    spark.conf.set("spark.graft.mv.maxStalenessCommits", "0")
    try {
      val off = spark.sql(q)
      assert(!scans(off, ru) && scans(off, fdir),
        "maxStalenessCommits=0 must force the base plan")
      assert(off.collect().map(_.toSeq).toSet == baseline(q))
    } finally
      spark.conf.unset("spark.graft.mv.maxStalenessCommits")
  }

  test("maintenance RACING stale-serve refuses soundly: erase and " +
    "expire_snapshots change the file layout under PRESERVED version " +
    "numbers — invisible to version-keyed signatures — so a purge " +
    "mid-staleness must evict the cached compensated plan (never a " +
    "dangling file listing) and refuse compensation to the base " +
    "plan; REFRESH re-prices under the post-purge layout and re-arms") {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    val root = Files.createTempDirectory("rurwmx").toString
    val dir = s"$root/facts"
    val facts = (1 to 400).map(i =>
      (i.toLong, s"g${i % 4}", (i % 13).toLong))
      .toDF("id", "grp", "qty")
    Snapshot.createOrReplace(facts, dir, keepVersions = 4)
    // a second replace parks v1 in history: the expire below needs a
    // victim dir (one the compensation window itself never reads —
    // the refusal is CONSERVATIVE, pricing cannot prove a purge
    // irrelevant)
    Snapshot.createOrReplace(facts, dir, keepVersions = 4)
    store.registerSnapshot("mx", "facts", dir)
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mx.facts', name => 'mx.gold',
      group_by => 'grp', sum_cols => 'qty')""").collect()
    val ru = new TableStore(spark).properties("mx", "gold")(
      "graft.rollup.dir")
    val q =
      "SELECT grp, count(*) AS c, sum(qty) AS s FROM mx.facts GROUP BY grp"
    def goStale(id: Long): Unit =
      Snapshot.morCommit(spark, dir, deletes = None,
        appends = Some(Seq((id, "g1", 5L)).toDF("id", "grp", "qty")),
        operation = "append")
    goStale(9001L)
    val comp = spark.sql(q)
    assert(scans(comp, ru), "the stale store must serve by compensation")
    assert(comp.collect().map(_.toSeq).toSet == baseline(q))

    // RACE 1: expire deletes the historical dir — versions unchanged,
    // the purge epoch moves → cache out, compensation refuses → base
    assert(Snapshot.expireSnapshots(dir, 0).nonEmpty,
      "the fixture must give expire a victim")
    val afterExpire = spark.sql(q)
    assert(!scans(afterExpire, ru),
      "an expire mid-staleness must refuse compensation (base plan)")
    assert(afterExpire.collect().map(_.toSeq).toSet == baseline(q))
    assert(Rollup.refresh(spark, dir, ru) > 0L,
      "refresh must still price the append window after the expire")
    val rearmed = spark.sql(q)
    assert(scans(rearmed, ru), "refresh must re-arm the store serve")
    assert(rearmed.collect().map(_.toSeq).toSet == baseline(q))

    // RACE 2: erase rewrites EVERY file in place (new names, same
    // version numbers) — the pre-erase cached compensated plan pins
    // the old listing and must not execute. The subject predicate
    // matches nothing, isolating the race mechanics from erase's
    // documented rebuild-to-forget store semantics.
    goStale(9002L)
    val comp2 = spark.sql(q)
    assert(scans(comp2, ru))
    assert(comp2.collect().map(_.toSeq).toSet == baseline(q))
    Snapshot.erase(spark, dir, col("id") === -1L)
    val afterErase = spark.sql(q)
    assert(!scans(afterErase, ru),
      "an erase mid-staleness must refuse compensation (base plan)")
    assert(afterErase.collect().map(_.toSeq).toSet == baseline(q))
    assert(Rollup.refresh(spark, dir, ru) > 0L)
    val again = spark.sql(q)
    assert(scans(again, ru))
    assert(again.collect().map(_.toSeq).toSet == baseline(q))
  }

  test("HAVING rides the rewrite: the filter sits ABOVE the " +
    "aggregate, so the served gold aggregate feeds it unchanged — " +
    "same answer, gold-only scan") {
    val (dir, ruDir) = fixture()
    val q = """SELECT grp, region, count(*) AS c, sum(qty) AS q
      FROM mv.facts GROUP BY grp, region HAVING sum(qty) > 250"""
    val df = spark.sql(q)
    assert(scans(df, ruDir) && !scans(df, dir),
      "a HAVING query over a derivable aggregate must serve from gold")
    assert(df.collect().map(_.toSeq).toSet == baseline(q))
    assert(df.collect().nonEmpty && df.collect().length < 8,
      "sanity: the HAVING must actually filter groups")
  }

  test("COARSER calendar buckets derive from a finer stored trunc " +
    "key: month/quarter/year/week queries re-bucket a DAY store " +
    "(the Calcite time-hierarchy law); a finer query than the store " +
    "stays on base, and week — off the month chain — never serves " +
    "coarser") {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    val root = Files.createTempDirectory("rurwt").toString
    val dir = s"$root/facts"
    val facts = (1 to 400).map { i =>
      (i.toLong, s"g${i % 4}", (i % 13).toLong,
        java.sql.Timestamp.valueOf(
          f"2024-${1 + (i % 6)}%02d-${1 + (i % 27)}%02d ${i % 24}%02d:30:00"))
    }.toDF("id", "grp", "qty", "ts")
    Snapshot.createOrReplace(facts, dir, keepVersions = 2)
    store.registerSnapshot("mvt", "facts", dir)
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mvt.facts', name => 'mvt.daily',
      group_by => 'oday,grp', sum_cols => 'qty',
      group_exprs => 'oday:=date_trunc(''day'', ts)')""").collect()
    val ru = new TableStore(spark).properties("mvt", "daily")(
      "graft.rollup.dir")
    // month, quarter, year, week — each re-buckets the day store
    for (lvl <- Seq("month", "quarter", "year", "week")) {
      val q = s"""SELECT date_trunc('$lvl', ts) AS bucket,
        count(*) AS c, sum(qty) AS s FROM mvt.facts
        GROUP BY date_trunc('$lvl', ts)"""
      val df = spark.sql(q)
      assert(scans(df, ru) && !scans(df, dir),
        s"the $lvl query must re-bucket the day store")
      assert(df.collect().map(_.toSeq).toSet == baseline(q),
        s"the $lvl re-bucketing must be bit-identical")
    }
    // the day query is the EXACT stored key (existing path, still on)
    val dq = """SELECT date_trunc('day', ts) AS d, count(*) AS c
      FROM mvt.facts GROUP BY date_trunc('day', ts)"""
    assert(scans(spark.sql(dq), ru))
    // a coarser-bucket FILTER rides the rewrite too
    val fq = """SELECT grp, count(*) AS c FROM mvt.facts
      WHERE date_trunc('month', ts) = TIMESTAMP '2024-03-01 00:00:00'
      GROUP BY grp"""
    val ff = spark.sql(fq)
    assert(scans(ff, ru) && !scans(ff, dir),
      "a coarser-bucket filter must ride the rewrite")
    assert(ff.collect().map(_.toSeq).toSet == baseline(fq))
    // min/max/count-distinct over a coarser bucket of the key derive
    val mq = """SELECT grp, min(date_trunc('month', ts)) AS mn,
      count(DISTINCT date_trunc('year', ts)) AS dy
      FROM mvt.facts GROUP BY grp"""
    val mf = spark.sql(mq)
    assert(scans(mf, ru) && !scans(mf, dir))
    assert(mf.collect().map(_.toSeq).toSet == baseline(mq))

    // a FINER query than the store never derives: hour from day
    val hq = spark.sql("""SELECT date_trunc('hour', ts) AS h,
      count(*) AS c FROM mvt.facts GROUP BY date_trunc('hour', ts)""")
    assert(!scans(hq, ru) && scans(hq, dir),
      "an hour query must NOT be served by a day store")

    // week sits OUTSIDE the month chain: a month query over a
    // week-keyed store stays on base (a week crosses month
    // boundaries), and a week query over a MONTH store does too
    val dir2 = s"$root/facts2"
    Snapshot.createOrReplace(facts, dir2, keepVersions = 2)
    store.registerSnapshot("mvt", "facts2", dir2)
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mvt.facts2', name => 'mvt.weekly',
      group_by => 'owk', sum_cols => 'qty',
      group_exprs => 'owk:=date_trunc(''week'', ts)')""").collect()
    val ru2 = new TableStore(spark).properties("mvt", "weekly")(
      "graft.rollup.dir")
    val wm = spark.sql("""SELECT date_trunc('month', ts) AS m,
      count(*) AS c FROM mvt.facts2 GROUP BY date_trunc('month', ts)""")
    assert(!scans(wm, ru2) && scans(wm, dir2),
      "a month query must NOT be served by a week store")
    val dir3 = s"$root/facts3"
    Snapshot.createOrReplace(facts, dir3, keepVersions = 2)
    store.registerSnapshot("mvt", "facts3", dir3)
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mvt.facts3', name => 'mvt.monthly',
      group_by => 'omo', sum_cols => 'qty',
      group_exprs => 'omo:=date_trunc(''month'', ts)')""").collect()
    val ru3 = new TableStore(spark).properties("mvt", "monthly")(
      "graft.rollup.dir")
    val mw = spark.sql("""SELECT date_trunc('week', ts) AS w,
      count(*) AS c FROM mvt.facts3 GROUP BY date_trunc('week', ts)""")
    assert(!scans(mw, ru3) && scans(mw, dir3),
      "a week query must NOT be served by a month store")
    // …but year over the month store derives (chain holds)
    val ym = """SELECT date_trunc('year', ts) AS y, count(*) AS c
      FROM mvt.facts3 GROUP BY date_trunc('year', ts)"""
    val ymf = spark.sql(ym)
    assert(scans(ymf, ru3) && !scans(ymf, dir3))
    assert(ymf.collect().map(_.toSeq).toSet == baseline(ym))

    // HIERARCHY TIEBREAK: with a day store AND a month store both
    // fresh on ONE table, the month query must read the store whose
    // grain it hits EXACTLY (the month store, ~30× fewer gold rows),
    // not the day store it would have to re-bucket
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mvt.facts', name => 'mvt.monthly0',
      group_by => 'omo0', sum_cols => 'qty',
      group_exprs => 'omo0:=date_trunc(''month'', ts)')""").collect()
    val ruM = new TableStore(spark).properties("mvt", "monthly0")(
      "graft.rollup.dir")
    val tie = """SELECT date_trunc('month', ts) AS m, count(*) AS c,
      sum(qty) AS s FROM mvt.facts GROUP BY date_trunc('month', ts)"""
    val tieF = spark.sql(tie)
    assert(scans(tieF, ruM) && !scans(tieF, ru) && !scans(tieF, dir),
      "an exact-grain store must win the tie over a finer one")
    assert(tieF.collect().map(_.toSeq).toSet == baseline(tie))
  }

  test("EXTRACT-form calendar keys (r18): year/quarter/month/to_date " +
    "derive from a trunc-keyed store — GROUP keys, filters, and " +
    "slice implications — with month()'s non-injective implication " +
    "refused; to_date needs a day-or-finer store; week stores never " +
    "serve extracts") {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    val root = Files.createTempDirectory("rurwx").toString
    val dir = s"$root/facts"
    // two years of timestamps so year/quarter grouping is non-trivial
    val facts = (1 to 800).map { i =>
      (i.toLong, s"g${i % 4}", (i % 13).toLong,
        java.sql.Timestamp.valueOf(
          f"${2023 + (i % 2)}%d-${1 + (i % 12)}%02d-${1 + (i % 27)}%02d ${i % 24}%02d:30:00"))
    }.toDF("id", "grp", "qty", "ts")
    Snapshot.createOrReplace(facts, dir, keepVersions = 2)
    store.registerSnapshot("mvx", "facts", dir)
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mvx.facts', name => 'mvx.daily',
      group_by => 'oday,grp', sum_cols => 'qty',
      group_exprs => 'oday:=date_trunc(''day'', ts)')""").collect()
    val ru = new TableStore(spark).properties("mvx", "daily")(
      "graft.rollup.dir")
    // each extract form is a derivable GROUP key over the day store
    for (sel <- Seq("year(ts) AS y", "quarter(ts) AS q2",
        "month(ts) AS m", "to_date(ts) AS d",
        "dayofmonth(ts) AS dom", "dayofyear(ts) AS doy")) {
      val key = sel.split(" ").head
      val q = s"SELECT $sel, count(*) AS c, sum(qty) AS s " +
        s"FROM mvx.facts GROUP BY $key"
      val df = spark.sql(q)
      assert(scans(df, ru) && !scans(df, dir),
        s"$key must derive from the day store")
      assert(df.collect().map(_.toSeq).toSet == baseline(q),
        s"$key derivation must be bit-identical")
    }
    // the dashboard pair — year + month together
    val ym = """SELECT year(ts) AS y, month(ts) AS m, count(*) AS c
      FROM mvx.facts GROUP BY year(ts), month(ts)"""
    val ymf = spark.sql(ym)
    assert(scans(ymf, ru) && !scans(ymf, dir))
    assert(ymf.collect().map(_.toSeq).toSet == baseline(ym))
    // an extract FILTER over the keys rides the rewrite (month is
    // fine HERE: filtering groups by a key function is row-local —
    // only the slice IMPLICATION below is the unsound shape)
    val fq = """SELECT grp, count(*) AS c FROM mvx.facts
      WHERE year(ts) = 2024 AND month(ts) = 3 GROUP BY grp"""
    val ff = spark.sql(fq)
    assert(scans(ff, ru) && !scans(ff, dir),
      "extract filters over the key must ride the rewrite")
    assert(ff.collect().map(_.toSeq).toSet == baseline(fq))

    // to_date needs DAY-or-finer: over a MONTH store it must refuse,
    // while year still derives
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mvx.facts', name => 'mvx.monthly',
      group_by => 'omo', sum_cols => 'qty',
      group_exprs => 'omo:=date_trunc(''month'', ts)')""").collect()
    val ruM = new TableStore(spark).properties("mvx", "monthly")(
      "graft.rollup.dir")
    val td = spark.sql("""SELECT to_date(ts) AS d, count(*) AS c
      FROM mvx.facts GROUP BY to_date(ts)""")
    assert(!scans(td, ruM),
      "to_date must NOT derive from a month store")
    val yM = spark.sql("""SELECT year(ts) AS y, sum(qty) AS s
      FROM mvx.facts GROUP BY year(ts)""")
    // (the day store also serves year; the pin is only that the
    // month store is ADMISSIBLE for it — either store, never base)
    assert(!scans(yM, dir), "year must serve from a trunc store")

    // WEEK store: a week bucket crosses month/year boundaries —
    // extracts never derive from it
    val dirW = s"$root/factsw"
    Snapshot.createOrReplace(facts, dirW, keepVersions = 2)
    store.registerSnapshot("mvx", "factsw", dirW)
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mvx.factsw', name => 'mvx.weekly',
      group_by => 'owk', sum_cols => 'qty',
      group_exprs => 'owk:=date_trunc(''week'', ts)')""").collect()
    val ruW = new TableStore(spark).properties("mvx", "weekly")(
      "graft.rollup.dir")
    val yW = spark.sql("""SELECT year(ts) AS y, count(*) AS c
      FROM mvx.factsw GROUP BY year(ts)""")
    assert(!scans(yW, ruW) && scans(yW, dirW),
      "year must NOT derive from a week store")

    // SLICE IMPLICATION over a partial day store on a DATE column:
    // year/to_date bounds imply, month() refuses (non-injective)
    val dirD = s"$root/factsd"
    val factsD = (1 to 800).map { i =>
      (i.toLong, s"g${i % 4}", (i % 13).toLong,
        java.sql.Date.valueOf(
          f"${2023 + (i % 2)}%d-${1 + (i % 12)}%02d-${1 + (i % 27)}%02d"))
    }.toDF("id", "grp", "qty", "dt")
    Snapshot.createOrReplace(factsD, dirD, keepVersions = 2)
    store.registerSnapshot("mvx", "factsd", dirD)
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mvx.factsd', name => 'mvx.recent',
      group_by => 'odayd,grp', sum_cols => 'qty',
      group_exprs => 'odayd:=date_trunc(''day'', dt)',
      where => 'dt >= DATE ''2024-01-01''')""").collect()
    val ruD = new TableStore(spark).properties("mvx", "recent")(
      "graft.rollup.dir")
    // a DEGENERATE TruncDate store: trunc(date, 'dd') is NULL for
    // every row (TruncDate supports week-and-coarser only) — the
    // structural derivations must refuse it, or year()/month
    // queries would serve from an all-null key
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mvx.factsd', name => 'mvx.degen',
      group_by => 'odeg', sum_cols => 'qty',
      group_exprs => 'odeg:=trunc(dt, ''dd'')')""").collect()
    val ruDg = new TableStore(spark).properties("mvx", "degen")(
      "graft.rollup.dir")
    for (qq <- Seq(
        """SELECT year(dt) AS y, count(*) AS c FROM mvx.factsd
           GROUP BY year(dt)""",
        """SELECT trunc(dt, 'month') AS mth, count(*) AS c
           FROM mvx.factsd GROUP BY trunc(dt, 'month')""")) {
      val dgf = spark.sql(qq)
      assert(!scans(dgf, ruDg),
        s"a degenerate day-TruncDate store must never serve: $qq")
      assert(dgf.collect().map(_.toSeq).toSet == baseline(qq))
    }

    for ((pred, expectServe) <- Seq(
        ("year(dt) = 2024", true),          // ⟺ [2024-01-01, 2025)
        ("year(dt) >= 2024", true),
        ("year(dt) = 2023", false),         // admits pre-slice rows
        ("year(dt) IN (2024, 2025)", true), // contiguous interval
        ("year(dt) IN (2023, 2025)", false),// gapped: claims nothing
        ("to_date(dt) >= DATE '2024-03-15'", true),
        ("month(dt) = 3", false))) {        // March 2023 is pre-slice
      val q = s"SELECT grp, count(*) AS c FROM mvx.factsd " +
        s"WHERE $pred GROUP BY grp"
      val df = spark.sql(q)
      assert(scans(df, ruD) == expectServe,
        s"implication must be exact for: $pred " +
          s"(served=${scans(df, ruD)}, expected=$expectServe)")
      assert(df.collect().map(_.toSeq).toSet == baseline(q),
        s"rewrite changed the answer of: $q")
    }
  }

  test("SEEDED RANDOMIZED stale-serve compensation: random " +
    "unrefreshed window mixes (appends, position deletes, equality " +
    "deletes, multi-commit) answer bit-identically with the rewrite " +
    "on and off, and serve for EVERY window class — delete-bearing " +
    "windows via the affected-group arm (min/max exact, r19), " +
    "append-only windows via the signed merge") {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    val root = Files.createTempDirectory("rurwcf").toString
    val dir = s"$root/facts"
    val facts = (1 to 600).map(i => (i.toLong, s"g${i % 4}",
      s"r${i % 2}", (i % 13).toLong, (i % 41).toDouble)).toDF(
      "id", "grp", "region", "qty", "amount")
    Snapshot.createOrReplace(facts, dir, keepVersions = 2)
    store.registerSnapshot("mvc", "facts", dir)
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mvc.facts', name => 'mvc.gold',
      group_by => 'grp', sum_cols => 'qty,amount',
      min_max_cols => 'amount')""").collect()
    val ru = new TableStore(spark).properties("mvc", "gold")(
      "graft.rollup.dir")
    val qSum = """SELECT grp, count(*) AS c, sum(qty) AS s,
      count(amount) AS ca, avg(qty) AS a
      FROM mvc.facts GROUP BY grp"""
    val qMm = """SELECT grp, min(amount) AS mn, max(amount) AS mx
      FROM mvc.facts GROUP BY grp"""
    val rnd = new scala.util.Random(20260818L)
    var nextId = 10000L
    (1 to 10).foreach { round =>
      var hasEq = false
      var hasPos = false
      (0 until 1 + rnd.nextInt(3)).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 =>
            val n = 5 + rnd.nextInt(40)
            val rows = (0 until n).map { k =>
              val i = nextId + k
              (i, s"g${rnd.nextInt(5)}", s"r${i % 2}",
                rnd.nextInt(13).toLong, rnd.nextInt(41).toDouble)
            }.toDF("id", "grp", "region", "qty", "amount")
            nextId += n
            Snapshot.morCommit(spark, dir, deletes = None,
              appends = Some(rows), operation = "append")
          case 1 =>
            hasPos = true
            val victims = Snapshot.readLineage(spark, dir)
              .filter(pmod(col("id"), lit(97L)) === (round % 7))
              .limit(30).localCheckpoint()
            Snapshot.morCommit(spark, dir, deletes = None,
              appends = None, operation = "delete",
              posDeletes = Some(victims))
          case _ =>
            hasEq = true
            val victims = Snapshot.read(spark, dir)
              .filter(pmod(col("id"), lit(89L)) === (round % 5))
              .limit(30).localCheckpoint()
            Snapshot.morCommit(spark, dir, deletes = Some(victims),
              appends = None, operation = "delete")
        }
      }
      // count/sum/avg serve for EVERY compensable class
      val dfSum = spark.sql(qSum)
      assert(scans(dfSum, ru),
        s"round $round (eq=$hasEq pos=$hasPos): counts/sums must " +
          "serve by compensation")
      assert(dfSum.collect().map(_.toSeq).toSet == baseline(qSum),
        s"round $round: compensated counts/sums changed the answer")
      // min/max: exact for EVERY window class since r19 — the
      // append-only signed arm merges min-of-mins, and any
      // delete-bearing window (equality OR position) routes this
      // min/max-bearing store through the affected-group arm
      val dfMm = spark.sql(qMm)
      assert(scans(dfMm, ru),
        s"round $round (eq=$hasEq pos=$hasPos): min/max must serve")
      assert(dfMm.collect().map(_.toSeq).toSet == baseline(qMm),
        s"round $round: the min/max answer changed")
      // REFRESH re-arms the plain store and bounds the next window
      spark.sql("CALL iceberg.system.refresh_rollup(table => " +
        "'mvc.gold')").collect()
      val fresh = spark.sql(qSum)
      assert(scans(fresh, ru))
      assert(fresh.collect().map(_.toSeq).toSet == baseline(qSum))
    }
  }

  test("SEEDED RANDOMIZED star stale-serve (r19): random " +
    "unrefreshed FACT window mixes interleaved with DIM churn — " +
    "fan-out appends, re-segmenting MERGEs, keys matching nothing — " +
    "answer bit-identically with the rewrite on and off, serve from " +
    "the gold store every round, and REFRESH re-arms between rounds") {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    val root = Files.createTempDirectory("rurwsf").toString
    val (fdir, ddir) = (s"$root/fact", s"$root/dim")
    val facts = (1 to 600).map(i =>
      (i.toLong, (i % 20).toLong, (i % 13).toLong, (i % 41).toDouble))
      .toDF("id", "cust_id", "qty", "amount")
    val dim = (0 until 20).map(i => (i.toLong, s"seg${i % 6}"))
      .toDF("cust_key", "segment")
    Snapshot.createOrReplace(facts, fdir, keepVersions = 2)
    Snapshot.createOrReplace(dim, ddir, keepVersions = 2)
    store.registerSnapshot("mvf", "facts", fdir)
    store.registerSnapshot("mvf", "cust", ddir)
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mvf.facts', name => 'mvf.gold',
      group_by => 'segment', sum_cols => 'qty,amount',
      min_max_cols => 'amount',
      joins => 'mvf.cust:cust_id=cust_key')""").collect()
    val ru = new TableStore(spark).properties("mvf", "gold")(
      "graft.rollup.dir")
    val q = """SELECT segment, count(*) AS c, sum(qty) AS s,
      min(amount) AS mn, max(amount) AS mx
      FROM mvf.facts f JOIN mvf.cust c ON f.cust_id = c.cust_key
      GROUP BY segment"""
    val rnd = new scala.util.Random(20260819L)
    var nextId = 10000L
    (1 to 8).foreach { round =>
      (0 until 1 + rnd.nextInt(3)).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 =>
            // fact append — cust keys 0..24: some match the dim,
            // some dangle until a later dim append picks them up
            val n = 5 + rnd.nextInt(30)
            val rows = (0 until n).map { k =>
              val i = nextId + k
              (i, rnd.nextInt(25).toLong, rnd.nextInt(13).toLong,
                rnd.nextInt(41).toDouble)
            }.toDF("id", "cust_id", "qty", "amount")
            nextId += n
            Snapshot.morCommit(spark, fdir, deletes = None,
              appends = Some(rows), operation = "append")
          case 1 =>
            // fact equality merge (the CDC MERGE shape)
            val victims = Snapshot.read(spark, fdir)
              .filter(pmod(col("id"), lit(89L)) === (round % 5))
              .limit(25).localCheckpoint()
            Snapshot.morCommit(spark, fdir, deletes = Some(victims),
              appends = None, operation = "delete")
          case 2 =>
            // dim re-segmenting MERGE — the moved rows void their
            // OLD segment under the pinned join and their NEW one
            // under the live join
            val v = Snapshot.read(spark, ddir)
              .filter(pmod(col("cust_key"), lit(7L)) === (round % 7))
              .limit(2).localCheckpoint()
            if (v.count() > 0)
              Snapshot.morCommit(spark, ddir, deletes = Some(v),
                appends = Some(v.withColumn("segment",
                  concat(lit("seg"),
                    pmod(col("cust_key") + round, lit(6L))))),
                operation = "merge")
          case _ =>
            // dim append — key 20..27 may match dangling fact rows
            // (fan-in) or duplicate a live key (fan-out)
            val rows = Seq(((20 + rnd.nextInt(8)).toLong,
              s"seg${rnd.nextInt(6)}")).toDF("cust_key", "segment")
            Snapshot.morCommit(spark, ddir, deletes = None,
              appends = Some(rows), operation = "append")
        }
      }
      val df = spark.sql(q)
      assert(scans(df, ru),
        s"round $round: the stale star must serve by compensation")
      assert(df.collect().map(_.toSeq).toSet == baseline(q),
        s"round $round: the compensated star answer changed")
      spark.sql("CALL iceberg.system.refresh_rollup(table => " +
        "'mvf.gold')").collect()
      val fresh = spark.sql(q)
      assert(scans(fresh, ru))
      assert(fresh.collect().map(_.toSeq).toSet == baseline(q),
        s"round $round: the refreshed star answer changed")
    }
  }

  test("EXTRACT keys over an NTZ column (the parquet-native " +
    "timestamp type): the analyzer widens NTZ to LTZ under the " +
    "store's date_trunc — the extract still derives when the " +
    "widening and the trunc share one fixed-offset zone, and an NTZ " +
    "year bound implies an NTZ slice") {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    val root = Files.createTempDirectory("rurwn").toString
    val dir = s"$root/facts"
    val facts = (1 to 400).map { i =>
      (i.toLong, s"g${i % 4}", (i % 13).toLong,
        java.sql.Timestamp.valueOf(
          f"${1994 + (i % 4)}%d-${1 + (i % 12)}%02d-${1 + (i % 27)}%02d 10:30:00"))
    }.toDF("id", "grp", "qty", "ts0")
      .withColumn("dt", col("ts0").cast("timestamp_ntz")).drop("ts0")
    Snapshot.createOrReplace(facts, dir, keepVersions = 2)
    store.registerSnapshot("ntz", "facts", dir)
    spark.sql("""CREATE MATERIALIZED VIEW ntz.monthly AS
      SELECT date_trunc('month', dt) AS omonth, count(*) AS cnt
      FROM ntz.facts
      WHERE dt >= DATE '1995-01-01'
      GROUP BY date_trunc('month', dt)""").collect()
    val ru = new TableStore(spark).properties("ntz",
      "monthly__storage")("graft.rollup.dir")
    val q = """SELECT year(dt) AS y, count(*) AS c
      FROM ntz.facts WHERE year(dt) >= 1996 GROUP BY year(dt)"""
    val df = spark.sql(q)
    assert(scans(df, ru) && !scans(df, dir),
      "the NTZ year bound must imply the NTZ slice and derive from " +
        "the widened-trunc month key")
    assert(df.collect().map(_.toSeq).toSet == baseline(q))
    // a bound NOT implying the slice stays on base, still correct
    val wide = """SELECT year(dt) AS y, count(*) AS c
      FROM ntz.facts WHERE year(dt) >= 1994 GROUP BY year(dt)"""
    val wf = spark.sql(wide)
    assert(!scans(wf, ru) && scans(wf, dir))
    assert(wf.collect().map(_.toSeq).toSet == baseline(wide))
  }

  test("SEEDED RANDOMIZED extract implication: random year/to_date/" +
    "month predicates over a time-sliced store serve exactly when " +
    "the normalized interval implies the slice, answer " +
    "bit-identically either way") {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    val root = Files.createTempDirectory("rurwxf").toString
    val dir = s"$root/facts"
    val facts = (1 to 800).map { i =>
      (i.toLong, s"g${i % 4}", (i % 7).toLong,
        java.sql.Timestamp.valueOf(
          f"${2022 + (i % 4)}%d-${1 + (i % 12)}%02d-${1 + (i % 27)}%02d ${i % 24}%02d:15:00"))
    }.toDF("id", "grp", "v", "ts")
    Snapshot.createOrReplace(facts, dir, keepVersions = 2)
    store.registerSnapshot("mvxf", "facts", dir)
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mvxf.facts', name => 'mvxf.recent',
      group_by => 'oday,grp', sum_cols => 'v',
      group_exprs => 'oday:=date_trunc(''day'', ts)',
      where => 'ts >= TIMESTAMP ''2023-07-01 00:00:00''')""").collect()
    val ru = new TableStore(spark).properties("mvxf", "recent")(
      "graft.rollup.dir")
    val sliceDay = java.time.LocalDate.of(2023, 7, 1)
    val rnd = new scala.util.Random(20260816L)
    var servedN = 0
    (1 to 40).foreach { _ =>
      val (pred, expectServe) = rnd.nextInt(5) match {
        case 0 =>
          val y = 2022 + rnd.nextInt(4)
          (s"year(ts) >= $y", y >= 2024)
        case 1 =>
          val y = 2022 + rnd.nextInt(4)
          (s"year(ts) = $y", y >= 2024)
        case 2 =>
          val d = sliceDay.plusDays(rnd.nextInt(400) - 200L)
          (s"to_date(ts) >= DATE '$d'", !d.isBefore(sliceDay))
        case 3 =>
          (s"month(ts) = ${1 + rnd.nextInt(12)}", false)
        case _ =>
          val y = 2022 + rnd.nextInt(3)
          val gap = rnd.nextBoolean()
          (s"year(ts) IN ($y, ${y + (if (gap) 2 else 1)})",
            !gap && y >= 2024)
      }
      // the grouping shape varies too — every extract key derives
      val key = Seq("year(ts)", "to_date(ts)", "quarter(ts)",
        "grp")(rnd.nextInt(4))
      val q = s"SELECT $key AS k, count(*) AS c, sum(v) AS s " +
        s"FROM mvxf.facts WHERE $pred GROUP BY $key"
      val df = spark.sql(q)
      val fromGold = scans(df, ru)
      assert(fromGold == expectServe,
        s"serving must track the normalized implication: $q " +
          s"(served=$fromGold, expected=$expectServe)")
      if (fromGold) { servedN += 1
        assert(!scans(df, dir), s"gold AND base scanned: $q") }
      assert(df.collect().map(_.toSeq).toSet == baseline(q),
        s"rewrite changed the answer of: $q")
    }
    assert(servedN >= 6 && servedN <= 34,
      s"sanity: the seed must exercise both directions ($servedN/40)")
  }

  test("FUNCTIONS of group keys serve from the store: GROUP BY " +
    "f(keys) merges gold groups exactly as the base grouping would; " +
    "min/max/filters over f(keys) ride; a function touching a " +
    "non-key column disqualifies") {
    val (dir, ru) = fixture()
    // grouping by a function of both keys
    val q = """SELECT concat(grp, '/', region) AS gr, count(*) AS c,
      sum(qty) AS s FROM mv.facts GROUP BY concat(grp, '/', region)"""
    val df = spark.sql(q)
    assert(scans(df, ru) && !scans(df, dir),
      "GROUP BY f(keys) must re-aggregate the gold store")
    assert(df.collect().map(_.toSeq).toSet == baseline(q))
    // min/max over a function of a key; filter over f(keys) rides
    val mq = """SELECT grp, max(upper(region)) AS ur, count(*) AS c
      FROM mv.facts WHERE concat(grp, region) <> 'g1r1' GROUP BY grp"""
    val mf = spark.sql(mq)
    assert(scans(mf, ru) && !scans(mf, dir),
      "f(keys) in aggregates and filters must ride the rewrite")
    assert(mf.collect().map(_.toSeq).toSet == baseline(mq))
    // a function over a NON-key column never derives
    val bad = spark.sql("""SELECT upper(CAST(qty AS STRING)) AS uq,
      count(*) AS c FROM mv.facts GROUP BY upper(CAST(qty AS STRING))""")
    assert(!scans(bad, ru) && scans(bad, dir),
      "f(non-key) must stay on the base scan")
    // non-deterministic functions of keys never derive
    val nd = spark.sql("""SELECT grp, count(*) AS c FROM mv.facts
      WHERE rand() < 2 GROUP BY grp""")
    assert(!scans(nd, ru),
      "a non-deterministic filter must stay on the base scan")
    // SUM/AVG over f(keys) must NEVER rewrite: each gold row is one
    // GROUP, so a row-weighted aggregate over f(keys) would silently
    // drop the per-group multiplicities (min/max/count-distinct span
    // value SETS and are safe; sum/avg are not)
    val sk = spark.sql("""SELECT grp, sum(length(region)) AS s
      FROM mv.facts GROUP BY grp""")
    assert(!scans(sk, ru) && scans(sk, dir),
      "sum over a function of keys must stay on the base scan")
    val ak = spark.sql("""SELECT grp, avg(length(region)) AS a
      FROM mv.facts GROUP BY grp""")
    assert(!scans(ak, ru) && scans(ak, dir),
      "avg over a function of keys must stay on the base scan")
  }

  test("SEEDED RANDOMIZED equivalence: random derivable query shapes " +
    "(key subsets, f(keys) groupings, coarser buckets, key filters, " +
    "mixed aggregates) answer bit-identically with the rewrite on " +
    "and off — and when they scan gold, gold only") {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    val root = Files.createTempDirectory("rurwr").toString
    val dir = s"$root/facts"
    val facts = (1 to 500).map { i =>
      (i.toLong, s"g${i % 5}", s"r${i % 3}", (i % 17).toLong,
        java.sql.Timestamp.valueOf(
          f"2024-${1 + (i % 4)}%02d-${1 + (i % 25)}%02d 10:00:00"))
    }.toDF("id", "grp", "region", "qty", "ts")
    Snapshot.createOrReplace(facts, dir, keepVersions = 2)
    store.registerSnapshot("mvr", "facts", dir)
    spark.sql("""CALL iceberg.system.create_rollup(
      table => 'mvr.facts', name => 'mvr.gold',
      group_by => 'oday,grp,region', sum_cols => 'qty',
      min_max_cols => 'qty',
      group_exprs => 'oday:=date_trunc(''day'', ts)')""").collect()
    val ru = new TableStore(spark).properties("mvr", "gold")(
      "graft.rollup.dir")
    val rnd = new scala.util.Random(20260815L)
    val groupings = Seq("grp", "region", "date_trunc('day', ts)",
      "date_trunc('month', ts)", "date_trunc('year', ts)",
      "concat(grp, region)", "upper(grp)",
      "substring(region, 1, 1)")
    val aggs = Seq("count(*) AS c", "sum(qty) AS s",
      "min(qty) AS mn", "max(qty) AS mx", "avg(qty) AS a",
      "count(DISTINCT grp) AS dg", "min(region) AS mr",
      "count(DISTINCT date_trunc('month', ts)) AS dm")
    val filters = Seq("", "WHERE grp <> 'g2'", "WHERE region = 'r1'",
      "WHERE concat(grp, region) <> 'g1r1'",
      "WHERE date_trunc('month', ts) >= TIMESTAMP '2024-02-01'")
    var served = 0
    (1 to 40).foreach { _ =>
      val gs = rnd.shuffle(groupings).take(1 + rnd.nextInt(2))
      val as = rnd.shuffle(aggs).take(1 + rnd.nextInt(3))
      val f = filters(rnd.nextInt(filters.size))
      val q = s"SELECT ${(gs ++ as).mkString(", ")} FROM mvr.facts " +
        s"$f GROUP BY ${gs.mkString(", ")}"
      val df = spark.sql(q)
      val fromGold = scans(df, ru)
      if (fromGold) { served += 1
        assert(!scans(df, dir), s"gold AND base scanned: $q") }
      assert(df.collect().map(_.toSeq).toSet == baseline(q),
        s"rewrite changed the answer of: $q (served=$fromGold)")
    }
    assert(served >= 30,
      s"sanity: the derivable shapes should mostly serve ($served/40)")
  }

  test("a corrupt (or foreign-format) rollup meta never fails query " +
    "analysis: that target skips its rewrite, the query stays on the " +
    "base — the always-on rule must be error-isolated per store") {
    val (dir, ruDir) = fixture()
    val q = "SELECT grp, region, count(*) AS c " +
      "FROM mv.facts GROUP BY grp, region"
    assert(scans(spark.sql(q), ruDir),
      "sanity: the intact store serves the aggregate")
    // the torn-write / newer-format state: the meta no longer parses
    java.nio.file.Files.write(
      java.nio.file.Paths.get(ruDir, "_rollup_meta"),
      "not-a-version corrupted\n".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    val broken = spark.sql(q)
    assert(!scans(broken, ruDir) && scans(broken, dir),
      "a broken store must cost ITSELF the rewrite, not the query")
    assert(broken.collect().map(_.toSeq).toSet == baseline(q))
  }
}
