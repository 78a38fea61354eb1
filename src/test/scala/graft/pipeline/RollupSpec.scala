package graft.pipeline

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Incremental-rollup pins: the maintained aggregate equals a full
  * recompute EXACTLY (decimal-accumulated, order-free) under
  * fast-append and position-delete windows; equality-delete windows
  * (the engine default) refresh via affected-group re-derive — even
  * COMBINED with moved dims (fact-first telescoping); rebased
  * windows raise typed; zero-count groups vanish; the operation
  * marker makes crash replays exactly-once. */
class RollupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The recompute the rollup must match bit-for-bit. */
  private def recompute(df: DataFrame): Set[(String, Long, Double)] = {
    import spark.implicits._
    df.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(DecimalType(27, 6)))
          .cast(DoubleType).as("s"))
      .as[(String, Long, Double)].collect().toSet
  }

  private def served(src: String, ru: String): Set[(String, Long, Double)] = {
    import spark.implicits._
    Rollup.read(spark, src, ru)
      .select(col("o_orderpriority"), col("cnt"),
        col("sum_o_totalprice").as("s"))
      .as[(String, Long, Double)].collect().toSet
  }

  test("build + fast-append refresh equals a full recompute exactly; " +
    "a second refresh is a no-op; read refuses stale") {
    val orders = Tables.orders(spark, sf).localCheckpoint()
    val root = Files.createTempDirectory("rollup1").toString
    val src = s"$root/src"
    val ru = s"$root/rollup"
    val v1 = orders.filter(col("o_orderkey") % 10 =!= 7)
    Snapshot.createOrReplace(v1, src, keepVersions = 2)
    Rollup.build(spark, src, ru,
      Seq("o_orderpriority"), Seq("o_totalprice"))
    assert(served(src, ru) == recompute(v1))

    Snapshot.morCommit(spark, src, deletes = None,
      appends = Some(orders.filter(col("o_orderkey") % 10 === 7)),
      operation = "append")
    assert(intercept[IllegalStateException] {
      Rollup.read(spark, src, ru)
    }.getMessage.contains("STALE"))
    assert(Rollup.refresh(spark, src, ru) > 0L)
    assert(Rollup.refresh(spark, src, ru) == 0L)
    assert(served(src, ru) == recompute(orders),
      "the maintained rollup must equal the recompute EXACTLY")
  }

  test("position-delete window subtracts per-instance; appended-then-" +
    "deleted rows cancel; a group whose count reaches 0 vanishes") {
    val orders = Tables.orders(spark, sf).localCheckpoint()
    val root = Files.createTempDirectory("rollup2").toString
    val src = s"$root/src"
    val ru = s"$root/rollup"
    Snapshot.createOrReplace(orders, src, keepVersions = 2)
    Rollup.build(spark, src, ru,
      Seq("o_orderpriority"), Seq("o_totalprice"))

    // one window, two commits: append a synthetic group, then
    // position-delete a base slice AND part of the appended group —
    // the appended-then-deleted rows must appear on NEITHER side
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("o_orderkey")
    val extra = orders.orderBy("o_orderkey").limit(3)
      .withColumn("o_orderkey",
        lit(900000000L) + row_number().over(w))
      .withColumn("o_orderpriority", lit("9-SYNTH"))
      .localCheckpoint()
    Snapshot.morCommit(spark, src, deletes = None,
      appends = Some(extra), operation = "append")
    val hits = Snapshot.readLineage(spark, src)
      .filter(col("o_orderkey") % 50 === 1 ||
        (col("o_orderpriority") === "9-SYNTH" &&
          col("o_orderkey") % 3 === 0))
      .localCheckpoint()
    Snapshot.morCommit(spark, src, deletes = None, appends = None,
      operation = "delete", posDeletes = Some(hits))
    assert(Rollup.refresh(spark, src, ru) > 0L)
    val want = recompute(Snapshot.read(spark, src).localCheckpoint())
    assert(served(src, ru) == want,
      "per-instance subtraction must reproduce the live state exactly")

    // delete the REST of the synthetic group: count reaches 0 and the
    // group row must disappear from the stored rollup
    val rest = Snapshot.readLineage(spark, src)
      .filter(col("o_orderpriority") === "9-SYNTH").localCheckpoint()
    assert(rest.count() > 0)
    Snapshot.morCommit(spark, src, deletes = None, appends = None,
      operation = "delete", posDeletes = Some(rest))
    assert(Rollup.refresh(spark, src, ru) > 0L)
    assert(Snapshot.read(spark, Rollup.tableDir(ru))
      .filter(col("o_orderpriority") === "9-SYNTH").isEmpty,
      "a zero-count group must vanish, not linger at cnt=0")
    assert(served(src, ru) == recompute(Snapshot.read(spark, src)))
  }

  test("equality-delete windows (the engine's DEFAULT delete mode) " +
    "refresh via affected-group re-derive — full-row and " +
    "identifier-scoped sidecars, min/max and NDV included, " +
    "bit-identical to a fresh rebuild; rebased windows still raise") {
    val orders = Tables.orders(spark, sf).localCheckpoint()
    val root = Files.createTempDirectory("rollup3").toString
    val src = s"$root/src"
    val ru = s"$root/rollup"
    def allServed(dir: String): Set[Seq[Any]] =
      Rollup.read(spark, src, dir).collect().map(_.toSeq).toSet
    def rebuildAndCompare(tag: String): Unit = {
      val ru2 = s"$root/rebuild-$tag"
      Rollup.build(spark, src, ru2, Seq("o_orderpriority"),
        Seq("o_totalprice"), minMax = Seq("o_totalprice"),
        ndv = Seq("o_custkey"))
      assert(allServed(ru) == allServed(ru2),
        s"[$tag] the maintained rollup must equal a fresh rebuild " +
          "EXACTLY — counts, decimal sums, min/max, NDV sketches")
    }
    Snapshot.createOrReplace(orders, src, keepVersions = 6)
    Rollup.build(spark, src, ru, Seq("o_orderpriority"),
      Seq("o_totalprice"), minMax = Seq("o_totalprice"),
      ndv = Seq("o_custkey"))

    // window 1: a FULL-ROW equality delete (no identifier fields —
    // the sidecar carries every column) plus an append commit
    val dead1 = Snapshot.read(spark, src)
      .filter(col("o_orderkey") % 7 === 0).localCheckpoint()
    Snapshot.morCommit(spark, src, deletes = Some(dead1),
      appends = None, operation = "delete")
    Snapshot.morCommit(spark, src, deletes = None,
      appends = Some(orders.limit(50)
        .withColumn("o_orderkey", col("o_orderkey") + 800000000L)),
      operation = "append")
    assert(Rollup.refresh(spark, src, ru) > 0L)
    rebuildAndCompare("full-row")

    // window 2: an IDENTIFIER-SCOPED sidecar (keys only — the keyed
    // CDC DELETE shape) resolved against the as-of-start version,
    // MIXED with a position delete in the same window
    val dead2 = Snapshot.read(spark, src)
      .filter(col("o_orderkey") % 11 === 3)
      .select("o_orderkey").localCheckpoint()
    assert(dead2.count() > 0)
    Snapshot.morCommit(spark, src, deletes = Some(dead2),
      appends = None, operation = "delete")
    val posHits = Snapshot.readLineage(spark, src)
      .filter(col("o_orderkey") % 13 === 5).localCheckpoint()
    Snapshot.morCommit(spark, src, deletes = None, appends = None,
      operation = "delete", posDeletes = Some(posHits))
    assert(Rollup.refresh(spark, src, ru) > 0L)
    rebuildAndCompare("id-scoped")

    // a delete whose keys match NOTHING touches no group — the
    // refresh stamps the window applied and returns 0
    Snapshot.morCommit(spark, src,
      deletes = Some(spark.range(1)
        .select((col("id") + 999999999L).as("o_orderkey"))),
      appends = None, operation = "delete")
    assert(Rollup.refresh(spark, src, ru) == 0L)
    assert(Rollup.refresh(spark, src, ru) == 0L, "and is idempotent")

    // copy-on-write rebase: per-commit deltas are gone — the TYPED
    // unpriceable raise routes consumers to their rebuild fallback
    Snapshot.createOrReplace(orders.limit(500), src, keepVersions = 3)
    assert(intercept[UnpriceableWindowException] {
      Rollup.refresh(spark, src, ru)
    }.getMessage.contains("rebuild"))
  }

  test("min/max maintenance: appends merge arithmetically; deleting " +
    "a group's extremum recomputes ONLY the affected groups from the " +
    "source") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf).localCheckpoint()
    val root = Files.createTempDirectory("rollupmm").toString
    val src = s"$root/src"
    val ru = s"$root/rollup"
    def mmRecompute(df: DataFrame): Set[(String, Double, Double)] =
      df.groupBy("o_orderpriority")
        .agg(min("o_totalprice").as("mn"), max("o_totalprice").as("mx"))
        .as[(String, Double, Double)].collect().toSet
    def mmServed(): Set[(String, Double, Double)] =
      Rollup.read(spark, src, ru)
        .select(col("o_orderpriority"),
          col("min_o_totalprice"), col("max_o_totalprice"))
        .as[(String, Double, Double)].collect().toSet

    val v1 = orders.filter(col("o_orderkey") % 10 =!= 7)
    Snapshot.createOrReplace(v1, src, keepVersions = 2)
    Rollup.build(spark, src, ru, Seq("o_orderpriority"),
      Seq("o_totalprice"), minMax = Seq("o_totalprice"))
    assert(mmServed() == mmRecompute(v1))

    // append-only window: min/max merge without touching the source
    Snapshot.morCommit(spark, src, deletes = None,
      appends = Some(orders.filter(col("o_orderkey") % 10 === 7)),
      operation = "append")
    assert(Rollup.refresh(spark, src, ru) > 0L)
    assert(mmServed() == mmRecompute(orders))

    // delete THE maximum row of one group: its max must recompute
    // from the surviving rows (a subtraction could never produce it)
    val g = orders.orderBy("o_orderpriority").limit(1)
      .select("o_orderpriority").head().getString(0)
    val victim = Snapshot.read(spark, src)
      .filter(col("o_orderpriority") === g)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(1).localCheckpoint()
    Snapshot.morCommit(spark, src, deletes = None, appends = None,
      operation = "delete", posDeletes = Some(
        Snapshot.readLineage(spark, src)
          .join(victim.select("o_orderkey"), Seq("o_orderkey"),
            "left_semi")))
    assert(Rollup.refresh(spark, src, ru) > 0L)
    assert(mmServed() == mmRecompute(Snapshot.read(spark, src)),
      "the deleted extremum's group must recompute exactly")
    assert(served(src, ru) ==
      recompute(Snapshot.read(spark, src).localCheckpoint()),
      "count/sum stay exact alongside the min/max arm")
  }

  test("ndv sketches: appends UNION the sketch (merge equals the " +
    "recomputed sketch exactly); deletes recompute affected groups " +
    "so the estimate forgets removed members") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf).localCheckpoint()
    val root = Files.createTempDirectory("rollupndv").toString
    val src = s"$root/src"
    val ru = s"$root/rollup"
    val k = 8 // small k so the cap + estimate formula both exercise
    def kmvOf(df: DataFrame): Set[(String, Double)] =
      graft.ext.Sketches.kmvDistinct(
          df.filter(col("o_custkey").isNotNull),
          Seq("o_orderpriority"), "o_custkey", k)
        .as[(String, Double)].collect().toSet
    def ndvServed(): Set[(String, Double)] =
      Rollup.read(spark, src, ru)
        .select(col("o_orderpriority"), col("ndv_o_custkey"))
        .as[(String, Double)].collect().toSet

    val v1 = orders.filter(col("o_orderkey") % 10 =!= 7)
    Snapshot.createOrReplace(v1, src, keepVersions = 2)
    Rollup.build(spark, src, ru, Seq("o_orderpriority"),
      Seq("o_totalprice"), ndv = Seq("o_custkey"), ndvK = k)
    assert(ndvServed() == kmvOf(v1))

    // append wave: the MERGED sketch must equal the sketch a full
    // recompute would build (distinct-union keep-k is exact-by-value)
    Snapshot.morCommit(spark, src, deletes = None,
      appends = Some(orders.filter(col("o_orderkey") % 10 === 7)),
      operation = "append")
    assert(Rollup.refresh(spark, src, ru) > 0L)
    assert(ndvServed() == kmvOf(orders))

    // position-delete a custkey slice: affected groups recompute, so
    // deleted members leave the sketch (an append-only merge could
    // never lower the estimate)
    Snapshot.morCommit(spark, src, deletes = None, appends = None,
      operation = "delete", posDeletes = Some(
        Snapshot.readLineage(spark, src)
          .filter(col("o_custkey") % 3 === 1)))
    assert(Rollup.refresh(spark, src, ru) > 0L)
    assert(ndvServed() ==
      kmvOf(Snapshot.read(spark, src).localCheckpoint()),
      "the post-delete sketch must equal a recompute over survivors")
  }

  test("NULL group keys maintain exactly like any other group: " +
    "appends merge into the null group and deletes recompute it " +
    "(a plain equi-join would silently drop its stored row)") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf)
      // null the key for one slice — groupBy creates the null group
      .withColumn("o_orderpriority",
        when(col("o_orderkey") % 4 === 0, lit(null).cast("string"))
          .otherwise(col("o_orderpriority")))
      .localCheckpoint()
    val root = Files.createTempDirectory("rollupnull").toString
    val src = s"$root/src"
    val ru = s"$root/rollup"
    def mmRecompute(df: DataFrame): Set[(String, Double, Double)] =
      df.groupBy("o_orderpriority")
        .agg(min("o_totalprice").as("mn"), max("o_totalprice").as("mx"))
        .as[(String, Double, Double)].collect().toSet
    def mmServed(): Set[(String, Double, Double)] =
      Rollup.read(spark, src, ru)
        .select(col("o_orderpriority"),
          col("min_o_totalprice"), col("max_o_totalprice"))
        .as[(String, Double, Double)].collect().toSet

    val v1 = orders.filter(col("o_orderkey") % 10 =!= 7)
    Snapshot.createOrReplace(v1, src, keepVersions = 2)
    Rollup.build(spark, src, ru, Seq("o_orderpriority"),
      Seq("o_totalprice"), minMax = Seq("o_totalprice"),
      ndv = Seq("o_custkey"), ndvK = 8)
    assert(served(src, ru) == recompute(v1))

    // append window INTO the null group: the old null-group row must
    // MERGE with the delta, not be replaced by it
    Snapshot.morCommit(spark, src, deletes = None,
      appends = Some(orders.filter(col("o_orderkey") % 10 === 7)),
      operation = "append")
    assert(Rollup.refresh(spark, src, ru) > 0L)
    assert(served(src, ru) == recompute(orders),
      "the null group's count/sum must merge, not reset to the delta")
    assert(mmServed() == mmRecompute(orders))

    // delete the null group's MAXIMUM: the strict recompute override
    // must reach the null group through its null-safe joins
    val victim = Snapshot.read(spark, src)
      .filter(col("o_orderpriority").isNull)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(1).localCheckpoint()
    Snapshot.morCommit(spark, src, deletes = None, appends = None,
      operation = "delete", posDeletes = Some(
        Snapshot.readLineage(spark, src)
          .join(victim.select("o_orderkey"), Seq("o_orderkey"),
            "left_semi")))
    assert(Rollup.refresh(spark, src, ru) > 0L)
    val live = Snapshot.read(spark, src).localCheckpoint()
    assert(served(src, ru) == recompute(live))
    assert(mmServed() == mmRecompute(live),
      "the deleted null-group extremum must recompute exactly")
  }

  test("a NULLABLE measure maintains its non-null count (cnt_<m>) " +
    "exactly under append and position-delete windows — count(m) and " +
    "avg(m) denominators differ from cnt and must track deletes") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 5 === 0, lit(null).cast("double"))
          .otherwise(col("o_totalprice")))
      .localCheckpoint()
    val root = Files.createTempDirectory("rollupnn").toString
    val src = s"$root/src"
    val ru = s"$root/rollup"
    def nnRecompute(df: DataFrame): Set[(String, Long, Long)] =
      df.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          count(col("o_totalprice")).as("cm"))
        .as[(String, Long, Long)].collect().toSet
    def nnServed(): Set[(String, Long, Long)] =
      Rollup.read(spark, src, ru)
        .select(col("o_orderpriority"), col("cnt"),
          col("cnt_o_totalprice"))
        .as[(String, Long, Long)].collect().toSet

    val v1 = orders.filter(col("o_orderkey") % 10 =!= 7)
    Snapshot.createOrReplace(v1, src, keepVersions = 2)
    Rollup.build(spark, src, ru,
      Seq("o_orderpriority"), Seq("o_totalprice"))
    assert(nnServed() == nnRecompute(v1))
    assert(served(src, ru) == recompute(v1),
      "null measure values must not disturb the decimal sum")

    Snapshot.morCommit(spark, src, deletes = None,
      appends = Some(orders.filter(col("o_orderkey") % 10 === 7)),
      operation = "append")
    assert(Rollup.refresh(spark, src, ru) > 0L)
    assert(nnServed() == nnRecompute(orders))

    // delete a slice that mixes null and non-null measure rows: the
    // subtraction must decrement cnt for every row but cnt_<m> only
    // for the non-null ones
    Snapshot.morCommit(spark, src, deletes = None, appends = None,
      operation = "delete", posDeletes = Some(
        Snapshot.readLineage(spark, src)
          .filter(col("o_orderkey") % 10 === 0)))
    assert(Rollup.refresh(spark, src, ru) > 0L)
    val live = Snapshot.read(spark, src).localCheckpoint()
    assert(nnServed() == nnRecompute(live),
      "cnt_<m> must subtract per NON-NULL instance, cnt per row")
    assert(served(src, ru) == recompute(live))
  }

  test("a PARTIAL rollup (where-predicate) maintains only matching " +
    "rows: out-of-predicate appends and deletes never touch the " +
    "store, mixed windows maintain exactly, and unsafe predicates " +
    "are rejected at build") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf).localCheckpoint()
    val root = Files.createTempDirectory("rollupw").toString
    val src = s"$root/src"
    val ru = s"$root/rollup"
    // predicate on a column INDEPENDENT of the append-wave key split
    val pred = col("o_custkey") % 2 === 0
    def wRecompute(df: DataFrame): Set[(String, Long, Double)] =
      recompute(df.filter(pred))

    val v1 = orders.filter(col("o_orderkey") % 10 =!= 7)
    Snapshot.createOrReplace(v1, src, keepVersions = 2)
    Rollup.build(spark, src, ru, Seq("o_orderpriority"),
      Seq("o_totalprice"), minMax = Seq("o_totalprice"),
      filter = Some("o_custkey % 2 = 0"))
    assert(served(src, ru) == wRecompute(v1))

    // a window of ONLY out-of-predicate rows: zero touched groups
    Snapshot.morCommit(spark, src, deletes = None,
      appends = Some(orders.filter(col("o_orderkey") % 10 === 7 &&
        col("o_custkey") % 2 === 1)),
      operation = "append")
    assert(Rollup.refresh(spark, src, ru) == 0L,
      "rows outside the predicate must not touch the store")
    assert(served(src, ru) == wRecompute(Snapshot.read(spark, src)))

    // a mixed append window maintains exactly the matching slice
    Snapshot.morCommit(spark, src, deletes = None,
      appends = Some(orders.filter(col("o_orderkey") % 10 === 7 &&
        col("o_custkey") % 2 === 0)),
      operation = "append")
    assert(Rollup.refresh(spark, src, ru) > 0L)
    assert(served(src, ru) == wRecompute(orders))

    // a mixed position-delete window: only matching victims subtract,
    // and a deleted in-predicate extremum recomputes from the SLICE
    Snapshot.morCommit(spark, src, deletes = None, appends = None,
      operation = "delete", posDeletes = Some(
        Snapshot.readLineage(spark, src)
          .filter(col("o_orderkey") % 25 === 0)))
    assert(Rollup.refresh(spark, src, ru) > 0L)
    val live = Snapshot.read(spark, src).localCheckpoint()
    assert(served(src, ru) == wRecompute(live))
    assert(Rollup.read(spark, src, ru)
      .select(col("o_orderpriority"), col("min_o_totalprice"),
        col("max_o_totalprice"))
      .as[(String, Double, Double)].collect().toSet ==
      live.filter(pred).groupBy("o_orderpriority")
        .agg(min("o_totalprice"), max("o_totalprice"))
        .as[(String, Double, Double)].collect().toSet)

    // unsafe predicates refuse at build with the contract
    assert(intercept[IllegalArgumentException] {
      Rollup.build(spark, src, s"$root/bad1", Seq("o_orderpriority"),
        Nil, filter = Some("rand() > 0.5"))
    }.getMessage.contains("deterministic"))
    assert(intercept[IllegalArgumentException] {
      Rollup.build(spark, src, s"$root/bad2", Seq("o_orderpriority"),
        Nil, filter =
          Some("o_custkey IN (SELECT o_custkey FROM range(1))"))
    }.getMessage.contains("subquery-free"))
  }

  test("a partial rollup's predicate keeps whitespace INSIDE string " +
    "literals: a multi-space literal matches its rows (build AND " +
    "refresh windows), incidental whitespace still normalizes, and " +
    "a newline inside a literal refuses loudly") {
    import spark.implicits._
    val root = Files.createTempDirectory("rollupws").toString
    val src = s"$root/src"
    val ru = s"$root/rollup"
    val rows = (1 to 100).map(i => (i.toLong,
        if (i % 2 == 0) "New  York" else "Boston", (i % 7).toLong))
      .toDF("id", "city", "qty")
    Snapshot.createOrReplace(rows, src, keepVersions = 2)
    def expect(df: DataFrame): Set[(String, Long, Double)] =
      df.filter(col("city") === "New  York").groupBy("city")
        .agg(count(lit(1)).as("cnt"),
          sum(col("qty").cast(DecimalType(27, 6)))
            .cast(DoubleType).as("s"))
        .as[(String, Long, Double)].collect().toSet
    def golden(): Set[(String, Long, Double)] =
      Rollup.read(spark, src, ru)
        .select(col("city"), col("cnt"), col("sum_qty").as("s"))
        .as[(String, Long, Double)].collect().toSet
    // semantic whitespace (inside the literal) AND incidental
    // whitespace (tabs/runs around the operator) in one predicate —
    // the old \\s+ collapse would mangle the literal to 'New York'
    // and aggregate zero rows
    Rollup.build(spark, src, ru, Seq("city"), Seq("qty"),
      filter = Some("city \t =  'New  York'"))
    assert(golden() == expect(rows),
      "the literal's double space is semantic and must survive")
    assert(golden().nonEmpty, "the predicate must match its rows")
    // a refresh window filters with the SAME preserved literal
    Snapshot.morCommit(spark, src, deletes = None,
      appends = Some(Seq((101L, "New  York", 3L), (102L, "New York", 9L))
        .toDF("id", "city", "qty")),
      operation = "append")
    assert(Rollup.refresh(spark, src, ru) > 0L)
    assert(golden() == expect(Snapshot.read(spark, src)),
      "window rows must filter on the preserved literal (the " +
        "single-space 'New York' row stays out)")
    // a newline INSIDE a literal cannot ride the line-based meta
    assert(intercept[IllegalArgumentException] {
      Rollup.build(spark, src, s"$root/bad", Seq("city"), Nil,
        filter = Some("city = 'New\nYork'"))
    }.getMessage.contains("newline"))
  }

  test("a count-only rollup (measures = Nil) builds, refreshes and " +
    "reads — the empty measures line must round-trip through the " +
    "meta, not resurrect as a phantom sum_ column") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf).localCheckpoint()
    val root = Files.createTempDirectory("rollupcnt").toString
    val src = s"$root/src"
    val ru = s"$root/rollup"
    def cntOf(df: DataFrame): Set[(String, Long)] =
      df.groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
        .as[(String, Long)].collect().toSet
    val v1 = orders.filter(col("o_orderkey") % 10 =!= 7)
    Snapshot.createOrReplace(v1, src, keepVersions = 2)
    Rollup.build(spark, src, ru, Seq("o_orderpriority"), Nil)
    Snapshot.morCommit(spark, src, deletes = None,
      appends = Some(orders.filter(col("o_orderkey") % 10 === 7)),
      operation = "append")
    assert(Rollup.refresh(spark, src, ru) > 0L)
    assert(Rollup.read(spark, src, ru)
      .select(col("o_orderpriority"), col("cnt"))
      .as[(String, Long)].collect().toSet == cntOf(orders))
  }

  test("auto-compaction bounds the refresh sidecar stack: repeated " +
    "waves keep the MOR depth sawtoothed and the aggregate exact") {
    val orders = Tables.orders(spark, sf).localCheckpoint()
    val root = Files.createTempDirectory("rollup5").toString
    val src = s"$root/src"
    val ru = s"$root/rollup"
    Snapshot.createOrReplace(orders.filter(col("o_orderkey") % 8 === 0),
      src, keepVersions = 2)
    Rollup.build(spark, src, ru,
      Seq("o_orderpriority"), Seq("o_totalprice"))
    (1 to 7).foreach { w =>
      Snapshot.morCommit(spark, src, deletes = None,
        appends = Some(orders.filter(col("o_orderkey") % 8 === w)),
        operation = "append")
      assert(Rollup.refresh(spark, src, ru,
        compactAfterCommits = 3) > 0L)
      assert(Snapshot.morVersions(Rollup.tableDir(ru)).size < 3,
        "the stack must compact before reaching the threshold again")
    }
    assert(served(src, ru) == recompute(orders),
      "compaction must never change the maintained aggregate")
  }

  test("crash replay is exactly-once: the rollup commit's operation " +
    "marker records the applied window, so a replayed refresh skips " +
    "it and applies only NEWER commits") {
    val orders = Tables.orders(spark, sf).localCheckpoint()
    val root = Files.createTempDirectory("rollup4").toString
    val src = s"$root/src"
    val ru = s"$root/rollup"
    val v1 = orders.filter(col("o_orderkey") % 10 =!= 7)
    val wave1 = orders.filter(col("o_orderkey") % 20 === 7)
      .localCheckpoint()
    val wave2 = orders.filter(col("o_orderkey") % 20 === 17)
      .localCheckpoint()
    Snapshot.createOrReplace(v1, src, keepVersions = 2)
    Rollup.build(spark, src, ru,
      Seq("o_orderpriority"), Seq("o_totalprice"))
    // crash shape: refresh commits + stamps, then the meta is rolled
    // back to the pre-refresh bytes (= died before the meta write)
    val metaFile = java.nio.file.Paths.get(ru, "_rollup_meta")
    val preMeta = Files.readAllBytes(metaFile)
    Snapshot.morCommit(spark, src, deletes = None,
      appends = Some(wave1), operation = "append")
    assert(Rollup.refresh(spark, src, ru) > 0L)
    Files.write(metaFile, preMeta)
    // a second wave lands before the replay: the replayed refresh
    // must apply wave2 ONLY (wave1's window is marked applied)
    Snapshot.morCommit(spark, src, deletes = None,
      appends = Some(wave2), operation = "append")
    assert(Rollup.refresh(spark, src, ru) > 0L)
    assert(served(src, ru) == recompute(orders),
      "the replay must not double-count the already-applied window")
    // pure replay (no new commits): restamp only, no new rollup commit
    Files.write(metaFile, preMeta)
    val commitsBefore = Snapshot.morVersions(Rollup.tableDir(ru)).size
    assert(Rollup.refresh(spark, src, ru) == 0L)
    assert(Snapshot.morVersions(Rollup.tableDir(ru)).size
      == commitsBefore, "a fully-applied window must only restamp")
    assert(served(src, ru) == recompute(orders))
  }

  test("JOIN rollup (star): fact ⋈ dim maintains exactly under append " +
    "and position-delete windows; a dim equality window prices too") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf).localCheckpoint()
    val customer = Tables.customer(spark, sf).localCheckpoint()
    val root = Files.createTempDirectory("rollupJ").toString
    val (fact, dim, ru) = (s"$root/fact", s"$root/dim", s"$root/rollup")
    val v1 = orders.filter(col("o_orderkey") % 10 =!= 7)
    Snapshot.createOrReplace(v1, fact, keepVersions = 2)
    Snapshot.createOrReplace(customer, dim, keepVersions = 2)

    def joinedRecompute(f: DataFrame): Set[(String, Long, Double, Double)] =
      f.join(customer, f("o_custkey") === customer("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast(DecimalType(27, 6)))
            .cast(DoubleType).as("s"),
          min("o_totalprice").as("mn"))
        .as[(String, Long, Double, Double)].collect().toSet
    def goldState(): Set[(String, Long, Double, Double)] =
      Rollup.read(spark, fact, ru)
        .select(col("c_mktsegment"), col("cnt"),
          col("sum_o_totalprice"), col("min_o_totalprice"))
        .as[(String, Long, Double, Double)].collect().toSet

    Rollup.build(spark, fact, ru,
      Seq("c_mktsegment"), Seq("o_totalprice"),
      minMax = Seq("o_totalprice"),
      dims = Seq(Rollup.DimSpec(dim,
        Seq(("o_custkey", "c_custkey")))))
    assert(goldState() == joinedRecompute(v1))

    // fact append window: the delta joins to the FROZEN dim
    Snapshot.morCommit(spark, fact, deletes = None,
      appends = Some(orders.filter(col("o_orderkey") % 10 === 7)),
      operation = "append")
    assert(Rollup.refresh(spark, fact, ru) > 0L)
    assert(goldState() == joinedRecompute(orders))

    // fact position-delete window: victims include per-segment minima
    // (forces the affected-group recompute THROUGH the join)
    val lineage = Snapshot.readLineage(spark, fact)
    val victims = lineage.join(customer,
        lineage("o_custkey") === customer("c_custkey"))
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("c_mktsegment").orderBy("o_totalprice")))
      .filter(col("_rk") <= 3).select(lineage.columns.map(col): _*)
      .localCheckpoint()
    Snapshot.morCommit(spark, fact, deletes = None, appends = None,
      operation = "delete", posDeletes = Some(victims))
    assert(Rollup.refresh(spark, fact, ru) > 0L)
    assert(goldState() == joinedRecompute(
      Snapshot.read(spark, fact).localCheckpoint()))

    // DIM windows price incrementally (the F' ⋈ ΔD term). The live
    // joined recompute the maintained store must match from here on:
    def liveRecompute(): Set[(String, Long, Double, Double)] = {
      val f = Snapshot.read(spark, fact)
      val d2 = Snapshot.read(spark, dim)
      f.join(d2, f("o_custkey") === d2("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast(DecimalType(27, 6)))
            .cast(DoubleType).as("s"),
          min("o_totalprice").as("mn"))
        .as[(String, Long, Double, Double)].collect().toSet
    }
    // dim APPEND of a DUPLICATE row: every live fact row of that
    // customer now joins twice (fan-out) — read refuses first
    val dupDim = customer.orderBy("c_custkey").limit(1)
      .localCheckpoint()
    Snapshot.morCommit(spark, dim, deletes = None,
      appends = Some(dupDim), operation = "append")
    assert(intercept[IllegalStateException] {
      Rollup.read(spark, fact, ru)
    }.getMessage.contains("STALE"))
    assert(Rollup.refresh(spark, fact, ru) > 0L)
    assert(goldState() == liveRecompute(),
      "the dim fan-out must maintain exactly")

    // SIMULTANEOUS fact + dim windows in ONE refresh: a dim
    // position-delete (its joined fact rows drop out, extrema
    // recompute) landing together with a fresh fact append
    val dimVictim = Snapshot.readLineage(spark, dim)
      .orderBy("c_custkey").limit(1).localCheckpoint()
    Snapshot.morCommit(spark, dim, deletes = None, appends = None,
      operation = "delete", posDeletes = Some(dimVictim))
    Snapshot.morCommit(spark, fact, deletes = None,
      appends = Some(orders.orderBy("o_orderkey").limit(50)
        .withColumn("o_orderkey", col("o_orderkey") + 777000000L)),
      operation = "append")
    assert(Rollup.refresh(spark, fact, ru) > 0L)
    assert(goldState() == liveRecompute(),
      "fact and dim windows in one refresh must maintain exactly")
    assert(Rollup.refresh(spark, fact, ru) == 0L)

    // a dim EQUALITY-delete window (the default-delete-mode CDC
    // MERGE shape on a dimension) PRICES via the dim-side
    // affected-group re-derive — through r16 this raised and the MV
    // REFRESH surface paid a full rebuild every refresh interval
    Snapshot.morCommit(spark, dim, deletes = Some(dupDim),
      appends = None, operation = "delete")
    assert(Rollup.refresh(spark, fact, ru) > 0L,
      "a dim equality window must PRICE (dim re-derive), not raise")
    assert(goldState() == liveRecompute(),
      "the dim-eq re-derive must equal the live joined recompute")
    assert(Rollup.refresh(spark, fact, ru) == 0L)
  }

  test("COMBINED equality-delete + moved-dim window TELESCOPES " +
    "fact-first: phase 1 re-derives the fact window against dims " +
    "as of their window STARTS, phase 2 applies the dim terms over " +
    "the static fact — one refresh call, bit-identical to the live " +
    "joined recompute, idempotent after") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf).localCheckpoint()
    val customer = Tables.customer(spark, sf).localCheckpoint()
    val root = Files.createTempDirectory("rollupEQD").toString
    val (fact, dim, ru) = (s"$root/fact", s"$root/dim", s"$root/rollup")
    val v1 = orders.filter(col("o_orderkey") % 10 =!= 7)
    Snapshot.createOrReplace(v1, fact, keepVersions = 4)
    Snapshot.createOrReplace(customer, dim, keepVersions = 4)
    Rollup.build(spark, fact, ru,
      Seq("c_mktsegment"), Seq("o_totalprice"),
      minMax = Seq("o_totalprice"),
      dims = Seq(Rollup.DimSpec(dim,
        Seq(("o_custkey", "c_custkey")))))
    def liveRecompute(): Set[(String, Long, Double, Double)] = {
      val f = Snapshot.read(spark, fact)
      val d2 = Snapshot.read(spark, dim)
      f.join(d2, f("o_custkey") === d2("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast(DecimalType(27, 6)))
            .cast(DoubleType).as("s"),
          min("o_totalprice").as("mn"))
        .as[(String, Long, Double, Double)].collect().toSet
    }
    def goldState(): Set[(String, Long, Double, Double)] =
      Rollup.read(spark, fact, ru)
        .select(col("c_mktsegment"), col("cnt"),
          col("sum_o_totalprice"), col("min_o_totalprice"))
        .as[(String, Long, Double, Double)].collect().toSet

    // ONE window, BOTH sides move. Fact: an EQUALITY delete whose
    // victims include per-segment minima (forces the re-derive to
    // recompute extrema through the join) plus a fresh append. Dim: a
    // position delete (its joined fact rows drop out) plus an append
    // that RE-SEGMENTS re-added customers (the moved-dim term).
    val lineage0 = Snapshot.read(spark, fact)
    val dimNow = Snapshot.read(spark, dim)
    val minVictims = lineage0.join(dimNow,
        lineage0("o_custkey") === dimNow("c_custkey"))
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("c_mktsegment").orderBy("o_totalprice")))
      .filter(col("_rk") <= 2).select(lineage0.columns.map(col): _*)
      .localCheckpoint()
    assert(minVictims.count() > 0)
    Snapshot.morCommit(spark, fact, deletes = Some(minVictims),
      appends = None, operation = "delete")
    Snapshot.morCommit(spark, fact, deletes = None,
      appends = Some(orders.orderBy("o_orderkey").limit(60)
        .withColumn("o_orderkey", col("o_orderkey") + 555000000L)),
      operation = "append")
    val dimVictim = Snapshot.readLineage(spark, dim)
      .orderBy("c_custkey").limit(2).localCheckpoint()
    Snapshot.morCommit(spark, dim, deletes = None, appends = None,
      operation = "delete", posDeletes = Some(dimVictim))
    Snapshot.morCommit(spark, dim, deletes = None,
      appends = Some(dimVictim.select(customer.columns.map(col): _*)
        .withColumn("c_mktsegment", lit("RESEGMENTED"))),
      operation = "append")

    assert(Rollup.refresh(spark, fact, ru) > 0L,
      "the combined window must PRICE, not raise")
    assert(goldState() == liveRecompute(),
      "telescoped combined window must equal the live recompute " +
        "exactly — counts, decimal sums, joined extrema")
    assert(Rollup.refresh(spark, fact, ru) == 0L, "and be idempotent")

    // a SECOND combined window over the refreshed store (regression:
    // the phase-1 marker must not confuse the next window's bounds)
    val dead2 = Snapshot.read(spark, fact)
      .filter(col("o_orderkey") % 9 === 1)
      .select("o_orderkey").localCheckpoint()
    assert(dead2.count() > 0)
    Snapshot.morCommit(spark, fact, deletes = Some(dead2),
      appends = None, operation = "delete")
    val dimVictim2 = Snapshot.readLineage(spark, dim)
      .orderBy(desc("c_custkey")).limit(1).localCheckpoint()
    Snapshot.morCommit(spark, dim, deletes = None, appends = None,
      operation = "delete", posDeletes = Some(dimVictim2))
    assert(Rollup.refresh(spark, fact, ru) > 0L)
    assert(goldState() == liveRecompute(),
      "an identifier-scoped equality delete + dim delete window " +
        "must also telescope exactly")
    assert(Rollup.refresh(spark, fact, ru) == 0L)
  }

  test("DIM-side equality windows (the CDC MERGE shape on a " +
    "dimension) PRICE via the dim re-derive: keyed deletes, a fan-out " +
    "update that re-segments customers, min/max through the join, " +
    "incremental MOR commits (never a rebuild), idempotent replay; " +
    "combined fact-eq + dim-eq telescopes both") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf).localCheckpoint()
    val customer = Tables.customer(spark, sf).localCheckpoint()
    val root = Files.createTempDirectory("rollupDEQ").toString
    val (fact, dim, ru) = (s"$root/fact", s"$root/dim", s"$root/rollup")
    Snapshot.createOrReplace(orders, fact, keepVersions = 6)
    Snapshot.createOrReplace(customer, dim, keepVersions = 6)
    Rollup.build(spark, fact, ru,
      Seq("c_mktsegment"), Seq("o_totalprice"),
      minMax = Seq("o_totalprice"),
      dims = Seq(Rollup.DimSpec(dim, Seq(("o_custkey", "c_custkey")))))
    def liveRecompute(): Set[(String, Long, Double, Double, Double)] = {
      val f = Snapshot.read(spark, fact)
      val d2 = Snapshot.read(spark, dim)
      f.join(d2, f("o_custkey") === d2("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast(DecimalType(27, 6)))
            .cast(DoubleType).as("s"),
          min("o_totalprice").as("mn"), max("o_totalprice").as("mx"))
        .as[(String, Long, Double, Double, Double)].collect().toSet
    }
    def gold(): Set[(String, Long, Double, Double, Double)] =
      Rollup.read(spark, fact, ru)
        .select(col("c_mktsegment"), col("cnt"),
          col("sum_o_totalprice"), col("min_o_totalprice"),
          col("max_o_totalprice"))
        .as[(String, Long, Double, Double, Double)].collect().toSet

    // window 1: an IDENTIFIER-SCOPED equality delete on the dim (the
    // keyed CDC DELETE — sidecar carries only c_custkey) — its joined
    // fact rows drop out of their groups, extrema recompute
    val dead = Snapshot.read(spark, dim)
      .filter(col("c_custkey") % 9 === 2)
      .select("c_custkey").localCheckpoint()
    assert(dead.count() > 0)
    Snapshot.morCommit(spark, dim, deletes = Some(dead),
      appends = None, operation = "delete")
    assert(Snapshot.windowHasEqualityDeletes(dim,
      Rollup.meta(ru).get.dims.head.version,
      Snapshot.currentVersion(dim).get),
      "the keyed dim DELETE must write an equality sidecar")
    assert(Rollup.refresh(spark, fact, ru) > 0L,
      "the dim equality window must PRICE, not raise")
    assert(gold() == liveRecompute(),
      "dim-eq re-derive must equal the live star recompute exactly")
    assert(Rollup.refresh(spark, fact, ru) == 0L, "and be idempotent")

    // window 2: the CDC MERGE upsert shape — a FULL-ROW equality
    // delete + re-append that RE-SEGMENTS customers (fan-out update):
    // their fact rows MOVE groups, both old and new groups re-derive
    val moved = Snapshot.read(spark, dim)
      .filter(col("c_custkey") % 9 === 4).localCheckpoint()
    assert(moved.count() > 0)
    Snapshot.morCommit(spark, dim, deletes = Some(moved),
      appends = Some(moved.withColumn("c_mktsegment",
        lit("RESEGMENTED"))),
      operation = "overwrite")
    assert(Rollup.refresh(spark, fact, ru) > 0L)
    assert(gold() == liveRecompute(),
      "a dim MERGE (delete + re-append) window must move the fact " +
        "rows' groups exactly — old groups shrink, RESEGMENTED grows")
    assert(Snapshot.read(spark, Rollup.tableDir(ru))
      .filter(col("c_mktsegment") === "RESEGMENTED").count() == 1L,
      "the re-segmented group must materialize")

    // the store advanced by an incremental marker-stamped MOR commit
    // (a rebuild would rebase and stamp "replace")
    assert(Snapshot.operationOf(Rollup.tableDir(ru),
        Snapshot.currentVersion(Rollup.tableDir(ru)).get)
      .exists(_.startsWith("rollup-to-v")),
      "the store must advance by marker-stamped MOR commits, " +
        "never a rebuild rebase")

    // crash replay: refresh a dim-eq window, roll the meta back to
    // the pre-refresh bytes (= died before the meta write) — the
    // replayed refresh must restamp only, never double-applying
    val metaFile = java.nio.file.Paths.get(ru, "_rollup_meta")
    val preMeta = Files.readAllBytes(metaFile)
    val dead2 = Snapshot.read(spark, dim)
      .filter(col("c_custkey") % 9 === 5)
      .select("c_custkey").localCheckpoint()
    Snapshot.morCommit(spark, dim, deletes = Some(dead2),
      appends = None, operation = "delete")
    assert(Rollup.refresh(spark, fact, ru) > 0L)
    Files.write(metaFile, preMeta)
    val commitsBefore = Snapshot.morVersions(Rollup.tableDir(ru)).size
    assert(Rollup.refresh(spark, fact, ru) == 0L,
      "a fully-applied dim-eq window must only restamp on replay")
    assert(Snapshot.morVersions(Rollup.tableDir(ru)).size
      == commitsBefore)
    assert(gold() == liveRecompute())

    // COMBINED fact-eq + dim-eq in ONE window: phase 1 re-derives the
    // fact window against the dim at its start, phase 2 the dim's
    // equality window over the static fact — two telescoped commits
    val factDead = Snapshot.read(spark, fact)
      .filter(col("o_orderkey") % 8 === 1)
      .select("o_orderkey").localCheckpoint()
    assert(factDead.count() > 0)
    Snapshot.morCommit(spark, fact, deletes = Some(factDead),
      appends = None, operation = "delete")
    val dead3 = Snapshot.read(spark, dim)
      .filter(col("c_custkey") % 9 === 7)
      .select("c_custkey").localCheckpoint()
    assert(dead3.count() > 0)
    Snapshot.morCommit(spark, dim, deletes = Some(dead3),
      appends = None, operation = "delete")
    assert(Rollup.refresh(spark, fact, ru) > 0L,
      "fact-eq + dim-eq in one refresh must price both phases")
    assert(gold() == liveRecompute(),
      "the double-telescoped window must equal the live recompute")
    assert(Rollup.refresh(spark, fact, ru) == 0L)
  }

  test("star-rollup crash replay: the marker records fact AND dim " +
    "window ends, so a replayed refresh applies only the unapplied " +
    "windows — never double-counting either side") {
    import spark.implicits._
    val root = Files.createTempDirectory("rollupJR").toString
    val (fact, dim, ru) = (s"$root/fact", s"$root/dim", s"$root/rollup")
    Snapshot.createOrReplace((1 to 200).map(i =>
      (i.toLong, (i % 10).toLong, (i % 13).toLong))
      .toDF("id", "cust_id", "qty"), fact, keepVersions = 2)
    Snapshot.createOrReplace((0 until 10).map(i =>
      (i.toLong, s"seg${i % 3}")).toDF("cust_key", "segment"),
      dim, keepVersions = 2)
    Rollup.build(spark, fact, ru, Seq("segment"), Seq("qty"),
      dims = Seq(Rollup.DimSpec(dim, Seq(("cust_id", "cust_key")))))
    def liveRecompute(): Set[(String, Long, Double)] = {
      val f = Snapshot.read(spark, fact)
      val d2 = Snapshot.read(spark, dim)
      f.join(d2, f("cust_id") === d2("cust_key"))
        .groupBy("segment")
        .agg(count(lit(1)).as("cnt"),
          sum(col("qty").cast(DecimalType(27, 6)))
            .cast(DoubleType).as("s"))
        .as[(String, Long, Double)].collect().toSet
    }
    def gold(): Set[(String, Long, Double)] =
      Rollup.read(spark, fact, ru)
        .select(col("segment"), col("cnt"), col("sum_qty"))
        .as[(String, Long, Double)].collect().toSet
    // crash shape: refresh a fact+dim window, then roll the meta back
    // to the pre-refresh bytes (= died before the meta write)
    val metaFile = java.nio.file.Paths.get(ru, "_rollup_meta")
    val preMeta = Files.readAllBytes(metaFile)
    Snapshot.morCommit(spark, fact, deletes = None,
      appends = Some(Seq((1001L, 3L, 5L)).toDF("id", "cust_id", "qty")),
      operation = "append")
    Snapshot.morCommit(spark, dim, deletes = None,
      appends = Some(Seq((3L, "segX")).toDF("cust_key", "segment")),
      operation = "append")
    assert(Rollup.refresh(spark, fact, ru) > 0L)
    Files.write(metaFile, preMeta)
    // a NEW dim window lands before the replay: the replayed refresh
    // must apply it alone (the marker pins both applied window ends)
    Snapshot.morCommit(spark, dim, deletes = None,
      appends = Some(Seq((4L, "segY")).toDF("cust_key", "segment")),
      operation = "append")
    assert(Rollup.refresh(spark, fact, ru) > 0L)
    assert(gold() == liveRecompute(),
      "the replay must not double-count the applied fact+dim windows")
    // pure replay (no new commits): restamp only, no new commit
    Files.write(metaFile, preMeta)
    val commitsBefore = Snapshot.morVersions(Rollup.tableDir(ru)).size
    assert(Rollup.refresh(spark, fact, ru) == 0L)
    assert(Snapshot.morVersions(Rollup.tableDir(ru)).size
      == commitsBefore)
    assert(gold() == liveRecompute())
  }

  test("EXPRESSION group keys (GROUP BY month bucket): the derived " +
    "key column maintains exactly under append and delete windows; " +
    "nondeterministic and colliding keys are refused at build") {
    val orders = Tables.orders(spark, sf).localCheckpoint()
    val root = Files.createTempDirectory("rollupE").toString
    val (src, ru) = (s"$root/src", s"$root/rollup")
    Snapshot.createOrReplace(orders.filter(col("o_orderkey") % 10
      =!= 7), src, keepVersions = 2)
    val bucket = "date_trunc('month', o_orderdate)"
    Rollup.build(spark, src, ru, Seq("omonth", "o_orderpriority"),
      Seq("o_totalprice"), minMax = Seq("o_totalprice"),
      exprCols = Seq(("omonth", bucket)))
    def recomputeE(f: DataFrame): Set[Seq[Any]] =
      f.withColumn("omonth", expr(bucket))
        .groupBy("omonth", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast(DecimalType(27, 6)))
            .cast(DoubleType).as("s"),
          min("o_totalprice").as("mn"))
        .collect().map(_.toSeq).toSet
    def gold(): Set[Seq[Any]] =
      Rollup.read(spark, src, ru)
        .select(col("omonth"), col("o_orderpriority"), col("cnt"),
          col("sum_o_totalprice"), col("min_o_totalprice"))
        .collect().map(_.toSeq).toSet
    assert(gold() == recomputeE(Snapshot.read(spark, src)
      .localCheckpoint()))
    // append window: the delta derives its bucket exactly as build did
    Snapshot.morCommit(spark, src, deletes = None,
      appends = Some(orders.filter(col("o_orderkey") % 10 === 7)),
      operation = "append")
    assert(Rollup.refresh(spark, src, ru) > 0L)
    assert(gold() == recomputeE(orders))
    // delete window: victims include bucket minima → the recompute
    // re-derives the key column too
    val victims = Snapshot.readLineage(spark, src)
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(expr(bucket))
          .orderBy("o_totalprice")))
      .filter(col("_rk") <= 2).localCheckpoint()
    Snapshot.morCommit(spark, src, deletes = None, appends = None,
      operation = "delete", posDeletes = Some(victims))
    assert(Rollup.refresh(spark, src, ru) > 0L)
    assert(gold() == recomputeE(Snapshot.read(spark, src)
      .localCheckpoint()))
    // guard rails: nondeterministic exprs and alias collisions refuse
    assert(intercept[IllegalArgumentException] {
      Rollup.build(spark, src, s"$root/bad1", Seq("r"), Nil,
        exprCols = Seq(("r", "rand()")))
    }.getMessage.contains("deterministic"))
    assert(intercept[IllegalArgumentException] {
      Rollup.build(spark, src, s"$root/bad2", Seq("o_orderkey"), Nil,
        exprCols = Seq(("o_orderkey", "o_orderkey + 1")))
    }.getMessage.contains("collides"))
  }

  test("TWO-dim star rollup: simultaneous windows on the fact and " +
    "BOTH dims price through the telescoped terms (dims before the " +
    "moving one at window END, after it at window START)") {
    import spark.implicits._
    val root = Files.createTempDirectory("rollupJ3").toString
    val (fact, dimC, dimP, ru) =
      (s"$root/fact", s"$root/dimc", s"$root/dimp", s"$root/rollup")
    Snapshot.createOrReplace((1 to 300).map(i => (i.toLong,
        (i % 10).toLong, (i % 5).toLong, (i % 13).toLong))
      .toDF("id", "cust", "prio", "qty"), fact, keepVersions = 2)
    Snapshot.createOrReplace((0 until 10).map(i =>
        (i.toLong, s"seg${i % 3}")).toDF("ckey", "seg"),
      dimC, keepVersions = 2)
    Snapshot.createOrReplace((0 until 5).map(i =>
        (i.toLong, s"p${i % 2}")).toDF("pkey", "pclass"),
      dimP, keepVersions = 2)
    Rollup.build(spark, fact, ru, Seq("seg", "pclass"), Seq("qty"),
      minMax = Seq("qty"),
      dims = Seq(Rollup.DimSpec(dimC, Seq(("cust", "ckey"))),
        Rollup.DimSpec(dimP, Seq(("prio", "pkey")))))
    def want(): Set[Seq[Any]] = {
      val f = Snapshot.read(spark, fact)
      val dc = Snapshot.read(spark, dimC)
      val dp = Snapshot.read(spark, dimP)
      f.join(dc, f("cust") === dc("ckey"))
        .join(dp, f("prio") === dp("pkey"))
        .groupBy("seg", "pclass")
        .agg(count(lit(1)).as("cnt"),
          sum(col("qty").cast(DecimalType(27, 6)))
            .cast(DoubleType).as("s"),
          min("qty").as("mn"), max("qty").as("mx"))
        .collect().map(_.toSeq).toSet
    }
    def gold(): Set[Seq[Any]] =
      Rollup.read(spark, fact, ru)
        .select("seg", "pclass", "cnt", "sum_qty", "min_qty", "max_qty")
        .collect().map(_.toSeq).toSet
    assert(gold() == want(), "build")
    // ONE refresh covering: a fact append, a fan-out append on dim 1,
    // a fan-out append AND a position-delete on dim 2 — every
    // telescoped term fires, with dim 1 read at window END inside
    // dim 2's term and dim 2 at window START inside dim 1's
    Snapshot.morCommit(spark, fact, deletes = None,
      appends = Some(Seq((9001L, 3L, 2L, 7L), (9002L, 15L, 1L, 3L))
        .toDF("id", "cust", "prio", "qty")),
      operation = "append")
    Snapshot.morCommit(spark, dimC, deletes = None,
      appends = Some(Seq((3L, "segX"), (15L, "seg0"))
        .toDF("ckey", "seg")),
      operation = "append")
    Snapshot.morCommit(spark, dimP, deletes = None,
      appends = Some(Seq((2L, "pX")).toDF("pkey", "pclass")),
      operation = "append")
    val vic = Snapshot.readLineage(spark, dimP)
      .filter(col("pkey") === 4L).localCheckpoint()
    Snapshot.morCommit(spark, dimP, deletes = None, appends = None,
      operation = "delete", posDeletes = Some(vic))
    assert(Rollup.refresh(spark, fact, ru) > 0L)
    assert(gold() == want(),
      "simultaneous fact + two-dim windows must maintain exactly")
    assert(Rollup.refresh(spark, fact, ru) == 0L)
    assert(gold() == want())

    // MIXED moved dims in ONE window (r17): dim 1 takes an EQUALITY
    // delete (the CDC MERGE shape) while dim 2 takes a POSITION
    // delete — the dim-side re-derive must price BOTH uniformly
    // (groups touched under either dim's old or new join state)
    val eqVic = Snapshot.read(spark, dimC)
      .filter(col("ckey") === 3L).select("ckey").localCheckpoint()
    assert(eqVic.count() > 0)
    Snapshot.morCommit(spark, dimC, deletes = Some(eqVic),
      appends = None, operation = "delete")
    val posVic = Snapshot.readLineage(spark, dimP)
      .filter(col("pkey") === 1L).localCheckpoint()
    assert(posVic.count() > 0)
    Snapshot.morCommit(spark, dimP, deletes = None, appends = None,
      operation = "delete", posDeletes = Some(posVic))
    assert(Rollup.refresh(spark, fact, ru) > 0L,
      "a mixed eq + position dim window must PRICE, not raise")
    assert(gold() == want(),
      "mixed moved dims must re-derive exactly — both dims' dropped " +
        "join partners leave their groups")
    assert(Rollup.refresh(spark, fact, ru) == 0L)
    assert(gold() == want())
  }

  test("JOIN rollup with a SAME-NAMED key keeps one copy and " +
    "maintains; dim columns can be group keys") {
    import spark.implicits._
    val orders = Tables.orders(spark, sf).localCheckpoint()
    val root = Files.createTempDirectory("rollupJ2").toString
    val (fact, dim, ru) = (s"$root/fact", s"$root/dim", s"$root/rollup")
    val v1 = orders.filter(col("o_orderkey") % 10 =!= 3)
    Snapshot.createOrReplace(v1, fact, keepVersions = 2)
    // dim keyed by the SAME column name the fact carries
    val prioDim = orders.select("o_orderpriority").distinct()
      .withColumn("prio_class",
        when(col("o_orderpriority") < "3", lit("hot"))
          .otherwise(lit("cold")))
      .localCheckpoint()
    Snapshot.createOrReplace(prioDim, dim, keepVersions = 2)
    Rollup.build(spark, fact, ru, Seq("prio_class"), Seq("o_totalprice"),
      dims = Seq(Rollup.DimSpec(dim,
        Seq(("o_orderpriority", "o_orderpriority")))))
    def recomputeJ(f: DataFrame): Set[(String, Long, Double)] =
      f.join(prioDim, Seq("o_orderpriority"))
        .groupBy("prio_class")
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast(DecimalType(27, 6)))
            .cast(DoubleType).as("s"))
        .as[(String, Long, Double)].collect().toSet
    def gold(): Set[(String, Long, Double)] =
      Rollup.read(spark, fact, ru)
        .select(col("prio_class"), col("cnt"),
          col("sum_o_totalprice"))
        .as[(String, Long, Double)].collect().toSet
    assert(gold() == recomputeJ(v1))
    Snapshot.morCommit(spark, fact, deletes = None,
      appends = Some(orders.filter(col("o_orderkey") % 10 === 3)),
      operation = "append")
    assert(Rollup.refresh(spark, fact, ru) > 0L)
    assert(gold() == recomputeJ(orders))
  }

  test("dim-window refresh on a JOIN-KEY-CLUSTERED fact prunes the " +
    "F' ⋈ ΔD fact read to the FILES holding the dim-delta keys " +
    "(pushed IN filter + any-of manifest skipping) — and stays exact") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import spark.implicits._
    val root = Files.createTempDirectory("rollupJP").toString
    val (fact, dim, ru) = (s"$root/fact", s"$root/dim", s"$root/ru")
    val facts = (1 to 64000).map(i =>
      (i.toLong, (i % 1600).toLong, (i % 13).toLong))
      .toDF("id", "cust_id", "qty")
    val dimDf = (0 until 1600).map(i => (i.toLong, s"seg${i % 5}"))
      .toDF("cust_key", "segment")
    Snapshot.createOrReplace(facts, fact, keepVersions = 2)
    // cluster the fact on the JOIN KEY: 16 sorted files + the scan
    // manifest (what a 100-TB star layout does for its FK)
    Snapshot.rewriteSorted(spark, fact, 16, Seq(col("cust_id")))
    Snapshot.createOrReplace(dimDf, dim, keepVersions = 2)
    Rollup.build(spark, fact, ru, Seq("segment"), Seq("qty"),
      dims = Seq(Rollup.DimSpec(dim, Seq(("cust_id", "cust_key")))))
    // a dim delta touching a NARROW key neighborhood (8 of 1600 keys)
    val wave = (0 until 8).map(i => (i.toLong, "segZ"))
      .toDF("cust_key", "segment")
    Snapshot.morCommit(spark, dim, deletes = None,
      appends = Some(wave), operation = "append")
    // capture every fact-file scan the refresh executes
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case f: FileSourceScanExec => Seq(f)
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec => allScans(q.plan)
    }.flatten
    val factScans =
      scala.collection.concurrent.TrieMap.empty[Long, Long]
    val listener =
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          allScans(qe.executedPlan).foreach { f =>
            if (f.relation.location.rootPaths.exists(p =>
                p.toUri.getPath.startsWith(fact)))
              factScans.put(f.id, f.metrics("numFiles").value)
          }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      }
    spark.listenerManager.register(listener)
    try {
      assert(Rollup.refresh(spark, fact, ru) > 0L)
      // the execution listener bus is async — wait for the records
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (factScans.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(100)
    } finally spark.listenerManager.unregister(listener)
    assert(factScans.nonEmpty,
      "the dim-window refresh must have read the fact (F' ⋈ ΔD)")
    assert(factScans.values.forall(_ <= 4),
      s"the pruned fact read must keep numFiles bounded " +
        s"(8 of 1600 keys over 16 sorted files): $factScans")
    // and the maintained store equals the recompute over live state
    val want = Snapshot.read(spark, fact)
      .join(Snapshot.read(spark, dim),
        col("cust_id") === col("cust_key"))
      .groupBy("segment").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toSet
    val got = Rollup.read(spark, fact, ru)
      .select(col("segment"), col("cnt"))
      .as[(String, Long)].collect().toSet
    assert(got == want,
      "the file-pruned dim-window refresh must stay exact")
  }

  test("an OVERSIZED delta (past the IN-literal budget) prunes the " +
    "fact with the in-plan BLOOM instead of a full scan — the " +
    "signed dim term, the dim-eq re-derive, and the fact-eq " +
    "affected-group recompute all stay exact past the budget") {
    import spark.implicits._
    // shrink the literal budget so every arm crosses it with a small
    // fixture — the bloom path is the one under test, and its
    // contract (a SUPERSET prune; the join downstream is exact) is
    // size-independent
    Rollup.maxDimDeltaKeysForTests = Some(8)
    try {
      val root = Files.createTempDirectory("rollupBP").toString
      val (fact, dim, ru) = (s"$root/fact", s"$root/dim", s"$root/ru")
      val facts = (1 to 3000).map(i =>
        (i.toLong, (i % 100).toLong, (i % 25).toLong,
          (i % 7).toDouble))
        .toDF("id", "cust", "grp", "amt")
      val dimDf = (0 until 100).map(i => (i.toLong, s"seg${i % 5}"))
        .toDF("cust_key", "segment")
      Snapshot.createOrReplace(facts, fact, keepVersions = 2)
      Snapshot.createOrReplace(dimDf, dim, keepVersions = 2)
      Rollup.build(spark, fact, ru, Seq("grp"), Seq("amt"),
        minMax = Seq("amt"),
        dims = Seq(Rollup.DimSpec(dim, Seq(("cust", "cust_key")))))
      def live(): Set[(Long, Long, Double, Double)] = {
        val f = Snapshot.read(spark, fact)
        val d2 = Snapshot.read(spark, dim)
        f.join(d2, f("cust") === d2("cust_key"))
          .groupBy("grp")
          .agg(count(lit(1)).as("cnt"),
            sum(col("amt").cast(DecimalType(27, 6)))
              .cast(DoubleType).as("s"),
            min("amt").as("mn"))
          .as[(Long, Long, Double, Double)].collect().toSet
      }
      def gold(): Set[(Long, Long, Double, Double)] =
        Rollup.read(spark, fact, ru)
          .select(col("grp"), col("cnt"), col("sum_amt"),
            col("min_amt"))
          .as[(Long, Long, Double, Double)].collect().toSet

      // (1) fact EQUALITY window touching 25 groups (> 8): the
      // affected-group recompute's fact prune takes the bloom arm
      val victims = Snapshot.read(spark, fact)
        .filter(col("id") % 40 === 0).localCheckpoint()
      Snapshot.morCommit(spark, fact, deletes = Some(victims),
        appends = None, operation = "delete")
      assert(Rollup.refresh(spark, fact, ru) > 0L)
      assert(gold() == live(),
        "the bloom-pruned fact-eq re-derive must stay exact")

      // (2) dim POSITION-delete + append window replacing 40 keys
      // (> 8): the signed F' ⋈ ΔD term's fact prune takes the bloom
      // arm on both delta sides
      val dimVictims = Snapshot.readLineage(spark, dim)
        .filter(col("cust_key") < 40).localCheckpoint()
      Snapshot.morCommit(spark, dim, deletes = None,
        appends = Some((0 until 40).map(i => (i.toLong, "segNEW"))
          .toDF("cust_key", "segment")),
        operation = "update", posDeletes = Some(dimVictims))
      assert(Rollup.refresh(spark, fact, ru) > 0L)
      assert(gold() == live(),
        "the bloom-pruned signed dim term must stay exact")

      // (3) dim EQUALITY window deleting 20 keys (> 8): the dim-side
      // re-derive's fact prune takes the bloom arm
      val dimEq = Snapshot.read(spark, dim)
        .filter(col("cust_key") >= 80).localCheckpoint()
      Snapshot.morCommit(spark, dim, deletes = Some(dimEq),
        appends = None, operation = "delete")
      assert(Rollup.refresh(spark, fact, ru) > 0L)
      assert(gold() == live(),
        "the bloom-pruned dim-eq re-derive must stay exact")
      assert(Rollup.refresh(spark, fact, ru) == 0L)
    } finally Rollup.maxDimDeltaKeysForTests = None
  }
}
