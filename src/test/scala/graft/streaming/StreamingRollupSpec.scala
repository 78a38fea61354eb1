package graft.streaming

import graft.{SparkSpec, Tables}
import graft.pipeline.{Rollup, Snapshot}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** ST10 pins: per-batch fact appends + rollup refreshes, exactly-once
  * across a restart replay, fresh-checkpoint restarts not mistaken
  * for replays, and the maintained aggregate always equal to the
  * recompute of the streamed facts. */
class StreamingRollupSpec extends SparkSpec {
  import spark.implicits._

  private def factSchema = Tables.orders(spark, "/root/testdata/sf0.001")
    .select("o_orderkey", "o_orderpriority", "o_totalprice").schema

  private def recompute(df: DataFrame): Set[(String, Long, Double)] =
    df.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(DecimalType(27, 6)))
          .cast(DoubleType).as("s"))
      .as[(String, Long, Double)].collect().toSet

  private def served(src: String, ru: String): Set[(String, Long, Double)] =
    Rollup.read(spark, src, ru)
      .select(col("o_orderpriority"), col("cnt"),
        col("sum_o_totalprice").as("s"))
      .as[(String, Long, Double)].collect().toSet

  test("micro-batches append facts + refresh the rollup O(delta); " +
    "an idle restart replays nothing; the maintained aggregate " +
    "equals the recompute after every wave") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .localCheckpoint()
    val root = Files.createTempDirectory("strru").toString
    val facts = s"$root/facts"
    val table = s"$root/table"
    val ru = s"$root/rollup"
    val cp = s"$root/cp"

    val w1 = orders.filter(col("o_orderkey") % 3 === 0).localCheckpoint()
    w1.write.parquet(facts)
    StreamingRollup.start(spark, facts, factSchema, table, ru, cp,
      Seq("o_orderpriority"), Seq("o_totalprice"))
      .awaitTermination(60000)
    assert(Snapshot.read(spark, table).count() == w1.count())
    assert(served(table, ru) == recompute(w1),
      "the bootstrapped rollup must equal the wave-1 recompute")

    val w2 = orders.filter(col("o_orderkey") % 3 =!= 0).localCheckpoint()
    w2.write.mode("append").parquet(facts)
    StreamingRollup.start(spark, facts, factSchema, table, ru, cp,
      Seq("o_orderpriority"), Seq("o_totalprice"))
      .awaitTermination(60000)
    assert(Snapshot.read(spark, table).count() == orders.count())
    assert(Snapshot.morVersions(table).nonEmpty,
      "wave-2 facts must land as fast-append sidecars")
    assert(served(table, ru) == recompute(orders),
      "the streamed rollup must equal the full recompute")

    // idle restart: nothing new — no commit, no rollup movement
    val v = Snapshot.currentVersion(table)
    val rv = Snapshot.currentVersion(Rollup.tableDir(ru))
    StreamingRollup.start(spark, facts, factSchema, table, ru, cp,
      Seq("o_orderpriority"), Seq("o_totalprice"))
      .awaitTermination(60000)
    assert(Snapshot.currentVersion(table) == v)
    assert(Snapshot.currentVersion(Rollup.tableDir(ru)) == rv)
  }

  test("a replayed BOOTSTRAP batch (crash between the bootstrap " +
    "commit and the checkpoint advance) is recognized by its marker " +
    "and not re-appended — keyless facts would otherwise silently " +
    "double-count forever") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .localCheckpoint()
    val root = Files.createTempDirectory("strrubr").toString
    val table = s"$root/table"
    val ru = s"$root/rollup"
    val cp = s"$root/cp"
    val w1 = orders.filter(col("o_orderkey") % 3 === 0).localCheckpoint()
    // applyBatch IS the foreachBatch body; calling it twice with the
    // same batchId is the at-least-once redelivery after a crash
    // before the checkpoint commit
    def run(): Unit = StreamingIndex.applyBatch(spark, w1, 0L, table,
      cp, dedupKey = None,
      artifactExists = Rollup.meta(ru).isDefined,
      bootstrap = Rollup.build(spark, table, ru,
        Seq("o_orderpriority"), Seq("o_totalprice")),
      refresh = Rollup.refresh(spark, table, ru))
    run()
    val v = Snapshot.currentVersion(table)
    run()
    assert(Snapshot.read(spark, table).count() == w1.count(),
      "the replayed bootstrap batch must not re-append its rows")
    assert(Snapshot.currentVersion(table) == v,
      "the replay must not commit at all")
    assert(served(table, ru) == recompute(w1))
  }

  test("a restart on a FRESH checkpoint (batch ids restart at 0) is " +
    "not mistaken for a replay: the re-fed rows reach the facts and " +
    "the rollup") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .localCheckpoint()
    val root = Files.createTempDirectory("strrufc").toString
    val facts = s"$root/facts"
    val table = s"$root/table"
    val ru = s"$root/rollup"
    val w1 = orders.filter(col("o_orderkey") % 3 === 0).localCheckpoint()
    w1.write.parquet(facts)
    StreamingRollup.start(spark, facts, factSchema, table, ru,
      s"$root/cp1", Seq("o_orderpriority"), Seq("o_totalprice"))
      .awaitTermination(60000)
    // a FRESH checkpoint re-feeds everything plus a new wave; its
    // batch 0 must not be dropped as "replay of the old batch 0" —
    // but re-fed rows DO double-count without keys, so feed only the
    // new wave through the fresh checkpoint (the documented contract:
    // the marker is scoped per checkpoint; content dedup is upstream)
    val w2 = orders.filter(col("o_orderkey") % 3 === 1).localCheckpoint()
    val facts2 = s"$root/facts2"
    w2.write.parquet(facts2)
    StreamingRollup.start(spark, facts2, factSchema, table, ru,
      s"$root/cp2", Seq("o_orderpriority"), Seq("o_totalprice"))
      .awaitTermination(60000)
    assert(Snapshot.read(spark, table).count()
      == w1.count() + w2.count(),
      "a fresh checkpoint's batch 0 must not be dropped as a replay")
    assert(served(table, ru) == recompute(w1.unionByName(w2)))
  }

  test("a streamed STAR rollup: fact micro-batches maintain the " +
    "joined aggregate; a dim change between waves refreshes " +
    "incrementally through the same loop") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .localCheckpoint()
    val customer = Tables.customer(spark, "/root/testdata/sf0.001")
      .select("c_custkey", "c_mktsegment").localCheckpoint()
    val root = Files.createTempDirectory("strrustar").toString
    val (facts, table, dim, ru, cp) = (s"$root/facts", s"$root/table",
      s"$root/dim", s"$root/rollup", s"$root/cp")
    Snapshot.createOrReplace(customer, dim, keepVersions = 2)
    val schema = orders.schema
    def joinedRecompute(): Set[(String, Long, Double)] = {
      val f = Snapshot.read(spark, table)
      val d = Snapshot.read(spark, dim)
      f.join(d, f("o_custkey") === d("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast(DecimalType(27, 6)))
            .cast(DoubleType).as("s"))
        .as[(String, Long, Double)].collect().toSet
    }
    def goldStar(): Set[(String, Long, Double)] =
      Rollup.read(spark, table, ru)
        .select(col("c_mktsegment"), col("cnt"),
          col("sum_o_totalprice").as("s"))
        .as[(String, Long, Double)].collect().toSet
    def run(): Unit =
      StreamingRollup.start(spark, facts, schema, table, ru, cp,
        Seq("c_mktsegment"), Seq("o_totalprice"),
        dims = Seq(Rollup.DimSpec(dim,
          Seq(("o_custkey", "c_custkey"))))).awaitTermination(60000)

    val w1 = orders.filter(col("o_orderkey") % 3 === 0).localCheckpoint()
    w1.write.parquet(facts)
    run()
    assert(goldStar() == joinedRecompute(),
      "the bootstrapped star rollup must equal the joined recompute")

    // a DIM fan-out append lands between waves; the next wave's
    // refresh prices the fact batch AND the dim window together
    Snapshot.morCommit(spark, dim, deletes = None,
      appends = Some(customer.orderBy("c_custkey").limit(1)),
      operation = "append")
    val w2 = orders.filter(col("o_orderkey") % 3 =!= 0).localCheckpoint()
    w2.write.mode("append").parquet(facts)
    run()
    assert(goldStar() == joinedRecompute(),
      "the streamed star rollup must absorb the dim window too")
  }

  test("ST10 composes with stale-serve compensation: a SQL reader " +
    "BETWEEN micro-batches — an out-of-band fact commit landed and " +
    "the next wave has not refreshed — serves store ⊎ in-flight " +
    "window (reads the streamed gold store + window sidecars only) " +
    "and equals the live recompute; the next wave's refresh returns " +
    "the query to the plain store serve") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .localCheckpoint()
    val root = Files.createTempDirectory("strrucomp").toString
    val (facts, table, ru, cp) =
      (s"$root/facts", s"$root/table", s"$root/rollup", s"$root/cp")
    def run(): Unit =
      StreamingRollup.start(spark, facts, factSchema, table, ru, cp,
        Seq("o_orderpriority"), Seq("o_totalprice"))
        .awaitTermination(60000)
    val w1 = orders.filter(col("o_orderkey") % 3 === 0).localCheckpoint()
    w1.write.parquet(facts)
    run()
    // register the STREAM-maintained pair for the SQL rewrite — the
    // same linkage CALL create_rollup records
    graft.catalog.TableStore.reset(spark)
    val ts = new graft.catalog.TableStore(spark)
    ts.registerSnapshot("stc", "facts", table)
    ts.registerSnapshot("stc", "gold", Rollup.tableDir(ru))
    ts.setProperties("stc", "gold", Map(
      "graft.rollup.dir" -> ru, "graft.rollup.source" -> table))
    def leafPaths(df: DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collectLeaves().flatMap {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              f.location.rootPaths.map(_.toUri.getPath)
            case _ => Nil
          }
        case _ => Nil
      }
    val q = """SELECT o_orderpriority, count(*) AS c,
      CAST(sum(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS s
      FROM stc.facts GROUP BY o_orderpriority"""
    def answers(df: DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    def liveRecompute(): Set[Seq[Any]] = {
      spark.conf.set("spark.graft.rollup.rewrite.enabled", "false")
      try answers(spark.sql(q))
      finally
        spark.conf.set("spark.graft.rollup.rewrite.enabled", "true")
    }
    assert(leafPaths(spark.sql(q)).exists(_.startsWith(s"$ru/")),
      "the fresh streamed store must serve the SQL aggregate")
    // an out-of-band commit lands BETWEEN micro-batches
    val ob = orders.filter(col("o_orderkey") % 3 === 1).localCheckpoint()
    Snapshot.morCommit(spark, table, deletes = None,
      appends = Some(ob), operation = "append")
    val mid = spark.sql(q)
    val midLeaves = leafPaths(mid)
    assert(midLeaves.exists(_.startsWith(s"$ru/")),
      "a mid-stream reader must be served by compensation")
    val tableLeaves = midLeaves.filter(p => p == table ||
      p.startsWith(s"$table/"))
    assert(tableLeaves.nonEmpty &&
        tableLeaves.forall(_.contains("/_mor/")),
      "the compensation must read ONLY the in-flight window " +
        s"sidecars: $tableLeaves")
    assert(answers(mid) == liveRecompute(),
      "the mid-stream serve must be the LIVE answer")
    // the next wave refreshes through the stream; the same query
    // returns to the plain store serve with the same answer
    val w3 = orders.filter(col("o_orderkey") % 3 === 2).localCheckpoint()
    w3.write.mode("append").parquet(facts)
    run()
    val post = spark.sql(q)
    val postLeaves = leafPaths(post)
    assert(postLeaves.exists(_.startsWith(s"$ru/")) &&
        !postLeaves.exists(p => p == table ||
          p.startsWith(s"$table/")),
      "the refreshed store must serve plain again")
    assert(answers(post) == liveRecompute())
  }

  test("out-of-band fact DML does not wedge the stream: an equality " +
    "delete prices via re-derive; a copy-on-write rebase routes " +
    "through the TYPED unpriceable catch to the rebuild fallback") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .localCheckpoint()
    val root = Files.createTempDirectory("strruwedge").toString
    val facts = s"$root/facts"
    val table = s"$root/table"
    val ru = s"$root/rollup"
    val cp = s"$root/cp"
    def run(): Unit =
      StreamingRollup.start(spark, facts, factSchema, table, ru, cp,
        Seq("o_orderpriority"), Seq("o_totalprice"))
        .awaitTermination(60000)

    val w1 = orders.filter(col("o_orderkey") % 3 === 0).localCheckpoint()
    w1.coalesce(1).write.parquet(facts)
    run()
    // an OUT-OF-BAND DML lands an equality delete on the fact table
    // between waves — since r15 this window is PRICED (affected-group
    // re-derive), so it must neither wedge the stream nor rebuild
    val victims = w1.orderBy("o_orderkey").limit(5).localCheckpoint()
    Snapshot.morCommit(spark, table, deletes = Some(victims),
      appends = None, operation = "delete")
    val w2 = orders.filter(col("o_orderkey") % 3 === 1).localCheckpoint()
    w2.coalesce(1).write.mode("append").parquet(facts)
    run() // must not throw: the refresh prices the equality window
    val live = Snapshot.read(spark, table).localCheckpoint()
    assert(live.count() == w1.count() - 5 + w2.count())
    assert(served(table, ru) == recompute(live),
      "the maintained rollup must equal the recompute of the live " +
        "facts after the equality window")
    // a genuinely unpriceable event — an out-of-band COPY-ON-WRITE
    // rebase collapses the per-commit deltas — must route through the
    // TYPED UnpriceableWindowException catch to the rebuild fallback
    // (message-substring dispatch would silently re-wedge on any
    // rewording), and the stream resumes O(delta) after it
    Snapshot.createOrReplace(live, table, keepVersions = 2)
    val w3 = orders.filter(col("o_orderkey") % 3 === 2).localCheckpoint()
    w3.coalesce(1).write.mode("append").parquet(facts)
    run() // must not throw: the refresh rebuilds instead
    assert(served(table, ru) ==
      recompute(Snapshot.read(spark, table)),
      "the stream must fall back to the rebuild on a rebased window " +
        "and resume exact maintenance")
  }
}
