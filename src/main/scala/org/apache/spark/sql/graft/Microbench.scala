package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-benchmark: decompose the fixed per-job cost that
  * Profile showed dominating the bench (3254 jobs, ~120 ms each).
  * Times, in a warm session: bare jobs, tiny parquet writes, tiny
  * parquet reads, localCheckpoints, and a representative
  * Snapshot/Rollup lifecycle with per-phase wall clock. */
object Microbench {
  private def time[T](label: String, n: Int = 20)(body: => T): Unit = {
    body // warm
    val t0 = System.nanoTime()
    (1 to n).foreach(_ => body)
    val dt = (System.nanoTime() - t0) / 1e6 / n
    println(f"MICRO $label%-46s ${dt}%8.1f ms/op")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("micro").toString

    time("range(1).count (bare 1-task job)") {
      spark.range(1).count() }
    time("range(32).repartition(32).count (shuffle job)") {
      spark.range(32).repartition(32).count() }
    val tiny = (1 to 100).map(i => (i, s"v$i")).toDF("k", "v")
    var i = 0
    time("tiny df.write.parquet (fresh dir)") {
      i += 1; tiny.write.parquet(s"$root/w$i") }
    tiny.write.parquet(s"$root/rsrc")
    time("spark.read.parquet(...).count (tiny)") {
      spark.read.parquet(s"$root/rsrc").count() }
    time("spark.read.parquet (plan only, no action)") {
      spark.read.parquet(s"$root/rsrc").filter(col("k") > 0) }
    time("tiny df.localCheckpoint()") {
      tiny.localCheckpoint().unpersist(blocking = true) }
    time("agg + write (shuffle then write)") {
      i += 1
      tiny.groupBy("v").agg(sum("k").as("s")).write.parquet(s"$root/a$i") }
    // representative lifecycle, phase-timed once
    val S = graft.pipeline.Snapshot
    val orders = graft.Tables.orders(spark,
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    def phase[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PHASE $label%-46s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
      r
    }
    val src = s"$root/src"; val ru = s"$root/ru"
    phase("Snapshot.createOrReplace(orders90)") {
      S.createOrReplace(orders.filter(col("o_orderkey") % 10 =!= 7), src,
        keepVersions = 1) }
    phase("Rollup.build (1 dim-less, sum+minmax+ndv)") {
      graft.pipeline.Rollup.build(spark, src, ru,
        Seq("o_orderpriority"), Seq("o_totalprice"),
        minMax = Seq("o_totalprice"), ndv = Seq("o_custkey"), ndvK = 64) }
    phase("morCommit(append 10%)") {
      S.morCommit(spark, src, deletes = None,
        appends = Some(orders.filter(col("o_orderkey") % 10 === 7)),
        operation = "append") }
    phase("Rollup.refresh (append window)") {
      graft.pipeline.Rollup.refresh(spark, src, ru) }
    phase("morCommit(posDelete 1%)") {
      S.morCommit(spark, src, deletes = None, appends = None,
        operation = "delete",
        posDeletes = Some(S.readLineage(spark, src)
          .filter(col("o_orderkey") % 100 === 1))) }
    phase("Rollup.refresh (pos-delete window)") {
      graft.pipeline.Rollup.refresh(spark, src, ru) }
    phase("Rollup.refresh (no-op)") {
      graft.pipeline.Rollup.refresh(spark, src, ru) }
    phase("Rollup.read + count") {
      graft.pipeline.Rollup.read(spark, src, ru).count() }
    spark.stop()
  }
}
