package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed steady-state warmup: JIT/codegen the scan+shuffle paths
    // and materialize the shared bronze fixture, so per-query numbers
    // measure the operators, not JVM startup or test-data synthesis.
    try { SparkEntry.queries("q_cdc_bronze")(spark, sfDir).count() }
    catch { case _: Throwable => () }
    // Several operators pin intermediates via localCheckpoint (the
    // documented cluster-parity choice); in a 55-query single-JVM run
    // those blocks would otherwise accumulate and GC-thrash whichever
    // queries run late. Drop everything each query leaves behind,
    // keeping only the pre-warmup baseline (the shared bronze fixture).
    // The release is BLOCKING: an async unpersist storm racing the next
    // query's jobs was the r03 bench's one measured pathology
    // (q_fingerprints 28-54s in-context vs 2-4s isolated), so each
    // query now starts from a settled block manager and a fresh GC.
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    val gcBetween = sys.env.getOrElse("SPARK_GRAFT_BENCH_GC", "1") == "1"
    def releaseLeaked(): Unit = {
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!baseline.contains(id)) rdd.unpersist(blocking = true)
      }
      if (gcBetween) System.gc()
    }
    def timed(name: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      releaseLeaked()
      dt
    }
    // Fixed (sorted) query order so cross-round per-query numbers are
    // comparable run-to-run regardless of Map iteration order.
    // Optional trailing args restrict the run (dev iteration only; the
    // driver passes none → full suite).
    val names0 = SparkEntry.queries.keys.toSeq.sorted
    val names =
      if (args.isEmpty) names0 else names0.filter(args.toSet.contains)
    val results = names.map(n => n -> timed(n))
    // Outlier audit: any query that cost >3x the run median (and >2s
    // absolute) gets one isolated re-measurement (post-release,
    // post-GC) so the record distinguishes a slow plan from harness
    // interaction / host contention without needing a separate run.
    val sortedTimes = results.map(_._2).filter(_ >= 0).sorted
    val median =
      if (sortedTimes.isEmpty) 0.0 else sortedTimes(sortedTimes.size / 2)
    // The audit runs LAST in an aged JVM (90+ queries of accumulated
    // broadcasts/shuffle dirs); a single re-measure can catch a cleanup
    // stall and read worse than in-context. min-of-two keeps the audit
    // a plan signal rather than a JVM-aging signal.
    val isolated = results.collect {
      case (n, t) if median > 0 && t > 3 * median && t > 2.0 =>
        n -> math.min(timed(n), timed(n))
    }
    def jmap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(results)},"isolated":${jmap(isolated)},"sf":"$sfDir"}"""
    println(json)
    // Persist the full record too: the driver's captured stdout has
    // been tail-truncated two rounds running, losing per-query numbers
    // — the on-disk copy is the durable round-over-round record.
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json"))
    java.nio.file.Files.write(out,
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
