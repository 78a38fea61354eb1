package org.apache.spark.sql.graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev-only: per-job trace (duration + call site) of a named query's
  * lifecycle, to find which engine calls spawn the jobs. */
object Microbench3 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.isEmpty) Seq("q_rollup_maintain") else args.toSeq
    // warm
    try { graft.SparkEntry.queries(names.head)(spark, sfDir).count() }
    catch { case e: Throwable => println(s"warm failed: $e") }
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse("?")
        val nTasks = j.stageInfos.map(_.numTasks).sum
        starts.put(j.jobId, (System.nanoTime(), site, nTasks))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (t0, site, nTasks) = starts.getOrDefault(j.jobId, (0L, "?", 0))
        lines.add(f"JOB ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e6}%8.1f ms tasks=$nTasks%4d  $site")
      }
    })
    // in-process sampler of the MAIN thread: histogram of collapsed
    // frame prefixes, to see where driver gap time goes between jobs
    val mainThread = Thread.currentThread()
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val st = mainThread.getStackTrace
        if (st.nonEmpty) {
          val frames = st.iterator
            .map(f => s"${f.getClassName}.${f.getMethodName}")
            .filterNot(f => f.startsWith("java.") ||
              f.startsWith("jdk.") || f.startsWith("scala.collection"))
            .take(3).mkString(" <- ")
          if (frames.nonEmpty)
            hist.merge(frames, 1, (x, y) => x + y)
        }
        Thread.sleep(10)
      }
    }, "graft-sampler")
    sampler.setDaemon(true)
    sampler.start()
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    names.foreach { n =>
      lines.add(s"=== $n ===")
      val t0 = System.nanoTime()
      try { graft.SparkEntry.queries(n)(spark, sfDir).count() }
      catch { case e: Throwable => println(s"$n failed: $e") }
      lines.add(f"=== $n total ${(System.nanoTime() - t0) / 1e9}%.2f s ===")
      // match Bench: blocking release of the query's checkpoint
      // blocks + GC, so runs don't contaminate each other
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!baseline.contains(id)) rdd.unpersist(blocking = true)
      }
      System.gc()
    }
    sampling = false
    import scala.jdk.CollectionConverters._
    hist.asScala.toSeq.sortBy(-_._2).take(40).foreach { case (f, c) =>
      lines.add(f"SAMPLE $c%6d  $f")
    }
    spark.sparkContext.listenerBus.waitUntilEmpty()
    lines.forEach(println)
    spark.stop()
  }
}
