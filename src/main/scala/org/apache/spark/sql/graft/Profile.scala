package org.apache.spark.sql.graft

import graft.SparkEntry
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Measurement harness for the optimization rounds (guide §1): runs
  * named queries exactly as Bench does, but with a listener recording
  * job/stage/task counts and task-time totals, so per-query cost can
  * be split into "Spark work" vs "fixed per-job overhead". Also dumps
  * `.explain("formatted")` per query when SPARK_GRAFT_PLAN_DIR is set.
  * Not part of the driver contract; dev-only. */
object Profile {
  private class Acc extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskTimeMs = new java.util.concurrent.atomic.AtomicLong
    val gcTimeMs = new java.util.concurrent.atomic.AtomicLong
    val shuffleReadB = new java.util.concurrent.atomic.AtomicLong
    val shuffleWriteB = new java.util.concurrent.atomic.AtomicLong
    val inputB = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      stages.incrementAndGet()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = t.taskMetrics
      if (m != null) {
        taskTimeMs.addAndGet(m.executorRunTime)
        gcTimeMs.addAndGet(m.jvmGCTime)
        shuffleReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        inputB.addAndGet(m.inputMetrics.bytesRead)
      }
    }
    def snap(): Map[String, Long] = Map(
      "jobs" -> jobs.get.toLong, "stages" -> stages.get.toLong,
      "tasks" -> tasks.get.toLong, "taskTimeMs" -> taskTimeMs.get,
      "gcTimeMs" -> gcTimeMs.get, "shuffleReadB" -> shuffleReadB.get,
      "shuffleWriteB" -> shuffleWriteB.get, "inputB" -> inputB.get)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names0 = SparkEntry.queries.keys.toSeq.sorted
    val names = if (args.isEmpty) names0
                else names0.filter(args.toSet.contains)
    // warmup identical to Bench
    try { SparkEntry.queries("q_cdc_bronze")(spark, sfDir).count() }
    catch { case _: Throwable => () }
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    val rows = mutable.ArrayBuffer.empty[String]
    names.foreach { n =>
      val before = acc.snap()
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        planDir.foreach { dd =>
          val p = java.nio.file.Paths.get(dd)
          java.nio.file.Files.createDirectories(p)
          java.nio.file.Files.writeString(p.resolve(s"$n.txt"),
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
        }
        df.count()
      } catch { case e: Throwable =>
        System.err.println(s"[profile] $n failed: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!baseline.contains(id)) rdd.unpersist(blocking = true)
      }
      // listener events are async; settle before snapping
      spark.sparkContext.listenerBus.waitUntilEmpty()
      val after = acc.snap()
      def d(k: String) = after(k) - before(k)
      rows += f"""{"q":"$n","sec":$dt%.3f,"jobs":${d("jobs")},"stages":${d("stages")},"tasks":${d("tasks")},"taskSec":${d("taskTimeMs") / 1e3}%.2f,"gcSec":${d("gcTimeMs") / 1e3}%.2f,"shufMB":${d("shuffleReadB") / 1e6}%.1f,"inMB":${d("inputB") / 1e6}%.1f}"""
    }
    println("PROFILE_BEGIN")
    rows.foreach(println)
    println("PROFILE_END")
    val out = sys.env.getOrElse("SPARK_GRAFT_PROFILE_OUT", "/tmp/profile_out.jsonl")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      rows.mkString("", "\n", "\n"))
    spark.stop()
  }
}
