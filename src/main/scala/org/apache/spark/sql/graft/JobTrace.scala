package org.apache.spark.sql.graft

import graft.SparkEntry
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev-only: list every Spark job a named query runs — description,
  * call site, task count, wall ms — so action-count-bound queries
  * (the r19 profile's dominant cost class) can be attacked job by
  * job. Usage: runMain ...JobTrace q_rollup_maintain */
object JobTrace {
  private case class J(id: Int, desc: String, site: String,
                       tasks: Int, var ms: Long, t0: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val jobs = mutable.ArrayBuffer.empty[J]
    val active = mutable.Map.empty[Int, J]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        active.synchronized {
          val d = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          // stage names carry the call site ("parquet at Foo.scala:12")
          val s = e.stageInfos.map(_.name.takeWhile(_ != '\n'))
            .distinct.mkString(" | ").take(120)
          val j = J(e.jobId, d, s,
            e.stageInfos.map(_.numTasks).sum, 0L, System.nanoTime())
          active(e.jobId) = j
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        active.synchronized {
          active.remove(e.jobId).foreach { j =>
            j.ms = (System.nanoTime() - j.t0) / 1000000L
            jobs += j
          }
        }
    })
    // warmup identical to Bench
    try { SparkEntry.queries("q_cdc_bronze")(spark, sfDir).count() }
    catch { case _: Throwable => () }
    args.foreach { n =>
      // run once untimed so per-JVM fixtures are built, then trace
      try { SparkEntry.queries(n)(spark, sfDir).count() }
      catch { case e: Throwable =>
        System.err.println(s"[jobtrace] warm $n failed: ${e.getMessage}") }
      spark.sparkContext.listenerBus.waitUntilEmpty()
      jobs.clear()
      val t0 = System.nanoTime()
      try { SparkEntry.queries(n)(spark, sfDir).count() }
      catch { case e: Throwable =>
        System.err.println(s"[jobtrace] $n failed: ${e.getMessage}") }
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.listenerBus.waitUntilEmpty()
      println(f"JOBTRACE $n wall=$wall%.2f s jobs=${jobs.size}")
      jobs.sortBy(_.id).foreach { j =>
        println(f"  [${j.id}%4d] ${j.ms}%5d ms ${j.tasks}%4d tasks  ${j.site}%s ${j.desc.take(60)}")
      }
    }
    spark.stop()
  }
}
