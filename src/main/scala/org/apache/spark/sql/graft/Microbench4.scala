package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: config-lever experiments on the write/commit path. */
object Microbench4 {
  private def time[T](label: String, n: Int = 20)(body: => T): Unit = {
    body; body
    val t0 = System.nanoTime()
    (1 to n).foreach(_ => body)
    println(f"MICRO $label%-56s ${(System.nanoTime() - t0) / 1e6 / n}%8.1f ms/op")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("micro4").toString
    val tiny = (1 to 100).map(i => (i, s"v$i")).toDF("k", "v")
    val hc = spark.sparkContext.hadoopConfiguration
    var i = 0

    time("write tiny (defaults)") {
      i += 1; tiny.write.parquet(s"$root/a$i") }
    hc.set("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    time("write tiny (no _SUCCESS)") {
      i += 1; tiny.write.parquet(s"$root/b$i") }
    hc.set("mapreduce.fileoutputcommitter.algorithm.version", "2")
    time("write tiny (no _SUCCESS + committer v2)") {
      i += 1; tiny.write.parquet(s"$root/c$i") }
    time("agg+write 32->N (parallelismFirst default)") {
      i += 1
      tiny.groupBy("v").agg(sum("k").as("s")).write.parquet(s"$root/d$i") }
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    time("agg+write (parallelismFirst=false)") {
      i += 1
      tiny.groupBy("v").agg(sum("k").as("s")).write.parquet(s"$root/e$i") }
    val orders = graft.Tables.orders(spark,
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
      .localCheckpoint()
    time("orders agg+count (parallelismFirst=false)", 10) {
      orders.groupBy("o_orderpriority")
        .agg(sum("o_totalprice")).count() }
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
    time("orders agg+count (parallelismFirst=true)", 10) {
      orders.groupBy("o_orderpriority")
        .agg(sum("o_totalprice")).count() }
    // file counts written under each regime
    def files(p: String) =
      java.nio.file.Files.list(java.nio.file.Paths.get(p)).count()
    println(s"FILES default=${files(s"$root/d1")}")
    spark.stop()
  }
}
