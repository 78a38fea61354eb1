package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession

/** Dev-only: bisect the ~150 ms fixed cost of a trivial count(). */
object Microbench2 {
  private def time[T](label: String, n: Int = 30)(body: => T): Unit = {
    body; body // warm
    val t0 = System.nanoTime()
    (1 to n).foreach(_ => body)
    println(f"MICRO $label%-52s ${(System.nanoTime() - t0) / 1e6 / n}%8.1f ms/op")
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

    time("range(1) 1-slice count") {
      spark.range(0, 1, 1, 1).count() }
    time("range(1) 32-slice count") {
      spark.range(0, 1, 1, 32).count() }
    time("range(1) 1-slice noop write") {
      spark.range(0, 1, 1, 1).write.format("noop")
        .mode("overwrite").save() }
    time("rdd job: sc.parallelize(1 to 32, 32).count") {
      spark.sparkContext.parallelize(1 to 32, 32).count() }
    time("rdd job: sc.parallelize(Seq(1), 1).count") {
      spark.sparkContext.parallelize(Seq(1), 1).count() }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("range(1) 1-slice count, AQE off") {
      spark.range(0, 1, 1, 1).count() }
    time("range(1) 32-slice count, AQE off") {
      spark.range(0, 1, 1, 32).count() }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.graft.rollup.rewrite.enabled", "false")
    time("range(1) 1-slice count, rewrite off") {
      spark.range(0, 1, 1, 1).count() }
    spark.conf.set("spark.graft.rollup.rewrite.enabled", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("range(1) 1-slice count, codegen off") {
      spark.range(0, 1, 1, 1).count() }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    val one = spark.range(0, 1, 1, 1).toDF("id")
    time("pre-built df.count() (same DF object)") { one.count() }
    time("collect() instead of count()") {
      spark.range(0, 1, 1, 1).collect() }
    spark.stop()
  }
}
