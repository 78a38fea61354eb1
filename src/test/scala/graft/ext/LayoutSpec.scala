package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X18 z-order layout: bit-interleave correctness, 2-D locality, and
  * the range-partitioned write's per-file z-disjointness. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def refZ(a: Long, b: Long): Long = {
    def clamp(x: Long) = math.min(math.max(x, 0L), (1L << 16) - 1)
    (0 until 16).map { i =>
      ((clamp(a) >> i) & 1L) * (1L << (2 * i)) +
        ((clamp(b) >> i) & 1L) * (1L << (2 * i + 1))
    }.sum
  }

  test("zValue matches the reference bit-interleave, incl. clamping of " +
    "negative and oversized inputs") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
      (65535L, 65535L), (-7L, 2L), (70000L, 1L), (12345L, 54321L))
    val got = cases.toDF("a", "b")
      .select(Layout.zValue($"a", $"b")).as[Long].collect().toSeq
    assert(got == cases.map { case (a, b) => refZ(a, b) })
  }

  test("z-order locality: the quadrant of the 2-D space is the " +
    "top bit pair of the z-value") {
    val pts = for (a <- 0L until 8L; b <- 0L until 8L) yield (a, b)
    val z = pts.toDF("a", "b")
      .select($"a", $"b", Layout.zValue($"a", $"b").as("z"))
      .as[(Long, Long, Long)].collect()
    // within the 8x8 grid (6 significant z bits), the 4x4 quadrant
    // (a>=4, b>=4 bits) is z's bit pair (4,5): all points of one
    // quadrant form one contiguous z block of 16
    z.groupBy(p => (p._1 / 4, p._2 / 4)).foreach { case (_, rows) =>
      val zs = rows.map(_._3).sorted
      assert(zs.length == 16 && zs.last - zs.head == 15,
        s"quadrant not contiguous in z: ${zs.toSeq}")
    }
  }

  test("writeZOrdered: per-file z ranges are disjoint (range partition " +
    "on z), so file-level min/max prune 2-D boxes") {
    val dir = java.nio.file.Files.createTempDirectory("zord")
      .toString + "/t"
    val df = spark.range(0, 4000).select(
      ($"id" % 61).as("x"), ($"id" % 53).as("y"), $"id")
    Layout.writeZOrdered(df, dir, col("x"), col("y"), numFiles = 8)
    val back = spark.read.parquet(dir)
    assert(back.count() == 4000)
    val perFile = back
      .withColumn("f", input_file_name())
      .withColumn("z", Layout.zValue($"x", $"y"))
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    assert(perFile.length > 1)
    perFile.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._3 <= b._2, s"overlapping z ranges: $a vs $b")
      case _ =>
    }
  }
}
