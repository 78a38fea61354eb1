package graft.pipeline

import graft.SparkSpec
import java.nio.file.Files

/** Snapshot sink: atomic create-or-replace swap + append. */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("createOrReplace replaces atomically; append accumulates") {
    val dir = Files.createTempDirectory("snap").toString + "/t"
    Snapshot.createOrReplace(Seq(1, 2, 3).toDF("x"), dir)
    assert(Snapshot.read(spark, dir).count() == 3)
    Snapshot.createOrReplace(Seq(9).toDF("x"), dir)
    assert(Snapshot.read(spark, dir).as[Int].collect().toSeq == Seq(9))
    Snapshot.append(Seq(10).toDF("x"), dir)
    assert(Snapshot.read(spark, dir).as[Int].collect().toSet == Set(9, 10))
  }
}
