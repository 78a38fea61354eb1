package graft.streaming

import graft.ext.PqIndex
import graft.pipeline.Snapshot
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** ST9 — streaming ANN-index maintenance: the CDC loop for an
  * embeddings corpus. Each micro-batch of vectors appends to the
  * corpus snapshot as a fast-append MOR sidecar and the persisted PQ
  * index refreshes — BOTH sides O(batch), never O(corpus): at 100 TB
  * the index is maintained by the stream that feeds the corpus, not
  * by nightly rebuilds.
  *
  * Idempotence under at-least-once replay is ID-KEYED on both layers:
  * a replayed batch anti-joins against the corpus's current vec_ids
  * before appending (nothing duplicates), and [[PqIndex.refresh]]'s
  * own anti-join encodes only codes the index lacks — a batch applied
  * twice is a no-op the second time, whatever the checkpoint says.
  * The first batch bootstraps corpus AND index (the codebook trains
  * on it; later batches extend codes under that book — [[PqIndex]]'s
  * standard no-retrain contract, rebuild to retrain). */
object StreamingIndex {

  val vectorSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  def startPq(spark: SparkSession, vectorsDir: String,
              corpusDir: String, indexDir: String, checkpointDir: String,
              m: Int, dsub: Int, ksub: Int,
              trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(vectorSchema)
      .option("maxFilesPerTrigger", 4)
      .parquet(vectorsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val batch = batch0.localCheckpoint()
        if (!new java.io.File(corpusDir).exists) {
          Snapshot.createOrReplace(batch, corpusDir, keepVersions = 2)
          PqIndex.build(spark, corpusDir, indexDir, m, dsub, ksub)
        } else {
          val fresh = batch.join(
            Snapshot.read(spark, corpusDir).select("vec_id"),
            Seq("vec_id"), "left_anti")
          if (!fresh.isEmpty) {
            Snapshot.morCommit(spark, corpusDir, deletes = None,
              appends = Some(fresh), operation = "append")
            PqIndex.refresh(spark, corpusDir, indexDir)
          }
        }
        ()
      }
      .start()
  }
}
