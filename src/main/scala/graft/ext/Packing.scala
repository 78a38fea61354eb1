package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X16 — sequence PACKING planner: the concat-and-chunk layout a
  * training pipeline uses to fill fixed-token-budget sequences
  * (documents are concatenated in a deterministic order and sliced at
  * fixed token offsets; a document may span a chunk boundary — the
  * standard GPT-style packing that wastes zero tokens, vs. best-fit
  * binning which is neither deterministic nor parallelizable).
  *
  * Determinism & scale:
  *  - documents are sharded by an id-stable md5 hash (same family as
  *    [[Sampling.bucket100]]) — assignment survives repartition/rerun
  *    and mirrors in SQL, so the whole plan is oracle-checkable;
  *  - packing is inherently sequential WITHIN a stream (each offset
  *    depends on every predecessor), so the cumulative-sum window runs
  *    per shard: `shards` bounds the serialized unit at corpus/shards
  *    and sets the parallelism — a cluster run sizes it like
  *    `shuffle.partitions` (thousands), keeping every shard's scan at
  *    task scale. One hash exchange on the shard id is the entire
  *    shuffle cost; only (id, token-count) pairs cross it, never text.
  */
object Packing {

  /** Per-document placement: shard, absolute start offset in the
    * shard's concatenated token stream, chunk id, and offset within
    * that chunk. Token counts are whitespace counts (swap `tok` for a
    * real tokenizer's count column at deployment). */
  def packingPlan(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text", budget: Int = 2048,
                  shards: Int = 64): DataFrame =
    packingPlanCounts(
      docs.select(col(idCol),
        size(split(col(textCol), " ")).as("n_tokens")),
      idCol, "n_tokens", budget, shards)

  /** [[packingPlan]] over a CALLER-SUPPLIED token count — the "real
    * tokenizer" hook the BPE trainer docs promise: any per-doc count
    * (BPE, SentencePiece, …) replaces the whitespace heuristic without
    * touching the plan shape (same id-stable md5 shards, same
    * per-shard cumsum windows). */
  def packingPlanCounts(docs: DataFrame, idCol: String = "doc_id",
                        countCol: String = "n_tokens",
                        budget: Int = 2048,
                        shards: Int = 64): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val shard = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(shards))
    val w = Window.partitionBy("shard").orderBy(idCol)
    docs
      .select(col(idCol), col(countCol).as("n_tokens"),
        shard.as("shard"))
      .withColumn("end_off", sum("n_tokens").over(w))
      .withColumn("start_off", col("end_off") - col("n_tokens"))
      .withColumn("chunk_id",
        floor(col("start_off") / lit(budget)).cast("long"))
      .withColumn("offset_in_chunk", col("start_off") % budget)
      .drop("end_off")
  }

  /** Explodes a [[packingPlan]] into per-(chunk, document) spans: the
    * half-open token range [tok_from, tok_to) of the document that
    * lands in `chunk` — exactly what a chunk writer consumes. A
    * document spanning k boundaries yields k+1 rows; ranges of one
    * chunk's rows tile [0, budget) within the shard stream. */
  def chunkSpans(plan: DataFrame, budget: Int = 2048): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val endOff = col("start_off") + col("n_tokens")
    plan
      .withColumn("chunk", explode(sequence(col("chunk_id"),
        floor((endOff - 1) / lit(budget)).cast("long"))))
      .withColumn("tok_from",
        greatest(col("chunk") * budget, col("start_off")) - col("start_off"))
      .withColumn("tok_to",
        least((col("chunk") + 1) * budget, endOff) - col("start_off"))
      .drop("chunk_id", "offset_in_chunk")
  }
}
