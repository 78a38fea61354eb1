package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X16 sequence packing: conservation, chunk tiling, id-stability. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")

  test("packing plan: offsets are a gapless per-shard tiling and " +
    "offset_in_chunk is start mod budget") {
    val plan = Packing.packingPlan(docs, budget = 128, shards = 4)
      .select($"doc_id", $"n_tokens", $"shard", $"start_off",
        $"chunk_id", $"offset_in_chunk")
      .as[(Long, Int, Long, Long, Long, Long)].collect()
    assert(plan.nonEmpty)
    plan.groupBy(_._3).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      // starts are the running sum of predecessors: gapless, no overlap
      var expect = 0L
      sorted.foreach { case (_, n, _, start, chunk, off) =>
        assert(start == expect)
        assert(chunk == start / 128 && off == start % 128)
        expect = start + n
      }
    }
  }

  test("chunk spans conserve every token and tile full chunks exactly " +
    "to the budget") {
    val budget = 128
    val plan = Packing.packingPlan(docs, budget = budget, shards = 4)
    val spans = Packing.chunkSpans(plan, budget = budget)
      .select($"doc_id", $"n_tokens", $"shard", $"start_off", $"chunk",
        $"tok_from", $"tok_to")
      .as[(Long, Int, Long, Long, Long, Long, Long)].collect()
    // conservation: each doc's spans cover [0, n_tokens) exactly
    spans.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._5)
      assert(ordered.head._6 == 0L)
      assert(ordered.last._7 == ordered.head._2.toLong)
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._7 == b._6)
        case _ =>
      }
    }
    // tiling: every chunk except each shard's last holds exactly
    // `budget` tokens
    spans.groupBy(s => (s._3, s._5)).foreach { case ((shard, chunk), rows) =>
      val covered = rows.map(r => r._7 - r._6).sum
      val lastChunk = spans.filter(_._3 == shard).map(_._5).max
      if (chunk < lastChunk) assert(covered == budget.toLong,
        s"shard $shard chunk $chunk covered $covered")
      else assert(covered <= budget.toLong)
    }
  }

  test("packing is id-stable: repartitioned input yields the identical " +
    "plan") {
    val a = Packing.packingPlan(docs, budget = 128, shards = 4)
      .collect().map(_.toString).sorted.toSeq
    val b = Packing.packingPlan(docs.repartition(13), budget = 128,
        shards = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
