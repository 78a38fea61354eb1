package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate clustering: connected components over a near-dup pair
  * list, by iterative min-label propagation — pairs only become a
  * DEDUP decision once grouped into clusters with one canonical
  * survivor each (keep `id == cluster_id`, drop the rest).
  *
  * BSP shape, like any distributed graph algorithm: per round, one
  * shuffle join propagates each vertex's smallest known label across
  * edges; rounds = O(component diameter) — near-dup clusters are
  * shallow (pairs/triples/chains), so 2-4 rounds in practice, with
  * `maxIter` as the safety bound. The driver only coordinates rounds
  * and reads a 1-row convergence count; labels live distributed and
  * are lineage-truncated per round (`localCheckpoint` — an iterative
  * fold would otherwise nest one join plan per round).
  */
object Clusters {

  /** @param pairs undirected edges, one row per pair
    * @return (id, cluster_id) for every id appearing in `pairs`;
    *   cluster_id = smallest id reachable (the canonical survivor) */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
                          bCol: String = "id_b",
                          maxIter: Int = 20): DataFrame = {
    // Undirected doubling in ONE pass over `pairs` (explode of the two
    // directed structs), not a self-union: a union evaluates the caller's
    // pair-producing plan twice, and that plan is routinely the expensive
    // part (three dedup detectors in the multi-signal query).
    val edges = pairs
      .select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).cast(pairs.schema(aCol).dataType).as("src"),
          col(aCol).cast(pairs.schema(bCol).dataType).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .localCheckpoint() // consumed once per round
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      // One join + one aggregation per round: neighbor candidates
      // (edge join) UNION each vertex's own row, then min per vertex.
      // The self row carries the old label in `own` (null on neighbor
      // rows), so the new label, the old label, and the changed-flag
      // all come out of the SAME aggregation — no second join to apply
      // updates, no third to detect convergence. The count runs on the
      // materialized checkpoint, so a round costs exactly one edge-key
      // shuffle + one vertex-key shuffle + one cheap action —
      // driver-serialized rounds make per-round shuffles the dominant
      // cost at scale.
      val labelType = labels.schema("label").dataType
      val nbrs = edges.join(labels, edges("dst") === labels("id"))
        .select(edges("src").as("id"), col("label").as("cand"),
          lit(null).cast(labelType).as("own"))
      val updated = nbrs
        .unionByName(labels.select(col("id"), col("label").as("cand"),
          col("label").as("own")))
        .groupBy("id")
        .agg(min("cand").as("label"), max("own").as("own"))
        .withColumn("_changed", col("label") < col("own"))
        .drop("own")
        .localCheckpoint(false) // lazy: the count below materializes it
      val changed = updated.filter(col("_changed")).count()
      labels = updated.drop("_changed")
      converged = changed == 0
      round += 1
    }
    labels.select(col("id"), col("label").as("cluster_id"))
  }
}
