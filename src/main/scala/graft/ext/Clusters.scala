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
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint() // consumed once per round
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      val prop = edges.join(labels, edges("dst") === labels("id"))
        .select(edges("src").as("pid"), col("label").as("nbr"))
        .groupBy("pid").agg(min("nbr").as("nbr_min"))
      // The old label is already on the row, so the changed-flag is a
      // free comparison in the same select — counting it on the
      // materialized checkpoint costs no join and no recompute, where
      // a labels-vs-updated equi-join to detect convergence would pay
      // a second full shuffle per round (driver-serialized rounds make
      // that the dominant cost at scale).
      val updated = labels.as("l")
        .join(prop, col("l.id") === col("pid"), "left")
        .select(col("l.id").as("id"),
          least(col("l.label"), coalesce(col("nbr_min"), col("l.label")))
            .as("label"),
          coalesce(col("nbr_min") < col("l.label"), lit(false))
            .as("_changed"))
        .localCheckpoint()
      val changed = updated.filter(col("_changed")).count()
      labels = updated.drop("_changed")
      converged = changed == 0
      round += 1
    }
    labels.select(col("id"), col("label").as("cluster_id"))
  }
}
