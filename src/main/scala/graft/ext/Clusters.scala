package graft.ext

import org.apache.spark.HashPartitioner
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType,
  ShortType}
import org.apache.spark.storage.StorageLevel

/** Duplicate clustering: connected components over a near-dup pair
  * list, by iterative min-label propagation — pairs only become a
  * DEDUP decision once grouped into clusters with one canonical
  * survivor each (keep `id == cluster_id`, drop the rest).
  *
  * BSP shape, like any distributed graph algorithm: per round, a join
  * propagates each vertex's smallest known label across edges, plus a
  * pointer-jumping shortcut (`label(label(u))`) so rounds converge in
  * O(log diameter) instead of O(diameter) — multi-signal dedup graphs
  * chain through shared shingles and need ~20 plain-propagation
  * rounds, each a driver-serialized barrier. `maxIter` stays as the
  * safety bound.
  *
  * The hot path (integral ids — doc ids, row ids) runs on pair RDDs
  * with ONE [[HashPartitioner]] reused across every round: edges are
  * partitioned ONCE and joined narrowly (zero-shuffle) against the
  * co-partitioned label table, so a round moves only the propagated
  * candidate labels (map-side combined min) — not the edge set. The
  * DataFrame loop re-shuffles all E edge rows every round and pays
  * ~0.3 s of physical planning per round; at 100 TB the reused
  * partitioner is the difference between rounds costing O(V) and
  * O(E) network. This is the one operator family where the RDD API
  * is the right tool (iterative BSP with partitioner reuse — the
  * pattern GraphX exists for); non-integral ids (e.g. string content
  * hashes) fall back to the generic Catalyst loop below.
  */
object Clusters {

  /** Integral id types admitted to the partitioned hot path, each with
    * its width rank — ONE structure serving both the dispatch test and
    * the widening pick below, so the two can never drift (a type added
    * here is automatically widenable; one added elsewhere fails the
    * dispatch test, never `maxBy`). */
  private val IntegralWidths = Map[Any, Int](ByteType -> 1,
    ShortType -> 2, IntegerType -> 3, LongType -> 4)

  /** @param pairs undirected edges, one row per pair
    * @return (id, cluster_id) for every id appearing in `pairs`;
    *   cluster_id = smallest id reachable (the canonical survivor) */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
                          bCol: String = "id_b",
                          maxIter: Int = 20,
                          rowsPerPartition: Long = 1L << 20): DataFrame = {
    val aType = pairs.schema(aCol).dataType
    val bType = pairs.schema(bCol).dataType
    if (IntegralWidths.contains(aType) && IntegralWidths.contains(bType))
      ccPartitioned(pairs, aCol, bCol, maxIter, rowsPerPartition)
    else {
      // The generic loop casts ids to one shared type; a silent
      // narrowing cast would corrupt the wider side's ids.
      require(aType == bType,
        s"connectedComponents: $aCol ($aType) and $bCol ($bType) must " +
          "share a type (or both be integral); cast one side first")
      ccGeneric(pairs, aCol, bCol, maxIter)
    }
  }

  /** Integral-id hot path: partitioner-reuse BSP over pair RDDs. */
  private def ccPartitioned(pairs: DataFrame, aCol: String,
                            bCol: String, maxIter: Int,
                            rowsPerPartition: Long): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val defaultN = spark.sessionState.conf.numShufflePartitions
    // (dst, src) keyed by dst: the narrow join below delivers
    // label(dst) to src. Both orientations, so keys = all vertices.
    val staged = pairs
      .select(col(aCol).cast(LongType), col(bCol).cast(LongType))
      .as[(Long, Long)].rdd
      .flatMap { case (a, b) => Iterator((a, b), (b, a)) }
      .distinct(defaultN)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Size the round partitioner to the MEASURED edge count — the
    // RDD-layer equivalent of AQE's shuffle coalescing, which a .rdd
    // plan no longer gets. 13 driver-synchronized rounds of 32-part
    // joins over a 300k-edge graph is pure scheduler overhead; at
    // 10^12 edges the same formula saturates the cluster's
    // parallelism.
    val e = staged.count()
    val n = math
      .max(1L, math.min(defaultN.toLong, e / rowsPerPartition + 1))
      .toInt
    val part = new HashPartitioner(n)
    val edges = staged.partitionBy(part)
      .persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()
    staged.unpersist(blocking = true)
    // Output in the WIDER of the two id types: ids from the narrower
    // column always fit, and a b-side id wider than aCol's type is
    // never truncated (mixed-width pairs, e.g. INT × BIGINT).
    val idType = Seq(pairs.schema(aCol).dataType,
      pairs.schema(bCol).dataType).maxBy(IntegralWidths(_))
    // One partition ⇒ the whole (deduped) edge set fits a single task:
    // a partition-local union-find finds exact components in ONE job —
    // executor-side, no driver collect — instead of paying a driver
    // barrier per BSP round. The same small-side short-circuit AQE
    // applies to joins; above the threshold the BSP loop below is the
    // at-scale path.
    if (n == 1) {
      val comp = edges.mapPartitions { it =>
        val parent = new java.util.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.get(r) != r) r = parent.get(r)
          var c = x
          while (parent.get(c) != r) { val nx = parent.get(c)
            parent.put(c, r); c = nx }
          r
        }
        it.foreach { case (a, b) =>
          if (!parent.containsKey(a)) parent.put(a, a)
          if (!parent.containsKey(b)) parent.put(b, b)
          val ra = find(a); val rb = find(b)
          // attach the larger root under the smaller: the root of a
          // set is always its minimum id (the canonical survivor)
          if (ra < rb) parent.put(rb, ra)
          else if (rb < ra) parent.put(ra, rb)
        }
        val ids = new Array[Long](parent.size)
        val kit = parent.keySet.iterator
        var i = 0
        while (kit.hasNext) { ids(i) = kit.next(); i += 1 }
        ids.iterator.map(id => (id, find(id)))
      }
      val out = comp.toDF("id", "cluster_id")
        .select(col("id").cast(idType).as("id"),
          col("cluster_id").cast(idType).as("cluster_id"))
        .localCheckpoint()
      edges.unpersist(blocking = true)
      return out
    }
    var labels = edges.mapValues(_ => ())
      .reduceByKey(part, (a, _) => a)
      .mapPartitions(_.map { case (v, _) => (v, v) },
        preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      // Narrow join (both sides on `part`): candidate label(dst)->src.
      val viaEdges = edges.join(labels)
        .map { case (_, (src, lbl)) => (src, lbl) }
      // Pointer jump: label(label(u)) — re-keys only the V-sized label
      // table; the join target keeps the shared partitioner.
      val viaJump = labels.map { case (u, l) => (l, u) }
        .join(labels)
        .map { case (_, (u, ll)) => (u, ll) }
      // ONE shuffle per round: reduceByKey's map-side combine collapses
      // a hot vertex's candidates per map task before the exchange.
      val updated = viaEdges.union(viaJump).union(labels)
        .reduceByKey(part, math.min(_: Long, _: Long))
        .localCheckpoint() // truncate per-round lineage
      // Narrow join again (same partitioner): convergence probe costs
      // one cheap action, no shuffle.
      val changed = updated.join(labels)
        .filter { case (_, (nw, old)) => nw < old }.count()
      labels.unpersist(blocking = true)
      labels = updated
      converged = changed == 0
      round += 1
    }
    labels.toDF("id", "cluster_id")
      .select(col("id").cast(idType).as("id"),
        col("cluster_id").cast(idType).as("cluster_id"))
  }

  /** Quality-based canonical selection: per cluster, keep the row
    * with the HIGHEST score (ties → smallest id) — what a curation
    * pipeline actually wants from a duplicate cluster ("keep the
    * longest / best-quality copy"), where [[connectedComponents]]'
    * min-id label is only a stable cluster NAME. One partial-agg
    * shuffle on the cluster key (a degenerate 10⁷-copy cluster
    * collapses map-side) plus one join back for the flag.
    *
    * @param clusters (id, cluster_id, score, …) — typically
    *   [[connectedComponents]] output joined with a quality column
    * @return input plus `canonical_id` (the cluster's survivor) and
    *   `is_canonical` */
  def canonical(clusters: DataFrame, idCol: String = "id",
                clusterCol: String = "cluster_id",
                scoreCol: String = "score"): DataFrame = {
    // min(struct(-score, id)) = max score then min id — one ordered
    // struct so the pick stays inside a partial-aggregated min
    val surv = clusters.groupBy(col(clusterCol))
      .agg(min(struct((-col(scoreCol)).as("ns"),
        col(idCol).as("sid"))).as("m"))
      .select(col(clusterCol), col("m.sid").as("canonical_id"))
    clusters.join(surv, clusterCol)
      .withColumn("is_canonical", col(idCol) === col("canonical_id"))
  }

  /** Generic-type fallback: the same propagate+jump BSP as a Catalyst
    * loop. Re-shuffles the edge set per round (no partitioner reuse at
    * the DataFrame layer) — correct for any ordered id type, but the
    * integral path above is the at-scale design. */
  private def ccGeneric(pairs: DataFrame, aCol: String, bCol: String,
                        maxIter: Int): DataFrame = {
    // Undirected doubling in ONE pass over `pairs` (explode of the two
    // directed structs), not a self-union: a union evaluates the
    // caller's pair-producing plan twice, and that plan is routinely
    // the expensive part (three dedup detectors in the multi-signal
    // query).
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
      val labelType = labels.schema("label").dataType
      // Label links double the propagation distance per round:
      // (u, label(u)) lets the join deliver label(label(u)) to u. Both
      // rows derive from the checkpointed `labels`, so the
      // augmentation costs no extra pass over the caller's plan — the
      // round is still ONE join + ONE aggregation, with the old label,
      // the new label, and the changed-flag all from that aggregation
      // (the self row carries the old label in `own`).
      val labelLinks = labels
        .select(col("id").as("src"), col("label").as("dst"))
      val aug = edges.unionByName(labelLinks)
      val nbrs = aug.join(labels, aug("dst") === labels("id"))
        .select(aug("src").as("id"), col("label").as("cand"),
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
