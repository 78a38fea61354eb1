package graft.ext

import graft.pipeline.Snapshot
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared delta discovery for the persisted ANN indexes ([[PqIndex]],
  * [[IvfIndex]], [[IvfPqIndex]]) and the streaming maintainer: the
  * rows appended to a corpus snapshot since the version an index last
  * saw, WITHOUT re-scanning the corpus.
  *
  * The discovery is version-window driven ([[Snapshot.commitsSince]]):
  *  - **fast-append window** (the normal append path, incl. every
  *    streaming micro-batch): the delta IS the union of the window's
  *    append-sidecar dirs — O(appended rows), zero base-table reads,
  *    at any corpus size.
  *  - **delete-carrying window**: rows were removed or updated; an
  *    append-only index CANNOT refresh over that (orphan entries would
  *    resurrect deleted neighbors) — raise requiring a rebuild, and
  *    leave the index version stale so `search` keeps refusing.
  *  - **re-based window** (a copy-on-write replace/compaction landed):
  *    per-commit deltas are gone; recover the exact row-level diff via
  *    [[Snapshot.diff]] against the retained indexed version — the
  *    honest O(corpus) fallback, taken only when the corpus was
  *    rewritten. Deletes/updates in the diff raise the same
  *    rebuild-required error.
  */
private[graft] object IndexDelta {

  /** Marker riding each component table's atomic commit: one build
    * writes the SAME token into every component, so a reader can
    * detect the mixed window between two component swaps of a
    * rebuild (new centroids against old cells would return silently
    * wrong neighbors). Indexes persisted before tokens carry none on
    * any component — equally coherent. */
  private[graft] val BuildTokenFile = "_graft_index_build"

  private[graft] def newBuildToken(): String =
    java.util.UUID.randomUUID().toString

  /** Raise when the index's component tables were not written by the
    * same build (a rebuild is in flight or died between its swaps). */
  private[graft] def requireCoherent(indexDir: String,
                                     componentDirs: Seq[String],
                                     what: String): Unit = {
    val tokens = componentDirs.map(Snapshot.commitMeta(_, BuildTokenFile))
    if (tokens.distinct.size > 1)
      throw new IllegalStateException(
        s"$what at $indexDir is MID-REBUILD (or a rebuild died " +
          "between its component swaps): the component tables carry " +
          s"different build tokens ($tokens) — retry once the rebuild " +
          "completes, or rebuild")
  }

  /** The corpus rows appended in `(sinceVersion, liveVersion]`.
    * `liveVersion` is the version the CALLER captured and will stamp —
    * it bounds the window, so a concurrent commit landing after the
    * capture stays out of this delta (it would otherwise be encoded
    * now but stamped as not-yet-seen, and re-encoded as duplicate
    * index entries by the next refresh).
    * @param what index family name for error messages */
  def appendedSince(spark: SparkSession, corpusPath: String,
                    sinceVersion: Long, liveVersion: Long,
                    what: String): DataFrame =
    Snapshot.commitsSince(corpusPath, sinceVersion,
        Some(liveVersion)) match {
      case Snapshot.CommitWindow.FastAppends(dirs) =>
        if (dirs.isEmpty) Snapshot.read(spark, corpusPath).limit(0)
        else dirs.map(spark.read.parquet(_)).reduce(_ unionByName _)
      case Snapshot.CommitWindow.CarriesDeletes(vs) =>
        throw new IllegalStateException(
          s"$what over $corpusPath cannot refresh: corpus commit(s) " +
            s"${vs.map(v => s"v$v").mkString(", ")} removed or " +
            "updated rows, and an append-only index would keep serving " +
            "them as neighbors — rebuild the index (the version gate " +
            "stays stale until then)")
      case Snapshot.CommitWindow.Rebased(_) =>
        if (!Snapshot.retainedVersions(corpusPath).contains(sinceVersion))
          throw new IllegalStateException(
            s"$what over $corpusPath cannot refresh: the corpus was " +
              s"rewritten and the indexed version v$sinceVersion is no " +
              "longer retained, so the row-level delta is unrecoverable " +
              "— rebuild the index")
        val d = Snapshot.diff(spark, corpusPath, sinceVersion,
          liveVersion, Seq("vec_id")).localCheckpoint()
        if (d.filter(col("op") =!= "insert").limit(1).count() > 0)
          throw new IllegalStateException(
            s"$what over $corpusPath cannot refresh: the rewrite " +
              s"between v$sinceVersion and v$liveVersion deleted or " +
              "updated vectors — rebuild the index")
        Snapshot.read(spark, corpusPath)
          .join(d.select("vec_id"), Seq("vec_id"), "left_semi")
    }
}
