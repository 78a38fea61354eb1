package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual skew-mitigation
  * pattern for when neither side fits a broadcast and a handful of hot
  * keys would otherwise pin the whole join on a few reducer partitions.
  *
  * Each probe-side row gets a deterministic salt in [0, salts) derived
  * by hashing the whole row (xxhash64 — no RNG, so replays and retries
  * are stable); the build side is replicated `salts`× via explode. The
  * join key becomes (key, salt), spreading every hot key over `salts`
  * reducers at the cost of `salts`× the build-side shuffle volume —
  * the right trade precisely when the build side is the smaller one.
  *
  * At 100 TB this is the fallback when AQE's skew-join splitting can't
  * apply (e.g. the skewed side feeds an aggregation that must keep the
  * partitioning, or map-side stats hide the skew); result is identical
  * to the plain equi-join (oracle-checked by `q_salted_join`).
  */
object SkewJoin {

  /** Inner equi-join of `probe` (big, possibly skewed) with `build`
    * (smaller) on `key`, spread over `salts` sub-partitions per key. */
  def salted(probe: DataFrame, build: DataFrame, key: String,
             salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val saltedProbe = probe.withColumn("_salt",
      pmod(xxhash64(probe.columns.map(col).toIndexedSeq: _*), lit(salts))
        .cast("int"))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedProbe.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
