package graft.privacy

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted-SHA-256 pseudonymization layer.
  *
  * Reference: `/root/reference/jobs/build_privacy_table.py:26-37` (Spark
  * job: `sha2(concat_ws("::", user_id, salt), 256)`) and the Trino
  * query-time view `to_hex(sha256(to_utf8(cast(user_id as varchar) ||
  * '::' || salt)))` (`/root/reference/README.md:106-116`). Both produce
  * the same lowercase-hex digest; Spark's `sha2` emits lowercase hex
  * directly.
  *
  * Determinism: same (value, salt) → same key, so the pseudonym is
  * join-stable across tables — the property the privacy layer relies on.
  * Scale: pure scalar expression, whole-stage codegen, no shuffle.
  */
object Mask {

  /** `user_key = sha256_hex(cast(v as string) || "::" || salt)`. */
  def pseudonym(value: Column, salt: String): Column =
    sha2(concat_ws("::", value.cast("string"), lit(salt)), 256)

  /** Replace `column` with `<column>_key` in place (ordinal-preserving:
    * the masked column appears where the original was, as the reference's
    * SELECT-list projection does). */
  def pseudonymize(df: DataFrame, column: String, salt: String,
                   keyName: String = ""): DataFrame = {
    val outName = if (keyName.nonEmpty) keyName else s"${column}_key"
    df.select(df.columns.map {
      case `column` => pseudonym(col(column), salt).as(outName)
      case c        => col(c)
    }.toSeq: _*)
  }
}
