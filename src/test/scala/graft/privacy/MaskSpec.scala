package graft.privacy

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pseudonymization: known digest, determinism, ordinal-preserving
  * replacement (`/root/reference/jobs/build_privacy_table.py:26-37`). */
class MaskSpec extends SparkSpec {
  import spark.implicits._

  test("sha256(user||'::'||salt) matches a known digest") {
    val out = Seq(42).toDF("user_id")
      .select(Mask.pseudonym(col("user_id"), "SALT123").as("k"))
      .head().getString(0)
    // echo -n '42::SALT123' | sha256sum
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest("42::SALT123".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out == expected)
  }

  test("pseudonymize replaces the column in place, same position") {
    val df = Seq((1, 42, "x")).toDF("id", "user_id", "s")
    val out = Mask.pseudonymize(df, "user_id", "SALT123", "user_key")
    assert(out.columns.toSeq == Seq("id", "user_key", "s"))
  }

  test("same value+salt → same key (join stability)") {
    val df = Seq(7, 7, 8).toDF("u")
    val keys = df.select(Mask.pseudonym(col("u"), "s").as("k"))
      .as[String].collect()
    assert(keys(0) == keys(1) && keys(0) != keys(2))
  }
}
