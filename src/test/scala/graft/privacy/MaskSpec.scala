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

  test("saltFromEnv FAILS CLOSED when PII_SALT is unset or blank, " +
    "and builds the same digests as the explicit-salt path when set") {
    // unset → raise (the reference job's contract,
    // build_privacy_table.py:6-8)
    val unset = intercept[IllegalStateException] {
      Mask.saltFromEnv(_ => None)
    }
    assert(unset.getMessage.contains("PII_SALT"))
    // blank counts as unset — an empty salt would publish
    // unsalted-equivalent digests
    intercept[IllegalStateException] { Mask.saltFromEnv(_ => Some("")) }
    intercept[IllegalStateException] {
      Mask.saltFromEnv(_ => Some("   "))
    }
    // set → the env path is digest-identical to the literal path
    val df = Seq((1, 42)).toDF("id", "user_id")
    val viaEnv = Mask.pseudonymizeFromEnv(df, "user_id", "user_key",
      env = k => if (k == "PII_SALT") Some("SALT123") else None)
    val viaLit = Mask.pseudonymize(df, "user_id", "SALT123", "user_key")
    assert(viaEnv.collect().toSeq == viaLit.collect().toSeq)
  }

  test("same value+salt → same key (join stability)") {
    val df = Seq(7, 7, 8).toDF("u")
    val keys = df.select(Mask.pseudonym(col("u"), "s").as("k"))
      .as[String].collect()
    assert(keys(0) == keys(1) && keys(0) != keys(2))
  }

  test("scrubPii redacts emails, IPs, and long numbers; clean text " +
    "passes through") {
    val out = Seq(
      "mail me at jo.doe+x@corp.example.org thanks",
      "server 192.168.0.17 answered",
      "card 4111 1111 1111 1111 exp 12/26",
      "no pii in this sentence at all"
    ).toDF("t").select(Mask.scrubPii(col("t")).as("c"))
      .as[String].collect().toSeq
    assert(out(0) == "mail me at <EMAIL> thanks")
    assert(out(1) == "server <IP> answered")
    assert(out(2).startsWith("card <NUM>"))
    assert(out(3) == "no pii in this sentence at all")
  }

  test("kAnonymity flags quasi-id groups smaller than k") {
    val df = (Seq.fill(6)(("A", "[0,100)")) ++ Seq(("B", "[0,100)")))
      .toDF("status", "band")
    val out = Mask.kAnonymity(df, Seq("status", "band"), k = 5)
      .as[(String, String, Long, Boolean)].collect().toSet
    assert(out == Set(("A", "[0,100)", 6L, false),
      ("B", "[0,100)", 1L, true)))
  }

  test("lDiversity flags big-but-homogeneous groups k-anonymity misses") {
    // Group A: 6 rows but ONE distinct user → l-violation despite k=5
    // being satisfied; group B: 3 rows, 3 users → diverse.
    val df = (Seq.fill(6)(("A", 1L)) ++
      Seq(("B", 1L), ("B", 2L), ("B", 3L))).toDF("status", "user_id")
    val out = Mask.lDiversity(df, Seq("status"), "user_id", l = 2)
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(out == Set(("A", 6L, 1L, true), ("B", 3L, 3L, false)))
  }

  test("tCloseness flags distribution skew k and l both miss") {
    // Global: 8 rows, cohorts x:4, y:4 (p = 1/2 each). Group A: 4 rows
    // all cohort x — k=4 and l could pass with another sensitive col,
    // but the distribution screams. TVD = ½(|1−½| + |0−½|) = ½.
    //   tvd_num = |4·8 − 4·4| + (8 − 4)·4 = 16 + 16 = 32 = 2·n_g·N·½.
    // Group B: 4 rows split x:0, y:4 → symmetric, also ½.
    val df = (Seq.fill(4)(("A", "x")) ++ Seq.fill(4)(("B", "y")))
      .toDF("grp", "cohort")
    val out = Mask.tCloseness(df, Seq("grp"), "cohort", tNum = 1, tDen = 5)
      .as[(String, Long, Long, Double, Boolean)].collect().toSet
    assert(out == Set(("A", 4L, 32L, 0.5, true), ("B", 4L, 32L, 0.5, true)))
    // Perfectly mixed groups sit at TVD 0 and never violate.
    val mixed = Seq(("A", "x"), ("A", "y"), ("B", "x"), ("B", "y"))
      .toDF("grp", "cohort")
    val out2 = Mask.tCloseness(mixed, Seq("grp"), "cohort", 1, 5)
      .as[(String, Long, Long, Double, Boolean)].collect().toSet
    assert(out2 == Set(("A", 2L, 0L, 0.0, false), ("B", 2L, 0L, 0.0, false)))
  }

  test("randomizedResponse flips exactly the coin-selected rows and " +
    "rrEstimate debiases with the closed-form estimator") {
    val df = (1L to 400L).map(i => (i, "g", (i % 2).toInt))
      .toDF("id", "grp", "bit")
    val rel = Mask.randomizedResponse(df, "id", "bit", 3, 4, "RR1")
    // determinism + flip-rate: the salted-md5 coin flips ~1/4 of rows
    val flips = rel.filter($"reported" =!= $"bit").count()
    assert(flips > 60 && flips < 140, s"~100 expected, got $flips")
    assert(rel.collect().toSeq ==
      Mask.randomizedResponse(df, "id", "bit", 3, 4, "RR1")
        .collect().toSeq, "release must be deterministic per salt")
    // a different salt draws different coins
    assert(Mask.randomizedResponse(df, "id", "bit", 3, 4, "OTHER")
      .filter($"reported" =!= $"bit").count() != flips)
    // estimator: pi_hat = (lambda + p - 1) / (2p - 1), hand-checked
    val est = Mask.rrEstimate(rel, Seq("grp"), 3, 4).collect().head
    val lambda = est.getAs[Long]("n_reported_true").toDouble / 400
    assert(est.getAs[Double]("pi_hat") ==
      ((lambda + 0.75) - 1.0) / ((2.0 * 0.75) - 1.0))
    // debiasing pulls the estimate back toward the true 1/2
    assert(math.abs(est.getAs[Double]("pi_hat") - 0.5) < 0.15)
  }

  test("generalize emits stable half-open band labels") {
    val out = Seq(0.0, 99.99, 100.0, 1234.56).toDF("v")
      .select(Mask.generalize(col("v"), 100.0).as("b"))
      .as[String].collect().toSeq
    assert(out == Seq("[0,100)", "[0,100)", "[100,200)", "[1200,1300)"))
  }
}
