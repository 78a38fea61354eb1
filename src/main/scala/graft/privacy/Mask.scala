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

  /** The deployment salt, FAIL-CLOSED: raises when `PII_SALT` is
    * unset or empty — the reference's operational contract
    * (`/root/reference/jobs/build_privacy_table.py:6-8` refuses to
    * build the privacy table without it; an empty salt would silently
    * publish unsalted-equivalent digests, joinable by anyone who can
    * hash the id space). Production builder paths call this; test and
    * oracle queries pass an explicit literal for determinism. */
  def saltFromEnv(env: String => Option[String] = sys.env.get)
      : String =
    env("PII_SALT").map(_.trim).filter(_.nonEmpty).getOrElse(
      throw new IllegalStateException(
        "PII_SALT is not set. Export it in the job environment — " +
          "the privacy table must never be built with an empty salt"))

  /** [[pseudonymize]] with the salt read fail-closed from the
    * environment — the builder-path twin of the reference job. */
  def pseudonymizeFromEnv(df: DataFrame, column: String,
                          keyName: String = "",
                          env: String => Option[String] = sys.env.get)
      : DataFrame =
    pseudonymize(df, column, saltFromEnv(env), keyName)

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

  /** PII scrubbing for free text — the redaction pass a training corpus
    * gets before the dedup/quality stages. Patterns are deliberately in
    * the regex subset whose semantics are identical in Java (Spark) and
    * RE2 (DuckDB oracle): literal classes, +, {m,}, no backrefs or
    * lookaround. Pure per-row compute, codegen'd, no shuffle. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongNumRe = "[0-9][0-9 .-]{5,}[0-9]"
  val IpRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        IpRe, "<IP>"),
      LongNumRe, "<NUM>")

  /** Numeric generalization for k-anonymity: floor to `width` buckets
    * — "1234.56" → "[1200,1300)" style label, deterministic. */
  def generalize(value: Column, width: Double): Column =
    concat(lit("["), (floor(value / width) * width).cast("long"),
      lit(","), ((floor(value / width) + 1) * width).cast("long"),
      lit(")"))

  /** k-anonymity audit: group sizes over the quasi-identifier columns;
    * rows in groups smaller than k are re-identifiable. Returns one row
    * per quasi-id combination with its size and a violation flag —
    * single partial-aggregated shuffle at any scale. */
  def kAnonymity(df: DataFrame, quasiIds: Seq[String], k: Int): DataFrame =
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .withColumn("violates_k", col("group_size") < k)

  /** l-diversity audit — k-anonymity's sibling: a quasi-id group whose
    * SENSITIVE attribute takes fewer than l distinct values leaks that
    * attribute even when the group is large (everyone in a size-1000
    * group with one diagnosis is outed). One partial-aggregated
    * shuffle on the quasi-id key: count + distinct-count per group
    * (count_distinct plans as a two-phase partial aggregate, no
    * per-group materialization). Returns one row per quasi-id
    * combination with group size, distinct sensitive values, and the
    * violation flag. */
  def lDiversity(df: DataFrame, quasiIds: Seq[String],
                 sensitiveCol: String, l: Int): DataFrame =
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("group_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("violates_l", col("n_sensitive") < l)

  /** X14d — local-DP randomized response [Warner 1965; the
    * RAPPOR-style local mechanism]: each subject reports their TRUE
    * binary sensitive value with probability p = pNum/pDen and the
    * FLIPPED value otherwise — ε-differentially-private with
    * ε = ln(p/(1−p)) (p = 3/4 → ε = ln 3), and unlike Laplace noise
    * it needs NO transcendental sampling, so the release is
    * integer-exact and engine-portable. The "coin" is the id-stable
    * salted md5 bucket (the [[graft.ext.Sampling]] discipline) —
    * deterministic for the oracle; a production deployment swaps in a
    * CSPRNG per release without touching the estimator. Scan-local,
    * zero shuffle. */
  def randomizedResponse(df: DataFrame, idCol: String, bitCol: String,
                         pNum: Int, pDen: Int,
                         salt: String): DataFrame = {
    require(pNum * 2 > pDen && pNum < pDen,
      s"p must be in (1/2, 1): $pNum/$pDen")
    val coin = pmod(conv(substring(md5(
      concat(col(idCol).cast("string"), lit("::" + salt))), 1, 8),
      16, 10).cast("long"), lit(pDen))
    df.withColumn("reported",
      when(coin < pNum, col(bitCol)).otherwise(lit(1) - col(bitCol)))
  }

  /** Per-group debiased estimate over a randomized-response release:
    * with observed reported-true fraction λ, the unbiased estimator is
    * π̂ = (λ + p − 1) / (2p − 1). Exact counts aggregate; the handful
    * of IEEE steps mirror the oracle's. One partial-agg shuffle. */
  def rrEstimate(released: DataFrame, groupCols: Seq[String],
                 pNum: Int, pDen: Int): DataFrame = {
    val p = lit(pNum.toDouble) / lit(pDen.toDouble)
    released.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("reported").cast("long")).as("n_reported_true"))
      .withColumn("lambda",
        col("n_reported_true").cast("double") / col("n"))
      .withColumn("pi_hat",
        ((col("lambda") + p) - lit(1.0)) / ((lit(2.0) * p) - lit(1.0)))
  }

  /** t-closeness audit [Li, Li, Venkatasubramanian, ICDE 2007] — the
    * third leg after k-anonymity and l-diversity: a quasi-id group is
    * t-close when its SENSITIVE-value distribution is within distance t
    * of the table-wide distribution. A group can satisfy k and l yet
    * scream "everyone here is in cohort 3" — distribution skew, not
    * cardinality, is the leak. For categorical sensitive attributes the
    * distance is total variation, `TVD = ½ Σ_s |p_g(s) − p(s)|` (the
    * equal-ground-distance EMD of the paper).
    *
    * Exact integer arithmetic so the audit is reproducible across
    * engines: over the common denominator `n_g·N`,
    * `tvd_num = Σ_{s in group} |cnt_gs·N − cnt_s·n_g|
    *            + (N − Σ_{s in group} cnt_s)·n_g`
    * (the second term folds in every sensitive value ABSENT from the
    * group), `TVD = tvd_num / (2·n_g·N)`, and `violates_t ⟺
    * tDen·tvd_num > 2·tNum·n_g·N` with `t = tNum/tDen` — all BIGINT
    * sums, order-free. (BIGINT holds to ~10⁹ rows × counts; past that
    * the same plan runs with DECIMAL(38,0) products.)
    *
    * Scale: the base table is scanned ONCE — the finest-grain
    * (quasi-ids, sensitive) counts are the only row-scaled aggregation
    * (one partial-agg shuffle), and the global histogram and 1-row
    * total derive FROM that aggregate (identical subtrees, so
    * ReuseExchange shares the one shuffle) before broadcasting back.
    * The per-group window + final agg share the quasi-id exchange.
    * Nothing row-scaled leaves the maps.
    */
  def tCloseness(df: DataFrame, quasiIds: Seq[String], sensitiveCol: String,
                 tNum: Long, tDen: Long): DataFrame = {
    require(tNum > 0 && tDen > 0, "t must be a positive rational tNum/tDen")
    val gs = df.groupBy((quasiIds :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("cnt_gs"))
    val sHist = gs.groupBy(col(sensitiveCol))
      .agg(sum("cnt_gs").as("cnt_s"))
    val total = gs.agg(sum("cnt_gs").as("n_total"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(quasiIds.map(col): _*)
    // null-safe: NULL is a legitimate sensitive value and must keep
    // its mass — a plain equi-join would silently drop those rows,
    // shrinking n_g and inflating the distance
    gs.join(broadcast(sHist.withColumnRenamed(sensitiveCol, "_s")),
        col(sensitiveCol) <=> col("_s"))
      .drop("_s")
      .crossJoin(broadcast(total))
      .withColumn("n_g", sum(col("cnt_gs")).over(w))
      .withColumn("dev",
        abs(col("cnt_gs") * col("n_total") - col("cnt_s") * col("n_g")))
      .groupBy(quasiIds.map(col): _*)
      .agg(max(col("n_g")).as("group_size"),
        (sum(col("dev")) +
          (max(col("n_total")) - sum(col("cnt_s"))) * max(col("n_g")))
          .as("tvd_num"),
        max(col("n_total")).as("_n"))
      .withColumn("tvd", col("tvd_num").cast("double") /
        (lit(2.0) * col("group_size") * col("_n")))
      .withColumn("violates_t",
        col("tvd_num") * tDen > lit(2L) * tNum * col("group_size") * col("_n"))
      .drop("_n")
  }
}
