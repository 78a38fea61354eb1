package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the deequ / Delta-constraints
  * role the reference's roadmap sketches as "data quality checks"
  * (`/root/reference/README.md:227`): a table of named constraints
  * evaluated in ONE pass, a row-level quarantine splitter, and a
  * write gate that refuses to commit a snapshot violating its contract.
  *
  * Two evaluation shapes, both shuffle-minimal:
  *  - [[audit]]: every constraint compiles to a conditional count inside
  *    a single `agg` — one partial-aggregated pass over the table no
  *    matter how many expectations (uniqueness adds a two-phase
  *    count-distinct to the same aggregate, still one shuffle of
  *    map-side-collapsed partials).
  *  - [[quarantine]]: row-level constraints compile to one codegen'd
  *    predicate projection — failing rows exit with a `reasons` string,
  *    passing rows with [[retain]]; no shuffle at all.
  *
  * Null contract (deequ's): `complete` counts nulls; every other check
  * skips them — a null amount fails `complete(amount)`, not
  * `inRange(amount)`. Uniqueness counts rows beyond the first per
  * fully-non-null key (count − count-distinct).
  */
object Expectations {

  sealed trait Expectation { def name: String }

  /** Column has no nulls. */
  final case class Complete(column: String) extends Expectation {
    val name = s"complete($column)"
  }
  /** Key columns identify rows uniquely (table-level; needs the
    * aggregate, not expressible per-row). */
  final case class Unique(columns: Seq[String]) extends Expectation {
    val name = s"unique(${columns.mkString(",")})"
  }
  /** Non-null values fall in `[lo, hi]`. */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Expectation {
    val name = s"in_range($column)"
  }
  /** Non-null values belong to the allowed set. */
  final case class InSet(column: String, values: Seq[String])
      extends Expectation {
    val name = s"in_set($column)"
  }
  /** Non-null values match the (RE2-safe) regex. */
  final case class Matches(column: String, regex: String)
      extends Expectation {
    val name = s"matches($column)"
  }

  /** Row-level violation predicate — null for [[Unique]] (table-level). */
  private def rowViolation(e: Expectation): Option[Column] = e match {
    case Complete(c)      => Some(col(c).isNull)
    case InRange(c, lo, hi) =>
      Some(col(c).isNotNull && !(col(c) >= lo && col(c) <= hi))
    case InSet(c, vs)     => Some(col(c).isNotNull && !col(c).isin(vs: _*))
    case Matches(c, re)   => Some(col(c).isNotNull && !col(c).rlike(re))
    case Unique(_)        => None
  }

  private def violationAgg(e: Expectation): Column = e match {
    case Unique(cols) =>
      // rows beyond the first per fully-non-null key; null-keyed rows
      // are Complete's business, not duplicates (count_distinct skips
      // them, so the minuend must too)
      count(when(cols.map(c => col(c).isNotNull).reduce(_ && _), 1)) -
        countDistinct(col(cols.head), cols.tail.map(col): _*)
    case other =>
      count(when(rowViolation(other).get, 1))
  }

  /** One row per expectation: (check_name, violations, total, passed).
    * A single aggregation job regardless of expectation count. */
  def audit(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "no expectations given")
    val aggs = expectations.zipWithIndex.map { case (e, i) =>
      violationAgg(e).as(s"_v$i")
    }
    df.agg(count(lit(1)).as("_total"), aggs: _*)
      .select(col("_total"), explode(array(
        expectations.zipWithIndex.map { case (e, i) =>
          struct(lit(e.name).as("check_name"),
            col(s"_v$i").as("violations"))
        }: _*)).as("m"))
      .select(col("m.check_name").as("check_name"),
        col("m.violations").as("violations"),
        col("_total").as("total"),
        (col("m.violations") === 0).as("passed"))
  }

  /** Rows failing at least one ROW-LEVEL expectation, with a stable
    * comma-joined `reasons` column (expectation order). Table-level
    * checks ([[Unique]]) are rejected — they have no per-row meaning. */
  def quarantine(df: DataFrame,
                 expectations: Seq[Expectation]): DataFrame = {
    val preds = rowPreds(expectations)
    df.withColumn("reasons", concat_ws(",", preds.map { case (n, p) =>
        when(p, n).otherwise(lit(null))
      }: _*))
      .filter(col("reasons") =!= "")
  }

  /** The complement of [[quarantine]]: rows passing every row-level
    * expectation, original schema. */
  def retain(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    val preds = rowPreds(expectations)
    df.filter(!preds.map(_._2).reduce(_ || _))
  }

  private def rowPreds(expectations: Seq[Expectation]): Seq[(String, Column)] = {
    require(expectations.nonEmpty, "no expectations given")
    expectations.map { e =>
      rowViolation(e) match {
        case Some(p) => (e.name, p)
        case None => throw new IllegalArgumentException(
          s"${e.name} is table-level; row-level split cannot apply it")
      }
    }
  }

  /** Raise unless every expectation holds — the write-gate primitive.
    * The audit result is expectation-count sized; collecting it is a
    * driver-side scalar read, same class as the checkpoint max. */
  def enforce(df: DataFrame, expectations: Seq[Expectation]): Unit = {
    val failed = audit(df, expectations)
      .filter(!col("passed"))
      .select("check_name", "violations").collect()
    if (failed.nonEmpty) {
      val detail = failed.map(r => s"${r.getString(0)}=${r.getLong(1)}")
        .mkString(", ")
      throw new IllegalStateException(
        s"expectation violations block the write: $detail")
    }
  }

  /** Validated snapshot commit: enforce, THEN write — a violating frame
    * never produces a version, and the previous version stays live
    * (spec-pinned). The CHECK-constraint write path of a lakehouse
    * table. */
  def gatedReplace(df: DataFrame, path: String,
                   expectations: Seq[Expectation],
                   keepVersions: Int = 2): Unit = {
    enforce(df, expectations)
    graft.pipeline.Snapshot.createOrReplace(df, path,
      keepVersions = keepVersions)
  }
}
