package graft

import graft.functions.VectorDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.types._

/** Session extension installer: registers the library's native
  * expressions in the SQL function registry (so `spark.sql("SELECT
  * vec_dot(a, b) ...")` reaches the codegen'd implementation) and the
  * analyzer rule that resolves [[graft.catalog.TableStore]] qualified
  * names (`silver.orders_current_priv`,
  * `iceberg.silver.orders_current_priv`) from `spark.sql`.
  *
  * Enable with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * (Verify/Bench/tests do) — the standard `SparkSessionExtensions`
  * mechanism a lakehouse engine (e.g. Iceberg's extension jar,
  * `/root/reference/jobs/merge_orders_silver.py:15`) uses to add rules
  * and functions without forking Spark. The DataFrame API reaches the
  * same expression via [[graft.ext.SimilarityOps.dot]] without needing
  * the registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorDot(children(0), children(1))
    ))
    // minhash_sig(bases): the library's standard 16-hash affine family
    // over an array<bigint> of base hashes, one traversal.
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(
        classOf[graft.functions.MinHashSignature].getName, "minhash_sig"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val (as, bs) = (0 until graft.ext.DedupOps.NumHashes)
          .map(graft.ext.DedupOps.hashParams).unzip
        graft.functions.MinHashSignature(children.head, as, bs,
          graft.ext.DedupOps.MinHashPrime)
      }
    ))
    // simhash_sig(hex_prefixes): 32-bit SimHash bit-string, one pass.
    ext.injectFunction((
      new FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(
        classOf[graft.functions.SimHashSignature].getName, "simhash_sig"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.SimHashSignature(children.head,
          graft.ext.DedupOps.SimHashBits)
    ))
    // winnow(hashes, w): sorted distinct sliding-window minima.
    ext.injectFunction((
      new FunctionIdentifier("winnow"),
      new ExpressionInfo(
        classOf[graft.functions.WinnowMinima].getName, "winnow"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        // The window must be a foldable integer ≥ 1 at analysis time —
        // anything else (a column, a string, a non-positive value) gets
        // a clear analysis-time error, not a ClassCastException at eval.
        import org.apache.spark.sql.catalyst.expressions.Literal
        val w = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case Literal(v: Long, LongType) if v >= 1 && v <= Int.MaxValue =>
            v.toInt
          case Literal(v: Short, ShortType) => v.toInt
          case other => throw new org.apache.spark.sql.AnalysisException(
            errorClass = "UNEXPECTED_INPUT_TYPE",
            messageParameters = Map(
              "paramIndex" -> "second",
              "functionName" -> "`winnow`",
              "requiredType" -> "integer literal",
              "inputSql" -> other.sql,
              "inputType" -> other.dataType.simpleString))
        }
        if (w < 1) throw new IllegalArgumentException(
          s"winnow(hashes, w): w must be >= 1, got $w")
        graft.functions.WinnowMinima(children.head, w)
      }
    ))
    // Trino scalar shims — the reference's privacy-view DDL
    // (`/root/reference/README.md:106-116`) spells the masking chain
    // `to_hex(sha256(to_utf8(<string>)))`; none of the three names
    // exists in Spark's registry (Spark spells the same value
    // `sha2(x, 256)` in lowercase hex). Each shim composes built-in
    // codegen'd expressions, so the verbatim README text plans exactly
    // like the native spelling:
    //   to_utf8(s)  = encode(s, 'UTF-8')        → VARBINARY
    //   sha256(b)   = unhex(sha2(b, 256))       → VARBINARY
    //   to_hex(b)   = hex(b) — Spark's Hex emits UPPERCASE, matching
    //                 Trino's to_hex (Guava base16) case-for-case.
    ext.injectFunction((
      new FunctionIdentifier("to_utf8"),
      new ExpressionInfo(classOf[org.apache.spark.sql.catalyst
        .expressions.Encode].getName, "to_utf8"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        org.apache.spark.sql.catalyst.expressions.Encode(children.head,
          org.apache.spark.sql.catalyst.expressions.Literal("UTF-8"))
    ))
    ext.injectFunction((
      new FunctionIdentifier("sha256"),
      new ExpressionInfo(classOf[org.apache.spark.sql.catalyst
        .expressions.Sha2].getName, "sha256"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        org.apache.spark.sql.catalyst.expressions.Unhex(
          org.apache.spark.sql.catalyst.expressions.Sha2(children.head,
            org.apache.spark.sql.catalyst.expressions.Literal(256)))
    ))
    ext.injectFunction((
      new FunctionIdentifier("to_hex"),
      new ExpressionInfo(classOf[org.apache.spark.sql.catalyst
        .expressions.Hex].getName, "to_hex"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        org.apache.spark.sql.catalyst.expressions.Hex(children.head)
    ))
    ext.injectResolutionRule(graft.catalog.ResolveGraftRelations.apply)
    // materialized-view rewrite: aggregates over a base table with a
    // registered FRESH rollup re-target the gold table (RollupRewrite;
    // post-hoc so it sees the ANALYZED scan shape, pre-optimizer)
    ext.injectPostHocResolutionRule(graft.catalog.RollupRewrite.apply)
    // rebuild-only MVs (the Trino-parity class): whole-plan match of
    // a FRESH store's defining query → serve the materialized table
    ext.injectPostHocResolutionRule(
      graft.catalog.MaterializedReadRewrite.apply)
    ext.injectParser((session, parser) =>
      new graft.catalog.GraftSqlParser(session, parser))
  }
}
