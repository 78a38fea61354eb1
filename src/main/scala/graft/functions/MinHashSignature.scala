package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd MinHash signature: all `k` affine permutations
  * `(h·a_i + b_i) mod prime` minimized in ONE traversal of the base-hash
  * array.
  *
  * The composable form ([[graft.ext.DedupOps.withSignature]]'s
  * reference path) evaluates `array_min(transform(bases, …))` once per
  * hash function — k interpreted higher-order passes with a lambda
  * frame per element. This expression is the second place (after
  * [[VectorDot]]) where the built-in operator set genuinely
  * under-serves: a tight two-level primitive loop, fully inside
  * whole-stage codegen, k× fewer array traversals on the near-dup hot
  * path.
  *
  * Semantics are bit-identical to the composable form (same Long
  * arithmetic, coefficients chosen so `h·a + b` stays < 2^48 — no
  * overflow in either engine) INCLUDING the empty-input edge: an empty
  * array yields an array of k nulls, matching
  * `array(array_min(transform([], …)), …)` = `[null, …]`.
  */
case class MinHashSignature(child: Expression, a: Seq[Long], b: Seq[Long],
                            prime: Long) extends UnaryExpression {
  require(a.length == b.length && a.nonEmpty,
    "coefficient seqs must be equal-length and non-empty")

  private def k = a.length

  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"minhash_sig expects array<bigint>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k))
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = (h * a(j) + b(j)) % prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a.toArray, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b.toArray, "long[]")
    val n = ctx.freshName("n")
    val mins = ctx.freshName("mins")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val h = ctx.freshName("h")
    val v = ctx.freshName("v")
    nullSafeCodeGen(ctx, ev, c => s"""
      final int $n = $c.numElements();
      if ($n == 0) {
        ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            new Object[$k]);
      } else {
        final long[] $mins = new long[$k];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        for (int $i = 0; $i < $n; $i++) {
          final long $h = $c.getLong($i);
          for (int $j = 0; $j < $k; $j++) {
            final long $v = ($h * $aRef[$j] + $bRef[$j]) % ${prime}L;
            if ($v < $mins[$j]) $mins[$j] = $v;
          }
        }
        ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
      }""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignature = copy(child = newChild)
}
