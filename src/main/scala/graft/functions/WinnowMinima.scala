package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native winnowing selection: the sorted distinct minima of every
  * `w`-wide sliding window over a hash array, in ONE pass via the
  * classic monotonic-deque sliding minimum — O(n) total, where the
  * composable form ([[graft.ext.TextOps.winnowFromHashes]]) evaluates
  * an interpreted `array_min(slice(...))` lambda per window (O(n·w)
  * plus a lambda frame per element).
  *
  * Semantics mirror the composable form exactly (asserted in
  * TextOpsSpec): fewer than `w` elements → one minimum of the whole
  * array; empty array → `[null]` (array_min of empty is null); output
  * ascending distinct.
  */
case class WinnowMinima(child: Expression, w: Int)
    extends UnaryExpression {
  require(w > 0, s"window must be positive: $w")

  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"winnow expects array<bigint>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array[Any](null))
    val mins: Array[Long] =
      if (n < w) {
        var m = Long.MaxValue
        var i = 0
        while (i < n) { val v = arr.getLong(i); if (v < m) m = v; i += 1 }
        Array(m)
      } else {
        // monotonic deque of indices; head is the current window's min.
        // Adjacent windows usually share a min, so skip-if-same before
        // buffering, then sort + in-place dedupe the primitive buffer —
        // zero boxing on the per-row hot path.
        val buf = new Array[Long](n - w + 1)
        var cnt = 0
        val dq = new Array[Int](n)
        var head = 0
        var tail = 0 // exclusive
        var i = 0
        while (i < n) {
          val v = arr.getLong(i)
          while (tail > head && arr.getLong(dq(tail - 1)) >= v) tail -= 1
          dq(tail) = i; tail += 1
          if (dq(head) <= i - w) head += 1
          if (i >= w - 1) {
            val m = arr.getLong(dq(head))
            if (cnt == 0 || buf(cnt - 1) != m) { buf(cnt) = m; cnt += 1 }
          }
          i += 1
        }
        java.util.Arrays.sort(buf, 0, cnt)
        var out = 0
        var j = 1
        while (j < cnt) {
          if (buf(j) != buf(out)) { out += 1; buf(out) = buf(j) }
          j += 1
        }
        java.util.Arrays.copyOf(buf, out + 1)
      }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // one boxed call into the interpreted path — this expression always
    // sits next to higher-order md5 producers that force the enclosing
    // Project to interpreted fallback anyway; a bespoke generated deque
    // would never run inside a whole-stage span in practice
    val self = ctx.addReferenceObj("winnow", this, classOf[WinnowMinima].getName)
    nullSafeCodeGen(ctx, ev, in => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
        $self.nullSafeEvalPublic($in);""")
  }

  private[functions] def nullSafeEvalPublic(input: Any): Any =
    nullSafeEval(input)

  override protected def withNewChildInternal(
      newChild: Expression): WinnowMinima = copy(child = newChild)
}
