package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass SimHash bit voting over an array of md5-hex
  * prefixes: all `bits` votes accumulated in a single traversal,
  * emitting the same '0'/'1' bit-string as the composable form
  * ([[graft.ext.DedupOps.simhashFromHexes]] — 32 separate interpreted
  * `aggregate()` lambdas, which also cost seconds of codegen/JIT on
  * first evaluation; this expression is a short primitive loop on both
  * counts). Bit b reads hex digit b/4, tests bit 3-b%4; each element
  * votes ±1; bit is '1' iff the vote sum is positive — identical
  * semantics, asserted bit-for-bit in DedupOpsSpec.
  *
  * Empty array → all-zero string (the fold's zero accumulator); null
  * array → null. Elements must be non-null lowercase hex of length ≥
  * bits/4 (md5 prefixes are).
  */
case class SimHashSignature(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits > 0 && bits % 4 == 0, s"bits must be a multiple of 4: $bits")

  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"simhash_sig expects array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val hex = arr.getUTF8String(i).toString
      var b = 0
      while (b < bits) {
        val c = hex.charAt(b / 4)
        val digit = if (c <= '9') c - '0' else c - 'a' + 10
        votes(b) += (((digit >> (3 - b % 4)) & 1) << 1) - 1
        b += 1
      }
      i += 1
    }
    val out = new Array[Char](bits)
    var b = 0
    while (b < bits) {
      out(b) = if (votes(b) > 0) '1' else '0'; b += 1
    }
    UTF8String.fromString(new String(out))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n")
    val votes = ctx.freshName("votes")
    val i = ctx.freshName("i")
    val b = ctx.freshName("b")
    val hex = ctx.freshName("hex")
    val c = ctx.freshName("c")
    val digit = ctx.freshName("digit")
    val out = ctx.freshName("out")
    nullSafeCodeGen(ctx, ev, in => s"""
      final int $n = $in.numElements();
      final int[] $votes = new int[$bits];
      for (int $i = 0; $i < $n; $i++) {
        final String $hex = $in.getUTF8String($i).toString();
        for (int $b = 0; $b < $bits; $b++) {
          final char $c = $hex.charAt($b / 4);
          final int $digit = $c <= '9' ? $c - '0' : $c - 'a' + 10;
          $votes[$b] += ((($digit >> (3 - $b % 4)) & 1) << 1) - 1;
        }
      }
      final char[] $out = new char[$bits];
      for (int $b = 0; $b < $bits; $b++) {
        $out[$b] = $votes[$b] > 0 ? '1' : '0';
      }
      ${ev.value} = org.apache.spark.unsafe.types.UTF8String
        .fromString(new String($out));""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): SimHashSignature = copy(child = newChild)
}
