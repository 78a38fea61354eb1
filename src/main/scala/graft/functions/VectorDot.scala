package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two float/double array columns.
  *
  * Why a custom Catalyst `Expression` (SURVEY §2.7 X3, the one place the
  * built-in operator set genuinely under-serves): the composable form —
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0d, (acc,v) => acc+v)` —
  * routes through higher-order functions, which allocate a lambda frame
  * per element and are evaluated interpreted inside codegen (no
  * whole-stage fusion). This expression emits a tight primitive loop via
  * `doGenCode`, keeping the similarity-search hot path fully inside
  * whole-stage codegen.
  *
  * Semantics are EXACTLY the strict left fold of the composable form —
  * double accumulator, per-element double casts, ascending index — so
  * results are bit-identical to the DuckDB oracle's `list_reduce` fold
  * (IEEE add/multiply are correctly rounded; same op sequence → same
  * bits).
  *
  * Null contract: null array → null; unequal lengths → null (zip_with
  * pads the shorter side with nulls, so the fold's accumulator goes null
  * — this expression matches that, keeping it bit-identical to
  * [[graft.ext.SimilarityOps.dotFold]] for ALL inputs, not just the
  * equal-length dense case); null elements are not expected (embedding
  * columns are dense) and read as 0.0, matching the parquet
  * primitive-array fast path.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // unequal-length inputs yield null even when both children are
  // non-nullable
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects array<float|double>, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    val (lf, rf) = (elemType(left) == FloatType, elemType(right) == FloatType)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    def get(arr: String, t: DataType, i: String): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ${get(a, elemType(left), i)} * ${get(b, elemType(right), i)};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}
