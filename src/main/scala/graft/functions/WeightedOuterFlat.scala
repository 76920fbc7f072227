package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Row-wise flattened weighted outer product: `w · x xᵀ` as a d² array —
  * the per-row contribution to the XᵀWX sufficient statistic of a
  * normal-equations / IRLS fit, feeding [[VectorSumAgg]].
  *
  * The nested-HOF formulation
  * `flatten(transform(x, xi -> transform(x, xj -> xi*xj*w)))` evaluates d²
  * interpreted lambdas per row (~4k for a 64-dim embedding with bias);
  * this expression is one fused loop writing a primitive double[]. */
case class WeightedOuterFlat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"weighted_outer_flat expects (array<double>, double), got " +
            s"${l.catalogString} / ${r.catalogString}")
    }

  override def nullSafeEval(x: Any, wv: Any): Any = {
    val a = x.asInstanceOf[ArrayData]
    val w = wv.asInstanceOf[Double]
    val n = a.numElements()
    val out = new Array[Double](n * n)
    var i = 0
    while (i < n) {
      val xiw = a.getDouble(i) * w
      var j = 0
      while (j < n) { out(i * n + j) = xiw * a.getDouble(j); j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, w) => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val xiw = ctx.freshName("xiw")
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n * $n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xiw = $a.getDouble($i) * $w;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $out[$i * $n + $j] = $xiw * $a.getDouble($j);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object WeightedOuterFlat {
  def apply(x: Column, w: Column): Column =
    ColumnBridge.column(WeightedOuterFlat(
      ColumnBridge.expression(x), ColumnBridge.expression(w)))
}
