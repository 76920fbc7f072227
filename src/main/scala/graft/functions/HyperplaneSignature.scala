package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Random-hyperplane LSH signature: bit b of the result is the sign of
  * `dot(v, plane_b)`; planes are MSB-first, matching the composed
  * `reduce(acc * 2 + bit)` formulation this replaces.
  *
  * Like [[NearestCentroid]], the plane matrix travels in the codegen
  * references array — one fused nBits×dim loop whose generated code is
  * independent of the plane values and bit count, vs nBits separate
  * cosine expressions against literal arrays (recompiled per plane set,
  * with a `when` chain per bit). */
case class HyperplaneSignature(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  @transient private lazy val matrix: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_signature expects array<float|double>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    var sig = 0L
    var b = 0
    while (b < matrix.length) {
      val p = matrix(b)
      val n = math.min(p.length, v.numElements())
      var dot = 0.0; var i = 0
      while (i < n) {
        val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
        dot += x * p(i); i += 1
      }
      sig = sig * 2 + (if (dot >= 0.0) 1L else 0L)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val pRef = ctx.addReferenceObj("planes", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.freshName("mat"); val sig = ctx.freshName("sig")
      val b = ctx.freshName("b"); val p = ctx.freshName("p")
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |double[][] $mat = $pRef;
         |long $sig = 0L;
         |for (int $b = 0; $b < $mat.length; $b++) {
         |  double[] $p = $mat[$b];
         |  int $n = java.lang.Math.min($p.length, $a.numElements());
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (double) $a.$get($i) * $p[$i];
         |  }
         |  $sig = $sig * 2 + ($dot >= 0.0 ? 1L : 0L);
         |}
         |${ev.value} = $sig;
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSignature {
  def apply(v: Column, planes: Seq[Seq[Double]]): Column =
    ColumnBridge.column(HyperplaneSignature(ColumnBridge.expression(v), planes))
}
