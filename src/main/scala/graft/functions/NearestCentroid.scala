package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native argmin-over-centroids expressions for k-means assignment and IVF
  * cell routing.
  *
  * The composed formulation — `least(struct(dist_sq(v, lit(c0)), 0), ...)`
  * over k centroid literals — works, but its expression tree grows linearly
  * with k (k struct allocations per row, k literal array references) and the
  * struct comparisons inside `least` fall back to interpreted orderings. At
  * IVF-realistic nlist (256-4096 cells) that tree is enormous.
  *
  * These expressions instead hold the whole centroid matrix as ONE
  * codegen reference object (`double[][]`) and generate a tight two-level
  * loop. Because the matrix travels in the `references` array rather than
  * the generated source, the code text is identical across k-means
  * iterations and across fits — Janino compiles once and the codegen cache
  * hits thereafter, where the literal-struct formulation recompiled on
  * every centroid refresh.
  *
  * Tie-break: strictly-smaller distance wins, so the lowest centroid id is
  * kept on ties — identical to lexicographic `least(struct(dist, id))`.
  */
trait CentroidExpression extends UnaryExpression {
  def centroids: Seq[Seq[Double]]

  @transient protected lazy val matrix: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  protected def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects array<float|double>, got ${other.catalogString}")
    }
}

/** Id (0-based, as long) of the nearest centroid by squared euclidean
  * distance. */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
    extends CentroidExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    var best = 0L; var bestD = Double.PositiveInfinity
    var c = 0
    while (c < matrix.length) {
      val cc = matrix(c)
      val n = math.min(cc.length, v.numElements())
      var s = 0.0; var i = 0
      while (i < n) {
        val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
        val d = x - cc(i); s += d * d; i += 1
      }
      if (s < bestD) { bestD = s; best = c.toLong }
      c += 1
    }
    java.lang.Long.valueOf(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val cRef = ctx.addReferenceObj("centroids", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.freshName("mat"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val c = ctx.freshName("c")
      val cc = ctx.freshName("cc"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val dd = ctx.freshName("dd")
      s"""
         |double[][] $mat = $cRef;
         |long $best = 0L; double $bestD = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $mat.length; $c++) {
         |  double[] $cc = $mat[$c];
         |  int $n = java.lang.Math.min($cc.length, $a.numElements());
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $dd = (double) $a.$get($i) - $cc[$i];
         |    $s += $dd * $dd;
         |  }
         |  if ($s < $bestD) { $bestD = $s; $best = (long) $c; }
         |}
         |${ev.value} = $best;
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Ids of the `nprobe` nearest centroids, ordered by increasing distance
  * (ties by lower id) — the IVF query-routing primitive. Selection is an
  * insertion pass into nprobe-sized buffers (nprobe is small by design). */
case class NearestCells(child: Expression, centroids: Seq[Seq[Double]],
                        nprobe: Int) extends CentroidExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    val m = math.min(nprobe, matrix.length)
    val ids = new Array[Long](m)
    val ds = Array.fill(m)(Double.PositiveInfinity)
    var c = 0
    while (c < matrix.length) {
      val cc = matrix(c)
      val n = math.min(cc.length, v.numElements())
      var s = 0.0; var i = 0
      while (i < n) {
        val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
        val d = x - cc(i); s += d * d; i += 1
      }
      // strict < keeps the earlier (lower) id on equal distance
      var j = m - 1
      if (s < ds(j)) {
        while (j > 0 && s < ds(j - 1)) { ds(j) = ds(j - 1); ids(j) = ids(j - 1); j -= 1 }
        ds(j) = s; ids(j) = c.toLong
      }
      c += 1
    }
    new GenericArrayData(ids)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val cRef = ctx.addReferenceObj("centroids", matrix, "double[][]")
    val m = math.min(nprobe, centroids.length)
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.freshName("mat"); val ids = ctx.freshName("ids")
      val ds = ctx.freshName("ds"); val c = ctx.freshName("c")
      val cc = ctx.freshName("cc"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val dd = ctx.freshName("dd"); val j = ctx.freshName("j")
      s"""
         |double[][] $mat = $cRef;
         |long[] $ids = new long[$m];
         |double[] $ds = new double[$m];
         |java.util.Arrays.fill($ds, Double.POSITIVE_INFINITY);
         |for (int $c = 0; $c < $mat.length; $c++) {
         |  double[] $cc = $mat[$c];
         |  int $n = java.lang.Math.min($cc.length, $a.numElements());
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $dd = (double) $a.$get($i) - $cc[$i];
         |    $s += $dd * $dd;
         |  }
         |  int $j = $m - 1;
         |  if ($s < $ds[$j]) {
         |    for (; $j > 0 && $s < $ds[$j - 1]; $j--) {
         |      $ds[$j] = $ds[$j - 1]; $ids[$j] = $ids[$j - 1];
         |    }
         |    $ds[$j] = $s; $ids[$j] = (long) $c;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($ids);
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {
  def apply(v: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(v),
      centroids.toSeq.map(_.toSeq)))
}

object NearestCells {
  def apply(v: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    ColumnBridge.column(NearestCells(ColumnBridge.expression(v),
      centroids.toSeq.map(_.toSeq), nprobe))
}
