package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native affine projection `y = R·(x − μ)`: the per-row scoring kernel of
  * a driver-resident linear map (PCA components, random projections, LDA
  * directions). `R` (k×d) and `μ` (d) travel as codegen reference objects
  * — like [[NearestCentroid]]'s centroid matrix, the generated source is
  * identical across fits, so Janino compiles once and the codegen cache
  * hits on every refreshed model.
  *
  * The HOF formulation — `transform(lit(rows), r -> aggregate(zip_with(
  * x, r, ...)))` — evaluates k·d interpreted lambdas per row and falls
  * out of whole-stage codegen entirely; this is one fused two-level loop.
  * A row whose array length differs from the model's d is a HARD error
  * (the NormalEqAgg raggedness discipline): fit rejects ragged input,
  * but project accepts ANY frame — silently truncating a 32-dim column
  * against a 64-dim model would emit plausible-looking wrong projections
  * for every row. */
case class AffineProject(child: Expression, mean: Seq[Double],
                         rows: Seq[Seq[Double]]) extends UnaryExpression {

  @transient private lazy val mu: Array[Double] = mean.toArray
  @transient private lazy val mat: Array[Array[Double]] = {
    val m = rows.map(_.toArray).toArray
    m.foreach(r => require(r.length == mean.length,
      s"affine_project: component row of length ${r.length} vs mean of " +
        s"length ${mean.length} — inconsistent model"))
    m
  }

  // cached: the interpreted path reads this per ROW, and dataType
  // resolution is a method-call chain, not a field
  @transient private lazy val elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"affine_project expects array<float|double>, got ${other.catalogString}")
    }

  /** Shared dimension gate for both evaluation paths. */
  def requireDim(n: Int): Unit =
    if (n != mu.length) throw new IllegalArgumentException(
      s"affine_project: input vector has $n dims but the model has " +
        s"${mu.length} — wrong column or truncated upstream data; " +
        "refusing to silently truncate")

  /** ArrayData.getDouble/getFloat read a NULL element as 0.0 — which
    * would project a vector with missing dims into a plausible-looking
    * wrong point. Same discipline as [[requireDim]]: hard error, shared
    * by both evaluation paths, and only PAID when the column's type
    * admits nulls (containsNull=false skips the scan entirely). */
  @transient private lazy val mayContainNull: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  def requireNoNullElems(v: ArrayData): Unit = {
    var i = 0
    val n = v.numElements()
    while (i < n) {
      if (v.isNullAt(i)) throw new IllegalArgumentException(
        s"affine_project: input vector has a NULL element at index $i — " +
          "a null dim would silently read as 0.0 and produce a wrong " +
          "projection; clean or impute upstream")
      i += 1
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    requireDim(v.numElements())
    if (mayContainNull) requireNoNullElems(v)
    val isF = elemIsFloat
    val d = mu.length
    val out = new Array[Double](mat.length)
    var r = 0
    while (r < mat.length) {
      val row = mat(r)
      var s = 0.0; var i = 0
      while (i < d) {
        val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
        s += row(i) * (x - mu(i)); i += 1
      }
      out(r) = s; r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val matRef = ctx.addReferenceObj("projRows", mat, "double[][]")
    val muRef = ctx.addReferenceObj("projMean", mu, "double[]")
    val self = ctx.addReferenceObj("affineExpr", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m"); val u = ctx.freshName("u")
      val out = ctx.freshName("out"); val r = ctx.freshName("r")
      val row = ctx.freshName("row")
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val nullGate =
        if (mayContainNull) s"$self.requireNoNullElems($a);"
        else "" // containsNull=false: no scan, no branch in the hot loop
      s"""
         |double[][] $m = $matRef;
         |double[] $u = $muRef;
         |$self.requireDim($a.numElements());
         |$nullGate
         |double[] $out = new double[$m.length];
         |for (int $r = 0; $r < $m.length; $r++) {
         |  double[] $row = $m[$r];
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $u.length; $i++) {
         |    $s += $row[$i] * ((double) $a.$get($i) - $u[$i]);
         |  }
         |  $out[$r] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AffineProject {
  def apply(v: Column, mean: Seq[Double], rows: Seq[Seq[Double]]): Column =
    ColumnBridge.column(AffineProject(ColumnBridge.expression(v), mean, rows))
}

/** Native reduced-rank reconstruction error `‖x − μ‖² − ‖R·(x − μ)‖²`
  * for an ORTHONORMAL row basis `R` (k×d) — the squared distance from x
  * to the affine subspace μ + span(R), by Pythagoras, in ONE fused pass
  * (no materialized projection, no reconstruction round-trip, no HOF
  * lambdas). This is the embedding-quality screen a curation pipeline
  * pairs with ANN: a vector far from the corpus' principal subspace is
  * an outlier/garbage embedding regardless of its nearest neighbors.
  *
  * Same model-shipping, dimension-gate and null-element discipline as
  * [[AffineProject]]. Orthonormality makes the true value ≥ 0; the
  * subtraction can dip a few ulps negative when x lies IN the subspace,
  * so the result clamps at 0.0 rather than leaking -1e-16 "errors" into
  * downstream threshold comparisons. */
case class ReconstructionError(child: Expression, mean: Seq[Double],
                               rows: Seq[Seq[Double]]) extends UnaryExpression {

  @transient private lazy val mu: Array[Double] = mean.toArray
  @transient private lazy val mat: Array[Array[Double]] = {
    val m = rows.map(_.toArray).toArray
    m.foreach(r => require(r.length == mean.length,
      s"reconstruction_error: component row of length ${r.length} vs " +
        s"mean of length ${mean.length} — inconsistent model"))
    m
  }

  // cached: compute() is BOTH evaluation paths (codegen calls it too),
  // so this is read once per row either way
  @transient private lazy val elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"reconstruction_error expects array<float|double>, got ${other.catalogString}")
    }

  @transient private lazy val mayContainNull: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  /** The whole computation, shared verbatim by both evaluation paths —
    * centering happens once into a scratch buffer so the k·d inner loop
    * reads doubles, not ArrayData accessors. */
  def compute(v: ArrayData): Double = {
    val d = mu.length
    if (v.numElements() != d) throw new IllegalArgumentException(
      s"reconstruction_error: input vector has ${v.numElements()} dims " +
        s"but the model has $d — refusing to silently truncate")
    val isF = elemIsFloat
    val cen = new Array[Double](d)
    var tot = 0.0
    var i = 0
    while (i < d) {
      if (mayContainNull && v.isNullAt(i)) throw new IllegalArgumentException(
        s"reconstruction_error: input vector has a NULL element at index $i" +
          " — a null dim would silently read as 0.0; clean or impute upstream")
      val x = (if (isF) v.getFloat(i).toDouble else v.getDouble(i)) - mu(i)
      cen(i) = x; tot += x * x; i += 1
    }
    var proj = 0.0
    var r = 0
    while (r < mat.length) {
      val row = mat(r)
      var s = 0.0; i = 0
      while (i < d) { s += row(i) * cen(i); i += 1 }
      proj += s * s; r += 1
    }
    math.max(0.0, tot - proj)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("recErrExpr", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ReconstructionError {
  def apply(v: Column, mean: Seq[Double], rows: Seq[Seq[Double]]): Column =
    ColumnBridge.column(ReconstructionError(ColumnBridge.expression(v), mean, rows))
}
