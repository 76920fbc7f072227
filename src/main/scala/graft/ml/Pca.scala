package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{AffineProject, VectorOps}

/** Principal component analysis over an embedding column — the fifth
  * instance of the engine's sufficient-statistics pattern (k-means,
  * ridge, IRLS, NB, PCA): the d×d covariance is assembled from ONE
  * distributed aggregation and the eigenproblem is solved on the driver,
  * because for embedding-scale d (64-1024) the covariance is KBs-MBs
  * while the corpus is TBs — the one-collect-then-broadcast split that
  * keeps every iteration-free model fit single-pass at 100 TB.
  *
  * FIT reuses [[graft.functions.NormalEqAgg]] with w = z = 1: one fused
  * aggregation returns `[XᵀX (d²) | Xᵀ1 (d)]` — the Gram matrix AND the
  * column sums together — plus a count; covariance = XᵀX/n − μμᵀ
  * (population form, matching the 1/n normalization the z-score operators
  * use). The symmetric eigenproblem is solved by cyclic Jacobi rotations
  * (public textbook algorithm — Golub & Van Loan §8.5): O(d³) per sweep
  * on a d≤1024 driver-resident matrix, unconditionally convergent for
  * symmetric input, no external linear-algebra dependency. Determinism:
  * eigenpairs sort by (eigenvalue desc, then first-differing component),
  * and each eigenvector's sign is fixed so its largest-magnitude entry is
  * positive — eigenvectors are only defined up to sign, and an unpinned
  * sign would make every downstream projection build-order-dependent.
  *
  * PROJECT is map-side: the k×d component matrix and the mean travel as
  * codegen reference objects inside the native [[AffineProject]] kernel
  * (one fused loop per row, no interpreted HOF lambdas, no shuffle).
  */
object Pca {

  /** Driver-resident model. `components` is k×d (rows = principal axes,
    * orthonormal); `eigenvalues` carries ALL d variances (descending) so
    * explained-variance ratios don't depend on the k chosen at fit. */
  case class PcaModel(mean: Array[Double], components: Array[Array[Double]],
                      eigenvalues: Array[Double], n: Long) {
    require(components.nonEmpty && eigenvalues.nonEmpty)
    def k: Int = components.length
    def d: Int = mean.length
    /** Fraction of total variance captured by the first `kk` axes. */
    def explainedVariance(kk: Int = k): Double = {
      require(kk >= 1 && kk <= eigenvalues.length)
      val tot = eigenvalues.sum
      if (tot <= 0) 0.0 else eigenvalues.take(kk).sum / tot
    }
  }

  def fit(df: DataFrame, embCol: String, k: Int): PcaModel = {
    require(k >= 1, s"pca: k must be >= 1, got $k")
    // one distributed aggregation: Gram + column sums + row count.
    // NormalEqAgg rejects ragged arrays itself (flat-layout safety).
    val row = df.select(VectorOps.toDouble(col(embCol)).as("x"))
      .filter(col("x").isNotNull)
      .agg(graft.functions.NormalEq.normalEq(col("x"), lit(1.0), lit(1.0)).as("s"),
        count(lit(1)).as("n")).head
    val n = row.getLong(1)
    require(n >= 2, s"pca: need at least 2 rows, got $n")
    val s = row.getSeq[Double](0).toArray
    // s = [XᵀX row-major (d²) | Xᵀ1 (d)]
    val d = graft.functions.NormalEq.dimOf(s.length)
    require(k <= d, s"pca: k=$k exceeds dimensionality d=$d")
    val mean = Array.tabulate(d)(i => s(d * d + i) / n)
    val cov = Array.tabulate(d, d)((i, j) => s(i * d + j) / n - mean(i) * mean(j))
    val (values, vectors) = jacobiEigen(cov)
    PcaModel(mean, vectors.take(k), values, n)
  }

  /** Append `outCol` = the k-dim projection of `embCol` (double array). */
  def project(df: DataFrame, embCol: String, model: PcaModel,
              outCol: String = "pca"): DataFrame =
    df.withColumn(outCol, AffineProject(col(embCol),
      model.mean.toSeq, model.components.map(_.toSeq).toSeq))

  /** Whitened projection `y = Λ^(−1/2)·R·(x − μ)`: per-axis unit
    * variance (population), zero cross-covariance — the preprocessing
    * many similarity/metric-learning consumers want before cosine/L2.
    * Folding the 1/√λ scaling INTO the row matrix keeps this the same
    * single [[AffineProject]] kernel as [[project]] — zero extra row
    * work, identical codegen shape.
    *
    * Refuses a (near-)degenerate axis loudly: whitening a direction
    * whose variance is ~0 multiplies numerical noise by an unbounded
    * factor, and every downstream distance would be dominated by that
    * garbage coordinate. `minVar` is relative to the leading eigenvalue;
    * refit with a smaller k (or screen with [[reconstructionError]])
    * rather than lowering it blindly. */
  def projectWhitened(df: DataFrame, embCol: String, model: PcaModel,
                      outCol: String = "pca_white",
                      minVar: Double = 1e-12): DataFrame = {
    require(minVar > 0, s"pca: minVar must be positive, got $minVar")
    val lead = model.eigenvalues.take(model.k)
    // Relative floor, as documented: minVar scales the LEADING eigenvalue
    // (guarded positive), so legitimately small-scale data (leading
    // eigenvalue << 1) with a well-conditioned spectrum whitens fine; a
    // max(1.0, head) clamp here would silently turn the floor absolute
    // below unit variance (r12 ADVICE).
    require(model.eigenvalues.head > 0,
      "pca: whitening refused — the leading eigenvalue is zero (the " +
        "corpus has no variance at all); nothing to whiten")
    val floor = minVar * model.eigenvalues.head
    val bad = lead.indexWhere(_ <= floor)
    require(bad < 0,
      s"pca: whitening refused — eigenvalue $bad (${if (bad >= 0) lead(bad) else 0.0}) " +
        s"is at/below the degeneracy floor $floor; that axis carries no " +
        "variance and 1/sqrt(lambda) would amplify noise unboundedly. " +
        "Refit with smaller k.")
    val rows = model.components.zip(lead).map { case (r, l) =>
      val s = 1.0 / math.sqrt(l); r.map(_ * s).toSeq
    }.toSeq
    df.withColumn(outCol, AffineProject(col(embCol), model.mean.toSeq, rows))
  }

  /** Append `outCol` = the squared distance from `embCol` to the model's
    * k-dim principal subspace (`‖x−μ‖² − ‖R(x−μ)‖²`, the reduced-rank
    * reconstruction error) — the embedding-quality outlier screen: rows
    * far from the subspace the corpus actually occupies are garbage
    * embeddings no matter what ANN finds near them. One fused native
    * pass ([[graft.functions.ReconstructionError]]); no projection
    * materialized, no reconstruction round-trip. */
  def reconstructionError(df: DataFrame, embCol: String, model: PcaModel,
                          outCol: String = "pca_rec_err"): DataFrame =
    df.withColumn(outCol, graft.functions.ReconstructionError(col(embCol),
      model.mean.toSeq, model.components.map(_.toSeq).toSeq))

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues desc, matching orthonormal row-eigenvectors), signs
    * pinned (largest-|entry| positive, ties to the earliest index). */
  private[graft] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val maxSweeps = 64
    var sweep = 0
    var off = offDiag(a)
    val tol = 1e-14 * math.max(1.0, frob(a))
    while (off > tol && sweep < maxSweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            // rotation annihilating a(p)(q) (Golub & Van Loan 8.5.2)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1))
              case sg  => sg / (math.abs(theta) + math.sqrt(theta * theta + 1))
            }
            val c = 1.0 / math.sqrt(t * t + 1)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    require(off <= tol,
      s"pca: Jacobi did not converge in $maxSweeps sweeps (off-diagonal $off)")
    // columns of v are eigenvectors; sort by eigenvalue desc, pin signs
    val order = (0 until d).sortBy(i => -a(i)(i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map { ci =>
      val vec = Array.tabulate(d)(r => v(r)(ci))
      val m = vec.indices.maxBy(i => (math.abs(vec(i)), -i))
      if (vec(m) < 0) vec.map(x => -x) else vec
    }.toArray
    (values, vectors)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) {
        if (i != j) s += a(i)(j) * a(i)(j); j += 1
      }
      i += 1
    }
    math.sqrt(s)
  }

  private def frob(a: Array[Array[Double]]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }
}
