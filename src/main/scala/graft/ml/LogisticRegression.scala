package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{NormalEq, VectorOps}

/** Distributed L2-regularized logistic regression on array-valued feature
  * columns, fit by IRLS (iteratively reweighted least squares) — the
  * classification twin of [[LinearModel.fitRidge]] and the third instance
  * of the engine's sufficient-statistics pattern (k-means, ridge, IRLS):
  * the model (d+1 doubles) is driver-resident between iterations and
  * embedded into the scan; each iteration is ONE distributed aggregation
  * whose partial states are d²+d doubles per map partition, at any corpus
  * size. Deterministic: β₀ = 0, fixed iteration count, no RNG.
  */
object LogisticRegression {

  /** P(y=1|x) as a column, β embedded as a literal (last element = bias). */
  def predictProb(featCol: Column, beta: Array[Double]): Column = {
    val xb = VectorOps.dot(concat(featCol, array(lit(1.0))), typedLit(beta.toSeq))
    lit(1.0) / (lit(1.0) + exp(-xb))
  }

  /** Fit β (last element = bias) on (features: array<double>, label 0/1).
    *
    * Each IRLS iteration is ONE distributed aggregation via the fused
    * `normal_eq` aggregate (no per-row d² array — see
    * [[graft.functions.NormalEqAgg]]); raggedness is rejected by the
    * aggregate itself, so no separate uniformity scan is needed. */
  def fit(df: DataFrame, featCol: String, labelCol: String,
          lambda: Double = 1e-3, iters: Int = 4): Array[Double] = {
    val base = df.select(
      concat(col(featCol), array(lit(1.0))).as("x"),
      col(labelCol).cast("double").as("y"))
    var beta: Array[Double] = null // null = first iteration (β₀ = 0)
    for (_ <- 1 to iters) {
      val xb =
        if (beta == null) lit(0.0) // dot(x, 0-vector) without knowing d yet
        else VectorOps.dot(col("x"), typedLit(beta.toSeq))
      val p = lit(1.0) / (lit(1.0) + exp(-xb))
      // weight clipped away from 0 so the working response stays finite
      // for separable points
      val w = greatest(p * (lit(1.0) - p), lit(1e-6))
      val z = xb + (col("y") - p) / w
      val statsRow = base
        .agg(NormalEq.normalEq(col("x"), w, w * z).as("s"))
        .head()
      // null = the aggregate saw zero rows; diagnose instead of NPE
      require(!statsRow.isNullAt(0),
        "LogisticRegression.fit called on empty input (no non-null feature rows)")
      val flat = statsRow.getSeq[Double](0)
      val d = NormalEq.dimOf(flat.length)
      val xtwx = Array.tabulate(d, d)((i, j) => flat(i * d + j))
      val xtwz = Array.tabulate(d)(i => flat(d * d + i))
      (0 until d - 1).foreach(i => xtwx(i)(i) += lambda) // no penalty on bias
      beta = LinearModel.solve(xtwx, xtwz)
    }
    beta
  }

  /** SparkEntry glue: one-vs-rest for embedding label 0; per-label mean
    * predicted probability + accuracy at the 0.5 threshold (rows-only
    * check; the spec bounds accuracy against the base rate).
    *
    * Cache lifecycle: the corpus is cached only for the duration of the
    * fit + scoring passes, the per-label result (≤ #labels rows) is
    * materialized, and the cache is dropped with blocking=true BEFORE
    * returning — the r3 pattern (lazy result + non-blocking unpersist
    * issued before the caller's action) recomputed the whole pipeline on
    * every downstream action and left cache churn behind for the next
    * bench query.
    *
    * This cache deliberately SURVIVES the r8 drop-the-array-cache lesson
    * (rulPipeline): the embedding matrix is #vectors×d doubles — MB-scale
    * — so the row→columnar build amortizes over the 5 passes, and an r8
    * A/B probe measured the cached form faster (1.2 vs 1.4 s at sf0.1).
    * rulPipeline's tensor cache was two orders larger and read SLOWER
    * than the recompute; the lesson is about wide array columns at
    * hundreds of MB, not caching per se. */
  def tsLogregEmbed(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        VectorOps.toDouble(col("embedding")).as("features"),
        (col("label") === 0).cast("double").as("y"))
      .cache()
    try {
      val beta = fit(emb, "features", "y")
      val out = emb
        .withColumn("p", predictProb(col("features"), beta))
        .groupBy(col("label"))
        .agg(round(avg(col("p")), 6).as("mean_p"),
             avg(((col("p") >= 0.5).cast("double") === col("y")).cast("double")).as("acc"),
             count(lit(1)).as("n"))
        .select(col("label"), col("mean_p"), round(col("acc"), 6).as("acc"), col("n"))
      val rows = out.collect()
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), out.schema)
    } finally emb.unpersist(blocking = true)
  }
}
