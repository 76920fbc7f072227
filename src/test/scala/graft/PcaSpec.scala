package graft

import org.apache.spark.sql.functions._
import graft.ml.Pca

/** PCA: Jacobi eigensolver pinned against hand-diagonalizable matrices,
  * fit+project against an exactly-known planted covariance, orthonormality
  * and variance-ordering invariants on real embeddings, determinism (sign
  * pinning), and the codegen path of the AffineProject kernel. */
class PcaSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  test("jacobiEigen reproduces a hand-diagonalized 2x2 and a diagonal matrix exactly") {
    // [[2,1],[1,2]] → eigenvalues 3,1; eigenvectors (1,1)/√2, (1,-1)/√2
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2)
    assert(math.abs(vecs(0)(0) - r) < 1e-12 && math.abs(vecs(0)(1) - r) < 1e-12)
    // sign pinned: largest-|entry| positive → (r, -r) not (-r, r)
    assert(math.abs(vecs(1)(0) - r) < 1e-12 && math.abs(vecs(1)(1) + r) < 1e-12)
    val (dv, dw) = Pca.jacobiEigen(Array(
      Array(1.0, 0.0, 0.0), Array(0.0, 5.0, 0.0), Array(0.0, 0.0, 3.0)))
    assert(dv.toSeq == Seq(5.0, 3.0, 1.0))
    assert(dw(0).toSeq == Seq(0.0, 1.0, 0.0) && dw(2).toSeq == Seq(1.0, 0.0, 0.0))
  }

  test("fit recovers a planted principal axis and project scores along it") {
    // points on a line along (3,4)/5 with tiny isotropic noise: the top
    // component must be ±(0.6, 0.8) and capture almost all variance
    val rnd = new scala.util.Random(5L)
    val pts = (0 until 2000).map { i =>
      val t = rnd.nextGaussian() * 10
      val (nx, ny) = (rnd.nextGaussian() * 0.01, rnd.nextGaussian() * 0.01)
      (i.toLong, Array(0.6 * t + 5 + nx, 0.8 * t - 2 + ny))
    }.toDF("id", "emb")
    val m = Pca.fit(pts, "emb", k = 1)
    assert(m.d == 2 && m.n == 2000)
    assert(math.abs(m.components(0)(0) - 0.6) < 0.01 &&
      math.abs(m.components(0)(1) - 0.8) < 0.01)
    assert(m.explainedVariance(1) > 0.999)
    assert(math.abs(m.mean(0) - 5.0) < 0.5 && math.abs(m.mean(1) + 2.0) < 0.5)
    // projection of the mean itself is ~0; a point at mean + component is ~1
    val probe = Seq((1L, m.mean), (2L, m.mean.zip(m.components(0)).map { case (a, b) => a + b }))
      .toDF("id", "emb")
    val got = Pca.project(probe, "emb", m).orderBy("id")
      .select("pca").collect().map(_.getSeq[Double](0).head)
    assert(math.abs(got(0)) < 1e-9 && math.abs(got(1) - 1.0) < 1e-9)
  }

  test("components are orthonormal and variance-ordered on real embeddings; model is deterministic") {
    val docs = Tables.embeddings(spark, sf)
    val m = Pca.fit(docs, "embedding", k = 8)
    // orthonormal rows
    for (i <- 0 until 8; j <- i until 8) {
      val dot = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"<c$i, c$j> = $dot")
    }
    // eigenvalues descending, non-negative (covariance is PSD)
    m.eigenvalues.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b - 1e-12) }
    assert(m.eigenvalues.last > -1e-9)
    assert(m.explainedVariance(8) <= 1.0 + 1e-12 &&
      m.explainedVariance(8) >= m.explainedVariance(1))
    // determinism: a second fit over the same data is bit-identical
    val m2 = Pca.fit(docs, "embedding", k = 8)
    assert(m.components.flatten.toSeq == m2.components.flatten.toSeq &&
      m.eigenvalues.toSeq == m2.eigenvalues.toSeq)
    // projected variance along component 0 equals eigenvalue 0 (population)
    val proj = Pca.project(docs, "embedding", m)
      .select(element_at(col("pca"), 1).as("p0"))
    val varP0 = proj.agg((sum(col("p0") * col("p0")) / count(lit(1))
      - pow(avg(col("p0")), 2)).as("v")).head.getDouble(0)
    assert(math.abs(varP0 - m.eigenvalues(0)) < 1e-6 * math.max(1.0, m.eigenvalues(0)),
      s"var(p0)=$varP0 vs λ0=${m.eigenvalues(0)}")
    // a wrong-dimension projection fails loudly, never truncates silently
    val wrongDim = Seq((1L, Array.fill(8)(0.5))).toDF("id", "emb")
    val dimErr = intercept[Exception] {
      Pca.project(wrongDim, "emb", m).collect()
    }
    assert(dimErr.toString.contains("refusing to silently truncate") ||
      Option(dimErr.getCause).exists(_.toString.contains("refusing to silently truncate")),
      dimErr.toString)
    // a NULL element inside a vector fails loudly: ArrayData reads a
    // null dim as 0.0, which would project to a plausible-looking wrong
    // point — the same refusal discipline as the dimension gate
    val nullElem = Seq((1L, Seq[java.lang.Double](0.5, null, 0.25, 0.0)
        ++ Seq.fill[java.lang.Double](m.d - 4)(0.1)))
      .toDF("id", "emb")
    val nullErr = intercept[Exception] {
      Pca.project(nullElem, "emb", m).collect()
    }
    assert(nullErr.toString.contains("NULL element") ||
      Option(nullErr.getCause).exists(_.toString.contains("NULL element")),
      nullErr.toString)
    // a nullable-typed column with NO actual nulls still projects fine
    val nullableOk = Seq((1L, Seq[java.lang.Double](m.mean.map(Double.box): _*)))
      .toDF("id", "emb")
    val okRow = Pca.project(nullableOk, "emb", m)
      .select("pca").head.getSeq[Double](0)
    assert(okRow.forall(v => math.abs(v) < 1e-9))
    // guardrails
    intercept[IllegalArgumentException] { Pca.fit(docs, "embedding", k = 0) }
    intercept[IllegalArgumentException] {
      Pca.fit(docs.limit(1), "embedding", k = 1)
    }
    intercept[IllegalArgumentException] {
      Pca.fit(docs, "embedding", k = 10_000)
    }
  }
}
