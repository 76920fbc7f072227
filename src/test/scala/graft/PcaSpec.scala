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

  test("whitened projection has unit per-axis variance; reconstruction error is the exact subspace distance") {
    val docs = Tables.embeddings(spark, sf)
    val m = Pca.fit(docs, "embedding", k = 4)
    // whitening: var(y_i) = λ_i/λ_i = 1 (population), per axis
    val white = Pca.projectWhitened(docs, "embedding", m)
    (1 to 4).foreach { i =>
      val v = white.select(element_at(col("pca_white"), i).as("y"))
        .agg((sum(col("y") * col("y")) / count(lit(1))
          - pow(avg(col("y")), 2)).as("v")).head.getDouble(0)
      assert(math.abs(v - 1.0) < 1e-6, s"axis $i: whitened var $v != 1")
    }
    // reconstruction error: hand probes against the model's OWN axes.
    // A same-fit full-rank model shares the eigenbasis (deterministic
    // Jacobi), so its row k is orthogonal to the k=4 model's span.
    val mFull = Pca.fit(docs, "embedding", k = m.d)
    assert(mFull.components.take(4).flatten.toSeq ==
      m.components.flatten.toSeq, "same fit must share the eigenbasis")
    val inSpan = m.mean.zip(m.components(1)).map { case (a, b) => a + 2.0 * b }
    val offSpan = m.mean.zip(mFull.components(4)).map { case (a, b) => a + 3.0 * b }
    val probes = Seq((1L, m.mean), (2L, inSpan), (3L, offSpan))
      .toDF("id", "emb")
    val err = Pca.reconstructionError(probes, "emb", m).orderBy("id")
      .select("pca_rec_err").collect().map(_.getDouble(0))
    assert(err(0) == 0.0 && err(1) < 1e-18, s"in-span err ${err.toSeq}")
    assert(math.abs(err(2) - 9.0) < 1e-9, s"off-span err ${err(2)} != 3²")
    // corpus identity: rec_err == ||x−μ||² − ||proj||², row for row
    val got = Pca.reconstructionError(
        Pca.project(docs, "embedding", m), "embedding", m)
      .select(col("vec_id"), col("embedding"), col("pca"), col("pca_rec_err"))
      .collect()
    got.foreach { r =>
      val x = r.getSeq[Float](1).map(_.toDouble)
      val tot = x.zip(m.mean).map { case (a, b) => (a - b) * (a - b) }.sum
      val proj = r.getSeq[Double](2).map(y => y * y).sum
      val want = math.max(0.0, tot - proj)
      assert(math.abs(r.getDouble(3) - want) < 1e-9 * math.max(1.0, want),
        s"vec ${r.getLong(0)}: ${r.getDouble(3)} vs $want")
    }
    // degenerate-axis whitening refused loudly: plant data in a 2-D plane
    // of 3-D space, ask for k=3
    val rnd = new scala.util.Random(9L)
    val planar = (0 until 500).map { i =>
      val (t1, t2) = (rnd.nextGaussian() * 5, rnd.nextGaussian() * 2)
      (i.toLong, Array(t1, t2, 0.0))
    }.toDF("id", "emb")
    val mp = Pca.fit(planar, "emb", k = 3)
    val werr = intercept[IllegalArgumentException] {
      Pca.projectWhitened(planar, "emb", mp)
    }
    assert(werr.getMessage.contains("whitening refused"), werr.getMessage)
    // k=2 whitens fine on the same data
    assert(Pca.projectWhitened(planar, "emb", Pca.fit(planar, "emb", k = 2))
      .count() == 500)
    // the degeneracy floor is RELATIVE to the leading eigenvalue:
    // legitimately tiny-scale data (eigenvalues ~1e-13, far below what
    // an absolute 1e-12 floor would admit) with a well-conditioned
    // spectrum must whiten, and to unit variance (r12 ADVICE)
    val tiny = (0 until 500).map { i =>
      val (t1, t2) = (rnd.nextGaussian() * 3e-7, rnd.nextGaussian() * 1e-7)
      (i.toLong, Array(t1, t2))
    }.toDF("id", "emb")
    val tinyWhite = Pca.projectWhitened(tiny, "emb", Pca.fit(tiny, "emb", k = 2))
    (1 to 2).foreach { i =>
      val v = tinyWhite.select(element_at(col("pca_white"), i).as("y"))
        .agg((sum(col("y") * col("y")) / count(lit(1))
          - pow(avg(col("y")), 2)).as("v")).head.getDouble(0)
      assert(math.abs(v - 1.0) < 1e-6, s"tiny-scale axis $i: var $v != 1")
    }
    // the error kernel carries the same dim/null gates as the projector
    intercept[Exception] {
      Pca.reconstructionError(Seq((1L, Array(0.5))).toDF("id", "emb"),
        "emb", m).collect()
    }
    intercept[Exception] {
      Pca.reconstructionError(
        Seq((1L, Seq[java.lang.Double](null) ++
          Seq.fill[java.lang.Double](m.d - 1)(0.1))).toDF("id", "emb"),
        "emb", m).collect()
    }
  }
}
