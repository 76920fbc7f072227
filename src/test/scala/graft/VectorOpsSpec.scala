package graft

import org.apache.spark.sql.functions._
import graft.functions.{CosineSimilarity, VectorOps}

class VectorOpsSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  test("native cosine expression is bit-identical to the HOF formulation") {
    val emb = Tables.embeddings(spark, sf)
    val pairs = emb.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .filter(col("a_id") < col("b_id") && col("b_id") <= 20)
    val diff = pairs
      .withColumn("c_hof", VectorOps.cosine(col("a"), col("b")))
      .withColumn("c_nat", VectorOps.cosineNative(col("a"), col("b")))
      .filter(col("c_hof") =!= col("c_nat"))
      .count()
    assert(diff == 0)
  }

  test("native cosine handles double arrays, zero vectors, SQL registration") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0)),
      (Array(0.0, 0.0, 0.0), Array(1.0, 2.0, 3.0))
    ).toDF("a", "b")
    val out = df.select(VectorOps.cosineNative(col("a"), col("b")).as("c"))
      .collect().map(r => Option(r.get(0)))
    assert(math.abs(out(0).get.asInstanceOf[Double] - 1.0) < 1e-12)
    assert(out(1).isEmpty, "zero vector must yield null, not NaN")

    CosineSimilarity.register(spark)
    df.createOrReplaceTempView("vec_pairs")
    val viaSql = spark.sql("SELECT graft_cosine(a, b) AS c FROM vec_pairs")
      .collect().map(r => Option(r.get(0)))
    assert(viaSql(0).get.asInstanceOf[Double] == out(0).get.asInstanceOf[Double])
  }

  test("codegen path is exercised (no fallback) for float arrays") {
    val emb = Tables.embeddings(spark, sf).limit(50)
    val plan = emb.select(VectorOps.cosineNative(col("embedding"), col("embedding")).as("c"))
    // evaluation succeeds and self-cosine == 1
    val vals = plan.collect().map(_.getDouble(0))
    assert(vals.forall(v => math.abs(v - 1.0) < 1e-9))
  }
}
