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

  test("NearestCentroid/NearestCells match the struct-least formulation") {
    val emb = Tables.embeddings(spark, sf)
    val centroids = emb.orderBy("vec_id").limit(7).select("embedding")
      .collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val v = VectorOps.toDouble(col("embedding"))
    // composed reference: lexicographic least over (dist, id) structs
    val candidates = centroids.zipWithIndex.map { case (c, id) =>
      struct(VectorOps.distSq(v, typedLit(c)).as("d"), lit(id.toLong).as("id"))
    }
    val both = emb.select(
      least(candidates: _*).getField("id").as("want"),
      graft.functions.NearestCentroid(v, centroids).as("got"),
      slice(transform(array_sort(array(candidates: _*)), s => s("id")), 1, 3).as("want_cells"),
      graft.functions.NearestCells(v, centroids, 3).as("got_cells"))
    assert(both.filter(col("want") =!= col("got")).count() == 0)
    assert(both.filter(col("want_cells") =!= col("got_cells")).count() == 0)
    // ties: a duplicated centroid must resolve to the lower id
    val dup = centroids(0)
    val tied = emb.limit(5).select(
      graft.functions.NearestCentroid(v, Array(dup, dup, centroids(1))).as("c"))
    assert(tied.collect().forall(_.getLong(0) != 1L))
  }

  test("vector_sum/vector_avg match the posexplode formulation") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
      .withColumn("g", pmod(col("vec_id"), lit(4)))
    val want = emb
      .select(col("g"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("g"), col("dim")).agg(avg(col("x")).as("m"))
      .groupBy(col("g"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
        s => s("m")).as("c"))
    val got = emb.groupBy(col("g"))
      .agg(graft.functions.VectorAgg.vectorAvg(col("v")).as("c"))
    // element-wise tolerance: partial-agg order differs from explode order
    val joined = want.withColumnRenamed("c", "w").join(got, "g")
      .withColumn("maxdiff",
        aggregate(zip_with(col("w"), col("c"), (a, b) => abs(a - b)),
          lit(0.0), (acc, x) => greatest(acc, x)))
    val bad = joined.filter(col("maxdiff") > 1e-9).count()
    assert(bad == 0)
    // float input and sum variant sanity
    val s = Tables.embeddings(spark, sf).limit(3)
      .agg(graft.functions.VectorAgg.vectorSum(col("embedding")).as("s"),
           graft.functions.VectorAgg.vectorAvg(col("embedding")).as("m"))
      .select(aggregate(zip_with(col("s"), col("m"), (a, b) => abs(a - b * 3.0)),
        lit(0.0), (acc, x) => greatest(acc, x)))
      .head().getDouble(0)
    assert(s < 1e-9)
  }
}
