package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorOps

/** Deterministic Lloyd's k-means over an embedding DataFrame
  * (SURVEY.md §2.5 #43) — the clustering building block the reference's
  * embedding-space analyses imply, without MLlib's RNG-dependent init.
  *
  * Init = the k lowest vec_ids (deterministic across partitionings).
  * Each iteration: broadcast the k centroids, assign map-side
  * (argmin distance — no shuffle of the corpus), recompute centroids with
  * one explode + groupBy over (cluster, dim) — shuffle volume k·dim rows,
  * independent of corpus size. Iterations are fixed (no driver-side
  * convergence loop on data values), so the job graph is static.
  */
object KMeans {

  def fit(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = emb.sparkSession
    val vecs = emb.select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
    vecs.cache()
    val wInit = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
    var centroids = vecs.orderBy("vec_id").limit(k)
      .select((row_number().over(wInit) - 1).cast("long").as("cluster"), col("v").as("c"))
      // tiny (k rows): keep as a plain DataFrame, re-derived each iteration
    var assigned: DataFrame = null
    for (_ <- 1 to iters) {
      val withBest = vecs.crossJoin(broadcast(centroids))
        .withColumn("d", VectorOps.distSq(col("v"), col("c")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("d"), col("cluster"))
      assigned = withBest
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("vec_id"), col("cluster"), col("v"))
      centroids = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cluster"), col("dim"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cluster"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          s => s("m")).as("c"))
    }
    assigned.select(col("vec_id"), col("cluster"))
  }

  /** Within-cluster sum of squared distances (for convergence checks). */
  def sse(emb: DataFrame, assignment: DataFrame): DataFrame = {
    val vecs = emb.select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
    val joined = vecs.join(assignment, "vec_id")
    val cents = joined
      .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("cluster"), col("dim")).agg(avg(col("x")).as("m"))
      .groupBy(col("cluster"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
        s => s("m")).as("c"))
    joined.join(broadcast(cents), "cluster")
      .withColumn("d", VectorOps.distSq(col("v"), col("c")))
      .agg(sum(col("d")).as("sse"))
  }

  /** SparkEntry glue: k=10 (the label cardinality), 3 iterations. */
  def tsKmeansEmbed(spark: SparkSession, sfDir: String): DataFrame =
    fit(Tables.embeddings(spark, sfDir), k = 10, iters = 3)
}
