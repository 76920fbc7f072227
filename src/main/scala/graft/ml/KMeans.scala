package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorOps

/** Deterministic Lloyd's k-means over an embedding DataFrame
  * (SURVEY.md §2.5 #43) — the clustering building block the reference's
  * embedding-space analyses imply, without MLlib's RNG-dependent init.
  *
  * Scale design (the classic distributed-k-means shape): the model is
  * k·dim doubles — driver-resident between iterations, embedded as
  * literals into each assignment pass. Per iteration: one map-side scan of
  * the (cached) corpus computing argmin distance against the literal
  * centroids, then a partial-aggregated groupBy(cluster) producing k·dim
  * numbers back to the driver. No iterative lineage growth, no corpus
  * shuffle; cost per iteration is one scan + one k-row aggregate at any
  * corpus size.
  *
  * Init = the k lowest vec_ids (deterministic across partitionings).
  */
object KMeans {

  /** Nearest-centroid id for a vector column — pure map-side argmin against
    * driver-resident centroids (no join, no shuffle). Consumers holding the
    * centroids (e.g. IVF cell routing) should use this instead of joining
    * back to the fit's assignment DataFrame. Native expression: the centroid
    * matrix rides in the codegen references array, so the generated code is
    * identical across iterations/fits (one Janino compile) and its size is
    * independent of k. */
  def assign(vecCol: Column, centroids: Array[Array[Double]]): Column =
    graft.functions.NearestCentroid(vecCol, centroids)

  private def assignCol(centroids: Array[Array[Double]]): Column =
    assign(col("v"), centroids).as("cluster")

  def fit(emb: DataFrame, k: Int, iters: Int): DataFrame =
    fitWithCentroids(emb, k, iters)._1

  /** Fit returning both the assignment DataFrame and the final centroids
    * (k·dim, driver-resident) so downstream consumers (e.g. IVF routing)
    * don't recompute them. */
  def fitWithCentroids(emb: DataFrame, k: Int,
                       iters: Int): (DataFrame, Array[Array[Double]]) = {
    val vecs = emb.select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
      .cache()
    var centroids: Array[Array[Double]] = vecs.orderBy("vec_id").limit(k)
      .select("v").collect()
      .map(_.getSeq[Double](0).toArray)
    // Centroid refresh = one groupBy with the native vector_avg aggregate —
    // the posexplode formulation inflated the corpus ×dim through the
    // shuffle; this one shuffles only k·(dim+1) partial-agg doubles per map
    // partition, at any corpus size.
    for (_ <- 1 to iters) {
      val rows = vecs.select(assignCol(centroids), col("v"))
        .groupBy(col("cluster"))
        .agg(graft.functions.VectorAgg.vectorAvg(col("v")).as("m"))
        .collect()
      // empty clusters keep their previous centroid
      val updated = centroids.clone()
      rows.foreach { r =>
        updated(r.getLong(0).toInt) = r.getSeq[Double](1).toArray
      }
      centroids = updated
    }
    // The iteration loop (the only repeated consumer) is done: release the
    // cache so repeated fits don't accumulate executor storage. The final
    // assignment below is a single map-side pass; recomputing it from the
    // source scan costs one read and keeps the operator leak-free.
    vecs.unpersist(blocking = false)
    (vecs.select(col("vec_id"), assignCol(centroids)), centroids)
  }

  /** Within-cluster sum of squared distances (for convergence checks). */
  def sse(emb: DataFrame, assignment: DataFrame): DataFrame = {
    val vecs = emb.select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
    val joined = vecs.join(assignment, "vec_id")
    val cents = joined
      .groupBy(col("cluster"))
      .agg(graft.functions.VectorAgg.vectorAvg(col("v")).as("c"))
    joined.join(broadcast(cents), "cluster")
      .withColumn("d", VectorOps.distSq(col("v"), col("c")))
      .agg(sum(col("d")).as("sse"))
  }

  /** SparkEntry glue: k=10 (the label cardinality), 3 iterations. */
  def tsKmeansEmbed(spark: SparkSession, sfDir: String): DataFrame =
    fit(Tables.embeddings(spark, sfDir), k = 10, iters = 3)
}
