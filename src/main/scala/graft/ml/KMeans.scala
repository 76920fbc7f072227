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

  def fit(emb: DataFrame, k: Int, iters: Int,
          roundDp: Option[Int] = None): DataFrame =
    fitWithCentroids(emb, k, iters, roundDp)._1

  /** Fit returning both the assignment DataFrame and the final centroids
    * (k·dim, driver-resident) so downstream consumers (e.g. IVF routing)
    * don't recompute them.
    *
    * `roundDp` pins every REFRESHED centroid coordinate to that many
    * decimals (exact BigDecimal HALF_UP on the driver — the same rule as
    * Spark's round()): centroid means are float sums whose accumulation
    * order is engine-specific, so pinning them makes the whole iteration
    * reproducible across engines and lets the DuckDB oracle replay the
    * unrolled Lloyd iterations exactly. Initial centroids (raw input
    * vectors) are never rounded.
    *
    * Residual parity risk (accepted, documented): the rounding input is
    * still an order-dependent float mean, so on OTHER data a coordinate
    * within ~1 ulp of a 0.5e-6 boundary could round apart between engines
    * and cascade through assignments. The gate's inputs are fixed and the
    * parity is verified empirically at sf0.001/0.01/0.1; an exact-integer
    * mean is not available here because the coordinates are arbitrary
    * floats, not lattice-valued like the STL path's. */
  def fitWithCentroids(emb: DataFrame, k: Int, iters: Int,
                       roundDp: Option[Int] = None): (DataFrame, Array[Array[Double]]) = {
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
      val pin = (d: Double) => roundDp.fold(d)(dp =>
        BigDecimal(d).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble)
      rows.foreach { r =>
        updated(r.getLong(0).toInt) = r.getSeq[Double](1).toArray.map(pin)
      }
      centroids = updated
    }
    // The iteration loop (the only repeated consumer) is done: release the
    // cache so repeated fits don't accumulate executor storage. The final
    // assignment below is a single map-side pass; recomputing it from the
    // source scan costs one read and keeps the operator leak-free.
    // blocking=true so the blocks are actually gone before the next query
    // starts (non-blocking unpersists piled eviction churn onto later
    // bench queries).
    vecs.unpersist(blocking = true)
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

  /** SparkEntry glue: k=10 (the label cardinality), 3 iterations,
    * centroids pinned at 6 decimals so the oracle can replay the fit. */
  def tsKmeansEmbed(spark: SparkSession, sfDir: String): DataFrame =
    fit(Tables.embeddings(spark, sfDir), k = 10, iters = 3, roundDp = Some(6))

  /** DuckDB oracle: the three Lloyd iterations unrolled as generated CTEs —
    * assignment = deterministic argmin (ORDER BY distance, then cluster id,
    * mirroring NearestCentroid's strict-< tie rule), refresh = per-dim
    * round-6 mean with empty clusters keeping their previous centroid. */
  val tsKmeansEmbedSql: String = {
    val dims = 64
    def dist(v: String, c: String): String =
      s"list_sum(list_transform(range($dims), i -> ($v[i+1] - $c[i+1]) * ($v[i+1] - $c[i+1])))"
    def assign(a: String, cPrev: String): String =
      s"""$a AS (
         |  SELECT vec_id, v, j AS cl FROM (
         |    SELECT v.vec_id AS vec_id, v.v AS v, c.j AS j,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY ${dist("v.v", "c.c")}, c.j) AS rn
         |    FROM v, $cPrev c)
         |  WHERE rn = 1)""".stripMargin
    def refresh(cNew: String, a: String, cPrev: String): String =
      s"""${cNew}d AS (
         |  SELECT cl AS j, i, round(avg(v[i+1]), 6) AS m
         |  FROM $a, range($dims) t(i) GROUP BY cl, i),
         |$cNew AS (
         |  SELECT p.j AS j,
         |    CASE WHEN d.j IS NULL THEN p.c
         |         ELSE (SELECT list(m ORDER BY i) FROM ${cNew}d x WHERE x.j = p.j)
         |    END AS c
         |  FROM $cPrev p
         |  LEFT JOIN (SELECT DISTINCT j FROM ${cNew}d) d ON p.j = d.j)""".stripMargin
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c0 AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, v AS c
       |  FROM (SELECT vec_id, v FROM v ORDER BY vec_id LIMIT 10)),
       |${assign("a1", "c0")},
       |${refresh("c1", "a1", "c0")},
       |${assign("a2", "c1")},
       |${refresh("c2", "a2", "c1")},
       |${assign("a3", "c2")},
       |${refresh("c3", "a3", "c2")},
       |${assign("a4", "c3")}
       |SELECT vec_id, cl AS cluster FROM a4""".stripMargin
  }
}
