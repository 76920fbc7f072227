package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic distributed synthetic data generation.
  *
  * datasets/adding.py builds the "adding problem": for each sample, a series
  * of T uniforms plus a two-hot mask; the label is the sum of the two marked
  * values. The reference uses np.random on one machine; here every value is
  * a pure function of (sample id, position) via xxhash64, so generation is
  * embarrassingly parallel (spark.range → narrow ops, zero shuffle) and
  * reproducible at any scale and any partitioning.
  */
object Synthetic {

  private val M = 1000000007L

  /** Uniform in [0,1) derived from hashed (id, tag, pos). */
  private def u(tag: String, pos: org.apache.spark.sql.Column) =
    pmod(xxhash64(col("id"), lit(tag), pos), lit(M)).cast("double") / lit(M.toDouble)

  /** The adding problem: (id, x: array<double> T, mask: array<double> T,
    * y = sum of the two masked values). */
  def addingProblem(spark: SparkSession, n: Long, t: Int): DataFrame = {
    val positions = sequence(lit(0), lit(t - 1))
    val p1 = pmod(xxhash64(col("id"), lit("p1")), lit(t.toLong))
    val p2r = pmod(xxhash64(col("id"), lit("p2")), lit(t.toLong - 1))
    spark.range(n)
      .withColumn("x", transform(positions, p => u("x", p)))
      .withColumn("p1", p1)
      .withColumn("p2", when(p2r >= p1, p2r + 1).otherwise(p2r))
      .withColumn("mask", transform(positions,
        p => when(p === col("p1") || p === col("p2"), 1.0).otherwise(0.0)))
      .withColumn("y", element_at(col("x"), (col("p1") + 1).cast("int")) +
                       element_at(col("x"), (col("p2") + 1).cast("int")))
      .select("id", "x", "mask", "y")
  }

  /** SparkEntry glue (size scales with the sf dir's events table so the
    * bench exercises generation throughput). Driver-facing projection
    * digests the x/mask arrays to scalars so the oracle gate can sort and
    * hash the result; [[addingProblem]] keeps the array form (spec-tested). */
  def tsAddingProblem(spark: SparkSession, sfDir: String): DataFrame = {
    val n = graft.Tables.events(spark, sfDir).count()
    addingProblem(spark, n, t = 64)
      .select(col("id"), col("y"),
        round(aggregate(col("x"), lit(0.0), (acc, v) => acc + v), 6).as("x_sum"),
        aggregate(col("mask"), lit(0.0), (acc, v) => acc + v).as("mask_sum"))
  }
}
