package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math on `array<float|double>` columns, built entirely from
  * Catalyst higher-order functions (zip_with / aggregate / transform) so the
  * whole computation stays inside whole-stage codegen — no UDF boxing, no
  * driver round-trips, and it vectorizes over any DataFrame cardinality.
  *
  * All arithmetic is done in double (inputs widened exactly from float) with
  * strict left-to-right folds, which makes results engine-exact against the
  * DuckDB oracle's sequential list folds.
  */
object VectorOps {

  /** Cast an array<float> to array<double> (exact widening). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def normSq(a: Column): Column =
    aggregate(toDouble(a), lit(0.0), (acc, x) => acc + x * x)

  def norm(a: Column): Column = sqrt(normSq(a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Codegen'd single-pass cosine (CosineSimilarity expression) — same
    * left-to-right double fold as [[cosine]], bit-identical results, one
    * fused loop instead of interpreted per-element lambdas. Use this in
    * pairwise hot loops (ANN, near-dup). */
  def cosineNative(a: Column, b: Column): Column = CosineSimilarity(a, b)

  /** Squared euclidean distance (native codegen'd loop; identical strict
    * left-to-right fold as the HOF form it replaced). */
  def distSq(a: Column, b: Column): Column = DistSq(a, b)
}
