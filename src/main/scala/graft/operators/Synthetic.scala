package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic distributed synthetic data generation.
  *
  * datasets/adding.py:21-33 builds the "adding problem": for each sample, a
  * series of T uniforms plus a two-hot mask; the label is the sum of the two
  * marked values. The reference uses np.random on one machine; here every
  * value is a pure function of (sample id, position) via a splitmix-style
  * integer finalizer, so generation is embarrassingly parallel (one narrow
  * map over `spark.range`, zero shuffle) and reproducible at any scale and
  * any partitioning — and, unlike the xxhash64 formulation it replaces,
  * exactly replayable by the DuckDB oracle.
  */
object Synthetic {

  /** splitmix64-style finalizer (mul, add-shift, mul, add-shift), with two
    * deliberate constraints that make it REPLAYABLE in an engine without
    * wrapping 64-bit arithmetic:
    *  - both multipliers are < 2^62 (xorshift64* and MMIX LCG constants),
    *    so `z * A` fits a signed 128-bit HUGEINT before `% 2^64` — a
    *    true splitmix64 multiplier (~2^63.6) would overflow it;
    *  - diffusion is `z += z >>> k` (shift-ADD), not shift-XOR: on the
    *    non-negative mod-2^64 representation the replay needs only
    *    `*`, `+`, `//` and `%`.
    * JVM semantics (wrapping Long mul/add, `>>>`) coincide with HUGEINT
    * arithmetic mod 2^64 on values kept in [0, 2^64); parity is pinned
    * bit-for-bit by the ts_adding_problem oracle. */
  def mix(a: Long): Long = {
    var z = a * 0x2545F4914F6CDD1DL + 0x9E3779B97F4A7C15L
    z += z >>> 29
    z *= 0x27BB2EE687B0B0FDL
    z += z >>> 32
    z
  }

  /** Uniform in [0,1): the mixed value's top 53 bits over 2^53. Both the
    * shift and the power-of-two division are exact in IEEE double, so both
    * engines produce the identical bit pattern. */
  private def u(a: Long): Double =
    (mix(a) >>> 11).toDouble / 9007199254740992.0

  /** The adding problem: (id, x: array<double> T, mask: array<double> T,
    * y = sum of the two masked values). Key space: sample id × stride 128
    * — positions use offsets 0..T-1, the two mask-position draws use
    * offsets 100 and 101 (hence T <= 100). */
  def addingProblem(spark: SparkSession, n: Long, t: Int): DataFrame = {
    require(t >= 2 && t <= 100,
      s"t must be in [2,100] (position-tag offsets 100/101 in a 128-stride key space), got $t")
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      val k = id * 128
      val x = Array.tabulate(t)(p => u(k + p))
      val p1 = ((mix(k + 100) >>> 11) % t).toInt
      val p2r = ((mix(k + 101) >>> 11) % (t - 1)).toInt
      // second marked position drawn from the t-1 slots != p1
      val p2 = if (p2r >= p1) p2r + 1 else p2r
      val mask = Array.tabulate(t)(p => if (p == p1 || p == p2) 1.0 else 0.0)
      (id, x, mask, x(p1) + x(p2))
    }.toDF("id", "x", "mask", "y")
  }

  /** SparkEntry glue (size scales with the sf dir's events table so the
    * bench exercises generation throughput). Driver-facing projection
    * digests the x/mask arrays to scalars so the oracle gate can sort and
    * hash the result; [[addingProblem]] keeps the array form (spec-tested).
    * x_sum is a SEQUENTIAL left fold (mirrored by the oracle's
    * `list_reduce` with an explicit 0.0 init), so the doubles agree
    * bit-for-bit and no rounding is needed. */
  def tsAddingProblem(spark: SparkSession, sfDir: String): DataFrame = {
    val n = graft.Tables.events(spark, sfDir).count()
    addingProblem(spark, n, t = 64)
      .select(col("id"), col("y"),
        aggregate(col("x"), lit(0.0), (acc, v) => acc + v).as("x_sum"),
        aggregate(col("mask"), lit(0.0), (acc, v) => acc + v).as("mask_sum"))
  }

  /** DuckDB replay of [[tsAddingProblem]]: ids 0..n-1 from a row_number
    * over `events` (range() cannot take a subquery bound), then the
    * four-round finalizer as a CTE chain over (id, j) rows — j 0..63 are
    * the series positions, j 64/65 the two mask-position draws — in
    * HUGEINT arithmetic mod 2^64. */
  val tsAddingProblemSql: String =
    """WITH ids AS (SELECT row_number() OVER () - 1 AS id FROM events),
      |ap AS (SELECT id, unnest(range(66)) AS j FROM ids),
      |a AS (SELECT id, j, (CASE WHEN j < 64 THEN id*128 + j
      |                          WHEN j = 64 THEN id*128 + 100
      |                          ELSE id*128 + 101 END)::HUGEINT AS av FROM ap),
      |z1 AS (SELECT id, j, (av * 2685821657736338717 + 11400714819323198485)
      |                     % 18446744073709551616::HUGEINT AS z FROM a),
      |z2 AS (SELECT id, j, (z + z // 536870912) % 18446744073709551616::HUGEINT AS z FROM z1),
      |z3 AS (SELECT id, j, (z * 2862933555777941757) % 18446744073709551616::HUGEINT AS z FROM z2),
      |z4 AS (SELECT id, j, (z + z // 4294967296) % 18446744073709551616::HUGEINT AS z FROM z3),
      |h AS (SELECT id, j, z // 2048 AS hv FROM z4),
      |xs AS (SELECT id, list(hv::DOUBLE / 9007199254740992.0 ORDER BY j) AS x
      |       FROM h WHERE j < 64 GROUP BY id),
      |p1t AS (SELECT id, hv % 64 AS p1 FROM h WHERE j = 64),
      |p2t AS (SELECT id, hv % 63 AS p2r FROM h WHERE j = 65),
      |pp AS (SELECT p1t.id AS id, p1,
      |         CASE WHEN p2r >= p1 THEN p2r + 1 ELSE p2r END AS p2
      |       FROM p1t JOIN p2t ON p1t.id = p2t.id)
      |SELECT xs.id AS id,
      |  x[CAST(p1 AS INT) + 1] + x[CAST(p2 AS INT) + 1] AS y,
      |  list_reduce([0.0] || x, (acc, b) -> acc + b) AS x_sum,
      |  CAST(2.0 AS DOUBLE) AS mask_sum
      |FROM xs JOIN pp ON xs.id = pp.id""".stripMargin
}
