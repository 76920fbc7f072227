package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Autoregressive sequence generation — utils/inference.py:19
  * `generate_sequence`: seed with observed history, predict the next point,
  * append, repeat.
  *
  * The reference rolls a neural net forward one point at a time on the
  * driver. Here the "model" is a per-trajectory AR(1) fit (value on its own
  * lag, via codegen'd regr_* aggregates — one shuffle), and the rollout is
  * `steps` narrow column transformations on the per-key state frame: no
  * driver-side data movement at all, so generating for 10^9 trajectories is
  * the same plan as for 15.
  */
object AutoReg {

  /** Fit x_t = a*x_{t-1} + b per key, then emit `steps` generated points
    * continuing from each trajectory's last observed value.
    * Output: (key, step ∈ 1..steps, x_gen).
    *
    * `coefDp` (optional) rounds the fitted coefficients to that many
    * decimals before the rollout: regr_* aggregates accumulate float sums
    * in engine-specific order, so pinning the coefficients makes the whole
    * generated sequence reproducible across engines (the DuckDB oracle
    * replays the recursion exactly); 4 decimals is far below any
    * forecasting-relevant precision. */
  def generate(df: DataFrame, key: String, order: Seq[String],
               valueCol: String, steps: Int,
               coefDp: Option[Int] = None): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(order.map(col): _*)
    val lagged = df.withColumn("_prev", lag(col(valueCol), 1).over(w))
    val rnd = (c: org.apache.spark.sql.Column) =>
      coefDp.fold(c)(dp => round(c, dp))
    val model = lagged.groupBy(col(key)).agg(
      rnd(regr_slope(col(valueCol), col("_prev"))).as("a"),
      rnd(regr_intercept(col(valueCol), col("_prev"))).as("b"),
      max_by(col(valueCol), struct(order.map(col): _*)).as("x0"))
    // rollout: one sequential fold building the whole generated series as a
    // single array expression (a chained-withColumn version builds a
    // quadratic expression tree; this is linear and stays in codegen)
    val rollout = model.withColumn("xs",
      slice(aggregate(
        sequence(lit(1), lit(steps)),
        array(col("x0")),
        (acc, _) => concat(acc, array(col("a") * element_at(acc, -1) + col("b")))),
        2, steps))
    rollout
      .select(col(key), posexplode(col("xs")).as(Seq("step0", "x_gen")))
      .withColumn("step", col("step0") + 1)
      .select(key, "step", "x_gen")
  }

  /** SparkEntry glue: 10-step AR(1) rollout per user, coefficients pinned
    * at 4 decimals so the rollout arithmetic is engine-identical. */
  def tsAutoregressiveGen(spark: SparkSession, sfDir: String): DataFrame =
    generate(
      Tables.events(spark, sfDir).withColumn("ts_us", unix_micros(col("ts"))),
      "user_id", Seq("ts_us", "event_id"), "value", steps = 10,
      coefDp = Some(4))
      .withColumn("x_gen", round(col("x_gen"), 6))

  /** Recursive-CTE oracle replaying the identical rollout recursion. */
  val tsAutoregressiveGenSql: String =
    """WITH RECURSIVE lagged AS (
      |  SELECT user_id, value, epoch_us(ts) AS ts_us, event_id,
      |    lag(value, 1) OVER (PARTITION BY user_id
      |                        ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events),
      |m AS (
      |  SELECT user_id,
      |    round(regr_slope(value, prev), 4) AS a,
      |    round(regr_intercept(value, prev), 4) AS b
      |  FROM lagged GROUP BY user_id),
      |x0 AS (
      |  SELECT user_id, value AS x0 FROM (
      |    SELECT user_id, value,
      |      row_number() OVER (PARTITION BY user_id
      |                         ORDER BY ts_us DESC, event_id DESC) AS rn
      |    FROM lagged) WHERE rn = 1),
      |g AS (
      |  SELECT m.user_id AS user_id, 1 AS step, m.a * x0.x0 + m.b AS x,
      |         m.a AS a, m.b AS b
      |  FROM m JOIN x0 ON m.user_id = x0.user_id
      |  UNION ALL
      |  SELECT user_id, step + 1, a * x + b, a, b FROM g WHERE step < 10)
      |SELECT user_id, CAST(step AS INT) AS step, round(x, 6) AS x_gen
      |FROM g""".stripMargin
}
