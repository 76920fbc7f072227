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
    * Output: (key, step ∈ 1..steps, x_gen). */
  def generate(df: DataFrame, key: String, order: Seq[String],
               valueCol: String, steps: Int): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(order.map(col): _*)
    val lagged = df.withColumn("_prev", lag(col(valueCol), 1).over(w))
    val model = lagged.groupBy(col(key)).agg(
      regr_slope(col(valueCol), col("_prev")).as("a"),
      regr_intercept(col(valueCol), col("_prev")).as("b"),
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

  /** SparkEntry glue: 10-step AR(1) rollout per user. */
  def tsAutoregressiveGen(spark: SparkSession, sfDir: String): DataFrame =
    generate(
      Tables.events(spark, sfDir).withColumn("ts_us", unix_micros(col("ts"))),
      "user_id", Seq("ts_us", "event_id"), "value", steps = 10)
}
