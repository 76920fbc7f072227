package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SparkEntry instantiations of TimeSeriesOps over the `events` table
  * (`user_id` = trajectory id, `ts` = time axis, `value` = sensor reading),
  * with matching DuckDB oracle SQL.
  *
  * Oracle-parity rules (see SURVEY.md §7): arithmetic on epoch-µs integers,
  * unique (ts_us, event_id) ordering, lattice-precision rounding on sums,
  * round-6 on means/ratios.
  */
object TimeSeriesQueries {

  private val OrderCols = Seq("ts_us", "event_id")
  private def ev(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir).withColumn("ts_us", unix_micros(col("ts")))

  // §2.1 #1 — per-trajectory max-scaling (turbofan.scale_data)
  def tsTrajScale(spark: SparkSession, sfDir: String): DataFrame =
    TimeSeriesOps.trajScale(ev(spark, sfDir), "user_id", "value")
      .select("user_id", "event_id", "value", "value_scaled")

  val tsTrajScaleSql: String =
    """SELECT user_id, event_id, value,
      |  value / max(value) OVER (PARTITION BY user_id) AS value_scaled
      |FROM events""".stripMargin

  // §2.1 #2 — RUL labels capped at 130 (turbofan max_rul_predictable)
  def tsRulLabel(spark: SparkSession, sfDir: String): DataFrame =
    TimeSeriesOps.rulLabel(ev(spark, sfDir), "user_id", OrderCols, cap = 130)
      .select("user_id", "event_id", "rul")

  val tsRulLabelSql: String =
    """SELECT user_id, event_id,
      |  least(130, count(*) OVER (PARTITION BY user_id)
      |             - row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)) AS rul
      |FROM events""".stripMargin

  // §2.1 #3 — per-trajectory z-score with eps-guarded std
  def tsZscoreNorm(spark: SparkSession, sfDir: String): DataFrame =
    TimeSeriesOps.zscoreNorm(ev(spark, sfDir), "user_id", "value")
      .select(col("user_id"), col("event_id"),
        // + 0.0 normalizes IEEE -0.0 → +0.0: a z-score in (-0.5e-6, 0)
        // rounds to -0.0 under DuckDB's float round but +0.0 under Spark's
        // BigDecimal round, and the driver's hash is byte-sensitive. Same
        // normalization appears in the oracle SQL.
        (round(col("value_z"), 6) + lit(0.0)).as("value_z"))

  val tsZscoreNormSql: String =
    """SELECT user_id, event_id,
      |  round((value - avg(value) OVER w) /
      |        (CASE WHEN stddev_samp(value) OVER w IS NULL
      |               OR stddev_samp(value) OVER w <= 1e-12
      |              THEN 1.0 ELSE stddev_samp(value) OVER w END), 6) + 0.0 AS value_z
      |FROM events
      |WINDOW w AS (PARTITION BY user_id)""".stripMargin

  // §2.1 #4 — sliding windows T=20 stride=5, per-window stats
  def tsSlidingWindow(spark: SparkSession, sfDir: String): DataFrame =
    TimeSeriesOps.slidingWindowStats(ev(spark, sfDir), "user_id", OrderCols,
        "value", t = 20, skip = 5)
      .select(col("user_id"), col("widx"),
        round(col("w_sum"), 2).as("w_sum"), col("w_min"), col("w_max"), col("w_n"))

  val tsSlidingWindowSql: String =
    """SELECT user_id, CAST((rn - 20) / 5 AS BIGINT) AS widx,
      |  round(w_sum, 2) AS w_sum, w_min, w_max, w_n
      |FROM (
      |  SELECT user_id,
      |    row_number() OVER w AS rn,
      |    sum(value) OVER wf AS w_sum,
      |    min(value) OVER wf AS w_min,
      |    max(value) OVER wf AS w_max,
      |    count(*) OVER wf AS w_n
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id),
      |         wf AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
      |WHERE rn >= 20 AND (rn - 20) % 5 = 0""".stripMargin

  // §2.1 #6 — lag/lead feature columns (X_prev analog)
  def tsLagFeatures(spark: SparkSession, sfDir: String): DataFrame =
    TimeSeriesOps.lagFeatures(ev(spark, sfDir), "user_id", OrderCols,
        "value", lags = Seq(1, 2, -1))
      .select("user_id", "event_id", "value", "value_lag1", "value_lag2", "value_lead1")

  val tsLagFeaturesSql: String =
    """SELECT user_id, event_id, value,
      |  lag(value, 1) OVER w AS value_lag1,
      |  lag(value, 2) OVER w AS value_lag2,
      |  lead(value, 1) OVER w AS value_lead1
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)""".stripMargin

  // §2.1 #7 — rolling aggregates over trailing 10 rows
  def tsRollingAgg(spark: SparkSession, sfDir: String): DataFrame =
    TimeSeriesOps.rollingAggs(ev(spark, sfDir), "user_id", OrderCols, "value", n = 10)
      .select(col("user_id"), col("event_id"),
        round(col("roll_mean"), 6).as("roll_mean"),
        round(col("roll_std"), 6).as("roll_std"),
        col("roll_min"), col("roll_max"))

  val tsRollingAggSql: String =
    """SELECT user_id, event_id,
      |  round(avg(value) OVER wf, 6) AS roll_mean,
      |  round(stddev_samp(value) OVER wf, 6) AS roll_std,
      |  min(value) OVER wf AS roll_min,
      |  max(value) OVER wf AS roll_max
      |FROM events
      |WINDOW wf AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |              ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)""".stripMargin

  // §2.1 #8 — hourly resampling
  def tsResample(spark: SparkSession, sfDir: String): DataFrame =
    TimeSeriesOps.resample(ev(spark, sfDir), "user_id", "ts", 3600000000L, "value")

  val tsResampleSql: String =
    """SELECT user_id,
      |  epoch_us(ts) - epoch_us(ts) % 3600000000 AS bucket_us,
      |  count(*) AS n,
      |  round(avg(value), 6) AS v_avg,
      |  min(value) AS v_min,
      |  max(value) AS v_max,
      |  round(sum(value), 2) AS v_sum
      |FROM events GROUP BY 1, 2""".stripMargin

  // §2.1 #9 — forward fill over a sparse derived signal
  def tsFfill(spark: SparkSession, sfDir: String): DataFrame = {
    val d = ev(spark, sfDir)
      .withColumn("v", when(col("event_type") === "click", col("value")))
    TimeSeriesOps.forwardFill(d, "user_id", OrderCols, "v")
      .select("user_id", "event_id", "v", "v_ffill")
  }

  val tsFfillSql: String =
    """SELECT user_id, event_id, v,
      |  last_value(v IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
      |FROM (SELECT *, CASE WHEN event_type = 'click' THEN value END AS v FROM events)""".stripMargin

  // §2.1 #10 — non-overlapping (X, y) windows, T=25, look_ahead=1
  def tsNonoverlapWindow(spark: SparkSession, sfDir: String): DataFrame =
    TimeSeriesOps.nonOverlappingWindows(ev(spark, sfDir), "user_id", OrderCols,
      "value", t = 25, lookAhead = 1)

  val tsNonoverlapWindowSql: String =
    """SELECT user_id, wid,
      |  round(sum(value), 2) AS x_sum,
      |  round(sum(y_val), 2) AS y_sum
      |FROM (
      |  SELECT user_id, value,
      |    lead(value, 1) OVER w AS y_val,
      |    CAST(floor((row_number() OVER w - 1) / 25) AS BIGINT) AS wid
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
      |GROUP BY user_id, wid
      |HAVING count(*) = 25 AND count(y_val) = 25""".stripMargin

  // §2.1 #12 — time-ordered 80/20 split
  def tsSplit(spark: SparkSession, sfDir: String): DataFrame =
    TimeSeriesOps.ratioSplit(ev(spark, sfDir), "user_id", OrderCols, 0.8)
      .select("user_id", "event_id", "fold")

  val tsSplitSql: String =
    """SELECT user_id, event_id,
      |  CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      |         <= ceil(count(*) OVER (PARTITION BY user_id) * 0.8)
      |       THEN 'train' ELSE 'test' END AS fold
      |FROM events""".stripMargin

  // §2.1 #13 — remove ~zero windows (windows of 10 with no error-signal)
  def tsRemoveZero(spark: SparkSession, sfDir: String): DataFrame = {
    val d = ev(spark, sfDir)
    val signal = when(col("event_type") === "error", col("value")).otherwise(lit(0.0))
    TimeSeriesOps.removeZeroWindows(d, "user_id", OrderCols, signal, t = 10, eps = 1e-9)
      .select(col("user_id"), col("event_id"), round(col("w_abs_sum"), 2).as("w_abs_sum"))
  }

  val tsRemoveZeroSql: String =
    """SELECT user_id, event_id, round(w_abs_sum, 2) AS w_abs_sum
      |FROM (
      |  SELECT user_id, event_id,
      |    row_number() OVER w AS rn,
      |    sum(abs(CASE WHEN event_type = 'error' THEN value ELSE 0.0 END)) OVER wf AS w_abs_sum
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id),
      |         wf AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |                ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
      |WHERE rn >= 10 AND w_abs_sum > 1e-9""".stripMargin

  // §2.1 #15 — forecast MSE evaluation
  def tsMseEval(spark: SparkSession, sfDir: String): DataFrame =
    TimeSeriesOps.mseEval(ev(spark, sfDir), "user_id", OrderCols, "value")

  val tsMseEvalSql: String =
    """SELECT user_id,
      |  round(avg((value - pred_naive) ^ 2), 4) AS mse_naive,
      |  round(avg((value - pred_roll) ^ 2), 4) AS mse_roll,
      |  count(pred_naive) AS n_eval
      |FROM (
      |  SELECT user_id, value,
      |    lag(value, 1) OVER w AS pred_naive,
      |    avg(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |                     ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS pred_roll
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
      |GROUP BY user_id""".stripMargin

  // §2.1 #16 — per-trajectory linear trend (baseline model analog).
  // x = hours since 2024-01-01 (not since epoch) to avoid catastrophic
  // cancellation in the regr_* sufficient statistics.
  def tsLinregRul(spark: SparkSession, sfDir: String): DataFrame = {
    val d = ev(spark, sfDir)
      .withColumn("ts_h", (col("ts_us") - lit(1704067200000000L)) / lit(3600000000.0))
    d.groupBy(col("user_id"))
      .agg(
        (round(regr_slope(col("value"), col("ts_h")), 6) + lit(0.0)).as("slope"),
        (round(regr_intercept(col("value"), col("ts_h")), 4) + lit(0.0)).as("intercept"),
        round(regr_r2(col("value"), col("ts_h")), 6).as("r2"),
        count(lit(1)).as("n"))
  }

  val tsLinregRulSql: String =
    """SELECT user_id,
      |  round(regr_slope(value, ts_h), 6) + 0.0 AS slope,
      |  round(regr_intercept(value, ts_h), 4) + 0.0 AS intercept,
      |  round(regr_r2(value, ts_h), 6) AS r2,
      |  count(*) AS n
      |FROM (SELECT user_id, value,
      |        (epoch_us(ts) - 1704067200000000) / 3600000000.0 AS ts_h
      |      FROM events)
      |GROUP BY user_id""".stripMargin

  // §2.1 #18 — as-of join: every event gets the most recent purchase value
  // of the same user at or before it.
  def tsAsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val d = ev(spark, sfDir)
    val purchases = d.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value").as("pv"))
    TimeSeriesOps.asofJoin(d, purchases, "user_id", "ts_us", "pv", tieCols = Seq("event_id"))
      .select("user_id", "event_id", "event_type", "value", "asof_val")
  }

  // Mirrors the implementation's contract exactly: right (purchase) rows at
  // an equal timestamp are ALL visible to a left row (standard as-of /
  // merge_asof allow_exact_matches semantics) — encoded by the same
  // union + (ts, side, event_id) ordering the Spark operator uses.
  val tsAsofJoinSql: String =
    """SELECT user_id, event_id, event_type, value, asof_val FROM (
      |  SELECT user_id, event_id, event_type, value, side,
      |    last_value(pv IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY ts_us, side, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_val
      |  FROM (
      |    SELECT user_id, event_id, event_type, value,
      |      epoch_us(ts) AS ts_us, 1 AS side, CAST(NULL AS DOUBLE) AS pv
      |    FROM events
      |    UNION ALL
      |    SELECT user_id, event_id, event_type, value,
      |      epoch_us(ts) AS ts_us, 0 AS side, value AS pv
      |    FROM events WHERE event_type = 'purchase'))
      |WHERE side = 1""".stripMargin

  // §2.1 extras — resample to a REGULAR hourly grid: unlike ts_resample
  // (which only aggregates buckets that have data), this generates every
  // bucket in each trajectory's [min, max] span — explode of a per-key
  // sequence, one left join back to the hourly aggregate, forward fill
  // across the gaps. The canonical "regularize the time axis" step before
  // windowing/tensorizing irregular data.
  def tsGapFill(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourUs = 3600000000L
    val d = ev(spark, sfDir)
      .withColumn("bucket_us", col("ts_us") - pmod(col("ts_us"), lit(hourUs)))
    val hourly = d.groupBy(col("user_id"), col("bucket_us"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("v_avg"))
    // Fill is resolved on the HOURLY level (one row per present hour),
    // then each present hour explodes map-side into its run of grid
    // cells — [bucket, next present bucket) — with the fill value already
    // attached. The previous shape exploded a (user_id, hour) grid first
    // and then joined + ran last(ignoreNulls) over it; the grid is ~10×
    // the event count here (sum of per-user spans) and unbounded at
    // sparse-series scale, so the join exchange and the window sort paid
    // O(grid) where this pays O(present hours). Output is identical:
    // `fill` at a present hour is its own v_avg when non-null, else the
    // previous non-null — exactly last(ignoreNulls) over the dense grid.
    val wRun = Window.partitionBy(col("user_id")).orderBy(col("bucket_us"))
    val runs = hourly
      .withColumn("fill", last(col("v_avg"), ignoreNulls = true)
        .over(wRun.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("next_b", lead(col("bucket_us"), 1).over(wRun))
    runs.select(col("user_id"), col("n"), col("v_avg"), col("fill"),
        col("bucket_us").as("b"),
        explode(sequence(col("bucket_us"),
          coalesce(col("next_b") - hourUs, col("bucket_us")),
          lit(hourUs))).as("bucket_us"))
      .select(col("user_id"), col("bucket_us"),
        when(col("bucket_us") === col("b"), col("n")).otherwise(0L).as("n"),
        when(col("bucket_us") === col("b"), col("v_avg")).as("v_avg"),
        col("fill").as("v_filled"))
  }

  val tsGapFillSql: String =
    """WITH d AS (
      |  SELECT user_id, value,
      |    epoch_us(ts) - epoch_us(ts) % 3600000000 AS bucket_us
      |  FROM events),
      |hourly AS (
      |  SELECT user_id, bucket_us, count(*) AS n,
      |    round(avg(value), 6) AS v_avg
      |  FROM d GROUP BY user_id, bucket_us),
      |grid AS (
      |  SELECT user_id,
      |    unnest(generate_series(min(bucket_us), max(bucket_us), 3600000000)) AS bucket_us
      |  FROM d GROUP BY user_id)
      |SELECT g.user_id AS user_id, g.bucket_us AS bucket_us,
      |  CAST(coalesce(h.n, 0) AS BIGINT) AS n, h.v_avg AS v_avg,
      |  last_value(h.v_avg IGNORE NULLS) OVER (
      |    PARTITION BY g.user_id ORDER BY g.bucket_us
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
      |FROM grid g LEFT JOIN hourly h
      |  ON g.user_id = h.user_id AND g.bucket_us = h.bucket_us""".stripMargin

  // §2.1 extras — forward as-of join: first purchase at-or-after each
  // event ("next label after the reading"). Mirror image of ts_asof_join:
  // left rows sort before right rows at an equal timestamp, first-non-null
  // over the FOLLOWING frame.
  def tsAsofForward(spark: SparkSession, sfDir: String): DataFrame = {
    val d = ev(spark, sfDir)
    val purchases = d.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value").as("pv"))
    TimeSeriesOps.asofJoinForward(d, purchases, "user_id", "ts_us", "pv",
        tieCols = Seq("event_id"))
      .select("user_id", "event_id", "event_type", "value", "asof_val")
  }

  val tsAsofForwardSql: String =
    """SELECT user_id, event_id, event_type, value, asof_val FROM (
      |  SELECT user_id, event_id, event_type, value, side,
      |    first_value(pv IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY ts_us, side, event_id
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS asof_val
      |  FROM (
      |    SELECT user_id, event_id, event_type, value,
      |      epoch_us(ts) AS ts_us, 0 AS side, CAST(NULL AS DOUBLE) AS pv
      |    FROM events
      |    UNION ALL
      |    SELECT user_id, event_id, event_type, value,
      |      epoch_us(ts) AS ts_us, 1 AS side, value AS pv
      |    FROM events WHERE event_type = 'purchase'))
      |WHERE side = 0""".stripMargin

  // §2.1 extras — EWMA (α=0.1), sequential recurrence via mapPartitions
  def tsEwma(spark: SparkSession, sfDir: String): DataFrame =
    TimeSeriesOps.ewma(ev(spark, sfDir), "user_id", OrderCols, "value", alpha = 0.1)
      .select(col("user_id"), col("event_id"), round(col("ewma"), 6).as("ewma"))

  val tsEwmaSql: String =
    """SELECT user_id, event_id,
      |  round(list_reduce(
      |    list(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    (acc, x) -> acc * 0.9 + x * 0.1), 6) AS ewma
      |FROM events""".stripMargin

  // §2.1 extras — CUSUM drift detection (target=50, slack=5; s_0 = 0)
  def tsCusum(spark: SparkSession, sfDir: String): DataFrame =
    TimeSeriesOps.cusum(ev(spark, sfDir), "user_id", OrderCols, "value",
        target = 50.0, slack = 5.0)
      .select(col("user_id"), col("event_id"), round(col("cusum"), 4).as("cusum"))

  val tsCusumSql: String =
    """SELECT user_id, event_id,
      |  round(list_reduce([0.0] ||
      |    list(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    (acc, x) -> greatest(0.0, acc + (x - 50.0 - 5.0))), 4) AS cusum
      |FROM events""".stripMargin

  // §2.1 extras — linear interpolation over a sparse derived signal
  def tsInterpolate(spark: SparkSession, sfDir: String): DataFrame = {
    val d = ev(spark, sfDir)
      .withColumn("v", when(col("event_type") === "click", col("value")))
    TimeSeriesOps.interpolate(d, "user_id", "ts_us", OrderCols, "v")
      .select("user_id", "event_id", "v", "v_interp")
  }

  val tsInterpolateSql: String =
    """SELECT user_id, event_id, v,
      |  CASE WHEN v IS NOT NULL THEN v
      |       ELSE round(pv + (nv - pv) * ((ts_us - pt) * 1.0 / (nt - pt)), 6) END AS v_interp
      |FROM (
      |  SELECT user_id, event_id, v, ts_us,
      |    last_value(v IGNORE NULLS) OVER wp AS pv,
      |    last_value(CASE WHEN v IS NOT NULL THEN ts_us END IGNORE NULLS) OVER wp AS pt,
      |    first_value(v IGNORE NULLS) OVER wf AS nv,
      |    first_value(CASE WHEN v IS NOT NULL THEN ts_us END IGNORE NULLS) OVER wf AS nt
      |  FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |          CASE WHEN event_type = 'click' THEN value END AS v FROM events)
      |  WINDOW wp AS (PARTITION BY user_id ORDER BY ts_us, event_id
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |         wf AS (PARTITION BY user_id ORDER BY ts_us, event_id
      |                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))""".stripMargin

  // §2.1 extras — z-score outliers (|z| > 2), anomaly detection
  def tsOutliers(spark: SparkSession, sfDir: String): DataFrame =
    TimeSeriesOps.outliers(ev(spark, sfDir), "user_id", "value", threshold = 2.0)
      .select("user_id", "event_id", "value", "z")

  val tsOutliersSql: String =
    """SELECT user_id, event_id, value, z FROM (
      |  SELECT user_id, event_id, value,
      |    round((value - avg(value) OVER w) /
      |          (CASE WHEN stddev_samp(value) OVER w IS NULL
      |                 OR stddev_samp(value) OVER w <= 1e-12
      |                THEN 1.0 ELSE stddev_samp(value) OVER w END), 6) AS z
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id))
      |WHERE abs(z) > 2.0""".stripMargin

  // §2.1 extras — first difference / percent change
  def tsDiff(spark: SparkSession, sfDir: String): DataFrame =
    TimeSeriesOps.diff(ev(spark, sfDir), "user_id", OrderCols, "value")
      .select("user_id", "event_id", "value", "diff", "pct_change")

  val tsDiffSql: String =
    """SELECT user_id, event_id, value,
      |  value - lag(value, 1) OVER w AS diff,
      |  (value - lag(value, 1) OVER w) / nullif(lag(value, 1) OVER w, 0.0) AS pct_change
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)""".stripMargin

  // §2.1 extras — deterministic per-key downsampling: keep the k events
  // with the smallest md5-derived int64 priority (see
  // graft.functions.Deterministic.md5Priority for the construction and its
  // engine-portability rationale).
  def tsSample(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pri = graft.functions.Deterministic.md5Priority(col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(pri, col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select("user_id", "rk", "event_id", "value")
  }

  val tsSampleSql: String =
    """SELECT user_id, rk, event_id, value FROM (
      |  SELECT user_id, event_id, value,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT,
      |                                event_id) AS rk
      |  FROM events) WHERE rk <= 5""".stripMargin

  // §2.1 extras — seasonality profile: hour-of-day averages per event type
  def tsSeasonal(spark: SparkSession, sfDir: String): DataFrame =
    ev(spark, sfDir)
      .groupBy(col("event_type"), hour(col("ts")).as("hod"))
      .agg(round(avg(col("value")), 6).as("v_avg"), count(lit(1)).as("n"))

  val tsSeasonalSql: String =
    """SELECT event_type, CAST(date_part('hour', ts) AS INT) AS hod,
      |  round(avg(value), 6) AS v_avg, count(*) AS n
      |FROM events GROUP BY 1, 2""".stripMargin

  // §2.1 extras — lag-1 autocorrelation per trajectory
  def tsAutocorr(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    ev(spark, sfDir)
      .withColumn("prev", lag(col("value"), 1).over(w))
      .groupBy(col("user_id"))
      .agg((round(corr(col("value"), col("prev")), 6) + lit(0.0)).as("acf1"),
           count(col("prev")).as("n_pairs"))
  }

  val tsAutocorrSql: String =
    """SELECT user_id, round(corr(value, prev), 6) + 0.0 AS acf1,
      |  count(prev) AS n_pairs
      |FROM (
      |  SELECT user_id, value,
      |    lag(value, 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events)
      |GROUP BY user_id""".stripMargin

  // §2.1 #19 — 30-minute-gap sessionization
  def tsSessionize(spark: SparkSession, sfDir: String): DataFrame =
    TimeSeriesOps.sessionize(Tables.events(spark, sfDir), "user_id", "ts", 1800000000L)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ts_us")).as("sess_start_us"),
           max(col("ts_us")).as("sess_end_us"),
           round(sum(col("value")), 2).as("v_sum"))

  val tsSessionizeSql: String =
    """SELECT user_id, session_idx, count(*) AS n_events,
      |  min(ts_us) AS sess_start_us, max(ts_us) AS sess_end_us,
      |  round(sum(value), 2) AS v_sum
      |FROM (
      |  SELECT user_id, value, ts_us,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
      |  FROM (
      |    SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
      |      CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1) OVER w > 1800000000
      |             OR lag(epoch_us(ts), 1) OVER w IS NULL
      |           THEN 1 ELSE 0 END AS new_sess
      |    FROM events
      |    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)))
      |GROUP BY user_id, session_idx""".stripMargin

  // §2.1 extras — Holt double-exponential smoothing. α/β must NOT be
  // powers of two: with 2-dp inputs, dyadic coefficients make every state
  // a terminating decimal that lands EXACTLY on rounding half-way points,
  // where the engines' 1-ulp fold differences flip HALF_UP. The oracle
  // writes (1.0 - 0.3) rather than 0.7 because the IEEE subtraction the
  // operator performs differs from the 0.7 literal by one ulp; with both
  // engines computing the same subtraction the folds are bit-identical.
  def tsHolt(spark: SparkSession, sfDir: String): DataFrame =
    TimeSeriesOps.holt(ev(spark, sfDir), "user_id", OrderCols, "value",
        alpha = 0.3, beta = 0.2)
      .select(col("user_id"), col("event_id"),
        round(col("level"), 6).as("level"),
        // trend is a smoothed difference and can land in (-0.5e-6, 0);
        // + 0.0 folds the resulting -0.0 to +0.0 on both engines
        (round(col("trend"), 6) + lit(0.0)).as("trend"),
        round(col("level") + col("trend"), 6).as("forecast"))

  val tsHoltSql: String =
    """SELECT user_id, event_id,
      |  round(st[1], 6) AS level, round(st[2], 6) + 0.0 AS trend,
      |  round(st[1] + st[2], 6) AS forecast
      |FROM (
      |  SELECT user_id, event_id,
      |    list_reduce(
      |      list_transform(
      |        list(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |        x -> [x, 0.0]),
      |      (acc, e) -> [
      |        0.3 * e[1] + (1.0 - 0.3) * (acc[1] + acc[2]),
      |        0.2 * ((0.3 * e[1] + (1.0 - 0.3) * (acc[1] + acc[2])) - acc[1]) + (1.0 - 0.2) * acc[2]
      |      ]) AS st
      |  FROM events)""".stripMargin

  // §2.1 extras — robust (median/MAD) per-trajectory outliers: immune to
  // the outliers' own influence, unlike the z-score variant. Both the
  // median and the MAD are window aggregates over the SAME user partition
  // (chained selects), so all of it runs on one shuffle.
  def tsMadOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
    ev(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("med", expr("percentile(value, 0.5)").over(w))
      .withColumn("mad", expr("percentile(abs(value - med), 0.5)").over(w))
      .withColumn("robust_z",
        round(abs(col("value") - col("med")) /
          (lit(1.4826) * greatest(col("mad"), lit(1e-9))), 6))
      .filter(col("robust_z") > 3.5)
      .select("user_id", "event_id", "value", "robust_z")
  }

  val tsMadOutliersSql: String =
    """SELECT user_id, event_id, value, robust_z FROM (
      |  SELECT user_id, event_id, value,
      |    round(abs(value - med) / (1.4826 * greatest(mad, 1e-9)), 6) AS robust_z
      |  FROM (
      |    SELECT user_id, event_id, value, med,
      |      quantile_cont(abs(value - med), 0.5) OVER (PARTITION BY user_id) AS mad
      |    FROM (
      |      SELECT user_id, event_id, value,
      |        quantile_cont(value, 0.5) OVER (PARTITION BY user_id) AS med
      |      FROM events)))
      |WHERE robust_z > 3.5""".stripMargin

  // §2.1 extras — calendar feature extraction for ML (pure integer
  // arithmetic on epoch-µs: engine-portable, no timezone/calendar
  // dependence; dow 0 = Monday).
  def tsCalendarFeatures(spark: SparkSession, sfDir: String): DataFrame =
    ev(spark, sfDir)
      .select(col("event_id"), col("ts_us"))
      .withColumn("day_idx", expr("ts_us div 86400000000"))
      .withColumn("dow", pmod(col("day_idx") + 3, lit(7)))
      .withColumn("hour", pmod(expr("ts_us div 3600000000"), lit(24)))
      .withColumn("is_weekend", (col("dow") >= 5).cast("int"))

  val tsCalendarFeaturesSql: String =
    """SELECT event_id, epoch_us(ts) AS ts_us,
      |  epoch_us(ts) // 86400000000 AS day_idx,
      |  (epoch_us(ts) // 86400000000 + 3) % 7 AS dow,
      |  (epoch_us(ts) // 3600000000) % 24 AS hour,
      |  CAST((epoch_us(ts) // 86400000000 + 3) % 7 >= 5 AS INT) AS is_weekend
      |FROM events""".stripMargin

  // §2.1 extras — winsorization: per-trajectory robust clipping at the
  // interpolated p05/p95 (the outlier-limiting twin of ts_zscore_norm's
  // standardization). Quantiles come from a window over the trajectory
  // partition — one scan and one shuffle of (key, id, value). An
  // agg-plus-join-back formulation would NOT be cheaper: exact percentile
  // state is the full value list (non-algebraic), so its "partial
  // aggregate" ships every value through the shuffle anyway AND scans the
  // table a second time for the probe side (same shape as ts_mad_outliers).
  def tsWinsorize(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
    ev(spark, sfDir)
      .withColumn("p05", expr("percentile(value, 0.05)").over(w))
      .withColumn("p95", expr("percentile(value, 0.95)").over(w))
      .select(col("user_id"), col("event_id"), col("value"),
        round(least(greatest(col("value"), col("p05")), col("p95")), 6)
          .as("v_wins"),
        (col("value") < col("p05") || col("value") > col("p95")).cast("int")
          .as("clipped"))
  }

  val tsWinsorizeSql: String =
    """SELECT user_id, event_id, value,
      |  round(least(greatest(value, p05), p95), 6) AS v_wins,
      |  CAST(value < p05 OR value > p95 AS INT) AS clipped
      |FROM (
      |  SELECT user_id, event_id, value,
      |    quantile_cont(value, 0.05) OVER w AS p05,
      |    quantile_cont(value, 0.95) OVER w AS p95
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id))""".stripMargin

  // §2.1 extras — cyclical (Fourier) time encodings: sin/cos of the
  // hour-of-day and day-of-week angles, the standard continuous embedding
  // of periodic time for ML models (complements ts_calendar_features'
  // integer features). Map-side only. Both engines compute the angle with
  // the SAME expression tree (2π·unit/period from epoch-µs integers) so
  // the doubles entering sin/cos are bit-identical; round-6 absorbs libm
  // ulp differences.
  def tsFourierFeatures(spark: SparkSession, sfDir: String): DataFrame =
    ev(spark, sfDir)
      .select(col("event_id"), col("ts_us"))
      .withColumn("hod_angle",
        lit(2.0) * lit(math.Pi) * pmod(col("ts_us"), lit(86400000000L)) / lit(86400000000.0))
      .withColumn("dow_angle",
        lit(2.0) * lit(math.Pi) * pmod(col("ts_us"), lit(604800000000L)) / lit(604800000000.0))
      .select(col("event_id"), col("ts_us"),
        // sin/cos evaluated near multiples of π/2 produce magnitudes
        // ~1e-10 of either sign; + 0.0 normalizes the -0.0 round output
        (round(sin(col("hod_angle")), 6) + lit(0.0)).as("hod_sin"),
        (round(cos(col("hod_angle")), 6) + lit(0.0)).as("hod_cos"),
        (round(sin(col("dow_angle")), 6) + lit(0.0)).as("dow_sin"),
        (round(cos(col("dow_angle")), 6) + lit(0.0)).as("dow_cos"))

  val tsFourierFeaturesSql: String =
    """SELECT event_id, ts_us,
      |  round(sin(hod_angle), 6) + 0.0 AS hod_sin,
      |  round(cos(hod_angle), 6) + 0.0 AS hod_cos,
      |  round(sin(dow_angle), 6) + 0.0 AS dow_sin,
      |  round(cos(dow_angle), 6) + 0.0 AS dow_cos
      |FROM (
      |  SELECT event_id, epoch_us(ts) AS ts_us,
      |    2.0 * pi() * (((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000)
      |      / 86400000000.0 AS hod_angle,
      |    2.0 * pi() * (((epoch_us(ts) % 604800000000) + 604800000000) % 604800000000)
      |      / 604800000000.0 AS dow_angle
      |  FROM events)""".stripMargin

  // §2.1 extras — seasonal-trend decomposition (additive, STL-style
  // moving-average flavor) on the hourly-bucketed series: trend = mean of
  // all raw points within ±12 h of REAL time (RANGE frame on the epoch-µs
  // bucket), seasonal = per (trajectory, hour-of-day) mean
  // of the detrended series, residual = the rest. Two shuffles total: the
  // hourly aggregate keyed on (user, bucket), then every window/group step
  // shares the user_id partitioning; the seasonal profile joins back
  // broadcast (≤ 24 rows per trajectory).
  def tsStlDecompose(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourUs = 3600000000L
    // Every cross-row sum runs on exact integers (2-dp inputs → centi-unit
    // BIGINTs; detrended values → micro-unit BIGINTs after an identical
    // double is computed in both engines): windowed/grouped float sums
    // accumulate in engine-specific order (Spark slides, DuckDB
    // segment-trees), and that 1-ulp drift flips round-6 at half-way
    // points. Integer sums are exact and order-free, and every double here
    // derives from them through the same expression tree — bit-identical
    // by construction. Trend = event-weighted mean of all raw points in
    // the ±12 h window.
    val hourly = ev(spark, sfDir)
      .withColumn("bucket_us", col("ts_us") - pmod(col("ts_us"), lit(hourUs)))
      .groupBy(col("user_id"), col("bucket_us"))
      .agg(sum(round(col("value") * 100).cast("long")).as("sv"),
           count(lit(1)).as("n"))
    // a RANGE frame on the epoch-µs bucket key: ±12 h of REAL time, not
    // ±12 observed rows — the hourly series has gaps, and a row frame
    // would silently widen the smoother to days on sparse trajectories
    val wTrend = Window.partitionBy(col("user_id")).orderBy(col("bucket_us"))
      .rangeBetween(-12L * hourUs, 12L * hourUs)
    val detrended = hourly
      .withColumn("v", col("sv").cast("double") / (lit(100.0) * col("n")))
      .withColumn("trend",
        sum(col("sv")).over(wTrend).cast("double") /
          (lit(100.0) * sum(col("n")).over(wTrend)))
      .withColumn("detr", col("v") - col("trend"))
      .withColumn("hod", pmod(expr("bucket_us div 3600000000"), lit(24)))
      // BINARY scale (2^20), not 10^6: a decimal scale lands seasonal (and
      // detr - seasonal) exactly on round-6 half-way points, where Spark's
      // exact BigDecimal rounding and DuckDB's float-multiply rounding
      // disagree; dyadic lattice values can never sit on a decimal
      // half-way boundary (that would need a 5^6 denominator factor)
      .withColumn("di", round(col("detr") * lit(1048576)).cast("long"))
    // seasonal as a window over (user, hod) — NOT a groupBy + join back:
    // the join form evaluates the whole scan→agg→window pipeline twice
    // (Catalyst does not reuse the common subplan across join branches),
    // which is a double scan of the raw table at scale. The window costs
    // one extra shuffle of the (already hourly-sized) frame instead.
    val wSeason = Window.partitionBy(col("user_id"), col("hod"))
    detrended
      .withColumn("seasonal",
        sum(col("di")).over(wSeason).cast("double") /
          (lit(1048576.0) * count(lit(1)).over(wSeason)))
      .select(col("user_id"), col("bucket_us"),
        round(col("v"), 6).as("v"),
        round(col("trend"), 6).as("trend"),
        // seasonal and resid are detrended quantities that can land in
        // (-0.5e-6, 0): Spark's BigDecimal round yields +0.0 there while
        // DuckDB's float round yields -0.0, and the driver's hash is
        // byte-sensitive (r3's only oracle failure, 302/9567 rows).
        // IEEE `-0.0 + 0.0 = +0.0` normalizes both engines.
        (round(col("seasonal"), 6) + lit(0.0)).as("seasonal"),
        (round(col("detr") - col("seasonal"), 6) + lit(0.0)).as("resid"))
  }

  val tsStlDecomposeSql: String =
    """WITH hourly AS (
      |  SELECT user_id,
      |    epoch_us(ts)
      |      - ((epoch_us(ts) % 3600000000) + 3600000000) % 3600000000 AS bucket_us,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |det AS (
      |  SELECT user_id, bucket_us,
      |    CAST(sv AS DOUBLE) / (100.0 * n) AS v,
      |    CAST(sum(sv) OVER w AS DOUBLE) / (100.0 * sum(n) OVER w) AS trend,
      |    CAST(sv AS DOUBLE) / (100.0 * n)
      |      - CAST(sum(sv) OVER w AS DOUBLE) / (100.0 * sum(n) OVER w) AS detr,
      |    (((bucket_us // 3600000000) % 24) + 24) % 24 AS hod
      |  FROM hourly
      |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket_us
      |               RANGE BETWEEN 43200000000 PRECEDING
      |                     AND 43200000000 FOLLOWING)),
      |seas AS (
      |  SELECT user_id, bucket_us, v, trend, detr,
      |    CAST(sum(CAST(round(detr * 1048576) AS BIGINT)) OVER ws AS DOUBLE)
      |      / (1048576.0 * count(*) OVER ws) AS seasonal
      |  FROM det
      |  WINDOW ws AS (PARTITION BY user_id, hod))
      |SELECT user_id, bucket_us,
      |  round(v, 6) AS v,
      |  round(trend, 6) AS trend,
      |  round(seasonal, 6) + 0.0 AS seasonal,
      |  round(detr - seasonal, 6) + 0.0 AS resid
      |FROM seas""".stripMargin
}
