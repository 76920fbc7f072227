package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Array-valued ("tensor") forms of the reference's windowing pipeline —
  * the (N, T, F) sample matrices of datasets/turbofan.py:63-88 expressed as
  * one row per window with an `array<double>` feature column.
  *
  * Everything stays inside Catalyst higher-order functions (collect_list
  * over a row frame, transform/aggregate) — no UDFs, no driver loops — so
  * whole-stage codegen applies and the only shuffle is the partition-by-key
  * sort, exactly one per pipeline at any scale.
  */
object Tensorize {

  /** Full TurboFan feature pipeline (turbofan.py __init__):
    * per-trajectory max-scale → sliding window (T, skip) → per-window
    * z-normalization (population std, eps→1 guard, mirroring
    * normalize_data) → capped RUL label.
    *
    * Output: (key, widx, features: array<double> length T, rul).
    */
  def windowTensorize(df: DataFrame, key: String, order: Seq[String],
                      valueCol: String, t: Int, skip: Int, rulCap: Int): DataFrame = {
    val wKey = Window.partitionBy(col(key))
    val w = Window.partitionBy(col(key)).orderBy(order.map(col): _*)
    val frame = w.rowsBetween(-(t - 1), 0)
    val scaled = df.withColumn("_v", col(valueCol) / max(col(valueCol)).over(wKey))
    val windowed = scaled
      .withColumn("rn", row_number().over(w))
      .withColumn("n_all", count(lit(1)).over(wKey))
      .withColumn("raw_win", collect_list(col("_v")).over(frame))
      .filter(col("rn") >= t && (col("rn") - t) % skip === 0)
      .withColumn("widx", ((col("rn") - t) / skip).cast("long"))
      .withColumn("rul", least(lit(rulCap), col("n_all") - col("rn")))
    // per-window z-norm: mean/population-std over the T values, std<=eps → 1
    val mean = aggregate(col("raw_win"), lit(0.0), (acc, x) => acc + x) / lit(t)
    val winNormed = windowed
      .withColumn("w_mean", mean)
      .withColumn("w_std",
        sqrt(aggregate(col("raw_win"), lit(0.0),
          (acc, x) => acc + (x - col("w_mean")) * (x - col("w_mean"))) / lit(t)))
      .withColumn("w_std_safe",
        when(col("w_std") <= lit(1e-12), lit(1.0)).otherwise(col("w_std")))
      .withColumn("features",
        transform(col("raw_win"), x => (x - col("w_mean")) / col("w_std_safe")))
    winNormed.select(col(key), col("widx"), col("features"), col("rul"))
  }

  /** Multi-feature variant of [[windowTensorize]] — the reference's
    * (N, T, F) tensors with F = several sensor/setting columns
    * (turbofan.py: 3 settings + 21 sensors). Emits row-major flattened
    * `array<double>` of length T·F plus the capped RUL label. Each feature
    * is max-scaled per trajectory then z-normed per window, mirroring
    * scale_data + normalize_data. */
  def windowTensorizeMulti(df: DataFrame, key: String, order: Seq[String],
                           valueCols: Seq[String], t: Int, skip: Int,
                           rulCap: Int): DataFrame = {
    val wKey = Window.partitionBy(col(key))
    val w = Window.partitionBy(col(key)).orderBy(order.map(col): _*)
    val frame = w.rowsBetween(-(t - 1), 0)
    val scaled = valueCols.foldLeft(df) { (d, c) =>
      d.withColumn(s"_s_$c", col(c) / max(col(c)).over(wKey))
    }
    val windowed = valueCols.foldLeft(
      scaled.withColumn("rn", row_number().over(w))
            .withColumn("n_all", count(lit(1)).over(wKey))) { (d, c) =>
      d.withColumn(s"_w_$c", collect_list(col(s"_s_$c")).over(frame))
    }
      .filter(col("rn") >= t && (col("rn") - t) % skip === 0)
      .withColumn("widx", ((col("rn") - t) / skip).cast("long"))
      .withColumn("rul", least(lit(rulCap), col("n_all") - col("rn")))
    // z-norm each feature's window, then interleave row-major (time, feature)
    val normed = valueCols.foldLeft(windowed) { (d, c) =>
      val arr = col(s"_w_$c")
      val mean = aggregate(arr, lit(0.0), (acc, x) => acc + x) / lit(t)
      d.withColumn(s"_m_$c", mean)
        .withColumn(s"_sd_$c", {
          val sd = sqrt(aggregate(arr, lit(0.0),
            (acc, x) => acc + (x - col(s"_m_$c")) * (x - col(s"_m_$c"))) / lit(t))
          when(sd <= lit(1e-12), lit(1.0)).otherwise(sd)
        })
        .withColumn(s"_z_$c", transform(arr, x => (x - col(s"_m_$c")) / col(s"_sd_$c")))
    }
    val features = flatten(transform(sequence(lit(0), lit(t - 1)),
      i => array(valueCols.map(c => element_at(col(s"_z_$c"), i + 1)): _*)))
    normed.select(col(key), col("widx"), features.as("features"), col("rul"))
  }

  /** music._change_to_seq_len: bring every trajectory to exactly `t` steps —
    * keep the last `t` points if longer, front-pad with 0.0 if shorter.
    * One shuffle (groupBy key); per-key state is one bounded array.
    */
  def padTruncate(df: DataFrame, key: String, tsOrderCol: String,
                  valueCol: String, t: Int): DataFrame =
    df.groupBy(col(key))
      .agg(sort_array(collect_list(struct(col(tsOrderCol), col(valueCol)))).as("pts"))
      .withColumn("orig_len", size(col("pts")))
      .withColumn("vals", transform(col("pts"), p => p(valueCol)))
      .withColumn("seq",
        when(col("orig_len") >= t, slice(col("vals"), -t, t))
          .otherwise(concat(
            array_repeat(lit(0.0), (lit(t) - col("orig_len")).cast("int")), col("vals"))))
      .select(col(key), col("orig_len"), col("seq"))

  /** SparkEntry glue: tensorize events (T=20, skip=5, cap=130). */
  def tsWindowTensorize(spark: SparkSession, sfDir: String): DataFrame =
    windowTensorize(
      Tables.events(spark, sfDir).withColumn("ts_us", unix_micros(col("ts"))),
      "user_id", Seq("ts_us", "event_id"), "value", t = 20, skip = 5, rulCap = 130)

  /** SparkEntry glue: pad/left-truncate each user's series to 512 steps. */
  def tsPadTruncate(spark: SparkSession, sfDir: String): DataFrame =
    padTruncate(
      Tables.events(spark, sfDir).withColumn("ts_us", unix_micros(col("ts"))),
      "user_id", "ts_us", "value", t = 512)
}
