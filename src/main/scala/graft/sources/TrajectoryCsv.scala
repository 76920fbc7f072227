package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TurboFan-format trajectory file reader — datasets/turbofan.py:176
  * `load_data_from_file` re-expressed as a Spark source.
  *
  * Format: space-separated, no header, columns =
  * (trajectory_id, t, setting_1..nSettings, sensor_1..nSensors), files often
  * carry trailing separators that parse as extra all-null columns — those
  * are dropped (pandas `dropna(axis='columns', how='all')` analog).
  * The reference then groups rows into per-trajectory matrices; downstream
  * graft operators consume the long format directly (keyed on
  * trajectory_id, ordered by t), which is the scalable representation.
  */
object TrajectoryCsv {

  def read(spark: SparkSession, path: String,
           nSettings: Int = 3, nSensors: Int = 21): DataFrame = {
    val raw = spark.read
      .option("sep", " ")
      .option("header", "false")
      .option("inferSchema", "true")
      .csv(path)
    // drop trailing all-null columns created by trailing separators
    val nonNullCounts = raw.select(raw.columns.map(c =>
      count(col(c)).as(c)).toSeq: _*).head()
    val keep = raw.columns.zipWithIndex.filter { case (c, i) =>
      nonNullCounts.getLong(i) > 0
    }.map(_._1)
    val trimmed = raw.select(keep.map(col).toSeq: _*)
    val expected = 2 + nSettings + nSensors
    require(trimmed.columns.length == expected,
      s"expected $expected non-empty columns, got ${trimmed.columns.length}")
    val names = Seq("trajectory_id", "t") ++
      (1 to nSettings).map(i => s"setting_$i") ++
      (1 to nSensors).map(i => s"sensor_$i")
    trimmed.toDF(names: _*)
  }
}
