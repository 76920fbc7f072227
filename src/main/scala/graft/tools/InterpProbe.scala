package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only probe for the ts_interpolate parity investigation. */
object InterpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = graft.Tables.events(spark, "/root/testdata/sf0.01")
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("v", when(col("event_type") === "click", col("value")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val past = w.rowsBetween(Window.unboundedPreceding, 0)
    val future = w.rowsBetween(1, Window.unboundedFollowing)
    val obsTs = when(col("v").isNotNull, col("ts_us"))
    val out = d
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(past))
      .withColumn("pt", last(obsTs, ignoreNulls = true).over(past))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(future))
      .withColumn("nt", first(obsTs, ignoreNulls = true).over(future))
      .withColumn("raw", col("pv") + (col("nv") - col("pv")) *
        (col("ts_us") - col("pt")).cast("double") / (col("nt") - col("pt")).cast("double"))
      .filter(col("user_id") === 145 && col("event_id") === 5226)
      .select("pv", "pt", "nv", "nt", "ts_us", "raw")
    out.collect().foreach { r =>
      println(f"[probe] pv=${r.getDouble(0)}%.17g pt=${r.getLong(1)} nv=${r.getDouble(2)}%.17g nt=${r.getLong(3)} ts=${r.getLong(4)} raw=${r.getDouble(5)}%.20f round=${math.rint(r.getDouble(5) * 1e6) / 1e6}")
    }
    spark.stop()
  }
}
