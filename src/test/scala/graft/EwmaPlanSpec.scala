package graft

import org.apache.spark.sql.functions._
import graft.operators.TimeSeriesOps
import graft.plans.Ewma

class EwmaPlanSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  test("native EWMA operator matches the mapPartitions formulation") {
    val df = Tables.events(spark, sf)
      .withColumn("ts_us", unix_micros(col("ts")))
      .select("user_id", "ts_us", "event_id", "value")
    val native = Ewma(df, "user_id", Seq("ts_us", "event_id"), "value", alpha = 0.1)
      .select("event_id", "ewma").as[(Long, Double)].collect().toMap
    val reference = TimeSeriesOps.ewma(df, "user_id", Seq("ts_us", "event_id"),
        "value", alpha = 0.1)
      .select("event_id", "ewma").as[(Long, Double)].collect().toMap
    assert(native.size == reference.size)
    reference.foreach { case (id, v) => assert(native(id) == v, s"event $id") }
  }

  test("native EWMA declares requirements: planner inserts exactly one shuffle") {
    val df = Tables.events(spark, sf)
      .withColumn("ts_us", unix_micros(col("ts")))
      .select("user_id", "ts_us", "event_id", "value")
    val plan = Ewma(df, "user_id", Seq("ts_us", "event_id"), "value", 0.1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Ewma "), plan)
    assert("Exchange".r.findAllIn(plan).length == 1,
      s"expected exactly one exchange:\n$plan")
    // chained after a per-key shuffle-producing op on the same key, the
    // second EWMA must NOT add another exchange
    val once = Ewma(df, "user_id", Seq("ts_us", "event_id"), "value", 0.1)
    val twice = Ewma(once.withColumnRenamed("ewma", "e1"),
      "user_id", Seq("ts_us", "event_id"), "value", 0.05)
    val plan2 = twice.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan2).length == 1,
      s"chained EWMA should reuse partitioning:\n$plan2")
  }
}
