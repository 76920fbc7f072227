package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot-key aggregations.
  *
  * At 100 TB a handful of keys (one mega-user, one dominant event type)
  * can hold an entire aggregation stage hostage: every row of the hot key
  * lands on one reducer. Salting splits each key into `salts` sub-keys for
  * a partial aggregate, then merges the partials — two small shuffles
  * instead of one skewed one. AQE's skew-join handling covers joins; this
  * covers aggregations, where AQE does not re-split.
  */
object Skew {

  /** Two-stage salted aggregation: sum/count/min/max style merges only
    * (algebraic aggregates that compose associatively).
    *
    * `aggs` maps output column name -> (partial agg of the value column,
    * merge agg of the partial column). See [[saltedSum]] for the common
    * case.
    */
  def saltedAgg(df: DataFrame, key: String, salts: Int,
                aggs: Seq[(String, Column => Column, Column => Column)],
                valueCol: String): DataFrame = {
    val salted = df.withColumn("_salt", pmod(xxhash64(spark_partition_id(),
      monotonically_increasing_id()), lit(salts.toLong)))
    val partial = salted.groupBy(col(key), col("_salt"))
      .agg(aggs.head._2(col(valueCol)).as(s"_p_${aggs.head._1}"),
           aggs.tail.map(a => a._2(col(valueCol)).as(s"_p_${a._1}")): _*)
    partial.groupBy(col(key))
      .agg(aggs.head._3(col(s"_p_${aggs.head._1}")).as(aggs.head._1),
           aggs.tail.map(a => a._3(col(s"_p_${a._1}")).as(a._1)): _*)
  }

  /** Salted sum+count (the building blocks of any mean at scale). */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     salts: Int = 16): DataFrame =
    saltedAgg(df, key, salts, Seq(
      ("v_sum", (c: Column) => sum(c), (c: Column) => sum(c)),
      ("v_n", (c: Column) => count(c), (c: Column) => sum(c))), valueCol)
}
