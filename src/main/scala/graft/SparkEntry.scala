package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5Multijoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.2 relational analytics core
    "q1_agg"          -> (Relational.q1Agg _),
    "q3_join"         -> (Relational.q3Join _),
    "q5_multijoin"    -> (Relational.q5Multijoin _),
    "q_topk_per_group"-> (Relational.qTopkPerGroup _),
    "q_rollup"        -> (Relational.qRollup _),
    "q_pivot"         -> (Relational.qPivot _),
    "q_json_extract"  -> (Relational.qJsonExtract _),
    "q_tumbling_agg"  -> (Relational.qTumblingAgg _),
  )

  /** DuckDB-runnable oracle SQL per query key (same parquet tables).
    * Column aliases MUST match the Spark output exactly (driver sorts columns
    * by name before hashing).
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg"           -> Relational.q1AggSql,
    "q3_join"          -> Relational.q3JoinSql,
    "q5_multijoin"     -> Relational.q5MultijoinSql,
    "q_topk_per_group" -> Relational.qTopkPerGroupSql,
    "q_rollup"         -> Relational.qRollupSql,
    "q_pivot"          -> Relational.qPivotSql,
    "q_json_extract"   -> Relational.qJsonExtractSql,
    "q_tumbling_agg"   -> Relational.qTumblingAggSql,
  )
}
