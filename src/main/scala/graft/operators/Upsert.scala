package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SCD-type-1 upsert (MERGE): source rows replace matching target rows by
  * key; unmatched source rows are inserted; unmatched target rows are kept.
  *
  * Shape: one full-outer join on the key (shuffle both sides once) +
  * column-wise coalesce — the lakehouse MERGE primitive expressed on plain
  * DataFrames. At 100 TB the join keys both sides by the merge key; with
  * bucketed targets (sources.Bucketing) the target side never re-shuffles.
  */
object Upsert {

  def scd1(target: DataFrame, source: DataFrame, key: String): DataFrame = {
    val cols = target.columns
    require(source.columns.sameElements(cols), "schemas must match")
    val t = cols.filter(_ != key).foldLeft(target) { (d, c) =>
      d.withColumnRenamed(c, s"_t_$c")
    }
    val s = cols.filter(_ != key).foldLeft(source) { (d, c) =>
      d.withColumnRenamed(c, s"_s_$c")
    }
    t.join(s, Seq(key), "full_outer")
      .select(col(key) +: cols.filter(_ != key).map(c =>
        coalesce(col(s"_s_$c"), col(s"_t_$c")).as(c)): _*)
  }

  /** SparkEntry glue: customers upserted with a derived update set (every
    * 10th customer gets a refreshed acctbal; two synthetic inserts). */
  def qUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    // round at the LATTICE precision: 2-dp inputs × 1.1 are exact 3-dp
    // values, half of which end in 5 — i.e. exactly on round-2 half-way
    // points, where the engines' rounding implementations disagree
    // (surfaced at sf0.1: 4 of 1500 updated rows). At 3 dp every value
    // sits ON a lattice point, never on a boundary.
    val updates = cust.filter(col("c_custkey") % 10 === 0)
      .withColumn("c_acctbal", round(col("c_acctbal") * 1.1 + 100.0, 3))
    val inserts = spark.range(2).select(
      (col("id") + 900000000L).as("c_custkey"),
      concat(lit("Customer#new"), col("id").cast("string")).as("c_name"),
      lit(0).cast("int").as("c_nationkey"),
      lit(0.0).as("c_acctbal"),
      lit("BUILDING").as("c_mktsegment"))
    scd1(cust, updates.unionByName(inserts), "c_custkey")
  }

  val qUpsertSql: String =
    """WITH src AS (
      |  SELECT c_custkey, c_name, c_nationkey,
      |    round(c_acctbal * 1.1 + 100.0, 3) AS c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 10 = 0
      |  UNION ALL
      |  SELECT 900000000 + i AS c_custkey, 'Customer#new' || i AS c_name,
      |    CAST(0 AS INTEGER) AS c_nationkey, 0.0 AS c_acctbal,
      |    'BUILDING' AS c_mktsegment
      |  FROM range(2) t(i))
      |SELECT coalesce(s.c_custkey, t.c_custkey) AS c_custkey,
      |  coalesce(s.c_name, t.c_name) AS c_name,
      |  coalesce(s.c_nationkey, t.c_nationkey) AS c_nationkey,
      |  coalesce(s.c_acctbal, t.c_acctbal) AS c_acctbal,
      |  coalesce(s.c_mktsegment, t.c_mktsegment) AS c_mktsegment
      |FROM customer t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey""".stripMargin
}
