package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Pins the r20 reader-schema form of the NTZ→UTC-instant normalization:
  * values byte-identical to the expression form ([[Tables.ntzAsUtcInstant]])
  * it replaced on the loader path, output type unchanged, and the plan
  * property the swap exists for — timestamp predicates reaching the parquet
  * scan as pushdown filters instead of dying on a derived column. */
class TablesSpec extends SparkSpec {

  test("loader ts columns: reader-schema form == expression form, byte-exact") {
    for ((table, c) <- Seq(("lineitem", "l_shipdate"), ("orders", "o_orderdate"),
                           ("events", "ts"))) {
      val viaSchema = table match {
        case "lineitem" => Tables.lineitem(spark, sf)
        case "orders"   => Tables.orders(spark, sf)
        case _          => Tables.events(spark, sf)
      }
      assert(viaSchema.schema(c).dataType == TimestampType,
        s"$table.$c must surface as µs TIMESTAMP")
      val viaExpr = Tables.ntzAsUtcInstant(Tables.load(spark, sf, table), c)
      val a = viaSchema.select(col(c)).withColumn("us", unix_micros(col(c)))
      val b = viaExpr.select(col(c)).withColumn("us", unix_micros(col(c)))
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$table.$c: reader-schema values diverge from the expression form")
    }
  }

  test("loaders rebalance under-split tiny inputs to session parallelism") {
    // one row group = one scan task no matter the core count; the loader
    // inserts a hash repartition on the table's natural unique key for
    // such tiny inputs so map-side work parallelizes (identity at scale:
    // many row groups clear the partition-count condition)
    val para = spark.sparkContext.defaultParallelism
    assert(Tables.documentsKernel(spark, sf).rdd.getNumPartitions == para,
      "documentsKernel did not rebalance a single-row-group tiny input")
    assert(Tables.customerKernel(spark, sf).rdd.getNumPartitions == para,
      "customerKernel did not rebalance a single-row-group tiny input")
    // the plain loaders stay un-rebalanced (light-map/join-only consumers)
    assert(Tables.documents(spark, sf).rdd.getNumPartitions < para,
      "plain documents loader unexpectedly repartitioned")
    assert(Tables.customer(spark, sf).rdd.getNumPartitions < para,
      "plain customer loader unexpectedly repartitioned")
    // and the rebalance must NOT cost the scan its pushdown (filters push
    // through a Repartition node)
    val plan = Tables.documentsKernel(spark, sf)
      .filter(col("doc_id") > 100L).queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(doc_id,100)"),
      s"doc_id pushdown lost through the rebalance:\n${plan.take(1200)}")
  }

  test("ts predicates on loader columns reach the scan as pushed filters") {
    val plan = Tables.orders(spark, sf)
      .filter(col("o_orderdate") < Tables.utcTs("1996-06-01"))
      .queryExecution.executedPlan.toString
    // the pre-r20 projection form pushed only IsNotNull; the reader-schema
    // form must push the comparison itself
    assert(plan.contains("LessThan(o_orderdate"),
      s"o_orderdate comparison not pushed to the scan:\n${plan.take(1500)}")
  }
}
