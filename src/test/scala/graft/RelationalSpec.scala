package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("every declared query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"query $name returned no rows")
    }
  }

  test("every query key has either an oracle or is documented spec-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // spec-only queries are allowed (driver does rows-only check) but must be
    // intentional — keep this list in sync with SURVEY.md §2.
    val specOnly = Set(
      "ts_window_tensorize", "ts_pad_truncate", "ts_adding_problem",
      "ts_autoregressive_gen", "dedup_minhash", "dedup_simhash", "ann_lsh",
      "text_langid", "text_fingerprint", "mm_binary_features", "ts_kmeans_embed")
    assert(missing.subsetOf(specOnly), s"queries without oracle: $missing")
  }

  test("q1_agg aggregates are internally consistent") {
    val row = operators.Relational.q1Agg(spark, sf)
      .agg(sum("count_order")).head.getLong(0)
    val filtered = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1997-09-01").cast("timestamp")).count()
    assert(row == filtered)
  }

  test("q_topk_per_group returns at most 3 per group, ranked") {
    val df = operators.Relational.qTopkPerGroup(spark, sf)
    val bad = df.groupBy("o_orderpriority").count().filter(col("count") > 3).count()
    assert(bad == 0)
    assert(df.filter(col("rk") < 1 || col("rk") > 3).count() == 0)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
