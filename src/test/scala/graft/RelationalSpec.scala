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
      "ts_autoregressive_gen", "dedup_minhash", "dedup_simhash", "ann_lsh",
      "text_langid", "text_fingerprint", "mm_binary_features", "mm_frame_sample",
      "ts_kmeans_embed", "ts_logreg_embed", "q_approx_sketch",
      "q_sketch_rollup", "ts_rul_pipeline", "ann_ivf")
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

  test("q5 plan broadcasts every dimension side") {
    val plan = operators.Relational.q5Multijoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("approx sketches stay within tolerance of exact answers") {
    val approx = operators.Relational.qApproxSketch(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = operators.Relational.qDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val p50 = operators.Relational.qPercentiles(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    approx.foreach { case (et, (users, p)) =>
      assert(math.abs(users - exact(et)).toDouble / exact(et) < 0.1,
        s"$et HLL off: $users vs ${exact(et)}")
      assert(math.abs(p - p50(et)) / math.max(p50(et), 1.0) < 0.1,
        s"$et p50 approx off: $p vs ${p50(et)}")
    }
  }

  test("stream-static join: streaming events enriched with a static dim") {
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("ss_join")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      tmp.resolve("events.parquet"))
    val stream = streaming.StreamingOps.readEvents(spark, tmp.toString)
    val dim = Tables.customer(spark, sf)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val joined = stream.join(dim, Seq("user_id"))
      .groupBy("c_mktsegment").count()
    val q = joined.writeStream.outputMode("complete")
      .format("memory").queryName("ss_join")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ss_join")
    assert(got.count() > 0)
    val total = got.agg(sum("count")).head.getLong(0)
    val expected = Tables.events(spark, sf).join(dim, Seq("user_id")).count()
    assert(total == expected)
  }

  test("date-literal filters are session-timezone-invariant (utcTs, r9 advice)") {
    // utcTs resolves driver-side: 1996-06-01 00:00 UTC in epoch micros
    val us = spark.range(1).select(unix_micros(Tables.utcTs("1996-06-01")))
      .head.getLong(0)
    assert(us == 833587200000000L)
    // q3_join's boundaries must not move when the session zone does — the
    // r9 formulation (lit(...).cast("timestamp")) parsed literals in
    // session-local time and shifted every filter by the zone offset
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    def run(): Set[String] = {
      val df = operators.Relational.q3Join(spark, sf)
      df.collect().map(_.mkString("|")).toSet
    }
    try {
      spark.conf.set(tzKey, "UTC")
      val utc = run()
      spark.conf.set(tzKey, "America/Los_Angeles")
      val la = run()
      assert(utc == la, "q3_join results moved with the session time zone")
      assert(utc.nonEmpty)
    } finally spark.conf.set(tzKey, saved)
  }
}
