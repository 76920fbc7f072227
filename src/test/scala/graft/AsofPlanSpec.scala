package graft

import org.apache.spark.sql.functions._
import graft.operators.TimeSeriesOps
import graft.plans.AsofJoin

/** The native as-of join operator (plans/AsofJoinPlan.scala) against the
  * oracle-gated union+window formulation (TimeSeriesOps.asofCore): exact
  * whole-corpus equality on every branch (backward/forward, with/without
  * tolerance), hand-computed edge semantics, and the plan-shape contract
  * that justifies the operator's existence — per-side exchanges only where
  * an input isn't already clustered, left partitioning reused when
  * chained. */
class AsofPlanSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  private def events = Tables.events(spark, sf)
    .withColumn("ts_us", unix_micros(col("ts")))
    .select("user_id", "ts_us", "event_id", "event_type", "value")

  private def purchases = events.filter(col("event_type") === "purchase")
    .select(col("user_id"), col("ts_us"), col("event_id"),
      col("value").as("pv"))

  private def byId(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Double]] =
    df.select(col("event_id"), col("asof_val"))
      .as[(Long, Option[Double])].collect().toMap

  test("native as-of == union+window on the corpus: backward and forward") {
    for (fwd <- Seq(false, true)) {
      val composed =
        if (fwd) TimeSeriesOps.asofJoinForward(events, purchases, "user_id",
          "ts_us", "pv", tieCols = Seq("event_id"))
        else TimeSeriesOps.asofJoin(events, purchases, "user_id",
          "ts_us", "pv", tieCols = Seq("event_id"))
      val native = AsofJoin(events, purchases, "user_id", "ts_us", "pv",
        rightTieCols = Seq("event_id"), forward = fwd)
      val want = byId(composed)
      val got = byId(native)
      assert(got.size == want.size, s"fwd=$fwd row count")
      want.foreach { case (id, v) =>
        assert(got(id) == v, s"fwd=$fwd event $id: got ${got(id)} want $v")
      }
    }
  }

  test("native as-of == union+window under a tolerance bound") {
    val tol = Some(6L * 3600L * 1000000L) // 6 hours in µs
    for (fwd <- Seq(false, true)) {
      val composed =
        if (fwd) TimeSeriesOps.asofJoinForward(events, purchases, "user_id",
          "ts_us", "pv", tieCols = Seq("event_id"), toleranceUs = tol)
        else TimeSeriesOps.asofJoin(events, purchases, "user_id",
          "ts_us", "pv", tieCols = Seq("event_id"), toleranceUs = tol)
      val native = AsofJoin(events, purchases, "user_id", "ts_us", "pv",
        rightTieCols = Seq("event_id"), toleranceUs = tol, forward = fwd)
      val want = byId(composed)
      val got = byId(native)
      assert(got.size == want.size, s"fwd=$fwd row count")
      // the tolerance branch must actually bite somewhere, or the test
      // proves nothing beyond the untolerated one
      assert(want.values.exists(_.isEmpty) && want.values.exists(_.nonEmpty),
        "tolerance fixture degenerate: no mix of matched/unmatched")
      want.foreach { case (id, v) =>
        assert(got(id) == v, s"fwd=$fwd event $id: got ${got(id)} want $v")
      }
    }
  }

  test("shared-lineage right side (right = left.filter) survives relation dedup") {
    // regression for the first sf0.1 bench run of the Attribute-field
    // node: with BOTH sides derived from ONE scan — the normal way to
    // build the purchase side — DeduplicateRelations renews the right
    // child's exprIds and captured Attributes go stale
    // (ATTRIBUTE_NOT_FOUND at execution). The node stores names and
    // resolves late, so this must just work.
    val d = events // single scan, shared by both sides
    val p = d.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("value").as("pv"))
    val native = AsofJoin(d, p, "user_id", "ts_us", "pv",
      rightTieCols = Seq("event_id"))
    val composed = TimeSeriesOps.asofJoin(d, p, "user_id", "ts_us", "pv",
      tieCols = Seq("event_id"))
    val got = byId(native)
    val want = byId(composed)
    assert(got.size == want.size)
    want.foreach { case (id, v) => assert(got(id) == v, s"event $id") }
  }

  test("hand-computed edges: exact-match ties, null right values, key runs") {
    // left: key a rows at ts 10, 20, 30; key b row at 20; key c row at 5
    val l = Seq(("a", 10L, 1L), ("a", 20L, 2L), ("a", 30L, 3L),
      ("b", 20L, 4L), ("c", 5L, 5L))
      .toDF("k", "ts_us", "id")
    // right: key a has a null-valued row at 20 (must NOT shadow the 15
    // match, nor provide a tolerance timestamp), two rows tied at ts 25
    // (tie id 8 > 7 wins backward, 7 wins forward), key b an exact match
    // at 20, key d never joins
    val r = Seq(("a", 15L, 6L, Some(1.5)), ("a", 20L, 9L, None),
      ("a", 25L, 7L, Some(2.5)), ("a", 25L, 8L, Some(2.8)),
      ("b", 20L, 10L, Some(4.0)), ("d", 1L, 11L, Some(9.9)))
      .toDF("k", "ts_us", "id", "v")
    val back = AsofJoin(l, r, "k", "ts_us", "v", rightTieCols = Seq("id"))
      .select(col("id"), col("asof_val")).as[(Long, Option[Double])]
      .collect().toMap
    assert(back == Map(1L -> None, 2L -> Some(1.5), 3L -> Some(2.8),
      4L -> Some(4.0), 5L -> None), s"backward: $back")
    val fwd = AsofJoin(l, r, "k", "ts_us", "v", rightTieCols = Seq("id"),
        forward = true)
      .select(col("id"), col("asof_val")).as[(Long, Option[Double])]
      .collect().toMap
    assert(fwd == Map(1L -> Some(1.5), 2L -> Some(2.5), 3L -> None,
      4L -> Some(4.0), 5L -> None), s"forward: $fwd")
    // tolerance measured against the ts of the row that provided the
    // value: id=2's backward match is at 15 (delta 5); the null row at 20
    // must not shrink that delta to 0
    val tolBack = AsofJoin(l, r, "k", "ts_us", "v",
        rightTieCols = Seq("id"), toleranceUs = Some(4L))
      .select(col("id"), col("asof_val")).as[(Long, Option[Double])]
      .collect().toMap
    assert(tolBack(2L).isEmpty, s"null row leaked a tolerance ts: $tolBack")
    assert(tolBack(4L) == Some(4.0), s"exact match inside tolerance: $tolBack")
  }

  test("null-timestamp rows: the documented divergence from the composed form") {
    // The composed union+window form accidentally treats a null-ts right
    // row as a negative-infinity fallback (NULLS FIRST ordering puts it
    // at the front of every backward frame). The native operator takes
    // the documented position that a row without a time cannot
    // participate in a time join: null-ts right rows provide no match,
    // null-ts left rows produce none. Pin BOTH behaviors so the
    // divergence stays a recorded decision, not an accident.
    val l = Seq(("a", Some(10L), 1L), ("a", Option.empty[Long], 2L))
      .toDF("k", "ts_us", "id")
    val r = Seq(("a", Option.empty[Long], 3L, Some(5.0)))
      .toDF("k", "ts_us", "id", "v")
    val native = AsofJoin(l, r, "k", "ts_us", "v", rightTieCols = Seq("id"))
      .select(col("id"), col("asof_val")).as[(Long, Option[Double])]
      .collect().toMap
    assert(native == Map(1L -> None, 2L -> None), s"native: $native")
    val composed = TimeSeriesOps.asofJoin(l, r, "k", "ts_us", "v",
        tieCols = Seq("id"))
      .select(col("id"), col("asof_val")).as[(Long, Option[Double])]
      .collect().toMap
    // the composed form's accident, pinned as documentation: the null-ts
    // right row matches every left row of the key
    assert(composed(1L) == Some(5.0), s"composed: $composed")
  }

  test("plan shape: one exchange per unclustered side, left reuse when chained") {
    val plan = AsofJoin(events, purchases, "user_id", "ts_us", "pv",
      rightTieCols = Seq("event_id")).queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert("Exchange".r.findAllIn(plan).length == 2,
      s"expected one exchange per side:\n$plan")
    // the composed formulation can never do better than re-shuffling the
    // union; the native node chained on its own output must NOT re-shuffle
    // the left side — only the fresh right side pays
    val once = AsofJoin(events, purchases, "user_id", "ts_us", "pv",
      rightTieCols = Seq("event_id"))
    val twice = AsofJoin(once.withColumnRenamed("asof_val", "a1"),
      purchases, "user_id", "ts_us", "pv", rightTieCols = Seq("event_id"),
      forward = true)
    val plan2 = twice.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan2).length == 3,
      s"chained as-of should reuse the left partitioning:\n$plan2")
    // and no window/union machinery anywhere in the native plan
    assert(!plan.contains("Window") && !plan.contains("Union"), plan)
  }

  test("conf-injected strategy: an extensions session plans the node without the lazy installer") {
    // GraftExtensions injects EwmaStrategy/AsofJoinStrategy via
    // injectPlannerStrategy, so a spark.sql.extensions-configured session
    // must plan a hand-built AsofJoinNode WITHOUT plans.AsofJoin's
    // experimental.extraStrategies fallback ever running
    val s2 = try {
      spark // force the shared context first
      org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .create()
    } catch { case _: Throwable => null }
    assume(s2 != null, "no extensions-enabled session available")
    assert(!s2.experimental.extraStrategies.contains(graft.plans.AsofJoinStrategy))
    import s2.implicits._
    val l = Seq(("a", 10L, 1L), ("a", 20L, 2L)).toDF("k", "ts_us", "id")
    val r = Seq(("a", 15L, Some(1.5))).toDF("k", "ts_us", "v")
    val lp = org.apache.spark.sql.graftbridge.PlanBridge.logicalPlan(l)
    val rp = org.apache.spark.sql.graftbridge.PlanBridge.logicalPlan(
      r.filter(col("v").isNotNull))
    val node = graft.plans.AsofJoinNode("k", "ts_us", "v", Nil,
      forward = false, toleranceUs = None, lp, rp)
    val got = org.apache.spark.sql.graftbridge.PlanBridge.ofRows(s2, node)
      .select(col("id"), col("asof_val")).as[(Long, Option[Double])]
      .collect().toMap
    assert(got == Map(1L -> None, 2L -> Some(1.5)), s"$got")
  }

  test("bucketed inputs join with ZERO exchanges (the 100 TB ingest-once path)") {
    // the SURVEY claim this pins: both sides written bucketed+sorted by
    // the key report their bucket hash-partitioning from the scan, so
    // EnsureRequirements inserts sorts (bucket sort is by key alone, the
    // operator needs (key, ts)) but NO exchange — shuffle the corpus once
    // at ingest, never again per as-of query
    val tmp = java.nio.file.Files.createTempDirectory("asof_bucketed")
    graft.sources.Bucketing.writeBucketed(events, s"$tmp/ev",
      "asof_ev_bucketed", "user_id", 4)
    graft.sources.Bucketing.writeBucketed(purchases, s"$tmp/pu",
      "asof_pu_bucketed", "user_id", 4)
    val l = graft.sources.Bucketing.readTable(spark, "asof_ev_bucketed")
    val r = graft.sources.Bucketing.readTable(spark, "asof_pu_bucketed")
    val df = AsofJoin(l, r, "user_id", "ts_us", "pv",
      rightTieCols = Seq("event_id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert(!plan.contains("Exchange"),
      s"bucketed as-of must not shuffle:\n$plan")
    val want = byId(TimeSeriesOps.asofJoin(events, purchases, "user_id",
      "ts_us", "pv", tieCols = Seq("event_id")))
    val got = byId(df)
    assert(got == want, "bucketed result diverged from the composed join")
  }

  test("right side is pruned and null-filtered at the scan") {
    val wide = purchases.withColumn("payload", lit("x"))
    val plan = AsofJoin(events, wide, "user_id", "ts_us", "pv")
      .queryExecution.executedPlan.toString
    // payload is never consumed: column pruning must drop it below the join
    assert(!plan.contains("payload"), s"unused right column not pruned:\n$plan")
    // the wrapper's null filter lands as a pushable Filter, not exec-side
    assert(plan.contains("isnotnull(pv") || plan.contains("isnotnull(value"),
      s"null filter missing from the right scan:\n$plan")
  }
}
