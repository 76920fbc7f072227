package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational analytics core (SURVEY.md §2.2).
  *
  * Scan→filter→agg / join / window shapes expressed declaratively so Catalyst
  * gets full pushdown + join-strategy freedom. Dimension-sized sides are
  * explicitly `broadcast(...)` — at 100 TB the fact tables (lineitem, orders,
  * events) shuffle only when an agg/join key requires it, and dims never do.
  *
  * Float outputs of aggregations are rounded (in both the Spark query and the
  * DuckDB oracle) because summation order differs across engines; raw
  * pass-through columns are left exact.
  */
object Relational {

  /** TPC-H Q1-style pricing summary (scan + partial-agg friendly groupBy). */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= graft.Tables.utcTs("1997-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 6).as("sum_charge"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_extendedprice")), 6).as("avg_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 6) AS sum_charge,
      |  round(avg(l_quantity), 6) AS avg_qty,
      |  round(avg(l_extendedprice), 6) AS avg_price,
      |  round(avg(l_discount), 6) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1997-09-01'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-style shipping priority: 3-way join, filtered, revenue agg. */
  def q3Join(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < graft.Tables.utcTs("1996-06-01"))
    val li   = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > graft.Tables.utcTs("1996-06-01"))
    // customer is dim-sized relative to orders/lineitem: broadcast it.
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
  }

  val q3JoinSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1996-06-01'
      |  AND l_shipdate > TIMESTAMP '1996-06-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority""".stripMargin

  /** TPC-H Q5-flavored multijoin: fact chain + broadcast dimension chain. */
  def q5Multijoin(spark: SparkSession, sfDir: String): DataFrame = {
    val li   = Tables.lineitem(spark, sfDir)
    val ord  = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= graft.Tables.utcTs("1995-01-01"))
      .filter(col("o_orderdate") < graft.Tables.utcTs("1997-01-01"))
    val cust = Tables.customer(spark, sfDir)
    val supp = Tables.supplier(spark, sfDir)
    val nat  = Tables.nation(spark, sfDir)
    val reg  = Tables.region(spark, sfDir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
                             col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"), col("r_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"),
           count(lit(1)).as("n_items"))
  }

  val q5MultijoinSql: String =
    """SELECT n_name, r_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem, orders, customer, supplier, nation, region
      |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND o_orderdate >= TIMESTAMP '1995-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name, r_name""".stripMargin

  /** Top-3 orders by totalprice per priority class, via the bounded-state
    * `smallest_k` aggregate (same shape as [[qTopWords]]). A
    * `row_number() OVER (PARTITION BY o_orderpriority ...)` window would
    * sort the ENTIRE orders table on the 5 priority values — 5 tasks at
    * any scale; the aggregate keeps 3 rows of state per priority with
    * map-side partials. o_totalprice > 0, so negating it for the
    * descending order cannot produce a -0.0 sort-key artifact. */
  def qTopkPerGroup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(graft.functions.SmallestK.smallestK(
        struct((-col("o_totalprice")).as("np"), col("o_orderkey"),
          col("o_totalprice")), 3).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("o_orderpriority"), (col("pos") + 1).cast("int").as("rk"),
        col("t.o_orderkey").as("o_orderkey"),
        col("t.o_totalprice").as("o_totalprice"))

  val qTopkPerGroupSql: String =
    """SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) WHERE rk <= 3""".stripMargin

  /** Multi-level ROLLUP aggregate over order status/priority. */
  def qRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(round(sum(col("o_totalprice")), 2).as("total"), count(lit(1)).as("n"))

  val qRollupSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  round(sum(o_totalprice), 2) AS total, count(*) AS n
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin

  /** CUBE over status × priority — all 4 grouping sets in one pass
    * (Expand + single shuffle, partial aggregation applies per set). */
  def qCube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(round(sum(col("o_totalprice")), 2).as("total"), count(lit(1)).as("n"))

  val qCubeSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  round(sum(o_totalprice), 2) AS total, count(*) AS n
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  /** Debounce dedup: suppress events that arrive within 10 minutes of the
    * previous event of the same (user, type) — the idempotency /
    * double-fire filter of an event pipeline. One lag over the natural
    * per-user shuffle; at scale this is the batch twin of
    * dropDuplicatesWithinWatermark. */
  def qWindowDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .filter(col("prev_us").isNull || col("us") - col("prev_us") > 600000000L)
      .select("user_id", "event_type", "event_id", "us")
  }

  val qWindowDedupSql: String =
    """SELECT user_id, event_type, event_id, us FROM (
      |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
      |    lag(epoch_us(ts), 1) OVER (PARTITION BY user_id, event_type
      |                               ORDER BY epoch_us(ts), event_id) AS prev_us
      |  FROM events)
      |WHERE prev_us IS NULL OR us - prev_us > 600000000""".stripMargin

  /** Pivot event_type → columns via conditional aggregation (shuffle-once). */
  def qPivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(
        round(sum(when(col("event_type") === "click", col("value")).otherwise(lit(0.0))), 2).as("click_v"),
        round(sum(when(col("event_type") === "view", col("value")).otherwise(lit(0.0))), 2).as("view_v"),
        round(sum(when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0))), 2).as("purchase_v"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"))

  val qPivotSql: String =
    """SELECT user_id,
      |  round(sum(CASE WHEN event_type = 'click' THEN value ELSE 0.0 END), 2) AS click_v,
      |  round(sum(CASE WHEN event_type = 'view' THEN value ELSE 0.0 END), 2) AS view_v,
      |  round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 2) AS purchase_v,
      |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
      |FROM events GROUP BY user_id""".stripMargin

  /** JSON property extraction from the string-typed props column. */
  def qJsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"))

  val qJsonExtractSql: String =
    """SELECT event_type,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  count(json_extract_string(props, '$.k')) AS n_k
      |FROM events GROUP BY event_type""".stripMargin

  /** Semi/anti-join: per market segment, customers with at least one order
    * (EXISTS) and customers with orders but none above 300k (NOT EXISTS). */
  def qSemiAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    val withOrders = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
    val bigOrders = ord.filter(col("o_totalprice") > 300000)
    val noBig = withOrders.join(bigOrders,
      withOrders("c_custkey") === bigOrders("o_custkey"), "left_anti")
    withOrders.groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_with_orders"))
      .join(noBig.groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_no_big")),
        Seq("c_mktsegment"), "left")
  }

  val qSemiAntiSql: String =
    """WITH wo AS (
      |  SELECT * FROM customer c
      |  WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)),
      |nb AS (
      |  SELECT * FROM wo c
      |  WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000))
      |SELECT a.c_mktsegment AS c_mktsegment, a.n_with_orders, b.n_no_big
      |FROM (SELECT c_mktsegment, count(*) AS n_with_orders FROM wo GROUP BY 1) a
      |LEFT JOIN (SELECT c_mktsegment, count(*) AS n_no_big FROM nb GROUP BY 1) b
      |  USING (c_mktsegment)""".stripMargin

  /** Sketch-based approximations: HyperLogLog++ distinct counts and
    * approximate quantiles — the constant-memory path when exact
    * distincts/percentiles would shuffle too much state at 100 TB. No SQL
    * oracle (sketch implementations differ across engines); the spec bounds
    * the error against the exact answers instead. */
  def qApproxSketch(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50_approx"),
        count(lit(1)).as("n"))

  /** Ordered string aggregation — list-like rollups (all statuses seen per
    * priority) with deterministic ordering via sorted collect_set. */
  def qStringAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(
        concat_ws(",", array_sort(collect_set(col("o_orderstatus")))).as("statuses"),
        count(lit(1)).as("n"))

  val qStringAggSql: String =
    """SELECT o_orderpriority,
      |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** Pre-aggregated sketch rollup — THE pattern for distinct-counting at
    * 100 TB: materialize one mergeable HLL sketch per (day, event_type)
    * cell (the expensive pass touches raw data once), then answer
    * coarser-grained distinct questions by UNIONING sketches, never
    * re-reading rows. Here: daily user sketches → per-type all-time
    * distinct estimate. Spec bounds the estimate against the exact count;
    * no SQL oracle (sketch binaries are engine-specific). */
  def qSketchRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .groupBy(expr("date_trunc('day', ts)").as("day"), col("event_type"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    daily.groupBy(col("event_type"))
      .agg(
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_users"),
        count(lit(1)).as("n_days"))
  }

  /** Top-5 most frequent tokens per language (explode → count → bounded
    * top-k). The per-group rank is the native smallest_k aggregate rather
    * than a row_number window: with a low-cardinality group key (5
    * languages) the window would sort the ENTIRE distinct-vocabulary table
    * on 5 partitions, while smallest_k keeps 5 rows of state per group
    * with map-side partial aggregation — "n DESC, word ASC" encoded as the
    * natural ascending order of struct(-n, word). */
  def qTopWords(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("lang"), explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
    val counts = toks.groupBy(col("lang"), col("word")).agg(count(lit(1)).as("n"))
    counts.groupBy(col("lang"))
      .agg(graft.functions.SmallestK.smallestK(
        struct((-col("n")).as("negn"), col("word"), col("n")), 5).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("lang"), (col("pos") + 1).cast("int").as("rk"),
        col("t.word").as("word"), col("t.n").as("n"))
  }

  val qTopWordsSql: String =
    """SELECT lang, rk, word, n FROM (
      |  SELECT lang, word, n,
      |    row_number() OVER (PARTITION BY lang ORDER BY n DESC, word) AS rk
      |  FROM (
      |    SELECT lang, word, count(*) AS n FROM (
      |      SELECT lang, unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
      |      FROM documents) t
      |    GROUP BY lang, word))
      |WHERE rk <= 5""".stripMargin

  /** Exact interpolated percentiles per group (distribution profiling). */
  def qPercentiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"),
        round(min(col("value")), 2).as("v_min"),
        round(max(col("value")), 2).as("v_max"))

  val qPercentilesSql: String =
    """SELECT event_type,
      |  round(quantile_cont(value, 0.5), 6) AS p50,
      |  round(quantile_cont(value, 0.9), 6) AS p90,
      |  round(quantile_cont(value, 0.99), 6) AS p99,
      |  round(min(value), 2) AS v_min,
      |  round(max(value), 2) AS v_max
      |FROM events GROUP BY event_type""".stripMargin

  /** Distinct aggregations: exact user/day cardinalities per event type. */
  def qDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(date_trunc("day", col("ts"))).as("n_days"),
        count(lit(1)).as("n_events"))

  val qDistinctSql: String =
    """SELECT event_type,
      |  count(DISTINCT user_id) AS n_users,
      |  count(DISTINCT date_trunc('day', ts)) AS n_days,
      |  count(*) AS n_events
      |FROM events GROUP BY event_type""".stripMargin

  /** Tumbling 1-hour window aggregation over the event stream (batch twin of
    * the Structured Streaming query in graft.streaming). Window start emitted
    * as epoch millis: Spark truncates parquet ns-timestamps to µs while DuckDB
    * keeps ns, so raw timestamp output would never hash-match.
    */
  def qTumblingAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
      .select(unix_millis(col("w.start")).as("w_start_ms"), col("event_type"), col("n"), col("v"))

  val qTumblingAggSql: String =
    """SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS w_start_ms,
      |  event_type, count(*) AS n, round(sum(value), 2) AS v
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Ordered conversion funnel (view → click → purchase): per user, the
    * first view, the first click AFTER that view, the first purchase AFTER
    * that click — then stage reach counts. The three stage timestamps are
    * chained window mins over the same user partition, so Catalyst plans
    * ONE shuffle+sort feeding all three window frames (sequential-pattern
    * matching without a self-join per stage). */
  def qFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .withColumn("t1", min(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" && col("us") > col("t1"), col("us"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" && col("us") > col("t2"), col("us"))).over(w))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(when(col("t1").isNotNull, col("user_id"))).as("n_view"),
        countDistinct(when(col("t2").isNotNull, col("user_id"))).as("n_view_click"),
        countDistinct(when(col("t3").isNotNull, col("user_id"))).as("n_funnel"))
  }

  val qFunnelSql: String =
    """WITH base AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |s1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
      |         OVER (PARTITION BY user_id) AS t1 FROM base),
      |s2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND us > t1 THEN us END)
      |         OVER (PARTITION BY user_id) AS t2 FROM s1),
      |s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND us > t2 THEN us END)
      |         OVER (PARTITION BY user_id) AS t3 FROM s2)
      |SELECT count(DISTINCT user_id) AS n_users,
      |  count(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS n_view,
      |  count(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS n_view_click,
      |  count(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) AS n_funnel
      |FROM s3""".stripMargin

  /** Correlation / covariance profile between lineitem measures per
    * return flag — one-pass algebraic aggregates (co-moment partials
    * merge associatively; map-side combine applies). */
  def qCorr(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        (round(corr(col("l_quantity"), col("l_extendedprice")), 6) + lit(0.0)).as("corr_qty_price"),
        (round(corr(col("l_discount"), col("l_extendedprice")), 6) + lit(0.0)).as("corr_disc_price"),
        round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
        count(lit(1)).as("n"))

  val qCorrSql: String =
    """SELECT l_returnflag,
      |  round(corr(l_quantity, l_extendedprice), 6) + 0.0 AS corr_qty_price,
      |  round(corr(l_discount, l_extendedprice), 6) + 0.0 AS corr_disc_price,
      |  round(stddev_samp(l_quantity), 6) AS sd_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Hot-key aggregation through the two-stage salted path (Skew.saltedAgg)
    * — the oracle proves the salted partial/merge decomposition is exact:
    * its result must hash-match a plain one-stage GROUP BY. */
  def qSaltedAgg(spark: SparkSession, sfDir: String): DataFrame =
    Skew.saltedSumCount(Tables.events(spark, sfDir), "event_type", "value")
      .select(col("event_type"), round(col("v_sum"), 2).as("v_sum"), col("v_n"))

  val qSaltedAggSql: String =
    """SELECT event_type, round(sum(value), 2) AS v_sum,
      |  CAST(count(value) AS BIGINT) AS v_n
      |FROM events GROUP BY event_type""".stripMargin

  /** Ordered event-sequence pattern matching — a MATCH_RECOGNIZE stand-in:
    * each user's event types collapse to an ordered code string (first
    * letter of the type — distinct across the five types), then a regex
    * counts conversion runs `v[cs]*p` (view, then purchase, with only
    * clicks/signups between — an error breaks the run). One shuffle (the
    * per-user collect_list); the regex scan is map-side on 1 row per user.
    * The codes stay deterministic under collisions via (ts_us, event_id)
    * struct sort. At 100 TB the per-user string is bounded by session
    * length, not table size — pair with ts_sessionize to bound it further. */
  def qEventPattern(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.events(spark, sfDir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .select(col("user_id"), col("ts_us"), col("event_id"),
        substring(col("event_type"), 1, 1).as("c"))
    d.groupBy(col("user_id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("ts_us"), col("event_id"), col("c")))),
          x => x.getField("c")), "").as("seq"))
      .select(col("user_id"),
        length(col("seq")).as("seq_len"),
        regexp_count(col("seq"), lit("v[cs]*p")).as("n_conv"),
        (regexp_count(col("seq"), lit("v[cs]*p")) > 0).cast("int").as("converted"))
  }

  val qEventPatternSql: String =
    """SELECT user_id,
      |  length(seq) AS seq_len,
      |  CAST(len(regexp_extract_all(seq, 'v[cs]*p')) AS INT) AS n_conv,
      |  CAST(len(regexp_extract_all(seq, 'v[cs]*p')) > 0 AS INT) AS converted
      |FROM (
      |  SELECT user_id,
      |    string_agg(substr(event_type, 1, 1), '' ORDER BY epoch_us(ts), event_id) AS seq
      |  FROM events GROUP BY user_id)""".stripMargin
}
