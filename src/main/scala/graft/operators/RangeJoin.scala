package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Bucketized range (interval) join — point-in-interval matching without the
  * BroadcastNestedLoopJoin a naive `BETWEEN` predicate degenerates to.
  *
  * Shape: points carry an epoch-µs column; intervals carry [start_us,
  * end_us]. Each interval is exploded to every fixed-width time bucket it
  * overlaps (ceil(len/W)+1 rows, small when W >= the typical interval
  * length); each point computes its bucket map-side. The join is then a
  * plain equi-join on the bucket key, with the exact BETWEEN predicate as a
  * post-filter.
  *
  * Scale design: the big (points) side shuffles ONCE on the bucket key
  * (or not at all when the exploded interval side is broadcast-sized —
  * Spark's planner picks BroadcastHashJoin automatically). Bucket width
  * trades interval-side duplication (long intervals → many buckets) against
  * join fan-in (wide buckets → more false candidate pairs discarded by the
  * post-filter). At 100 TB, pick W ≈ p95 interval length.
  */
object RangeJoin {

  /** Equi-join `points` to `intervals` on bucketized time, keeping rows
    * where `ptUs` lies in [start_us, end_us]. Both inputs keep all their
    * columns; `intervals` must expose `start_us` and `end_us`. */
  def rangeJoin(points: DataFrame, ptUs: Column, intervals: DataFrame,
                bucketUs: Long): DataFrame = {
    // epoch-µs magnitudes (~1.7e15) sit safely below double's 2^53
    // mantissa, so floor(x / W) is exact here (unlike epoch-ns)
    def bucketOf(c: Column): Column = floor(c / bucketUs).cast("long")
    val buckets = intervals.withColumn("bucket",
      explode(sequence(bucketOf(col("start_us")), bucketOf(col("end_us")))))
    points.withColumn("bucket", bucketOf(ptUs))
      .join(buckets, Seq("bucket"))
      .filter(ptUs >= col("start_us") && ptUs <= col("end_us"))
      .drop("bucket")
  }

  /** Interval×interval OVERLAP join — the two-sided generalization of
    * [[rangeJoin]] (sessions × maintenance windows, downtime × incident
    * ranges). Every pair with `aStart <= bEnd && bStart <= aEnd` comes out
    * exactly once.
    *
    * Same bucketization: both sides explode to the fixed-width buckets
    * they span, the join is an equi-join on the bucket key, and the exact
    * overlap predicate post-filters. The subtlety two-sided explosion adds
    * is DUPLICATES — an overlapping pair co-occurs in every bucket their
    * spans share — and the standard fix costs a dropDuplicates shuffle.
    * This implementation is duplicate-free by construction instead: a
    * pair is kept only in the bucket of `max(aStart, bStart)` — the first
    * bucket of the overlap region, which both sides provably cover
    * (max(aStart, bStart) lies inside both intervals whenever they
    * overlap) — so each surviving pair appears in exactly one bucket and
    * no post-join dedup exchange exists in the plan.
    *
    * Contract: the four interval columns are epoch-µs longs; `a` and `b`
    * must have disjoint column names (rename before joining — the output
    * carries both sides' columns). Scale shape is [[rangeJoin]]'s: one
    * shuffle per side on the bucket key (or a broadcast when one exploded
    * side is dim-sized), fan-out governed by `bucketUs` vs interval
    * lengths. */
  def intervalJoin(a: DataFrame, aStart: String, aEnd: String,
                   b: DataFrame, bStart: String, bEnd: String,
                   bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"intervalJoin: bucketUs must be positive, got $bucketUs")
    val clash = a.columns.toSet.intersect(b.columns.toSet)
    require(clash.isEmpty,
      s"intervalJoin: column name clash ${clash.mkString(", ")} — rename " +
        "one side so the output is unambiguous")
    require(!a.columns.contains("_bucket") && !b.columns.contains("_bucket"),
      "intervalJoin: '_bucket' is reserved — a pre-existing column of " +
        "that name would be silently overwritten and dropped")
    def bucketOf(c: Column): Column = floor(c / bucketUs).cast("long")
    val aB = a.withColumn("_bucket",
      explode(sequence(bucketOf(col(aStart)), bucketOf(col(aEnd)))))
    val bB = b.withColumn("_bucket",
      explode(sequence(bucketOf(col(bStart)), bucketOf(col(bEnd)))))
    aB.join(bB, Seq("_bucket"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .filter(col("_bucket") === bucketOf(greatest(col(aStart), col(bStart))))
      .drop("_bucket")
  }

  // ---------- SparkEntry glue ----------

  private val BaseUs = 1704067200000000L // 2024-01-01T00:00:00Z
  private val HourUs = 3600000000L

  /** 200 deterministic overlapping maintenance windows over the events
    * span: window i starts at base + 3h·i and lasts (1 + (7i mod 23)) h. */
  def intervals(spark: SparkSession): DataFrame =
    spark.range(200).select(
      col("id").as("iv_id"),
      (lit(BaseUs) + col("id") * lit(3 * HourUs)).as("start_us"),
      (lit(BaseUs) + col("id") * lit(3 * HourUs) +
        (lit(1) + pmod(col("id") * 7, lit(23))) * lit(HourUs)).as("end_us"))

  /** Events aggregated per overlapping maintenance window. */
  def qRangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(unix_micros(col("ts")).as("ev_us"), col("user_id"), col("value"))
    rangeJoin(ev, col("ev_us"), intervals(spark), bucketUs = 24 * HourUs)
      .groupBy(col("iv_id"), col("start_us"), col("end_us"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 2).as("sum_value"),
           count_distinct(col("user_id")).as("n_users"))
  }

  val qRangeJoinSql: String =
    """WITH iv AS (
      |  SELECT i AS iv_id,
      |    1704067200000000 + i * 10800000000 AS start_us,
      |    1704067200000000 + i * 10800000000 + (1 + (i * 7) % 23) * 3600000000 AS end_us
      |  FROM range(200) t(i))
      |SELECT iv_id, start_us, end_us,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  round(sum(value), 2) AS sum_value,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM events e JOIN iv
      |  ON epoch_us(e.ts) >= iv.start_us AND epoch_us(e.ts) <= iv.end_us
      |GROUP BY iv_id, start_us, end_us""".stripMargin
}
