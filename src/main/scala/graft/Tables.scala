package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All engine operators take DataFrames; these helpers only centralize the
  * path convention `<sfDir>/<table>.parquet`. Reads are plain parquet scans so
  * Catalyst predicate pushdown / column pruning apply unimpeded.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  /** Load `table` with any top-level TIMESTAMP_NTZ column re-read as a µs
    * TIMESTAMP whose instant is the stored wall clock read as UTC — the
    * same value [[ntzAsUtcInstant]] computes (the parquet int64 micros
    * pass through unchanged, so this is session-timezone-independent like
    * the expression form), but applied through the READER SCHEMA instead
    * of a projection. The difference is plan shape, not values: a filter
    * on the column now reaches the scan as a parquet pushdown predicate
    * (PushedFilters gains the comparison, enabling row-group min/max
    * skipping — the r20 optimization-round q3_join plans showed the
    * projection form reduced pushdown to bare IsNotNull), and no per-row
    * timestampdiff/timestamp_micros conversion runs. Value parity with
    * the expression form is pinned by TablesSpec. */
  private def loadNtzAsUtc(spark: SparkSession, sfDir: String,
                           table: String): DataFrame = {
    import org.apache.spark.sql.types.{StructType, TimestampNTZType, TimestampType}
    val raw = load(spark, sfDir, table)
    if (!raw.schema.exists(_.dataType == TimestampNTZType)) raw
    else spark.read.schema(StructType(raw.schema.map {
      case f if f.dataType == TimestampNTZType => f.copy(dataType = TimestampType)
      case f => f
    })).parquet(s"$sfDir/$table.parquet")
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame   =
    loadNtzAsUtc(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     =
    loadNtzAsUtc(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
  /** events.ts has shipped in two physical forms across driver testdata
    * generations: parquet TIMESTAMP(NANOS) (unreadable as a timestamp in
    * Spark 4 — read as raw long ns via the legacy conf) and, since r9,
    * untagged µs (`timestamp[us]`, isAdjustedToUTC=false → TIMESTAMP_NTZ).
    * Normalize either to a µs TIMESTAMP whose instant is the stored wall
    * clock read as UTC — exactly the value DuckDB-side oracles see via
    * epoch_us(ts), independent of `spark.sql.session.timeZone`.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    load(spark, sfDir, "events").schema("ts").dataType match {
      // untagged-µs form: reader-schema swap (see loadNtzAsUtc) so ts
      // predicates stay pushdown-eligible and no per-row rewrite runs
      case TimestampNTZType => loadNtzAsUtc(spark, sfDir, "events")
      // legacy TIMESTAMP(NANOS)-as-long form: the expression rewrite is
      // unavoidable (ns→µs integer division per row)
      case LongType => normalizeEventTs(load(spark, sfDir, "events"))
      case _ => load(spark, sfDir, "events")
    }
  }

  /** ts → µs TIMESTAMP (instant = stored wall clock as UTC), whatever the
    * physical representation was. Shared by batch and streaming reads. */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.LongType
    raw.schema("ts").dataType match {
      // ns→µs MUST be integer division: `/` on longs promotes to double, and
      // epoch-ns (~1.7e18) exceeds double's 2^53 mantissa → off-by-1µs noise.
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => ntzAsUtcInstant(raw, "ts")
    }
  }

  /** If `c` is TIMESTAMP_NTZ, reinterpret its wall clock as a UTC instant
    * (µs TIMESTAMP). timestampdiff on two NTZ values is pure wall-clock
    * arithmetic, so this pins "NTZ means UTC" without consulting the
    * session time zone — a plain NTZ→TIMESTAMP cast would shift by
    * whatever tz the driver's session happens to run in, and the DuckDB
    * oracle reads the same bytes as naive wall clocks. */
  def ntzAsUtcInstant(df: DataFrame, c: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.TimestampNTZType
    df.schema(c).dataType match {
      case TimestampNTZType => df.withColumn(c, timestamp_micros(
        expr(s"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', $c)")))
      case _ => df
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** Session-tz-independent timestamp literal: the given ISO date (or
    * `yyyy-MM-dd HH:mm:ss` timestamp) as a UTC instant. The tables above
    * pin their NTZ wall clocks to UTC instants, but a bare
    * `lit(s).cast("timestamp")` parses in `spark.sql.session.timeZone` —
    * correct only under a UTC session; a non-UTC driver would shift every
    * date-literal filter boundary by the zone offset (r9 advice). This
    * resolves the epoch offset driver-side with java.time, so the filter
    * compares instant-to-instant whatever the session zone is. */
  def utcTs(isoDateOrTs: String): org.apache.spark.sql.Column = {
    val ldt =
      if (isoDateOrTs.length == 10)
        java.time.LocalDate.parse(isoDateOrTs).atStartOfDay()
      else java.time.LocalDateTime.parse(isoDateOrTs.replace(' ', 'T'))
    org.apache.spark.sql.functions.timestamp_micros(
      org.apache.spark.sql.functions.lit(
        java.time.temporal.ChronoUnit.MICROS.between(
          java.time.Instant.EPOCH, ldt.toInstant(java.time.ZoneOffset.UTC))))
  }
}
