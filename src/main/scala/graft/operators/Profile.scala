package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{Kll, KllUtil, Reservoir, ReservoirUtil, Theta, ThetaUtil}

/** One-pass, sketch-backed table profiling + snapshot drift detection —
  * the operational layer a 100 TB pipeline runs on every ingest.
  *
  * [[profile]] computes, for every column, in ONE aggregation job over
  * ONE scan (every statistic is a map-side-partial aggregate: plain
  * count/min/max/mean, a theta sketch for distincts, a KLL sketch for
  * numeric quantiles): row/null counts, approx distinct, min/mean/max,
  * p50/p95/p99 — and RETAINS the sketch bytes per column. That retention
  * is the point: profiles are small (KBs/column), persistable next to
  * the snapshot, and [[drift]] compares two snapshots SKETCH-TO-SKETCH —
  * value-domain overlap via theta set expressions, quantile shift via
  * KLL probes — without re-reading either table. "Did yesterday's crawl
  * change the corpus distribution" becomes a KB-sized join, not a 100 TB
  * re-scan.
  *
  * The final per-column row assembly collects exactly ONE aggregate row
  * (ncols × a few sketch payloads, KBs) — bounded driver state, same
  * rule as the ANN LUT collects.
  */
object Profile {

  private val profileSchema = StructType(Seq(
    StructField("column", StringType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("n_nulls", LongType, nullable = false),
    StructField("distinct_est", DoubleType, nullable = false),
    StructField("is_numeric", BooleanType, nullable = false),
    StructField("min_val", DoubleType, nullable = true),
    StructField("mean_val", DoubleType, nullable = true),
    StructField("max_val", DoubleType, nullable = true),
    StructField("p50", DoubleType, nullable = true),
    StructField("p95", DoubleType, nullable = true),
    StructField("p99", DoubleType, nullable = true),
    StructField("theta", BinaryType, nullable = true),
    StructField("kll", BinaryType, nullable = true),
    StructField("examples", ArrayType(StringType, containsNull = false),
      nullable = true)))

  private def isNumericType(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _: TimestampType | _: TimestampNTZType | _: DateType => true
    case _ => false
  }

  /** Numeric view of a column for quantile/extremes purposes: temporal
    * types profile on their epoch-µs/day line (drift in a ts column is a
    * shift of that line). */
  private def numView(c: Column, dt: DataType): Column = dt match {
    case _: TimestampType => unix_micros(c).cast("double")
    case _: TimestampNTZType =>
      unix_micros(c.cast(TimestampType)).cast("double")
    case _: DateType => datediff(c, lit("1970-01-01")).cast("double")
    case _ => c.cast("double")
  }

  /** The wide single-row aggregate every statistic lives in — exposed
    * separately because it is STREAMING-SAFE: every column is either a
    * plain mergeable aggregate or a mergeable sketch, so the same
    * expression set runs as a complete-mode streaming aggregation
    * (sketch buffers = state-store entries, exactly the
    * tdigestStream/thetaStream pattern) and the wide row can be
    * assembled into per-column rows by a foreachBatch consumer. */
  def profileAggs(df: DataFrame, thetaK: Int = 1024,
                  kllK: Int = 200, exampleK: Int = 5): DataFrame = {
    val cols = df.schema.fields
    require(cols.nonEmpty, "profile: no columns")
    val aggs: Seq[Column] = cols.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        count(lit(1)).as(s"${f.name}__n"),
        count(when(c.isNull, 1)).as(s"${f.name}__nulls"),
        Theta.sketch(c, thetaK).as(s"${f.name}__theta"),
        // deterministic example values per column (the "what does this
        // column actually look like" a profile reader asks first) — a
        // mergeable reservoir, so this stays streaming-safe; values over
        // 120 chars are elided to keep the profile a summary, not a dump
        Reservoir.sample(
          when(length(c.cast(StringType)) > 120,
            concat(substring(c.cast(StringType), 1, 117), lit("..."))
          ).otherwise(c.cast(StringType)), exampleK)
          .as(s"${f.name}__sample"))
      val numeric =
        if (isNumericType(f.dataType)) {
          val v = numView(c, f.dataType)
          Seq(min(v).as(s"${f.name}__min"),
            avg(v).as(s"${f.name}__mean"),
            max(v).as(s"${f.name}__max"),
            Kll.sketch(v, kllK).as(s"${f.name}__kll"))
        } else Seq.empty
      base ++ numeric
    }.toSeq
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Per-column profile of `df` — one row per column, one job total. */
  def profile(df: DataFrame, thetaK: Int = 1024, kllK: Int = 200,
              exampleK: Int = 5): DataFrame = {
    val spark = df.sparkSession
    val cols = df.schema.fields
    val row = profileAggs(df, thetaK, kllK, exampleK).head
    val out = cols.map { f =>
      def d(s: String): Double = row.getAs[Double](s"${f.name}__$s")
      val theta = row.getAs[Array[Byte]](s"${f.name}__theta")
      val numeric = isNumericType(f.dataType)
      val kll =
        if (numeric) row.getAs[Array[Byte]](s"${f.name}__kll") else null
      def q(p: Double): Any =
        if (kll == null) null
        else {
          val v = KllUtil.quantileBytes(kll, p)
          if (v.isNaN) null else v
        }
      def opt(s: String): Any =
        if (!numeric || row.isNullAt(row.fieldIndex(s"${f.name}__$s"))) null
        else d(s)
      val examples = ReservoirUtil.valuesOf(
        row.getAs[Array[Byte]](s"${f.name}__sample")).map(_.toString).toSeq
      Row(f.name, row.getAs[Long](s"${f.name}__n"),
        row.getAs[Long](s"${f.name}__nulls"),
        ThetaUtil.estimateBytes(theta), numeric,
        opt("min"), opt("mean"), opt("max"),
        q(0.50), q(0.95), q(0.99), theta, kll, examples)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1), profileSchema)
  }

  /** Per-row percentile scoring: add `<valueCol>_pct` — each row's
    * estimated rank within the WHOLE table's distribution of `valueCol`.
    * Two jobs total at any scale: one aggregation builds the KLL sketch
    * (KBs, collected driver-side like a broadcast LUT), then the scoring
    * pass is pure map-side codegen'd expression work ([[graft.functions.Kll.rank]]
    * with the sketch as a literal). The curation use: "keep documents
    * above the corpus's 30th quality percentile" without a sort, a
    * window, or a second shuffle — at 100 TB a global `percent_rank()`
    * window is a single-partition catastrophe; this is two scans. */
  def percentileScore(df: DataFrame, valueCol: String,
                      kllK: Int = 200): DataFrame = {
    val sk = df.agg(
      Kll.sketch(col(valueCol).cast("double"), kllK).as("s"))
      .head.getAs[Array[Byte]]("s")
    // KllAgg is non-nullable (empty input evals to an empty-sketch wire),
    // so the emptiness check must read the header's item count — a null
    // check here is dead code (self-review catch)
    require(KllUtil.countBytes(sk) > 0L,
      s"percentileScore: no rows to sketch in $valueCol")
    df.withColumn(s"${valueCol}_pct", Kll.rank(lit(sk), col(valueCol)))
  }

  /** Sketch-to-sketch drift between two profiles of the SAME schema
    * (e.g. yesterday's snapshot vs today's): per column —
    *  - `jaccard`: value-domain overlap |A∩B| / |A∪B| from the theta
    *    sketches (1.0 = same domain; drops when the domain churns),
    *  - `new_frac`: |B \ A| / |B| — the fraction of the new snapshot's
    *    domain that did not exist before (the "is this crawl actually
    *    new data" number),
    *  - `quantile_shift`: max over the probed deciles of
    *    |q_B − q_A| / (p99_A − p50_A + ε) — a scale-normalized location
    *    shift from the KLL sketches (numeric columns only).
    * Pure expression work over KB-sized rows; neither table is read.
    *
    * Versioning caveat: drift compares sketch CONTENTS, so comparing a
    * profile persisted under an older graft build against a fresh one
    * reports any hash-ingest change as domain churn (e.g. the NULL-skip
    * fix: a pre-fix profile of a nullable column carries one phantom
    * hash a post-fix profile lacks). After upgrading, rebuild the
    * baseline profile once before trusting cross-version drift. */
  def drift(before: DataFrame, after: DataFrame): DataFrame = {
    val eps = 1e-9
    val a = before.select(col("column"), col("distinct_est").as("da"),
      col("theta").as("ta"), col("kll").as("ka"),
      col("p50").as("p50a"), col("p99").as("p99a"),
      col("is_numeric"))
    val b = after.select(col("column"), col("distinct_est").as("db"),
      col("theta").as("tb"), col("kll").as("kb"))
    val joined = a.join(b, Seq("column"))
      .withColumn("inter", Theta.intersect(col("ta"), col("tb")))
      .withColumn("jaccard",
        col("inter") / greatest(lit(1.0), col("da") + col("db") - col("inter")))
      .withColumn("new_frac",
        Theta.aNotB(col("tb"), col("ta")) / greatest(lit(1.0), col("db")))
    val deciles = (1 to 9).map(_ / 10.0)
    // scale floor: a (near-)constant column has p50a == p99a, and a bare
    // +eps denominator would amplify one new value's decile movement into
    // an astronomic shift — a false-positive generator on status-code-like
    // columns (self-review finding). Floor the normalizer at 1e-3 of the
    // column's magnitude so flags require genuine decile movement.
    val scale = greatest(
      abs(col("p99a") - col("p50a")),
      greatest(abs(col("p99a")), abs(col("p50a")), lit(1.0)) * lit(1e-3))
    val shift = deciles.map { p =>
      abs(Kll.quantile(col("kb"), p) - Kll.quantile(col("ka"), p))
    }.reduce(greatest(_, _)) / (scale + lit(eps))
    joined.withColumn("quantile_shift",
      when(col("is_numeric") && col("ka").isNotNull && col("kb").isNotNull,
        shift))
      .select("column", "jaccard", "new_frac", "quantile_shift")
  }
}
