package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the driver's synthetic testdata (TESTDATA.md):
  * replicates every table of a source scale factor `factor`× into a new
  * directory with the same schemas, so the bench can be run at sf1 from
  * the committed sf0.1 without regenerating from scratch (the original
  * generator is driver-side; /root/testdata is read-only).
  *
  * Scaling is ENTITY-wise, not row-wise — each copy i gets disjoint key
  * ranges (offset = i × per-table power-of-10 base), so:
  *   - `events`: 10× user_ids (trajectories), SAME per-trajectory length
  *     — the realistic growth axis for the time-series family (more
  *     engines/users, not longer histories);
  *   - `orders`/`lineitem`: FK consistency preserved per copy (copy i's
  *     lineitems reference copy i's orders/parts/suppliers);
  *   - dims `region`/`nation` stay fixed (as TPC-H scaling does).
  *
  * Content decorrelation — the part that keeps the probe honest:
  *   - `documents.text` goes through a per-copy alphabet-rotation cipher
  *     (codegen'd `translate`, a bijection on [a-z],[A-Z],[0-9]): token
  *     equality, token lengths, whitespace and punctuation are all
  *     preserved WITHIN a copy, so the duplicate-rate and near-dup
  *     cluster-size distribution stay constant as the corpus grows —
  *     while cross-copy shingle/token hashes are uncorrelated. Naive
  *     verbatim replication would instead give every doc 9 exact twins:
  *     quadratic candidate-pair blowup in the banded joins that measures
  *     a pathology, not scale.
  *   - `embeddings.embedding` is circularly rotated by (i·7 mod dim)
  *     positions — an orthogonal transform, so norms, per-component
  *     distribution and intra-copy cluster geometry are exactly
  *     preserved; cross-copy cosines decorrelate.
  *   - numeric fact columns are kept verbatim (value distributions are
  *     what the aggregates grind through; they should not drift).
  *
  * Usage: GenScale <srcSfDir> <dstDir> [factor=10]
  * (run via `sbt "runMain graft.tools.GenScale /root/testdata/sf0.1
  * /tmp/sf1 10"` — dev tool, off the gated surface like ExplainQuery.)
  */
object GenScale {

  /** Smallest power of 10 strictly greater than the current max key —
    * clean disjoint id ranges per copy, readable in plan dumps. */
  private def offsetBase(df: DataFrame, key: String): Long = {
    val mx = df.agg(max(col(key))).head().getLong(0)
    var b = 1L
    while (b <= mx) b *= 10
    b
  }

  /** Per-copy substitution cipher: rotate a-z, A-Z, 0-9 each by `i`
    * within their own class. i=0 is the identity. */
  private def cipher(c: org.apache.spark.sql.Column, i: Int): org.apache.spark.sql.Column = {
    def rot(s: String, k: Int) = s.drop(k % s.length) + s.take(k % s.length)
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val digit = "0123456789"
    translate(c, lower + upper + digit,
      rot(lower, i) + rot(upper, i) + rot(digit, i))
  }

  /** One scaled copy per table; copy 0 is bit-identical to the source. */
  def scaled(spark: SparkSession, srcDir: String, factor: Int): Map[String, DataFrame] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    def t(n: String) = spark.read.parquet(s"$srcDir/$n.parquet")

    // events.ts passes through untouched in whatever physical form the
    // source uses (long ns under the legacy conf, or untagged-µs NTZ since
    // the r9 testdata generation) — Tables.events normalizes any of them
    // to a µs timestamp on read.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = t("events")

    val custB = offsetBase(t("customer"), "c_custkey")
    val suppB = offsetBase(t("supplier"), "s_suppkey")
    val partB = offsetBase(t("part"), "p_partkey")
    val ordB  = offsetBase(t("orders"), "o_orderkey")
    val evB   = offsetBase(events, "event_id")
    val userB = offsetBase(events, "user_id")
    val docB  = offsetBase(t("documents"), "doc_id")
    val vecB  = offsetBase(t("embeddings"), "vec_id")
    val dim   = t("embeddings")
      .select(size(col("embedding"))).head().getInt(0)

    def copies(f: Int => DataFrame): DataFrame =
      (0 until factor).map(f).reduce(_ unionAll _)

    Map(
      "region" -> t("region"),
      "nation" -> t("nation"),
      "customer" -> copies(i => t("customer")
        .withColumn("c_custkey", col("c_custkey") + lit(i * custB))),
      "supplier" -> copies(i => t("supplier")
        .withColumn("s_suppkey", col("s_suppkey") + lit(i * suppB))),
      "part" -> copies(i => t("part")
        .withColumn("p_partkey", col("p_partkey") + lit(i * partB))),
      "orders" -> copies(i => t("orders")
        .withColumn("o_orderkey", col("o_orderkey") + lit(i * ordB))
        .withColumn("o_custkey", col("o_custkey") + lit(i * custB))),
      "lineitem" -> copies(i => t("lineitem")
        .withColumn("l_orderkey", col("l_orderkey") + lit(i * ordB))
        .withColumn("l_partkey", col("l_partkey") + lit(i * partB))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * suppB))),
      "events" -> copies(i => events
        .withColumn("event_id", col("event_id") + lit(i * evB))
        .withColumn("user_id", col("user_id") + lit(i * userB))),
      "documents" -> copies(i => t("documents")
        .withColumn("doc_id", col("doc_id") + lit(i * docB))
        .withColumn("text", cipher(col("text"), i))),
      "embeddings" -> copies { i =>
        val r = (i * 7) % dim
        val rotated =
          if (r == 0) col("embedding")
          else concat(slice(col("embedding"), r + 1, dim - r),
            slice(col("embedding"), 1, r))
        t("embeddings")
          .withColumn("vec_id", col("vec_id") + lit(i * vecB))
          .withColumn("embedding", rotated)
      })
  }

  def generate(spark: SparkSession, srcDir: String, dstDir: String, factor: Int): Unit =
    scaled(spark, srcDir, factor).foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dstDir/$name.parquet")
      System.err.println(s"[genscale] wrote $name")
    }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft-sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .appName("graft-genscale").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    try generate(spark, src, dst, factor)
    finally spark.stop()
  }
}
