package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale amplifier for the driver testdata (TESTDATA.md):
  * writes an N× copy of a source scale factor by replicating every table
  * with per-copy key offsets, preserving the per-key data distribution
  * (each copy is the original key population under a shifted id space —
  * the TPC-H scaling model, where sf growth adds customers/orders/users
  * rather than lengthening histories).
  *
  * Two semantic guards keep the amplified corpus honest for the dedup /
  * similarity operators:
  *  - `documents.text` gets a per-copy suffix on EVERY token (copy 0 is
  *    verbatim), so intra-copy duplicate structure is preserved exactly
  *    while cross-copy near-duplicate similarity is destroyed — candidate
  *    pair counts grow linearly with scale, as they would in a real crawl,
  *    not quadratically as verbatim copies would force.
  *  - key offsets are per-key-family strides (computed from each family's
  *    max), so foreign keys (orders.o_custkey → customer, lineitem.l_* →
  *    orders/part/supplier) stay consistent within each copy.
  *
  * Usage: runMain graft.tools.GenScale [srcDir dstDir copies]
  * Dev tool off the gated surface — the scale-probe artifact
  * (SCALING_r{N}.json) is produced by running graft.Bench against the
  * output directory.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // events.ts is TIMESTAMP(NANOS): read as raw long nanos and write the
    // long back — Tables.events handles both encodings identically
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")

    /** Power-of-ten stride above this key family's max — offsets stay
      * human-readable (copy i of key k = i·10^d + k). */
    def stride(t: String, c: String): Long = {
      val mx = read(t).agg(max(col(c))).head().getLong(0)
      var s = 1L
      while (s <= mx) s *= 10
      s
    }
    val custS = stride("customer", "c_custkey")
    val suppS = stride("supplier", "s_suppkey")
    val partS = stride("part", "p_partkey")
    val ordS = stride("orders", "o_orderkey")
    val evS = stride("events", "event_id")
    val userS = stride("events", "user_id")
    val docS = stride("documents", "doc_id")
    val vecS = stride("embeddings", "vec_id")

    def amplify(table: String, offsets: Map[String, Long],
                perCopy: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      val base = read(table)
      val out = (0 until copies).map { i =>
        val shifted = offsets.foldLeft(base) { case (df, (c, s)) =>
          df.withColumn(c, col(c) + lit(s * i))
        }
        perCopy(shifted, i)
      }.reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$dst/$table.parquet")
      println(s"[genscale] $table ×$copies → $dst/$table.parquet")
    }

    // fixed dims: region/nation do not scale with sf (TPC-H convention)
    for (t <- Seq("region", "nation")) {
      read(t).write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[genscale] $t (fixed dim) → $dst/$t.parquet")
    }
    amplify("customer", Map("c_custkey" -> custS))
    amplify("supplier", Map("s_suppkey" -> suppS))
    amplify("part", Map("p_partkey" -> partS))
    amplify("orders", Map("o_orderkey" -> ordS, "o_custkey" -> custS))
    amplify("lineitem", Map("l_orderkey" -> ordS, "l_partkey" -> partS,
      "l_suppkey" -> suppS))
    amplify("events", Map("event_id" -> evS, "user_id" -> userS))
    amplify("embeddings", Map("vec_id" -> vecS))
    amplify("documents", Map("doc_id" -> docS), (df, i) =>
      if (i == 0) df
      else df
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1_c$i"))
        .withColumn("n_chars", length(col("text")).cast("long")))
    spark.stop()
  }
}
