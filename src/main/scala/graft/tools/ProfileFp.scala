package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: isolate where text_fingerprint's Verify-path time goes.
  * Times (a) the query as shipped, (b) the fps projection alone without
  * the n_fp/fp_min/fp_max derived columns, each fully materialized via
  * a parquet write. Not part of the gated surface. */
object ProfileFp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .appName("profile-fp").master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      def time(tag: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        System.err.println(f"[fp] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      val docs = graft.Tables.documents(spark, sfDir)
      time("full query (write)") {
        graft.operators.TextOps.fingerprint(docs, "text")
          .write.mode("overwrite").parquet("/tmp/fp_probe_full")
      }
      time("full query warm (write)") {
        graft.operators.TextOps.fingerprint(docs, "text")
          .write.mode("overwrite").parquet("/tmp/fp_probe_full")
      }
      time("fps only (write)") {
        import org.apache.spark.sql.functions._
        val g = graft.operators.Dedup.shingles(col("text"), 3)
        val hashes = transform(g, x => xxhash64(x))
        docs.select(col("doc_id"), hashes.as("h"))
          .write.mode("overwrite").parquet("/tmp/fp_probe_hashes")
      }
      graft.operators.TextOps.fingerprint(docs, "text").explain("formatted")
    } finally spark.stop()
  }
}
