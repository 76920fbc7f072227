package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: price the IncrementStore lifecycle at a given SF — the
  * two writes (create pair, append+maintain), the pruned vs full read,
  * and the three maintenance jobs (band erasure, range-scoped
  * compaction, whole-table compaction) — so the store's scale claims
  * carry measured numbers beyond the driver bench's sf0.1 side-line.
  * State-changing steps run once (rep1); reads get med-of-3. Not part
  * of the gated surface (ProfileQuery family). Usage:
  * runMain graft.tools.ProfileStore [sfDir] [workDir]. */
object ProfileStore {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("profile_store").toString)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .appName("profile-store").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Conf.applyTuned(spark)
    val (hl, hm, hb) = graft.Bench.healthProbe()
    System.err.println(f"[ps] health load_avg=$hl%.2f " +
      s"pagetouch_mb_s=${hm.round} jvm_boot_ms=$hb")

    val store = graft.sources.IncrementStore(
      s"$work/verdicts", s"$work/manifest", filesPerIncrement = 8)
    val vdocs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"),
        col("doc_id").as("cluster_id"),
        when(col("doc_id") % 10 === 0, "high_perplexity")
          .otherwise(lit(null)).cast("string").as("curation_reject"))
    val rows = vdocs.count()
    val mid = vdocs.agg(
      percentile_approx(col("doc_id"), lit(0.5), lit(100))).head.getLong(0)
    val hi = vdocs.agg(max(col("doc_id"))).head.getLong(0)
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(f: () => Unit): Double =
      (1 to 3).map(_ => t(f())).sorted.apply(1)

    val w1 = t(store.writeIncrement(vdocs.filter(col("doc_id") < mid)))
    val w2 = t(store.writeIncrement(vdocs.filter(col("doc_id") >= mid)))
    val nFiles = store.manifest(spark).count()
    val rp = med(() => graft.Bench.evaluate(
      store.readRange(spark, Map("doc_id" -> (mid: Any, hi: Any)))))
    val rf = med(() => graft.Bench.evaluate(
      spark.read.parquet(s"$work/verdicts")
        .filter(col("doc_id") >= mid && col("doc_id") <= hi)))
    // erase a 64-key band (the compliance request shape)
    var ds: graft.sources.Layout.DeleteStats = null
    val dT = t { ds = store.deleteRows(spark, "doc_id",
      (0 until 64).map(i => (mid + i): Any)) }
    // bin-pack ONLY day 2's files (the rolling-maintenance shape) …
    val crT = t { store.compactRange(spark,
      Map("doc_id" -> (mid: Any, hi: Any)), targetFileBytes = 256L << 20) }
    val crFiles = store.manifest(spark).count()
    // … then the whole table (the O(table) form, for contrast)
    val cT = t { store.compact(spark, targetFileBytes = 256L << 20) }
    val cFiles = store.manifest(spark).count()
    val total = spark.read.parquet(s"$work/verdicts").count()
    require(total == rows - ds.rowsDeleted,
      s"row accounting broke: $total vs $rows - ${ds.rowsDeleted}")
    System.err.println(
      f"[ps] store rows=$rows day1_write=$w1%.3f s day2_append=$w2%.3f s " +
        f"files=$nFiles read_pruned=$rp%.3f s read_full=$rf%.3f s " +
        f"delete=$dT%.3f s (${ds.rowsDeleted} rows, " +
        f"${ds.filesRewritten}/${ds.filesTotal} files) " +
        f"compact_range=$crT%.3f s (-> $crFiles files) " +
        f"compact_full=$cT%.3f s (-> $cFiles files) " +
        "(writes/maintenance rep1, reads med of 3)")
    spark.stop()
  }
}
