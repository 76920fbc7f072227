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

    // ---- the grouped metadata layer (r19): same lifecycle, then the
    // multi-increment point — after N accreted increments the flat
    // manifest's gate state is O(files) collected rows while the grouped
    // index is O(increments), and the append path's metadata term never
    // collects the whole manifest. Increments are deliberately tiny so
    // the walls isolate the METADATA term, not the data write.
    val nInc = sys.env.get("SPARK_GRAFT_STORE_INCS").map(_.toInt).getOrElse(120)
    def accrete(st: graft.sources.IncrementStore,
                tag: String): (Double, Double, Double, Long) = {
      var lastW = 0.0
      (0 until nInc).foreach { i =>
        val inc = spark.range(i * 1000L, i * 1000L + 100L)
          .select(col("id").as("doc_id"),
            concat(lit(s"$tag text "), col("id")).as("text"))
        val w = t(st.writeIncrement(inc))
        if (i == nInc - 1) lastW = w
      }
      val gate = med(() => { st.readAll(spark).count(); () })
      val band = med(() => graft.Bench.evaluate(st.readRange(spark,
        Map("doc_id" -> ((nInc / 2 * 1000L): Any,
          (nInc / 2 * 1000L + 99L): Any)))))
      val files = st.manifest(spark).count()
      (lastW, gate, band, files)
    }
    val fStore = graft.sources.IncrementStore(
      s"$work/multi_flat/t", s"$work/multi_flat/m", filesPerIncrement = 2)
    val gStore = graft.sources.IncrementStore(
      s"$work/multi_grp/t", s"$work/multi_grp/m", filesPerIncrement = 2,
      grouped = true)
    val (fLastW, fGate, fBand, fFiles) = accrete(fStore, "f")
    val (gLastW, gGate, gBand, gFiles) = accrete(gStore, "g")
    require(fFiles == gFiles, s"file counts diverged: $fFiles vs $gFiles")
    // parity: the band read is row-identical across backends
    val bandIv = Map("doc_id" -> ((nInc / 2 * 1000L): Any,
      (nInc / 2 * 1000L + 99L): Any))
    val fRows = fStore.readRange(spark, bandIv)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val gRows = gStore.readRange(spark, bandIv)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    require(fRows == gRows && fRows.size == 100,
      s"grouped band read diverged: ${gRows.size} vs ${fRows.size}")
    val flatBytes = org.apache.spark.util.SizeEstimator.estimate(
      fStore.manifest(spark).collect())
    val ixBytes = org.apache.spark.util.SizeEstimator.estimate(
      gStore.groupedManifest.index(spark).collect())
    val ixRows = gStore.groupedManifest.index(spark).count()
    // one grouped maintenance job on the accreted table: compactRange
    // the first half of the increments (their groups retire into one)
    val gcrT2 = t { gStore.compactRange(spark,
      Map("doc_id" -> (0L: Any, (nInc / 2 * 1000L - 1L): Any)),
      targetFileBytes = 256L << 20) }
    val ixRowsAfter = gStore.groupedManifest.index(spark).count()
    System.err.println(
      f"[ps] multi-increment ($nInc increments, $fFiles files): " +
        f"flat last_append=$fLastW%.3f s gate_read=$fGate%.3f s " +
        f"band_read=$fBand%.3f s driver_bytes=$flatBytes | " +
        f"grouped last_append=$gLastW%.3f s gate_read=$gGate%.3f s " +
        f"band_read=$gBand%.3f s index_rows=$ixRows " +
        f"index_bytes=$ixBytes compact_range_half=$gcrT2%.3f s " +
        f"(-> $ixRowsAfter index rows; band reads row-identical)")
    spark.stop()
  }
}
