package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (off the gated surface): BPE fit cost at realistic merge
  * scale — the incremental trainer's complexity claim measured, not
  * argued. Prints fit seconds at numMerges ∈ {0, 200, 16384, 32768} over
  * the given corpus; the 0-merge line isolates the distributed
  * aggregation + collect so the driver-loop share is the difference. */
object ProfileBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
    docs.count() // warm
    for (m <- Seq(0, 200, 16384, 32768)) {
      val t0 = System.nanoTime()
      val (model, cov) = graft.ml.Bpe.fit(docs, "text", numMerges = m)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[bpe_probe] numMerges=$m fit=$secs%.3f s " +
        f"learned=${model.merges.length} coverage=$cov%.4f")
    }
    // the corpus above EXHAUSTS its pair diversity early (tiny synthetic
    // vocabulary), so the realistic-merge-scale claim needs a word table
    // that can actually sustain 32k merges: 64k seeded word types over a
    // 26-letter alphabet with Zipf-ish counts, fed straight to the
    // driver merge loop — this isolates driver-loop seconds exactly
    val rnd = new scala.util.Random(7L)
    val wc = Array.tabulate(1 << 16) { i =>
      val len = 3 + rnd.nextInt(12)
      val w = (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      (w, math.max(1L, (100000.0 / (i + 1)).toLong))
    }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toArray
    for (m <- Seq(16384, 32768)) {
      val t0 = System.nanoTime()
      val merges = graft.ml.Bpe.learnMerges(wc, numMerges = m)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[bpe_probe] driver_loop words=${wc.length} numMerges=$m " +
        f"learned=${merges.length} secs=$secs%.3f")
    }
    spark.stop()
  }
}
