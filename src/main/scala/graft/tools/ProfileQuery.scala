package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: time gated queries by name with the bench's consumption
  * (noop full evaluation), N reps after one warm pass each. Accepts a
  * comma-separated name list so a multi-query A/B (e.g. re-measuring a
  * wave-hit block from a scale leg) pays the pinned-heap boot ONCE.
  * SPARK_GRAFT_CPUS sets the core count (default 16; use 32 to match
  * the leg protocol). Usage:
  * runMain graft.tools.ProfileQuery <name[,name...]> [sfDir] [reps].
  * Not part of the gated surface. */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .appName("profile-query").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Conf.applyTuned(spark)
    graft.Fixtures.ensureRulLabels(spark, sfDir)
    // the same health instruments the bench carries, so a ProfileQuery
    // re-measurement is self-attributing: boot block once (bills the
    // pinned-heap pre-touch), a gap sample before every query's reps —
    // a clean-window claim must carry its own clean-window evidence
    val (hl, hm, hb) = graft.Bench.healthProbe()
    System.err.println(f"[pq] health load_avg=$hl%.2f " +
      s"pagetouch_mb_s=${hm.round} jvm_boot_ms=$hb")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val (_, gapMbs, _) = graft.Bench.healthProbe(chunks = 1, chunkMb = 64)
      System.err.println(s"[pq] gap_health $name mbs=${gapMbs.round}")
      val tw = System.nanoTime()
      graft.Bench.evaluate(fn(spark, sfDir)) // warm (+ session build)
      System.err.println(f"[pq] $name warm ${(System.nanoTime() - tw) / 1e9}%.3f s " +
        "(incl. any memoized session build)")
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        graft.Bench.evaluate(fn(spark, sfDir))
        System.err.println(
          f"[pq] $name rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
