package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: time one gated query by name with the bench's consumption
  * (noop full evaluation), N reps after one warm pass. Usage:
  * runMain graft.tools.ProfileQuery <name> [sfDir] [reps]. Not part of
  * the gated surface. */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .appName("profile-query").master("local[16]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Conf.applyTuned(spark)
    graft.Fixtures.ensureRulLabels(spark, sfDir)
    val fn = graft.SparkEntry.queries(name)
    graft.Bench.evaluate(fn(spark, sfDir)) // warm
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      graft.Bench.evaluate(fn(spark, sfDir))
      System.err.println(
        f"[pq] $name rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
