package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: print the formatted plan of one gated query by name.
  * Usage: runMain graft.tools.ExplainQuery <name> [sfDir]. Not part of
  * the gated surface. */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .appName("explain-query").master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Conf.applyTuned(spark)
    graft.Fixtures.ensureRulLabels(spark, sfDir)
    graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
