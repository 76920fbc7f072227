package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted plans for representative queries so scan
  * pushdown, join strategies, and aggregate modes can be audited. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val keys = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q1_agg", "q3_join", "q5_multijoin", "ts_sliding_window",
        "ann_topk", "dedup_minhash", "q_range_join", "q_funnel",
        "q_top_words", "q_window_dedup")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      println(s"\n########## $k ##########")
      println(graft.SparkEntry.queries(k)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
