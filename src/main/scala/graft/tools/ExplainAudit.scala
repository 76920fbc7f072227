package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted plans for gated queries so scan pushdown,
  * join strategies, and aggregate modes can be audited.
  *
  * Usage: runMain graft.tools.ExplainAudit [sfDir] [keys|all] [outDir] [suffix] [final]
  *  - no outDir: plans print to stdout (the pre-r20 behavior)
  *  - outDir given: one `<outDir>/<query><suffix>.txt` per key (the
  *    optimization-round before/after artifact — e.g. outDir=plans/r20,
  *    suffix=_before), still echoing a one-line summary per key.
  *  - 5th arg `final` (r21): EXECUTE each query first (noop sink, the
  *    bench's consumption) and dump the post-execution adaptive plan —
  *    the only way to show AQE's runtime decisions (SMJ→SHJ local-map
  *    rewrite, coalesced AQEShuffleRead), which a pre-execution explain
  *    hides behind `isFinalPlan=false`.
  * Session conf mirrors the bench (applyTuned: AQE + runtime bloom
  * filters) so the audited plans are the ones the bench actually runs. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val keys =
      if (args.length > 1 && args(1) != "all") args(1).split(",").toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val outDir = if (args.length > 2) Some(args(2)) else None
    val suffix = if (args.length > 3) args(3) else ""
    val finalMode = args.length > 4 && args(4) == "final"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Conf.applyTuned(spark)
    graft.Fixtures.ensureRulLabels(spark, sfDir)
    outDir.foreach(d => new java.io.File(d).mkdirs())
    keys.foreach { k =>
      val plan =
        try {
          val df = graft.SparkEntry.queries(k)(spark, sfDir)
          if (finalMode) {
            // execute THIS QueryExecution's own plan (a noop write would
            // wrap it in a fresh QueryExecution and leave this one
            // unfinalized — isFinalPlan=false): running the plan RDD
            // drives AQE to its final shape, then the same object prints
            // the runtime-decided plan
            val qe = df.queryExecution
            qe.executedPlan.execute().foreach(_ => ())
            qe.executedPlan.toString
          } else df.queryExecution
            .explainString(org.apache.spark.sql.execution.FormattedMode)
        }
        catch { case scala.util.control.NonFatal(e) => s"EXPLAIN FAILED: $e" }
      outDir match {
        case Some(d) =>
          val f = new java.io.PrintWriter(s"$d/$k$suffix.txt")
          try f.println(plan) finally f.close()
          val nEx = "Exchange".r.findAllIn(plan).length
          println(s"[explain] $k -> $d/$k$suffix.txt (exchange_mentions=$nEx)")
        case None =>
          println(s"\n########## $k ##########")
          println(plan)
      }
    }
    spark.stop()
  }
}
