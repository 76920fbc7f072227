package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Tensorize, TimeSeriesOps}

/** Stage profiler for ts_rul_pipeline: which stage owns the executor task
  * time the r8 forensics surfaced (13.7 s of task work for a 15k-window
  * corpus — 24× every other gated query)? Wall AND per-stage task time via
  * the same listener the bench uses. */
object ProfileRul {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val l = new graft.Forensics.TaskTimeListener
    spark.sparkContext.addSparkListener(l)
    spark.range(1000000).selectExpr("sum(id)").collect() // warm
    def time[A](tag: String)(f: => A): A = {
      graft.Forensics.drainListenerBus(spark, l)
      val s0 = l.snapshot()
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      graft.Forensics.drainListenerBus(spark, l)
      println(f"[profile] $tag: $dt%.3f s ${l.snapshot() - s0}"); r
    }
    val events = Tables.events(spark, sfDir)
      .withColumn("ts_us", unix_micros(col("ts")))
    println(s"[profile] events: ${events.count()}")
    val tensors = Tensorize.windowTensorize(events, "user_id",
      Seq("ts_us", "event_id"), "value", t = 20, skip = 5, rulCap = 130)
    time("tensorize count")(tensors.count())
    val split = TimeSeriesOps.ratioSplit(tensors, "user_id", Seq("widx"), 0.8)
      .withColumn("label", col("rul").cast("double"))
    time("split count")(split.count())
    val cached = split.cache()
    time("cache materialize")(cached.count())
    val w = time("fitRidge on cached train fold") {
      graft.ml.LinearModel.fitRidge(cached.filter(col("fold") === "train"),
        "features", "label", lambda = 1e-3)
    }
    time("eval pass (pred + mse)") {
      cached.withColumn("pred", graft.ml.LinearModel.predict(col("features"), w))
        .groupBy(col("fold"))
        .agg(round(avg(pow(col("pred") - col("label"), 2)), 4).as("mse"),
             count(lit(1)).as("n")).collect()
    }
    cached.unpersist(blocking = true)
    // uncached fit: what the pipeline pays when the cache is cold
    time("fitRidge UNCACHED") {
      graft.ml.LinearModel.fitRidge(split.filter(col("fold") === "train"),
        "features", "label", lambda = 1e-3)
    }
    time("full rulPipeline warm 1")(graft.ml.LinearModel.rulPipeline(spark, sfDir).count())
    time("full rulPipeline warm 2")(graft.ml.LinearModel.rulPipeline(spark, sfDir).count())
    spark.stop()
  }
}
