package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingOps

/** Dev-only probe for the streaming path (not part of the driver contract). */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      d.resolve("events.parquet"))
    println(s"[probe] staged $d")
    val stream = StreamingOps.readEvents(spark, d.toString)
    println("[probe] source built")
    val q = StreamingOps.windowedAgg(stream).writeStream
      .outputMode("complete").format("memory").queryName("stream_win_c")
      .trigger(Trigger.AvailableNow()).start()
    println("[probe] started")
    q.awaitTermination(120000)
    println(s"[probe] terminated=${!q.isActive} rows=${spark.table("stream_win_c").count()}")
    q.stop()
    spark.stop()
    println("[probe] done")
  }
}
