package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Phase profiler for the IVF ANN path (index build vs probe/re-rank). */
object ProfileIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(s"[profile] $tag: ${(System.nanoTime() - t0) / 1e9}s"); r
    }
    val emb = Tables.embeddings(spark, sfDir)
    println(s"[profile] corpus rows: ${emb.count()}")
    time("kmeans fit (nlist=8, iters=1)") {
      graft.ml.KMeans.fitWithCentroids(emb, 8, iters = 1)
    }
    time("full annIvf (cold)") {
      graft.operators.Similarity.annIvf(emb, emb.filter(col("vec_id") < 10),
        nlist = 8, nprobe = 3, k = 5).count()
    }
    time("full annIvf (warm)") {
      graft.operators.Similarity.annIvf(emb, emb.filter(col("vec_id") < 10),
        nlist = 8, nprobe = 3, k = 5).count()
    }
    spark.stop()
  }
}
