package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, RangeJoin, TimeSeriesOps}

/** Degenerate-input behavior: operators must return empty/identity
  * results, not throw, when a table or group is empty — at pipeline scale
  * an empty partition or filtered-out day is routine, not exceptional. */
class EdgeCaseSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  test("range join with empty points or empty intervals is empty") {
    val iv = RangeJoin.intervals(spark)
    val noPts = Seq.empty[(Long, Long)].toDF("ev_us", "event_id")
    assert(RangeJoin.rangeJoin(noPts, col("ev_us"), iv, 3600000000L).count() == 0)
    val pts = Seq((1704067200000001L, 1L)).toDF("ev_us", "event_id")
    val noIv = iv.filter(lit(false))
    assert(RangeJoin.rangeJoin(pts, col("ev_us"), noIv, 3600000000L).count() == 0)
  }

  test("smallest_k over an empty relation yields no groups; empty array on null-only input") {
    val empty = Seq.empty[(Int, Int)].toDF("g", "n")
      .groupBy("g").agg(graft.functions.SmallestK.smallestK(col("n"), 3).as("t"))
    assert(empty.count() == 0)
    val nulls = Seq((1, None: Option[Int]), (1, None)).toDF("g", "n")
      .groupBy("g").agg(graft.functions.SmallestK.smallestK(col("n"), 3).as("t"))
    assert(nulls.select(size(col("t"))).head().getInt(0) == 0)
  }

  test("vector_avg of an empty/null-only group is null, not NaN") {
    val df = Seq((1, None: Option[Seq[Double]]), (1, None)).toDF("g", "v")
      .groupBy("g").agg(graft.functions.VectorAgg.vectorAvg(col("v")).as("m"))
    assert(df.head().isNullAt(1))
  }

  test("recurrence and holt on a single-row trajectory return init state") {
    val one = Seq((7L, 1L, 100L, 42.5)).toDF("user_id", "event_id", "ts_us", "value")
    val e = TimeSeriesOps.ewma(one, "user_id", Seq("ts_us", "event_id"), "value", 0.1)
    assert(e.select("ewma").head().getDouble(0) == 42.5)
    val h = TimeSeriesOps.holt(one, "user_id", Seq("ts_us", "event_id"), "value", 0.3, 0.2)
    val r = h.select("level", "trend").head()
    assert(r.getDouble(0) == 42.5 && r.getDouble(1) == 0.0)
  }

  test("dedup clusters on a corpus with no near-dup pairs is all-singletons") {
    // distinct single-token texts — no 3-gram overlap, no same-length pairs collide
    val docs = (1 to 30).map(i => (i.toLong, "tok" + ("x" * i), "en", 3 + i))
      .toDF("doc_id", "text", "lang", "n_chars")
    val out = Dedup.dedupClusters(docs, threshold = 0.5)
    assert(out.count() == 30)
    assert(out.filter(col("cluster_id") =!= col("doc_id")).count() == 0)
    assert(out.filter(col("is_canonical") =!= 1).count() == 0)
  }

  test("shingle hashes of empty and sub-n texts collapse to one shingle") {
    val df = Seq("", "one", "one two").toDF("t")
      .select(size(graft.functions.ShingleHashSet(col("t"), 3)).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(1, 1, 1))
  }
}
