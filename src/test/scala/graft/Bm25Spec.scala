package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** BM25 ranked retrieval: hand-computed scores on a tiny corpus and
  * behavioral sanity on the documents table. */
class Bm25Spec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  test("bm25 matches a hand-computed score and ranks the on-topic doc first") {
    val docs = Seq(
      (1L, "spark engine spark cluster"),     // dl 4, tf(spark)=2
      (2L, "the quick brown fox"),            // dl 4, no query terms
      (3L, "spark sql"),                      // dl 2, tf(spark)=1
      (4L, "cluster of stars")                // dl 3, tf(cluster)=1
    ).toDF("doc_id", "text")
    val k1 = 1.2; val b = 0.75
    val got = TextOps.bm25TopK(docs, "text", Seq("spark", "cluster"), k = 4,
        k1 = k1, b = b)
      .collect().map(r => r.getLong(r.fieldIndex("doc_id")) ->
        (r.getInt(r.fieldIndex("rk")), r.getDouble(r.fieldIndex("score")))).toMap
    // hand computation: N=4, avgdl=(4+4+2+3)/4=3.25
    val n = 4.0; val avgdl = 3.25
    def idf(df: Double) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def w(tf: Double, dl: Double, df: Double) =
      idf(df) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = Map(
      1L -> r6(w(2, 4, 2) + w(1, 4, 2)), // spark df=2 (docs 1,3), cluster df=2 (docs 1,4)
      3L -> r6(w(1, 2, 2)),
      4L -> r6(w(1, 3, 2)))
    assert(got.keySet == Set(1L, 3L, 4L), s"docs with no query term must not appear: $got")
    want.foreach { case (id, s) =>
      assert(math.abs(got(id)._2 - s) < 1e-9, s"doc $id: ${got(id)._2} != $s")
    }
    // the doc matching BOTH terms (twice) outranks everything
    assert(got(1L)._1 == 1)
  }

  test("bm25 over the documents table: bounded output, eager, leaves no blocks") {
    val docs = Tables.documents(spark, sf)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = TextOps.bm25TopK(docs, "text", Seq("the", "data"), k = 10)
    // the operator is EAGER (ml-fit pattern): it caches tf for exactly
    // one corpus tokenize+shuffle, materializes the k-row result, and
    // drops the cache blocking before returning a driver-local relation
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"bm25 left ${leaked.size} persistent RDD(s)")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"),
      s"bm25 result should be a driver-local relation:\n${plan.take(600)}")
    val rows = out.collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    // ranked by score descending, ranks contiguous from 1
    val byRank = rows.sortBy(_.getInt(0))
    assert(byRank.map(_.getInt(0)).toSeq == (1 to rows.length))
    assert(byRank.map(_.getDouble(2)).toSeq.reverse.sorted.reverse ==
           byRank.map(_.getDouble(2)).toSeq)
  }
}
