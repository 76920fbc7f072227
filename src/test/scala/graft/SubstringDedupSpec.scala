package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Substring-span dedup: planted shared passages must come back as
  * exactly the planted token ranges, unique text must never be flagged,
  * and the span algebra (overlap merge, adjacency, multiple disjoint
  * spans per doc) must match a driver-side reference fold. */
class SubstringDedupSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  private def uniq(tag: String, n: Int): String =
    (0 until n).map(i => s"${tag}w$i").mkString(" ")
  private val boiler = (0 until 30).map(i => s"boiler$i").mkString(" ")

  private def spansOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[(Int, Int)]] =
    df.collect().map { r =>
      r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(s => (s.getInt(0), s.getInt(1)))
    }.toMap

  test("a planted shared passage is recovered as exactly its token range") {
    // doc 1: 40 unique + 30 boiler + 40 unique; doc 2: different unique
    // text around the same boiler; doc 3: fully unique
    val docs = Seq(
      (1L, s"${uniq("a", 40)} $boiler ${uniq("b", 40)}"),
      (2L, s"${uniq("c", 25)} $boiler ${uniq("d", 10)}"),
      (3L, uniq("e", 90))
    ).toDF("doc_id", "text")
    val n = 10
    val got = spansOf(Dedup.duplicatedSpans(docs, "doc_id", "text", n = n))
    // doc 3 clean; docs 1-2 flag exactly the boiler block: windows
    // [40, 70) of doc 1 contain boiler tokens only at positions 40..69,
    // and every length-10 window fully inside is shared -> merged span
    // [40, 70)
    assert(!got.contains(3L), s"unique doc flagged: $got")
    assert(got(1L) == Seq((40, 70)), s"doc 1: ${got.get(1L)}")
    assert(got(2L) == Seq((25, 55)), s"doc 2: ${got.get(2L)}")
  }

  test("two disjoint shared passages yield two spans; within-doc repetition alone does not flag") {
    val blockA = (0 until 15).map(i => s"hdrA$i").mkString(" ")
    val blockB = (0 until 15).map(i => s"ftrB$i").mkString(" ")
    val docs = Seq(
      (1L, s"$blockA ${uniq("x", 30)} $blockB"),
      (2L, s"$blockB ${uniq("y", 30)} $blockA"),
      // doc 3 repeats ITS OWN private block twice — cross-doc df stays 1
      (3L, s"${uniq("z", 15)} ${uniq("z", 15)}")
    ).toDF("doc_id", "text")
    val got = spansOf(Dedup.duplicatedSpans(docs, "doc_id", "text", n = 10))
    assert(got(1L) == Seq((0, 15), (45, 60)), s"doc 1: ${got.get(1L)}")
    assert(got(2L) == Seq((0, 15), (45, 60)), s"doc 2: ${got.get(2L)}")
    assert(!got.contains(3L),
      "within-doc repetition must not count toward cross-doc df")
  }

  test("corpus run: spans only where exact duplicate docs exist; short docs safe") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val got = Dedup.duplicatedSpans(docs, "doc_id", "text", n = 15)
    // exact duplicate docs (the corpus has them by construction) must be
    // fully covered by one span each; verify a known exact-dup pair
    val dupPair = Dedup.exactKeepFirst(docs, "text")
      .filter(col("is_dup") === 1).limit(1).collect()
    if (dupPair.nonEmpty) {
      val id = dupPair.head.getLong(0)
      val nToks = docs.filter(col("doc_id") === id)
        .select(size(graft.operators.TextOps.wsTokens(col("text"))))
        .head.getInt(0)
      if (nToks >= 15) {
        val spans = spansOf(got.filter(col("doc_id") === id))(id)
        assert(spans == Seq((0, nToks)),
          s"an exact dup doc must be one full-coverage span, got $spans")
      }
    }
    // a doc shorter than n tokens never crashes the gram generator
    val tiny = Seq((1L, "just three words"), (2L, "just three words"))
      .toDF("doc_id", "text")
    assert(Dedup.duplicatedSpans(tiny, "doc_id", "text", n = 10).count() == 0)
  }

  test("cutSpans removes exactly the flagged tokens; untouched docs pass through") {
    val docs = Seq(
      (1L, s"${uniq("a", 40)} $boiler ${uniq("b", 40)}"),
      (2L, s"${uniq("c", 25)} $boiler ${uniq("d", 10)}"),
      (3L, uniq("e", 90))
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(docs, "doc_id", "text", n = 10)
    val cut = Dedup.cutSpans(docs, spans, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    // the boiler block is gone, the unique halves survive in order
    assert(cut(1L)._1 == s"${uniq("a", 40)} ${uniq("b", 40)}")
    assert(cut(1L)._2 == math.BigDecimal(80.0 / 110).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(cut(2L)._1 == s"${uniq("c", 25)} ${uniq("d", 10)}")
    // no spans -> text intact (token-joined), ratio exactly 1
    assert(cut(3L)._1 == uniq("e", 90) && cut(3L)._2 == 1.0)
  }

  test("guardrails: n and minDf bounds; reserved id-column names refused") {
    val d = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.duplicatedSpans(d, "doc_id", "text", n = 1)
    }
    intercept[IllegalArgumentException] {
      Dedup.duplicatedSpans(d, "doc_id", "text", minDf = 1)
    }
    // an idCol named like an internal working column would hit an
    // ambiguous-reference AnalysisException mid-plan — refuse up front
    intercept[IllegalArgumentException] {
      Dedup.duplicatedSpans(d.withColumnRenamed("doc_id", "h"), "h", "text")
    }
  }
}
