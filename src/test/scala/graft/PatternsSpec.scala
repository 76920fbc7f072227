package graft

import org.apache.spark.sql.functions._
import graft.operators.Patterns

/** The generic MATCH_RECOGNIZE-style operator (r10): hand-computed match
  * positions and timestamp mapping, non-overlap semantics, zero-length
  * safety, driver-side pattern validation, and a corpus cross-check
  * against q_event_pattern's hard-wired conversion count. */
class PatternsSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  test("matches map back to event positions and timestamps (hand-computed)") {
    // key 1 symbol sequence over ts 10..60: v c c p v p
    val df = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "click"),
      (1L, 40L, "purchase"), (1L, 50L, "view"), (1L, 60L, "purchase"),
      // key 2: no match (click before any view)
      (2L, 10L, "click"), (2L, 20L, "view"))
      .toDF("user_id", "ts_us", "event_type")
    val got = Patterns.matchRecognize(df, "user_id", "ts_us", "event_type",
        "v[c]*p")
      .orderBy("key", "match_idx")
      .as[(Long, Int, Int, Int, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 0, 0, 3, 10L, 40L, "vccp"), // v c c p spans ts 10..40
      (1L, 1, 4, 5, 50L, 60L, "vp")))  // the second conversion
  }

  test("non-overlapping left-to-right find semantics, like regexp_extract_all") {
    val df = Seq((1L, 1L, "v"), (1L, 2L, "p"), (1L, 3L, "v"), (1L, 4L, "p"))
      .toDF("k", "t", "s")
    val got = Patterns.matchRecognize(df, "k", "t", "s", "vp")
    assert(got.count() == 2)
    // a pattern that COULD overlap: "pvp" in p v p v p matches once at the
    // left (positions 0-2), not twice — find() resumes after the match
    val df2 = Seq((1L, 1L, "p"), (1L, 2L, "v"), (1L, 3L, "p"), (1L, 4L, "v"),
      (1L, 5L, "p")).toDF("k", "t", "s")
    val got2 = Patterns.matchRecognize(df2, "k", "t", "s", "pvp")
      .as[(Long, Int, Int, Int, Long, Long, String)].collect().toSeq
    assert(got2.map(m => (m._3, m._4)) == Seq((0, 2)))
  }

  test("zero-length matches are discarded; bad patterns fail at plan time") {
    val df = Seq((1L, 1L, "v"), (1L, 2L, "p")).toDF("k", "t", "s")
    // x* matches the empty string everywhere — must emit nothing, not loop
    assert(Patterns.matchRecognize(df, "k", "t", "s", "x*").count() == 0)
    intercept[java.util.regex.PatternSyntaxException] {
      Patterns.matchRecognize(df, "k", "t", "s", "v[unclosed")
    }
  }

  test("NULL/empty symbols are excluded: no crash on ts ties, wildcards can't match missing data") {
    // regression (self-review): the old NUL-placeholder design (a) NPE'd
    // in the sort comparator when a null symbol tied on ts with a real
    // one, and (b) let `.` match the placeholder, so missing event_types
    // silently satisfied wildcard positions
    val df = Seq((1L, 100L, null.asInstanceOf[String]), (1L, 100L, "v"),
      (1L, 200L, ""), (1L, 300L, "p")).toDF("k", "t", "s")
    val got = Patterns.matchRecognize(df, "k", "t", "s", "v.p")
    assert(got.count() == 0,
      "wildcard must not match a missing symbol")
    // with the null/empty rows excluded, v follows directly to p
    val got2 = Patterns.matchRecognize(df, "k", "t", "s", "vp")
      .as[(Long, Int, Int, Int, Long, Long, String)].collect().toSeq
    assert(got2.map(m => (m._5, m._6)) == Seq((100L, 300L)))
  }

  test("per-user match count equals q_event_pattern's conversion count on the corpus") {
    val ev = Tables.events(spark, sf).withColumn("ts_us", unix_micros(col("ts")))
    val got = Patterns.matchRecognize(ev, "user_id", "ts_us", "event_type",
        "v[cs]*p")
      .groupBy("key").count()
      .as[(Long, Long)].collect().toMap
    val want = operators.Relational.qEventPattern(spark, sf)
      .select(col("user_id"), col("n_conv").cast("long"))
      .as[(Long, Long)].collect().toMap
      .filter(_._2 > 0) // matchRecognize emits no row for zero matches
    assert(got == want, "generic operator disagrees with q_event_pattern")
    assert(got.nonEmpty)
  }
}
