package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Deflate compression ratio: the spec pins the SIGNAL — ordering and
  * bounds — never exact ratios (deflate output length is a zlib-build
  * property; asserting bytes would break on a JDK upgrade for no real
  * defect). Plus null/empty contracts, SQL surface, interpreted==codegen,
  * and the curation ordering on the documents table. */
class CompressRatioSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  test("repetitive text compresses far below natural text, random bytes stay near 1") {
    val rnd = new scala.util.Random(3L)
    val repetitive = "lorem ipsum " * 400
    val natural = ("the quick brown fox jumps over the lazy dog and then " +
      "writes a much longer sentence about compression behavior in text " +
      "curation pipelines with varied words everywhere ") * 12
    val random = (0 until 4800).map(_ => (rnd.nextInt(94) + 33).toChar).mkString
    val out = TextOps.compressionRatio(
      Seq((1L, repetitive), (2L, natural), (3L, random)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) < 0.05, s"repetitive ratio ${out(1L)} not tiny")
    assert(out(2L) > out(1L) * 3 && out(2L) < 0.6,
      s"natural ratio ${out(2L)} out of band")
    assert(out(3L) > 0.7, s"random ratio ${out(3L)} should be near 1")
    // all ratios positive and bounded by deflate's worst-case overhead
    out.values.foreach(v => assert(v > 0 && v < 1.1))
  }

  test("the LZ77 window sees what character entropy cannot") {
    // same character histogram, opposite repetition structure
    val cycle = "abcdefghij" * 300
    val shuffled = new scala.util.Random(9L)
      .shuffle(cycle.toList).mkString
    val df = TextOps.compressionRatio(
      Seq((1L, cycle), (2L, shuffled)).toDF("doc_id", "text"))
      .withColumn("ent", graft.functions.CharEntropy(col("text")))
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    // entropy identical (same histogram); compression ratio wildly apart
    assert(math.abs(df(1L)._2 - df(2L)._2) < 1e-9)
    assert(df(1L)._1 < df(2L)._1 / 5,
      s"cycle ${df(1L)._1} vs shuffled ${df(2L)._1}")
  }

  test("null/empty yield null; SQL surface and interpreted eval agree with codegen") {
    val out = TextOps.compressionRatio(
      Seq((1L, "hello hello hello"), (2L, ""), (3L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(out(1L).isDefined && out(2L).isEmpty && out(3L).isEmpty)
    // SQL registration (the shared test session has no extensions; use
    // the same registry path GraftExtensions injects through)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_compress_ratio",
      exprs => graft.functions.CompressRatio(exprs(0)), "built-in")
    Seq(("x y z x y z x y z")).toDF("text").createOrReplaceTempView("cr_t")
    val viaSql = spark.sql("SELECT graft_compress_ratio(text) FROM cr_t")
      .head.getDouble(0)
    assert(viaSql > 0 && viaSql < 1.1)
    // interpreted path (expression eval outside codegen) matches
    val interp = graft.functions.CompressRatio
      .ratioOrNull(org.apache.spark.unsafe.types.UTF8String.fromString("x y z x y z x y z"))
    assert(math.abs(interp - viaSql) < 1e-12)
  }

  test("curation ordering on the documents table: duplicated-paragraph docs rank low") {
    val docs = Tables.documents(spark, sf)
    val scored = TextOps.compressionRatio(docs)
      .select(col("doc_id"), col("compress_ratio"))
    // every non-empty doc scores in (0, 1.1); a doc made of its own text
    // repeated 10x must compress clearly better than the original
    val row = docs.filter(length(col("text")) > 100).select("text").head
    val t = row.getString(0)
    val pair = TextOps.compressionRatio(
      Seq((1L, t), (2L, Seq.fill(10)(t).mkString(" "))).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(pair(2L) < pair(1L) * 0.6,
      s"10x-repeated doc ${pair(2L)} vs original ${pair(1L)}")
    // the (0, 1.1) band is asserted only for docs long enough for the
    // signal to mean anything — deflate's fixed overhead puts SHORT
    // strings well above 1 by design (documented caveat, pinned below)
    assert(scored.join(docs.select(col("doc_id"), length(col("text")).as("_n")),
        Seq("doc_id"))
      .filter(col("_n") >= 200)
      .filter(col("compress_ratio").isNull ||
        col("compress_ratio") <= 0 || col("compress_ratio") >= 1.1).count() == 0)
    // the short-document caveat is real and stays documented: a tiny
    // string ratios far above 1 purely from deflate framing overhead
    val tiny = graft.functions.CompressRatio.ratioOrNull(
      org.apache.spark.unsafe.types.UTF8String.fromString("hi"))
    assert(tiny > 1.5, s"2-byte ratio $tiny should be dominated by overhead")
  }
}
