package graft

import org.apache.spark.sql.functions._
import graft.functions.{TokenContexts, TokenGrams, TokenNgrams}

/** Native token-gram kernels: bit parity with the HOF/wsTokens
  * formulations they replaced — on hand cases, on whitespace/case edges,
  * and as a corpus sweep over the documents table (the invariant that
  * lets NgramLm swap kernels without touching its arithmetic specs). */
class TokenGramsSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  test("allGrams emits 1/2/3-grams grouped by order, lowercased, empties dropped") {
    val got = TokenGrams.allGrams(
      org.apache.spark.unsafe.types.UTF8String.fromString("  A b\tC  "), 3)
      .toSeq[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString)
    assert(got == Seq("a", "b", "c", "a b", "b c", "a b c"))
    // fewer tokens than the order → that order contributes nothing
    val one = TokenGrams.allGrams(
      org.apache.spark.unsafe.types.UTF8String.fromString("x"), 3)
      .numElements()
    assert(one == 1)
  }

  test("native grams equal the HOF formulation over the documents corpus") {
    // leading-\t/\n rows added on purpose: bare wsTokens emits a leading
    // "" token there (trim strips only spaces) — parity is against the
    // FILTERED form, and these rows make that distinction load-bearing
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .unionByName(Seq((900001L, "\tleading tab text"),
        (900002L, "\n newline  and   runs\t\t x")).toDF("doc_id", "text"))
    val ts = filter(graft.operators.TextOps.wsTokens(col("text")),
      t => length(t) > 0)
    def hofOrder(n: Int) =
      when(size(ts) >= n,
        transform(sequence(lit(0), size(ts) - n),
          i => concat_ws(" ", slice(ts, i + 1, lit(n)))))
        .otherwise(array().cast("array<string>"))
    val mismatches = docs
      .withColumn("native", TokenNgrams(col("text"), 3))
      .withColumn("hof", concat(hofOrder(1), hofOrder(2), hofOrder(3)))
      .filter(not(col("native") === col("hof")))
      .count()
    assert(mismatches == 0, s"$mismatches documents tokenize differently")
  }

  test("contexts carry the two predecessors with nulls at the head; parity with element_at") {
    val rows = Seq((1L, "Alpha beta gamma delta"), (2L, "solo"), (3L, ""),
      (4L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .select(col("id"), explode(TokenContexts(col("text"))).as("t"))
      .select(col("id"), col("t.w"), col("t.w1"), col("t.w2"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getString(3)))
    assert(rows.toSeq == Seq(
      (1L, "alpha", null, null), (1L, "beta", "alpha", null),
      (1L, "gamma", "beta", "alpha"), (1L, "delta", "gamma", "beta"),
      (2L, "solo", null, null)))
  }
}
