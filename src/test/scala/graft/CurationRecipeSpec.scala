package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup}

/** The end-to-end curation recipe: one planted reject per stage, each
  * recovered under its own first-failing label, keepers carrying the
  * text a training run should actually ingest (post-cut), and the
  * per-stage tally recovered from ONE aggregation over the result. */
class CurationRecipeSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  private val fox = "the quick brown fox jumps over the lazy dog"
  private val hen = "a small red hen walks near the old stone wall"
  private val boiler = (0 until 30).map(i => s"boil$i").mkString(" ")

  test("curateCorpus: every stage rejects its planted doc, keepers survive with post-cut text, counts from one aggregation") {
    import graft.ml.{Bpe, NgramLm, Pca}
    val train = Seq((1L, s"$fox " * 20 + s"$hen " * 20)).toDF("doc_id", "text")
    val lm = NgramLm.fit(train, "text")
    val (bpe, _) = Bpe.fit(train, "text", numMerges = 50)

    val hen3 = s"$hen $hen $hen"
    val docs = Seq(
      (1L, fox),                            // keeper
      (2L, fox),                            // exact_dup of 1
      (3L, hen3),                           // keeper, near-dup canonical
      (4L, s"$hen3 a"),                     // near_dup of 3 (Jaccard = 1:
                                            // the appended token's only new
                                            // 3-shingle is already cyclic)
      (5L, s"$fox $fox $fox $fox $fox $fox $boiler"), // keeper after cut
      (6L, s"the quick brown fox $boiler"), // boilerplate_gutted (4/34 kept)
      (7L, "zzq xkw vvp mmt ssr qqa wwb eec rrd ttf"), // high_perplexity
      (8L, "the the the the the the the the the the " * 30), // low_compress
      (9L, "the quick"),                    // token_budget
      (10L, ""),                            // no_tokens (empty)
      (11L, null.asInstanceOf[String]),     // no_tokens (null)
      (12L, "a small red hen walks near the lazy dog") // embedding_outlier
    ).toDF("doc_id", "text")

    // embedding screen: model fit on 4-D data spanning dims 1-2 only;
    // doc 12's embedding points squarely off-subspace, docs 3 and 5 lie
    // in-span, doc 1 has NO embedding row (pass-unscreened path)
    val rnd = new scala.util.Random(31L)
    val fitRows = (100 until 160).map { i =>
      (i.toLong, Array(rnd.nextGaussian() * 5, rnd.nextGaussian() * 2, 0.0, 0.0))
    }.toDF("id", "emb")
    val model = Pca.fit(fitRows, "emb", k = 2)
    val screen = Seq(
      (3L, Array(1.0, 1.0, 0.0, 0.0)),
      (5L, Array(-2.0, 0.5, 0.0, 0.0)),
      (12L, Array(0.0, 0.0, 5.0, 0.0))
    ).toDF("id", "emb")

    val (curated, handle) = Curation.curateCorpus(docs, "doc_id", "text",
      lm, maxPpl = 50.0, bpe, minTokens = 5, maxTokens = 10000,
      minCompressRatio = 0.12, maxCompressRatio = 1.5,
      nearThreshold = 0.8, spanN = 10, minKeptRatio = 0.3,
      embedScreen = Some(Curation.EmbedScreen(screen, "id", "emb", model,
        maxRecErr = 1.0)))
    try {
      val rows = curated.collect()
      assert(rows.length == 12, s"one row per input doc: ${rows.length}")
      val reason = rows.map(r => r.getLong(0) -> Option(r.getString(2))).toMap
      assert(reason(1L).isEmpty && reason(3L).isEmpty && reason(5L).isEmpty,
        s"keepers flagged: ${reason.filter(_._2.nonEmpty)}")
      assert(reason(2L).contains("exact_dup"), reason(2L).toString)
      assert(reason(4L).contains("near_dup"), reason(4L).toString)
      assert(reason(6L).contains("boilerplate_gutted"), reason(6L).toString)
      assert(reason(7L).contains("high_perplexity"), reason(7L).toString)
      assert(reason(8L).contains("low_compress_ratio"), reason(8L).toString)
      assert(reason(9L).contains("token_budget"), reason(9L).toString)
      assert(reason(10L).contains("no_tokens") &&
        reason(11L).contains("no_tokens"), s"${reason(10L)} / ${reason(11L)}")
      assert(reason(12L).contains("embedding_outlier"), reason(12L).toString)

      // keepers carry the text a training run should see: doc 5's
      // boilerplate block is CUT (token-joined), docs 1 and 3 intact
      val text = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(text(5L) == (s"$fox " * 6).trim, s"doc 5 text: ${text(5L)}")
      assert(text(1L) == fox && text(3L) == hen3)
      // the gutted doc's row carries the post-cut evidence (4 tokens)
      assert(text(6L) == "the quick brown fox", s"doc 6 text: ${text(6L)}")

      // per-stage tally: ONE aggregation over the annotated result
      val counts = Curation.rejectCounts(curated).collect()
        .map(r => Option(r.getString(0)).getOrElse("KEEP") -> r.getLong(1))
        .toMap
      assert(counts == Map("KEEP" -> 3L, "exact_dup" -> 1L, "near_dup" -> 1L,
        "boilerplate_gutted" -> 1L, "high_perplexity" -> 1L,
        "low_compress_ratio" -> 1L, "token_budget" -> 1L, "no_tokens" -> 2L,
        "embedding_outlier" -> 1L), counts.toString)
    } finally handle.close()

    // guardrails
    intercept[IllegalArgumentException] {
      Curation.curateCorpus(docs, "doc_id", "text", lm, 50.0, bpe,
        minKeptRatio = 1.5)._2.close()
    }
    intercept[IllegalArgumentException] {
      Curation.curateCorpus(docs, "doc_id", "text", lm, 50.0, bpe,
        nearThreshold = 0.0)._2.close()
    }
  }

  test("curateCorpus on the corpus: stages only ever narrow, keepers pass a re-run of each gate") {
    import graft.ml.{Bpe, NgramLm}
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val lm = NgramLm.fit(docs, "text")
    val (bpe, _) = Bpe.fit(docs, "text", numMerges = 100)
    val (curated, handle) = Curation.curateCorpus(docs, "doc_id", "text",
      lm, maxPpl = 1e6, bpe, minTokens = 1,
      nearThreshold = 0.8, spanN = 15, minKeptRatio = 0.1)
    try {
      val n = curated.count()
      assert(n == docs.count(), "exactly one output row per input doc")
      // exact dups exist in the corpus by construction and must be the
      // exact_dup tally exactly
      val nExact = Dedup.exactKeepFirst(docs, "text")
        .filter(col("is_dup") === 1).count()
      val counts = Curation.rejectCounts(curated).collect()
        .map(r => Option(r.getString(0)).getOrElse("KEEP") -> r.getLong(1))
        .toMap
      assert(counts.getOrElse("exact_dup", 0L) == nExact,
        s"${counts.get("exact_dup")} vs $nExact")
      assert(counts.getOrElse("KEEP", 0L) > 0, s"no keepers: $counts")
      // keeper texts contain no cross-doc-shared window of length >= n
      // among themselves (the substring stage's own postcondition)
      val keepers = curated.filter(col("curation_reject").isNull)
        .select("doc_id", "text")
      assert(Dedup.duplicatedSpans(keepers, "doc_id", "text", n = 15)
        .count() == 0, "keepers still share >=15-token windows")
    } finally handle.close()
  }
}
