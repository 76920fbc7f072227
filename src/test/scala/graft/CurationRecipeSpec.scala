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
  private def uniq(tag: String, n: Int): String =
    (0 until n).map(i => s"${tag}w$i").mkString(" ")

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

  test("curateIncrement: batch curated against an existing corpus in O(batch); keepers carry appendable labels") {
    import graft.ml.{Bpe, NgramLm}
    // existing corpus: in-domain text, its cluster index built with the
    // md5 LSH family (the dedupClusters default) — the increment runs
    // with md5Family = true so probe events match the index's generator
    val old = Seq(
      (1L, s"$fox ${uniq("oa", 20)}"),
      (2L, s"$hen $hen ${uniq("ob", 15)}"),
      (3L, uniq("oc", 40))
    ).toDF("doc_id", "text")
    val oldLabels = Dedup.dedupClusters(old, threshold = 0.8)
      .select("doc_id", "cluster_id")
    // corpus-fit gate models (the in-domain distribution is the CORPUS's)
    val train = Seq((1L, s"$fox " * 20 + s"$hen " * 20)).toDF("doc_id", "text")
    val lm = NgramLm.fit(train, "text")
    val (bpe, _) = Bpe.fit(train, "text", numMerges = 50)

    // fresh IN-DOMAIN text (every bigram occurs in the train corpus, so
    // the gate passes) whose 3-shingle arrangement differs from every
    // corpus doc (so the near stage does not attach it)
    val fresh = "the lazy dog the lazy dog the quick brown fox jumps over " +
      "the lazy dog a small red hen walks near the old stone wall " +
      "a small red hen"
    val batch = Seq(
      (101L, s"$fox ${uniq("oa", 20)}"),      // exact copy of corpus doc 1
      (102L, s"$hen $hen ${uniq("ob", 15)} a"), // near-dup of corpus doc 2
      (103L, fresh),                          // fresh; canonical of {103,104}
      (104L, s"$fresh a"),                    // near-dup of 103
      (105L, fresh),                          // exact copy of 103 (in batch)
      (106L, ""),                             // no_tokens
      (107L, "zzq xkw vvp mmt ssr qqa wwb eec rrd ttf"), // high_perplexity
      (108L, s"$fox $hen")                    // fresh keeper
    ).toDF("doc_id", "text")

    val (curated, handle) = Curation.curateIncrement(batch, "doc_id", "text",
      old, oldLabels, lm, maxPpl = 50.0, bpe, minTokens = 5,
      minCompressRatio = 0.12, maxCompressRatio = 1.5,
      nearThreshold = 0.8, md5Family = true)
    try {
      val rows = curated.collect()
      assert(rows.length == 8, s"one row per batch doc: ${rows.length}")
      val reason = rows.map(r => r.getLong(0) -> Option(r.getString(3))).toMap
      val cluster = rows.map(r =>
        r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
      // duplicates of the corpus are rejected AND name what they duplicate
      assert(reason(101L).contains("dup_of_corpus"), reason(101L).toString)
      assert(cluster(101L).contains(1L), s"101 cluster: ${cluster(101L)}")
      assert(reason(102L).contains("dup_of_corpus"), reason(102L).toString)
      assert(cluster(102L).contains(2L), s"102 cluster: ${cluster(102L)}")
      // within-batch structure: 105 exact-dups 103; 104 near-dups it;
      // 103 is the unattached component's min-id canonical and KEEPS
      assert(reason(105L).contains("exact_dup"), reason(105L).toString)
      assert(reason(104L).contains("near_dup"), reason(104L).toString)
      assert(cluster(104L).contains(103L), s"104 cluster: ${cluster(104L)}")
      assert(reason(103L).isEmpty && cluster(103L).contains(103L),
        s"103: ${reason(103L)} / ${cluster(103L)}")
      assert(reason(106L).contains("no_tokens") && cluster(106L).isEmpty)
      assert(reason(107L).contains("high_perplexity"), reason(107L).toString)
      assert(reason(108L).isEmpty && cluster(108L).contains(108L),
        s"108: ${reason(108L)} / ${cluster(108L)}")
      // the keepers' (doc_id, cluster_id) rows are the exact append for
      // the next increment's oldLabels — closing the daily loop
      val nextLabels = oldLabels.unionByName(
        curated.filter(col("curation_reject").isNull)
          .select("doc_id", "cluster_id"))
      assert(nextLabels.count() == 5, "3 old + 2 new keepers")
      // day 2: a copy of yesterday's keeper 103 must now be dup_of_corpus
      val day2 = Seq((201L, fresh)).toDF("doc_id", "text")
      val (c2, h2) = Curation.curateIncrement(day2, "doc_id", "text",
        old.unionByName(batch.filter(col("doc_id").isin(103L, 108L))),
        nextLabels, lm, maxPpl = 50.0, bpe, minTokens = 5,
        minCompressRatio = 0.12, maxCompressRatio = 1.5,
        nearThreshold = 0.8, md5Family = true)
      try {
        val r2 = c2.collect().head
        assert(r2.getString(3) == "dup_of_corpus" && r2.getLong(2) == 103L,
          r2.toString)
      } finally h2.close()
    } finally handle.close()
  }

  test("curateIncrement with a gram index: corpus boilerplate is cut from the batch; batch-only templates flag too") {
    import graft.ml.{Bpe, NgramLm}
    val boiler2 = (0 until 30).map(i => s"b2x$i").mkString(" ")
    val tmpl = (0 until 15).map(i => s"tmplx$i").mkString(" ")
    // two distinct boilerplate blocks live ONLY in the corpus (one each)
    val old = Seq(
      (1L, s"${uniq("oa", 40)} $boiler"),
      (2L, s"${uniq("ob", 10)} $boiler2"),
      (3L, uniq("oc", 30))
    ).toDF("doc_id", "text")
    val oldLabels = Dedup.dedupClusters(old, threshold = 0.8)
      .select("doc_id", "cluster_id")
    val index = Dedup.gramIndex(old, "text", n = 10)
    val train = Seq((1L, s"$fox " * 20 + s"$hen " * 20)).toDF("doc_id", "text")
    val lm = NgramLm.fit(train, "text")
    val (bpe, _) = Bpe.fit(train, "text", numMerges = 50)

    // each keeper's unique part is its OWN in-domain cycle (every bigram
    // seen in train), so no two batch docs share a 10-token window
    // outside the planted blocks — the first draft chained the SAME
    // phrase sequences in two docs and the operator (correctly) flagged
    // the real 10-token overlaps it created
    val cyc1 = ("the lazy dog " * 9).trim                       // 27 tokens
    val cyc2 = ("the quick brown fox jumps over " * 3).trim     // 18 tokens
    val cyc3 = ("a small red hen walks near " * 3).trim         // 18 tokens
    val batch = Seq(
      // boiler appears ONCE in the batch: only the corpus index can cut it
      (101L, s"$cyc1 $boiler"),
      // mostly corpus boilerplate -> gutted (again: corpus-index-only)
      (102L, s"the lazy dog $boiler2"),
      // a batch-only template shared by two new docs: the within-batch
      // leg must cut it even though the corpus has never seen it
      (103L, s"$cyc2 $tmpl"),
      (104L, s"$cyc3 $tmpl")
    ).toDF("doc_id", "text")

    val (curated, handle) = Curation.curateIncrement(batch, "doc_id", "text",
      old, oldLabels, lm, maxPpl = 50.0, bpe, minTokens = 5,
      minCompressRatio = 0.12, maxCompressRatio = 1.5,
      nearThreshold = 0.8, md5Family = true,
      spanIndex = Some(index), spanN = 10, minKeptRatio = 0.3)
    try {
      val rows = curated.collect()
      assert(rows.length == 4, s"${rows.length}")
      val byId = rows.map(r => r.getLong(0) ->
        (Option(r.getString(3)), r.getString(1))).toMap
      // 101: keeper, corpus boiler cut verbatim (27/57 kept >= 0.3)
      assert(byId(101L)._1.isEmpty, byId(101L).toString)
      assert(byId(101L)._2 == cyc1, s"101 text: ${byId(101L)._2}")
      // 102: gutted by the corpus block (3/33 kept), evidence text carried
      assert(byId(102L)._1.contains("boilerplate_gutted"), byId(102L).toString)
      assert(byId(102L)._2 == "the lazy dog", s"102 text: ${byId(102L)._2}")
      // 103/104: keepers with the batch-only template cut
      assert(byId(103L)._1.isEmpty && byId(103L)._2 == cyc2, byId(103L).toString)
      assert(byId(104L)._1.isEmpty && byId(104L)._2 == cyc3, byId(104L).toString)
      // without the index, the corpus boilerplate sails through untouched
      val (noIx, h2) = Curation.curateIncrement(batch, "doc_id", "text",
        old, oldLabels, lm, maxPpl = 50.0, bpe, minTokens = 5,
        minCompressRatio = 0.12, maxCompressRatio = 1.5,
        nearThreshold = 0.8, md5Family = true)
      try {
        val t101 = noIx.filter(col("doc_id") === 101L)
          .select("text").head.getString(0)
        assert(t101 == s"$cyc1 $boiler",
          "index-less increment must not cut (stage skipped, documented)")
      } finally h2.close()
    } finally handle.close()
    // the index builder refuses silly n; the prober refuses a non-index frame
    intercept[IllegalArgumentException] { Dedup.gramIndex(old, "text", n = 1) }
    intercept[IllegalArgumentException] {
      Dedup.duplicatedSpansIncrement(batch, "doc_id", "text",
        old.select(col("text")), n = 10)
    }
  }

  test("curateCorpus: tab/newline-only text is no_tokens; duplicate embedding rows reject a doc once; keeper case survives") {
    import graft.ml.{Bpe, NgramLm, Pca}
    val train = Seq((1L, s"$fox " * 20 + s"$hen " * 20)).toDF("doc_id", "text")
    val lm = NgramLm.fit(train, "text")
    val (bpe, _) = Bpe.fit(train, "text", numMerges = 50)
    val docs = Seq(
      (1L, "The Quick Brown Fox Jumps Over The Lazy Dog"), // keeper, MIXED case
      (2L, "\t\n \t"),                    // whitespace the tokenizer sees as
      (3L, "\n\n"),                       // empty but ASCII trim() does not
      (4L, hen)                           // keeper / outlier per screen below
    ).toDF("doc_id", "text")
    val rnd = new scala.util.Random(7L)
    val fitRows = (100 until 160).map { i =>
      (i.toLong, Array(rnd.nextGaussian() * 5, rnd.nextGaussian() * 2, 0.0, 0.0))
    }.toDF("id", "emb")
    val model = Pca.fit(fitRows, "emb", k = 2)
    // doc 4 appears TWICE in the embedding table, both rows off-subspace:
    // exactly one embedding_outlier row must come back (r13 ADVICE — the
    // un-deduplicated screen emitted one reject per embedding row)
    val screen = Seq(
      (4L, Array(0.0, 0.0, 5.0, 0.0)),
      (4L, Array(0.0, 0.0, 6.0, 0.0))
    ).toDF("id", "emb")
    val (curated, handle) = Curation.curateCorpus(docs, "doc_id", "text",
      lm, maxPpl = 50.0, bpe, nearThreshold = 0.8, spanN = 10,
      embedScreen = Some(Curation.EmbedScreen(screen, "id", "emb", model,
        maxRecErr = 1.0)))
    try {
      val rows = curated.collect()
      assert(rows.length == 4, s"one row per input doc: ${rows.length}")
      val reason = rows.map(r => r.getLong(0) -> Option(r.getString(2))).toMap
      assert(reason(2L).contains("no_tokens") && reason(3L).contains("no_tokens"),
        s"tab/newline-only must be no_tokens: ${reason(2L)} / ${reason(3L)}")
      assert(reason(4L).contains("embedding_outlier"), reason(4L).toString)
      // the keeper's text is its own words, original case (cutSpans fix)
      val keeper = rows.find(_.getLong(0) == 1L).get
      assert(reason(1L).isEmpty, reason(1L).toString)
      assert(keeper.getString(1) == "The Quick Brown Fox Jumps Over The Lazy Dog",
        s"keeper text case-folded: ${keeper.getString(1)}")
    } finally handle.close()
  }

  test("cross-form coherence: curateIncrement against an EMPTY corpus reproduces curateCorpus doc-for-doc") {
    // the two recipes share stages but diverge in dedup machinery (full
    // fixpoint vs frozen-labels attach; duplicatedSpans vs the gram-index
    // probe). With nothing to attach TO — empty corpus, empty label
    // index, an empty gram index so the substring stage is the
    // within-batch leg alone — every divergence must vanish: same
    // verdict, same text, per document. This is the spec that keeps the
    // two code paths from drifting apart across rounds.
    import graft.ml.{Bpe, NgramLm, Pca}
    val train = Seq((1L, s"$fox " * 20 + s"$hen " * 20)).toDF("doc_id", "text")
    val lm = NgramLm.fit(train, "text")
    val (bpe, _) = Bpe.fit(train, "text", numMerges = 50)
    val hen3 = s"$hen $hen $hen"
    val docs = Seq(
      (1L, fox), (2L, fox), (3L, hen3), (4L, s"$hen3 a"),
      (5L, s"$fox $fox $fox $fox $fox $fox $boiler"),
      (6L, s"the quick brown fox $boiler"),
      (7L, "zzq xkw vvp mmt ssr qqa wwb eec rrd ttf"),
      (8L, "the the the the the the the the the the " * 30),
      (9L, "the quick"), (10L, ""), (11L, null.asInstanceOf[String]),
      (12L, "a small red hen walks near the lazy dog")
    ).toDF("doc_id", "text")
    val rnd = new scala.util.Random(31L)
    val fitRows = (100 until 160).map { i =>
      (i.toLong, Array(rnd.nextGaussian() * 5, rnd.nextGaussian() * 2, 0.0, 0.0))
    }.toDF("id", "emb")
    val model = Pca.fit(fitRows, "emb", k = 2)
    val screen = Curation.EmbedScreen(Seq(
      (3L, Array(1.0, 1.0, 0.0, 0.0)),
      (5L, Array(-2.0, 0.5, 0.0, 0.0)),
      (12L, Array(0.0, 0.0, 5.0, 0.0))
    ).toDF("id", "emb"), "id", "emb", model, maxRecErr = 1.0)

    val (batchOut, h1) = Curation.curateCorpus(docs, "doc_id", "text",
      lm, maxPpl = 50.0, bpe, minTokens = 5, maxTokens = 10000,
      minCompressRatio = 0.12, maxCompressRatio = 1.5,
      nearThreshold = 0.8, spanN = 10, minKeptRatio = 0.3,
      embedScreen = Some(screen))
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val emptyLabels = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
    val emptyIx = Dedup.gramIndex(emptyDocs, "text", n = 10)
    val (incOut, h2) = Curation.curateIncrement(docs, "doc_id", "text",
      emptyDocs, emptyLabels, lm, maxPpl = 50.0, bpe, minTokens = 5,
      maxTokens = 10000, minCompressRatio = 0.12, maxCompressRatio = 1.5,
      nearThreshold = 0.8, md5Family = true, spanIndex = Some(emptyIx),
      spanN = 10, minKeptRatio = 0.3, embedScreen = Some(screen))
    try {
      val a = batchOut.collect()
        .map(r => r.getLong(0) -> (Option(r.getString(2)), Option(r.getString(1))))
        .toMap
      val b = incOut.collect()
        .map(r => r.getLong(0) ->
          ((Option(r.getString(3)), Option(r.getString(1))),
            if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .toMap
      assert(a.keySet == b.keySet && a.size == 12)
      a.foreach { case (id, (reason, text)) =>
        assert(b(id)._1._1 == reason,
          s"doc $id: batch=$reason increment=${b(id)._1._1}")
        assert(b(id)._1._2 == text,
          s"doc $id text diverged: '$text' vs '${b(id)._1._2}'")
      }
      // nothing can be dup_of_corpus, and the increment's labels are the
      // batch's own component structure (4 near-dups 3; canonicals self)
      assert(!b.values.exists(_._1._1.contains("dup_of_corpus")))
      assert(b(4L)._2.contains(3L) && b(3L)._2.contains(3L))
    } finally { h1.close(); h2.close() }
  }

  test("curation_recipe gated query: one verdict per document, labels from the recipe's vocabulary, keepers re-gated") {
    // the driver's hash gate proves value equality against DuckDB at
    // sf0.01; this spec pins the query GLUE at the spec SF — row
    // identity, label vocabulary, and that a keeper really does pass a
    // re-run of the composed gate on its emitted (post-cut) text
    val out = Curation.curationRecipeQuery(spark, sf)
    val rows = out.collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs, s"${rows.length} rows for $nDocs docs")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length,
      "doc_id must be unique in the verdict frame")
    val allowed = Set("no_tokens", "exact_dup", "near_dup",
      "boilerplate_gutted", "high_perplexity", "low_compress_ratio",
      "high_compress_ratio", "token_budget")
    val reasons = rows.flatMap(r => Option(r.getString(2))).toSet
    assert(reasons.subsetOf(allowed), s"unknown labels: ${reasons -- allowed}")
    assert(rows.exists(_.isNullAt(2)), "no keepers at the spec SF")
    // keepers' emitted text re-passes the gate the recipe applied
    import graft.operators.TextOps
    val keepers = out.filter(col("curation_reject").isNull)
      .select("doc_id", "text")
    val (lm, bpe) = { // same session-scoped models the query used
      val docs = Tables.documents(spark, sf).select("doc_id", "text")
      (graft.ml.NgramLm.fit(docs, "text"),
        graft.ml.Bpe.fit(docs, "text", numMerges = 50)._1)
    }
    val regated = TextOps.curationGate(keepers, "text", lm, maxPpl = 14.2, bpe)
    assert(regated.filter(col("gate_reason").isNotNull).count() == 0,
      "a keeper failed a re-run of the composed gate on its emitted text")
  }

  test("curation_increment gated query: one verdict per batch doc, dup_of_corpus carries a corpus cluster, keepers' labels are appendable") {
    // the driver's hash gate proves value equality against DuckDB at
    // sf0.01; this spec pins the query GLUE at the spec SF — batch row
    // identity (odd doc_ids), the label vocabulary incl. the
    // increment-only dup_of_corpus, that attached rejects really carry
    // a CORPUS (even-id) cluster, that keepers' (doc_id, cluster_id)
    // rows are the self-canonical labels the daily loop appends, and
    // that keepers re-pass the gate with the CORPUS-fit models
    val out = Curation.curationIncrementQuery(spark, sf)
    val rows = out.collect()
    val nBatch = Tables.documents(spark, sf)
      .filter(col("doc_id") % 2 === 1).count()
    assert(rows.length == nBatch, s"${rows.length} rows for $nBatch batch docs")
    assert(rows.forall(_.getLong(0) % 2 == 1), "a corpus (even) doc leaked in")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length,
      "doc_id must be unique in the verdict frame")
    val allowed = Set("no_tokens", "exact_dup", "dup_of_corpus", "near_dup",
      "boilerplate_gutted", "high_perplexity", "low_compress_ratio",
      "high_compress_ratio", "token_budget")
    val reasons = rows.flatMap(r => Option(r.getString(3))).toSet
    assert(reasons.subsetOf(allowed), s"unknown labels: ${reasons -- allowed}")
    // the class this query exists to gate: batch docs duplicating
    // corpus content, carrying the corpus cluster they duplicate
    val attached = rows.filter(r =>
      Option(r.getString(3)).contains("dup_of_corpus"))
    assert(attached.nonEmpty, "dup_of_corpus never fired at the spec SF")
    assert(attached.forall(r => !r.isNullAt(2) && r.getLong(2) % 2 == 0),
      "a dup_of_corpus row's cluster_id is not a corpus (even) doc")
    // keepers: present, self-canonical — their (doc_id, cluster_id)
    // rows ARE the append to oldLabels before the next increment
    val keepers = rows.filter(_.isNullAt(3))
    assert(keepers.nonEmpty, "no keepers at the spec SF")
    assert(keepers.forall(r => r.getLong(2) == r.getLong(0)),
      "a keeper is not its own canonical")
    // keepers' emitted (post-cut) text re-passes the gate under the
    // same corpus-half-fit models the query used
    import graft.operators.TextOps
    val corpus = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .filter(col("doc_id") % 2 === 0 && !(col("text").isNull ||
        col("text").rlike("^\\s*$")))
    val lm = graft.ml.NgramLm.fit(corpus, "text")
    val (bpe, _) = graft.ml.Bpe.fit(corpus, "text", numMerges = 50)
    val keeperDf = out.filter(col("curation_reject").isNull)
      .select("doc_id", "text")
    val regated = TextOps.curationGate(keeperDf, "text", lm, maxPpl = 28.4, bpe)
    assert(regated.filter(col("gate_reason").isNotNull).count() == 0,
      "a keeper failed a re-run of the composed gate on its emitted text")
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

  test("3-day replay: per-day index refresh feeds the next day; a day-3 reject is attributable ONLY to the day-2 refresh") {
    import graft.ml.{Bpe, NgramLm}
    // The README states the index-freshness contract as prose ("a stale
    // index misses only post-snapshot boilerplate"); this replay pins it
    // as behavior across three days of the loop. Quality gates are
    // neutralized (maxPpl = 1e6) — the replay isolates the dedup/index
    // state rolling forward, CurationRecipeSpec's other cases own the
    // gate semantics.
    val corpusText = uniq("oa", 40)
    val old = Seq((1L, corpusText), (2L, uniq("ob", 30)), (3L, uniq("oc", 30)))
      .toDF("doc_id", "text")
    val labels0 = Dedup.dedupClusters(old, threshold = 0.8)
      .select("doc_id", "cluster_id")
    val ix0 = Dedup.gramIndex(old, "text", n = 10)
    val train = Seq((1L, corpusText)).toDF("doc_id", "text")
    val lm = NgramLm.fit(train, "text")
    val (bpe, _) = Bpe.fit(train, "text", numMerges = 20)
    val boilerA = (0 until 30).map(i => s"ba$i").mkString(" ")
    val boilerB = (0 until 30).map(i => s"bb$i").mkString(" ")

    def day(batch: org.apache.spark.sql.DataFrame,
            corpus: org.apache.spark.sql.DataFrame,
            labels: org.apache.spark.sql.DataFrame,
            ix: org.apache.spark.sql.DataFrame) = {
      val (v, h) = Curation.curateIncrement(batch, "doc_id", "text",
        corpus, labels, lm, maxPpl = 1e6, bpe, nearThreshold = 0.8,
        md5Family = true, spanIndex = Some(ix), spanN = 10,
        minKeptRatio = 0.3)
      val rows = v.collect() // materialize, then free the stage caches
      h.close()
      rows
    }
    def verdictOf(rows: Array[org.apache.spark.sql.Row], id: Long) = {
      val r = rows.find(_.getLong(0) == id).get
      (Option(r.getString(3)), r.getString(1))
    }

    // ---- day 1: boilerplate A enters the corpus via a keeper ----
    val day1 = Seq(
      (101L, s"${uniq("k1", 20)} $boilerA"), // keeper (A is brand new)
      (102L, corpusText)                     // dup_of_corpus, cluster 1
    ).toDF("doc_id", "text")
    val rows1 = day(day1, old, labels0, ix0)
    assert(verdictOf(rows1, 101L)._1.isEmpty, s"${verdictOf(rows1, 101L)}")
    assert(verdictOf(rows1, 102L)._1.contains("dup_of_corpus"))
    // roll forward: corpus, labels, AND the gram index (keepers' post-cut
    // text unioned in — the refresh the README's loop step prescribes)
    val keepers1 = Seq((101L, verdictOf(rows1, 101L)._2)).toDF("doc_id", "text")
    val corpus1 = old.unionByName(keepers1)
    val labels1 = labels0.unionByName(
      Seq((101L, 101L)).toDF("doc_id", "cluster_id"))
    val ix1 = ix0.unionByName(Dedup.gramIndex(keepers1, "text", n = 10))
      .distinct()

    // ---- day 2: A (now indexed) guts a doc; B enters via a keeper ----
    val day2 = Seq(
      (201L, s"${uniq("k2", 20)} $boilerB"), // keeper (B is brand new)
      (202L, s"${uniq("k3", 6)} $boilerA")   // 6/36 kept < 0.3 -> gutted,
                                             // provable day-1-refresh effect
    ).toDF("doc_id", "text")
    val rows2 = day(day2, corpus1, labels1, ix1)
    assert(verdictOf(rows2, 201L)._1.isEmpty, s"${verdictOf(rows2, 201L)}")
    assert(verdictOf(rows2, 202L)._1.contains("boilerplate_gutted"),
      s"${verdictOf(rows2, 202L)}")
    val keepers2 = Seq((201L, verdictOf(rows2, 201L)._2)).toDF("doc_id", "text")
    val corpus2 = corpus1.unionByName(keepers2)
    val labels2 = labels1.unionByName(
      Seq((201L, 201L)).toDF("doc_id", "cluster_id"))
    val ix2 = ix1.unionByName(Dedup.gramIndex(keepers2, "text", n = 10))
      .distinct()

    // ---- day 3: same batch against the refreshed vs the stale index ----
    val day3 = Seq(
      (301L, s"${uniq("k4", 6)} $boilerB")
    ).toDF("doc_id", "text")
    // refreshed (ix2, contains B via day-2's keeper): gutted
    val fresh = day(day3, corpus2, labels2, ix2)
    assert(verdictOf(fresh, 301L)._1.contains("boilerplate_gutted"),
      s"day-2 index refresh must catch day-2 boilerplate: ${verdictOf(fresh, 301L)}")
    // stale (ix1, pre-day-2): B unseen, the doc sails through untouched —
    // the exact "misses only post-snapshot boilerplate" failure mode,
    // demonstrated rather than asserted in prose
    val stale = day(day3, corpus2, labels2, ix1)
    assert(verdictOf(stale, 301L)._1.isEmpty &&
      verdictOf(stale, 301L)._2 == s"${uniq("k4", 6)} $boilerB",
      s"stale index must miss ONLY the post-snapshot block: ${verdictOf(stale, 301L)}")
  }
}
