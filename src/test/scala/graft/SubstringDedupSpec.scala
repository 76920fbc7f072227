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

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int, Int, Int, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
      r.getInt(3), r.getInt(4), r.getInt(5))).toSet

  test("sharedSpanPairs recovers planted A↔B attribution with both sides' coordinates") {
    val docs = Seq(
      (1L, s"${uniq("a", 40)} $boiler ${uniq("b", 40)}"),
      (2L, s"${uniq("c", 25)} $boiler ${uniq("d", 10)}"),
      (3L, uniq("e", 90))
    ).toDF("doc_id", "text")
    val got = pairsOf(Dedup.sharedSpanPairs(docs, "doc_id", "text", n = 10))
    // exactly one aligned run: doc1[40,70) == doc2[25,55); doc 3 clean
    assert(got == Set((1L, 2L, 40, 70, 25, 55)), got.toString)

    // two disjoint swapped blocks -> two aligned runs on different
    // diagonals, each attributed at its own coordinates per side
    val blockA = (0 until 15).map(i => s"hdrA$i").mkString(" ")
    val blockB = (0 until 15).map(i => s"ftrB$i").mkString(" ")
    val swapped = Seq(
      (1L, s"$blockA ${uniq("x", 30)} $blockB"),
      (2L, s"$blockB ${uniq("y", 30)} $blockA")
    ).toDF("doc_id", "text")
    val got2 = pairsOf(Dedup.sharedSpanPairs(swapped, "doc_id", "text", n = 10))
    assert(got2 == Set((1L, 2L, 0, 15, 45, 60), (1L, 2L, 45, 60, 0, 15)),
      got2.toString)

    // a block repeated twice in A and once in B -> one alignment per
    // copy (two diagonals), both reported
    val rep = Seq(
      (1L, s"$blockA ${uniq("p", 20)} $blockA"),
      (2L, s"${uniq("q", 5)} $blockA")
    ).toDF("doc_id", "text")
    val got3 = pairsOf(Dedup.sharedSpanPairs(rep, "doc_id", "text", n = 10))
    assert(got3 == Set((1L, 2L, 0, 15, 5, 20), (1L, 2L, 35, 50, 5, 20)),
      got3.toString)
  }

  test("sharedSpanPairs: the maxDf gate excludes ubiquitous grams; attribution agrees with coverage on the corpus") {
    // a block shared by 5 docs: maxDf=4 must exclude it entirely (that
    // content is cutSpans' job), maxDf=5 attributes all C(5,2) pairs
    val five = (1 to 5).map(i => (i.toLong, s"${uniq(s"u$i", 12)} $boiler"))
      .toDF("doc_id", "text")
    assert(Dedup.sharedSpanPairs(five, "doc_id", "text", n = 10, maxDf = 4)
      .count() == 0)
    assert(Dedup.sharedSpanPairs(five, "doc_id", "text", n = 10, maxDf = 5)
      .count() == 10)

    // corpus: every attributed span must (a) be VERBATIM equal token-for-
    // token on both sides, and (b) lie inside a coverage span of each doc
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val pairs = Dedup.sharedSpanPairs(docs, "doc_id", "text", n = 15, maxDf = 50)
      .collect()
    assert(pairs.nonEmpty, "corpus has exact dup docs — attribution must fire")
    val toks = docs.select(col("doc_id"),
        graft.operators.TextOps.wsTokens(lower(trim(col("text")))).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val cover = spansOf(Dedup.duplicatedSpans(docs, "doc_id", "text", n = 15))
    pairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (sa, ea, sb, eb) = (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))
      assert(ea - sa == eb - sb && ea - sa >= 15)
      assert(toks(a).slice(sa, ea) == toks(b).slice(sb, eb),
        s"pair ($a,$b): attributed span is not verbatim equal")
      assert(cover(a).exists { case (s, e) => s <= sa && ea <= e },
        s"doc $a: attributed [$sa,$ea) outside coverage ${cover(a)}")
      assert(cover(b).exists { case (s, e) => s <= sb && eb <= e },
        s"doc $b: attributed [$sb,$eb) outside coverage ${cover(b)}")
    }
    // guardrails
    intercept[IllegalArgumentException] {
      Dedup.sharedSpanPairs(docs, "doc_id", "text", n = 1)
    }
    intercept[IllegalArgumentException] {
      Dedup.sharedSpanPairs(docs, "doc_id", "text", maxDf = 1)
    }
    intercept[IllegalArgumentException] {
      Dedup.sharedSpanPairs(docs.withColumnRenamed("doc_id", "pos_a"),
        "pos_a", "text")
    }
  }

  test("sharedSpanPairsSampled: a 100-doc boilerplate block yields C(k,2) verbatim-verified example attributions with span_df = 100") {
    // 100 docs, each a unique 12-token prefix + the same 30-token boiler
    // block: every fully-boiler gram has df=100, far past maxDf=16, so
    // the base operator reports NOTHING for it — exactly the forensics
    // gap the sampled mode exists to close
    val docs = (1 to 100).map(i => (i.toLong, s"${uniq(s"u$i", 12)} $boiler"))
      .toDF("doc_id", "text")
    assert(Dedup.sharedSpanPairs(docs, "doc_id", "text", n = 10, maxDf = 16)
      .count() == 0, "base operator must exclude the mega-df block")

    val k = 8
    val rows = Dedup.sharedSpanPairsSampled(docs, "doc_id", "text",
      n = 10, maxDf = 16, sampleDocs = k).collect()
    // ONE consistent k-doc sample -> all C(k,2) pairs, one contiguous
    // run each (the global per-doc rank keeps every boiler gram's
    // sample identical, so windows merge instead of fragmenting)
    assert(rows.length == k * (k - 1) / 2, s"got ${rows.length} rows")
    val sampledIds = rows.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(sampledIds.size == k, s"expected $k distinct docs: $sampledIds")
    rows.foreach { r =>
      // boiler occupies tokens [12, 42) of every doc; the run must be
      // exactly that block, both sides, with the honest df estimate and
      // the sampled flag raised
      assert((r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)) ==
        ((12, 42, 12, 42)), r.toString)
      assert(r.getLong(6) == 100L, s"span_df: ${r.getLong(6)}")
      assert(r.getBoolean(7), "sampled flag must be true beyond maxDf")
    }
    // verbatim re-verification, token-for-token, on every emitted row
    val toks = docs.select(col("doc_id"),
        graft.operators.TextOps.wsTokens(lower(trim(col("text")))).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    rows.foreach { r =>
      assert(toks(r.getLong(0)).slice(r.getInt(2), r.getInt(3)) ==
        toks(r.getLong(1)).slice(r.getInt(4), r.getInt(5)),
        s"pair (${r.getLong(0)},${r.getLong(1)}): not verbatim")
    }
    // deterministic: a second run samples the identical documents
    val again = Dedup.sharedSpanPairsSampled(docs, "doc_id", "text",
      n = 10, maxDf = 16, sampleDocs = k).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(again == sampledIds, "sample must be replayable, no RNG")
  }

  test("sharedSpanPairsSampled: low-df rows identical to the base operator; guardrails") {
    // a corpus with only low-df sharing: the sampled variant's first six
    // columns must be EXACTLY the base operator's output (superset
    // report, not a different operator), sampled=false throughout and
    // span_df carrying the true per-run df
    val docs = Seq(
      (1L, s"${uniq("a", 40)} $boiler ${uniq("b", 40)}"),
      (2L, s"${uniq("c", 25)} $boiler ${uniq("d", 10)}"),
      (3L, uniq("e", 90))
    ).toDF("doc_id", "text")
    val base = pairsOf(Dedup.sharedSpanPairs(docs, "doc_id", "text", n = 10))
    val sampled = Dedup.sharedSpanPairsSampled(docs, "doc_id", "text", n = 10)
      .collect()
    assert(sampled.map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
      r.getInt(3), r.getInt(4), r.getInt(5))).toSet == base)
    sampled.foreach { r =>
      assert(r.getLong(6) == 2L && !r.getBoolean(7), r.toString)
    }
    // a sample budget looser than the gate is a contradiction, refused
    intercept[IllegalArgumentException] {
      Dedup.sharedSpanPairsSampled(docs, "doc_id", "text",
        maxDf = 4, sampleDocs = 5)
    }
    intercept[IllegalArgumentException] {
      Dedup.sharedSpanPairsSampled(docs, "doc_id", "text", sampleDocs = 1)
    }
    intercept[IllegalArgumentException] {
      Dedup.sharedSpanPairsSampled(
        docs.withColumnRenamed("doc_id", "span_df"), "span_df", "text")
    }
  }

  test("cutSpans keeps the original case: detection hashes lowercase, the cut returns the document's own words") {
    // doc 1 carries the shared block in MIXED case, doc 2 in lowercase:
    // the lowercased gram hashes still match (the span is found), but the
    // text each doc gets back is its OWN casing minus the cut — the r13
    // ADVICE caught the old wsTokens-based cut silently lowercasing every
    // surviving document, including ones with zero spans cut
    val mixedBoiler = (0 until 30).map(i => s"Boil$i").mkString(" ")
    val upperTail = (0 until 20).map(i => s"TAIL$i").mkString(" ")
    val docs = Seq(
      (1L, s"${uniq("a", 20)} $mixedBoiler $upperTail"),
      (2L, s"${uniq("c", 25)} ${mixedBoiler.toLowerCase} ${uniq("d", 10)}"),
      (3L, s"Untouched Doc ${uniq("e", 20)}")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(docs, "doc_id", "text", n = 10)
    val cut = Dedup.cutSpans(docs, spans, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cut(1L) == s"${uniq("a", 20)} $upperTail", s"doc 1: ${cut(1L)}")
    assert(cut(2L) == s"${uniq("c", 25)} ${uniq("d", 10)}", s"doc 2: ${cut(2L)}")
    // a doc with NO spans cut must come back verbatim (token-joined),
    // not case-folded
    assert(cut(3L) == s"Untouched Doc ${uniq("e", 20)}", s"doc 3: ${cut(3L)}")
  }

  test("sharedSpanPairsSampled: span_df and sampled are per merged span, not per diagonal group") {
    // 100 docs share a mega boilerplate block; two of the SAMPLED docs
    // additionally share a private 15-token block on the SAME diagonal.
    // The private run must keep its own df (2, sampled=false) instead of
    // inheriting the mega run's 100 (the r13 ADVICE finding) — and the
    // mega run must still report df=100, sampled=true.
    // replicate the operator's sample selection driver-side: bottom-8
    // ids under (xxhash64(id), id) — the sample depends only on ids, so
    // the fixture can plant the private block on two docs it KNOWS are
    // sampled
    val ranked = ss.range(1, 101)
      .select(col("id"), xxhash64(col("id")).as("rk"))
      .collect().map(r => (r.getLong(1), r.getLong(0)))
      .sorted.take(8).map(_._2)
    val Seq(a, b) = ranked.sorted.take(2).toSeq
    val priv = (0 until 15).map(i => s"privp$i").mkString(" ")
    val docs = (1 to 100).map { i =>
      val base = s"${uniq(s"u$i", 12)} $boiler"
      val text = if (i.toLong == a || i.toLong == b)
        s"$base ${uniq(s"gap$i", 10)} $priv" else base
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val rows = Dedup.sharedSpanPairsSampled(docs, "doc_id", "text",
      n = 10, maxDf = 16, sampleDocs = 8).collect()
    // C(8,2) mega alignments plus ONE private low-df alignment
    assert(rows.length == 8 * 7 / 2 + 1, s"got ${rows.length} rows")
    val privRows = rows.filter(r => !r.getBoolean(7))
    assert(privRows.length == 1, s"low-df rows: ${privRows.mkString("; ")}")
    val pr = privRows.head
    assert((pr.getLong(0), pr.getLong(1)) == ((math.min(a, b), math.max(a, b))))
    // priv occupies tokens [52, 67) of both docs; its own honest df is 2
    assert((pr.getInt(2), pr.getInt(3), pr.getInt(4), pr.getInt(5)) ==
      ((52, 67, 52, 67)), pr.toString)
    assert(pr.getLong(6) == 2L, s"span_df must be the span's own df: $pr")
    rows.filter(_.getBoolean(7)).foreach { r =>
      assert(r.getLong(6) == 100L && (r.getInt(2), r.getInt(3)) == ((12, 42)),
        s"mega run: $r")
    }
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
