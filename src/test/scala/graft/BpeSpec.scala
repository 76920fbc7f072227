package graft

import org.apache.spark.sql.functions._
import graft.ml.Bpe

/** BPE: hand-traced merge sequence on the classic low/lower/lowest
  * corpus, encode==training-segmentation consistency, round-trip
  * reconstruction, coverage accounting under a word-type cap,
  * determinism, and the hapax early-stop. */
class BpeSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  test("learnMerges reproduces the hand-traced merge sequence") {
    // counts: low×5, lower×2 → chars l o w</w> ×5, l o w e r</w> ×2
    val wc = Array(("low", 5L), ("lower", 2L))
    val merges = Bpe.learnMerges(wc, numMerges = 10)
    // pair counts step 1: (l,o)=7, (o,w)=5+2... wait: low = l o w</w> →
    // pairs (l,o)=7, (o,w</w>)=5, (o,w)=2, (w,e)=2, (e,r</w>)=2.
    // best = (l,o) 7. step 2: lo w</w> / lo w e r</w> →
    // (lo,w</w>)=5, (lo,w)=2, (w,e)=2, (e,r</w>)=2 → best (lo,w</w>) 5.
    // step 3: low</w> / lo w e r</w> → (lo,w)=2,(w,e)=2,(e,r</w>)=2 →
    // tie of three pairs at 2 → lexicographic: ("e","r</w>") < ("lo","w")
    // < ("w","e"). best ("e","r</w>").
    assert(merges.take(3).toSeq == Seq(("l", "o"), ("lo", "w</w>"), ("e", "r</w>")))
    // merging continues while pairs repeat: (lo,w)=2 then (low,er</w>)=2
    assert(merges.toSeq == Seq(("l", "o"), ("lo", "w</w>"), ("e", "r</w>"),
      ("lo", "w"), ("low", "er</w>")))
  }

  test("fit + encode: training words segment to their learned units; round-trip reconstructs text") {
    val docs = Seq((1L, "low low low low low lower lower")).toDF("doc_id", "text")
    val (m, coverage) = Bpe.fit(docs, "text", numMerges = 10)
    assert(coverage == 1.0)
    val enc = Bpe.encode(Seq((1L, "low lower lowest")).toDF("doc_id", "text"),
      "text", m).select("bpe_tokens").head.getSeq[String](0)
    // "low" → low</w>; "lower" → lower</w> (fully merged);
    // "lowest": low + e,s,t</w> singles (est never seen)
    assert(enc == Seq("low</w>", "lower</w>", "low", "e", "s", "t</w>"))
    // round-trip: strip </w> at word ends, concatenate — original
    // (lowercased) text reconstructs exactly
    val joined = enc.mkString("")
      .replace(Bpe.WordEnd, " ").trim
    assert(joined == "low lower lowest")
    // token counting matches the encode arrays
    val counted = Bpe.tokenCount(
      Seq((1L, "low lower lowest"), (2L, ""), (3L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"), "text", m)
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(counted(1L).contains(6))
    assert(counted(2L).contains(0) && counted(3L).isEmpty)
  }

  test("word-type cap reports honest coverage; determinism; hapax early-stop; guardrails") {
    val docs = Seq((1L, "aa aa aa bb bb zz")).toDF("doc_id", "text")
    val (m1, cov) = Bpe.fit(docs, "text", numMerges = 5, maxWordTypes = 2)
    // kept types: aa(3), bb(2) of 6 total tokens → coverage 5/6
    assert(math.abs(cov - 5.0 / 6) < 1e-12)
    val (m2, _) = Bpe.fit(docs, "text", numMerges = 5, maxWordTypes = 2)
    assert(m1.merges.toSeq == m2.merges.toSeq)
    // hapax-only corpus: every word unique → no pair repeats at the
    // character level beyond... "xy" appears once per word; pairs within
    // distinct single words can still repeat ACROSS words, so use fully
    // disjoint alphabets → zero merges learned
    val (m3, _) = Bpe.fit(Seq((1L, "ab cd ef")).toDF("doc_id", "text"),
      "text", numMerges = 10)
    assert(m3.merges.isEmpty)
    // zero merges encode = pure character segmentation with word ends
    val raw = Bpe.encode(Seq((1L, "ab")).toDF("doc_id", "text"), "text", m3)
      .select("bpe_tokens").head.getSeq[String](0)
    assert(raw == Seq("a", "b</w>"))
    intercept[IllegalArgumentException] {
      Bpe.fit(docs, "text", numMerges = -1)
    }
    intercept[IllegalArgumentException] {
      Bpe.fit(Seq((1L, "  ")).toDF("doc_id", "text"), "text", 5)
    }
  }

  test("learnMerges never emits a duplicate rule (fuzz over repetitive tiny-alphabet corpora)") {
    // the duplicate-slot hazard needs a later merge to RECREATE an
    // already-merged adjacency — most plausible on tiny alphabets with
    // long runs, where many rules produce superficially similar strings.
    // 40 seeded corpora, exhaustive merge budget: the rule list must be
    // duplicate-free every time (the Set guard makes this structural).
    for (seed <- 0 until 40) {
      val rnd = new scala.util.Random(seed)
      val alpha = "ab"
      val wc = Array.fill(3 + rnd.nextInt(8)) {
        val w = (0 until 1 + rnd.nextInt(9))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
        (w, (1 + rnd.nextInt(6)).toLong)
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toArray
      val merges = Bpe.learnMerges(wc, numMerges = 200)
      assert(merges.distinct.length == merges.length,
        s"seed $seed: duplicate merge in ${merges.toSeq}")
    }
  }
}
