package graft

import org.apache.spark.sql.functions._
import graft.ml.NgramLm

/** Stupid Backoff n-gram LM: exact hand-computed score arithmetic on a
  * tiny corpus (every backoff level exercised), pruning semantics (N is
  * the UNPRUNED mass; U the kept vocabulary), held-out perplexity
  * separation on a seeded corpus, and the zero-token / filter contracts. */
class NgramLmSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  private val eps = 1e-12

  test("fit counts and Stupid Backoff scores match hand arithmetic at every backoff level") {
    val docs = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val m = NgramLm.fit(docs, "text")
    // unigrams a:2 b:2 c:1 d:1 → N=6; bigrams "a b":2 "b c":1 "b d":1;
    // trigrams "a b c":1 "a b d":1
    assert(m.nTokens == 6)
    assert(m.order1 == Map("a" -> 2L, "b" -> 2L, "c" -> 1L, "d" -> 1L))
    assert(m.order2 == Map("a b" -> 2L, "b c" -> 1L, "b d" -> 1L))
    assert(m.order3 == Map("a b c" -> 1L, "a b d" -> 1L))
    def s1(n: Long) = (n + 1.0) / (6 + 4 + 1) // (n+1)/(N+U+1)

    // no backoff: pos0 unigram, pos1 exact bigram, pos2 exact trigram
    val hit = NgramLm.score(Seq((9L, "a b c")).toDF("doc_id", "text"),
      "doc_id", "text", m).select("lm_tokens", "lm_avg_logprob", "lm_ppl").head
    val wantHit = (math.log(s1(2)) + math.log(2.0 / 2) + math.log(1.0 / 2)) / 3
    assert(hit.getLong(0) == 3)
    assert(math.abs(hit.getDouble(1) - wantHit) < eps)
    assert(math.abs(hit.getDouble(2) - math.exp(-wantHit)) < eps)

    // full backoff: "c b a" has no bigram "c b", no trigram "c b a",
    // no bigram "b a" → α·S1 and α²·S1 paths
    val miss = NgramLm.score(Seq((9L, "c b a")).toDF("doc_id", "text"),
      "doc_id", "text", m).select("lm_avg_logprob").head.getDouble(0)
    val wantMiss = (math.log(s1(1)) + math.log(0.4 * s1(2)) +
      math.log(0.4 * 0.4 * s1(2))) / 3
    assert(math.abs(miss - wantMiss) < eps)

    // out-of-vocabulary token scores the add-one floor, not −∞
    val oov = NgramLm.score(Seq((9L, "zzz")).toDF("doc_id", "text"),
      "doc_id", "text", m).select("lm_avg_logprob").head.getDouble(0)
    assert(math.abs(oov - math.log(s1(0))) < eps)
  }

  test("pruning keeps top-K per order, N stays unpruned, U is the kept vocabulary") {
    val docs = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val m = NgramLm.fit(docs, "text", maxUnigrams = 2, maxBigrams = 1,
      maxTrigrams = 0)
    // top-2 unigrams by (count desc, gram): a and b; N still 6
    assert(m.order1 == Map("a" -> 2L, "b" -> 2L) && m.nTokens == 6)
    assert(m.order2 == Map("a b" -> 2L) && m.order3.isEmpty)
    // pruned-away c scores as OOV against the KEPT vocabulary size U=2
    val got = NgramLm.score(Seq((9L, "c")).toDF("doc_id", "text"),
      "doc_id", "text", m).select("lm_avg_logprob").head.getDouble(0)
    assert(math.abs(got - math.log(1.0 / (6 + 2 + 1))) < eps)
  }

  test("held-out perplexity separates in-domain text from scrambled text") {
    val rnd = new scala.util.Random(77L)
    val vocab = (0 until 30).map(i => s"w$i")
    // in-domain: Markov-ish chains (w_i followed by w_{(i+1)%30} 70% of
    // the time) — real bigram structure for the LM to learn
    def chainDoc(id: Long): (Long, String) = {
      var cur = rnd.nextInt(30)
      val words = (0 until 40).map { _ =>
        val w = vocab(cur)
        cur = if (rnd.nextDouble() < 0.7) (cur + 1) % 30 else rnd.nextInt(30)
        w
      }
      (id, words.mkString(" "))
    }
    val train = (0L until 300L).map(chainDoc).toDF("doc_id", "text")
    val heldOut = (1000L until 1050L).map(chainDoc)
    val scrambled = heldOut.map { case (id, t) =>
      (id + 1000L, rnd.shuffle(t.split(" ").toList).mkString(" "))
    }
    val m = NgramLm.fit(train, "text")
    val scored = NgramLm.score(
      (heldOut ++ scrambled).toDF("doc_id", "text"), "doc_id", "text", m)
    val inPpl = scored.filter(col("doc_id") < 2000L)
      .agg(avg("lm_ppl")).head.getDouble(0)
    val scrPpl = scored.filter(col("doc_id") >= 2000L)
      .agg(avg("lm_ppl")).head.getDouble(0)
    assert(inPpl < scrPpl * 0.8,
      s"in-domain ppl $inPpl not clearly below scrambled $scrPpl")
    // the filter keeps exactly the docs at or under the threshold
    val cut = (inPpl + scrPpl) / 2
    val kept = NgramLm.perplexityFilter(
      (heldOut ++ scrambled).toDF("doc_id", "text"), "doc_id", "text", m, cut)
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val expect = scored.filter(col("lm_ppl") <= cut)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds == expect && kept.columns.toSeq == Seq("doc_id", "text"))
  }

  test("zero-token docs keep their row with lm_tokens=0 and null ppl; the filter drops them; guardrails fire") {
    val m = NgramLm.fit(Seq((1L, "a b c")).toDF("doc_id", "text"), "text")
    val out = NgramLm.score(
      Seq((5L, "a"), (6L, ""), (7L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"), "doc_id", "text", m).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("lm_tokens"), Option(r.getAs[java.lang.Double]("lm_ppl")))).toMap
    assert(out(5L)._1 == 1L && out(5L)._2.isDefined)
    assert(out(6L) == (0L, None) && out(7L) == (0L, None))
    assert(NgramLm.perplexityFilter(
      Seq((6L, ""), (5L, "a")).toDF("doc_id", "text"),
      "doc_id", "text", m, maxPpl = 1e18).count() == 1)
    intercept[IllegalArgumentException] {
      NgramLm.fit(Seq((1L, "a")).toDF("doc_id", "text"), "text", alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      NgramLm.fit(Seq((1L, " ")).toDF("doc_id", "text"), "text")
    }
  }

  test("scoreMapSide is BIT-identical to the broadcast-join score over the corpus") {
    // same driver-folded ratios, same coalesce chain, same Math.log, and
    // a document's exploded rows never split across partitions in the
    // join form — so the two paths must agree to the LAST BIT, not
    // within a tolerance. Empty/null text rows ride along to pin the
    // right-anchor contract on the map-side path too.
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .unionByName(Seq((900001L, ""), (900002L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
    val m = NgramLm.fit(docs, "text",
      maxUnigrams = 512, maxBigrams = 1024, maxTrigrams = 1024)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "lm_tokens", "lm_avg_logprob").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    val join = rows(NgramLm.score(docs, "doc_id", "text", m))
    val mapside = rows(NgramLm.scoreMapSide(docs, "text", m))
    assert(join.keySet == mapside.keySet)
    join.foreach { case (id, (n, s)) =>
      assert(mapside(id)._1 == n, s"doc $id token count drifted")
      assert(mapside(id)._2 == s,
        s"doc $id: join=$s mapSide=${mapside(id)._2} — bit equality broken")
    }
    assert(join(900001L) == ((0L, None)) && join(900002L) == ((0L, None)))
    // the filter twins keep the same survivors at a non-trivial cut
    val cut = NgramLm.scoreMapSide(docs, "text", m)
      .stat.approxQuantile("lm_ppl", Array(0.5), 0.0).head
    val fj = NgramLm.perplexityFilter(docs, "doc_id", "text", m, cut)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val fm = NgramLm.perplexityFilterMapSide(docs, "text", m, cut)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fj == fm && fj.nonEmpty && fj.size < docs.count())
  }
}
