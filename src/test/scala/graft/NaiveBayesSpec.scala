package graft

import org.apache.spark.sql.functions._
import graft.ml.NaiveBayes

/** Multinomial NB: exact log-probability arithmetic on a hand-computed
  * corpus (the fit is one aggregation — its numbers must be bit-exact,
  * no tolerance), held-out language classification on the documents
  * table, and the contract edges (unknown tokens, unseen-label-free
  * argmax determinism, guardrails). */
class NaiveBayesSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  test("fit reproduces hand-computed smoothed log-probabilities exactly") {
    // spam: "win cash now", "win win"; ham: "meeting notes now"
    val docs = Seq(
      (1L, "win cash now", "spam"),
      (2L, "win win", "spam"),
      (3L, "meeting notes now", "ham")
    ).toDF("doc_id", "text", "label")
    val m = NaiveBayes.fit(docs, "text", "label", vocabSize = 100, smoothing = 1.0)
    assert(m.labels.toSeq == Seq("ham", "spam"))
    assert(m.vocab.toSeq == Seq("cash", "meeting", "notes", "now", "win"))
    val V = 5
    // spam: 5 tokens (win×3, cash, now); ham: 3 tokens
    def lpSpam(c: Int) = math.log((c + 1.0) / (5.0 + V + 1))
    def lpHam(c: Int) = math.log((c + 1.0) / (3.0 + V + 1))
    val spamI = m.labels.indexOf("spam")
    val hamI = m.labels.indexOf("ham")
    assert(m.tokenLogProb(m.vocab.indexOf("win"))(spamI) == lpSpam(3))
    assert(m.tokenLogProb(m.vocab.indexOf("win"))(hamI) == lpHam(0))
    assert(m.tokenLogProb(m.vocab.indexOf("meeting"))(hamI) == lpHam(1))
    assert(m.unkLogProb(spamI) == lpSpam(0) && m.unkLogProb(hamI) == lpHam(0))
    assert(m.logPrior(spamI) == math.log(2.0 / 3) &&
      m.logPrior(hamI) == math.log(1.0 / 3))

    // predict scores match driver arithmetic, unknown token included
    val test = Seq((10L, "win cash zzz")).toDF("doc_id", "text")
    val got = NaiveBayes.predict(test, "doc_id", "text", m)
      .select("nb_label", "nb_score").head
    val wantSpam = math.log(2.0 / 3) + lpSpam(3) + lpSpam(1) + lpSpam(0)
    val wantHam = math.log(1.0 / 3) + lpHam(0) + lpHam(0) + lpHam(0)
    assert(got.getString(0) == "spam")
    assert(got.getDouble(1) ==
      BigDecimal(math.max(wantSpam, wantHam)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("held-out classification on a seeded separable corpus") {
    // the driver corpus's text is deliberately language-INDEPENDENT
    // (GenScale-style shared vocabulary — lang is not learnable from
    // text there, verified: NB lands at majority-class rate), so the
    // held-out test uses a seeded topic corpus with overlapping but
    // shifted token distributions — separable yet noisy
    val rnd = new scala.util.Random(1234L)
    val shared = (0 until 40).map(i => s"w$i")
    val topicWords = Map(
      "db" -> Seq("query", "index", "join", "scan"),
      "ml" -> Seq("model", "train", "loss", "epoch"),
      "os" -> Seq("kernel", "thread", "page", "irq"))
    val docs = (0 until 600).map { i =>
      val topic = Seq("db", "ml", "os")(i % 3)
      val words = (0 until 30).map { _ =>
        if (rnd.nextDouble() < 0.3)
          topicWords(topic)(rnd.nextInt(4)) // topical 30%
        else shared(rnd.nextInt(shared.length)) // shared 70%
      }
      (i.toLong, words.mkString(" "), topic)
    }.toDF("doc_id", "text", "label")
    val train = docs.filter(col("doc_id") % 2 === 0)
    val test = docs.filter(col("doc_id") % 2 =!= 0)
    val m = NaiveBayes.fit(train, "text", "label", vocabSize = 128)
    val pred = NaiveBayes.predict(test, "doc_id", "text", m)
    val acc = pred.filter(col("nb_label") === col("label")).count().toDouble /
      test.count()
    assert(acc >= 0.95, s"held-out NB accuracy $acc")
  }

  test("empty-text docs score as the prior-only argmax; guardrails fire") {
    // priors deliberately non-uniform: x has 2 docs, y has 1 → an empty
    // document (no token evidence) must land on x with score log(2/3)
    val docs = Seq((1L, "alpha beta", "x"), (2L, "gamma", "x"),
      (3L, "alpha", "y")).toDF("doc_id", "text", "label")
    val m = NaiveBayes.fit(docs, "text", "label")
    val out = NaiveBayes.predict(
      Seq((5L, "alpha"), (6L, ""), (7L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"), "doc_id", "text", m)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[String]("nb_label"), r.getAs[Double]("nb_score"))).toMap
    assert(out(5L)._1 != null)
    val priorOnly = BigDecimal(math.log(2.0 / 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(6L) == ("x", priorOnly),
      s"empty doc must argmax the priors, got ${out(6L)}")
    assert(out(7L) == ("x", priorOnly),
      s"null-text doc must argmax the priors, got ${out(7L)}")
    intercept[IllegalArgumentException] {
      NaiveBayes.fit(docs, "text", "label", vocabSize = 0)
    }
    intercept[IllegalArgumentException] {
      NaiveBayes.fit(docs, "text", "label", smoothing = 0.0)
    }
    // a NULL training label fails loudly with a named error, not an
    // unexplained NPE from labels.sorted mid-fit
    val err = intercept[IllegalArgumentException] {
      NaiveBayes.fit(Seq((1L, "alpha", "x"), (2L, "beta", null.asInstanceOf[String]))
        .toDF("doc_id", "text", "label"), "text", "label")
    }
    assert(err.getMessage.contains("NULL"), err.getMessage)
  }
}
