package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.VectorAgg

/** Multinomial Naive Bayes over whitespace tokens — the classic text
  * classification baseline, expressed as the engine's fourth instance of
  * the sufficient-statistics pattern (k-means, ridge, IRLS, and now NB):
  * FIT computes the corpus-sized (label, token) count aggregation ONCE
  * and persists it — it has two bounded consumers (the vocabSize-row
  * vocabulary head and the in-vocab count matrix), and without the
  * persist each collect would re-run the token explode over the whole
  * corpus — plus one cheap per-label doc-count scan for the priors; the
  * model (vocab × labels log-probabilities, label log-priors) is
  * driver-resident and broadcast back for scoring, exactly like the
  * k-means centroid matrix and ridge β.
  *
  * PREDICT is distributed and join-shaped, deliberately NOT a per-token
  * probe of a literal map (Catalyst's map-literal lookup is a linear
  * scan — vocab-sized work PER TOKEN): tokens explode once, a broadcast
  * LEFT join attaches each in-vocab token's log-prob vector (null for
  * out-of-vocab — `vector_sum` skips nulls, `count(_lp)` counts the
  * matches), ONE groupBy(doc) computes the in-vocab vector sum, the
  * match count, and the total token count together, and out-of-vocab
  * tokens contribute the smoothed unknown bucket times their count.
  * Two corpus-sized exchanges at any scale: the token explode's
  * groupBy(doc), and the right-anchor docs-side join below it (the
  * vocab side broadcasts). Documents with zero tokens (empty or
  * null text) score as the prior-only argmax — multinomial NB on an
  * empty document is well-defined as argmax of the log-priors, and
  * the right anchor is what keeps those rows on the output.
  *
  * Standard multinomial smoothing: P(t|l) = (count + α) /
  * (tokensInVocab(l) + α(|V|+1)), the +1 slot being the shared unknown
  * bucket. Deterministic: vocabulary ties break lexicographically.
  */
object NaiveBayes {

  /** Driver-resident model: parallel arrays over `labels`. */
  case class NbModel(labels: Array[String], logPrior: Array[Double],
                     vocab: Array[String],
                     tokenLogProb: Array[Array[Double]], // vocab × labels
                     unkLogProb: Array[Double]) {
    require(labels.nonEmpty && vocab.nonEmpty)
  }

  def fit(docs: DataFrame, textCol: String, labelCol: String,
          vocabSize: Int = 8192, smoothing: Double = 1.0): NbModel = {
    require(vocabSize >= 1 && vocabSize <= (1 << 20),
      s"naive bayes: vocabSize=$vocabSize out of [1, 1048576]")
    require(smoothing > 0, s"naive bayes: smoothing must be > 0, got $smoothing")
    // priors first (the cheapest corpus scan): per-label doc counts, AND
    // the fail-loudly gate on NULL labels — a null key here would flow
    // into labels.sorted as an unexplained NullPointerException mid-fit,
    // and null-label tokens would silently vote in the vocabulary head
    val priors = docs.groupBy(col(labelCol).cast("string").as("_l"))
      .agg(count(lit(1)).as("_docs")).collect()
      .map { r =>
        require(!r.isNullAt(0),
          s"naive bayes: NULL $labelCol in ${r.getLong(1)} training rows — " +
            "labels must be non-null; filter them out before fit")
        r.getString(0) -> r.getLong(1)
      }.toMap
    val labels = priors.keys.toArray.sorted
    val labelIdx = labels.zipWithIndex.toMap
    val nDocs = priors.values.sum.toDouble
    val toks = docs.select(col(labelCol).cast("string").as("_l"),
        explode(graft.operators.TextOps.wsTokens(col(textCol))).as("_t"))
      .filter(length(col("_t")) > 0)
    // the one corpus-sized aggregation: (label, token) counts — PERSISTED,
    // because it has two consumers (the vocabulary head and the in-vocab
    // matrix) and without the persist each collect re-runs the corpus-wide
    // token explode + aggregation from the scan
    val counts = toks.groupBy(col("_l"), col("_t"))
      .agg(count(lit(1)).as("_n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // bounded vocabulary head (vocabSize strings collected)
      val vocab = counts.groupBy(col("_t")).agg(sum(col("_n")).as("_tot"))
        .orderBy(col("_tot").desc, col("_t"))
        .limit(vocabSize).select(col("_t"))
        .collect().map(_.getString(0)).sorted
      require(vocab.nonEmpty, "naive bayes: empty vocabulary — no tokens in corpus")
      val vocabIdx = vocab.zipWithIndex.toMap
      val vocabDf = docs.sparkSession
        .createDataFrame(
          java.util.Arrays.asList(vocab.map(t => Row(t)): _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("_t",
              org.apache.spark.sql.types.StringType))))
      // the vocab-sized count matrix — bounded collect
      // (≤ vocabSize × labels rows), served from the persisted counts
      val inVocab = counts.join(broadcast(vocabDf), Seq("_t"))
      val matRows = inVocab.collect()
      val tokTotals = new Array[Double](labels.length)
      val mat = Array.fill(vocab.length, labels.length)(0.0)
      matRows.foreach { r =>
        val t = r.getString(0); val l = r.getString(1); val n = r.getLong(2)
        mat(vocabIdx(t))(labelIdx(l)) = n.toDouble
        tokTotals(labelIdx(l)) += n.toDouble
      }
      val denom = labels.indices.map(li =>
        tokTotals(li) + smoothing * (vocab.length + 1)).toArray
      val tokenLogProb = Array.tabulate(vocab.length, labels.length)((vi, li) =>
        math.log((mat(vi)(li) + smoothing) / denom(li)))
      val unkLogProb = labels.indices.map(li =>
        math.log(smoothing / denom(li))).toArray
      val logPrior = labels.map(l => math.log(priors(l) / nDocs))
      NbModel(labels, logPrior, vocab, tokenLogProb, unkLogProb)
    } finally counts.unpersist(blocking = false)
  }

  /** Score each document and emit the argmax label as `nb_label` (plus
    * `nb_score`, its total log-probability). `idCol` keys the per-doc
    * aggregation; all other columns are preserved via a final join-free
    * select on the aggregated frame. */
  def predict(docs: DataFrame, idCol: String, textCol: String,
              model: NbModel): DataFrame = {
    val spark = docs.sparkSession
    val nL = model.labels.length
    val vocabRows = model.vocab.indices.map(vi =>
      Row(model.vocab(vi), model.tokenLogProb(vi).toSeq))
    val vocabDf = spark.createDataFrame(
      spark.sparkContext.parallelize(vocabRows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_t",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("_lp",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = false)))))
    val toks = docs.select(col(idCol),
        explode(graft.operators.TextOps.wsTokens(col(textCol))).as("_t"))
      .filter(length(col("_t")) > 0)
    // ONE aggregation pass: the broadcast join is LEFT, so out-of-vocab
    // tokens carry a null _lp — vector_sum skips nulls (in-vocab sum),
    // count(_lp) counts the matches, count(1) the total tokens. The
    // previous two-aggregation shape (inner-join matched + separate
    // totals) exploded and shuffled the token frame twice.
    val agg = toks.join(broadcast(vocabDf), Seq("_t"), "left")
      .groupBy(col(idCol))
      .agg(VectorAgg.vectorSum(col("_lp")).as("_invocab"),
        count(col("_lp")).as("_nmatch"),
        count(lit(1)).as("_ntok"))
    val priorLit = typedlit(model.logPrior.toSeq)
    val unkLit = typedlit(model.unkLogProb.toSeq)
    val labelsLit = typedlit(model.labels.toSeq)
    val scored = agg
      .withColumn("_scores",
        zip_with(priorLit,
          zip_with(
            coalesce(col("_invocab"), typedlit(Seq.fill(nL)(0.0))),
            unkLit,
            (iv, unk) => iv + unk * (col("_ntok") - col("_nmatch"))),
          (pr, rest) => pr + rest))
      .withColumn("nb_score", array_max(col("_scores")))
      .withColumn("nb_label",
        element_at(labelsLit, array_position(col("_scores"), col("nb_score"))
          .cast("int")))
      .select(col(idCol), col("nb_label"), round(col("nb_score"), 6).as("nb_score"))
    // Right-anchor on docs: a zero-token document (empty or null text)
    // never enters the token aggregation, and a silent null would break
    // the "score every document" contract — multinomial NB on an empty
    // document is the prior-only argmax (ties broken by first index =
    // lexicographically smallest label, same as array_position above).
    val priorBestIdx = model.logPrior.indices
      .minBy(i => (-model.logPrior(i), i))
    docs.join(scored, Seq(idCol), "left")
      .withColumn("nb_label",
        coalesce(col("nb_label"), lit(model.labels(priorBestIdx))))
      .withColumn("nb_score",
        coalesce(col("nb_score"),
          lit(BigDecimal(model.logPrior(priorBestIdx))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }
}
