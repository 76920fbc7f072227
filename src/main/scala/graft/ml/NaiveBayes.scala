package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.VectorAgg

/** Multinomial Naive Bayes over whitespace tokens — the classic text
  * classification baseline, expressed as the engine's fourth instance of
  * the sufficient-statistics pattern (k-means, ridge, IRLS, and now NB):
  * FIT is ONE aggregation pass — per-(label, token) counts with map-side
  * partials — plus a bounded-vocabulary head; the model
  * (vocab × labels log-probabilities, label log-priors) is
  * driver-resident and broadcast back for scoring, exactly like the
  * k-means centroid matrix and ridge β.
  *
  * PREDICT is distributed and join-shaped, deliberately NOT a per-token
  * probe of a literal map (Catalyst's map-literal lookup is a linear
  * scan — vocab-sized work PER TOKEN): tokens explode once, a broadcast
  * hash join attaches each in-vocab token's log-prob vector, one
  * groupBy(doc) sums vectors via the native `vector_sum` aggregate, and
  * out-of-vocab tokens contribute the smoothed unknown bucket times
  * their count. Two shuffles at any corpus size: the token explode's
  * groupBy(doc) and nothing else (the vocab side broadcasts).
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
    val toks = docs.select(col(labelCol).cast("string").as("_l"),
        explode(graft.operators.TextOps.wsTokens(col(textCol))).as("_t"))
      .filter(length(col("_t")) > 0)
    // the one corpus-sized aggregation: (label, token) counts
    val counts = toks.groupBy(col("_l"), col("_t"))
      .agg(count(lit(1)).as("_n"))
    // bounded vocabulary head (global counts derive from the same frame —
    // Catalyst reuses the aggregation's exchange for both consumers when
    // it can; either way the collected state is vocabSize strings)
    val vocab = counts.groupBy(col("_t")).agg(sum(col("_n")).as("_tot"))
      .orderBy(col("_tot").desc, col("_t"))
      .limit(vocabSize).select(col("_t"))
      .collect().map(_.getString(0)).sorted
    require(vocab.nonEmpty, "naive bayes: empty vocabulary — no tokens in corpus")
    val vocabIdx = vocab.zipWithIndex.toMap
    // per-label document and in-vocab token totals; then the vocab-sized
    // count matrix — all bounded collects (≤ vocabSize × labels rows)
    val priors = docs.groupBy(col(labelCol).cast("string").as("_l"))
      .agg(count(lit(1)).as("_docs")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val labels = priors.keys.toArray.sorted
    val labelIdx = labels.zipWithIndex.toMap
    val nDocs = priors.values.sum.toDouble
    val vocabDf = docs.sparkSession
      .createDataFrame(
        java.util.Arrays.asList(vocab.map(t => Row(t)): _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("_t",
            org.apache.spark.sql.types.StringType))))
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
    // in-vocab contribution: one vector_sum per doc over broadcast-joined
    // log-prob vectors; matched-token count rides along for the unknown
    // bucket arithmetic
    val matched = toks.join(broadcast(vocabDf), Seq("_t"))
      .groupBy(col(idCol))
      .agg(VectorAgg.vectorSum(col("_lp")).as("_invocab"),
        count(lit(1)).as("_nmatch"))
    val totals = toks.groupBy(col(idCol)).agg(count(lit(1)).as("_ntok"))
    val priorLit = typedlit(model.logPrior.toSeq)
    val unkLit = typedlit(model.unkLogProb.toSeq)
    val labelsLit = typedlit(model.labels.toSeq)
    val scored = totals.join(matched, Seq(idCol), "left")
      .withColumn("_scores",
        zip_with(priorLit,
          zip_with(
            coalesce(col("_invocab"), typedlit(Seq.fill(nL)(0.0))),
            unkLit,
            (iv, unk) => iv + unk *
              (col("_ntok") - coalesce(col("_nmatch"), lit(0L)))),
          (pr, rest) => pr + rest))
      .withColumn("nb_score", array_max(col("_scores")))
      .withColumn("nb_label",
        element_at(labelsLit, array_position(col("_scores"), col("nb_score"))
          .cast("int")))
      .select(col(idCol), col("nb_label"), round(col("nb_score"), 6).as("nb_score"))
    docs.join(scored, Seq(idCol), "left")
  }
}
