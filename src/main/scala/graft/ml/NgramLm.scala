package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** N-gram language model with Stupid Backoff scoring (Brants et al. 2007,
  * "Large Language Models in Machine Translation" — the backoff scheme
  * built FOR distributed web-scale counts: no discounting passes, no
  * normalization constants, just raw count ratios with a fixed backoff
  * penalty α). Perplexity filtering against an in-domain LM is a standard
  * LLM-curation gate (the CCNet recipe), and at 100 TB it has to be
  * exactly this shape: counting is ONE distributed aggregation, the model
  * is a bounded driver-resident head, scoring is map-side broadcast-join
  * arithmetic.
  *
  * FIT: one explode pass emits every 1/2/3-gram of each document
  * (space-joined token windows, all three orders in the same explode), one
  * groupBy(gram) count with map-side partials, and three bounded top-K
  * heads collect the model (most-frequent grams per order, ties broken
  * lexicographically — deterministic). N (the unigram mass) is summed
  * BEFORE pruning, so pruning never inflates unigram probabilities.
  *
  * SCORE: tokens explode with their two predecessors attached map-side
  * (struct windows over the token array — no window function, no extra
  * shuffle), then FIVE broadcast hash joins against the one gram table
  * attach n(w₂w₁w), n(w₂w₁), n(w₁w), n(w₁), n(w); the per-token Stupid
  * Backoff score is pure column arithmetic and one groupBy(doc) averages
  * log-scores. The only shuffle at any corpus size is that final
  * per-document aggregation.
  *
  * Scoring arithmetic, per token position:
  *  - position 0 (no context): S₁(w)
  *  - position 1: n(w₁w)/n(w₁) if the bigram AND its context survive
  *    pruning, else α·S₁(w)
  *  - position ≥2: n(w₂w₁w)/n(w₂w₁) if trigram AND context survive, else
  *    α·(bigram rule), else α²·S₁(w)
  * with S₁(w) = (n(w)+1)/(N+U+1) — add-one smoothed over the KEPT unigram
  * vocabulary U, so out-of-vocabulary tokens score a finite floor instead
  * of −∞ (pure Stupid Backoff leaves S₁ unsmoothed; a PRUNED model needs
  * the floor, and the +1/U+1 choice keeps every score in (0, 1)).
  * A gram is usable only when BOTH its count and its context's count
  * survived pruning: with per-order top-K heads a trigram can outrank its
  * own context bigram's order-2 cut, and a ratio against a missing
  * context would be unnormalizable.
  */
object NgramLm {

  /** Driver-resident model: per-order gram counts (space-joined keys),
    * the unpruned unigram mass N, and the backoff penalty. */
  case class LmModel(order1: Map[String, Long], order2: Map[String, Long],
                     order3: Map[String, Long], nTokens: Long,
                     alpha: Double) {
    require(order1.nonEmpty, "ngram lm: empty unigram table")
    require(nTokens >= order1.values.max,
      "ngram lm: unigram mass below the largest unigram count — corrupt model")
  }

  /** All 1/2/3-grams of a token array as space-joined strings, one
    * concat'd array per document — the single explode payload. */
  private def allGrams(ts: Column): Column = {
    def order(n: Int): Column =
      when(size(ts) >= n,
        transform(sequence(lit(0), size(ts) - n),
          i => concat_ws(" ", slice(ts, i + 1, lit(n)))))
        .otherwise(array().cast("array<string>"))
    concat(order(1), order(2), order(3))
  }

  def fit(docs: DataFrame, textCol: String, maxUnigrams: Int = 1 << 16,
          maxBigrams: Int = 1 << 17, maxTrigrams: Int = 1 << 17,
          alpha: Double = 0.4): LmModel = {
    require(maxUnigrams >= 1 && maxBigrams >= 0 && maxTrigrams >= 0,
      s"ngram lm: non-positive head sizes ($maxUnigrams/$maxBigrams/$maxTrigrams)")
    require(alpha > 0 && alpha <= 1, s"ngram lm: alpha must be in (0,1], got $alpha")
    val ts = graft.operators.TextOps.wsTokens(col(textCol))
    // one corpus-sized aggregation: (gram, count) across all three orders
    // (the order is recoverable from the key's space count) — persisted,
    // three bounded top-K heads consume it
    val counts = docs
      .select(explode(allGrams(
        filter(ts, t => length(t) > 0))).as("g"))
      .filter(length(col("g")) > 0)
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
      .withColumn("ord",
        size(split(col("g"), " ", -1)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def head(ord: Int, k: Int): Map[String, Long] =
        if (k == 0) Map.empty
        else counts.filter(col("ord") === ord)
          .orderBy(col("n").desc, col("g"))
          .limit(k).select(col("g"), col("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // N sums the UNPRUNED unigram counts — pruning must shrink the
      // numerator set, never the denominator mass. sum() over an empty
      // frame is NULL, so the emptiness check reads the row, not getLong.
      val nRow = counts.filter(col("ord") === 1).agg(sum(col("n"))).head
      require(!nRow.isNullAt(0), "ngram lm: empty corpus — no tokens to count")
      val uni = head(1, maxUnigrams)
      LmModel(uni, head(2, maxBigrams), head(3, maxTrigrams),
        nRow.getLong(0), alpha)
    } finally counts.unpersist(blocking = false)
  }

  /** The model's grams as one small broadcastable (g, n) frame. */
  private def gramFrame(spark: org.apache.spark.sql.SparkSession,
                        model: LmModel): DataFrame = {
    val rows = (model.order1 ++ model.order2 ++ model.order3)
      .toSeq.map { case (g, n) => Row(g, n) }
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_g",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("_n",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Per-document LM statistics: `lm_tokens` (scored token count),
    * `lm_avg_logprob` (mean natural-log Stupid Backoff score) and
    * `lm_ppl` (= exp(−avg)). Right-anchored on `docs`: a zero-token
    * document (empty or null text) has NOTHING to score — it keeps its
    * row with `lm_tokens = 0` and NULL score/ppl, the documented
    * can't-assess marker (unlike NB's argmax, there is no prior-only
    * answer for perplexity). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: LmModel): DataFrame = {
    val grams = gramFrame(docs.sparkSession, model)
    /** Left-join `df` against the broadcast gram table on `key`,
      * attaching the gram's count as column `as`. */
    def attach(df: DataFrame, key: Column, as: String): DataFrame =
      df.join(
        broadcast(grams.select(col("_g").as(s"_k$as"), col("_n").as(as))),
        key === col(s"_k$as"), "left").drop(s"_k$as")
    val ts = filter(graft.operators.TextOps.wsTokens(col(textCol)),
      t => length(t) > 0)
    // map-side context attach: (w, w1 = predecessor, w2 = pre-predecessor).
    // The size guard matters: sequence(1, 0) is a DESCENDING [1, 0] in
    // Spark (step is inferred), and element_at(ts, 0) throws — an empty
    // token array must explode to zero rows, not two broken ones.
    val toks = docs.select(col(idCol), explode(
      when(size(ts) >= 1,
        transform(sequence(lit(1), size(ts)), i => struct(
          element_at(ts, i).as("w"),
          when(i >= 2, element_at(ts, i - 1)).as("w1"),
          when(i >= 3, element_at(ts, i - 2)).as("w2"))))).as("t"))
      .select(col(idCol), col("t.w").as("w"), col("t.w1").as("w1"),
        col("t.w2").as("w2"))
    // concat_ws SKIPS nulls, so a position-0 token's bigram key would
    // collapse to the bare unigram and hit a REAL unigram row — every
    // contextful key is nulled out when its context is absent
    val w1Ok = col("w1").isNotNull
    val w2Ok = col("w2").isNotNull
    val attached = Seq[(String, Column)](
      "_tri" -> when(w2Ok, concat_ws(" ", col("w2"), col("w1"), col("w"))),
      "_ctx2" -> when(w2Ok, concat_ws(" ", col("w2"), col("w1"))),
      "_bi" -> when(w1Ok, concat_ws(" ", col("w1"), col("w"))),
      "_ctx1" -> when(w1Ok, col("w1")),
      "_uni" -> col("w")
    ).foldLeft(toks) { case (df, (as, key)) => attach(df, key, as) }
    val a = lit(model.alpha)
    val s1 = (coalesce(col("_uni"), lit(0L)) + 1).cast("double") /
      lit(model.nTokens + model.order1.size + 1).cast("double")
    val biOk = col("_bi").isNotNull && col("_ctx1").isNotNull
    val triOk = col("_tri").isNotNull && col("_ctx2").isNotNull
    val sBi = when(biOk, col("_bi").cast("double") / col("_ctx1"))
      .otherwise(a * s1)
    val sTok =
      when(col("w2").isNotNull,
        when(triOk, col("_tri").cast("double") / col("_ctx2")).otherwise(a * sBi))
      .when(col("w1").isNotNull, sBi)
      .otherwise(s1)
    val perDoc = attached.withColumn("_ls", log(sTok))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("lm_tokens"),
        avg(col("_ls")).as("lm_avg_logprob"))
      .withColumn("lm_ppl", exp(-col("lm_avg_logprob")))
    docs.join(perDoc, Seq(idCol), "left")
      .withColumn("lm_tokens", coalesce(col("lm_tokens"), lit(0L)))
  }

  /** The curation gate: keep documents whose perplexity under the
    * in-domain model is at most `maxPpl`. Zero-token documents are
    * DROPPED — an empty document carries no evidence either way, and a
    * curation filter that cannot assess a row must not pass it silently.
    * Returns the surviving rows of `docs` (original columns only). */
  def perplexityFilter(docs: DataFrame, idCol: String, textCol: String,
                       model: LmModel, maxPpl: Double): DataFrame = {
    require(maxPpl > 0, s"ngram lm: maxPpl must be positive, got $maxPpl")
    score(docs, idCol, textCol, model)
      .filter(col("lm_ppl").isNotNull && col("lm_ppl") <= maxPpl)
      .select(docs.columns.map(col).toSeq: _*)
  }
}
