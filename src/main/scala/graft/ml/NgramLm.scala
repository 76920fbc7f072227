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
  * log-scores. Two corpus-sized exchanges at any scale: the per-doc
  * aggregation of the exploded token frame, and the right-anchor
  * docs-side join that keeps zero-token documents on the output (the
  * aggregated side re-uses the idCol partitioning where the planner
  * can).
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

  // gram assembly and context attach are NATIVE one-pass kernels
  // (functions.TokenNgrams / TokenContexts): the HOF formulations paid
  // ~3 interpreted lambdas per token and benched fit at 16 s / the
  // scoring projection at ~4 s at sf0.1 — the Md5ShingleHashSet lesson
  // applied to the LM.

  def fit(docs: DataFrame, textCol: String, maxUnigrams: Int = 1 << 16,
          maxBigrams: Int = 1 << 17, maxTrigrams: Int = 1 << 17,
          alpha: Double = 0.4): LmModel = {
    require(maxUnigrams >= 1 && maxBigrams >= 0 && maxTrigrams >= 0,
      s"ngram lm: non-positive head sizes ($maxUnigrams/$maxBigrams/$maxTrigrams)")
    require(alpha > 0 && alpha <= 1, s"ngram lm: alpha must be in (0,1], got $alpha")
    // one corpus-sized aggregation: (gram, count) across all three orders
    // (the order is recoverable from the key's space count) — persisted,
    // three bounded top-K heads consume it
    val counts = docs
      .select(explode(graft.functions.TokenNgrams(col(textCol), 3)).as("g"))
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

  /** A small broadcastable (key, score) frame. */
  private def scoreFrame(spark: org.apache.spark.sql.SparkSession,
                         kv: Seq[(String, Double)], keyCol: String,
                         valCol: String): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(kv.map { case (g, s) => Row(g, s) }: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(keyCol,
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField(valCol,
          org.apache.spark.sql.types.DoubleType, nullable = false))))

  /** Per-document LM statistics: `lm_tokens` (scored token count),
    * `lm_avg_logprob` (mean natural-log Stupid Backoff score) and
    * `lm_ppl` (= exp(−avg)). Right-anchored on `docs`: a zero-token
    * document (empty or null text) has NOTHING to score — it keeps its
    * row with `lm_tokens = 0` and NULL score/ppl, the documented
    * can't-assess marker (unlike NB's argmax, there is no prior-only
    * answer for perplexity). */
  /** Ratios folded at MODEL time, on the driver: a trigram is usable
    * only if its context bigram also survived pruning, so its entry IS
    * n(w₂w₁w)/n(w₂w₁) — likewise bigrams against their unigram context,
    * and unigrams carry the add-one smoothed score. ONE definition
    * shared by the broadcast-join [[score]] and the map-side
    * [[scoreMapSide]], so the two paths cannot drift arithmetically. */
  private[graft] def foldedRatios(model: LmModel): (Map[String, Double],
      Map[String, Double], Map[String, Double], Double) = {
    val floor1 = 1.0 / (model.nTokens + model.order1.size + 1)
    val tri = model.order3.toSeq.flatMap { case (g, n) =>
      val ctx = g.substring(0, g.lastIndexOf(' '))
      model.order2.get(ctx).map(cn => g -> n.toDouble / cn)
    }.toMap
    val bi = model.order2.toSeq.flatMap { case (g, n) =>
      val ctx = g.substring(0, g.lastIndexOf(' '))
      model.order1.get(ctx).map(cn => g -> n.toDouble / cn)
    }.toMap
    val uni = model.order1.map { case (g, n) =>
      g -> (n + 1.0) / (model.nTokens + model.order1.size + 1)
    }
    (uni, bi, tri, floor1)
  }

  def score(docs: DataFrame, idCol: String, textCol: String,
            model: LmModel): DataFrame = {
    val spark = docs.sparkSession
    // three broadcast tables (tri/bi/uni score) replace the five-join
    // count-attach formulation: same arithmetic (one IEEE double
    // division either way), 40% fewer probes of the exploded token frame
    // (measured 21.8 s → the three-join shape at sf0.1)
    val (uniR, biR, triR, floor1) = foldedRatios(model)
    val triT = scoreFrame(spark, triR.toSeq, "_kt", "_s3")
    val biT = scoreFrame(spark, biR.toSeq, "_kb", "_s2")
    val uniT = scoreFrame(spark, uniR.toSeq, "_ku", "_s1")
    // map-side context attach: (w, w1 = predecessor, w2 = pre-predecessor)
    // via the native TokenContexts kernel (null/empty text → no rows)
    val toks = docs.select(col(idCol),
        explode(graft.functions.TokenContexts(col(textCol))).as("t"))
      .select(col(idCol), col("t.w").as("w"), col("t.w1").as("w1"),
        col("t.w2").as("w2"))
    // concat_ws SKIPS nulls, so a position-0 token's bigram key would
    // collapse to the bare unigram and hit a REAL unigram row — every
    // contextful key is nulled out when its context is absent
    val attached = toks
      .join(broadcast(triT),
        when(col("w2").isNotNull,
          concat_ws(" ", col("w2"), col("w1"), col("w"))) === col("_kt"),
        "left").drop("_kt")
      .join(broadcast(biT),
        when(col("w1").isNotNull,
          concat_ws(" ", col("w1"), col("w"))) === col("_kb"),
        "left").drop("_kb")
      .join(broadcast(uniT), col("w") === col("_ku"), "left").drop("_ku")
    val a = lit(model.alpha)
    val s1 = coalesce(col("_s1"), lit(floor1))
    val sBi = coalesce(col("_s2"), a * s1)
    val sTok =
      when(col("w2").isNotNull, coalesce(col("_s3"), a * sBi))
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

  /** Map-side scoring twin of [[score]] — same three output columns,
    * appended ROW-LOCALLY by the native [[graft.functions.LmScoreDoc]]
    * kernel (no explode, no groupBy, no join). This is the form a
    * Structured Streaming curation gate needs: [[score]]'s per-document
    * aggregation and right-anchor join are stateful operators on a
    * stream, while this is a projection over a broadcast-shipped model.
    * NgramLmSpec pins lm_avg_logprob BIT equality between the two paths
    * over the corpus (same fold, same coalesce chain, same accumulation
    * order — a document's exploded rows never split across partitions
    * in the join form); StreamingSpec replays the composed curation
    * gate (ppl + compression ratio + BPE token budget) in two
    * micro-batches == batch. Null text scores like empty text:
    * lm_tokens = 0, NULL score/ppl — the join form's right-anchor
    * contract. */
  def scoreMapSide(docs: DataFrame, textCol: String,
                   model: LmModel): DataFrame = {
    val (uni, bi, tri, floor1) = foldedRatios(model)
    docs
      .withColumn("_lm", graft.functions.LmScoreDoc(
        coalesce(col(textCol), lit("")), uni, bi, tri, floor1, model.alpha))
      .withColumn("lm_tokens", col("_lm").getField("lm_tokens"))
      .withColumn("lm_avg_logprob", col("_lm").getField("lm_avg_logprob"))
      .withColumn("lm_ppl", exp(-col("lm_avg_logprob")))
      .drop("_lm")
  }

  /** [[perplexityFilter]] in map-side form — the streaming-safe gate
    * (no id column needed; the score never leaves its row). Same
    * drop-if-unassessable contract: zero-token documents are dropped. */
  def perplexityFilterMapSide(docs: DataFrame, textCol: String,
                              model: LmModel, maxPpl: Double): DataFrame = {
    require(maxPpl > 0, s"ngram lm: maxPpl must be positive, got $maxPpl")
    scoreMapSide(docs, textCol, model)
      .filter(col("lm_ppl").isNotNull && col("lm_ppl") <= maxPpl)
      .select(docs.columns.map(col).toSeq: _*)
  }
}
