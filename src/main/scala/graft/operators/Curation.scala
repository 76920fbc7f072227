package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The end-to-end corpus-curation recipe — the one place that answers
  * "how do I curate a crawl with this engine" by CHAINING the
  * individually-specced stages in their load-bearing order:
  *
  *   manifest-pruned read  (upstream of this function — the composed
  *                          100 TB path: Manifest.pruneFiles over the
  *                          lake listing, then spark.read.parquet on the
  *                          survivors; ConfSpec executes it end-to-end)
  *   → no_tokens fast-path (null / whitespace-only text)
  *   → exact dedup         ([[Dedup.exactKeepFirst]], keep-first)
  *   → near dedup          ([[Dedup.dedupClusters]] over banded
  *                          MinHash-LSH candidates, min-id canonical)
  *   → substring dedup     ([[Dedup.duplicatedSpans]] + [[Dedup.cutSpans]]:
  *                          boilerplate CUT from survivors, docs gutted
  *                          below `minKeptRatio` rejected outright)
  *   → quality gate        ([[TextOps.curationGate]]: LM perplexity,
  *                          compress-ratio band, BPE token budget — one
  *                          map-side pass, first-failing reason)
  *   → embedding screen    ([[graft.ml.Pca.reconstructionError]] >
  *                          `maxRecErr` — optional, only rows with an
  *                          embedding are screened)
  *   → packing             (downstream of this function —
  *                          [[TextOps.packChunks]] on the keepers;
  *                          packing changes row identity from documents
  *                          to training chunks, so it is a consumer of
  *                          this output, not a stage of it)
  *
  * Order rationale: exact before near (an exact twin would otherwise
  * seed a near-dup cluster and could be elected its canonical while
  * itself already rejected — the whole cluster would die); near before
  * substring (cutting boilerplate first would perturb shingle sets and
  * near-dup recall); cuts before the gate (the gate must judge the text
  * a training run would actually see — doc 5 of the spec passes the
  * gate ONLY because its boilerplate was cut first); the embedding
  * screen last (it is the most expensive signal per row, so it sees the
  * fewest rows).
  *
  * Output: ONE row per input document — (doc_id, text, curation_reject)
  * where `curation_reject` is NULL for keepers and otherwise the FIRST
  * stage that rejected the row (`no_tokens`, `exact_dup`, `near_dup`,
  * `boilerplate_gutted`, the [[TextOps.curationGate]] reasons
  * `high_perplexity` / `low_compress_ratio` / `high_compress_ratio` /
  * `token_budget`, `embedding_outlier`); `text` is the document's text
  * AS OF its final stage (post-cut for everything that survived the
  * substring stage — i.e. keepers carry the text a training run should
  * ingest, and rejects carry the evidence that condemned them).
  * Post-cut text keeps the document's ORIGINAL CASE ([[Dedup.cutSpans]]
  * cuts from original-case tokens; only whitespace runs collapse) —
  * the recipe never case-folds what it keeps, it only case-folds what
  * it HASHES.
  * Per-stage reject counts are one aggregation away
  * ([[rejectCounts]]) — no stage in this function runs a count of its
  * own, so adding the recipe on top of the stages costs zero extra
  * actions beyond [[Dedup.dedupClusters]]' internal fixpoint (which is
  * eager by its own contract).
  *
  * Scale shape: every stage is the already-probed operator — nothing
  * here shuffles anything the stages don't. The recipe persists the
  * three frames that are consulted by more than one downstream leg (the
  * standardized input; the exact-survivor frame the LSH fixpoint scans
  * repeatedly; the post-cut survivor frame that feeds the gate, the
  * screen AND the final union) at MEMORY_AND_DISK, and hands the caller
  * a [[FuzzyJoin.PersistHandle]] owning all three — materialize the
  * result (and anything derived), then `close()` (the fuzzyJoinPersisted
  * contract; closing early degrades to recompute, never to wrong rows).
  */
object Curation {

  /** Optional embedding-quality screen: rows of `embeddings` whose
    * `embCol` reconstruction error under `model` exceeds `maxRecErr`
    * reject their document as `embedding_outlier`. Documents WITHOUT an
    * embedding row pass unscreened — absence of evidence is not
    * garbage, and at 100 TB the embedded subset is typically the
    * curated minority. */
  final case class EmbedScreen(embeddings: DataFrame, idCol: String,
                               embCol: String, model: graft.ml.Pca.PcaModel,
                               maxRecErr: Double)

  /** Per-stage reject tally of a [[curateCorpus]] result: one row per
    * reject reason plus the NULL row for keepers. */
  def rejectCounts(curated: DataFrame): DataFrame =
    curated.groupBy(col("curation_reject")).agg(count(lit(1)).as("n"))

  def curateCorpus(docs: DataFrame, idCol: String, textCol: String,
                   lm: graft.ml.NgramLm.LmModel, maxPpl: Double,
                   bpe: graft.ml.Bpe.BpeModel,
                   minTokens: Int = 1, maxTokens: Int = Int.MaxValue,
                   minCompressRatio: Double = 0.0,
                   maxCompressRatio: Double = Double.MaxValue,
                   nearThreshold: Double = 0.8,
                   spanN: Int = 20, minKeptRatio: Double = 0.3,
                   embedScreen: Option[EmbedScreen] = None)
      : (DataFrame, FuzzyJoin.PersistHandle) = {
    require(minKeptRatio >= 0.0 && minKeptRatio <= 1.0,
      s"curate: minKeptRatio $minKeptRatio outside [0, 1]")
    require(nearThreshold > 0.0 && nearThreshold <= 1.0,
      s"curate: nearThreshold $nearThreshold outside (0, 1]")
    val lvl = StorageLevel.MEMORY_AND_DISK
    def reject(ids: DataFrame, from: DataFrame, reason: String): DataFrame =
      from.join(ids, Seq("doc_id")).select(col("doc_id"), col("text"),
        lit(reason).as("curation_reject"))

    // standardized working frame — internal names, one column each way
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .persist(lvl)

    // stage 0: degenerate text out FIRST. A null document is not a
    // "duplicate" of another null document in any curation sense, and
    // the dedup stages' shingle algebra degenerates on empty token
    // streams (null and "" share the singleton empty shingle — they
    // would cluster as near-dups and one would steal a canonical slot).
    // Whitespace-only is the TOKENIZER's notion (`\s`-only text — the
    // same class the `\s+` split sees), not trim()'s ASCII-space-only
    // one: a '\t'- or '\n'-only document has zero tokens too (r13
    // ADVICE — trim() let those flow into the shingle algebra).
    val degenerate = col("text").isNull || col("text").rlike("^\\s*$")
    val rej0 = base.filter(degenerate)
      .select(col("doc_id"), col("text"), lit("no_tokens").as("curation_reject"))
    val s0 = base.filter(!degenerate)

    // stage 1: exact dedup, keep-first
    val exact = Dedup.exactKeepFirst(s0, "text")
    val rej1 = reject(exact.filter(col("is_dup") === 1).select("doc_id"),
      s0, "exact_dup")
    val s1 = s0.join(exact.filter(col("is_dup") === 0).select("doc_id"),
      Seq("doc_id")).persist(lvl)

    // stage 2: near dedup (eager — dedupClusters runs its label
    // fixpoint at call time, which is why s1 is persisted first)
    val clusters = Dedup.dedupClusters(s1, nearThreshold)
    val rej2 = reject(clusters.filter(col("is_canonical") === 0)
      .select("doc_id"), s1, "near_dup")
    val s2 = s1.join(clusters.filter(col("is_canonical") === 1)
      .select("doc_id"), Seq("doc_id"))

    // stage 3: substring dedup — cut the shared spans, reject the gutted
    val spans = Dedup.duplicatedSpans(s2, "doc_id", "text", n = spanN)
    val cut = Dedup.cutSpans(s2, spans, "doc_id", "text")
    val rej3 = cut.filter(col("kept_ratio") < minKeptRatio)
      .select(col("doc_id"), col("text_dedup").as("text"),
        lit("boilerplate_gutted").as("curation_reject"))
    val s3 = cut.filter(col("kept_ratio") >= minKeptRatio)
      .select(col("doc_id"), col("text_dedup").as("text")).persist(lvl)

    // stage 4: the composed quality gate (map-side; first-failing reason)
    val gated = TextOps.curationGate(s3, "text", lm, maxPpl, bpe,
      minTokens, maxTokens, minCompressRatio, maxCompressRatio)
    val rej4 = gated.filter(col("gate_reason").isNotNull)
      .select(col("doc_id"), col("text"),
        col("gate_reason").as("curation_reject"))
    val s4 = gated.filter(col("gate_reason").isNull)
      .select(col("doc_id"), col("text"))

    // stage 5: embedding-quality screen (optional, evidence-only)
    val (rej5, s5) = embedScreen match {
      case None => (None, s4)
      case Some(es) =>
        // distinct: a doc with several embedding rows (re-embeds, shard
        // overlap) must reject ONCE — duplicate outlier ids would break
        // the one-row-per-input-document invariant (r13 ADVICE)
        val bad = graft.ml.Pca.reconstructionError(
            es.embeddings.select(col(es.idCol).as("doc_id"), col(es.embCol)),
            es.embCol, es.model)
          .filter(col("pca_rec_err") > es.maxRecErr).select("doc_id")
          .distinct()
        (Some(reject(bad, s4, "embedding_outlier")),
          s4.join(bad, Seq("doc_id"), "left_anti"))
    }

    val keepers = s5.select(col("doc_id"), col("text"),
      lit(null).cast("string").as("curation_reject"))
    val out = (Seq(keepers, rej0, rej1, rej2, rej3, rej4) ++ rej5)
      .reduce(_ unionByName _)
    (out, new FuzzyJoin.PersistHandle(Seq(base, s1, s3)))
  }

  /** Owns everything a [[curateIncrement]] call pinned: the persisted
    * batch frames AND the incremental-label fixpoint's checkpoint.
    * Same contract as the other handles: materialize first, `close()`
    * after; early close degrades to recompute, never to wrong rows. */
  final class IncrementHandle private[operators] (inner: Seq[AutoCloseable])
      extends AutoCloseable {
    override def close(): Unit = inner.foreach(_.close())
  }

  /** The DAILY-INCREMENT form of [[curateCorpus]]: curate a NEW batch of
    * documents against an EXISTING curated corpus in O(batch) work plus
    * one corpus scan — no corpus shuffle, no corpus-wide fixpoint
    * (re-deriving connected components over 100 TB because 0.1% new
    * documents arrived is not viable; this is [[Dedup.incrementalLabels]]'
    * contract lifted to the whole recipe).
    *
    * Stages, and how they differ from the batch recipe:
    *  - no_tokens fast-path and within-batch exact dedup: identical.
    *  - near dedup is the INCREMENTAL machinery: LSH candidates within
    *    the batch plus batch-bucket probes against the corpus
    *    ([[Dedup.incrementalCandidatePairs]] — batch side broadcast, the
    *    corpus side scanned once, never shuffled), then
    *    [[Dedup.incrementalLabels]]' frozen-old-labels attach. A new doc
    *    ATTACHED to an existing cluster duplicates content the corpus
    *    already has → `dup_of_corpus` (its corpus `cluster_id` is kept
    *    on the reject row — the forensics answer "duplicate of WHAT").
    *    Exact duplicates of corpus docs land here too (identical
    *    shingle sets ⇒ identical signatures ⇒ guaranteed band
    *    collision, Jaccard 1 ≥ any threshold). Unattached new
    *    components keep their min-id canonical; the rest are
    *    `near_dup`, exactly like the batch recipe.
    *  - the substring-cut stage runs IFF the caller supplies
    *    `spanIndex` (a [[Dedup.gramIndex]] frame — built once per
    *    corpus snapshot, persisted/bucketed like the label index):
    *    [[Dedup.duplicatedSpansIncrement]] flags spans duplicated
    *    against the corpus OR within the batch (batch gram set
    *    broadcast, corpus index scanned once, never shuffled), the
    *    spans are CUT, and docs gutted below `minKeptRatio` reject as
    *    `boilerplate_gutted` — identical semantics to the batch
    *    recipe's stage. Without an index the stage is SKIPPED
    *    (within-batch-only spans on a daily increment would mostly
    *    miss: the boilerplate's other copies live in the corpus), and
    *    the gate's compression-ratio tail is the honestly-weaker
    *    backstop.
    *  - the quality gate runs with CORPUS-fit models passed in (the
    *    in-domain distribution is the corpus's, not the increment's —
    *    fitting the LM on one day's crawl would make every topical
    *    shift "out of domain").
    *  - optional embedding screen: identical.
    *
    * Output: one row per input doc — (doc_id, text, cluster_id,
    * curation_reject). `cluster_id` is the increment label where one
    * was assigned (NULL for no_tokens / within-batch exact rejects):
    * keepers' (doc_id, cluster_id) rows are EXACTLY what the caller
    * appends to `oldLabels` before the next increment — the daily loop
    * closes over this output. `rejectCounts` works unchanged. */
  def curateIncrement(newDocs: DataFrame, idCol: String, textCol: String,
                      oldDocs: DataFrame, oldLabels: DataFrame,
                      lm: graft.ml.NgramLm.LmModel, maxPpl: Double,
                      bpe: graft.ml.Bpe.BpeModel,
                      minTokens: Int = 1, maxTokens: Int = Int.MaxValue,
                      minCompressRatio: Double = 0.0,
                      maxCompressRatio: Double = Double.MaxValue,
                      nearThreshold: Double = 0.8,
                      md5Family: Boolean = false,
                      spanIndex: Option[DataFrame] = None,
                      spanN: Int = 20, minKeptRatio: Double = 0.3,
                      embedScreen: Option[EmbedScreen] = None)
      : (DataFrame, IncrementHandle) = {
    require(nearThreshold > 0.0 && nearThreshold <= 1.0,
      s"curate increment: nearThreshold $nearThreshold outside (0, 1]")
    require(minKeptRatio >= 0.0 && minKeptRatio <= 1.0,
      s"curate increment: minKeptRatio $minKeptRatio outside [0, 1]")
    val lvl = StorageLevel.MEMORY_AND_DISK
    val base = newDocs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .persist(lvl)
    // same tokenizer-matched whitespace class as the batch recipe's
    // stage 0 (see curateCorpus — trim() misses '\t'/'\n'-only text)
    val degenerate = col("text").isNull || col("text").rlike("^\\s*$")
    val rej0 = base.filter(degenerate)
      .select(col("doc_id"), col("text"),
        lit(null).cast("long").as("cluster_id"),
        lit("no_tokens").as("curation_reject"))
    val s0 = base.filter(!degenerate)
    val exact = Dedup.exactKeepFirst(s0, "text")
    val rej1 = s0.join(exact.filter(col("is_dup") === 1).select("doc_id"),
        Seq("doc_id"))
      .select(col("doc_id"), col("text"),
        lit(null).cast("long").as("cluster_id"),
        lit("exact_dup").as("curation_reject"))
    val s1 = s0.join(exact.filter(col("is_dup") === 0).select("doc_id"),
      Seq("doc_id")).persist(lvl)
    val (nn, no) = Dedup.incrementalCandidatePairs(s1,
      oldDocs.select(col("doc_id"), col("text")), "text",
      threshold = nearThreshold, md5Family = md5Family)
    val (labels, labelH) = Dedup.incrementalLabels(s1, oldLabels, nn, no)
    def labeledReject(ids: DataFrame, reason: String): DataFrame =
      s1.join(ids, Seq("doc_id")).select(col("doc_id"), col("text"),
        col("cluster_id"), lit(reason).as("curation_reject"))
    val rej2a = labeledReject(labels.filter(col("attached_to_existing") === 1)
      .select("doc_id", "cluster_id"), "dup_of_corpus")
    val rej2b = labeledReject(labels.filter(col("attached_to_existing") === 0
        && col("cluster_id") =!= col("doc_id"))
      .select("doc_id", "cluster_id"), "near_dup")
    val s2 = s1.join(labels.filter(col("attached_to_existing") === 0
        && col("cluster_id") === col("doc_id"))
      .select("doc_id", "cluster_id"), Seq("doc_id")).persist(lvl)
    // optional substring stage: cut corpus-or-batch-duplicated spans,
    // reject the gutted — texts downstream (incl. keepers) are post-cut
    val (rej2c, s2b) = spanIndex match {
      case None => (None, s2)
      case Some(ix) =>
        val spans = Dedup.duplicatedSpansIncrement(s2, "doc_id", "text",
          ix, n = spanN)
        val cut = Dedup.cutSpans(s2, spans, "doc_id", "text")
          .join(s2.select("doc_id", "cluster_id"), Seq("doc_id"))
        (Some(cut.filter(col("kept_ratio") < minKeptRatio)
          .select(col("doc_id"), col("text_dedup").as("text"),
            col("cluster_id"),
            lit("boilerplate_gutted").as("curation_reject"))),
          cut.filter(col("kept_ratio") >= minKeptRatio)
            .select(col("doc_id"), col("text_dedup").as("text"),
              col("cluster_id")).persist(lvl))
    }
    val gated = TextOps.curationGate(s2b, "text", lm, maxPpl, bpe,
      minTokens, maxTokens, minCompressRatio, maxCompressRatio)
    val rej3 = gated.filter(col("gate_reason").isNotNull)
      .select(col("doc_id"), col("text"), col("cluster_id"),
        col("gate_reason").as("curation_reject"))
    val s3 = gated.filter(col("gate_reason").isNull)
      .select(col("doc_id"), col("text"), col("cluster_id"))
    val (rej4, s4) = embedScreen match {
      case None => (None, s3)
      case Some(es) =>
        // distinct for the same one-row-per-doc reason as the batch form
        val bad = graft.ml.Pca.reconstructionError(
            es.embeddings.select(col(es.idCol).as("doc_id"), col(es.embCol)),
            es.embCol, es.model)
          .filter(col("pca_rec_err") > es.maxRecErr).select("doc_id")
          .distinct()
        (Some(s3.join(bad, Seq("doc_id")).select(col("doc_id"), col("text"),
          col("cluster_id"), lit("embedding_outlier").as("curation_reject"))),
          s3.join(bad, Seq("doc_id"), "left_anti"))
    }
    val keepers = s4.select(col("doc_id"), col("text"), col("cluster_id"),
      lit(null).cast("string").as("curation_reject"))
    val out = (Seq(keepers, rej0, rej1, rej2a, rej2b) ++ rej2c ++
      Seq(rej3) ++ rej4).reduce(_ unionByName _)
    val persisted = Seq(base, s1, s2) ++ (if (s2b ne s2) Seq(s2b) else Nil)
    (out, new IncrementHandle(Seq(
      new FuzzyJoin.PersistHandle(persisted), labelH)))
  }
}
