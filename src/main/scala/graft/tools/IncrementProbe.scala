package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The controlled experiment behind the daily-increment scaling claim
  * (r13 verdict "What's wrong" #3): a FIXED-size batch curated against
  * corpora of growing size. The r13 probes compared increment vs rebuild
  * at one (batch, corpus) point per SF with the batch growing alongside
  * the corpus, which shows growth RATES but not the claim users care
  * about — "my daily crawl is the same size every day; what happens as
  * the corpus behind it grows 10×?". Here the batch is pinned (the
  * sf0.1 documents) and only the corpus grows, so:
  *
  *  - `increment_s`  should stay NEAR-FLAT in corpus size (the batch
  *    work is constant; the only corpus-proportional terms are the two
  *    single scans — LSH bucket probe and gram-index probe — both
  *    map-side against a broadcast batch),
  *  - `rebuild_s`    (curateCorpus over corpus ∪ batch) should grow
  *    ~linearly with the corpus,
  *  - and their ratio IS the measured answer to "the gap widens with
  *    every further 10×".
  *
  * Inputs (prefit, untimed — they are yesterday's state, not today's
  * work): the corpus cluster labels (md5 family, matching the
  * increment's generator), the corpus gram index, and the corpus-fit
  * (LM, BPE) gate models. Timing protocol mirrors Bench.medOrRep1:
  * med-of-3 unless rep1 alone blows the budget, and the protocol label
  * is printed into the JSON so rounds cannot silently mix protocols.
  *
  * Usage: IncrementProbe <batchSfDir> <corpusSfDir> [budgetSecs]
  * Prints one JSON line: {"metric":"increment_probe", ...}.
  */
object IncrementProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: IncrementProbe <batchSfDir> <corpusSfDir> [budgetSecs]")
    val (batchDir, corpusDir) = (args(0), args(1))
    val budget = if (args.length > 2) args(2).toDouble else 600.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "10min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Conf.applyTuned(spark)

    def evaluate(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def medOrRep1(f: () => Unit): (Double, String) = {
      val t0 = System.nanoTime(); f()
      val r1 = (System.nanoTime() - t0) / 1e9
      if (r1 > budget) (r1, "rep1")
      else {
        val ts = (Seq(r1) ++ (1 to 2).map { _ =>
          val t = System.nanoTime(); f(); (System.nanoTime() - t) / 1e9
        }).sorted
        (ts(1), "med3")
      }
    }

    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val batch = graft.Tables.documents(spark, batchDir)
      .select(col("doc_id"), col("text"))
    // disjoint ids: GenScale offsets doc_ids per copy, but the batch IS
    // copy 0 of every generated corpus — shift the batch ids above any
    // corpus id so "new documents" really are new (their text is still
    // copy-0 text: near-dups OF the corpus by construction, the
    // realistic recrawl mix)
    val maxCorpusId = graft.Tables.documents(spark, corpusDir)
      .agg(max(col("doc_id"))).head.getLong(0)
    val newDocs = batch.select((col("doc_id") + maxCorpusId + 1).as("doc_id"),
      col("text")).persist(lvl)
    val nBatch = newDocs.count()
    val corpus = graft.Tables.documents(spark, corpusDir)
      .select(col("doc_id"), col("text"))
    val nCorpus = corpus.count()
    System.err.println(s"[incprobe] batch=$nBatch docs (from $batchDir, " +
      s"ids shifted), corpus=$nCorpus docs (from $corpusDir)")

    // yesterday's state + corpus-fit models: inputs, untimed
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[incprobe] $label ${(System.nanoTime() - t0) / 1e9}%.1f s (input prefit, untimed)")
      r
    }
    val oldLabels = timed("prefit cluster labels") {
      val l = graft.operators.Dedup.dedupClusters(corpus, threshold = 0.8)
        .select(col("doc_id"), col("cluster_id")).persist(lvl)
      l.count(); l
    }
    val gramIx = timed("prefit gram index") {
      val g = graft.operators.Dedup.gramIndex(corpus, "text", n = 15)
        .persist(lvl)
      g.count(); g
    }
    val bucketIx = timed("prefit minhash bucket index") {
      // r15 normalized layout: persist BOTH frames (band keys small,
      // shingle sets once per document)
      val ix = graft.operators.Dedup.minhashBuckets(corpus, "text",
        md5Family = true)
      val b = graft.operators.Dedup.BucketIndex(
        ix.buckets.persist(lvl), ix.shingles.persist(lvl))
      b.buckets.count(); b.shingles.count(); b
    }
    val (lm, bpe) = timed("prefit gate models") {
      (graft.ml.NgramLm.fit(corpus, "text", maxUnigrams = 4096,
        maxBigrams = 8192, maxTrigrams = 8192),
        graft.ml.Bpe.fit(corpus, "text", numMerges = 50)._1)
    }

    val (incT, incProto) = medOrRep1(() => {
      val (inc, h) = graft.operators.Curation.curateIncrement(
        newDocs, "doc_id", "text", corpus, oldLabels, lm,
        maxPpl = 1e6, bpe, nearThreshold = 0.8, md5Family = true,
        bucketIndex = Some(bucketIx),
        spanIndex = Some(gramIx), spanN = 15, minKeptRatio = 0.1)
      try evaluate(inc) finally h.close()
    })
    System.err.println(f"[incprobe] increment $incT%.2f s ($incProto)")
    // the self-contained form (no persisted bucket index: the probe
    // derives the corpus buckets map-side from text) — the delta between
    // the two PRICES the index against the re-hash; r14 measured the
    // derive form faster at every scale probed (the index is ~8
    // shingle-set copies per doc, more bytes than the text it replaces),
    // so the index is a text-access-decoupling option, not a speedup
    val (incDeriveT, incDeriveProto) = medOrRep1(() => {
      val (inc, h) = graft.operators.Curation.curateIncrement(
        newDocs, "doc_id", "text", corpus, oldLabels, lm,
        maxPpl = 1e6, bpe, nearThreshold = 0.8, md5Family = true,
        spanIndex = Some(gramIx), spanN = 15, minKeptRatio = 0.1)
      try evaluate(inc) finally h.close()
    })
    System.err.println(f"[incprobe] increment (no bucket index) " +
      f"$incDeriveT%.2f s ($incDeriveProto)")

    val rebuilt = corpus.unionByName(newDocs)
    val (rebT, rebProto) = medOrRep1(() => {
      val (cur, h) = graft.operators.Curation.curateCorpus(
        rebuilt, "doc_id", "text", lm, maxPpl = 1e6, bpe,
        nearThreshold = 0.8, spanN = 15, minKeptRatio = 0.1)
      try evaluate(cur) finally h.close()
    })
    System.err.println(f"[incprobe] rebuild $rebT%.2f s ($rebProto)")

    println(f"""{"metric":"increment_probe","batch_docs":$nBatch,""" +
      f""""corpus_docs":$nCorpus,"increment_s":$incT%.2f,""" +
      f""""increment_protocol":"$incProto",""" +
      f""""increment_derive_s":$incDeriveT%.2f,""" +
      f""""increment_derive_protocol":"$incDeriveProto",""" +
      f""""rebuild_s":$rebT%.2f,""" +
      f""""rebuild_protocol":"$rebProto","corpus_dir":"$corpusDir"}""")
    spark.stop()
  }
}
