package graft.tools

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.IncrementStore
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.CurationResume

/** The composed daily curation loop, run END-TO-END at the scale corpus
  * (r17 verdict #1): every piece — `curationIncrementStream`'s
  * O(micro-batch) roll-forward, the `IncrementStore` sink,
  * `CurationResume.fromStore`, `compactRange` — is individually
  * spec-pinned, but the composition had only ever run on toy
  * MemoryStream batches. This is the operational rehearsal:
  *
  *  1. corpus = half the documents table (yesterday's curated state:
  *     cluster labels, gram index, gate models — prefit, untimed);
  *  2. the other half arrives as N micro-batches through a REAL
  *     checkpointed file source (not MemoryStream — restart semantics
  *     are the checkpoint's, which is the contract under test);
  *  3. verdicts land through [[CurationResume.storeSink]] (clustered +
  *     manifested, batch_id stamped);
  *  4. run A injects a mid-day CRASH after batch 1's STORE commit but
  *     before its CHECKPOINT commit — the exact window where a restart
  *     re-delivers a batch whose verdicts are already durable — then
  *     resumes via [[CurationResume.fromStore]] (state rebuilt purely
  *     from disk, same checkpointLocation) and finishes the day. The
  *     re-delivered batch must be SKIPPED (no double-append: the
  *     store's row counts prove it);
  *  5. run B is the unbroken control — same batches, no crash;
  *  6. the two verdict histories must be equal (count + per-class
  *     counts + order-independent row hash over every column);
  *  7. the finished day is compactRange'd and the history re-read
  *     pruned — the maintenance step of the daily cadence.
  *
  * Per-batch wall times go on the record for BOTH runs: near-flat
  * across batches IS the O(micro-batch) claim measured at scale (the
  * r17 plan-pin said the rolled gram index adds zero exchanges; this
  * prints the seconds).
  *
  * Usage: DailyLoopRehearsal <sfDir> <workDir> [nBatches=4]
  * Prints one JSON line {"metric":"daily_loop_rehearsal",...}; the full
  * log is the forensics artifact.
  */
object DailyLoopRehearsal {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: DailyLoopRehearsal <sfDir> <workDir> [nBatches]")
    val sfDir = args(0)
    val work = args(1)
    val nBatches = if (args.length > 2) args(2).toInt else 4
    require(nBatches >= 3, "need >= 3 batches: one before the crash, " +
      "the crash batch, and at least one after the resume")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "10min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Conf.applyTuned(spark)
    val fs = new Path(work).getFileSystem(spark.sessionState.newHadoopConf())
    def log(s: String): Unit = System.err.println(s"[rehearsal] $s")

    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val degenerate = col("text").isNull || col("text").rlike("^\\s*$")
    // yesterday's corpus = even ids (curated: non-degenerate); today's
    // crawl = odd ids, cut into nBatches contiguous-ish slices
    val corpus = docs.filter(col("doc_id") % 2 === 0 && !degenerate)
      .persist(lvl)
    val nCorpus = corpus.count()
    val incoming = docs.filter(col("doc_id") % 2 === 1)
    log(s"corpus=$nCorpus docs, sfDir=$sfDir, nBatches=$nBatches, " +
      s"production hash family (xxhash64)")

    // stage each micro-batch as its own parquet dir (the feed source)
    def timed[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      val t = (System.nanoTime() - t0) / 1e9
      log(f"$label ${t}%.2f s"); (r, t)
    }
    // ONE parquet file per batch: the feed is a single atomic rename, so
    // the running file source sees each day-slice as exactly one
    // micro-batch (per-file copies of a multi-file batch trickle into
    // the default trigger's continuous listing and split the slice
    // across micro-batch ids — observed live at sf10)
    val batchesDir = s"$work/batches"
    val batchCounts = (0 until nBatches).map { i =>
      val b = incoming.filter(pmod(floor(col("doc_id") / 2), lit(nBatches)) === i)
      b.coalesce(1).write.mode("overwrite").parquet(s"$batchesDir/b$i")
      val n = spark.read.parquet(s"$batchesDir/b$i").count()
      log(s"staged batch $i: $n docs (single file)")
      n
    }
    val docsSchema = spark.read.parquet(s"$batchesDir/b0").schema

    // yesterday's state + corpus-fit gate models: inputs, untimed work
    // (the daily loop holds these from the previous snapshot)
    val (oldLabels, _) = timed("prefit cluster labels (input, untimed)") {
      val l = graft.operators.Dedup.dedupClusters(corpus, threshold = 0.8,
        candidatePairs = (d, t) =>
          graft.operators.Dedup.minhashPairs(d, "text", threshold = t))
        .select(col("doc_id"), col("cluster_id")).persist(lvl)
      l.count(); l
    }
    val (gramIx, _) = timed("prefit gram index (input, untimed)") {
      val g = graft.operators.Dedup.gramIndex(corpus, "text", n = 15)
        .persist(lvl)
      g.count(); g
    }
    val ((lm, bpe), _) = timed("prefit gate models (input, untimed)") {
      (graft.ml.NgramLm.fit(corpus, "text", maxUnigrams = 4096,
        maxBigrams = 8192, maxTrigrams = 8192),
        graft.ml.Bpe.fit(corpus, "text", numMerges = 50)._1)
    }

    // ---- the streaming day ----
    final case class Run(tag: String) {
      val incomingDir = s"$work/incoming_$tag"
      val ckpt = s"$work/ckpt_$tag"
      val store = IncrementStore(s"$work/store_$tag/verdicts",
        s"$work/store_$tag/manifest", filesPerIncrement = 8)
      val walls = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      fs.mkdirs(new Path(incomingDir))

      /** Atomically surface batch i's staged file to the file source:
        * copy to a hidden name (ignored by the source), ONE rename. */
      def feedFiles(i: Int): Unit = {
        val src = new Path(s"$batchesDir/b$i")
        val staged = fs.listStatus(src)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        require(staged.length == 1,
          s"batch $i must be one file for an atomic feed, got ${staged.length}")
        val tmp = new Path(incomingDir, s".tmp_b$i.parquet")
        FileUtil.copy(fs, staged.head.getPath, fs, tmp, false,
          spark.sessionState.newHadoopConf())
        fs.rename(tmp, new Path(incomingDir, s"b$i.parquet"))
        ()
      }

      def start(resume: Option[CurationResume],
                sink: (Long, DataFrame) => Unit) = {
        val stream = spark.readStream.schema(docsSchema).parquet(incomingDir)
        StreamingOps.curationIncrementStream(
          stream, "doc_id", "text", corpus, oldLabels, lm,
          maxPpl = 1e6, bpe, nearThreshold = 0.8, md5Family = false,
          spanIndex = Some(gramIx), spanN = 15, minKeptRatio = 0.1,
          resume = resume)(sink)
          .option("checkpointLocation", ckpt).start()
      }

      // one-feed-one-micro-batch is load-bearing for the crash window
      // and the per-batch walls; a drifting id means the source split a
      // feed and every downstream label would lie — fail loudly instead
      val expectedNext = new java.util.concurrent.atomic.AtomicLong(0L)

      def baseSink(id: Long, v: DataFrame): Unit = {
        require(id == expectedNext.get,
          s"$tag: micro-batch id $id but expected ${expectedNext.get} — " +
            "the file source split a feed across micro-batches")
        val t0 = System.nanoTime()
        CurationResume.storeSink(store)(id,
          v.select(col("doc_id"), col("text"), col("cluster_id"),
            col("curation_reject")))
        expectedNext.incrementAndGet()
        log(f"$tag store commit batch $id (write ${(System.nanoTime() - t0) / 1e9}%.2f s)")
      }

      def feedAndWait(q: org.apache.spark.sql.streaming.StreamingQuery,
                      i: Int): Unit = {
        val t0 = System.nanoTime()
        feedFiles(i)
        q.processAllAvailable()
        val t = (System.nanoTime() - t0) / 1e9
        walls += (s"batch$i" -> t)
        log(f"$tag batch $i wall=${t}%.2f s (feed+curate+commit)")
      }
    }

    // ---- run A: crash after batch 1's store commit, resume from disk ----
    val runA = Run("A")
    log("run A: start (will crash after batch 1's store commit, " +
      "BEFORE its checkpoint commit — the replay window)")
    @volatile var crashArmed = true
    val crashingSink: (Long, DataFrame) => Unit = (id, v) => {
      runA.baseSink(id, v)
      if (id == 1 && crashArmed)
        throw new RuntimeException(
          "injected mid-day crash: batch 1 is durable in the store but " +
            "not in the checkpoint commit log")
    }
    val qA = runA.start(None, crashingSink)
    runA.feedAndWait(qA, 0)
    def causeChain(e: Throwable): Seq[Throwable] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq
    val tCrash0 = System.nanoTime()
    try {
      runA.feedFiles(1)
      qA.processAllAvailable()
      sys.error("crash injection did not fire — batch 1 completed")
    } catch {
      case e: Throwable
          if causeChain(e).exists(c => Option(c.getMessage)
            .exists(_.contains("injected mid-day crash"))) =>
        val t = (System.nanoTime() - tCrash0) / 1e9
        runA.walls += ("batch1" -> t)
        log(f"run A: query died as injected after batch 1's store " +
          f"commit (wall=${t}%.2f s); driver state is gone")
    }
    crashArmed = false
    try qA.stop() catch { case scala.util.control.NonFatal(_) => () }

    // resume: EVERYTHING rebuilt from the durable store — one call, same
    // checkpointLocation (the hard precondition)
    val (resume, resumeS) = timed("run A: CurationResume.fromStore") {
      CurationResume.fromStore(spark, runA.store)
    }
    log(s"run A: resume state = ${resume.committedBatchIds.size} committed " +
      s"batch id(s) ${resume.committedBatchIds.toSeq.sorted.mkString(",")}")
    require(resume.committedBatchIds == Set(0L, 1L),
      s"expected batches 0,1 durable, got ${resume.committedBatchIds}")
    val preResumeRows = runA.store.readAll(spark).count()
    val qA2 = runA.start(Some(resume), runA.baseSink)
    // the restarted query re-delivers batch 1 from the offset log before
    // taking new data; the committed-id skip must fire (no double-append)
    val tReplay0 = System.nanoTime()
    qA2.processAllAvailable()
    log(f"run A: restart replayed the uncommitted-in-checkpoint batch in " +
      f"${(System.nanoTime() - tReplay0) / 1e9}%.2f s (skip expected — " +
      "see the WARN above)")
    val postReplayRows = runA.store.readAll(spark).count()
    require(postReplayRows == preResumeRows,
      s"double-append: $preResumeRows rows before replay, $postReplayRows after")
    val skipFired = postReplayRows == preResumeRows
    (2 until nBatches).foreach(i => runA.feedAndWait(qA2, i))
    qA2.stop()

    // ---- run B: the unbroken control ----
    val runB = Run("B")
    log("run B: unbroken control")
    val qB = runB.start(None, runB.baseSink)
    (0 until nBatches).foreach(i => runB.feedAndWait(qB, i))
    qB.stop()

    // ---- verdict-history equality ----
    def classCounts(df: DataFrame): Map[String, Long] =
      df.groupBy(coalesce(col("curation_reject"), lit("keep")).as("c"))
        .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def histDigest(df: DataFrame): (Long, Long) = {
      // order-independent: per-row xxhash64 over every column, bit_xor'd
      val h = xxhash64(col("doc_id"),
        coalesce(col("cluster_id"), lit(-1L)),
        coalesce(col("curation_reject"), lit("keep")),
        col("batch_id"), coalesce(col("text"), lit("")))
      val row = df.select(h.as("h")).agg(count(lit(1)).as("n"),
        expr("bit_xor(h)").as("x")).head
      (row.getLong(0), row.getLong(1))
    }
    val histA = runA.store.readAll(spark)
    val histB = runB.store.readAll(spark)
    val (ccA, ccB) = (classCounts(histA), classCounts(histB))
    log(s"run A verdict classes: ${ccA.toSeq.sortBy(_._1).mkString(", ")}")
    log(s"run B verdict classes: ${ccB.toSeq.sortBy(_._1).mkString(", ")}")
    require(ccA == ccB, s"verdict class counts diverged:\n$ccA\nvs\n$ccB")
    val (dA, dB) = (histDigest(histA), histDigest(histB))
    require(dA == dB, s"verdict histories diverged: digest $dA vs $dB")
    log(s"histories EQUAL: ${dA._1} rows, order-independent xxhash64 " +
      s"bit_xor over every column matches (${dA._2})")

    // ---- the maintenance step: compactRange the finished day ----
    val idBounds = histA.filter(col("batch_id") >= 0)
      .agg(min(col("doc_id")), max(col("doc_id"))).head
    val filesBefore = runA.store.manifest(spark).count()
    val perBatchBefore = histA.groupBy(col("batch_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (_, compactS) = timed("run A: compactRange over the day's id range") {
      runA.store.compactRange(spark,
        Map("doc_id" -> (idBounds.getLong(0), idBounds.getLong(1))),
        targetFileBytes = 128L << 20)
    }
    val filesAfter = runA.store.manifest(spark).count()
    val perBatchAfter = runA.store.readRange(spark,
        Map("doc_id" -> (idBounds.getLong(0), idBounds.getLong(1))))
      .groupBy(col("batch_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(perBatchAfter == perBatchBefore,
      s"compacted history diverged:\n$perBatchBefore\nvs\n$perBatchAfter")
    log(s"compactRange: $filesBefore files -> $filesAfter, per-batch " +
      "pruned reads row-exact, staleness gate green")

    def wallsJson(r: Run): String =
      r.walls.map { case (k, v) => f""""$k":$v%.2f""" }.mkString("{", ",", "}")
    println(s"""{"metric":"daily_loop_rehearsal","sf_dir":"$sfDir",""" +
      s""""corpus_docs":$nCorpus,"batch_docs":[${batchCounts.mkString(",")}],""" +
      s""""n_batches":$nBatches,"walls_broken":${wallsJson(runA)},""" +
      s""""walls_unbroken":${wallsJson(runB)},""" +
      f""""resume_from_store_s":$resumeS%.2f,""" +
      s""""replay_skip_no_double_append":$skipFired,""" +
      s""""histories_equal":true,"verdict_classes":{${
        ccA.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString(",")
      }},""" +
      f""""compact_range_s":$compactS%.2f,""" +
      s""""store_files_before_after":[$filesBefore,$filesAfter]}""")
    spark.stop()
  }
}
