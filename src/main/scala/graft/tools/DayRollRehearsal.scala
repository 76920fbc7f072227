package graft.tools

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.IncrementStore
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.CurationResume

/** The DAY-BOUNDARY rollover rehearsal (r18 verdict #1) — the one
  * composition the single-day rehearsal (DailyLoopRehearsal, r18) never
  * ran: a multi-day loop where at each boundary the stream restarts
  * against a FRESH checkpoint with yesterday's keepers folded into the
  * corpus state, under the day-roll recipe the `CurationResume`
  * scaladoc defines (day-scoped batch ids via `storeSink(store, day)` +
  * `fromStore(store, day)`; the fresh checkpoint renumbers batches from
  * 0, which without the day scope is exactly the silently-dropped-batch
  * hazard the r18 precondition named).
  *
  *  1. corpus = half the documents table (curated yesterday-state:
  *     cluster labels, gram index, gate models — prefit, untimed);
  *  2. the other half arrives as nDays × batchesPerDay real
  *     checkpointed file-source micro-batches — ONE incoming dir and
  *     ONE checkpoint per day;
  *  3. day 2's first batch additionally carries COPIES (fresh ids,
  *     same text) of day-1 KEEPERS — the cross-day loop closure: they
  *     must come back `dup_of_corpus` carrying the day-1 cluster id,
  *     which only happens if the boundary fold really carried day 1's
  *     accepted state across the restart;
  *  4. run A injects a mid-day-2 CRASH after a batch's STORE commit but
  *     before its CHECKPOINT commit, then resumes with
  *     `fromStore(day = 2)` against the SAME day-2 checkpoint — the
  *     r18 replay window, now with day-1 history in the store (the
  *     skip set must be day-2's ids only; the replay must not
  *     double-append);
  *  5. run B is the unbroken 3-day control; the two verdict histories
  *     must be equal (per-(day, batch) counts + order-independent row
  *     hash over every column);
  *  6. per-batch walls for every day go on the record — day-2/3 flat
  *     vs day-1 IS the O(micro-batch) claim surviving the boundary
  *     fold (state deepens by a day of keepers at each roll);
  *  7. the finished history is compactRange'd and re-read pruned.
  *
  * Usage: DayRollRehearsal <sfDir> <workDir> [nDays=3] [batchesPerDay=3]
  * Prints one JSON line {"metric":"day_roll_rehearsal",...}; the full
  * log is the forensics artifact. */
object DayRollRehearsal {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: DayRollRehearsal <sfDir> <workDir> [nDays] [batchesPerDay]")
    val sfDir = args(0)
    val work = args(1)
    val nDays = if (args.length > 2) args(2).toInt else 3
    val perDay = if (args.length > 3) args(3).toInt else 3
    require(nDays >= 2, "need >= 2 days for a boundary")
    require(perDay >= 2, "need >= 2 batches/day (crash + post-resume)")
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
    def log(s: String): Unit = System.err.println(s"[dayroll] $s")
    def timed[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      val t = (System.nanoTime() - t0) / 1e9
      log(f"$label ${t}%.2f s"); (r, t)
    }

    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val degenerate = col("text").isNull || col("text").rlike("^\\s*$")
    val corpus = docs.filter(col("doc_id") % 2 === 0 && !degenerate)
      .persist(lvl)
    val nCorpus = corpus.count()
    val incoming = docs.filter(col("doc_id") % 2 === 1)
    val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
    val nSlices = nDays * perDay
    log(s"corpus=$nCorpus docs, sfDir=$sfDir, $nDays days x $perDay " +
      s"batches, production hash family (xxhash64)")

    // stage each micro-batch as ONE parquet file (atomic feed = one
    // micro-batch per feed; see DailyLoopRehearsal's rationale)
    val batchesDir = s"$work/batches"
    def stage(df: DataFrame, name: String): Long = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$batchesDir/$name")
      spark.read.parquet(s"$batchesDir/$name").count()
    }
    val sliceCounts = (0 until nSlices).map { i =>
      val b = incoming.filter(
        pmod(floor(col("doc_id") / 2), lit(nSlices)) === i)
      val n = stage(b, s"s$i")
      log(s"staged slice $i: $n docs")
      n
    }
    val docsSchema = spark.read.parquet(s"$batchesDir/s0").schema

    // yesterday's state + corpus-fit gate models (inputs, untimed)
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

    final case class Run(tag: String) {
      val store = IncrementStore(s"$work/store_$tag/verdicts",
        s"$work/store_$tag/manifest", filesPerIncrement = 8)
      val walls = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      val expectedNext = new java.util.concurrent.atomic.AtomicLong(0L)
      var curDay = 0L

      def incomingDir(day: Int) = s"$work/incoming_${tag}_d$day"
      def ckpt(day: Int) = s"$work/ckpt_${tag}_d$day"

      def feed(day: Int, name: String): Unit = {
        val src = new Path(s"$batchesDir/$name")
        val staged = fs.listStatus(src)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        require(staged.length == 1,
          s"$name must be one file for an atomic feed, got ${staged.length}")
        fs.mkdirs(new Path(incomingDir(day)))
        val tmp = new Path(incomingDir(day), s".tmp_$name.parquet")
        FileUtil.copy(fs, staged.head.getPath, fs, tmp, false,
          spark.sessionState.newHadoopConf())
        fs.rename(tmp, new Path(incomingDir(day), s"$name.parquet"))
        ()
      }

      def baseSink(id: Long, v: DataFrame): Unit = {
        require(id == expectedNext.get,
          s"$tag day $curDay: micro-batch id $id but expected " +
            s"${expectedNext.get} — the file source split a feed")
        CurationResume.storeSink(store, day = curDay)(id,
          v.select(col("doc_id"), col("text"), col("cluster_id"),
            col("curation_reject")))
        expectedNext.incrementAndGet()
        log(s"$tag day $curDay store commit batch $id")
      }

      def start(day: Int, resume: Option[CurationResume],
                sink: (Long, DataFrame) => Unit) = {
        curDay = day.toLong
        fs.mkdirs(new Path(incomingDir(day)))
        val stream = spark.readStream.schema(docsSchema)
          .parquet(incomingDir(day))
        StreamingOps.curationIncrementStream(
          stream, "doc_id", "text", corpus, oldLabels, lm,
          maxPpl = 1e6, bpe, nearThreshold = 0.8, md5Family = false,
          spanIndex = Some(gramIx), spanN = 15, minKeptRatio = 0.1,
          resume = resume)(sink)
          .option("checkpointLocation", ckpt(day)).start()
      }

      def feedAndWait(q: org.apache.spark.sql.streaming.StreamingQuery,
                      day: Int, name: String): Unit = {
        val t0 = System.nanoTime()
        feed(day, name)
        q.processAllAvailable()
        val t = (System.nanoTime() - t0) / 1e9
        walls += (s"d${day}_$name" -> t)
        log(f"$tag day $day $name wall=${t}%.2f s (feed+curate+commit)")
      }

      /** One full day under the day-roll recipe; `crashAt` injects the
        * mid-day crash after that batch index's store commit. Returns
        * the resume-from-store seconds when a crash was rehearsed. */
      def runDay(day: Int, names: Seq[String],
                 crashAt: Option[Int]): Option[Double] = {
        val resume =
          if (day == 1) None
          else Some(CurationResume.fromStore(spark, store, day = day.toLong))
        resume.foreach { r =>
          log(s"$tag day $day boundary resume: " +
            s"${r.committedBatchIds.size} committed id(s) for this day " +
            s"(${r.committedBatchIds.toSeq.sorted.mkString(",")})")
          require(r.committedBatchIds.isEmpty,
            s"day-$day start must have an empty day-scoped skip set")
        }
        crashAt match {
          case None =>
            expectedNext.set(0L)
            val q = start(day, resume, baseSink)
            names.foreach(n => feedAndWait(q, day, n))
            q.stop()
            None
          case Some(k) =>
            expectedNext.set(0L)
            @volatile var armed = true
            val crashing: (Long, DataFrame) => Unit = (id, v) => {
              baseSink(id, v)
              if (id == k && armed)
                throw new RuntimeException("injected mid-day crash: " +
                  s"day $day batch $id durable in store, not in checkpoint")
            }
            val q = start(day, resume, crashing)
            names.take(k).foreach(n => feedAndWait(q, day, n))
            def causes(e: Throwable): Seq[Throwable] =
              Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
                .take(10).toSeq
            val t0 = System.nanoTime()
            try {
              feed(day, names(k))
              q.processAllAvailable()
              sys.error("crash injection did not fire")
            } catch {
              case e: Throwable if causes(e).exists(c =>
                  Option(c.getMessage)
                    .exists(_.contains("injected mid-day crash"))) =>
                walls += (s"d${day}_${names(k)}" ->
                  (System.nanoTime() - t0) / 1e9)
                log(f"$tag day $day: query died as injected after batch " +
                  f"$k's store commit (wall=${(System.nanoTime() - t0) / 1e9}%.2f s)")
            }
            armed = false
            try q.stop() catch { case scala.util.control.NonFatal(_) => () }
            // the mid-day restart: same day, SAME checkpoint — day-1
            // history is in the store and must not poison the skip set
            val (resume2, resumeS) =
              timed(s"$tag day $day mid-day CurationResume.fromStore") {
                CurationResume.fromStore(spark, store, day = day.toLong)
              }
            require(resume2.committedBatchIds == (0 to k).map(_.toLong).toSet,
              s"mid-day-$day skip set must be this day's committed ids: " +
                s"${resume2.committedBatchIds}")
            val preRows = store.readAll(spark).count()
            expectedNext.set(k + 1L)
            val q2 = start(day, Some(resume2), baseSink)
            val tR = System.nanoTime()
            q2.processAllAvailable() // re-delivers batch k: must skip
            log(f"$tag day $day: restart replayed the checkpoint-" +
              f"uncommitted batch in ${(System.nanoTime() - tR) / 1e9}%.2f s")
            val postRows = store.readAll(spark).count()
            require(postRows == preRows,
              s"double-append on day-$day replay: $preRows -> $postRows")
            names.drop(k + 1).foreach(n => feedAndWait(q2, day, n))
            q2.stop()
            Some(resumeS)
        }
      }
    }

    // ---- run A: days 1..n with a mid-day-2 crash. Day-2's first slice
    // file is re-staged after day 1 to carry the keeper COPIES (one
    // file = one micro-batch, so the copies ride inside batch 0). ----
    val runA = Run("A")
    log("run A day 1")
    runA.runDay(1, (0 until perDay).map(i => s"s$i"), None)

    // stage day-2 batch 0 = slice + COPIES of day-1 keepers (fresh ids,
    // same text) — the cross-day closure probe. Both runs share it.
    val day1Keepers = runA.store.readAll(spark)
      .filter(col("curation_reject").isNull && col("day") === 1L)
      .select(col("doc_id").as("src_id"), col("text"))
      .persist(lvl)
    val nKeep1 = day1Keepers.count()
    val nCopies = math.min(500L, nKeep1)
    val copies = day1Keepers.orderBy(col("src_id")).limit(nCopies.toInt)
      .select((col("src_id") + maxId + 1000000L).as("doc_id"), col("text"))
    // staged under a NEW name (d2b0): writing back into s{perDay} while
    // lazily reading it would delete the very files being read
    val d2b0 = spark.read.parquet(s"$batchesDir/s$perDay")
      .unionByName(copies)
    val nD2b0 = stage(d2b0, "d2b0")
    log(s"day-1 keepers=$nKeep1; staged $nCopies copies into day-2 " +
      s"batch 0 (now $nD2b0 docs)")
    val day2Names = "d2b0" +: (1 until perDay).map(i => s"s${perDay + i}")

    log("run A day 2 (with injected mid-day crash)")
    val resumeS = runA.runDay(2, day2Names, Some(1)).get
    (3 to nDays).foreach { d =>
      log(s"run A day $d")
      runA.runDay(d, (0 until perDay).map(i => s"s${(d - 1) * perDay + i}"),
        None)
    }

    // ---- run B: the unbroken control over the SAME staged batches ----
    val runB = Run("B")
    (1 to nDays).foreach { d =>
      log(s"run B day $d")
      val names =
        if (d == 2) day2Names
        else (0 until perDay).map(i => s"s${(d - 1) * perDay + i}")
      runB.runDay(d, names, None)
    }

    // ---- equality + cross-day closure ----
    def hist(r: Run): DataFrame = r.store.readAll(spark)
    def perBatch(df: DataFrame): Map[(Long, Long), Long] =
      df.groupBy(col("day"), col("batch_id")).count().collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def classCounts(df: DataFrame): Map[String, Long] =
      df.groupBy(coalesce(col("curation_reject"), lit("keep")).as("c"))
        .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def digest(df: DataFrame): (Long, Long) = {
      val h = xxhash64(col("doc_id"),
        coalesce(col("cluster_id"), lit(-1L)),
        coalesce(col("curation_reject"), lit("keep")),
        col("batch_id"), col("day"), coalesce(col("text"), lit("")))
      val row = df.select(h.as("h")).agg(count(lit(1)).as("n"),
        expr("bit_xor(h)").as("x")).head
      (row.getLong(0), row.getLong(1))
    }
    val (hA, hB) = (hist(runA), hist(runB))
    val (pbA, pbB) = (perBatch(hA), perBatch(hB))
    require(pbA == pbB, s"per-(day,batch) counts diverged:\n$pbA\nvs\n$pbB")
    val (ccA, ccB) = (classCounts(hA), classCounts(hB))
    log(s"run A verdict classes: ${ccA.toSeq.sortBy(_._1).mkString(", ")}")
    require(ccA == ccB, s"verdict classes diverged:\n$ccA\nvs\n$ccB")
    val (dA, dB) = (digest(hA), digest(hB))
    require(dA == dB, s"histories diverged: $dA vs $dB")
    log(s"histories EQUAL: ${dA._1} rows, order-independent xxhash64 " +
      s"bit_xor matches (${dA._2})")

    // every day-2 copy of a day-1 keeper must be dup_of_corpus carrying
    // its day-1 source cluster id
    val srcClusters = hA.filter(col("day") === 1L &&
        col("curation_reject").isNull)
      .select(col("doc_id"), col("cluster_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val copyRows = hA.filter(col("doc_id") > maxId).collect()
    require(copyRows.length == nCopies, s"${copyRows.length} copy verdicts")
    val iReject = copyRows.head.fieldIndex("curation_reject")
    val iCluster = copyRows.head.fieldIndex("cluster_id")
    val iId = copyRows.head.fieldIndex("doc_id")
    val badCopies = copyRows.filterNot { r =>
      !r.isNullAt(iReject) && r.getString(iReject) == "dup_of_corpus" &&
        !r.isNullAt(iCluster) &&
        srcClusters.get(r.getLong(iId) - maxId - 1000000L)
          .contains(r.getLong(iCluster))
    }
    require(badCopies.isEmpty,
      s"${badCopies.length}/$nCopies day-2 copies did not come back " +
        s"dup_of_corpus of their day-1 source cluster, e.g. " +
        s"${badCopies.take(3).mkString("; ")}")
    log(s"cross-day closure: all $nCopies day-2 copies of day-1 keepers " +
      "rejected dup_of_corpus with the day-1 cluster id")

    // ---- maintenance: compactRange the finished history ----
    val filesBefore = runA.store.manifest(spark).count()
    val pbBefore = perBatch(hA)
    val (_, compactS) = timed("run A: compactRange over the history") {
      runA.store.compactRange(spark,
        Map("doc_id" -> (null: Any, null: Any)),
        targetFileBytes = 128L << 20)
    }
    val filesAfter = runA.store.manifest(spark).count()
    val pbAfter = perBatch(runA.store.readAll(spark))
    require(pbAfter == pbBefore, "compacted history diverged")
    log(s"compactRange: $filesBefore files -> $filesAfter, per-(day,batch) " +
      "reads row-exact, gate green")

    def wallsJson(r: Run): String =
      r.walls.map { case (k, v) => f""""$k":$v%.2f""" }.mkString("{", ",", "}")
    println(s"""{"metric":"day_roll_rehearsal","sf_dir":"$sfDir",""" +
      s""""corpus_docs":$nCorpus,"n_days":$nDays,"batches_per_day":$perDay,""" +
      s""""slice_docs":[${sliceCounts.mkString(",")}],""" +
      s""""day1_keepers":$nKeep1,"day2_copies":$nCopies,""" +
      s""""walls_broken":${wallsJson(runA)},""" +
      s""""walls_unbroken":${wallsJson(runB)},""" +
      f""""midday2_resume_from_store_s":$resumeS%.2f,""" +
      s""""replay_skip_no_double_append":true,"histories_equal":true,""" +
      s""""copies_all_dup_of_corpus":true,"verdict_classes":{${
        ccA.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString(",")
      }},""" +
      f""""compact_range_s":$compactS%.2f,""" +
      s""""store_files_before_after":[$filesBefore,$filesAfter]}""")
    spark.stop()
  }
}
