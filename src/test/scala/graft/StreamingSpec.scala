package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingOps

class StreamingSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  /** File streaming sources need a directory: stage the single events
    * parquet file into a temp dir once.
    *
    * LOAD-BEARING for the batch-equivalence tests below: ONE file and no
    * maxFilesPerTrigger means Trigger.AvailableNow processes the whole
    * fixture as a SINGLE micro-batch, so every key's events are sorted
    * together by the per-batch sort inside the stateful operators
    * (lastWindowStream, funnel, sessionize). Splitting the fixture across
    * files could split a key's events across batches in file order, which
    * the operators' documented in-order contract does not cover — add
    * files here and the equivalence assertions stop being guaranteed. */
  private lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("streaming windowed agg equals the batch tumbling agg") {
    val stream = StreamingOps.readEvents(spark, eventsDir)
    // complete mode: one-shot replay emits every window's final totals
    val q = StreamingOps.windowedAgg(stream).writeStream
      .outputMode("complete").format("memory").queryName("stream_win_c")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("stream_win_c")
      .select("w_start_ms", "event_type", "n", "v")
    val want = operators.Relational.qTumblingAgg(spark, sf)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
  }

  test("streaming sessionization emits the same closed sessions as batch") {
    val batchSessions = operators.TimeSeriesQueries.tsSessionize(spark, sf)
    // replay events as a stream of Ev
    val stream = StreamingOps.readEvents(spark, eventsDir)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("value"))
      .as[StreamingOps.Ev]
    val sessions = StreamingOps.sessionizeStream(stream, gapUs = 1800000000L)
    val q = sessions.writeStream
      .outputMode("append").format("memory").queryName("stream_sess")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("stream_sess")
    // all events arrive in one batch → every session except each user's
    // last (still open in state) must match a batch session exactly
    val gotKeyed = got.select("user_id", "sess_start_us", "sess_end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batchKeyed = batchSessions
      .select(col("user_id"), col("sess_start_us"), col("sess_end_us"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(gotKeyed.nonEmpty, "no sessions emitted")
    assert(gotKeyed.subsetOf(batchKeyed),
      s"streaming emitted sessions not present in batch: ${(gotKeyed -- batchKeyed).take(3)}")
    // and it must have emitted nearly all of them (all but ≤1 open per user)
    val nUsers = batchSessions.select("user_id").distinct.count()
    assert(gotKeyed.size >= batchKeyed.size - nUsers)
  }

  test("streaming ewma equals the batch recurrence on a one-batch replay") {
    val batch = operators.TimeSeriesQueries.tsEwma(spark, sf)
      .select(col("user_id"), col("event_id"), col("ewma"))
    val stream = StreamingOps.readEvents(spark, eventsDir)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("value"))
      .as[StreamingOps.Ev]
    val q = StreamingOps.ewmaStream(stream, alpha = 0.1).toDF()
      .writeStream.outputMode("append").format("memory").queryName("stream_ewma")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("stream_ewma")
      .select(col("user_id"), col("event_id"), round(col("ewma"), 6).as("ewma_s"))
    val joined = batch.join(got, Seq("user_id", "event_id"))
    assert(joined.count() == batch.count(), "row sets differ")
    // identical fold expression + one-batch replay → exactly equal after
    // the same round-6 the batch query applies
    assert(joined.filter(col("ewma") =!= col("ewma_s")).count() == 0)
  }

  test("streaming funnel reaches the same per-user stage as the batch funnel") {
    val stream = StreamingOps.readEvents(spark, eventsDir)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"))
      .as[StreamingOps.FunnelEv]
    val q = StreamingOps.funnelStream(stream).writeStream
      .outputMode("update").format("memory").queryName("stream_funnel")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("stream_funnel")
      .select("user_id", "stage").as[(Long, Int)].collect().toMap
    // batch per-user stages via the same chained-window construction
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
    val batch = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .withColumn("t1", min(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" && col("us") > col("t1"), col("us"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" && col("us") > col("t2"), col("us"))).over(w))
      .groupBy("user_id")
      .agg(max(when(col("t3").isNotNull, 3)
        .when(col("t2").isNotNull, 2)
        .when(col("t1").isNotNull, 1).otherwise(0)).as("stage"))
      .as[(Long, Int)].collect().toMap
    assert(got.nonEmpty && got == batch,
      s"stage mismatch for users: ${(got.toSet diff batch.toSet).take(5)}")
  }

  test("stream-stream join matches the batch interval join") {
    val stream = StreamingOps.readEvents(spark, eventsDir)
    val joined = StreamingOps.purchaseClickJoin(stream)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_interval_join")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ss_interval_join")
    val ev = Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("value").as("p_value"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"),
        col("value").as("c_value"))
    val want = p.join(c, col("user_id") === col("c_user_id") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 3600 SECONDS") &&
        col("c_ts") <= col("p_ts"))
      .select(col("user_id"), unix_millis(col("p_ts")).as("p_ts_ms"),
        unix_millis(col("c_ts")).as("c_ts_ms"), col("p_value"), col("c_value"))
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
  }

  test("streaming last-window features equal the batch inference windows at stream end") {
    // bit-for-bit equivalence with the batch inferenceWindow relies on the
    // single-file fixture above replaying as ONE micro-batch (see
    // eventsDir): within a batch the handler sorts each key's events, so
    // the stream fold visits them in exactly the batch sort order
    val stream = StreamingOps.readEvents(spark, eventsDir)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("value"))
      .as[StreamingOps.Ev]
    val q = StreamingOps.lastWindowStream(stream, t = 64).toDF()
      .writeStream.outputMode("append").format("memory").queryName("stream_lastwin")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // one emission per event; each user's LAST emission is the window the
    // batch inference path builds over the whole trajectory
    val got = spark.table("stream_lastwin")
      .groupBy(col("user_id"))
      .agg(max_by(col("window"), col("n_seen")).as("window"),
           max(col("n_seen")).as("n_seen"))
    val ev = Tables.events(spark, sf).withColumn("ts_us", unix_micros(col("ts")))
    val want = operators.Tensorize.inferenceWindow(ev, "user_id", "ts_us", "value", t = 64)
    assert(got.count() == want.count(), "per-user row counts differ")
    val joined = want.join(got, Seq("user_id"))
    assert(joined.count() == want.count())
    assert(joined.filter(col("n_seen") =!= col("orig_len")).count() == 0,
      "event counts diverge from trajectory lengths")
    assert(joined.filter(col("seq") =!= col("window")).count() == 0,
      "streaming end-state windows differ from batch inference windows")
  }

  test("streaming debounce dedup equals the batch window dedup on one-batch replay") {
    // single-file fixture ⇒ one micro-batch ⇒ the per-key sort covers the
    // whole stream (see eventsDir) — the condition under which the
    // debounce machine reproduces the batch lag() formulation exactly
    val stream = StreamingOps.readEvents(spark, eventsDir)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"))
      .as[StreamingOps.DebEv]
    val q = StreamingOps.debounceStream(stream).toDF()
      .writeStream.outputMode("append").format("memory").queryName("stream_deb")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("stream_deb")
      .select("user_id", "event_type", "event_id", "us")
    val want = operators.Relational.qWindowDedup(spark, sf)
    assert(got.count() == want.count(), "row counts differ from batch dedup")
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      "streaming debounce diverges from batch q_window_dedup")
  }

  test("streaming dedup: watermarked dropDuplicates removes replayed events") {
    val stream = StreamingOps.readEvents(spark, eventsDir)
    // duplicate the stream against itself (union) → every event twice
    val doubled = stream.unionByName(stream)
      .withWatermark("ts", "2 hours")
      .dropDuplicates("event_id")
    val q = doubled.writeStream
      .outputMode("append").format("memory").queryName("stream_dedup")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("stream_dedup").count()
    val want = Tables.events(spark, sf).count()
    assert(got == want, s"expected $want unique events, got $got")
  }

  test("multimodal frame sampling: bounded frames, stable hashes, thumb contract") {
    import graft.operators.Multimodal
    val media = Multimodal.mediaTable(Tables.documents(spark, sf))
    val frames = Multimodal.frameSample(media, stride = 256, maxFrames = 8,
      thumbDim = 16).cache()
    assert(frames.count() > 0)
    // only video rows, <= maxFrames frames each, thumb always 16-dim
    val perDoc = frames.groupBy("doc_id").count()
    assert(perDoc.filter(col("count") > 8).count() == 0)
    assert(frames.filter(size(col("thumb")) =!= 16).count() == 0)
    // deterministic across recomputation
    val again = Multimodal.frameSample(media, stride = 256, maxFrames = 8,
      thumbDim = 16).select("doc_id", "frame_idx", "frame_hash")
    assert(again.exceptAll(frames.select("doc_id", "frame_idx", "frame_hash"))
      .count() == 0)
    frames.unpersist()
  }

  test("multimodal feature extraction: deterministic stub features, schema contract") {
    val feats = operators.Multimodal.mmBinaryFeatures(spark, sf)
    assert(feats.columns.toSeq ==
      Seq("doc_id", "modality", "n_bytes", "mean_byte", "byte_entropy", "n_frames"))
    val n = Tables.documents(spark, sf).count()
    assert(feats.count() == n)
    assert(feats.filter(col("modality").isin("image", "audio", "video")).count() == n)
    assert(feats.filter(col("byte_entropy") <= 0 || col("byte_entropy") > 8).count() == 0)
    // determinism
    val a = feats.orderBy("doc_id").collect().map(_.toString)
    val b = operators.Multimodal.mmBinaryFeatures(spark, sf)
      .orderBy("doc_id").collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("streaming heavy hitters equals batch counts in the exact regime") {
    // k >= distinct event types -> Misra-Gries degenerates to exact
    // counting, so stream == batch bit-for-bit regardless of order
    val k = 16
    val stream = StreamingOps.readEvents(spark, eventsDir)
    val q = StreamingOps.heavyHittersStream(stream, k).writeStream
      .outputMode("complete").format("memory").queryName("stream_hh")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    def toMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.select(explode(col("top")).as("t"))
        .select(col("t.item"), col("t.est_count"))
        .as[(String, Long)].collect().toMap
    val got = toMap(spark.table("stream_hh"))
    val want = toMap(Tables.events(spark, sf).groupBy()
      .agg(functions.HeavyHitters.heavyHitters(col("event_type"), k).as("top")))
    assert(got == want, s"stream $got != batch $want")
    assert(got.nonEmpty)
  }

  test("streaming heavy hitters merges state across micro-batches") {
    // fixture split into two files + maxFilesPerTrigger=1 forces TWO
    // micro-batches: the second trigger must merge its partial into the
    // state-store buffer from the first. In the exact regime (k >=
    // distinct items) the merged counts still equal batch, so a state
    // round-trip or merge regression is a hard equality failure.
    val d = java.nio.file.Files.createTempDirectory("events_stream_2b")
    val ev = Tables.events(spark, sf)
    val half = ev.count() / 2
    ev.filter(col("event_id") % 2 === 0)
      .write.parquet(d.resolve("a").toString)
    ev.filter(col("event_id") % 2 =!= 0)
      .write.parquet(d.resolve("b").toString)
    val files = java.nio.file.Files.walk(d).iterator()
    val flat = java.nio.file.Files.createTempDirectory("events_stream_2bf")
    var i = 0
    files.forEachRemaining { p =>
      if (p.toString.endsWith(".parquet") &&
          !java.nio.file.Files.isDirectory(p)) {
        java.nio.file.Files.copy(p, flat.resolve(s"part$i.parquet")); i += 1
      }
    }
    assert(i >= 2, s"fixture staging produced $i files; need >= 2")
    val k = 16
    // the split files hold µs timestamps already (written from
    // Tables.events), so read them plainly rather than via readEvents'
    // ns-normalizing schema
    val stream = spark.readStream
      .schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(flat.toString)
    val q = StreamingOps.heavyHittersStream(stream, k).writeStream
      .outputMode("complete").format("memory").queryName("stream_hh_2b")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.length >= 2,
      s"expected >= 2 micro-batches, got ${q.recentProgress.length}")
    def toMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.select(explode(col("top")).as("t"))
        .select(col("t.item"), col("t.est_count"))
        .as[(String, Long)].collect().toMap
    val got = toMap(spark.table("stream_hh_2b"))
    val want = toMap(ev.groupBy()
      .agg(functions.HeavyHitters.heavyHitters(col("event_type"), k).as("top")))
    assert(got == want, s"stream $got != batch $want")
    assert(half > 0)
  }

  test("streaming count-min sketch merges across micro-batches == batch bytes") {
    // the CMS aggregate in a streaming aggregation, like heavy hitters:
    // agg buffer = state-store entry, element-wise-sum merge = state
    // update. Two forced micro-batches over the split fixture must yield
    // the exact whole-table sketch bytes (sum is order-free), proving
    // the buffer round-trips the state store and merges, not replaces.
    val ev = Tables.events(spark, sf)
    val d = java.nio.file.Files.createTempDirectory("cms_stream_2b")
    ev.filter(col("event_id") % 2 === 0).coalesce(1)
      .write.parquet(d.resolve("a").toString)
    ev.filter(col("event_id") % 2 =!= 0).coalesce(1)
      .write.parquet(d.resolve("b").toString)
    val flat = java.nio.file.Files.createTempDirectory("cms_stream_2bf")
    var i = 0
    for (sub <- Seq("a", "b")) {
      java.nio.file.Files.list(d.resolve(sub)).iterator().forEachRemaining { p =>
        if (p.toString.endsWith(".parquet")) {
          java.nio.file.Files.copy(p, flat.resolve(s"b$i.parquet")); i += 1
        }
      }
    }
    assert(i == 2)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(flat.toString)
    val q = stream.groupBy()
      .agg(functions.Cms.sketch(col("event_type")).as("sk"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("cms_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.length >= 2,
      s"expected >= 2 micro-batches, got ${q.recentProgress.length}")
    val got = spark.table("cms_stream").head.getAs[Array[Byte]]("sk")
    val want = ev.agg(functions.Cms.sketch(col("event_type")).as("sk"))
      .head.getAs[Array[Byte]]("sk")
    assert(java.util.Arrays.equals(got, want),
      "streaming sketch bytes != batch sketch bytes")
  }

  test("bloom-dedup stream equals exact keep-first dedup on one-batch replay") {
    // 1024 words/shard for <= 500 docs -> fpp ~1e-5 per probe; false
    // positives are hash-deterministic, so this equality is stable, not
    // flaky. Docs carry xxhash64(text) and shard = pmod(h, 8).
    val docsDir = java.nio.file.Files.createTempDirectory("bloom_dedup_1b")
    val prepared = Tables.documents(spark, sf)
      .select(col("doc_id"), xxhash64(col("text")).as("h"))
      .withColumn("shard", pmod(col("h"), lit(8)).cast("int"))
      .select("doc_id", "shard", "h")
    prepared.write.parquet(docsDir.resolve("d").toString)
    val stream = spark.readStream.schema(prepared.schema)
      .parquet(docsDir.resolve("d").toString)
      .as[StreamingOps.BloomDoc]
    val q = StreamingOps.bloomDedupStream(stream).toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("bloom_dedup_1b")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("bloom_dedup_1b").select("doc_id")
      .as[Long].collect().toSet
    val want = prepared.groupBy(col("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(got == want,
      s"missed=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("bloom-dedup stream drops re-arrivals across micro-batches") {
    // batch 1 = the corpus; batch 2 = the SAME texts under new doc_ids
    // (re-arrival). Everything in batch 2 must hit the batch-1 filter
    // state and be dropped — zero batch-2 emissions proves the Bloom
    // words survive the state-store round-trip between triggers.
    val d = java.nio.file.Files.createTempDirectory("bloom_dedup_2b")
    val prepared = Tables.documents(spark, sf)
      .select(col("doc_id"), xxhash64(col("text")).as("h"))
      .withColumn("shard", pmod(col("h"), lit(8)).cast("int"))
      .select("doc_id", "shard", "h")
    val nDocs = prepared.count()
    prepared.coalesce(1).write.parquet(d.resolve("t1").toString)
    prepared.withColumn("doc_id", col("doc_id") + 1000000L)
      .coalesce(1).write.parquet(d.resolve("t2").toString)
    val flat = java.nio.file.Files.createTempDirectory("bloom_dedup_2bf")
    // file names order the batches: batch 1 before re-arrivals
    var i = 0
    for (sub <- Seq("t1", "t2")) {
      java.nio.file.Files.list(d.resolve(sub)).iterator().forEachRemaining { p =>
        if (p.toString.endsWith(".parquet")) {
          java.nio.file.Files.copy(p, flat.resolve(s"b$i.parquet")); i += 1
        }
      }
    }
    assert(i == 2, s"expected 2 staged files, got $i")
    val stream = spark.readStream.schema(prepared.schema)
      .option("maxFilesPerTrigger", 1).parquet(flat.toString)
      .as[StreamingOps.BloomDoc]
    val q = StreamingOps.bloomDedupStream(stream).toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("bloom_dedup_2b")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.length >= 2,
      s"expected >= 2 micro-batches, got ${q.recentProgress.length}")
    val emitted = spark.table("bloom_dedup_2b").select("doc_id")
      .as[Long].collect()
    assert(emitted.forall(_ < 1000000L),
      s"re-arrivals leaked past the filter: ${emitted.filter(_ >= 1000000L).take(5).toSeq}")
    assert(emitted.nonEmpty && nDocs > 0)
  }

  test("kmeans: deterministic assignment, k clusters, SSE decreases with iterations") {
    val emb = Tables.embeddings(spark, sf)
    val a1 = ml.KMeans.fit(emb, k = 5, iters = 1)
    val a3 = ml.KMeans.fit(emb, k = 5, iters = 3)
    assert(a3.select("cluster").distinct().count() <= 5)
    assert(a3.count() == emb.count())
    val sse1 = ml.KMeans.sse(emb, a1).head.getDouble(0)
    val sse3 = ml.KMeans.sse(emb, a3).head.getDouble(0)
    assert(sse3 <= sse1 + 1e-6, s"SSE should not increase: $sse1 -> $sse3")
    // determinism
    val again = ml.KMeans.fit(emb, k = 5, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(a3.as[(Long, Long)].collect().toMap == again)
  }
}
