package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.functions.VectorOps

class DedupTextSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank", "en", "s1", 0L),
    (2L, "the quick brown fox jumps over the lazy dog near the river bend", "en", "s1", 0L),
    (3L, "completely different text about spark engines and distributed joins", "en", "s2", 0L),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank", "en", "s3", 0L),
    (5L, "der schnelle braune fuchs springt ueber den faulen hund", "de", "s4", 0L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")
    .withColumn("n_chars", length(col("text")))

  test("exact dedup groups identical texts, keeps min doc_id") {
    val g = Dedup.exactGroups(docs, "text")
    assert(g.count() == 4)
    assert(g.filter(col("n_dups") === 2 && col("keep_id") === 1).count() == 1)
    val kf = Dedup.exactKeepFirst(docs, "text")
    val dup = kf.filter(col("is_dup") === 1).select("doc_id", "keep_id")
      .as[(Long, Long)].collect().toSet
    assert(dup == Set((4L, 1L)))
    // the xxhash64 production twin (r15): same verdicts row for row as
    // the md5 (oracle-replayable) flavor, on the fixture AND the corpus
    val prodFix = Dedup.exactKeepFirstHashed(docs, "text")
      .collect().map(_.toString).sorted.toSeq
    assert(prodFix == kf.collect().map(_.toString).sorted.toSeq,
      "xxhash64 keep-first diverged from md5 on the fixture")
    val corpus = Tables.documents(spark, sf).select("doc_id", "text")
    val a = Dedup.exactKeepFirst(corpus, "text")
      .collect().map(_.toString).sorted.toSeq
    val b = Dedup.exactKeepFirstHashed(corpus, "text")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b, "xxhash64 keep-first diverged from md5 on the corpus")
  }

  test("minhash LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashPairs(docs, "text", threshold = 0.5)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)), "identical docs must collide")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)),
      "one-word-edit near-dups should collide in some band")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
    val prof = Dedup.minhashProfile(docs, "text")
    assert(prof.count() == 5)
    assert(prof.filter(col("doc_id") === 1 && col("best_jaccard") === 1.0).count() == 1)
  }

  test("md5 minhash family matches the xxhash64 family's dedup verdicts") {
    // the r9 oracle-replayable hash family must find the same duplicate
    // structure (hash VALUES differ by design; set-similarity math and
    // LSH recall are what the operator contracts promise)
    val pairs = Dedup.minhashPairsMd5(docs, "text", threshold = 0.5)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)), "identical docs must collide")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
    val prof = Dedup.minhashProfileMd5(docs, "text")
    assert(prof.count() == 5)
    assert(prof.filter(col("doc_id") === 1 && col("best_jaccard") === 1.0).count() == 1)
    // exact-duplicate pair jaccard is exactly 1 regardless of hash family
    val j14 = Dedup.minhashPairsMd5(docs, "text", threshold = 0.0)
      .filter(col("doc_id_a") === 1 && col("doc_id_b") === 4)
      .select("jaccard").as[Double].head()
    assert(j14 == 1.0)
  }

  test("md5Hash60 equals DuckDB's md5_number_upper // 16 on known vectors") {
    // pin the byte-reversal + 15-hex-char derivation against values
    // computed straight from the md5 spec (DuckDB reads digest bytes 0..7
    // as a little-endian uint64; >>4 keeps 60 bits). Each probe text has
    // fewer than k=3 tokens (or exactly one 3-gram), so its shingle set
    // is the single string itself and md5ShingleHashes exposes the raw
    // base hash through the public surface.
    def expected(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val le = (0 until 8).map(i => (d(i) & 0xFFL) << (8 * i)).reduce(_ | _)
      java.lang.Long.divideUnsigned(le, 16L)
    }
    val rows = Seq("abc", "hello world", "x y z").toDF("s")
      .select(col("s"), Dedup.md5ShingleHashes(col("s"), 3).getItem(0).as("h"))
      .as[(String, Long)].collect()
    rows.foreach { case (s, h) => assert(h == expected(s), s"md5-60 of '$s'") }
  }

  test("md5 simhash: identical docs identical, near-dups closer than unrelated") {
    val sh = Dedup.simhashMd5(docs, "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(4L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(2L)) < hamming(sh(1L), sh(3L)))
    // band extraction parity: bands reassemble the sketch
    val r = Dedup.simhashMd5(docs, "text").filter(col("doc_id") === 1)
      .select("simhash", "band0", "band1", "band2", "band3")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r._1 == (r._2 | (r._3 << 16) | (r._4 << 32) | (r._5 << 48)))
  }

  test("simhash: identical docs get identical sketches, near-dups are close") {
    val sh = Dedup.simhash(docs, "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(4L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(2L)) < hamming(sh(1L), sh(3L)))
  }

  test("ngram jaccard: identical=1, near-dup high, computed only for bounded candidates") {
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, lenTol = 2)
      .select("doc_id_a", "doc_id_b", "jaccard").as[(Long, Long, Double)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((1L, 4L)) == 1.0)
    assert(m((1L, 2L)) > 0.7 && m((1L, 2L)) < 1.0)
  }

  test("r10 scale contract: LSH candidates grow linearly with corpus density, length-band quadratically") {
    // The round-10 100x probe finding, pinned as a regression gate: on a
    // GenScale'd corpus (dup rate constant, density growing), the
    // length-band generator's candidate count grows ~factor^2 (same
    // (lang, n_chars) buckets, factor x density each) while the banded
    // LSH generator's grows ~factor (candidates track the actual dup
    // structure). The gated dedup family rides LSH for exactly this
    // reason — if someone swaps the edge source back, this fails.
    val base = Tables.documents(spark, sf)
    val big = tools.GenScale.scaled(spark, sf, factor = 4)("documents")
    val lb1 = Dedup.ngramJaccardPairs(base).count()
    val lb4 = Dedup.ngramJaccardPairs(big).count()
    val mh1 = Dedup.minhashPairsMd5(base, "text", threshold = 0.0).count()
    val mh4 = Dedup.minhashPairsMd5(big, "text", threshold = 0.0).count()
    assert(lb1 > 0 && mh1 > 0)
    // quadratic: 4x density -> ~16x pairs (allow slack for bucket shape)
    assert(lb4.toDouble / lb1 >= 8.0,
      s"length-band candidates grew only ${lb4.toDouble / lb1}x at 4x density — " +
        "generator changed? update the scale story")
    // linear: 4x density -> ~4x pairs (slack for cross-copy chance collisions)
    assert(mh4.toDouble / mh1 <= 6.0,
      s"LSH candidates grew ${mh4.toDouble / mh1}x at 4x density — " +
        "the banded generator regressed toward density-quadratic")
  }

  test("dedupClusters generator plug: LSH default and length-band agree on strong dups") {
    // the pluggable candidate generator (r10): on a corpus whose near-dup
    // pairs are unambiguous (exact dups and heavy overlaps — the fixture
    // family), both generators find the same edges, so the closures match.
    val lsh = Dedup.dedupClusters(docs, threshold = 0.5)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    val lenBand = Dedup.dedupClusters(docs, threshold = 0.5,
        (d, t) => Dedup.ngramJaccardPairs(d).filter(col("jaccard") >= t))
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(lsh == lenBand,
      s"generator plug changed strong-dup clusters: $lsh vs $lenBand")
    assert(lsh.values.toSet.size < lsh.size) // some docs actually clustered
  }

  test("cosine on array<float> matches hand computation") {
    val df = Seq((Array(1.0f, 0.0f, 1.0f), Array(1.0f, 1.0f, 0.0f)))
      .toDF("a", "b")
    val c = df.select(VectorOps.cosine(col("a"), col("b")).as("c"))
      .head.getDouble(0)
    assert(math.abs(c - 0.5) < 1e-12)
  }

  test("annTopK returns k ranked neighbors; annLsh achieves recall > 0.3 vs exact") {
    val emb = Tables.embeddings(spark, sf)
    val exact = Similarity.annTopK(emb, emb.filter(col("vec_id") < 5), k = 5)
    val perQ = exact.groupBy("q_id").count().as[(Long, Long)].collect().toMap
    assert(perQ.values.forall(_ == 5))
    val lsh = Similarity.annLsh(emb, emb.filter(col("vec_id") < 5), dim = 64, nBits = 2, k = 5)
    val exactSet = exact.select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val lshSet = lsh.select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val recall = (exactSet & lshSet).size.toDouble / exactSet.size
    assert(recall > 0.3, s"LSH recall too low: $recall")
  }

  test("annIvf achieves reasonable recall vs exact search") {
    val emb = Tables.embeddings(spark, sf)
    val exact = Similarity.annTopK(emb, emb.filter(col("vec_id") < 5), k = 5)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.annIvf(emb, emb.filter(col("vec_id") < 5),
        nlist = 4, nprobe = 2, k = 5)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall > 0.3, s"IVF recall too low: $recall")
  }

  test("incremental IVF: O(batch) map-side assign equals the full rebuild, queries identical") {
    // the similarity-side twin of incrementalCandidatePairs: centroids
    // frozen on the base snapshot, each arriving batch absorbed with one
    // map-side ivfAssign — and because frozen-centroid routing is
    // deterministic, base ∪ assign(batch) == assign(base ∪ batch)
    // row-for-row, so the increment IS the rebuild
    val emb = Tables.embeddings(spark, sf)
    val cut = emb.count() * 4 / 5
    val base = emb.filter(col("vec_id") < cut)
    val batch = emb.filter(col("vec_id") >= cut)
    assert(batch.count() > 0, "fixture degenerated: empty increment")
    val centroids = Similarity.ivfCentroids(base, nlist = 4)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("c_id", "cell").as[(Long, Long)].collect().toSet
    val incremental = Similarity.ivfAssign(base, centroids)
      .unionByName(Similarity.ivfAssign(batch, centroids))
    val rebuild = Similarity.ivfAssign(emb, centroids)
    assert(rows(incremental) == rows(rebuild),
      "incremental assignment diverged from the full rebuild")

    // queries against the incrementally grown index == against the rebuild
    val queries = emb.filter(col("vec_id") < 5)
    def hits(assigned: org.apache.spark.sql.DataFrame) =
      Similarity.annIvfProbe(assigned, centroids, queries, nprobe = 2, k = 5)
        .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    assert(hits(incremental) == hits(rebuild))

    // the increment leg is pure map-side: no exchange anywhere in its plan
    val plan = Similarity.ivfAssign(batch, centroids)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"ivfAssign must not shuffle the batch; plan:\n${plan.take(800)}")
  }

  test("json and orc sources round-trip events exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("fmt").toString
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
    ev.write.mode("overwrite").json(s"$tmp/ev_json")
    ev.write.mode("overwrite").orc(s"$tmp/ev_orc")
    val viaJson = spark.read.schema(ev.schema).json(s"$tmp/ev_json")
    val viaOrc = spark.read.orc(s"$tmp/ev_orc")
    assert(viaJson.count() == ev.count())
    assert(viaOrc.count() == ev.count())
    assert(viaOrc.exceptAll(ev).count() == 0)
    assert(viaJson.exceptAll(ev).count() == 0)
  }

  test("token counts and quality features behave sanely") {
    val t = TextOps.tokenCounts(docs, "text").filter(col("doc_id") === 1).head
    assert(t.getAs[Int]("n_ws_tokens") == 13)
    val q = TextOps.qualityScore(docs, "text", Seq("the", "over", "near"))
      .filter(col("doc_id") === 1).head
    assert(q.getAs[Double]("stop_ratio") > 0.3)
    assert(q.getAs[Double]("alpha_ratio") > 0.7)
    assert(q.getAs[Double]("quality") > 0.0 && q.getAs[Double]("quality") <= 1.0)
  }

  test("langId predicts the language whose lexicon matches") {
    val lex = Map(
      "en" -> Seq("the", "over", "near"),
      "de" -> Seq("der", "den", "ueber"))
    val got = TextOps.langId(docs, "text", lex)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(got(1L) == "en")
    assert(got(5L) == "de")
  }

  test("componentLabels: chains, stars, singletons, empty graph") {
    // chain 1-2-3-...-12 (worst case for plain propagation), star 20-(21..24),
    // singletons 30,31; empty-graph case separately
    val verts = ((1L to 12L) ++ (20L to 24L) ++ Seq(30L, 31L)).toDF("doc_id")
    val chain = (1L to 11L).map(i => (i, i + 1))
    val star = (21L to 24L).map(i => (20L, i))
    val pairs = (chain ++ star).toDF("doc_id_a", "doc_id_b")
    val got = Dedup.componentLabels(verts, pairs)
      .as[(Long, Long)].collect().toMap
    (1L to 12L).foreach(v => assert(got(v) == 1L, s"chain vertex $v"))
    (20L to 24L).foreach(v => assert(got(v) == 20L, s"star vertex $v"))
    assert(got(30L) == 30L && got(31L) == 31L, "singletons keep their own id")
    assert(got.size == 19)

    val empty = Seq.empty[(Long, Long)].toDF("doc_id_a", "doc_id_b")
    val solo = Dedup.componentLabels(verts, empty).as[(Long, Long)].collect()
    assert(solo.length == 19 && solo.forall { case (v, l) => v == l })
  }

  test("incrementalLabels: new components attach via any member, old labels frozen") {
    // existing index: cluster 1 = {1,2}, cluster 3 = {3}
    val oldLabels = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("doc_id", "cluster_id")
    // new batch: 10-11 are near-dups of each other, 11 also matches old doc
    // 3; 12 matches old docs 2 and 3; 13 matches nothing
    val newDocs = Seq(10L, 11L, 12L, 13L).toDF("doc_id")
    val nn = Seq((10L, 11L)).toDF("doc_id_a", "doc_id_b")
    val no = Seq((11L, 3L), (12L, 2L), (12L, 3L)).toDF("doc_id_a", "doc_id_b")
    val (labels, handle) = Dedup.incrementalLabels(newDocs, oldLabels, nn, no)
    val got = labels.as[(Long, Long, Int)].collect()
      .map { case (d, c, a) => d -> ((c, a)) }.toMap
    handle.close() // caller-side eager free of the component checkpoint
    // the {10,11} component attaches through 11's match → BOTH get cluster 3
    assert(got(10L) == ((3L, 1)) && got(11L) == ((3L, 1)))
    // 12 matches clusters 1 and 3 → min old cluster (1); old labels frozen,
    // clusters 1 and 3 are NOT merged by the bridge
    assert(got(12L) == ((1L, 1)))
    // unmatched new doc founds its own cluster
    assert(got(13L) == ((13L, 0)))
    assert(got.size == 4)
  }

  test("fingerprints: identical docs identical, robust to small edits") {
    val fp = TextOps.fingerprint(docs, "text").collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("fingerprints")).toMap
    assert(fp(1L) == fp(4L))
    val overlap = (fp(1L).toSet & fp(2L).toSet).size.toDouble / fp(1L).toSet.size
    assert(overlap > 0.5, s"near-dup fingerprint overlap too low: $overlap")
    assert((fp(1L).toSet & fp(3L).toSet).size <
           (fp(1L).toSet & fp(2L).toSet).size)
  }
}
