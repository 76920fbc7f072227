package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** End-to-end contract for the incremental dedup-index path:
  * [[Dedup.incrementalCandidatePairs]] (the new batch's MinHash/LSH band
  * keys probed against the indexed corpus buckets) composed with
  * [[Dedup.incrementalLabels]] must equal a full `dedupClusters` rebuild
  * on bridge-free graphs — the correctness statement that makes the
  * O(batch) daily-increment shape trustworthy at corpus scale.
  *
  * Fixture: seeded random word-soup corpus with exact-duplicate groups.
  * Exact copies are found by BOTH generators by construction (identical
  * signatures collide in every LSH band; identical length/lang passes the
  * n-gram banding), and unrelated random texts verify far below the
  * jaccard threshold — so the full build's edge set and the incremental
  * edge set coincide and label equality is exact, not approximate.
  * Bridge-freedom and old-ids < new-ids hold by construction (each doc
  * belongs to exactly one text-equality group; ids are assigned in batch
  * order), which are precisely the documented conditions under which the
  * frozen-old-labels contract reproduces the full rebuild.
  */
class IncrementalDedupSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private val rnd = new scala.util.Random(20260814L)
  private def text(): String =
    Seq.fill(20)("w" + rnd.nextInt(200)).mkString(" ")

  // 8 duplicate groups: 0-2 old-only, 3-5 spanning old+new (attach path),
  // 6-7 new-only (founding path); plus singletons in both batches
  private val base = Vector.fill(8)(text())
  private val oldRows = {
    val b = Seq.newBuilder[(Long, String)]
    var id = 1L
    for (g <- 0 until 6; _ <- 0 until (2 + g % 2)) { b += ((id, base(g))); id += 1 }
    while (id <= 40L) { b += ((id, text())); id += 1 }
    b.result()
  }
  private val newRows = {
    val b = Seq.newBuilder[(Long, String)]
    var id = 101L
    for (g <- 3 until 8; _ <- 0 until (1 + g % 2)) { b += ((id, base(g))); id += 1 }
    while (id <= 115L) { b += ((id, text())); id += 1 }
    b.result()
  }

  private def toDocs(rows: Seq[(Long, String)]): DataFrame = {
    val ss = TestSpark.spark
    import ss.implicits._
    rows.map { case (id, t) => (id, t, "en", t.length) }
      .toDF("doc_id", "text", "lang", "n_chars")
  }

  test("incrementalLabels ∘ incrementalCandidatePairs == full dedupClusters rebuild") {
    val oldDocs = toDocs(oldRows)
    val newDocs = toDocs(newRows)
    val full = Dedup.dedupClusters(oldDocs.unionByName(newDocs), threshold = 0.5)
      .select("doc_id", "cluster_id")
      .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
      .collect().toMap

    val oldLabels = Dedup.dedupClusters(oldDocs, threshold = 0.5)
      .select("doc_id", "cluster_id")
    val (nn, no) =
      Dedup.incrementalCandidatePairs(newDocs, oldDocs, threshold = 0.5)
    val (labels, handle) = Dedup.incrementalLabels(newDocs, oldLabels, nn, no)
    val inc = labels.select("doc_id", "cluster_id")
      .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
      .collect().toMap
    handle.close()

    // old labels are frozen AND equal the full rebuild's (no bridges, no
    // new doc can lower an old cluster's min id)
    val oldMap = oldLabels
      .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
      .collect().toMap
    oldRows.foreach { case (id, _) =>
      assert(oldMap(id) == full(id), s"old doc $id: index ${oldMap(id)} != full ${full(id)}")
    }
    // every new doc's incremental label equals the full rebuild's
    assert(inc.keySet == newRows.map(_._1).toSet)
    newRows.foreach { case (id, _) =>
      assert(inc(id) == full(id), s"new doc $id: incremental ${inc(id)} != full ${full(id)}")
    }
    // sanity on the fixture itself: attach, founding, and singleton paths
    // were all actually exercised
    assert(newRows.count { case (id, _) => inc(id) <= 40L } >= 3,
      "no new doc attached to an old cluster — fixture degenerated")
    assert(newRows.exists { case (id, t) => inc(id) >= 101L && inc(id) != id },
      "no new-only multi-doc cluster founded — fixture degenerated")
    assert(newRows.exists { case (id, _) => inc(id) == id },
      "no new singleton — fixture degenerated")
  }

  test("md5-family increment == full md5-edge rebuild (hash-family coherence, r10)") {
    // dedupClusters' default edge source is the md5-LSH generator since
    // r10; an increment probed with the SAME family reproduces the full
    // rebuild by construction (identical band-collision events), where a
    // cross-family probe can diverge on borderline pairs. This pins the
    // production composition: index built md5 -> increment md5.
    val oldDocs = toDocs(oldRows)
    val newDocs = toDocs(newRows)
    val full = Dedup.dedupClusters(oldDocs.unionByName(newDocs), threshold = 0.5)
      .select("doc_id", "cluster_id")
      .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
      .collect().toMap
    val oldLabels = Dedup.dedupClusters(oldDocs, threshold = 0.5)
      .select("doc_id", "cluster_id")
    val (nn, no) = Dedup.incrementalCandidatePairs(newDocs, oldDocs,
      threshold = 0.5, md5Family = true)
    val (labels, handle) = Dedup.incrementalLabels(newDocs, oldLabels, nn, no)
    val inc = labels.select("doc_id", "cluster_id")
      .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
      .collect().toMap
    handle.close()
    assert(inc.keySet == newRows.map(_._1).toSet)
    newRows.foreach { case (id, _) =>
      assert(inc(id) == full(id),
        s"new doc $id: md5-family incremental ${inc(id)} != full ${full(id)}")
    }
  }

  test("a prebuilt minhashBuckets index probes identically to deriving from the corpus (both families)") {
    // the persisted daily shape (r14): yesterday's bucket index fed back
    // via oldBuckets must produce byte-identical candidate pairs to the
    // self-contained form that re-derives the corpus buckets — per
    // family, because band keys differ between families and the index
    // must be probed with the family it was built with
    val oldDocs = toDocs(oldRows)
    val newDocs = toDocs(newRows)
    for (md5 <- Seq(false, true)) {
      val ix = Dedup.minhashBuckets(oldDocs, "text", md5Family = md5)
      val (_, derived) = Dedup.incrementalCandidatePairs(newDocs, oldDocs,
        threshold = 0.5, md5Family = md5)
      val (_, viaIx) = Dedup.incrementalCandidatePairs(newDocs, oldDocs,
        threshold = 0.5, md5Family = md5, oldBuckets = Some(ix))
      val a = derived.collect().map(_.toString).sorted.toSeq
      val b = viaIx.collect().map(_.toString).sorted.toSeq
      assert(a == b, s"md5Family=$md5: index probe diverged from derive")
      assert(b.nonEmpty, s"md5Family=$md5: fixture found no new-old pairs")
    }
    // frames that are not a bucket index are refused up front (the
    // case class fixes the roles, but not the schemas)
    intercept[IllegalArgumentException] {
      Dedup.incrementalCandidatePairs(newDocs, oldDocs,
        oldBuckets = Some(Dedup.BucketIndex(oldDocs, oldDocs)))
    }
  }

  test("bucket-index crossover advisory: fires under the measured crossover, silent above") {
    val ss = TestSpark.spark
    // a real (tiny) index is under the ~100k crossover → advisory
    val small = Dedup.minhashBuckets(toDocs(oldRows), "text")
    val msg = Dedup.bucketIndexAdvisory(small)
    assert(msg.isDefined, "advisory must fire for a corpus under the crossover")
    assert(msg.get.contains(s"${oldRows.size}-doc corpus"))
    // at/above the crossover the advisory stays silent — docCount is one
    // row per document in the shingles frame, so a synthetic frame pins
    // the threshold without building a 100k-doc index
    val big = Dedup.BucketIndex(
      buckets = small.buckets,
      shingles = ss.range(Dedup.bucketIndexCrossoverDocs)
        .select(col("id").as("doc_id"), array().as("sh")))
    assert(Dedup.bucketIndexAdvisory(big).isEmpty,
      "advisory must not fire at or above the crossover")
    // and docCount is cached on the instance (one job per snapshot)
    assert(big.docCount == Dedup.bucketIndexCrossoverDocs)
  }

  test("bucketIndexAppend == rebuild over corpus ∪ increment, and probes identically (both families)") {
    // the daily refresh: yesterday's index + today's keepers must be the
    // SAME index a full rebuild over the grown corpus would produce —
    // row-identical frames (no silent dedup, no drift), identical probe
    // results, fresh docCount for the crossover advisory
    val oldDocs = toDocs(oldRows)
    val dayDocs = toDocs(newRows).withColumn("doc_id", col("doc_id") + 1000L)
    val probe = toDocs(newRows).withColumn("doc_id", col("doc_id") + 2000L)
    for (md5 <- Seq(false, true)) {
      val appended = Dedup.bucketIndexAppend(
        Dedup.minhashBuckets(oldDocs, "text", md5Family = md5),
        dayDocs, "text", md5Family = md5)
      val rebuilt = Dedup.minhashBuckets(oldDocs.unionByName(dayDocs),
        "text", md5Family = md5)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toString).sorted.toSeq
      assert(rows(appended.buckets) == rows(rebuilt.buckets),
        s"md5Family=$md5: appended bucket frame diverged from rebuild")
      assert(rows(appended.shingles) == rows(rebuilt.shingles),
        s"md5Family=$md5: appended shingle frame diverged from rebuild")
      val grown = oldDocs.unionByName(dayDocs)
      val (_, viaAppended) = Dedup.incrementalCandidatePairs(probe, grown,
        threshold = 0.5, md5Family = md5, oldBuckets = Some(appended))
      val (_, viaRebuilt) = Dedup.incrementalCandidatePairs(probe, grown,
        threshold = 0.5, md5Family = md5, oldBuckets = Some(rebuilt))
      val a = rows(viaAppended)
      assert(a == rows(viaRebuilt) && a.nonEmpty,
        s"md5Family=$md5: appended-index probe diverged (or empty fixture)")
      assert(appended.docCount == oldRows.size + newRows.size,
        s"docCount must track the grown corpus: ${appended.docCount}")
    }
  }

  test("simhashPairs: identical docs at hamming 0, near-dups found, unrelated excluded") {
    // long docs: with ~300 distinct-ish tokens each sketch bit has a wide
    // vote margin, so a one-token edit flips few bits (hamming stays <= 3);
    // short word-soup docs would flip many near-boundary bits
    val longRnd = new scala.util.Random(5L)
    def longText(): String =
      (0 until 300).map(_ => "t" + longRnd.nextInt(400)).mkString(" ")
    val base = longText()
    val nearTokens = base.split(" ").toVector.updated(10, "CHANGED").mkString(" ")
    val docs = toDocs(Seq(
      (1L, base), (2L, base),        // identical pair
      (3L, nearTokens),              // one token changed
      (4L, longText()), (5L, longText())))  // unrelated long docs
    val got = Dedup.simhashPairs(docs, "text")
      .as[(Long, Long, Int)](org.apache.spark.sql.Encoders.product[(Long, Long, Int)])
      .collect().map { case (a, b, h) => (a, b) -> h }.toMap
    assert(got((1L, 2L)) == 0, "identical docs must pair at hamming 0")
    // one changed token out of 21 moves few sketch bits — the near pair
    // must be found through some colliding band (pigeonhole at <=3)
    assert(got.contains((1L, 3L)) && got((1L, 3L)) <= 3,
      s"near-dup pair missing or too far: $got")
    // unrelated word-soup docs sit ~32 bits apart — never candidates
    assert(!got.keys.exists { case (a, b) => Set(a, b).intersect(Set(4L, 5L)).nonEmpty },
      s"unrelated docs paired: $got")
  }

  test("probe join broadcasts the batch side; handle.close() frees every block") {
    val sc = spark.sparkContext
    val oldDocs = toDocs(oldRows)
    val newDocs = toDocs(newRows)
    val (nn, no) =
      Dedup.incrementalCandidatePairs(newDocs, oldDocs, threshold = 0.5)
    // the corpus-side bucket frame must never shuffle: the batch side is
    // hinted broadcast, so the probe is a BroadcastHashJoin — a
    // SortMergeJoin here means the corpus got exchanged, the exact cost
    // the incremental path exists to avoid
    val plan = no.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"probe join is not broadcast:\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin"),
      s"probe join degraded to a sort-merge join:\n${plan.take(1500)}")

    val before = sc.getPersistentRDDs.keySet
    val oldLabels = Dedup.dedupClusters(oldDocs, threshold = 0.5)
      .select("doc_id", "cluster_id").localCheckpoint()
    val baseline = sc.getPersistentRDDs.keySet
    val (labels, handle) = Dedup.incrementalLabels(newDocs, oldLabels, nn, no)
    labels.count()
    handle.close()
    // the increment leaves NOTHING behind once the caller closes the
    // handle: the inner fixpoint's checkpoint is freed by the operator,
    // the component checkpoint by the handle. (The caller-owned oldLabels
    // checkpoint above must survive — the operator may not free inputs.)
    val leaked = sc.getPersistentRDDs.keySet -- baseline
    assert(leaked.isEmpty,
      s"incremental labeling left ${leaked.size} persistent RDD(s) after close()")
    assert((baseline -- before).subsetOf(sc.getPersistentRDDs.keySet),
      "operator freed a caller-owned input checkpoint")
  }
}
