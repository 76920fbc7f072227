package graft

import graft.operators.Dedup

/** Block-manager hygiene guardrails for the connected-components fixpoint.
  *
  * Round-5 regression class: `componentLabels` localCheckpoints edges, the
  * seed labels, every round's labels, and the candidate pairs — if any of
  * them outlives the fixpoint, a bench run that executes the fixpoint 12×
  * (dedup_clusters / dedup_canonical_best / pipeline_curation × warm +
  * reps) strands dozens of checkpoint block sets that only a periodic GC
  * reclaims, and the eviction churn taxes every later query in the
  * session. The operator must free everything it materializes except the
  * single final label checkpoint the returned (lazy) frame still
  * references.
  */
class DedupHygieneSpec extends SparkSpec {

  test("dedupClusters leaves at most one persistent RDD per invocation") {
    val sc = spark.sparkContext
    val docs = Tables.documents(spark, sf)
    val before = sc.getPersistentRDDs.keySet
    Dedup.dedupClusters(docs, threshold = 0.5).count()
    val leaked1 = sc.getPersistentRDDs.keySet -- before
    assert(leaked1.size <= 1,
      s"one dedupClusters run left ${leaked1.size} persistent RDDs " +
        "(expected ≤1: the final label checkpoint the result references)")
    // repeated executions must not accumulate loop-internal state: three
    // full runs may each keep their final label checkpoint alive (the
    // ContextCleaner frees those on GC), but nothing else
    Dedup.dedupClusters(docs, threshold = 0.5).count()
    Dedup.dedupClusters(docs, threshold = 0.5).count()
    val leaked3 = sc.getPersistentRDDs.keySet -- before
    assert(leaked3.size <= 3,
      s"three dedupClusters runs left ${leaked3.size} persistent RDDs " +
        "(expected ≤3) — the fixpoint is leaking loop-internal checkpoints again")
  }

  test("cold mode bypasses the cluster-index memo and still matches the cached result") {
    // the SPARK_GRAFT_COLD bench toggle (injected here via the graft.cold
    // system property — env cannot change after JVM start) must actually
    // rebuild instead of reading the session index, and the rebuild must
    // agree with the memoized labels exactly
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val warm1 = Dedup.clusterIndex(spark, sf, threshold = 0.5)
    val warm2 = Dedup.clusterIndex(spark, sf, threshold = 0.5)
    assert(warm1 eq warm2, "warm calls must return the memoized frame")
    val warmRows = rows(warm1)
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    sys.props("graft.cold") = "1"
    try {
      val cold = Dedup.clusterIndex(spark, sf, threshold = 0.5)
      assert(!(cold eq warm1), "cold mode must bypass the memo")
      assert(rows(cold) == warmRows, "cold rebuild diverged from the cached index")
    } finally {
      sys.props.remove("graft.cold")
      // the cold rebuild's final label checkpoint is not memoized and has
      // no consumer after this test — free it instead of stranding a
      // block set in the shared session (the leak class this suite polices)
      (sc.getPersistentRDDs.keySet -- before)
        .foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(true)))
    }
    // and the memo is intact afterwards
    assert(Dedup.clusterIndex(spark, sf, threshold = 0.5) eq warm1)
  }

  test("componentLabels frees every block set on the non-convergence error path") {
    val ss = TestSpark.spark
    import ss.implicits._
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val verts = (1L to 10L).toDF("doc_id")
    val pairs = (1L to 9L).map(i => (i, i + 1)).toDF("doc_id_a", "doc_id_b")
    // maxIters = 0 forces the convergence require to fire with the seed
    // labels + edges checkpointed — a catch-and-retry session must not
    // accumulate those blocks
    intercept[IllegalArgumentException] {
      Dedup.componentLabels(verts, pairs, maxIters = 0)
    }
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"error path left ${leaked.size} persistent RDDs behind")
  }

  test("LSH band schemes that fail silently downstream are refused loudly at entry") {
    val ss = TestSpark.spark
    import ss.implicits._
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d f")).toDF("doc_id", "text")
    // bands > numHashes → rowsPerBand = 0 → every band key hashes an
    // EMPTY slice → all docs collide in all bands → O(n²) self-join
    val e1 = intercept[IllegalArgumentException] {
      Dedup.minhashPairs(docs, "text", numHashes = 8, bands = 16)
    }
    assert(e1.getMessage.contains("bands"), e1.getMessage)
    // non-divisible pair → the trailing numHashes % bands signature rows
    // are silently dropped from every band key (changed recall, no error)
    val e2 = intercept[IllegalArgumentException] {
      Dedup.minhashPairsMd5(docs, "text", numHashes = 32, bands = 5)
    }
    assert(e2.getMessage.contains("divisible"), e2.getMessage)
    intercept[IllegalArgumentException] {
      Dedup.incrementalCandidatePairs(docs, docs, numHashes = 32, bands = 0)
    }
    // a valid scheme still runs — identical texts have identical
    // signatures, so the band collision (and the pair) is guaranteed
    val twins = Seq((1L, "a b c d e"), (2L, "a b c d e")).toDF("doc_id", "text")
    assert(Dedup.minhashPairs(twins, "text", numHashes = 16, bands = 4,
      threshold = 0.9).count() == 1)
  }
}
