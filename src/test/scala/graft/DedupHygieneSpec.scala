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
}
