package graft

import org.apache.spark.sql.SparkSession

/** Recommended session configuration for running graft at cluster scale.
  *
  * Everything here is a runtime-settable SQLConf, so it can be applied to
  * an existing session (`Conf.applyTuned(spark)`) or passed as `--conf`
  * pairs. Rationale per key:
  *
  *  - AQE + skew join: re-plans shuffle partition counts and splits skewed
  *    partitions from runtime statistics — mandatory at 100 TB where
  *    static estimates are wrong by orders of magnitude.
  *  - Runtime bloom filters: for a shuffle join whose dimension side has a
  *    selective predicate, Spark injects a bloom filter built from the dim
  *    keys into the fact-side scan — rows that cannot join are dropped
  *    BEFORE the shuffle (semi-join reduction without writing one). The
  *    fact side of q3/q5-class joins shrinks by the dim selectivity.
  *  - applicationSideScanSizeThreshold is lowered from the 10 GB default
  *    so the filter also fires at test scale; at 100 TB any fact scan
  *    clears either bar.
  *
  * == The 100 TB read path, composed ==
  *
  * The engine's scale layers are separate components by design (each is
  * independently spec'd); this is the recipe that wires them into one
  * ingest→read→aggregate path — what a new deployment should start from.
  * ConfSpec runs the composition end-to-end at test scale, so this
  * recipe is executable documentation, not prose.
  *
  * {{{
  * // 1. SESSION — the sizing profile from the two numbers an operator
  * //    actually knows (total cores, target partition payload):
  * Conf.applyCluster(spark, nCores = 4000)        // AQE, skew split,
  *                                                // runtime filters, sizing
  *
  * // 2. INGEST — clustered layout (tight per-file min/max footers) and
  * //    its file-stats manifest written as ONE call, so there is no
  * //    staleness window between table and planning metadata:
  * val manifest = Manifest.writeWithManifest(events, tablePath,
  *   manifestPath, cols = Seq("ts_us"), nFiles = 4096,
  *   clusterBy = Seq("ts_us"))
  * // appends later: Manifest.update(spark, tablePath, manifest) scans
  * // ONLY the new files — maintenance tracks the increment.
  *
  * // 3. READ — planning-time file skipping off the KB-sized manifest:
  * //    the object store never hears about pruned files, the staleness
  * //    gate refuses a drifted directory loudly, and the exact predicate
  * //    is re-applied row-wise (pruning is conservative):
  * val day = Manifest.readPruned(spark, tablePath, manifest,
  *   intervals = Map("ts_us" -> (dayStartUs, dayEndUs)))
  *
  * // 4. DIAGNOSE, then aggregate accordingly — keyProfile is ONE
  * //    per-key count scan (exact top-k hot keys, skew_ratio):
  * val prof = Skew.keyProfile(day, "user_id").head
  * //    skew_ratio small → plain groupBy (AQE handles the rest);
  * //    hot keys → salted two-stage agg, or skewJoinAuto for joins
  * //    (hot keys broadcast, cold keys shuffle):
  * val perUser = Skew.saltedSumCount(day, "user_id", "value")
  * }}}
  */
object Conf {

  val tuned: Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // r20 (guide §3.1/§9): allow the planner to pick shuffled-hash join
    // where its size conditions hold instead of always preferring
    // sort-merge — the SMJ sites on this surface (dedup pair attach,
    // curation label joins, q_upsert) sort array/text payload rows whose
    // order the join never needs. This is a PREFERENCE, not a force: the
    // planner still requires the build side to fit its per-partition hash
    // map bound (autoBroadcastJoinThreshold × shuffle.partitions) and
    // falls back to sort-merge otherwise, and AQE skew-split continues to
    // apply. Measured r20 (sf0.1/32c, med-of-5): dedup_canonical_best
    // 0.85→0.60 s, pipeline_curation ~1.3→0.87 s, q_upsert 0.42→0.26 s;
    // dedup_minhash/dedup_ngram flat. Oracle hashes identical (89/89).
    "spark.sql.join.preferSortMergeJoin" -> "false",
    // r20 (guide §2.2/§2.5): AQE's byte-based partition coalescing
    // serializes CPU-dense post-shuffle work on small-BYTE exchanges —
    // the fuzzy-join candidate set (≈380k id-pair rows ≈ 3 MB) coalesced
    // to 2 partitions under the default 1 MB floor, so the Levenshtein
    // verify ran on 2 cores of 32 (measured: ~2.4 s of fuzzy_pairs' wall
    // was this one stage). 256 KB lowers the coalescing target toward
    // totalBytes/parallelism for such shuffles while still merging the
    // genuinely tiny ones — the measured sweet spot: a 64 KB floor bought
    // fuzzy_pairs another ~0.2 s but taxed ~90 small window/agg queries
    // ~0.1-0.2 s each in extra per-task overhead (clean-window med-of-5
    // A/B at 64KB/256KB/1MB on ts_sessionize, ts_sample,
    // ts_fourier_features, q_topk_per_group, ts_rul_validation,
    // q_top_words: 256 KB ≈ 1 MB on all six, fuzzy_pairs 2.63→2.07 s).
    // Scale note: this is the parallelismFirst=true (default) code path
    // only; the cluster profile below sets parallelismFirst=false, where
    // coalescing follows advisoryPartitionSizeInBytes and this floor is
    // inert — so the knob fixes the CPU-per-byte-heavy small-shuffle
    // case without changing the 100 TB byte-sizing story.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "256KB",
    // r21 (guide §3.1): let AQE rewrite sort-merge → shuffled-hash at
    // RUNTIME when every post-shuffle partition fits the local-map bound.
    // preferSortMergeJoin=false (above) only helps when the PLANNER's
    // size estimates satisfy its build-side conditions; q_upsert's
    // full-outer snapshot diff joins a filtered-union side whose estimate
    // is ~the whole table (no CBO selectivity for `% 10 = 0`), so it
    // stayed SMJ (the r20 verdict's contradicted-claim item). Runtime
    // sizes don't lie. The value must be ≥ advisoryPartitionSizeInBytes
    // (64MB default here) for the rule to fire; a 64MB per-partition hash
    // map is the same memory class the planner-side bound already allows
    // (autoBroadcastJoinThreshold × shuffle.partitions). The cluster
    // profile sets it to targetPartitionBytes alongside its advisory.
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" -> "64MB",
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    // the comparison is against the COLUMN-PRUNED scan estimate, so even a
    // multi-MB fact file can present well under 1MB once projected — 64KB
    // keeps the filter firing at test scale; at 100 TB any fact scan
    // clears any reasonable bar, and extra runtime filters on small scans
    // cost one tiny aggregate each
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "64KB")

  def applyTuned(spark: SparkSession): Unit =
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }

  /** Deployment profile for a REAL cluster — the conf block a 100-TB
    * graft job launches with, derived from the two numbers an operator
    * actually knows: total executor cores and the partition payload size
    * the executors' memory comfortably holds. All runtime-settable
    * SQLConfs (apply to a live session or pass as `--conf` pairs).
    *
    * Sizing rationale:
    *  - static `shuffle.partitions` = 2×cores — enough parallelism that a
    *    straggler wave doesn't idle the cluster, few enough that
    *    per-partition fixed costs stay amortized...
    *  - ...but with AQE coalescing ON, the static number is only the
    *    FLOOR of the search space: `initialPartitionNum` = 8×cores lets
    *    AQE start fine-grained and coalesce to `advisoryPartitionSize`
    *    (= targetPartitionBytes) from observed sizes — the knob that
    *    actually governs post-shuffle partition payloads at scale.
    *  - `files.maxPartitionBytes` = targetPartitionBytes bounds the SCAN
    *    side the same way (a 100 TB parquet read becomes ~target-sized
    *    splits; too big spills, too small drowns in task overhead).
    *  - skew: a partition 4× the advisory target (and over the absolute
    *    threshold) is split by AQE skew-join handling — hot trajectory /
    *    hot band keys get subdivided instead of serializing one reducer.
    *  - `autoBroadcastJoinThreshold` raised to 64 MB: executors sized for
    *    target-payload partitions have the headroom, and every dim table
    *    in this engine's join family (region/nation/customer slices,
    *    label maps, codebooks) should broadcast, never shuffle the fact.
    */
  def cluster(nCores: Int,
              targetPartitionBytes: Long = 128L << 20,
              broadcastThresholdBytes: Long = 64L << 20): Map[String, String] = {
    require(nCores > 0, s"cluster profile: nCores must be positive, got $nCores")
    require(targetPartitionBytes >= (1L << 20) && targetPartitionBytes <= (2L << 30),
      s"cluster profile: targetPartitionBytes $targetPartitionBytes outside [1MB, 2GB] — " +
        "below spends the job in task overhead, above risks executor OOM/spill")
    require(broadcastThresholdBytes >= 0,
      s"cluster profile: negative broadcast threshold disables broadcasting — " +
        "pass 0 explicitly if that is intended")
    tuned ++ Map(
      "spark.sql.shuffle.partitions" -> (2L * nCores).toString,
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      // parallelismFirst defaults to TRUE, under which AQE coalesces
      // toward default parallelism and IGNORES the advisory size — the
      // profile's central sizing knob would silently never take effect
      // (self-review catch); false = respect advisoryPartitionSizeInBytes
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum" ->
        (8L * nCores).toString,
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        targetPartitionBytes.toString,
      // keep the runtime SMJ→SHJ rewrite live under the profile's larger
      // advisory size (the rule needs threshold ≥ advisory): a hash map
      // over one target-sized partition is within the same executor
      // memory budget the advisory sizing already assumes
      "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" ->
        targetPartitionBytes.toString,
      "spark.sql.files.maxPartitionBytes" -> targetPartitionBytes.toString,
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "4",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        (4L * targetPartitionBytes).toString,
      "spark.sql.autoBroadcastJoinThreshold" -> broadcastThresholdBytes.toString)
  }

  def applyCluster(spark: SparkSession, nCores: Int,
                   targetPartitionBytes: Long = 128L << 20,
                   broadcastThresholdBytes: Long = 64L << 20): Unit =
    cluster(nCores, targetPartitionBytes, broadcastThresholdBytes)
      .foreach { case (k, v) => spark.conf.set(k, v) }
}
