package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{Layout, Manifest}

/** Measure the Manifest's OWN ceiling (r17 verdict #6) — the one
  * unmeasured scale term left in the storage story: `prune`,
  * `requireFresh` and the kept-row half of `update` are driver-side
  * loops over ONE ROW PER FILE. The `maxFiles` guards assert a bound;
  * this prices it: synthesize tables of N real (tiny) parquet files,
  * build their manifests, and measure
  *
  *  - prune latency (narrow interval + full-range survivor collect),
  *  - requireFresh latency (directory listing + identity diff),
  *  - update latency with NOTHING changed (the pure O(manifest) driver
  *    term) and with an 8-file appended increment (the O(increment)
  *    scan + O(manifest) driver term the daily loop pays),
  *  - manifest build / persist / read, and
  *  - the driver footprint of the collected manifest rows
  *    (SizeEstimator over the collect() both gates hold).
  *
  * The numbers feed the scaladoc ceiling statement in Manifest.scala:
  * the regime where per-file rows stop being viable planner state and a
  * two-level (partition-grouped) manifest becomes necessary.
  *
  * Usage: ProfileManifest <workDir> [sizes, default 10000,100000]
  * Prints one JSON line per size.
  */
object ProfileManifest {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileManifest <workDir> [sizes]")
    val work = args(0)
    val sizes = if (args.length > 1) args(1).split(",").map(_.trim.toInt).toSeq
                else Seq(10000, 100000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Conf.applyTuned(spark)
    def log(s: String): Unit = System.err.println(s"[manifest_ceiling] $s")

    def med3(f: () => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }

    sizes.foreach { n =>
      val dir = s"$work/files_$n"
      val manifestPath = s"$work/manifest_$n"
      // one row per file via maxRecordsPerFile (32 tasks each writing a
      // run of 1-row files — N write TASKS would pay scheduler overhead
      // per file, this pays only the parquet open/close)
      val t0 = System.nanoTime()
      spark.range(n.toLong)
        .select(col("id").as("doc_id"), (col("id") % 997).as("v"))
        .repartitionByRange(32, col("doc_id"))
        .sortWithinPartitions(col("doc_id"))
        .write.mode("overwrite").option("maxRecordsPerFile", 1).parquet(dir)
      log(f"staged $n one-row files in ${(System.nanoTime() - t0) / 1e9}%.1f s")

      val tb0 = System.nanoTime()
      val m0 = Manifest.build(spark, dir, Seq("doc_id"))
      val buildS = (System.nanoTime() - tb0) / 1e9
      val rows = m0.count()
      require(rows == n, s"expected $n manifest rows, got $rows")
      val writeS = med3(() => Manifest.write(m0, manifestPath))
      var m: DataFrame = null
      val readS = med3(() => { m = Manifest.read(spark, manifestPath)
        m.count(); () })

      // driver footprint: the collected per-file rows BOTH gates hold
      val collected = m.collect()
      val bytes = org.apache.spark.util.SizeEstimator.estimate(collected)

      val narrowLo = n / 2L
      val narrowHi = n / 2L + math.max(1, n / 1000)
      val pruneNarrowS = med3(() => { Manifest.prune(m,
        Map("doc_id" -> (narrowLo, narrowHi))); () })
      val pruneFullS = med3(() => { Manifest.prune(m,
        Map("doc_id" -> (0L, n.toLong)), maxFiles = 1 << 21); () })
      val freshS = med3(() => Manifest.requireFresh(spark, dir, m))
      val updateNoopS = med3(() => { Manifest.update(spark, dir, m); () })

      // the daily-loop shape: an 8-file increment appended, manifest
      // brought forward (O(increment) scan + the O(manifest) driver term)
      val inc = spark.range(n.toLong, n + 1000L)
        .select(col("id").as("doc_id"), (col("id") % 997).as("v"))
      val tu0 = System.nanoTime()
      Layout.appendClustered(inc, dir, 8, "doc_id")
      val mUpd = Manifest.update(spark, dir, m)
      val updateIncS = (System.nanoTime() - tu0) / 1e9
      require(mUpd.count() == n + 8L, s"update rows: ${mUpd.count()}")
      // leave the dir coherent for any re-run
      Manifest.write(mUpd, manifestPath)

      val readPrunedS = med3(() => {
        Manifest.readPruned(spark, dir, mUpd,
          Map("doc_id" -> (narrowLo, narrowHi))).count(); () })

      log(f"n=$n build=$buildS%.2f s prune_narrow=${pruneNarrowS * 1000}%.0f ms " +
        f"prune_full=${pruneFullS * 1000}%.0f ms fresh=${freshS * 1000}%.0f ms " +
        f"update_noop=${updateNoopS * 1000}%.0f ms update_inc8=$updateIncS%.2f s " +
        f"read_pruned=$readPrunedS%.2f s driver_bytes=$bytes")
      println(f"""{"metric":"manifest_ceiling","files":$n,""" +
        f""""build_s":$buildS%.3f,"write_s":$writeS%.3f,"read_s":$readS%.3f,""" +
        f""""prune_narrow_s":$pruneNarrowS%.4f,"prune_full_s":$pruneFullS%.4f,""" +
        f""""require_fresh_s":$freshS%.4f,"update_noop_s":$updateNoopS%.4f,""" +
        f""""update_inc8_s":$updateIncS%.3f,"read_pruned_s":$readPrunedS%.3f,""" +
        f""""driver_row_bytes":$bytes}""")

      // ---- the two-level form on the SAME table (r18): head-to-head
      // with the flat terms above. Groups = id-range chunks of ~1000
      // files (the daily-increment analog), assigned off the flat
      // manifest's rows so each group is id-disjoint.
      val gRoot = s"$work/grouped_$n"
      val nGroups = math.max(1, n / 1000)
      val ordered = mUpd.select(col("_file"), col("doc_id__min"))
        .collect().sortBy(_.getLong(1)).map(_.getString(0))
      val chunks = ordered.grouped(
        math.ceil(ordered.length.toDouble / nGroups).toInt).toSeq
      val gm2 = graft.sources.GroupedManifest(gRoot, Seq("doc_id"))
      val tg0 = System.nanoTime()
      chunks.zipWithIndex.foreach { case (fsq, i) =>
        gm2.writeGroup(spark, f"g$i%04d", fsq.toSeq); ()
      }
      val gBuildS = (System.nanoTime() - tg0) / 1e9
      val gPruneNarrowS = med3(() => { gm2.prune(spark,
        Map("doc_id" -> (narrowLo, narrowHi))); () })
      val gFreshS = med3(() => gm2.requireFresh(spark, dir))
      val tgs0 = System.nanoTime()
      gm2.requireFresh(spark, dir, strict = true)
      val gFreshStrictS = (System.nanoTime() - tgs0) / 1e9
      val gReadPrunedS = med3(() => {
        gm2.readPruned(spark, dir,
          Map("doc_id" -> (narrowLo, narrowHi))).count(); () })
      val ixRows = gm2.index(spark).collect()
      val ixBytes = org.apache.spark.util.SizeEstimator.estimate(ixRows)
      // parity: same survivors as the flat prune
      val flatSurv = Manifest.prune(mUpd,
        Map("doc_id" -> (narrowLo, narrowHi))).toSet
      val gSurv = gm2.prune(spark,
        Map("doc_id" -> (narrowLo, narrowHi))).toSet
      require(gSurv == flatSurv,
        s"grouped prune diverged from flat: ${gSurv.size} vs ${flatSurv.size}")
      log(f"n=$n GROUPED(${chunks.size} groups) build=$gBuildS%.1f s " +
        f"prune_narrow=${gPruneNarrowS * 1000}%.0f ms " +
        f"fresh_gate(agg+digest)=${gFreshS * 1000}%.0f ms " +
        f"fresh_strict=$gFreshStrictS%.2f s " +
        f"read_pruned=$gReadPrunedS%.2f s index_bytes=$ixBytes " +
        "(prune parity with flat: ok)")
      println(f"""{"metric":"manifest_ceiling_grouped","files":$n,""" +
        f""""groups":${chunks.size},"build_s":$gBuildS%.2f,""" +
        f""""prune_narrow_s":$gPruneNarrowS%.4f,""" +
        f""""require_fresh_aggregate_s":$gFreshS%.4f,""" +
        f""""require_fresh_strict_s":$gFreshStrictS%.3f,""" +
        f""""read_pruned_s":$gReadPrunedS%.3f,"index_bytes":$ixBytes}""")

      // ---- r19: the BULK adoption path on the same table + chunking —
      // buildGrouped's one-scan build vs the per-group writeGroup loop
      // above and the flat build; index must equal the accreted one.
      val fileToGroup = chunks.zipWithIndex.flatMap { case (fsq, i) =>
        fsq.map(f => Manifest.normalize(f) -> f"g$i%04d")
      }.toMap
      val gm3 = graft.sources.GroupedManifest(
        s"$work/grouped_bulk_$n", Seq("doc_id"))
      val tb3 = System.nanoTime()
      gm3.buildGrouped(spark, dir, f => fileToGroup(f))
      val bulkS = (System.nanoTime() - tb3) / 1e9
      require(gm3.index(spark).collect().map(_.toString).sorted.toSeq ==
        gm2.index(spark).collect().map(_.toString).sorted.toSeq,
        "bulk index must equal the accreted index row-for-row")
      // the digest tier's catch, priced: backdate-rewrite one file
      // (same bytes, mtime under the max) and time the refusing gate +
      // the auditDrift attribution that names it
      val fsys = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val victim = new org.apache.hadoop.fs.Path(
        new java.net.URI(ordered(ordered.length / 3)))
      val vst = fsys.getFileStatus(victim)
      val vbytes = new Array[Byte](vst.getLen.toInt)
      val vin = fsys.open(victim)
      try vin.readFully(0L, vbytes) finally vin.close()
      val vout = fsys.create(victim, true)
      try vout.write(vbytes) finally vout.close()
      fsys.setTimes(victim, vst.getModificationTime - 7, -1)
      val tdg = System.nanoTime()
      val caught = try { gm3.requireFresh(spark, dir); false }
        catch { case _: IllegalArgumentException => true }
      val digestCatchS = (System.nanoTime() - tdg) / 1e9
      require(caught, "the digest gate must catch the backdated rewrite")
      val ta = System.nanoTime()
      val drift = gm3.auditDrift(spark, dir)
      val auditS = (System.nanoTime() - ta) / 1e9
      require(drift.size == 1 && drift.head._3 == "rewritten_in_place",
        s"auditDrift must name exactly the victim: $drift")
      // converge: rewriteGroup just the drifted group, gate green again
      val grp = drift.head._1
      val grpFiles = gm3.groupManifest(spark, grp)
        .select(col("_file")).collect().map(_.getString(0)).toSeq
      val tc = System.nanoTime()
      gm3.rewriteGroup(spark, grp, grpFiles)
      val convergeS = (System.nanoTime() - tc) / 1e9
      gm3.requireFresh(spark, dir)
      log(f"n=$n BULK buildGrouped=$bulkS%.1f s (vs flat build=$buildS%.1f s, " +
        f"writeGroup loop=$gBuildS%.1f s); digest gate caught the backdated " +
        f"rewrite in $digestCatchS%.2f s, auditDrift attributed it in " +
        f"$auditS%.2f s, rewriteGroup($grp) converged in $convergeS%.2f s")
      println(f"""{"metric":"manifest_bulk_adoption","files":$n,""" +
        f""""groups":${chunks.size},"build_grouped_s":$bulkS%.2f,""" +
        f""""flat_build_s":$buildS%.2f,"writegroup_loop_s":$gBuildS%.2f,""" +
        f""""digest_catch_s":$digestCatchS%.3f,"audit_drift_s":$auditS%.3f,""" +
        f""""converge_rewrite_s":$convergeS%.3f}""")
    }
    spark.stop()
  }
}
