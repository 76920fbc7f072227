package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup}
import graft.sources.{Layout, Manifest}

/** The storage side of the daily curation loop (r15 verdict #4): the
  * README's loop ended at `verdicts.write.parquet(...)` — plain,
  * unclustered, manifest-less — while the engine owns clustered writes,
  * manifests and incremental manifest maintenance. This spec executes
  * the composed pattern end-to-end so it cannot rot:
  *
  *   day N   curateIncrement → Manifest.writeWithManifest (clustered
  *           verdicts + manifest in one consistent single-writer pair)
  *   day N+1 curateIncrement → Layout.appendClustered (existing files
  *           untouched) → Manifest.update (scans ONLY the new files)
  *           → pruned reads skip the other day's files entirely
  *
  * with the loud staleness refusal pinned at the exact moment the loop
  * would hit it (after the append, before the update). */
class CurationStorageSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  private def uniq(tag: String, n: Int): String =
    (0 until n).map(i => s"${tag}w$i").mkString(" ")

  test("daily verdicts: clustered+manifested write, incremental day-2 maintenance, pruned per-day reads") {
    import graft.ml.{Bpe, NgramLm}
    val tmp = java.nio.file.Files.createTempDirectory("curation_storage").toString
    val table = s"$tmp/verdicts"
    val manifestPath = s"$tmp/verdicts_manifest"

    // corpus + frozen labels + corpus-fit models; the quality gates are
    // neutralized (maxPpl = 1e6, no compress bounds) — this spec pins the
    // STORAGE contract, CurationRecipeSpec owns the verdict semantics
    val corpusText = uniq("oa", 40)
    val old = Seq((1L, corpusText), (2L, uniq("ob", 30)), (3L, uniq("oc", 30)))
      .toDF("doc_id", "text")
    val oldLabels = Dedup.dedupClusters(old, threshold = 0.8)
      .select("doc_id", "cluster_id")
    val train = Seq((1L, corpusText)).toDF("doc_id", "text")
    val lm = NgramLm.fit(train, "text")
    val (bpe, _) = Bpe.fit(train, "text", numMerges = 20)

    def curate(batch: org.apache.spark.sql.DataFrame,
               corpus: org.apache.spark.sql.DataFrame,
               labels: org.apache.spark.sql.DataFrame) =
      Curation.curateIncrement(batch, "doc_id", "text", corpus, labels,
        lm, maxPpl = 1e6, bpe, nearThreshold = 0.8, md5Family = true)

    // ---- day 1: ids 100-105, every storage-relevant verdict class ----
    val day1 = Seq(
      (101L, uniq("k1", 25)),   // keeper
      (102L, corpusText),       // dup_of_corpus
      (103L, ""),               // no_tokens
      (104L, uniq("k4", 25)),   // keeper, canonical of {104, 105}
      (105L, uniq("k4", 25))    // exact_dup of 104 within the batch
    ).toDF("doc_id", "text")
    val (verdicts1, h1) = curate(day1, old, oldLabels)
    // materialize THROUGH the storage pair first, close the handle after
    // (the README ordering) — writeWithManifest is the materialization
    val m1 = Manifest.writeWithManifest(verdicts1, table, manifestPath,
      cols = Seq("doc_id"), nFiles = 2, clusterBy = Seq("doc_id"))
    h1.close()
    assert(m1.count() == 2, "day-1 clustered write should land 2 files")
    Manifest.requireFresh(spark, table, m1) // consistent by construction

    // ---- day 2: loop closed (labels roll forward), ids 200-203 ----
    // yesterday's keepers come from the WRITTEN table, not the closed
    // frame: after handle.close() the verdict frame's checkpoint blocks
    // are freed and re-evaluating it would fail (the documented
    // IncrementHandle contract) — the storage pair IS the durable copy
    val v1 = spark.read.parquet(table)
      .select("doc_id", "text", "cluster_id", "curation_reject").collect()
    val k1 = v1.filter(_.isNullAt(3))
    assert(k1.length == 2, s"day-1 keepers: ${k1.length}")
    val keepers1 = k1.map(r => (r.getLong(0), r.getString(1))).toSeq
      .toDF("doc_id", "text")
    val corpus1 = old.unionByName(keepers1)
    val labels1 = oldLabels.unionByName(
      k1.map(r => (r.getLong(0), r.getLong(2))).toSeq
        .toDF("doc_id", "cluster_id"))
    val day2 = Seq(
      (201L, uniq("k6", 25)),       // keeper
      (202L, uniq("k1", 25)),       // copy of YESTERDAY's keeper -> dup_of_corpus
      (203L, uniq("k7", 25))        // keeper
    ).toDF("doc_id", "text")
    val (verdicts2, h2) = curate(day2, corpus1, labels1)
    val v2rows = verdicts2.collect()
    assert(v2rows.count(_.isNullAt(3)) == 2, "2 day-2 keepers")
    assert(v2rows.exists(r => r.getLong(0) == 202L &&
      r.getString(3) == "dup_of_corpus" && r.getLong(2) == 101L),
      "yesterday's keeper must catch today's copy (loop closure)")
    // append the increment: existing files byte-identical, 2 new files
    Layout.appendClustered(verdicts2, table, 2, "doc_id")
    h2.close()

    // the day-1 manifest is now stale — and must REFUSE, not silently
    // under-read (this is the moment the unmaintained README loop dies)
    val stale = intercept[IllegalArgumentException] {
      Manifest.requireFresh(spark, table, m1)
    }
    assert(stale.getMessage.contains("missing from manifest"), stale.getMessage)

    // incremental maintenance: day-1 stats rows are reused VERBATIM
    // (same file, same length, same mtime, same min/max), only the two
    // appended files are scanned
    val m2 = Manifest.update(spark, table, m1)
    assert(m2.count() == 4, s"2 day-1 + 2 day-2 files: ${m2.count()}")
    // snapshot m1 NOW — Manifest.write(m2) below overwrites the parquet
    // files m1's lazy plan reads from
    val m1Collected = m1.collect()
    val m1Rows = m1Collected.map(_.toString).toSet
    val day1Files = m1Collected
      .map(_.getString(m1.schema.fieldIndex("_file"))).toSet
    val m2Rows = m2.collect().map(_.toString).toSet
    assert(m1Rows.subsetOf(m2Rows),
      "day-1 manifest rows must carry over untouched into the updated manifest")
    Manifest.write(m2, manifestPath) // tomorrow's manifest, maintained
    val m2Read = Manifest.read(spark, manifestPath)
    Manifest.requireFresh(spark, table, m2Read)

    // pruning measured: each day's id block survives only to that day's
    // files (ids are disjoint per day, so the clustered increments own
    // disjoint doc_id slices)
    val day2Band = Map("doc_id" -> (200L: Any, 299L: Any))
    val day1Band = Map("doc_id" -> (100L: Any, 199L: Any))
    val survDay2 = Manifest.prune(m2Read, day2Band)
    assert(survDay2.nonEmpty && survDay2.size <= 2 &&
      survDay2.forall(f => !day1Files.contains(f)),
      s"day-2 band must prune to day-2 files only: $survDay2")
    val survDay1 = Manifest.prune(m2Read, day1Band)
    assert(survDay1.nonEmpty && survDay1.toSet.subsetOf(day1Files),
      s"day-1 band must prune to day-1 files only: $survDay1")

    // and the pruned read is row-identical to the full-scan filter
    val full = spark.read.parquet(table)
      .filter(col("doc_id") >= 200L && col("doc_id") <= 299L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val pruned = Manifest.readPruned(spark, table, m2Read, day2Band)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(pruned == full && full.size == 3,
      s"pruned day-2 read drifted: $pruned vs $full")
  }

  test("IncrementStore: the one-call daily storage owner — create, append+maintain, pruned reads, always-fresh manifest") {
    import graft.sources.IncrementStore
    val tmp = java.nio.file.Files.createTempDirectory("increment_store").toString
    val store = IncrementStore(s"$tmp/verdicts", s"$tmp/verdicts_manifest",
      filesPerIncrement = 2)

    // three days of verdict-shaped increments with per-day id blocks
    def day(ids: Range): org.apache.spark.sql.DataFrame =
      ids.map(i => (i.toLong, s"text $i",
          if (i % 5 == 0) None else Some(i.toLong),
          if (i % 5 == 0) Some("high_perplexity") else None))
        .toDF("doc_id", "text", "cluster_id", "curation_reject")

    val m1 = store.writeIncrement(day(100 until 120)) // creates the pair
    assert(m1.count() == 2)
    val m2 = store.writeIncrement(day(200 until 220)) // append + update
    assert(m2.count() == 4)
    val m3 = store.writeIncrement(day(300 until 330)) // and again
    assert(m3.count() == 6)

    // the persisted manifest is always current: a read straight off the
    // store passes the staleness gate without any caller-side repair
    val day2 = store.readRange(spark,
      Map("doc_id" -> (200L: Any, 299L: Any)))
    assert(day2.count() == 20)
    assert(day2.filter(col("curation_reject").isNull).count() == 16)

    // pruning goes through the manifest, not a directory scan: the day-2
    // band survives only to day-2's files
    val surv = Manifest.prune(store.manifest(spark),
      Map("doc_id" -> (200L: Any, 299L: Any)))
    assert(surv.nonEmpty && surv.size <= 2,
      s"day-2 band should prune 6 files to <=2: ${surv.size}")

    // the staleCheck=false fast path (store-discipline writes keep the
    // manifest current by construction) reads identically while fresh
    assert(store.readRange(spark, Map("doc_id" -> (200L: Any, 299L: Any)),
      staleCheck = false).count() == 20)

    // an out-of-band writer makes the next read REFUSE, not under-read
    day(400 until 410).write.mode("append").parquet(s"$tmp/verdicts")
    val stale = intercept[IllegalArgumentException] {
      store.readRange(spark, Map("doc_id" -> (100L: Any, 199L: Any)))
    }
    assert(stale.getMessage.contains("missing from manifest"), stale.getMessage)
    // ...and one maintenance pass over just the foreign files repairs it
    val m4 = Manifest.update(spark, s"$tmp/verdicts", store.manifest(spark))
    Manifest.write(m4, s"$tmp/verdicts_manifest")
    assert(store.readRange(spark,
      Map("doc_id" -> (400L: Any, 499L: Any))).count() == 10)
  }

  test("IncrementStore: refuses to create over a pre-existing manifest-less table (the overwrite hazard), adoptable via Manifest.build") {
    import graft.sources.IncrementStore
    val tmp = java.nio.file.Files.createTempDirectory("store_adopt").toString
    // a pre-store table: parquet data, no manifest
    val pre = (1 to 30).map(i => (i.toLong, s"pre $i"))
      .toDF("doc_id", "text")
    pre.write.parquet(s"$tmp/table")
    val store = IncrementStore(s"$tmp/table", s"$tmp/manifest",
      filesPerIncrement = 2, statsCols = Seq("doc_id"))
    val inc = (100 to 110).map(i => (i.toLong, s"day $i"))
      .toDF("doc_id", "text")
    // keying create-vs-append on manifest existence alone would take the
    // SaveMode.Overwrite create path here and silently destroy `pre`
    val refused = intercept[IllegalArgumentException] {
      store.writeIncrement(inc)
    }
    assert(refused.getMessage.contains("OVERWRITE") &&
      refused.getMessage.contains("Manifest.build"), refused.getMessage)
    assert(spark.read.parquet(s"$tmp/table").count() == 30,
      "the refusal must leave the pre-existing table untouched")
    // adoption: build + persist the manifest, then writeIncrement appends
    Manifest.write(Manifest.build(spark, s"$tmp/table", Seq("doc_id")),
      s"$tmp/manifest")
    store.writeIncrement(inc)
    assert(spark.read.parquet(s"$tmp/table").count() == 41,
      "post-adoption writeIncrement must append, not overwrite")
    assert(store.readRange(spark,
      Map("doc_id" -> (100L: Any, 199L: Any))).count() == 11)
  }

  test("IncrementStore.deleteRows: erasure as a consistent pair — only dirty files rewritten, clean manifest rows verbatim, gate stays green") {
    import graft.sources.IncrementStore
    val tmp = java.nio.file.Files.createTempDirectory("store_delete").toString
    val store = IncrementStore(s"$tmp/verdicts", s"$tmp/manifest",
      filesPerIncrement = 2)
    def day(ids: Range): org.apache.spark.sql.DataFrame =
      ids.map(i => (i.toLong, s"text $i",
          if (i % 5 == 0) None else Some(i.toLong),
          if (i % 5 == 0) Some("high_perplexity") else None))
        .toDF("doc_id", "text", "cluster_id", "curation_reject")
    store.writeIncrement(day(100 until 120))
    store.writeIncrement(day(200 until 220))
    store.writeIncrement(day(300 until 330))
    val before = store.manifest(spark).collect().map(_.toString).toSet

    // erase a band inside day 2: on the per-day clustered layout only
    // day-2's files can be dirty
    val stats = store.deleteRows(spark, "doc_id",
      (205L until 210L).map(x => x: Any))
    assert(stats.rowsDeleted == 5, s"rowsDeleted=${stats.rowsDeleted}")
    assert(stats.filesTotal == 6 && stats.filesRewritten <= 2,
      s"dirty-proportional: ${stats.filesRewritten}/${stats.filesTotal} rewritten")

    // the manifest came forward in the same call: default-gated reads
    // stay green, the victims are gone, neighbors intact
    val day2 = store.readRange(spark, Map("doc_id" -> (200L: Any, 299L: Any)))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(day2 == ((200L until 205L) ++ (210L until 220L)).toSeq,
      s"day-2 after delete: $day2")
    assert(store.readRange(spark,
      Map("doc_id" -> (100L: Any, 199L: Any))).count() == 20,
      "untouched day must read unchanged")

    // clean files' manifest rows are reused verbatim (O(dirty)
    // maintenance) and pruning still works off the refreshed manifest
    val after = store.manifest(spark).collect().map(_.toString).toSet
    assert((before & after).size == 6 - stats.filesRewritten,
      "every clean file's manifest row must carry over byte-identical")
    val surv = Manifest.prune(store.manifest(spark),
      Map("doc_id" -> (100L: Any, 199L: Any)))
    assert(surv.nonEmpty && surv.size <= 2,
      s"day-1 band should still prune to <=2 files: ${surv.size}")

    // ---- the erasure edge a real request can hit: a band covering an
    // ENTIRE file — the file is rewritten empty (n_rows=0 manifest row,
    // pruned by every interval), neighbors untouched, gate green
    val statsAll = store.deleteRows(spark, "doc_id",
      (210L until 220L).map(x => x: Any) ++ (200L until 205L).map(x => x: Any))
    assert(statsAll.rowsDeleted == 15, s"${statsAll.rowsDeleted}")
    assert(store.readRange(spark,
      Map("doc_id" -> (200L: Any, 299L: Any))).count() == 0,
      "day 2 must now be fully erased")
    assert(store.readRange(spark,
      Map("doc_id" -> (300L: Any, 399L: Any))).count() == 30)

    // ---- store-owned compaction: the append path's maintenance job ----
    // snapshot the whole table before, compact the 6 accreted files to
    // ~1, and the store must stay readable, row-identical, gate green
    val before6 = spark.read.parquet(s"$tmp/verdicts")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val mC = store.compact(spark, targetFileBytes = 64L << 20)
    assert(mC.count() < 6, s"compaction should shrink the file count")
    val afterC = spark.read.parquet(s"$tmp/verdicts")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(afterC == before6, "compaction must be row-preserving")
    val day1C = store.readRange(spark,
      Map("doc_id" -> (100L: Any, 199L: Any)))
    assert(day1C.count() == 20,
      "post-compaction pruned reads must stay green and exact")
    // and the pair keeps accreting afterwards — the maintenance job does
    // not end the table's life
    store.writeIncrement(day(400 until 410))
    assert(store.readRange(spark,
      Map("doc_id" -> (400L: Any, 499L: Any))).count() == 10)
  }

  test("store maintenance refuses to start over a leftover staging dir and names the recovery (mid-swap crash contract)") {
    import graft.sources.IncrementStore
    val tmp = java.nio.file.Files.createTempDirectory("store_staging").toString
    val store = IncrementStore(s"$tmp/verdicts", s"$tmp/manifest",
      filesPerIncrement = 2)
    store.writeIncrement((1 to 20).map(i => (i.toLong, s"t $i"))
      .toDF("doc_id", "text"))
    // a prior maintenance job "died mid-swap": its staging dir may hold
    // the only copy of live rows — the next attempt must refuse and say
    // how to recover, never silently clear it
    for (stage <- Seq("__delete_staging", "__compact_staging")) {
      val p = new org.apache.hadoop.fs.Path(s"$tmp/verdicts$stage")
      p.getFileSystem(spark.sessionState.newHadoopConf()).mkdirs(p)
    }
    val e1 = intercept[IllegalArgumentException] {
      store.deleteRows(spark, "doc_id", Seq(1L: Any))
    }
    assert(e1.getMessage.contains("ONLY copy") &&
      e1.getMessage.contains("recover()"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      store.compact(spark, targetFileBytes = 64L << 20)
    }
    assert(e2.getMessage.contains("ONLY copy") &&
      e2.getMessage.contains("recover()"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      store.compactRange(spark, Map("doc_id" -> (1L: Any, 20L: Any)),
        targetFileBytes = 64L << 20)
    }
    assert(e3.getMessage.contains("ONLY copy") &&
      e3.getMessage.contains("recover()"), e3.getMessage)
    // the table itself is untouched by the refusals
    assert(spark.read.parquet(s"$tmp/verdicts").count() == 20)
    // both leftovers are LIST-LESS (the crash predates the first
    // original delete, by the write ordering) — recover() drops them,
    // leaves the table intact, and the store is writable again
    store.recover(spark)
    for (stage <- Seq("__delete_staging", "__compact_staging")) {
      val p = new org.apache.hadoop.fs.Path(s"$tmp/verdicts$stage")
      assert(!p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p),
        s"recover() must drop the list-less staging dir $stage")
    }
    assert(store.readRange(spark,
      Map("doc_id" -> (1L: Any, 20L: Any))).count() == 20)
    store.writeIncrement(Seq((21L, "t 21")).toDF("doc_id", "text"))
    assert(spark.read.parquet(s"$tmp/verdicts").count() == 21)
  }

  test("IncrementStore.recover: a compactRange crash between staging and the end of the delete loop — surviving originals removed, zero duplicated rows (r17 ADVICE)") {
    import graft.sources.IncrementStore
    val tmp = java.nio.file.Files.createTempDirectory("store_recover").toString
    val store = IncrementStore(s"$tmp/verdicts", s"$tmp/manifest",
      filesPerIncrement = 3)
    store.writeIncrement((1 to 30).map(i => (i.toLong, s"t $i"))
      .toDF("doc_id", "text"))
    store.writeIncrement((31 to 60).map(i => (i.toLong, s"t $i"))
      .toDF("doc_id", "text"))
    val fs = new org.apache.hadoop.fs.Path(s"$tmp/verdicts")
      .getFileSystem(spark.sessionState.newHadoopConf())

    // reconstruct the exact crash state compactRange can leave: staged
    // bin-packed copy + persisted victim list, then "die" after deleting
    // only SOME victims — the surviving-original state where the old
    // manual recipe ("move staged files in, Manifest.build") would
    // DUPLICATE the survivors' rows and bless the corruption
    val victims = graft.sources.Manifest.prune(store.manifest(spark),
      Map("doc_id" -> (1L: Any, 60L: Any)))
    assert(victims.size >= 4, s"want several victim files, got $victims")
    val staging = new org.apache.hadoop.fs.Path(s"$tmp/verdicts__compact_staging")
    spark.read.parquet(victims: _*)
      .repartitionByRange(2, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .write.parquet(staging.toString)
    val victimPaths = victims.map(new org.apache.hadoop.fs.Path(_))
    store.writeOriginalsList(fs, staging, victimPaths.map(_.getName))
    victimPaths.take(2).foreach { p => fs.delete(p, false); () }

    // the next maintenance attempt refuses and names recover()
    val e = intercept[IllegalArgumentException] {
      store.compactRange(spark, Map("doc_id" -> (1L: Any, 60L: Any)),
        targetFileBytes = 64L << 20)
    }
    assert(e.getMessage.contains("recover()"), e.getMessage)

    val m = store.recover(spark)
    assert(!fs.exists(staging), "staging must be dropped on success")
    // exactly the original 60 rows — no survivor duplicated, none lost
    val rows = store.readRange(spark, Map("doc_id" -> (1L: Any, 60L: Any)))
    assert(rows.count() == 60, s"row count after recovery: ${rows.count()}")
    assert(rows.select("doc_id").distinct().count() == 60,
      "duplicated doc_ids after recovery — the ADVICE corruption")
    // manifest is forward (gate green) and the store fully operational
    assert(m.count() > 0)
    store.writeIncrement(Seq((61L, "t 61")).toDF("doc_id", "text"))
    assert(store.readRange(spark,
      Map("doc_id" -> (61L: Any, 61L: Any))).count() == 1)
  }

  test("IncrementStore.recover: a zero-byte or mid-write victim list reads as list-less — staging dropped, originals intact, zero duplicated rows (r18 ADVICE)") {
    import graft.sources.IncrementStore
    val tmp = java.nio.file.Files.createTempDirectory("store_trunclist").toString
    val store = IncrementStore(s"$tmp/verdicts", s"$tmp/manifest",
      filesPerIncrement = 3)
    store.writeIncrement((1 to 30).map(i => (i.toLong, s"t $i"))
      .toDF("doc_id", "text"))
    val fs = new org.apache.hadoop.fs.Path(s"$tmp/verdicts")
      .getFileSystem(spark.sessionState.newHadoopConf())

    // the pre-fix corruption state: a compaction staged its full copy and
    // CRASHED inside the list write, leaving a zero-byte _graft_originals
    // with every original still on disk. Treating that as a (complete,
    // empty) list would move the staged copy in NEXT TO the intact
    // originals — every row duplicated. It must read as list-less.
    val staging = new org.apache.hadoop.fs.Path(s"$tmp/verdicts__compact_staging")
    spark.read.parquet(s"$tmp/verdicts")
      .repartitionByRange(1, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .write.parquet(staging.toString)
    val zero = fs.create(new org.apache.hadoop.fs.Path(staging,
      store.OriginalsList), true)
    zero.close()
    assert(store.readOriginalsList(fs, staging).isEmpty,
      "a zero-byte victim list must read as list-less")
    store.recover(spark)
    assert(!fs.exists(staging), "staging must be dropped")
    val rows = store.readRange(spark, Map("doc_id" -> (1L: Any, 30L: Any)))
    assert(rows.count() == 30 &&
      rows.select("doc_id").distinct().count() == 30,
      "originals must survive un-duplicated")

    // the fixed write path itself: atomic rename — the final name holds
    // the complete list, no .tmp residue
    fs.mkdirs(staging)
    store.writeOriginalsList(fs, staging, Seq("a.parquet", "b.parquet"))
    assert(store.readOriginalsList(fs, staging)
      .contains(Seq("a.parquet", "b.parquet")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(staging,
      store.OriginalsList + ".tmp")), "no temp residue after the rename")
    fs.delete(staging, true)
  }

  test("IncrementStore.recover: a deleteRows crash mid-swap — remaining staged files swapped over their originals, victims gone") {
    import graft.sources.IncrementStore
    val tmp = java.nio.file.Files.createTempDirectory("store_recover_del").toString
    val store = IncrementStore(s"$tmp/verdicts", s"$tmp/manifest",
      filesPerIncrement = 3)
    store.writeIncrement((1 to 30).map(i => (i.toLong, s"t $i"))
      .toDF("doc_id", "text"))
    val fs = new org.apache.hadoop.fs.Path(s"$tmp/verdicts")
      .getFileSystem(spark.sessionState.newHadoopConf())

    // the exact deleteRows crash state: full staged rewrite + list, one
    // file already swapped, the rest not — then the driver "dies"
    val staging = new org.apache.hadoop.fs.Path(s"$tmp/verdicts__delete_staging")
    val dropKeys: Seq[Any] = Seq(5L, 15L, 25L) // one victim per file
    graft.sources.Layout.deleteRows(spark, s"$tmp/verdicts",
      staging.toString, "doc_id", dropKeys, copyClean = false)
    val staged = store.stagedParquet(fs, staging)
    assert(staged.size >= 2, s"want >=2 rewritten files, got $staged")
    store.writeOriginalsList(fs, staging, staged.map(_.getName))
    val first = staged.head
    val dst = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(s"$tmp/verdicts"), first.getName)
    fs.delete(dst, false); fs.rename(first, dst)

    store.recover(spark)
    assert(!fs.exists(staging))
    val all = store.readRange(spark, Map("doc_id" -> (1L: Any, 30L: Any)))
    assert(all.count() == 27, s"${all.count()} rows after recovered delete")
    assert(all.filter(col("doc_id").isin(5L, 15L, 25L)).count() == 0,
      "victim rows survived the recovered delete")
  }

  test("IncrementStore.writeIncrement: schema-drift refusal — renamed/added/retyped increments named loudly, identical-schema append unchanged") {
    import graft.sources.IncrementStore
    val tmp = java.nio.file.Files.createTempDirectory("store_schema").toString
    val store = IncrementStore(s"$tmp/verdicts", s"$tmp/manifest",
      filesPerIncrement = 2)
    store.writeIncrement(Seq((1L, "a", 10L)).toDF("doc_id", "text", "cluster_id"))

    // added column
    val eAdd = intercept[IllegalArgumentException] {
      store.writeIncrement(Seq((2L, "b", 11L, 0L))
        .toDF("doc_id", "text", "cluster_id", "batch_id"))
    }
    assert(eAdd.getMessage.contains("unknown column(s) [batch_id]"),
      eAdd.getMessage)
    // renamed column reports both directions of the drift
    val eRen = intercept[IllegalArgumentException] {
      store.writeIncrement(Seq((2L, "b", 11L))
        .toDF("doc_id", "body", "cluster_id"))
    }
    assert(eRen.getMessage.contains("missing column(s) [text]") &&
      eRen.getMessage.contains("unknown column(s) [body]"), eRen.getMessage)
    // retyped column names both types
    val eTyp = intercept[IllegalArgumentException] {
      store.writeIncrement(Seq((2L, "b", 11))
        .toDF("doc_id", "text", "cluster_id"))
    }
    assert(eTyp.getMessage.contains("retyped column(s)") &&
      eTyp.getMessage.contains("cluster_id") &&
      eTyp.getMessage.contains("bigint") && eTyp.getMessage.contains("int"),
      eTyp.getMessage)
    // nothing landed: the refusals happen before the append
    assert(spark.read.parquet(s"$tmp/verdicts").count() == 1)

    // identical schema (different column ORDER — parquet resolves by
    // name) appends unchanged
    store.writeIncrement(Seq(("c", 2L, 12L)).toDF("text", "doc_id", "cluster_id"))
    val all = store.readRange(spark, Map("doc_id" -> (1L: Any, 2L: Any)))
    assert(all.count() == 2 && all.columns.sorted.toSeq ==
      Seq("cluster_id", "doc_id", "text"), all.columns.mkString(","))
  }

  test("IncrementStore(grouped): full lifecycle on the two-level metadata layer — create, append, refusals, deleteRows, compactRange, crash+recover, out-of-band adoption; reads row-exact, index stays O(groups)") {
    import graft.sources.{IncrementStore, Manifest}
    val tmp = java.nio.file.Files.createTempDirectory("store_grouped").toString
    val store = IncrementStore(s"$tmp/verdicts", s"$tmp/meta",
      filesPerIncrement = 2, grouped = true)
    val gm = store.groupedManifest
    def day(ids: Range): org.apache.spark.sql.DataFrame =
      ids.map(i => (i.toLong, s"text $i",
          if (i % 5 == 0) None else Some(i.toLong),
          if (i % 5 == 0) Some("high_perplexity") else None))
        .toDF("doc_id", "text", "cluster_id", "curation_reject")
    def checkBand(lo: Long, hi: Long, tag: String): Unit = {
      val pruned = store.readRange(spark, Map("doc_id" -> (lo: Any, hi: Any)))
        .collect().map(_.toString).sorted.toSeq
      val full = spark.read.parquet(s"$tmp/verdicts")
        .filter(col("doc_id") >= lo && col("doc_id") <= hi)
        .collect().map(_.toString).sorted.toSeq
      assert(pruned == full, s"$tag: pruned band [$lo,$hi] drifted from " +
        s"the full-scan filter (${pruned.size} vs ${full.size} rows)")
    }

    // ---- create + appends: ONE group per increment, index O(groups) ----
    store.writeIncrement(day(100 until 120))
    store.writeIncrement(day(200 until 220))
    store.writeIncrement(day(300 until 330))
    assert(gm.groupNames(spark) ==
      Seq("inc_000000", "inc_000001", "inc_000002"))
    assert(gm.index(spark).count() == 3,
      "maintenance metadata must be one index row per increment")
    assert(store.manifest(spark).count() == 6, "union view: 2 files/increment")
    checkBand(200L, 299L, "after appends")
    checkBand(100L, 399L, "after appends (all)")
    // the group-level prune localizes: the day-2 band opens only day-2's
    // group manifest (2 files out of 6)
    val surv = gm.prune(spark, Map("doc_id" -> (200L: Any, 299L: Any)))
    assert(surv.size == 2, s"day-2 band should prune to its group: $surv")

    // ---- refusals unchanged: schema drift, staging leftovers ----
    val eAdd = intercept[IllegalArgumentException] {
      store.writeIncrement(Seq((1L, "b", 11L, 0L, "x"))
        .toDF("doc_id", "text", "cluster_id", "curation_reject", "extra"))
    }
    assert(eAdd.getMessage.contains("unknown column(s) [extra]"), eAdd.getMessage)

    // ---- deleteRows: dirty-proportional, group metadata reconciled ----
    val stats = store.deleteRows(spark, "doc_id",
      (205L until 210L).map(x => x: Any))
    assert(stats.rowsDeleted == 5 && stats.filesRewritten <= 2,
      s"dirty-proportional: ${stats.filesRewritten}/${stats.filesTotal}")
    assert(gm.index(spark).count() == 3, "no group appears or vanishes")
    checkBand(200L, 299L, "after delete")
    checkBand(100L, 199L, "after delete (untouched day)")
    gm.requireFresh(spark, s"$tmp/verdicts", strict = true)

    // ---- compactRange over days 2+3: their groups retire into one
    // fresh inc_ group; day 1's group manifest rows stay VERBATIM ----
    val day1Rows = gm.groupManifest(spark, "inc_000000").collect()
      .map(_.toString).sorted.toSeq
    store.compactRange(spark, Map("doc_id" -> (200L: Any, 399L: Any)),
      targetFileBytes = 64L << 20)
    val names = gm.groupNames(spark)
    assert(names == Seq("inc_000000", "inc_000003"),
      s"days 2+3 should pack into one fresh MONOTONE-named group: $names")
    assert(gm.groupManifest(spark, "inc_000000").collect()
      .map(_.toString).sorted.toSeq == day1Rows,
      "the untouched group's manifest must be byte-identical (O(touched))")
    checkBand(200L, 399L, "after compactRange")
    checkBand(100L, 199L, "after compactRange (untouched day)")

    // ---- a compactRange crash mid-delete: recover() converges the
    // files AND the group metadata through the same reconciliation ----
    val fs = new org.apache.hadoop.fs.Path(s"$tmp/verdicts")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val before = spark.read.parquet(s"$tmp/verdicts")
      .collect().map(_.toString).sorted.toSeq
    val victims = gm.prune(spark, Map("doc_id" -> (100L: Any, 399L: Any)))
    assert(victims.size >= 3)
    val staging = new org.apache.hadoop.fs.Path(s"$tmp/verdicts__compact_staging")
    spark.read.parquet(victims: _*)
      .repartitionByRange(1, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .write.parquet(staging.toString)
    val vp = victims.map(new org.apache.hadoop.fs.Path(_))
    store.writeOriginalsList(fs, staging, vp.map(_.getName))
    vp.take(2).foreach { p => fs.delete(p, false); () }
    store.recover(spark)
    assert(!fs.exists(staging))
    assert(spark.read.parquet(s"$tmp/verdicts")
      .collect().map(_.toString).sorted.toSeq == before,
      "recovered table must hold exactly the pre-crash rows")
    gm.requireFresh(spark, s"$tmp/verdicts", strict = true)
    checkBand(100L, 399L, "after recover")

    // ---- out-of-band append: loud refusal, recover() adopts the
    // foreign files as their own group ----
    day(400 until 410).write.mode("append").parquet(s"$tmp/verdicts")
    val stale = intercept[IllegalArgumentException] {
      store.readRange(spark, Map("doc_id" -> (100L: Any, 199L: Any)))
    }
    assert(stale.getMessage.contains("stale"), stale.getMessage)
    store.recover(spark)
    checkBand(400L, 499L, "after adopting the foreign increment")
    // and the store keeps accreting
    store.writeIncrement(day(500 until 510))
    checkBand(100L, 599L, "after post-recovery append")
  }

  test("IncrementStore(grouped): a crash between a mutation's group-manifest writes and its staged index write — recover() restores a green gate (r19 ADVICE, high); caller group names cannot perturb the inc_ sequence") {
    import graft.sources.IncrementStore
    val tmp = java.nio.file.Files.createTempDirectory("store_staleix").toString
    val store = IncrementStore(s"$tmp/verdicts", s"$tmp/meta",
      filesPerIncrement = 2, grouped = true)
    val gm = store.groupedManifest
    def day(ids: Range): org.apache.spark.sql.DataFrame =
      ids.map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
    def allRows(): Seq[String] = spark.read.parquet(s"$tmp/verdicts")
      .collect().map(_.toString).sorted.toSeq
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(conf)
    val ixPath = new org.apache.hadoop.fs.Path(s"$tmp/meta/_index.parquet")
    val saved = new org.apache.hadoop.fs.Path(s"$tmp/ix_saved")
    def saveIx(): Unit = {
      fs.delete(saved, true)
      org.apache.hadoop.fs.FileUtil.copy(fs, ixPath, fs, saved, false, conf)
      ()
    }
    def restoreIx(): Unit = {
      fs.delete(ixPath, true)
      org.apache.hadoop.fs.FileUtil.copy(fs, saved, fs, ixPath, false, conf)
      ()
    }

    store.writeIncrement(day(100 until 120))
    store.writeIncrement(day(200 until 220))

    // ---- window A: writeIncrement's writeGroup crash — the new
    // group's manifest landed, its index row did not ----
    saveIx()
    store.writeIncrement(day(300 until 330))
    val expectA = allRows()
    restoreIx()
    assert(gm.auditDrift(spark, s"$tmp/verdicts").isEmpty,
      "manifests agree with disk — the disk-derived fixups are blind here")
    assert(gm.indexDisagreement(spark) == Seq("inc_000002"))
    val eA = intercept[IllegalArgumentException](store.readAll(spark))
    assert(eA.getMessage.contains("stale"), eA.getMessage)
    store.recover(spark)
    assert(store.readAll(spark).collect().map(_.toString).sorted.toSeq
      == expectA, "recovered reads must be row-exact")
    gm.requireFresh(spark, s"$tmp/verdicts", strict = true)

    // ---- window B: a deleteRows reconciliation crash — the dirty
    // group's manifest rewritten, the index write never landed ----
    saveIx()
    val stats = store.deleteRows(spark, "doc_id",
      (205L until 210L).map(x => x: Any))
    assert(stats.rowsDeleted == 5)
    val expectB = allRows()
    restoreIx()
    assert(gm.auditDrift(spark, s"$tmp/verdicts").isEmpty)
    assert(gm.indexDisagreement(spark).nonEmpty)
    intercept[IllegalArgumentException](
      store.readRange(spark, Map("doc_id" -> (200L: Any, 299L: Any))))
    store.recover(spark)
    assert(store.readAll(spark).collect().map(_.toString).sorted.toSeq
      == expectB)
    gm.requireFresh(spark, s"$tmp/verdicts", strict = true)
    // recover() is idempotent here like everywhere: a second run is a
    // no-op on the already-consistent state
    store.recover(spark)
    assert(gm.indexDisagreement(spark).isEmpty)

    // ---- the anchored inc_ sequence (r19 ADVICE, low): a caller group
    // whose name merely CONTAINS inc_<digits> must not perturb it ----
    day(900 until 905).write.mode("append").parquet(s"$tmp/verdicts")
    val registered = gm.unionManifest(spark).select(col("_file")).collect()
      .map(r => Manifest.normalize(r.getString(0))).toSet
    val foreign = Manifest.listDataFiles(spark, s"$tmp/verdicts")
      .map(_._1).filterNot(f => registered(Manifest.normalize(f)))
    gm.writeGroup(spark, "sync_inc_999999", foreign)
    store.writeIncrement(day(400 until 410))
    assert(gm.groupNames(spark).contains("inc_000003"),
      s"sequence must ignore non-store names: ${gm.groupNames(spark)}")
    assert(!gm.groupNames(spark).contains("inc_1000000"))
    assert(store.readRange(spark, Map("doc_id" -> (400L: Any, 409L: Any)))
      .count() == 10)
  }

  test("store lifecycle fuzz: random write/delete/compactRange/compact sequences match an in-memory model (6 seeds)") {
    import graft.sources.IncrementStore
    // model-based check over the WHOLE mutation surface the round added:
    // whatever interleaving of ingest and maintenance runs, a pruned
    // read must equal the trivial in-memory model — compaction never
    // changes rows, deletion removes exactly the requested keys, the
    // manifest pair never goes stale
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val tmp = java.nio.file.Files
        .createTempDirectory(s"store_fuzz_$seed").toString
      // seeds 4-6 run the SAME model check on the grouped (two-level)
      // metadata layer — one mutation surface, two metadata backends
      val store = IncrementStore(s"$tmp/t", s"$tmp/m",
        filesPerIncrement = 2, grouped = seed > 3)
      val model = scala.collection.mutable.SortedSet.empty[Long]
      var nextId = 100L
      def check(tag: String): Unit = {
        val all = store.readRange(spark,
          Map("doc_id" -> (null: Any, null: Any)))
          .select("doc_id").as[Long].collect().sorted.toSeq
        assert(all == model.toSeq, s"seed $seed after $tag: store " +
          s"${all.size} rows vs model ${model.size}")
        if (model.nonEmpty) {
          val lo = model.toVector(rnd.nextInt(model.size))
          val hi = lo + rnd.nextInt(40)
          val band = store.readRange(spark,
            Map("doc_id" -> (lo: Any, hi: Any)))
            .select("doc_id").as[Long].collect().sorted.toSeq
          assert(band == model.range(lo, hi + 1).toSeq,
            s"seed $seed after $tag: band [$lo,$hi] mismatch")
        }
      }
      // first op is always a write (a fresh store has nothing to
      // delete or compact)
      (0 until 6).foreach { step =>
        val op = if (step == 0) 0 else rnd.nextInt(4)
        op match {
          case 0 =>
            val n = 10 + rnd.nextInt(15)
            val ids = (nextId until nextId + n)
            store.writeIncrement(ids.map(i => (i, s"t $i"))
              .toDF("doc_id", "text"))
            model ++= ids
            nextId += n + rnd.nextInt(30)
            check(s"write($n)")
          case 1 if model.nonEmpty =>
            val v = model.toVector
            val keys = Seq.fill(1 + rnd.nextInt(6))(
              v(rnd.nextInt(v.size))).distinct
            store.deleteRows(spark, "doc_id", keys.map(x => x: Any))
            model --= keys
            check(s"delete(${keys.size})")
          case 2 if model.nonEmpty =>
            val lo = model.head + rnd.nextInt(
              math.max(1, (model.last - model.head).toInt))
            store.compactRange(spark,
              Map("doc_id" -> (lo: Any, (lo + 40): Any)),
              targetFileBytes = 64L << 20)
            check(s"compactRange($lo)")
          case 3 if model.nonEmpty =>
            store.compact(spark, targetFileBytes = 64L << 20)
            check("compact")
          case _ => () // delete/compact on an empty store: skip
        }
      }
    }
  }

  test("crash-recovery fuzz: random mid-swap crash states at every window, recover() always converges to the model (4 seeds)") {
    import graft.sources.{IncrementStore, Layout, Manifest}
    // the r18 recovery contract under adversarial interleaving: after
    // ANY crash window — staged-no-list, compactRange mid-delete at a
    // random point, deleteRows mid-swap at a random point — recover()
    // must land exactly the model's rows (no duplicates, no losses) and
    // leave the pair fresh and writable
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(1000 + seed)
      val tmp = java.nio.file.Files
        .createTempDirectory(s"store_crashfuzz_$seed").toString
      val store = IncrementStore(s"$tmp/t", s"$tmp/m",
        filesPerIncrement = 2)
      val fsys = new org.apache.hadoop.fs.Path(s"$tmp/t")
        .getFileSystem(spark.sessionState.newHadoopConf())
      val table = new org.apache.hadoop.fs.Path(s"$tmp/t")
      val model = scala.collection.mutable.SortedSet.empty[Long]
      var nextId = 100L
      def check(tag: String): Unit = {
        val all = store.readRange(spark,
          Map("doc_id" -> (null: Any, null: Any)))
          .select("doc_id").as[Long].collect().sorted.toSeq
        assert(all == model.toSeq, s"seed $seed after $tag: store " +
          s"${all.size} rows vs model ${model.size}")
      }
      def write(): Unit = {
        val n = 10 + rnd.nextInt(15)
        val ids = (nextId until nextId + n)
        store.writeIncrement(ids.map(i => (i, s"t $i"))
          .toDF("doc_id", "text"))
        model ++= ids
        nextId += n + rnd.nextInt(30)
        check(s"write($n)")
      }
      write()
      (0 until 5).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 => write()
          case 1 =>
            // compactRange dies after deleting a random count of victims
            val m0 = store.manifest(spark)
            val lo = model.head + rnd.nextInt(
              math.max(1, (model.last - model.head).toInt))
            val victims = Manifest.prune(m0,
              Map("doc_id" -> (lo: Any, (lo + 60): Any)))
            if (victims.size >= 2) {
              val staging = new org.apache.hadoop.fs.Path(
                s"$tmp/t__compact_staging")
              spark.read.parquet(victims: _*)
                .repartitionByRange(1 + rnd.nextInt(2), col("doc_id"))
                .sortWithinPartitions(col("doc_id"))
                .write.parquet(staging.toString)
              val vp = victims.map(new org.apache.hadoop.fs.Path(_))
              store.writeOriginalsList(fsys, staging, vp.map(_.getName))
              vp.take(rnd.nextInt(vp.size + 1)).foreach { p =>
                fsys.delete(p, false); ()
              }
              store.recover(spark)
              check(s"crash_compactRange($lo, ${victims.size} victims)")
            }
          case 2 =>
            // deleteRows dies after swapping a random count of files
            val v = model.toVector
            val keys = Seq.fill(1 + rnd.nextInt(5))(
              v(rnd.nextInt(v.size))).distinct
            val staging = new org.apache.hadoop.fs.Path(
              s"$tmp/t__delete_staging")
            Layout.deleteRows(spark, s"$tmp/t", staging.toString,
              "doc_id", keys.map(x => x: Any), copyClean = false)
            val staged = store.stagedParquet(fsys, staging)
            store.writeOriginalsList(fsys, staging, staged.map(_.getName))
            staged.take(rnd.nextInt(staged.size + 1)).foreach { p =>
              val dst = new org.apache.hadoop.fs.Path(table, p.getName)
              fsys.delete(dst, false); fsys.rename(p, dst); ()
            }
            store.recover(spark)
            model --= keys // the staged rewrite was complete: recovery
            check(s"crash_delete(${keys.size})") // FINISHES the delete
          case 3 =>
            // crash BEFORE any delete: staging exists, list absent —
            // recovery drops it, nothing else changes
            val which = if (rnd.nextBoolean()) "__compact_staging"
                        else "__delete_staging"
            val staging = new org.apache.hadoop.fs.Path(s"$tmp/t$which")
            fsys.mkdirs(staging)
            if (rnd.nextBoolean()) {
              // ...possibly with a partial (useless) staged copy
              spark.read.parquet(s"$tmp/t").limit(3)
                .write.mode("overwrite").parquet(staging.toString)
            }
            store.recover(spark)
            assert(!fsys.exists(staging),
              s"seed $seed: list-less $which not dropped")
            check(s"crash_nolist($which)")
        }
      }
    }
  }

  test("IncrementStore.compactRange: range-scoped bin-packing — untouched files byte-identical, manifest rows verbatim, O(touched) maintenance") {
    import graft.sources.IncrementStore
    val tmp = java.nio.file.Files.createTempDirectory("store_compact_range").toString
    val store = IncrementStore(s"$tmp/verdicts", s"$tmp/manifest",
      filesPerIncrement = 2)
    def day(ids: Range): org.apache.spark.sql.DataFrame =
      ids.map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
    store.writeIncrement(day(100 until 120))
    store.writeIncrement(day(200 until 220))
    store.writeIncrement(day(300 until 330))
    val m0 = store.manifest(spark).collect()
    val fileIx = store.manifest(spark).schema.fieldIndex("_file")
    val day1Files = Manifest.prune(store.manifest(spark),
      Map("doc_id" -> (100L: Any, 199L: Any))).toSet
    assert(m0.length == 6 && day1Files.size == 2)

    // bin-pack the AGING range (days 2+3) only; day 1 must not move
    val m1 = store.compactRange(spark,
      Map("doc_id" -> (200L: Any, 399L: Any)), targetFileBytes = 64L << 20)
    assert(m1.count() == 3,
      s"4 touched files should pack to 1, day-1's 2 untouched: ${m1.count()}")
    // O(touched) metadata: day-1's manifest rows carried over VERBATIM
    // (same file, same length, same mtime, same stats)
    val m1Rows = m1.collect().map(_.toString).toSet
    val day1Rows = m0.filter(r => day1Files.contains(r.getString(fileIx)))
      .map(_.toString).toSet
    assert(day1Rows.subsetOf(m1Rows),
      "untouched files' manifest rows must be reused byte-identical")

    // reads stay green and exact across the swap, pruning tightens
    assert(store.readRange(spark,
      Map("doc_id" -> (200L: Any, 299L: Any))).count() == 20)
    assert(store.readRange(spark,
      Map("doc_id" -> (100L: Any, 199L: Any))).count() == 20)
    assert(spark.read.parquet(s"$tmp/verdicts").count() == 70)
    // a sub-file range (<=1 surviving file) is a no-op, not a rewrite
    val m2 = store.compactRange(spark,
      Map("doc_id" -> (100L: Any, 100L: Any)), targetFileBytes = 64L << 20)
    assert(m2.count() == 3)
    // and the store keeps accreting
    store.writeIncrement(day(400 until 410))
    assert(store.readRange(spark,
      Map("doc_id" -> (400L: Any, 499L: Any))).count() == 10)
  }
}
