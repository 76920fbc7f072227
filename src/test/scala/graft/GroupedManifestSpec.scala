package graft

import org.apache.spark.sql.functions._
import graft.sources.{GroupedManifest, Layout, Manifest}

/** The two-level manifest (r18): correctness against the flat manifest
  * as oracle, the group-level prune locality pinned OBSERVABLY (a
  * non-surviving group's manifest is made unreadable — the prune must
  * not care), and the aggregate freshness gate's contract including its
  * documented weakening and the strict buy-back. */
class GroupedManifestSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  /** Accrete three disjoint-id "days" into one directory, returning the
    * per-day file lists via listing diffs (exactly what an ingest job
    * knows at commit time). */
  private def accrete(table: String): Seq[Seq[String]] = {
    def files(): Set[String] = {
      val p = new org.apache.hadoop.fs.Path(table)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toUri.toString).toSet
    }
    (0 until 3).map { day =>
      val before = files()
      val df = ((day * 100 + 1) to (day * 100 + 60))
        .map(i => (i.toLong, s"d$day v$i")).toDF("doc_id", "text")
      Layout.appendClustered(df, table, 2, "doc_id")
      (files() -- before).toSeq.sorted
    }
  }

  test("grouped prune == flat prune == full-scan filter, with only surviving groups' manifests opened") {
    val tmp = java.nio.file.Files.createTempDirectory("gm").toString
    val table = s"$tmp/t"
    val dayFiles = accrete(table)
    val gm = GroupedManifest(s"$tmp/m", Seq("doc_id"))
    dayFiles.zipWithIndex.foreach { case (fs, d) =>
      gm.writeGroup(spark, s"day$d", fs)
    }
    assert(gm.index(spark).count() == 3)

    // oracle: the flat manifest over the same directory
    val flat = Manifest.build(spark, table, Seq("doc_id"))
    val iv = Map("doc_id" -> (110L: Any, 150L: Any)) // inside day 1
    assert(gm.prune(spark, iv).toSet == Manifest.prune(flat, iv).toSet)

    // locality, observably: days 0 and 2 cannot satisfy the interval,
    // so their group manifests must never be opened — prove it by
    // making them unreadable
    val fsys = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sessionState.newHadoopConf())
    for (d <- Seq(0, 2)) {
      fsys.rename(new org.apache.hadoop.fs.Path(s"$tmp/m/groups/day$d.parquet"),
        new org.apache.hadoop.fs.Path(s"$tmp/m/groups/day$d.hidden"))
    }
    assert(gm.prune(spark, iv).toSet == Manifest.prune(flat, iv).toSet,
      "prune touched a group manifest its index rollup had excluded")
    for (d <- Seq(0, 2)) {
      fsys.rename(new org.apache.hadoop.fs.Path(s"$tmp/m/groups/day$d.hidden"),
        new org.apache.hadoop.fs.Path(s"$tmp/m/groups/day$d.parquet"))
    }

    // row-for-row against the full-scan filter, both gate modes
    val want = spark.read.parquet(table)
      .filter(col("doc_id") >= 110L && col("doc_id") <= 150L)
      .collect().map(_.toString).sorted
    for (strict <- Seq(false, true)) {
      if (strict) gm.requireFresh(spark, table, strict = true)
      val got = gm.readPruned(spark, table, iv)
        .collect().map(_.toString).sorted
      assert(got.toSeq == want.toSeq, s"strict=$strict")
    }
    // empty interval → empty frame with the table's schema
    val none = gm.readPruned(spark, table, Map("doc_id" -> (9000L, 9999L)))
    assert(none.count() == 0 && none.columns.toSeq ==
      spark.read.parquet(table).columns.toSeq)
  }

  test("freshness gates: unregistered increment refused, writeGroup converges it; gone files refused, dropGroup converges; the identity digest catches the backdated rewrite the aggregates cancel") {
    val tmp = java.nio.file.Files.createTempDirectory("gm_fresh").toString
    val table = s"$tmp/t"
    val dayFiles = accrete(table)
    val gm = GroupedManifest(s"$tmp/m", Seq("doc_id"))
    dayFiles.zipWithIndex.foreach { case (fs, d) =>
      gm.writeGroup(spark, s"day$d", fs)
    }
    gm.requireFresh(spark, table)

    // a new increment lands but is NOT registered: refuse, then converge
    val before = Manifest.listDataFiles(spark, table).map(_._1).toSet
    Layout.appendClustered(Seq((900L, "x")).toDF("doc_id", "text"),
      table, 1, "doc_id")
    val newFiles = Manifest.listDataFiles(spark, table).map(_._1)
      .filterNot(before)
    val e1 = intercept[IllegalArgumentException](gm.requireFresh(spark, table))
    assert(e1.getMessage.contains("stale") &&
      e1.getMessage.contains("writeGroup"), e1.getMessage)
    gm.writeGroup(spark, "day3", newFiles)
    gm.requireFresh(spark, table)
    assert(gm.prune(spark, Map("doc_id" -> (900L, 900L))).toSet ==
      newFiles.toSet)

    // a whole group's files deleted out-of-band: refuse, dropGroup converges
    val fsys = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sessionState.newHadoopConf())
    newFiles.foreach { f =>
      fsys.delete(new org.apache.hadoop.fs.Path(new java.net.URI(f)), false)
    }
    intercept[IllegalArgumentException](gm.requireFresh(spark, table))
    gm.dropGroup(spark, "day3")
    gm.requireFresh(spark, table)

    // duplicate group name refused (groups are immutable ingest units)
    val e2 = intercept[IllegalArgumentException](
      gm.writeGroup(spark, "day0", dayFiles(0)))
    assert(e2.getMessage.contains("rewriteGroup"), e2.getMessage)

    // the r18 aggregate weakening, CLOSED by the r19 identity digest: an
    // in-place same-bytes rewrite of an OLD file whose new mtime stays
    // UNDER the table's newest (count, byte sum, and mtime_max all
    // preserved) slipped past the aggregate compare — the digest layer
    // now refuses it on the DEFAULT gate, without opening one group
    // manifest, and auditDrift names exactly the group and file
    val victim = new org.apache.hadoop.fs.Path(
      new java.net.URI(dayFiles(0).head))
    val st = fsys.getFileStatus(victim)
    val recorded = st.getModificationTime
    // the pre-rewrite table max — computed BEFORE the rewrite stamps
    // the victim with a fresh (possibly table-max) mtime
    val maxMt = Manifest.listDataFiles(spark, table).map(_._3).max
    val bytes = new Array[Byte](st.getLen.toInt)
    val in = fsys.open(victim)
    try in.readFully(0L, bytes) finally in.close()
    val out = fsys.create(victim, true)
    try out.write(bytes) finally out.close()
    val backdated = if (maxMt - 10 == recorded) maxMt - 20 else maxMt - 10
    fsys.setTimes(victim, backdated, -1)
    assert(backdated != recorded && backdated <= maxMt)
    val e3 = intercept[IllegalArgumentException] {
      gm.requireFresh(spark, table) // aggregates cancel; the digest must not
    }
    assert(e3.getMessage.contains("digest") &&
      e3.getMessage.contains("auditDrift"), e3.getMessage)
    val drift = gm.auditDrift(spark, table)
    assert(drift == Seq(("day0",
      graft.sources.Manifest.normalize(dayFiles(0).head),
      "rewritten_in_place")), drift.toString)
    // ...and rewriteGroup over the same file list converges the gate
    gm.rewriteGroup(spark, "day0", dayFiles(0))
    gm.requireFresh(spark, table)
    assert(gm.auditDrift(spark, table).isEmpty)
    gm.requireFresh(spark, table, strict = true)
    // rewriteGroup refuses a group the index does not know
    val e4 = intercept[IllegalArgumentException](
      gm.rewriteGroup(spark, "nosuch", dayFiles(0)))
    assert(e4.getMessage.contains("writeGroup registers"), e4.getMessage)
  }

  test("index crash safety: committed staged index adopted, uncommitted dropped; lost index refused naming rebuildIndex, which reconstructs it; empty index refuses loudly") {
    val tmp = java.nio.file.Files.createTempDirectory("gm_crash").toString
    val table = s"$tmp/t"
    val dayFiles = accrete(table)
    val gm = GroupedManifest(s"$tmp/m", Seq("doc_id"))
    dayFiles.zipWithIndex.foreach { case (fs, d) =>
      gm.writeGroup(spark, s"day$d", fs)
    }
    val fsys = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val ixPath = new org.apache.hadoop.fs.Path(s"$tmp/m/_index.parquet")
    val stPath = new org.apache.hadoop.fs.Path(s"$tmp/m/_index_staged.parquet")
    val ixBefore = gm.index(spark).collect().map(_.toString).sorted.toSeq

    // crash window: staged index committed, final deleted, rename never
    // ran — a READER prefers the committed staged copy WITHOUT touching
    // disk (r19 ADVICE: reads must not mutate the metadata dir); the
    // next MUTATION adopts it
    fsys.rename(ixPath, stPath)
    assert(gm.indexExists(spark), "reader must see the committed staged index")
    assert(gm.index(spark).collect().map(_.toString).sorted.toSeq == ixBefore)
    assert(fsys.exists(stPath) && !fsys.exists(ixPath),
      "a pure read must not rename/delete anything (r19 ADVICE)")
    gm.requireFresh(spark, table) // reads through the staged copy too
    gm.rewriteGroup(spark, "day2", dayFiles(2)) // a mutation adopts it
    assert(!fsys.exists(stPath) && fsys.exists(ixPath),
      "mutation entry must adopt the committed staged index")
    assert(gm.index(spark).collect().map(_.toString).sorted.toSeq == ixBefore,
      "same files re-scanned -> identical rollups")

    // crash window: staged write died BEFORE its commit (_SUCCESS absent)
    // — the final index is still the truth; readers ignore the partial
    // stage (read-only), the next mutation drops it
    fsys.mkdirs(stPath)
    val junk = fsys.create(new org.apache.hadoop.fs.Path(stPath,
      "part-00000.parquet"), true)
    junk.write(Array[Byte](1, 2, 3)); junk.close()
    assert(gm.indexExists(spark))
    assert(fsys.exists(stPath), "a pure read leaves the dead stage in place")
    assert(gm.index(spark).collect().map(_.toString).sorted.toSeq == ixBefore)
    gm.requireFresh(spark, table)
    gm.rewriteGroup(spark, "day2", dayFiles(2))
    assert(!fsys.exists(stPath), "mutation entry must drop the dead stage")
    assert(gm.index(spark).collect().map(_.toString).sorted.toSeq == ixBefore)

    // lost index (out-of-band): consulting or extending the manifest
    // refuses NAMING rebuildIndex — writeGroup's create branch would
    // otherwise re-seed an index holding only the new group (r18 ADVICE)
    fsys.delete(ixPath, true)
    val e1 = intercept[RuntimeException](gm.index(spark))
    assert(e1.getMessage.contains("rebuildIndex"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      gm.writeGroup(spark, "day9", dayFiles(0)))
    assert(e2.getMessage.contains("rebuildIndex") &&
      e2.getMessage.contains("orphan"), e2.getMessage)
    val rebuilt = gm.rebuildIndex(spark)
    assert(rebuilt.collect().map(_.toString).sorted.toSeq == ixBefore,
      "rebuilt index must equal the lost one row-for-row")
    gm.requireFresh(spark, table)
    val flat = Manifest.build(spark, table, Seq("doc_id"))
    val iv = Map("doc_id" -> (110L: Any, 150L: Any))
    assert(gm.prune(spark, iv).toSet == Manifest.prune(flat, iv).toSet)

    // zero-row index (every group dropped): the gate refuses loudly
    // instead of NPE-ing on null aggregates (r18 ADVICE)
    (0 until 3).foreach(d => gm.dropGroup(spark, s"day$d"))
    val e3 = intercept[IllegalArgumentException](gm.requireFresh(spark, table))
    assert(e3.getMessage.contains("no groups"), e3.getMessage)
  }

  test("stale-index crash window (r19 ADVICE, high): manifests agree with disk, only the index is stale — auditDrift is EMPTY, indexDisagreement names the group, the refusal names rebuildIndex, rebuildIndex converges") {
    val tmp = java.nio.file.Files.createTempDirectory("gm_staleix").toString
    val table = s"$tmp/t"
    val dayFiles = accrete(table)
    val gm = GroupedManifest(s"$tmp/m", Seq("doc_id"))
    dayFiles.zipWithIndex.foreach { case (fs, d) =>
      gm.writeGroup(spark, s"day$d", fs)
    }
    val conf = spark.sessionState.newHadoopConf()
    val fsys = new org.apache.hadoop.fs.Path(tmp).getFileSystem(conf)
    val ixPath = new org.apache.hadoop.fs.Path(s"$tmp/m/_index.parquet")
    val saved = new org.apache.hadoop.fs.Path(s"$tmp/ix_saved")
    org.apache.hadoop.fs.FileUtil.copy(fsys, ixPath, fsys, saved, false, conf)

    // a data file's identity changes (in-place rewrite: mtime bumps) and
    // the group manifest is brought forward — then the crash sim: the
    // pre-mutation index is restored, exactly the state a crash between
    // a mutation's Manifest.write calls and its staged writeIndex leaves
    val victim = new org.apache.hadoop.fs.Path(
      new java.net.URI(dayFiles(0).head))
    fsys.setTimes(victim,
      fsys.getFileStatus(victim).getModificationTime + 7000, -1)
    gm.rewriteGroup(spark, "day0", dayFiles(0))
    gm.requireFresh(spark, table, strict = true)
    fsys.delete(ixPath, true)
    org.apache.hadoop.fs.FileUtil.copy(fsys, saved, fsys, ixPath, false, conf)

    // the disk-derived attribution CANNOT see this state: the group
    // manifests already agree with disk
    assert(gm.auditDrift(spark, table).isEmpty,
      "manifests agree with disk — auditDrift must be empty")
    assert(gm.indexDisagreement(spark) == Seq("day0"))
    // reads refuse loudly and the message routes to the real fix
    val e = intercept[IllegalArgumentException](gm.requireFresh(spark, table))
    assert(e.getMessage.contains("rebuildIndex"), e.getMessage)
    gm.rebuildIndex(spark)
    gm.requireFresh(spark, table, strict = true)
    assert(gm.indexDisagreement(spark).isEmpty)

    // the added-group flavor of the same window: a new group's manifest
    // landed, its index row did not (simulated: register out-of-band
    // files as a group, then restore the pre-mutation index)
    val before = Manifest.listDataFiles(spark, table).map(_._1).toSet
    Layout.appendClustered(Seq((950L, "y")).toDF("doc_id", "text"),
      table, 1, "doc_id")
    val newFiles = Manifest.listDataFiles(spark, table).map(_._1)
      .filterNot(before)
    fsys.delete(saved, true)
    org.apache.hadoop.fs.FileUtil.copy(fsys, ixPath, fsys, saved, false, conf)
    gm.writeGroup(spark, "day3", newFiles)
    fsys.delete(ixPath, true)
    org.apache.hadoop.fs.FileUtil.copy(fsys, saved, fsys, ixPath, false, conf)
    assert(gm.auditDrift(spark, table).isEmpty,
      "the new group's manifest claims the new files — auditDrift empty")
    assert(gm.indexDisagreement(spark) == Seq("day3"))
    intercept[IllegalArgumentException](gm.requireFresh(spark, table))
    gm.rebuildIndex(spark)
    gm.requireFresh(spark, table, strict = true)
    assert(gm.prune(spark, Map("doc_id" -> (950L, 950L))).toSet ==
      newFiles.toSet)
  }

  test("applyBatch: a drops/rewrites/adds transition equals the equivalent single-group ops with ONE index swap; refusals pinned") {
    val tmp = java.nio.file.Files.createTempDirectory("gm_batch").toString
    val table = s"$tmp/t"
    val dayFiles = accrete(table)
    // two roots, same accreted state: one transitions via applyBatch,
    // the oracle via the equivalent per-group op sequence
    val batch = GroupedManifest(s"$tmp/m_batch", Seq("doc_id"))
    val oracle = GroupedManifest(s"$tmp/m_oracle", Seq("doc_id"))
    for (g <- Seq(batch, oracle); (fs, d) <- dayFiles.zipWithIndex)
      g.writeGroup(spark, s"day$d", fs)

    // transition: drop day0, rewrite day1 to HALF its files, add day3
    // over day0's files (a compaction-like reshuffle of ownership)
    val day1Half = dayFiles(1).take(1)
    batch.applyBatch(spark, drops = Seq("day0"),
      rewrites = Map("day1" -> day1Half),
      adds = Map("day3" -> dayFiles(0)))
    oracle.dropGroup(spark, "day0")
    oracle.rewriteGroup(spark, "day1", day1Half)
    oracle.writeGroup(spark, "day3", dayFiles(0))
    assert(batch.index(spark).collect().map(_.toString).sorted.toSeq ==
      oracle.index(spark).collect().map(_.toString).sorted.toSeq,
      "batched transition must equal the per-group op sequence")
    for (g <- Seq("day1", "day2", "day3"))
      assert(batch.groupManifest(spark, g).collect()
        .map(_.toString).sorted.toSeq ==
        oracle.groupManifest(spark, g).collect()
          .map(_.toString).sorted.toSeq, s"group $g manifest diverged")
    // the dropped group's manifest is gone from disk on both
    val fsys = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fsys.exists(new org.apache.hadoop.fs.Path(
      s"$tmp/m_batch/groups/day0.parquet")))

    // refusals: overlapping sets, unknown rewrite, duplicate add
    val eOverlap = intercept[IllegalArgumentException](
      batch.applyBatch(spark, Seq("day2"), Map("day2" -> dayFiles(2)), Map()))
    assert(eOverlap.getMessage.contains("only one of"), eOverlap.getMessage)
    val eUnknown = intercept[IllegalArgumentException](
      batch.applyBatch(spark, Seq(), Map("nosuch" -> dayFiles(2)), Map()))
    assert(eUnknown.getMessage.contains("unknown group"), eUnknown.getMessage)
    val eDup = intercept[IllegalArgumentException](
      batch.applyBatch(spark, Seq(), Map(), Map("day2" -> dayFiles(2))))
    assert(eDup.getMessage.contains("existing group"), eDup.getMessage)
  }

  test("buildGrouped: one-scan bulk adoption equals incremental accretion row-for-row, prunes with flat parity, refuses an occupied root") {
    val tmp = java.nio.file.Files.createTempDirectory("gm_bulk").toString
    val table = s"$tmp/t"
    val dayFiles = accrete(table)
    val fileToDay = dayFiles.zipWithIndex.flatMap { case (fs, d) =>
      fs.map(f => graft.sources.Manifest.normalize(f) -> s"day$d")
    }.toMap

    // the incremental form as oracle
    val inc = GroupedManifest(s"$tmp/m_inc", Seq("doc_id"))
    dayFiles.zipWithIndex.foreach { case (fs, d) =>
      inc.writeGroup(spark, s"day$d", fs)
    }
    // the bulk form: ONE stats scan, same group assignment
    val bulk = GroupedManifest(s"$tmp/m_bulk", Seq("doc_id"))
    bulk.buildGrouped(spark, table, f => fileToDay(f))

    assert(bulk.index(spark).collect().map(_.toString).sorted.toSeq ==
      inc.index(spark).collect().map(_.toString).sorted.toSeq,
      "bulk index must equal the accreted index row-for-row (incl. digests)")
    for (d <- 0 until 3) {
      assert(bulk.groupManifest(spark, s"day$d").collect()
        .map(_.toString).sorted.toSeq ==
        inc.groupManifest(spark, s"day$d").collect()
          .map(_.toString).sorted.toSeq, s"group day$d manifest diverged")
    }
    bulk.requireFresh(spark, table)
    bulk.requireFresh(spark, table, strict = true)
    val flat = Manifest.build(spark, table, Seq("doc_id"))
    val iv = Map("doc_id" -> (110L: Any, 150L: Any))
    assert(bulk.prune(spark, iv).toSet == Manifest.prune(flat, iv).toSet)
    val want = spark.read.parquet(table)
      .filter(col("doc_id") >= 110L && col("doc_id") <= 150L)
      .collect().map(_.toString).sorted.toSeq
    assert(bulk.readPruned(spark, table, iv)
      .collect().map(_.toString).sorted.toSeq == want)

    // occupied roots refused: an existing index, or orphan group
    // manifests without one
    val eIx = intercept[IllegalArgumentException](
      bulk.buildGrouped(spark, table, f => fileToDay(f)))
    assert(eIx.getMessage.contains("already exists"), eIx.getMessage)
    val fsys = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fsys.delete(new org.apache.hadoop.fs.Path(s"$tmp/m_bulk/_index.parquet"),
      true)
    val eOrphan = intercept[IllegalArgumentException](
      bulk.buildGrouped(spark, table, f => fileToDay(f)))
    assert(eOrphan.getMessage.contains("rebuildIndex"), eOrphan.getMessage)
  }
}
