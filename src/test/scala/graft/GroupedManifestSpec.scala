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

  test("aggregate freshness gate: unregistered increment refused, writeGroup converges it; gone files refused, dropGroup converges; strict catches what the aggregate accepts") {
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

    // the documented weakening, pinned so it can't silently change: an
    // in-place same-bytes rewrite of an OLD file whose new mtime stays
    // UNDER the table's newest (count, byte sum, and mtime_max all
    // preserved) passes the aggregate gate — and strict = true still
    // catches it, because the per-file (path, len, mtime) identity the
    // flat gate keeps is broken
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
    gm.requireFresh(spark, table) // aggregate identity preserved: passes
    val e3 = intercept[IllegalArgumentException] {
      gm.requireFresh(spark, table, strict = true)
    }
    assert(e3.getMessage.contains("rewritten in place"), e3.getMessage)
  }
}
