package graft

import org.apache.spark.sql.functions._
import graft.sources.{Layout, Manifest}

/** Manifest pruning is measured the way LayoutSpec measures footers: the
  * same band query over the same rows must survive to a handful of files
  * on a clustered layout and to ~all files on a random one — but here the
  * skipping happens at PLANNING time, off the manifest, before any data
  * file is opened. Correctness bar: the pruned read equals the full-scan
  * filter row-for-row, and a stale manifest is refused, never silently
  * wrong. */
class ManifestSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  private val N = 16

  test("manifest prune: few files on a clustered layout, all on random; pruned read == full filter") {
    val tmp = java.nio.file.Files.createTempDirectory("manifest").toString
    val ev = Tables.events(spark, sf)
      .withColumn("ts_us", unix_micros(col("ts")))

    Layout.writeClustered(ev, s"$tmp/clustered", N, "ts_us")
    ev.repartition(N, col("event_id")).write.parquet(s"$tmp/random")

    val mC = Manifest.build(spark, s"$tmp/clustered", Seq("ts_us", "value"))
    val mR = Manifest.build(spark, s"$tmp/random", Seq("ts_us", "value"))
    assert(mC.count() == N && mR.count() == N)

    // manifest round-trips through its persisted form
    Manifest.write(mC, s"$tmp/clustered_manifest")
    val mC2 = Manifest.read(spark, s"$tmp/clustered_manifest")

    val Array(lo, hi) = ev.stat.approxQuantile("ts_us", Array(0.45, 0.55), 0.001)
    val band = Map("ts_us" -> (lo.toLong: Any, hi.toLong: Any))

    val survC = Manifest.prune(mC2, band)
    val survR = Manifest.prune(mR, band)
    assert(survC.length <= 3,
      s"clustered: 10% band should survive to <=3 of $N files, got ${survC.length}")
    assert(survR.length >= N - 2,
      s"random: ~all files should survive, got ${survR.length} of $N")

    val expected = ev.filter(col("ts_us") >= lo.toLong && col("ts_us") <= hi.toLong)
      .select("event_id").as[Long].collect().sorted.toSeq
    val gotC = Manifest.readPruned(spark, s"$tmp/clustered", mC2, band)
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(gotC == expected, "pruned read drifted from the full-scan filter")
  }

  test("one-sided intervals, multi-column conjunctions, and the empty-survivor path") {
    val tmp = java.nio.file.Files.createTempDirectory("manifest2").toString
    val df = (0 until 1000)
      .map(i => (i.toLong, i.toDouble, if (i % 7 == 0) None else Some(i % 50)))
      .toDF("id", "v", "maybe")
    Layout.writeClustered(df, s"$tmp/t", 8, "id")
    val m = Manifest.build(spark, s"$tmp/t", Seq("id", "v"))

    // one-sided: id >= 900 -> the tail file(s) only on an 8-file
    // range-cluster (sampled range boundaries may put the 900 cut inside
    // either of the last two files)
    val oneSided = Manifest.prune(m, Map("id" -> (900L, null)))
    assert(oneSided.nonEmpty && oneSided.length <= 2, s"got ${oneSided.length}")
    val got = Manifest.readPruned(spark, s"$tmp/t", m, Map("id" -> (900L, null)))
    assert(got.count() == 100)

    // conjunction: id in last file AND v in first file's range -> nothing
    val none = Manifest.prune(m, Map("id" -> (900L, null), "v" -> (null, 10.0)))
    assert(none.isEmpty)
    assert(Manifest.readPruned(spark, s"$tmp/t", m,
      Map("id" -> (900L, null), "v" -> (null, 10.0))).count() == 0)
  }

  test("writeWithManifest: the ingest pair passes the staleness gate and prunes immediately") {
    val tmp = java.nio.file.Files.createTempDirectory("manifest_ingest").toString
    val df = (0 until 800).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val m = Manifest.writeWithManifest(df, s"$tmp/t", s"$tmp/m",
      cols = Seq("id"), nFiles = 8, clusterBy = Seq("id"))
    // no rebuild needed: the gate passes and the band prunes
    val got = Manifest.readPruned(spark, s"$tmp/t", m, Map("id" -> (700L, null)))
    assert(got.count() == 100)
    assert(Manifest.prune(m, Map("id" -> (700L, null))).length <= 2)
    intercept[IllegalArgumentException] {
      Manifest.writeWithManifest(df, s"$tmp/t2", s"$tmp/m2",
        Seq("id"), 8, clusterBy = Seq.empty)
    }
  }

  test("incremental update: new files' stats computed, old rows reused, gone rows dropped") {
    val tmp = java.nio.file.Files.createTempDirectory("manifest_upd").toString
    val df = (0 until 400).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    Layout.writeClustered(df, s"$tmp/t", 4, "id")
    val m0 = Manifest.build(spark, s"$tmp/t", Seq("id"))
    // append new data WITHOUT a rebuild, then update incrementally
    (400 until 500).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(s"$tmp/t")
    val m1 = Manifest.update(spark, s"$tmp/t", m0)
    assert(m1.count() == 5)
    // old stats rows are REUSED byte-for-byte, not recomputed
    val oldRows = m0.collect().map(_.mkString("|")).toSet
    val newRows = m1.collect().map(_.mkString("|")).toSet
    assert(oldRows.subsetOf(newRows), "update must reuse existing stats rows")
    // the refreshed manifest passes the gate and prunes across both eras
    assert(Manifest.readPruned(spark, s"$tmp/t", m1,
      Map("id" -> (450L, null))).count() == 50)
    assert(Manifest.prune(m1, Map("id" -> (450L, null))).length == 1)
    // deletion: drop one data file, update again -> its row disappears
    val victim = new org.apache.hadoop.fs.Path(
      Manifest.prune(m1, Map("id" -> (450L, null))).head)
    victim.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(victim, false)
    val m2 = Manifest.update(spark, s"$tmp/t", m1)
    assert(m2.count() == 4)
    assert(Manifest.readPruned(spark, s"$tmp/t", m2,
      Map("id" -> (0L, null))).count() == 400)
  }

  test("zero-row parquet files get explicit n_rows=0 rows; cols are validated before the write") {
    val tmp = java.nio.file.Files.createTempDirectory("manifest_empty").toString
    val df = (0 until 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    Layout.writeClustered(df, s"$tmp/t", 2, "id")
    // an empty append lands a metadata-only part file
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)
      .coalesce(1).write.mode("append").parquet(s"$tmp/t")
    val m = Manifest.build(spark, s"$tmp/t", Seq("id"))
    assert(m.count() == 3, "the empty file must carry an explicit row")
    assert(m.filter(col("n_rows") === 0).count() == 1)
    // the gate passes (no permanent staleness), pruning excludes it
    assert(Manifest.readPruned(spark, s"$tmp/t", m,
      Map("id" -> (0L, null))).count() == 100)
    // update converges too: nothing new, same 3 rows
    assert(Manifest.update(spark, s"$tmp/t", m).count() == 3)
    // stats columns validated BEFORE the destructive overwrite
    val before = spark.read.parquet(s"$tmp/t").count()
    intercept[IllegalArgumentException] {
      Manifest.writeWithManifest(df, s"$tmp/t", s"$tmp/m",
        Seq("not_a_column"), 2, Seq("id"))
    }
    assert(spark.read.parquet(s"$tmp/t").count() == before,
      "the table must be untouched after a refused writeWithManifest")
  }

  test("a stale manifest is refused loudly, not silently wrong") {
    val tmp = java.nio.file.Files.createTempDirectory("manifest3").toString
    val df = (0 until 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    Layout.writeClustered(df, s"$tmp/t", 4, "id")
    val m = Manifest.build(spark, s"$tmp/t", Seq("id"))
    // new data lands WITHOUT a manifest rebuild
    (100 until 200).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(s"$tmp/t")
    val err = intercept[IllegalArgumentException] {
      Manifest.readPruned(spark, s"$tmp/t", m, Map("id" -> (0L, 1000L)))
    }
    assert(err.getMessage.contains("stale"))
    // rebuild clears it and sees everything
    val m2 = Manifest.build(spark, s"$tmp/t", Seq("id"))
    assert(Manifest.readPruned(spark, s"$tmp/t", m2,
      Map("id" -> (0L, 1000L))).count() == 200)
  }

  test("a file rewritten in place (same name, new bytes) is caught by the gate and re-scanned by update") {
    val tmp = java.nio.file.Files.createTempDirectory("manifest_rw").toString
    val df = (0 until 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    Layout.writeClustered(df, s"$tmp/t", 2, "id")
    val m = Manifest.build(spark, s"$tmp/t", Seq("id"))
    // rewrite ONE data file IN PLACE under its exact name with rows far
    // outside its old min/max — path-only identity would keep the stale
    // stats, the gate would pass, and a pruned read for the new rows
    // would silently return nothing
    val victim = new org.apache.hadoop.fs.Path(
      Manifest.prune(m, Map("id" -> (0L, 0L))).head)
    val rewriteDir = s"$tmp/rw"
    // 73 rows (vs the victim's ~50): the byte length is GUARANTEED to
    // differ — two same-shaped 50-row files could plausibly encode to
    // identical sizes, which would dodge the very check under test
    (5000 until 5073).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
      .coalesce(1).write.parquet(rewriteDir)
    val fs = victim.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(rewriteDir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet")).head
    fs.delete(victim, false)
    org.apache.hadoop.fs.FileUtil.copy(fs, part.getPath, fs, victim,
      false, spark.sparkContext.hadoopConfiguration)
    // the staleness gate names the failure
    val err = intercept[IllegalArgumentException] {
      Manifest.readPruned(spark, s"$tmp/t", m, Map("id" -> (5000L, null)))
    }
    assert(err.getMessage.contains("rewritten in place"), err.getMessage)
    // a pre-length-column manifest (older build) gets a NAMED migration
    // error, not an unexplained UNRESOLVED_COLUMN from inside the gate
    val legacy = m.drop("_file_len")
    val mig = intercept[IllegalArgumentException] {
      Manifest.readPruned(spark, s"$tmp/t", legacy, Map("id" -> (0L, null)))
    }
    assert(mig.getMessage.contains("predates rewrite detection"), mig.getMessage)
    // incremental update re-scans exactly the rewritten file; the pruned
    // read then finds the new rows
    val m2 = Manifest.update(spark, s"$tmp/t", m)
    assert(m2.count() == 2)
    assert(Manifest.readPruned(spark, s"$tmp/t", m2,
      Map("id" -> (5000L, null))).count() == 73)
  }

  test("a SAME-BYTE-LENGTH in-place rewrite is caught by the mtime half of the identity") {
    val tmp = java.nio.file.Files.createTempDirectory("manifest_rw_len").toString
    val df = (0 until 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    Layout.writeClustered(df, s"$tmp/t", 2, "id")
    val m = Manifest.build(spark, s"$tmp/t", Seq("id"))
    // rewrite one file with its OWN bytes — byte length provably
    // identical, so the r11 (path, length) identity would pass the gate
    // and keep the (here coincidentally fresh, in general stale) stats.
    // The mtime is then bumped explicitly rather than slept for: the
    // test pins the comparison, not the filesystem's clock resolution.
    val victim = new org.apache.hadoop.fs.Path(
      Manifest.prune(m, Map("id" -> (0L, 0L))).head)
    val fs = victim.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(victim).getLen
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(victim)
    try in.readFully(0, bytes) finally in.close()
    fs.delete(victim, false)
    val out = fs.create(victim)
    try out.write(bytes) finally out.close()
    assert(fs.getFileStatus(victim).getLen == len, "rewrite must be same-length")
    fs.setTimes(victim, fs.getFileStatus(victim).getModificationTime + 10000L, -1)
    val err = intercept[IllegalArgumentException] {
      Manifest.readPruned(spark, s"$tmp/t", m, Map("id" -> (0L, null)))
    }
    assert(err.getMessage.contains("rewritten in place"), err.getMessage)
    // update re-scans exactly that file (fresh identity) and the gate passes
    val m2 = Manifest.update(spark, s"$tmp/t", m)
    assert(m2.count() == 2)
    assert(Manifest.readPruned(spark, s"$tmp/t", m2,
      Map("id" -> (0L, null))).count() == 100)
    // a manifest missing only the mtime column gets the named migration error
    val legacyM = m.drop("_file_mtime")
    val mig = intercept[IllegalArgumentException] {
      Manifest.readPruned(spark, s"$tmp/t", legacyM, Map("id" -> (0L, null)))
    }
    assert(mig.getMessage.contains("predates rewrite detection"), mig.getMessage)
  }

  test("entirely-null stats columns never match a range predicate; maxFiles guard fires") {
    val tmp = java.nio.file.Files.createTempDirectory("manifest4").toString
    // file 1: all-null v; file 2: real values — write separately for
    // deterministic file contents
    Seq((1L, Option.empty[Double]), (2L, Option.empty[Double]))
      .toDF("id", "v").coalesce(1).write.parquet(s"$tmp/t")
    Seq((3L, Some(1.5)), (4L, Some(2.5)))
      .toDF("id", "v").coalesce(1).write.mode("append").parquet(s"$tmp/t")
    val m = Manifest.build(spark, s"$tmp/t", Seq("v"))
    val surv = Manifest.prune(m, Map("v" -> (0.0, 10.0)))
    assert(surv.length == 1, s"all-null file must be pruned, got ${surv.length}")
    assert(Manifest.readPruned(spark, s"$tmp/t", m, Map("v" -> (0.0, 10.0)))
      .count() == 2)
    intercept[IllegalArgumentException] {
      Manifest.prune(m, Map("v" -> (null, null)), maxFiles = 0)
    }
    // the guard's message invites raising maxFiles — Int.MaxValue must
    // not overflow the survivor limit
    assert(Manifest.prune(m, Map("v" -> (null, null)),
      maxFiles = Int.MaxValue).length == 1)
  }
}
