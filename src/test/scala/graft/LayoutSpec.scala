package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Layout control is measured, not asserted-by-plan: the same query over
  * the same rows, laid out two ways, must touch very different file
  * counts (`input_file_name()` distinct over the result — the files a
  * reader actually materializes rows from). */
class LayoutSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  private val N = 16 // files per layout

  test("range-clustered layout answers a time-band query from a few files; random layout from all") {
    val tmp = java.nio.file.Files.createTempDirectory("layout_ts").toString
    val ev = Tables.events(spark, sf)

    Layout.writeClustered(ev, s"$tmp/clustered", N, "ts")
    // decorrelated baseline: hash-scatter on event_id — every file a
    // random sample, every footer spanning the whole ts domain
    ev.repartition(N, col("event_id"))
      .write.parquet(s"$tmp/random")

    // middle ~10% time band, bounds from the data itself
    val Array(lo, hi) = ev.withColumn("ts_us", unix_micros(col("ts")))
      .stat.approxQuantile("ts_us", Array(0.45, 0.55), 0.001)
    def band(path: String): Long = Layout.filesTouched(
      spark.read.parquet(path)
        .filter(unix_micros(col("ts")) >= lo && unix_micros(col("ts")) <= hi))

    // precondition: identical rows both sides
    val rowsC = spark.read.parquet(s"$tmp/clustered").count()
    assert(rowsC == ev.count())

    val touchedClustered = band(s"$tmp/clustered")
    val touchedRandom = band(s"$tmp/random")
    assert(touchedClustered <= 3,
      s"ts-clustered: 10% band touched $touchedClustered of $N files")
    assert(touchedRandom >= N - 2,
      s"random layout should touch ~all files, got $touchedRandom of $N")
  }

  test("z-order serves selective filters on EITHER dimension; linear sort only on the leading one") {
    val tmp = java.nio.file.Files.createTempDirectory("layout_z").toString
    val ev = Tables.events(spark, sf)

    Layout.writeZOrdered(ev, s"$tmp/z", N, "user_id", "value")
    Layout.writeClustered(ev, s"$tmp/linear", N, "user_id", "value")

    // a ~10% band placed INSIDE one quartile of each dimension: with 16
    // files ~= a 4x4 grid of equal-mass blocks, a band that straddles a
    // quartile boundary legitimately touches two block-rows (8 files) —
    // [q28, q38] sits inside the second quartile, so the honest
    // expectation is one block-row (4) plus range-sampling slop
    val Array(uLo, uHi) = ev.stat.approxQuantile(
      "user_id", Array(0.28, 0.38), 0.001)
    val Array(vLo, vHi) = ev.stat.approxQuantile(
      "value", Array(0.28, 0.38), 0.001)
    def touched(path: String, c: String, lo: Double, hi: Double): Long =
      Layout.filesTouched(spark.read.parquet(path)
        .filter(col(c).cast("double") >= lo && col(c).cast("double") <= hi))

    // leading dimension: both layouts prune well (a one-quartile band is
    // ~4 of 16 files; range-boundary sampling adds a file or two of slop)
    assert(touched(s"$tmp/linear", "user_id", uLo, uHi) <= 6)
    assert(touched(s"$tmp/z", "user_id", uLo, uHi) <= N / 2)
    // secondary dimension: the z-layout keeps pruning, the linear sort
    // cannot (every user-run spans the full value range)
    val zSecondary = touched(s"$tmp/z", "value", vLo, vHi)
    val linearSecondary = touched(s"$tmp/linear", "value", vLo, vHi)
    assert(zSecondary <= N / 2,
      s"z-order: 10% value band touched $zSecondary of $N files")
    assert(linearSecondary >= N - 4,
      s"linear (user,value) sort should touch ~all files on a value-only " +
        s"band, got $linearSecondary of $N")
    assert(zSecondary < linearSecondary,
      s"z-order ($zSecondary) must beat linear ($linearSecondary) off the leading key")
  }

  test("3-dim z-order prunes on every dimension; arity guardrails hold") {
    val tmp = java.nio.file.Files.createTempDirectory("layout_z3").toString
    val ev = Tables.events(spark, sf)
      .withColumn("ts_us", unix_micros(col("ts")))
    Layout.writeZOrderedN(ev, s"$tmp/z3", N,
      Seq("user_id", "value", "ts_us"))
    def touched(c: String, lo: Double, hi: Double): Long =
      Layout.filesTouched(spark.read.parquet(s"$tmp/z3")
        .filter(col(c).cast("double") >= lo && col(c).cast("double") <= hi))
    // a one-octant band (inside [q28, q38]) in EACH dimension must prune:
    // 16 files over a 3-d equal-mass grid leaves every dimension with
    // coarse blocks, so the honest bar is "well under all files", not
    // the 2-d four-file bar
    for (c <- Seq("user_id", "value", "ts_us")) {
      val Array(lo, hi) = ev.stat.approxQuantile(c, Array(0.28, 0.38), 0.001)
      val t = touched(c, lo, hi)
      assert(t <= (3 * N) / 4,
        s"3-d z-order: 10% band on $c touched $t of $N files")
    }
    intercept[IllegalArgumentException] {
      Layout.zOrderKeyN(ev, Seq("value")) // 1-d is a plain sort
    }
    intercept[IllegalArgumentException] {
      Layout.zOrderKeyN(ev, Seq("a", "b", "c", "d", "e", "f")) // > 5 dims
    }
  }

  test("compaction bin-packs small files to the target and preserves rows and cluster order") {
    val tmp = java.nio.file.Files.createTempDirectory("layout_compact").toString
    val ev = Tables.events(spark, sf)
    Layout.writeClustered(ev, s"$tmp/small", N, "ts")

    Layout.compact(spark, s"$tmp/small", s"$tmp/packed",
      targetFileBytes = 1L << 20, "ts")

    def parquetFiles(p: String): Array[java.io.File] =
      new java.io.File(p).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$tmp/small").length == N)
    // ~50 KB of data at a 1 MiB target -> exactly one file
    assert(parquetFiles(s"$tmp/packed").length == 1,
      s"expected 1 packed file, got ${parquetFiles(s"$tmp/packed").length}")

    val before = spark.read.parquet(s"$tmp/small")
    val after = spark.read.parquet(s"$tmp/packed")
    assert(after.count() == before.count())
    assert(after.exceptAll(before).count() == 0 &&
      before.exceptAll(after).count() == 0, "compaction changed row content")
    // cluster order survived: the single packed file is ts-sorted
    val ts = after.select(unix_micros(col("ts"))).as[Long].collect()
    assert(ts.sameElements(ts.sorted), "packed file lost the ts sort")
  }

  test("targeted delete rewrites only the dirty files on a clustered layout; random layout dirties all") {
    val tmp = java.nio.file.Files.createTempDirectory("layout_del").toString
    val ev = Tables.events(spark, sf)
    Layout.writeClustered(ev, s"$tmp/clustered", N, "user_id")
    ev.repartition(N, col("event_id")).write.parquet(s"$tmp/random")

    // three adjacent user ids — on the user-clustered layout their rows
    // live in a couple of neighboring files; on the random layout, in
    // essentially every file
    val victims = ev.select("user_id").distinct()
      .orderBy("user_id").limit(3).as[Long].collect().toSeq
    val nVictimRows = ev.filter(col("user_id").isin(victims: _*)).count()
    assert(nVictimRows > 0)

    val sc = Layout.deleteRows(spark, s"$tmp/clustered", s"$tmp/clustered_del",
      "user_id", victims)
    val sr = Layout.deleteRows(spark, s"$tmp/random", s"$tmp/random_del",
      "user_id", victims)
    assert(sc.rowsDeleted == nVictimRows && sr.rowsDeleted == nVictimRows)
    assert(sc.filesRewritten <= 3,
      s"clustered delete rewrote ${sc.filesRewritten} of ${sc.filesTotal}")
    assert(sr.filesRewritten >= N - 2,
      s"random delete should dirty ~all files, got ${sr.filesRewritten}")

    // corrected table: victims gone, everything else intact
    val after = spark.read.parquet(s"$tmp/clustered_del")
    assert(after.count() == ev.count() - nVictimRows)
    assert(after.filter(col("user_id").isin(victims: _*)).count() == 0)
    val want = ev.filter(!col("user_id").isin(victims: _*))
    assert(after.exceptAll(want).count() == 0 &&
      want.exceptAll(after).count() == 0)

    // clean files came through byte-for-byte (FS copy, not re-encode)
    def names(dir: String): Set[String] =
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val fileNames = names(s"$tmp/clustered")
    assert(names(s"$tmp/clustered_del") == fileNames,
      "file granularity preserved")
    val identical = fileNames.count { n =>
      java.nio.file.Files.mismatch(
        java.nio.file.Paths.get(s"$tmp/clustered", n),
        java.nio.file.Paths.get(s"$tmp/clustered_del", n)) == -1L
    }
    // range partitioning may leave some of the N requested partitions
    // empty, so the honest denominator is the actual file count
    assert(identical == sc.filesTotal - sc.filesRewritten,
      s"clean files must be byte-identical copies ($identical of " +
        s"${sc.filesTotal} identical, ${sc.filesRewritten} rewritten)")

    intercept[IllegalArgumentException] {
      Layout.deleteRows(spark, s"$tmp/clustered", s"$tmp/x", "user_id", Seq.empty)
    }
  }

  test("delete preserves NULL-key rows and supports the dirty-files-only mode") {
    val tmp = java.nio.file.Files.createTempDirectory("layout_del_null").toString
    val ev = Tables.events(spark, sf)
      .withColumn("user_id",
        when(col("event_id") % 7 === 0, lit(null)).otherwise(col("user_id")))
    val nNull = ev.filter(col("user_id").isNull).count()
    assert(nNull > 0)
    Layout.writeClustered(ev, s"$tmp/src", 8, "user_id")
    val victims = ev.filter(col("user_id").isNotNull)
      .select("user_id").distinct().orderBy("user_id").limit(2)
      .as[Long].collect().toSeq
    val st = Layout.deleteRows(spark, s"$tmp/src", s"$tmp/dst", "user_id", victims)
    val after = spark.read.parquet(s"$tmp/dst")
    // NULL keys are not victims: every NULL-key row must survive, even
    // the ones sharing a file with a victim (the silent-drop regression)
    assert(after.filter(col("user_id").isNull).count() == nNull,
      "NULL-key rows were silently deleted")
    assert(after.count() == ev.count() - st.rowsDeleted)

    // dirty-files-only mode: dst carries exactly the rewritten files
    val st2 = Layout.deleteRows(spark, s"$tmp/src", s"$tmp/dst2", "user_id",
      victims, copyClean = false)
    val dirtyOnly = new java.io.File(s"$tmp/dst2").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(dirtyOnly == st2.filesRewritten,
      s"copyClean=false must emit only rewritten files ($dirtyOnly vs $st2)")
  }

  test("layout guardrails refuse degenerate requests") {
    val ev = Tables.events(spark, sf)
    intercept[IllegalArgumentException] {
      Layout.writeClustered(ev, "/tmp/ignored", 0, "ts")
    }
    intercept[IllegalArgumentException] {
      Layout.writeClustered(ev, "/tmp/ignored", 4) // no cluster column
    }
    intercept[IllegalArgumentException] {
      Layout.compact(spark, "/tmp/ignored", "/tmp/ignored2", 1024) // < 1 MiB
    }
    intercept[IllegalArgumentException] {
      // reserved z-key column name
      Layout.writeZOrdered(ev.withColumn("__z_key", lit(1L)),
        "/tmp/ignored", 4, "user_id", "value")
    }
  }
}
