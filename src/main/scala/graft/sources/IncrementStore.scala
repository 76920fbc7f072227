package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** An accreting clustered + manifested parquet table with ONE write
  * entry point — the storage owner of the daily curation loop's verdict
  * history (README "The daily loop"), and of any append-style ingest
  * whose increments arrive with disjoint or mostly-disjoint key ranges
  * (per-day id blocks, time-ordered event ingest).
  *
  * The contract it composes (each piece individually spec-pinned, the
  * chain pinned by CurationStorageSpec):
  *
  *  - the FIRST `writeDay` lands data + manifest as the consistent
  *    single-writer pair ([[Manifest.writeWithManifest]] — no staleness
  *    window between table and manifest);
  *  - every later `writeDay` appends the increment range-clustered
  *    within itself ([[Layout.appendClustered]] — existing files stay
  *    byte-identical) and brings the manifest forward by scanning ONLY
  *    the new files ([[Manifest.update]] — O(increment) maintenance,
  *    what keeps the pair viable at 100 TB);
  *  - reads go through [[readRange]] → [[Manifest.readPruned]]: interval
  *    pruning against the KB-sized manifest before any data file is
  *    opened, with the loud staleness refusal intact (an out-of-band
  *    writer can never cause a silent under-read — the read fails
  *    loudly until the manifest is rebuilt or updated).
  *
  * NOT a transaction log: with a single writer per table (the daily-loop
  * topology) the pair is consistent by construction; concurrent writers
  * need a table format's commit protocol instead, per
  * [[Manifest.writeWithManifest]]'s scaladoc. */
final case class IncrementStore(tablePath: String, manifestPath: String,
                                filesPerIncrement: Int = 8,
                                clusterBy: Seq[String] = Seq("doc_id"),
                                statsCols: Seq[String] = Seq("doc_id")) {
  require(filesPerIncrement > 0,
    s"increment store: filesPerIncrement must be positive, got $filesPerIncrement")
  require(clusterBy.nonEmpty, "increment store: clusterBy must be non-empty")
  require(statsCols.nonEmpty, "increment store: statsCols must be non-empty")

  private def exists(spark: SparkSession): Boolean = {
    val p = new Path(manifestPath)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  private def dataFilesOnDisk(spark: SparkSession): Seq[Path] = {
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath).toSeq
  }

  /** Land one increment; returns the refreshed manifest (localized —
    * consultable without re-reading the table). First call creates the
    * pair; later calls append + maintain. The manifest on disk is always
    * left current with the table — callers materialize verdicts THROUGH
    * this call (it is the write), then close their stage handles.
    *
    * Create-vs-append is keyed on the MANIFEST, so a table directory
    * that already holds parquet data without one (a pre-store table, or
    * a manifest deleted out-of-band) is refused loudly: the create path
    * is a SaveMode.Overwrite and would silently destroy the existing
    * rows. Adopt such a table by building its manifest first
    * ([[Manifest.build]] + [[Manifest.write]] to `manifestPath`) — the
    * next writeIncrement then takes the append path. */
  def writeIncrement(increment: DataFrame): DataFrame = {
    val spark = increment.sparkSession
    if (!exists(spark)) {
      val preexisting = dataFilesOnDisk(spark)
      require(preexisting.isEmpty,
        s"increment store: $tablePath already holds ${preexisting.size} " +
          s"parquet file(s) but no manifest exists at $manifestPath — the " +
          "create path would OVERWRITE them. Adopt the table first: " +
          "Manifest.build + Manifest.write to the manifest path, then " +
          "writeIncrement appends.")
      Manifest.writeWithManifest(increment, tablePath, manifestPath,
        statsCols, filesPerIncrement, clusterBy)
    } else {
      Layout.appendClustered(increment, tablePath, filesPerIncrement,
        clusterBy: _*)
      val m = Manifest.update(spark, tablePath,
        Manifest.read(spark, manifestPath))
      Manifest.write(m, manifestPath)
      m
    }
  }

  /** The current manifest, read from its persisted form. */
  def manifest(spark: SparkSession): DataFrame =
    Manifest.read(spark, manifestPath)

  /** Pruned interval read over the accreted table — only the files whose
    * stats can satisfy `intervals` are opened, the exact predicates
    * re-applied row-wise, staleness refused loudly.
    *
    * `staleCheck = false` skips the freshness gate (a directory listing
    * plus a manifest diff per read — measured at sf10/16 local files to
    * cost more than the pruning saves, lib_additions7). It is safe
    * EXACTLY when every write goes through [[writeIncrement]], which
    * leaves the persisted manifest current by construction; any
    * out-of-band writer voids that guarantee silently, which is why the
    * gate stays the default. */
  def readRange(spark: SparkSession,
                intervals: Map[String, (Any, Any)],
                staleCheck: Boolean = true): DataFrame =
    Manifest.readPruned(spark, tablePath, manifest(spark), intervals,
      staleCheck = staleCheck)

  /** Targeted row erasure through the store — delete + manifest
    * maintenance as one consistent pair. The verdict history this store
    * accretes is exactly the table a right-to-erasure request hits, and
    * the store owns the clustered layout that makes the delete cheap
    * ([[Layout.deleteRows]]: only the files whose key ranges cover the
    * victims are rewritten — dirty-proportional, not table-proportional).
    * Going around the store (deleteRows to a side directory, swap by
    * hand) left the manifest stale and every subsequent read refused;
    * this method does the rewrite, swaps the dirty files in place, and
    * brings the manifest forward in the same call, so the staleness gate
    * stays green and clean files keep their manifest rows VERBATIM
    * (O(dirty) maintenance, the same economics as the append path).
    *
    * Single-writer contract, like every other mutation here: between the
    * file swap and the manifest write a concurrent pruned read would
    * trip the staleness gate — loudly, which is the documented failure
    * mode (never an under-read). Concurrent writers need a table
    * format's commit protocol, per the class scaladoc. */
  /** Store-owned compaction — the maintenance job that keeps the
    * append path's read-side promise over time ([[Layout.compact]]'s
    * scaladoc): every day's `writeIncrement` adds `filesPerIncrement`
    * files, and after enough days the per-file open cost (footer fetch,
    * task setup — at 100 TB, millions of object-store GETs) dominates
    * scans. Compacts the whole table to ~`targetFileBytes` files
    * re-clustered GLOBALLY on `clusterBy` (per-day increments each own a
    * tight range of their own day; a global re-cluster tightens the
    * whole table's pruning to what a single clustered write would give),
    * swaps the files in, and REBUILDS the manifest in the same call —
    * a full rebuild, deliberately: compaction rewrites every byte, so
    * O(table) manifest work is already paid for; there is nothing
    * incremental left to exploit. Same single-writer contract as
    * [[deleteRows]]: a concurrent pruned read during the swap refuses
    * loudly, never under-reads. */
  def compact(spark: SparkSession, targetFileBytes: Long): DataFrame = {
    require(exists(spark),
      s"increment store: no manifest at $manifestPath — this table is " +
        "not store-managed; use Layout.compact directly")
    val conf = spark.sessionState.newHadoopConf()
    val table = new Path(tablePath)
    val fs = table.getFileSystem(conf)
    val staging = new Path(tablePath + "__compact_staging")
    require(!fs.exists(staging),
      s"increment store: staging dir $staging already exists — a prior " +
        "compaction died mid-swap and the staging files may be the ONLY " +
        "copy of rows whose originals were already removed; recover by " +
        "moving the staged .parquet files into the table, then " +
        "Manifest.build, before retrying")
    // staging is cleaned up ONLY on success: after the originals start
    // being deleted, the staged files may be the only copy of their rows
    // — a finally-cleanup here would turn a mid-swap crash into data loss
    // (self-review catch). On failure the entry require above names the
    // recovery.
    Layout.compact(spark, tablePath, staging.toString, targetFileBytes,
      clusterBy: _*)
    // swap: the compacted set REPLACES the accreted set wholesale
    fs.listStatus(table)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .foreach { s => fs.delete(s.getPath, false); () }
    fs.listStatus(staging)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .foreach { s =>
        fs.rename(s.getPath, new Path(table, s.getPath.getName)); ()
      }
    fs.delete(staging, true)
    val m = Manifest.build(spark, tablePath, statsCols)
    Manifest.write(m, manifestPath)
    Manifest.read(spark, manifestPath)
  }

  /** Range-scoped compaction — the 100 TB-correct maintenance
    * primitive: [[compact]] rewrites the whole table in one O(table)
    * job, which is fine for a directory and wrong for a 100 TB history
    * (a single job over everything, a full manifest rebuild, and every
    * reader's working set invalidated at once). This compacts ONLY the
    * files whose manifest stats intersect `intervals` (e.g. last
    * month's accumulated daily increments), leaves every other file
    * byte-identical on disk WITH its manifest row reused verbatim, and
    * brings the manifest forward via [[Manifest.update]] — so both the
    * rewrite and the metadata maintenance are proportional to the
    * TOUCHED range, never the table. Rolling maintenance = a cron of
    * compactRange calls over aging ranges, each cheap, exactly how
    * table formats schedule bin-packing. File-level, row-preserving:
    * a touched file's out-of-range rows are re-clustered along with it
    * (pruning is conservative, correctness unaffected). Single-writer,
    * like every mutation here. */
  def compactRange(spark: SparkSession, intervals: Map[String, (Any, Any)],
                   targetFileBytes: Long): DataFrame = {
    require(exists(spark),
      s"increment store: no manifest at $manifestPath — this table is " +
        "not store-managed")
    require(targetFileBytes >= (1L << 20),
      s"increment store: target file size ${targetFileBytes}B under 1 MiB")
    val m0 = Manifest.read(spark, manifestPath)
    val victims = Manifest.prune(m0, intervals)
    if (victims.size <= 1) return m0 // nothing to bin-pack
    val conf = spark.sessionState.newHadoopConf()
    val table = new Path(tablePath)
    val fs = table.getFileSystem(conf)
    val staging = new Path(tablePath + "__compact_staging")
    require(!fs.exists(staging),
      s"increment store: staging dir $staging already exists — a prior " +
        "compaction died mid-swap and the staging files may be the ONLY " +
        "copy of rows whose originals were already removed; recover by " +
        "moving the staged .parquet files into the table, then " +
        "Manifest.build, before retrying")
    val victimPaths = victims.map(new Path(_))
    val bytes = victimPaths.map(p => fs.getFileStatus(p).getLen).sum
    val nFiles = math.max(1,
      math.ceil(bytes.toDouble / targetFileBytes).toInt)
    import org.apache.spark.sql.functions.col
    spark.read.parquet(victims: _*)
      .repartitionByRange(nFiles, clusterBy.map(col): _*)
      .sortWithinPartitions(clusterBy.map(col): _*)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(staging.toString)
    // staging cleaned up ONLY on success — once victims start being
    // deleted it may hold the only copy of their rows (see [[compact]])
    victimPaths.foreach { p => fs.delete(p, false); () }
    fs.listStatus(staging)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .foreach { s =>
        fs.rename(s.getPath, new Path(table, s.getPath.getName)); ()
      }
    fs.delete(staging, true)
    val m = Manifest.update(spark, tablePath, m0)
    Manifest.write(m, manifestPath)
    m
  }

  def deleteRows(spark: SparkSession, keyCol: String,
                 dropKeys: Seq[Any]): Layout.DeleteStats = {
    require(exists(spark),
      s"increment store: no manifest at $manifestPath — this table is " +
        "not store-managed; use Layout.deleteRows directly")
    val conf = spark.sessionState.newHadoopConf()
    val table = new Path(tablePath)
    val fs = table.getFileSystem(conf)
    // rewrite ONLY the dirty files into a sibling staging dir (clean
    // files stay where they are — copyClean=false keeps the delete
    // dirty-proportional; the store IS the "table format" that re-points
    // the clean files, by simply never touching them)
    val staging = new Path(tablePath + "__delete_staging")
    require(!fs.exists(staging),
      s"increment store: staging dir $staging already exists — a prior " +
        "delete died mid-swap and the staging files may be the ONLY copy " +
        "of kept rows whose originals were already removed; recover by " +
        "moving the staged .parquet files over their same-named originals, " +
        "then Manifest.update, before retrying")
    val stats = Layout.deleteRows(spark, tablePath, staging.toString,
      keyCol, dropKeys, copyClean = false)
    // swap each rewritten file over its original under the same name;
    // Manifest.update sees (len, mtime) change and rescans exactly them.
    // Staging is cleaned up ONLY after the swap completes — mid-swap, a
    // staged file is the only copy of its kept rows once the original is
    // deleted, so a finally-cleanup would turn a crash into data loss
    // (self-review catch); on failure the entry require names recovery.
    fs.listStatus(staging)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .foreach { s =>
        val dst = new Path(table, s.getPath.getName)
        fs.delete(dst, false)
        fs.rename(s.getPath, dst)
        ()
      }
    fs.delete(staging, true)
    val m = Manifest.update(spark, tablePath,
      Manifest.read(spark, manifestPath))
    Manifest.write(m, manifestPath)
    stats
  }
}
