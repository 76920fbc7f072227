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

  /** Land one increment; returns the refreshed manifest (localized —
    * consultable without re-reading the table). First call creates the
    * pair; later calls append + maintain. The manifest on disk is always
    * left current with the table — callers materialize verdicts THROUGH
    * this call (it is the write), then close their stage handles. */
  def writeIncrement(increment: DataFrame): DataFrame = {
    val spark = increment.sparkSession
    if (!exists(spark))
      Manifest.writeWithManifest(increment, tablePath, manifestPath,
        statsCols, filesPerIncrement, clusterBy)
    else {
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
}
