package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout control for the write path — the scan-cost lever at 100 TB.
  *
  * Parquet predicate pushdown prunes at the ROW-GROUP level from footer
  * min/max statistics, but those statistics only bite if the write path
  * puts correlated values in the same files. A randomly-laid-out 100 TB
  * table answers a 0.1%-selective range query by opening every file
  * (each file's min/max spans the whole domain); the same table
  * range-clustered on the filter column opens ~0.1% of them. Nothing in
  * the query changes — only the layout. These helpers are the ingest-time
  * half of that bargain; LayoutSpec proves the skipping with
  * `input_file_name()` counts over identical queries on identical rows.
  *
  *  - [[writeClustered]] — range-partition + sort on the cluster key(s):
  *    optimal for one dominant filter dimension (time, usually).
  *  - [[writeZOrdered]] — interleaved-bit (Morton) key over TWO numeric
  *    dimensions: each file covers a small rectangle of the 2-D domain,
  *    so selective filters on EITHER dimension alone skip most files —
  *    the property a linear (a, b) sort cannot give b.
  *  - [[compact]] — bin-pack a directory of small files to a target file
  *    size, preserving (or imposing) the cluster order. Streaming sinks
  *    and incremental ingest shed small files; scans pay per-file open
  *    costs (footer fetch, task setup) that at 100 TB dwarf the data
  *    read. Compaction is the maintenance job that keeps the layout's
  *    read-side promise over time.
  */
object Layout {

  /** Range-clustered write: rows are range-partitioned into `nFiles`
    * contiguous key ranges and sorted within each, so every output file
    * owns a disjoint slice of the key domain and its footer min/max is
    * maximally tight. The sampled range boundaries balance file SIZES
    * even under key skew — hash bucketing (modulo) would balance counts
    * only for uniform keys and destroys range locality entirely. */
  def writeClustered(df: DataFrame, path: String, nFiles: Int,
                     sortCols: String*): Unit = {
    require(nFiles > 0, s"layout: nFiles must be positive, got $nFiles")
    require(sortCols.nonEmpty, "layout: need at least one cluster column")
    val cols = sortCols.map(col)
    df.repartitionByRange(nFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Append-mode sibling of [[writeClustered]] for accreting tables —
    * the daily-verdict pattern (`Curation.curateIncrement` output lands
    * as one increment per day) and append-style log ingests. The
    * increment is range-clustered and sorted WITHIN ITSELF, so each new
    * file owns a tight slice of the increment's key domain while every
    * existing file stays byte-identical on disk — which is exactly the
    * shape [[Manifest.update]] exploits to bring the table's manifest
    * forward by scanning ONLY the new files (O(increment) maintenance,
    * the property that keeps the pair viable at 100 TB). Increments with
    * disjoint key ranges (per-day id blocks, time-ordered ingest) keep
    * whole-table pruning as tight as a full re-cluster; overlapping
    * ranges degrade pruning only across the overlap, never correctness. */
  def appendClustered(df: DataFrame, path: String, nFiles: Int,
                      sortCols: String*): Unit = {
    require(nFiles > 0, s"layout: nFiles must be positive, got $nFiles")
    require(sortCols.nonEmpty, "layout: need at least one cluster column")
    val cols = sortCols.map(col)
    df.repartitionByRange(nFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(SaveMode.Append).parquet(path)
  }

  /** Morton (z-order) key over two numeric columns, on an EQUI-DEPTH
    * grid: each dimension is bucketed by its own quantiles (one
    * `approxQuantile` stats pass per dimension — bounded driver-side
    * state, an ingest-time cost), then the two 6-bit cell indices are
    * bit-interleaved. Equi-depth, not min/max scaling, on purpose: real
    * columns are skewed and heavy-tailed, and a linear [min, max] grid
    * collapses the bulk of a heavy-tailed column into a handful of cells
    * — the z-curve then degenerates to a sort on the OTHER dimension and
    * the layout silently stops pruning (caught live by LayoutSpec when
    * this used min/max). Quantile cells hold equal row counts by
    * construction, so every z-block is a compact equal-mass rectangle of
    * the (a, b) domain whatever the marginals look like. The per-row key
    * is codegen'd built-ins only (comparisons, shifts, bitwise or) — no
    * UDF on the 100 TB write path. */
  def zOrderKey(df: DataFrame, aCol: String, bCol: String): Column =
    zOrderKeyN(df, Seq(aCol, bCol))

  /** N-dimensional Morton key on the same equi-depth grid — for tables
    * filtered along three-plus independent dimensions (tenant, time,
    * score…). Bits per dimension shrink as dimensions grow (the key
    * stays ≤ ~60 bits); past 4-5 dimensions each dimension's cells get
    * too coarse to prune well — that is inherent to z-ordering, not
    * this encoding — so the arity is capped where the curve still
    * earns its keep. */
  def zOrderKeyN(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.size >= 2 && cols.size <= 5,
      s"layout: z-order wants 2-5 dimensions, got ${cols.size} — one " +
        "dimension is a plain sort (writeClustered); beyond 5 every " +
        "dimension's grid is too coarse to prune")
    val bitsPerDim = math.min(6, 12 / cols.size * 2) // 6,6,6,4 bits for n=2..5
    val cells = 1 << bitsPerDim
    val probs = (1 until cells).map(_.toDouble / cells).toArray
    // ONE stats scan for every dimension (the multi-column approxQuantile
    // overload) — the per-column form would run n sequential full-table
    // jobs before the write even starts (self-review catch)
    val casted = df.select(cols.map(c =>
      col(c).cast("double").as(c)): _*)
    val allBounds = casted.stat.approxQuantile(cols.toArray, probs, 0.001)
    val dims = cols.zip(allBounds).map { case (c, bounds) =>
      require(bounds.nonEmpty,
        s"layout: no rows to derive z-order quantiles for $c")
      bounds.foldLeft(lit(0L)) { (acc, b) =>
        acc + when(col(c).cast("double") >= b, 1L).otherwise(0L)
      }
    }
    val n = dims.size
    // interleave MSB-first across dimensions: bit i of dim d lands at
    // position i*n + (n-1-d), so same-significance bits stay adjacent
    (0 until bitsPerDim).foldLeft(lit(0L)) { (acc, i) =>
      dims.zipWithIndex.foldLeft(acc) { case (a, (dcol, d)) =>
        a.bitwiseOR(shiftleft(
          shiftright(dcol, i).bitwiseAND(lit(1L)), i * n + (n - 1 - d)))
      }
    }
  }

  /** Z-ordered write: range-partition + sort on the Morton key of
    * (aCol, bCol); the key itself is dropped from the files (it is a
    * layout artifact, rederivable from the stats). Footer min/max on the
    * PLAIN a and b columns do the pruning — readers need no knowledge
    * that the table is z-ordered. */
  def writeZOrdered(df: DataFrame, path: String, nFiles: Int,
                    aCol: String, bCol: String): Unit =
    writeZOrderedN(df, path, nFiles, Seq(aCol, bCol))

  /** N-dimensional variant of [[writeZOrdered]] (see [[zOrderKeyN]]). */
  def writeZOrderedN(df: DataFrame, path: String, nFiles: Int,
                     cols: Seq[String]): Unit = {
    require(nFiles > 0, s"layout: nFiles must be positive, got $nFiles")
    val zc = "__z_key"
    require(!df.columns.contains(zc),
      s"layout: reserves the column name $zc; rename that input column")
    df.withColumn(zc, zOrderKeyN(df, cols))
      .repartitionByRange(nFiles, col(zc))
      .sortWithinPartitions(col(zc))
      .drop(zc)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Compact a parquet directory to files of roughly `targetFileBytes`,
    * re-imposing the cluster order if `sortCols` are given (a compaction
    * that merges sorted files MUST re-sort — concatenation interleaves
    * ranges and silently un-tightens every footer). Sizing reads the
    * source file statuses from the filesystem, not a data scan. Writes
    * to `dstPath`: atomicity at 100 TB is a rename/metastore swap owned
    * by the caller's table format, not something a library should fake
    * with a delete-then-write race on the live directory. */
  def compact(spark: SparkSession, srcPath: String, dstPath: String,
              targetFileBytes: Long, sortCols: String*): Unit = {
    require(targetFileBytes >= (1L << 20),
      s"layout: target file size ${targetFileBytes}B is under 1 MiB — " +
        "that many files is the problem compaction exists to solve")
    val fs = new org.apache.hadoop.fs.Path(srcPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(new org.apache.hadoop.fs.Path(srcPath))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    require(totalBytes > 0, s"layout: no parquet data under $srcPath")
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(srcPath)
    val packed =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nFiles, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.coalesce(nFiles)
    packed.write.mode(SaveMode.Overwrite).parquet(dstPath)
  }

  case class DeleteStats(filesTotal: Int, filesRewritten: Int,
                         rowsDeleted: Long)

  /** Targeted row deletion ("forget these keys" — the compliance /
    * right-to-erasure job): rewrite ONLY the files that contain matching
    * rows; every clean file is copied through BYTE-FOR-BYTE at the
    * filesystem level, never decoded. This is the layout's pruning
    * promise applied to the WRITE side: on a key-clustered 100 TB table
    * a delete of k keys dirties the handful of files whose key ranges
    * cover them, so the rewrite cost is proportional to the dirty data,
    * not the table. On a random layout the same delete dirties every
    * file — the spec measures exactly that contrast.
    *
    * Each dirty file is rewritten as its own single-file job, preserving
    * the file's internal sort and the table's file granularity; the
    * driver holds only file NAMES (bounded by the dirty-file count).
    * Writes the corrected table to `dstPath` — like [[compact]], the
    * atomic swap of a live table belongs to the caller's table format,
    * not a faked delete-in-place.
    *
    * `copyClean` honesty note: with `copyClean = true` (the
    * self-contained default, and what the spec exercises) the clean
    * files are driver-streamed copies — fine for directory-sized
    * tables, but at real scale that leg is proportional to the TABLE,
    * not the dirty data. A 100 TB deployment runs `copyClean = false`:
    * only the rewritten dirty files land in `dstPath`, and the caller's
    * table format re-points the clean files by reference (rename /
    * manifest swap — a metadata operation), keeping the whole delete
    * dirty-proportional end to end. */
  def deleteRows(spark: SparkSession, srcPath: String, dstPath: String,
                 keyCol: String, dropKeys: Seq[Any],
                 copyClean: Boolean = true): DeleteStats = {
    require(dropKeys.nonEmpty, "layout: deleteRows with no keys — refusing " +
      "to rewrite a table as a no-op")
    require(dropKeys.size <= 1000000,
      s"layout: ${dropKeys.size} delete keys held driver-side — stage " +
        "larger deletions as a table and anti-join instead")
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(srcPath)
    val dst = new org.apache.hadoop.fs.Path(dstPath)
    val fs = src.getFileSystem(conf)
    val dataFiles = fs.listStatus(src)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath).toSeq
    require(dataFiles.nonEmpty, s"layout: no parquet data under $srcPath")

    // which files contain victims, and how many victim rows — ONE pruned
    // scan (pushed filter; on a clustered layout the footer stats skip
    // the clean files' row groups); collect_set is bounded by file count
    val hit = spark.read.parquet(srcPath)
      .filter(col(keyCol).isin(dropKeys: _*))
      .select(input_file_name().as("__f"))
      .agg(count(lit(1)), collect_set(col("__f"))).head
    val deleted = hit.getLong(0)
    val dirtyNames = hit.getSeq[String](1).map(f =>
      new org.apache.hadoop.fs.Path(new java.net.URI(f)).getName).toSet

    fs.mkdirs(dst)
    dataFiles.foreach { p =>
      val out = new org.apache.hadoop.fs.Path(dst, p.getName)
      if (!dirtyNames.contains(p.getName)) {
        // clean file: byte-for-byte FS copy, never decoded (skipped
        // entirely under copyClean = false — see the scaladoc)
        if (copyClean) {
          org.apache.hadoop.fs.FileUtil.copy(fs, p, fs, out, false, conf)
        }
        ()
      } else {
        // NULL-key rows are NOT victims: a bare !isin() evaluates to NULL
        // for NULL keys and the filter would silently drop them —
        // unreported data loss in an erasure API (caught in self-review)
        val kept = spark.read.parquet(p.toString)
          .filter(col(keyCol).isNull || !col(keyCol).isin(dropKeys: _*))
        val tmp = new org.apache.hadoop.fs.Path(dst,
          s".rewrite_tmp_${p.getName}")
        kept.coalesce(1).write
          .mode(SaveMode.Overwrite).parquet(tmp.toString)
        val part = fs.listStatus(tmp)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        require(part.length == 1,
          s"layout: expected one rewritten part for ${p.getName}")
        fs.rename(part.head.getPath, out)
        fs.delete(tmp, true)
        ()
      }
    }
    DeleteStats(dataFiles.size, dirtyNames.size, deleted)
  }

  /** Distinct data files contributing at least one row to `df` — the
    * honest skip metric: planning-time `numFiles` counts only partition
    * pruning, while footer-stat pruning happens inside the reader. A
    * selective filter over a well-clustered layout yields rows from few
    * files; over a random layout, from all of them. Diagnostic (small
    * result collect), not a query-path operator. */
  def filesTouched(df: DataFrame): Long =
    df.select(input_file_name().as("f")).distinct().count()
}
