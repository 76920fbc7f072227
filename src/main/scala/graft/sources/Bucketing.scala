package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers — the co-located-join path for repeated joins on
  * the same key at 100 TB.
  *
  * Writing both sides bucketed (and sorted) by the join key means every
  * subsequent equi-join or aggregation on that key runs with ZERO shuffle:
  * Spark's FileSourceScanExec reports the bucket hash-partitioning, so
  * EnsureRequirements inserts no Exchange (verified in BucketingSpec).
  * This is the difference between re-shuffling 100 TB per query and
  * shuffling it once at ingest.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted external table at `path`. */
  def writeBucketed(df: DataFrame, path: String, table: String,
                    key: String, numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .option("path", path)
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Write a table partitioned by a (low-cardinality) derived column —
    * e.g. event date. Queries filtering on the partition column then scan
    * only matching directories (partition pruning; verified in
    * BucketingSpec via the scan's PartitionFilters). At 100 TB,
    * date-partitioned event data turns time-range queries from full scans
    * into touched-day scans. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)
}
