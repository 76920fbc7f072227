package graft

import org.apache.spark.sql.SparkSession

/** Recommended session configuration for running graft at cluster scale.
  *
  * Everything here is a runtime-settable SQLConf, so it can be applied to
  * an existing session (`Conf.applyTuned(spark)`) or passed as `--conf`
  * pairs. Rationale per key:
  *
  *  - AQE + skew join: re-plans shuffle partition counts and splits skewed
  *    partitions from runtime statistics — mandatory at 100 TB where
  *    static estimates are wrong by orders of magnitude.
  *  - Runtime bloom filters: for a shuffle join whose dimension side has a
  *    selective predicate, Spark injects a bloom filter built from the dim
  *    keys into the fact-side scan — rows that cannot join are dropped
  *    BEFORE the shuffle (semi-join reduction without writing one). The
  *    fact side of q3/q5-class joins shrinks by the dim selectivity.
  *  - applicationSideScanSizeThreshold is lowered from the 10 GB default
  *    so the filter also fires at test scale; at 100 TB any fact scan
  *    clears either bar.
  */
object Conf {

  val tuned: Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    // the comparison is against the COLUMN-PRUNED scan estimate, so even a
    // multi-MB fact file can present well under 1MB once projected — 64KB
    // keeps the filter firing at test scale; at 100 TB any fact scan
    // clears any reasonable bar, and extra runtime filters on small scans
    // cost one tiny aggregate each
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "64KB")

  def applyTuned(spark: SparkSession): Unit =
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
}
