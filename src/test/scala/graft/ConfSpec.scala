package graft

/** The cluster deployment profile (Conf.cluster, r10): the one artifact a
  * real 100-TB rollout asks for — a derivation from (cores, target
  * partition payload) to the session conf block — spec-pinned so the
  * settings actually land in a live session and the guardrails refuse
  * nonsense sizing. */
class ConfSpec extends SparkSpec {

  test("cluster profile settings land in a live session (and restore cleanly)") {
    val profile = Conf.cluster(nCores = 400, targetPartitionBytes = 64L << 20)
    // get() can return Success(null) for keys with no default (e.g.
    // initialPartitionNum falls back to shuffle.partitions) — treat as unset
    val saved = profile.keySet.map(k =>
      k -> scala.util.Try(spark.conf.get(k)).toOption.filter(_ != null)).toMap
    try {
      Conf.applyCluster(spark, nCores = 400, targetPartitionBytes = 64L << 20)
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "800")
      assert(spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum") == "3200")
      assert(spark.conf.get(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes") == (64L << 20).toString)
      assert(spark.conf.get(
        "spark.sql.files.maxPartitionBytes") == (64L << 20).toString)
      assert(spark.conf.get(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes") ==
        (256L << 20).toString)
      assert(spark.conf.get(
        "spark.sql.autoBroadcastJoinThreshold") == (64L << 20).toString)
      // the tuned base rides along — AQE + skew join + runtime filters
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
      assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    } finally {
      // the test session is shared across every suite — put it back
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("cluster profile guardrails refuse nonsense sizing") {
    intercept[IllegalArgumentException](Conf.cluster(0))
    intercept[IllegalArgumentException](Conf.cluster(-8))
    // 1 KB partitions: the job drowns in task overhead
    intercept[IllegalArgumentException](
      Conf.cluster(8, targetPartitionBytes = 1024L))
    // 4 GB partitions: executor OOM/spill territory
    intercept[IllegalArgumentException](
      Conf.cluster(8, targetPartitionBytes = 4L << 30))
    // a negative threshold silently disables broadcasting
    intercept[IllegalArgumentException](
      Conf.cluster(8, broadcastThresholdBytes = -1L))
    // 0 is allowed, explicitly (intentional broadcast opt-out)
    assert(Conf.cluster(8, broadcastThresholdBytes = 0L)
      .apply("spark.sql.autoBroadcastJoinThreshold") == "0")
  }
}
