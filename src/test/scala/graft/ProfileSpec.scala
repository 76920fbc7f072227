package graft

import org.apache.spark.sql.functions._
import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  test("one-pass profile: exact stats exact, sketch stats in-band, one row per column") {
    val ev = Tables.events(spark, sf)
    val prof = Profile.profile(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.keySet == ev.columns.toSet, "one row per column")

    val n = ev.count()
    val vRow = prof("value")
    assert(vRow.getLong(1) == n && vRow.getLong(2) == 0L)
    // exact moments vs the profile
    val exact = ev.agg(min("value"), avg("value"), max("value")).head
    assert(math.abs(vRow.getDouble(5) - exact.getDouble(0)) < 1e-12)
    assert(math.abs(vRow.getDouble(6) - exact.getDouble(1)) < 1e-9)
    assert(math.abs(vRow.getDouble(7) - exact.getDouble(2)) < 1e-12)
    // sketch stats against exact references
    val exactDistinctUsers =
      ev.select(countDistinct("user_id")).head.getLong(0).toDouble
    val uRow = prof("user_id")
    assert(math.abs(uRow.getDouble(3) - exactDistinctUsers)
      / exactDistinctUsers <= 0.05, s"distinct_est ${uRow.getDouble(3)}")
    val sorted = ev.select("value").as[Double].collect().sorted
    def rankOf(v: Double): Double = {
      val i = java.util.Arrays.binarySearch(sorted, v)
      (if (i >= 0) i else -(i + 1)).toDouble / sorted.length
    }
    assert(math.abs(rankOf(vRow.getDouble(8)) - 0.50) <= 0.02, "p50")
    assert(math.abs(rankOf(vRow.getDouble(9)) - 0.95) <= 0.02, "p95")
    // non-numeric column: no moments, but counts and distincts live
    val tRow = prof("event_type")
    assert(!tRow.getBoolean(4) && tRow.isNullAt(5) && tRow.isNullAt(8))
    assert(tRow.getDouble(3) ==
      ev.select(countDistinct("event_type")).head.getLong(0).toDouble)
    // timestamp column profiles on the epoch line
    val tsRow = prof("ts")
    assert(tsRow.getBoolean(4) && !tsRow.isNullAt(8))
  }

  test("profile carries deterministic example values per column") {
    val ev = Tables.events(spark, sf)
    val prof = Profile.profile(ev, exampleK = 5).collect()
      .map(r => r.getString(0) -> r.getSeq[String](r.fieldIndex("examples")))
      .toMap
    // every column has 1..k examples drawn from its actual (stringified)
    // values
    val types = ev.select("event_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(prof("event_type").nonEmpty && prof("event_type").size <= 5)
    assert(prof("event_type").forall(types.contains))
    val users = ev.select("user_id").distinct()
      .collect().map(_.getLong(0).toString).toSet
    assert(prof("user_id").forall(users.contains))
    // deterministic: a reprofile yields the identical example lists
    val again = Profile.profile(ev, exampleK = 5).collect()
      .map(r => r.getString(0) -> r.getSeq[String](r.fieldIndex("examples")))
      .toMap
    assert(again == prof)
  }

  test("percentileScore ranks every row against the corpus without a window or sort") {
    val ev = Tables.events(spark, sf)
    val scored = Profile.percentileScore(ev, "value")
    assert(scored.count() == ev.count())
    // spot-check against exact ranks
    val sorted = ev.select("value").as[Double].collect().sorted
    def rankOf(v: Double): Double = {
      val i = java.util.Arrays.binarySearch(sorted, v)
      (if (i >= 0) i else -(i + 1)).toDouble / sorted.length
    }
    scored.select("value", "value_pct").as[(Double, Double)]
      .collect().take(200).foreach { case (v, pct) =>
        assert(math.abs(pct - rankOf(v)) <= 0.02,
          f"row $v%.3f scored $pct%.4f vs exact ${rankOf(v)}%.4f")
      }
    // the plan is two scans and zero windows: no Window node, no global sort
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"percentileScore must not window:\n${plan.take(600)}")
    // curation filter built on it: keep the top 70% by quality proxy
    val kept = scored.filter(col("value_pct") >= 0.3).count()
    val frac = kept.toDouble / ev.count()
    assert(math.abs(frac - 0.7) <= 0.03, s"kept fraction $frac")
  }

  test("drift: identical snapshots read as no drift; a shifted/churned one is flagged") {
    val ev = Tables.events(spark, sf)
    val p0 = Profile.profile(ev)
    // self-drift: same domain, same quantiles
    val self = Profile.drift(p0, p0).collect()
      .map(r => r.getString(0) -> r).toMap
    val selfVal = self("value")
    assert(selfVal.getDouble(1) > 0.95, s"self jaccard ${selfVal.getDouble(1)}")
    assert(selfVal.getDouble(2) < 0.05, s"self new_frac ${selfVal.getDouble(2)}")
    assert(selfVal.getDouble(3) < 1e-9, s"self shift ${selfVal.getDouble(3)}")

    // a drifted snapshot: values shifted by 10x the p50..p99 scale and
    // user ids renumbered into a disjoint range
    val scale = p0.filter(col("column") === "value")
      .select(col("p99") - col("p50")).head.getDouble(0)
    val drifted = ev
      .withColumn("value", col("value") + lit(10 * scale))
      .withColumn("user_id", col("user_id") + lit(1000000L))
    val p1 = Profile.profile(drifted)
    val d = Profile.drift(p0, p1).collect()
      .map(r => r.getString(0) -> r).toMap
    val dv = d("value")
    assert(dv.getDouble(3) > 5.0, s"shift not flagged: ${dv.getDouble(3)}")
    val du = d("user_id")
    assert(du.getDouble(1) < 0.05, s"renumbered ids still overlap: ${du.getDouble(1)}")
    assert(du.getDouble(2) > 0.95, s"new_frac missed the churn: ${du.getDouble(2)}")
    // and an untouched column still reads as stable
    val dt = d("event_type")
    assert(dt.getDouble(1) > 0.95 && dt.getDouble(2) < 0.05)
  }
}
