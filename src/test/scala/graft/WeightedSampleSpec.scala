package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Efraimidis-Spirakis weighted sampling: exact agreement with a driver
  * replay, weight monotonicity, and determinism. */
class WeightedSampleSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  /** The operator's uniform, replayed: md5 of the id string, first 15 hex
    * chars as a long, (v + 1) / 2^60. */
  private def u(id: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    (java.lang.Long.parseLong(hex.take(15), 16).toDouble + 1.0) / math.pow(2.0, 60)
  }

  test("matches a driver-side A-ES replay exactly; w<=0 excluded; n per stratum") {
    val rows = (1L to 40L).map(id =>
      (id, if (id % 2 == 0) "even" else "odd",
        if (id == 39L) 0.0 else (id % 5 + 1).toDouble)) // id 39: weight 0
    val df = rows.toDF("doc_id", "stratum", "w")
    val n = 5
    val got = TextOps.weightedSample(df.repartition(7), "stratum", "doc_id", "w", n)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    // driver replay with the identical formula
    val want = rows.filter(_._3 > 0.0).groupBy(_._2).flatMap { case (s, rs) =>
      rs.map { case (id, _, w) => (-math.log(u(id)) / w, id) }
        .sorted.take(n).zipWithIndex
        .map { case ((_, id), i) => (s, i + 1, id) }
    }.toSet
    assert(got == want, s"spark $got\n!= driver $want")
    assert(!got.exists(_._3 == 39L), "zero-weight row selected")
    assert(got.groupBy(_._1).values.forall(_.size == n))
    // determinism across partitionings
    val again = TextOps.weightedSample(df.repartition(3), "stratum", "doc_id", "w", n)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(again == got)
  }

  test("selection probability rises with weight") {
    // 200 strata, each holding one heavy (w=10) and nine light (w=1) rows:
    // the heavy row should win the single slot far more often than 1/10
    val rows = (0 until 200).flatMap { s =>
      (0 until 10).map(i => (s.toLong * 100 + i, "s" + s,
        if (i == 0) 10.0 else 1.0))
    }
    val df = rows.toDF("doc_id", "stratum", "w")
    val picks = TextOps.weightedSample(df, "stratum", "doc_id", "w", 1)
      .collect().map(r => r.getLong(2))
    val heavyWins = picks.count(_ % 100 == 0)
    // E[win] ≈ 10/19 ≈ 0.53 of 200; uniform would be 20. Wide margins so
    // the deterministic fixture can never flake.
    assert(heavyWins > 60, s"heavy rows won only $heavyWins/200 strata")
  }
}
