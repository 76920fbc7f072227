package graft.operators

import graft.SparkSpec

/** Guard rails of [[TextOps.stratumPrefixSum]]: the driver-side subtotal
  * collect is bounded ONLY because strata are low-cardinality — misuse with
  * an id-like stratum column must fail loudly, not OOM the driver. */
class PrefixSumGuardSpec extends SparkSpec {

  test("stratumPrefixSum rejects high-cardinality strata loudly") {
    val s = spark; import s.implicits._
    // one stratum per row = the misuse the guard exists for
    val rows = (1L to 50L).map(i => (s"id_$i", i, i, 1L))
      .toDF("s", "o", "i", "v")
    val e = intercept[IllegalArgumentException] {
      // maxSubtotals lowered so the failure is reachable at test size;
      // production default is millions
      val (rdd, _) = TextOps.stratumPrefixSum(rows, maxSubtotals = 8)
      rdd.count()
    }
    assert(e.getMessage.contains("low-cardinality"))
    assert(e.getMessage.contains("stratumPrefixSum"))
  }

  test("stratumPrefixSum matches a single-partition window prefix sum") {
    val s = spark; import s.implicits._
    val rows = Seq(
      ("en", 3L, 30L, 2L), ("en", 1L, 10L, 5L), ("en", 2L, 20L, 7L),
      ("de", 1L, 11L, 4L), ("de", 2L, 21L, 6L)
    ).toDF("s", "o", "i", "v").repartition(3)
    val (rdd, totals) = TextOps.stratumPrefixSum(rows)
    val got = rdd.collect().map { case (s, i, v, p) => ((s, i), (v, p)) }.toMap
    assert(totals == Map("en" -> 14L, "de" -> 10L))
    assert(got(("en", 10L)) == ((5L, 0L)))
    assert(got(("en", 20L)) == ((7L, 5L)))
    assert(got(("en", 30L)) == ((2L, 12L)))
    assert(got(("de", 11L)) == ((4L, 0L)))
    assert(got(("de", 21L)) == ((6L, 4L)))
  }
}
