package graft

import org.apache.spark.sql.functions._
import graft.functions.{Kll, KllBuffer, KllUtil}

/** KLL quantile sketch (r10): UNIFORM rank-error bounds across
  * distribution shapes AND adversarial sorted input (the uniform bound is
  * KLL's point vs the tail-weighted t-digest), monotone quantiles with
  * exact extremes, exact total-weight conservation through compaction,
  * the rollup-union path, SQL parity, and guardrails. Like the t-digest,
  * bytes are insertion-order-dependent by design — specs pin bounds and
  * invariants, never byte equality. */
class KllSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  private val probes = Seq(0.01, 0.05, 0.25, 0.5, 0.75, 0.9, 0.99)

  private def rankOf(sorted: Array[Double], v: Double): Double = {
    val i = java.util.Arrays.binarySearch(sorted, v)
    val pos = if (i >= 0) i else -(i + 1)
    pos.toDouble / sorted.length
  }

  private def sketchOf(values: Seq[Double], k: Int = 200,
                       parts: Int = 8): Array[Byte] =
    values.toDF("x").repartition(parts)
      .agg(Kll.sketch(col("x"), k).as("s"))
      .head.getAs[Array[Byte]]("s")

  test("uniform rank error <= 1.5% at k=200 across shapes INCLUDING sorted input") {
    val rnd = new scala.util.Random(42L)
    val shapes = Map(
      "uniform" -> Array.fill(20000)(rnd.nextDouble() * 1000.0),
      "lognormal-ish" -> Array.fill(20000)(math.exp(rnd.nextGaussian() * 2.0)),
      "clustered" -> Array.fill(20000)(
        rnd.nextInt(5) * 100.0 + rnd.nextGaussian()),
      // pre-sorted input is the adversarial order for compaction-based
      // sketches — the uniform guarantee must hold here too
      "sorted" -> Array.tabulate(20000)(_.toDouble))
    for ((name, xs) <- shapes) {
      val sorted = xs.sorted
      val s = sketchOf(xs.toSeq)
      for (q <- probes) {
        val est = KllUtil.quantileBytes(s, q)
        val err = math.abs(rankOf(sorted, est) - q)
        // ONE bound for every q — no tail/mid split (that's the contract
        // difference vs the t-digest, whose bound is tail-weighted)
        assert(err <= 0.015,
          f"$name q=$q: rank error $err%.4f > 0.015 (est=$est%.3f)")
      }
    }
  }

  test("quantiles are monotone in q; q=0/1 hit exact min/max") {
    val rnd = new scala.util.Random(7L)
    val xs = Array.fill(5000)(rnd.nextGaussian() * 10.0)
    val s = sketchOf(xs.toSeq)
    val vals = (0 to 100).map(i => KllUtil.quantileBytes(s, i / 100.0))
    assert(vals.zip(vals.tail).forall { case (a, b) => a <= b },
      "quantiles not monotone in q")
    assert(vals.head == xs.min && vals.last == xs.max,
      s"extremes not exact: ${vals.head}/${vals.last} vs ${xs.min}/${xs.max}")
  }

  test("total weight is conserved exactly through compaction and merge") {
    val b = new KllBuffer(64)
    (1 to 12345).foreach(i => b.add(i.toDouble))
    assert(b.totalWeight == 12345L, s"weight ${b.totalWeight} != n after adds")
    val c = new KllBuffer(64)
    (1 to 6789).foreach(i => c.add(-i.toDouble))
    b.mergeIn(c)
    assert(b.totalWeight == 12345L + 6789L,
      s"weight ${b.totalWeight} != n after merge")
    assert(b.n == 12345L + 6789L)
    // round-trip the wire format, weight still exact
    val d = new KllBuffer(64)
    d.addSketch(b.toBytes)
    assert(d.totalWeight == b.totalWeight && d.n == b.n)
    assert(d.min == b.min && d.max == b.max)
  }

  test("rollup: per-group sketches merged ~= whole-table sketch (both within bound)") {
    val ev = Tables.events(spark, sf)
    val perType = ev.groupBy("event_type")
      .agg(Kll.sketch(col("value")).as("s"))
    val rolled = perType.agg(Kll.merge(col("s")).as("s"))
      .head.getAs[Array[Byte]]("s")
    val whole = ev.agg(Kll.sketch(col("value")).as("s"))
      .head.getAs[Array[Byte]]("s")
    val exact = ev.select("value").as[Double].collect().sorted
    for (q <- Seq(0.25, 0.5, 0.9)) {
      val rv = KllUtil.quantileBytes(rolled, q)
      val wv = KllUtil.quantileBytes(whole, q)
      assert(math.abs(rankOf(exact, rv) - q) <= 0.02,
        s"rollup q=$q rank error too large (est=$rv)")
      assert(math.abs(rankOf(exact, wv) - q) <= 0.02,
        s"whole q=$q rank error too large (est=$wv)")
    }
  }

  test("state stays O(k): sketch size is flat in n") {
    val small = sketchOf((1 to 2000).map(_.toDouble), k = 128, parts = 2)
    val large = sketchOf((1 to 200000).map(_.toDouble), k = 128, parts = 2)
    // 100x the data, bounded growth (more levels, shrinking caps): the
    // whole point of the sketch vs q_percentiles' value-list state
    assert(large.length < 4 * small.length,
      s"sketch grew ${small.length} -> ${large.length} bytes on 100x data")
  }

  test("SQL surface round-trips, including rollup and decimal literals") {
    // SQL functions live in an extensions-enabled session (same shared
    // context, never closed — the SparkSpec contract, like TDigestSpec)
    val s2 = try {
      spark // force the shared context first
      org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .create()
    } catch { case _: Throwable => null }
    assume(s2 != null, "no extensions-enabled session available")
    val ev = Tables.events(s2, sf)
    ev.createOrReplaceTempView("kll_events")
    // decimal literal + rollup through the injection-site casts
    val sql = s2.sql(
      """SELECT graft_kll_quantile(graft_kll_sketch(value, 200), 0.9) AS p90,
        |       graft_kll_quantile(graft_kll_merge(s), 0.5) AS merged_med
        |FROM (SELECT event_type, graft_kll_sketch(value, 200) AS s,
        |        first(value) AS value
        |      FROM kll_events GROUP BY event_type)""".stripMargin).head
    val exact = ev.collect().map(_.getAs[Double]("value")).sorted
    // the outer sketch digests one value per type — just assert finite;
    // the merged rollup digests everything: hold it to the bound
    assert(!sql.isNullAt(0) && !sql.getDouble(0).isNaN)
    assert(math.abs(rankOf(exact, sql.getDouble(1)) - 0.5) <= 0.02)
  }

  test("guardrails: k range, mismatched-k merge, malformed bytes, empty sketch") {
    intercept[IllegalArgumentException](new KllBuffer(8))
    intercept[IllegalArgumentException](Kll.quantile(col("x"), 1.5))
    val a = new KllBuffer(64); a.add(1.0)
    val b = new KllBuffer(128); b.add(2.0)
    val e1 = intercept[IllegalArgumentException](a.mergeIn(b))
    assert(e1.getMessage.contains("different k"))
    val e2 = intercept[IllegalArgumentException](
      KllUtil.quantileBytes(Array[Byte](1, 2, 3), 0.5))
    assert(e2.getMessage.contains("not a KLL sketch"))
    // empty sketch round-trips and answers NaN
    val empty = new KllBuffer(64).toBytes
    assert(KllUtil.quantileBytes(empty, 0.5).isNaN)
    assert(KllUtil.rankBytes(empty, 0.5).isNaN)
  }

  test("rank is the CDF inverse of quantile within the same uniform bound") {
    val rnd = new scala.util.Random(7L)
    val values = Array.fill(20000)(rnd.nextGaussian() * 50.0 + 100.0)
    val sk = sketchOf(values.toSeq)
    val sorted = values.sorted
    // rank(quantile(q)) ≈ q at every probe — round-tripping through the
    // sketch must stay inside the same 1.5% uniform band
    for (q <- probes) {
      val v = KllUtil.quantileBytes(sk, q)
      val r = KllUtil.rankBytes(sk, v)
      assert(math.abs(r - rankOf(sorted, v)) <= 0.015,
        f"rank(${v}%.2f) = $r%.4f vs exact ${rankOf(sorted, v)}%.4f")
    }
    // extremes are exact
    assert(KllUtil.rankBytes(sk, sorted.last) == 1.0)
    assert(KllUtil.rankBytes(sk, sorted.head - 1.0) == 0.0)
    // the per-row scoring use: a COLUMN of values scored against one
    // broadcast sketch — each document's percentile vs the corpus
    val scored = values.take(100).toSeq.toDF("x")
      .withColumn("pct", Kll.rank(lit(sk), col("x")))
      .as[(Double, Double)].collect()
    scored.foreach { case (x, pct) =>
      assert(math.abs(pct - rankOf(sorted, x)) <= 0.02,
        f"per-row rank of $x%.2f: $pct%.4f vs ${rankOf(sorted, x)}%.4f")
    }
  }
}
