package graft

import org.apache.spark.sql.functions._
import graft.functions.{Td, TdUtil}

/** t-digest quantile sketch: rank-error bounds on three distribution
  * shapes, quantile monotonicity + exact extremes, the rollup path
  * (per-group digests merged ≈ whole-table quantiles within bound — NOT
  * byte equality: compaction is insertion-order-dependent by design, the
  * guarantee is on ranks), the serialization boundary, total-weight
  * conservation, SQL parity incl. decimal literals, and malformed-input
  * guardrails. */
class TDigestSpec extends SparkSpec {

  private val probes = Seq(0.01, 0.05, 0.25, 0.5, 0.75, 0.9, 0.99)

  /** Rank of `v` in `sorted` as a fraction — the error metric that
    * t-digest actually bounds (value-space error is unbounded for
    * heavy tails; rank-space is the contract). */
  private def rankOf(sorted: Array[Double], v: Double): Double = {
    val i = java.util.Arrays.binarySearch(sorted, v)
    val pos = if (i >= 0) i else -(i + 1)
    pos.toDouble / sorted.length
  }

  private def digestOf(values: Seq[Double], delta: Int = 100,
                       parts: Int = 8): Array[Byte] = {
    val ss = spark
    import ss.implicits._
    values.toDF("x").repartition(parts)
      .agg(Td.sketch(col("x"), delta).as("d"))
      .head.getAs[Array[Byte]]("d")
  }

  test("rank error <= 3% mid-range, <= 1% tails, across distribution shapes") {
    val rnd = new scala.util.Random(42L)
    val shapes = Map(
      "uniform" -> Array.fill(20000)(rnd.nextDouble() * 1000.0),
      "lognormal-ish" -> Array.fill(20000)(math.exp(rnd.nextGaussian() * 2.0)),
      "clustered" -> Array.fill(20000)(
        rnd.nextInt(5) * 100.0 + rnd.nextGaussian()))
    for ((name, xs) <- shapes) {
      val sorted = xs.sorted
      val d = digestOf(xs.toSeq)
      for (q <- probes) {
        val est = TdUtil.quantileBytes(d, q)
        val err = math.abs(rankOf(sorted, est) - q)
        val bound = if (q <= 0.05 || q >= 0.95) 0.01 else 0.03
        assert(err <= bound,
          f"$name q=$q: rank error $err%.4f > $bound (est=$est%.3f)")
      }
    }
  }

  test("quantiles are monotone in q; q=0/1 hit exact min/max") {
    val rnd = new scala.util.Random(7L)
    val xs = Array.fill(5000)(rnd.nextGaussian() * 10.0)
    val d = digestOf(xs.toSeq)
    val qs = (0 to 100).map(_ / 100.0)
    val vals = qs.map(TdUtil.quantileBytes(d, _))
    assert(vals.zip(vals.tail).forall { case (a, b) => a <= b },
      "quantile estimates not monotone in q")
    assert(vals.head == xs.min && vals.last == xs.max,
      s"extremes not exact: ${vals.head}/${vals.last} vs ${xs.min}/${xs.max}")
  }

  test("total weight is conserved exactly through compaction and merge") {
    val xs = (1 to 12345).map(_.toDouble)
    val d = digestOf(xs, delta = 50, parts = 13)
    val (_, m) = TdUtil.dims(d)
    assert(m <= 2 * 50 + 2, s"centroid count $m blew the ~2*delta bound")
    var total = 0.0
    for (i <- 0 until m) {
      var l = 0L
      for (j <- 0 until 8)
        l = (l << 8) | (d(TdUtil.HEADER + i * 16 + 8 + j) & 0xffL)
      total += java.lang.Double.longBitsToDouble(l)
    }
    assert(total == 12345.0, s"weight $total != n — values lost or duplicated")
  }

  test("rollup: per-trajectory digests merged match whole-table quantiles within bound") {
    val ev = Tables.events(spark, sf).select(col("user_id"), col("value"))
    val perUser = ev.groupBy("user_id").agg(Td.sketch(col("value")).as("d"))
    val rolled = perUser.agg(Td.merge(col("d")).as("d"))
      .head.getAs[Array[Byte]]("d")
    val whole = ev.agg(Td.sketch(col("value")).as("d"))
      .head.getAs[Array[Byte]]("d")
    val exact = ev.select("value").na.drop()
      .collect().map(_.getDouble(0)).sorted
    for (q <- probes) {
      val rv = TdUtil.quantileBytes(rolled, q)
      val wv = TdUtil.quantileBytes(whole, q)
      assert(math.abs(rankOf(exact, rv) - q) <= 0.03,
        s"rollup q=$q rank error too large (est=$rv)")
      assert(math.abs(rankOf(exact, wv) - q) <= 0.03,
        s"whole q=$q rank error too large (est=$wv)")
    }
    // empty merge group -> null, not a crash
    val nullRow = perUser.filter(col("user_id") < -1)
      .agg(Td.merge(col("d")).as("d")).head
    assert(nullRow.isNullAt(0))
  }

  test("SQL parity: graft_td_sketch/merge/quantile, decimal literal accepted") {
    // SQL functions live in the extensions-enabled session (same shared
    // context, never closed — the SparkSpec contract)
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
    ev.createOrReplaceTempView("td_events")
    // bigint column + plain decimal literal — both go through the
    // injection-site casts (the graft_bloom_filter lesson)
    val sql = s2.sql(
      """SELECT graft_td_quantile(graft_td_sketch(user_id, 100), 0.5) AS med,
        |       graft_td_quantile(graft_td_merge(d), 0.9) AS p90
        |FROM (SELECT user_id, graft_td_sketch(value, 100) AS d
        |      FROM td_events GROUP BY user_id)""".stripMargin).head
    val exact = ev.select("value").na.drop()
      .collect().map(_.getDouble(0)).sorted
    // med here digests one value per user (first) — just assert finite;
    // p90 digests everything per-user then merges: hold it to the bound
    assert(!sql.isNullAt(0) && !sql.getDouble(0).isNaN)
    assert(math.abs(rankOf(exact, sql.getDouble(1)) - 0.9) <= 0.03)
  }

  test("malformed input fails as a named error; empty digest quantile is NaN") {
    val e1 = intercept[IllegalArgumentException] {
      TdUtil.quantileBytes(Array[Byte](1, 2, 3), 0.5)
    }
    assert(e1.getMessage.contains("t-digest"))
    val ss = spark
    import ss.implicits._
    val empty = Seq.empty[Double].toDF("x")
      .agg(Td.sketch(col("x")).as("d")).head.getAs[Array[Byte]]("d")
    assert(TdUtil.quantileBytes(empty, 0.5).isNaN)
    // delta mismatch on merge is named, not silent
    val d50 = digestOf(Seq(1.0, 2.0), delta = 50)
    val d100 = digestOf(Seq(1.0, 2.0), delta = 100)
    val mixed = Seq(d50, d100).toDF("d")
    val e2 = intercept[Exception] {
      mixed.agg(Td.merge(col("d"))).head
    }
    assert(e2.getMessage != null)
  }

  test("cdf is the inverse of quantile, tail-accurate, exact outside [min, max]") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(11L)
    val values = Array.fill(20000)(math.exp(rnd.nextGaussian()))
    val d = digestOf(values.toSeq)
    val sorted = values.sorted
    for (q <- probes) {
      val v = graft.functions.TdUtil.quantileBytes(d, q)
      val r = graft.functions.TdUtil.cdfBytes(d, v)
      // same tail-weighted contract as the forward probe
      val bound = if (q <= 0.05 || q >= 0.95) 0.01 else 0.03
      assert(math.abs(r - rankOf(sorted, v)) <= bound,
        f"cdf(${v}%.3f) = $r%.4f vs exact ${rankOf(sorted, v)}%.4f (q=$q)")
    }
    assert(graft.functions.TdUtil.cdfBytes(d, sorted.head - 1.0) == 0.0)
    assert(graft.functions.TdUtil.cdfBytes(d, sorted.last) == 1.0)
    // per-row scoring: a column of values against one broadcast digest
    val scored = values.take(100).toSeq.toDF("x")
      .withColumn("pct", Td.cdf(lit(d), col("x")))
      .as[(Double, Double)].collect()
    scored.foreach { case (x, pct) =>
      assert(math.abs(pct - rankOf(sorted, x)) <= 0.03,
        f"per-row cdf of $x%.3f: $pct%.4f vs ${rankOf(sorted, x)}%.4f")
    }
  }
}
