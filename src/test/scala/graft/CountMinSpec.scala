package graft

import org.apache.spark.sql.functions._
import graft.functions.{Cms, CmsUtil}

/** Count-Min sketch: one-sidedness and the ε·n bound on seeded data,
  * partition-invariant bytes (sum-merge is order-free and the layout
  * fixed), the rollup path (per-day sketches unioned == whole-table
  * sketch, bit for bit), real-table estimates vs exact counts, the
  * serialization boundary (partial aggregation crosses it), SQL parity,
  * and the malformed-input guardrails. */
class CountMinSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def sketchBytes(df: DataFrame, c: String, depth: Int = 4,
                          width: Int = 2048): Array[Byte] =
    df.agg(Cms.sketch(col(c), depth, width).as("sk"))
      .head.getAs[Array[Byte]]("sk")

  test("join-size estimate: never under-counts, lands inside the inner-product bound") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(7L)
    // two skewed multisets over an overlapping key domain
    val a = (1 to 3000).map(_ => s"k${rnd.nextInt(rnd.nextInt(80) + 1)}")
    val b = (1 to 2000).map(_ => s"k${rnd.nextInt(rnd.nextInt(120) + 1)}")
    val fa = a.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fb = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val trueJoin = fa.map { case (k, n) => n * fb.getOrElse(k, 0L) }.sum
    val (depth, width) = (5, 512)
    val ska = sketchBytes(a.toDF("k"), "k", depth, width)
    val skb = sketchBytes(b.toDF("k"), "k", depth, width)
    val est = CmsUtil.joinSizeBytes(ska, skb)
    assert(est >= trueJoin, s"join-size undercounted: $est < $trueJoin")
    val bound = trueJoin + math.E / width * a.size.toDouble * b.size.toDouble
    assert(est <= bound, s"join-size over bound: $est > $bound")
    // the exact join count agrees with the driver-side truth (sanity on
    // the oracle itself)
    val exact = a.toDF("k").join(b.toDF("k"), "k").count()
    assert(exact == trueJoin)
    // Column + SQL surfaces agree with the util
    val viaCol = ss.range(1)
      .select(Cms.joinSize(lit(ska), lit(skb)).as("j")).head.getDouble(0)
    assert(viaCol == est)
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
    s2.createDataset(a)(org.apache.spark.sql.Encoders.STRING).toDF("k")
      .createOrReplaceTempView("cms_js_a")
    val viaSql = s2.sql(
      s"""SELECT graft_cms_join_size(
         |  (SELECT graft_cms_sketch(k, $depth, $width) FROM cms_js_a),
         |  (SELECT graft_cms_sketch(k, $depth, $width) FROM cms_js_a)) AS j
         |""".stripMargin).head.getDouble(0)
    // self-join size of A, via pure SQL: never under the true Σ f²
    val selfTrue = fa.values.map(n => n * n).sum.toDouble
    assert(viaSql >= selfTrue && viaSql <= selfTrue +
      math.E / width * a.size.toDouble * a.size.toDouble)
    // dimension mismatch is refused
    intercept[IllegalArgumentException] {
      CmsUtil.joinSizeBytes(ska, sketchBytes(b.toDF("k"), "k", 4, 256))
    }
  }

  test("one-sided with the eps*n additive bound on seeded skewed data") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(42L)
    // zipf-ish: key k with frequency ~ 1/k over 2000 draws, 100 keys
    val draws = (1 to 2000).map { _ =>
      var k = 1
      while (k < 100 && rnd.nextDouble() > 0.5) k += 1
      s"key$k"
    }
    val df = draws.toDF("k")
    val truth = draws.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val depth = 4; val width = 256 // eps = e/256 ~ 1.06% of n=2000 -> ~21
    val sk = sketchBytes(df, "k", depth, width)
    val epsN = math.ceil(math.E / width * draws.size).toLong
    truth.foreach { case (k, n) =>
      val est = df.sparkSession.range(1)
        .select(Cms.estimate(lit(sk), lit(k)).as("e")).head.getLong(0)
      assert(est >= n, s"$k undercounted: $est < $n (CM is one-sided)")
      assert(est <= n + epsN, s"$k over bound: $est > $n + $epsN")
    }
  }

  test("sketch bytes are partition-invariant and survive partial merge") {
    val docs = Tables.documents(spark, sf).select("lang")
    val a = sketchBytes(docs.repartition(1), "lang")
    val b = sketchBytes(docs.repartition(7), "lang")
    assert(java.util.Arrays.equals(a, b),
      "partitioning changed the sketch bytes — sum-merge should be order-free")
  }

  test("rollup: per-day sketches unioned == whole-table sketch, estimates exact") {
    val ev = Tables.events(spark, sf)
      .withColumn("day", to_date(col("ts")))
    val daily = ev.groupBy(col("day"))
      .agg(Cms.sketch(col("event_type")).as("sk"))
    val rolled = daily.agg(Cms.merge(col("sk")).as("sk"))
      .head.getAs[Array[Byte]]("sk")
    val whole = sketchBytes(ev, "event_type")
    assert(java.util.Arrays.equals(rolled, whole),
      "daily-sketch union != whole-table sketch")
    // default width 2048 >> a handful of event types: estimates exact
    val truth = ev.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (t, n) =>
      val est = spark.range(1)
        .select(Cms.estimate(lit(rolled), lit(t)).as("e")).head.getLong(0)
      assert(est == n, s"$t: est $est != exact $n at collision-free width")
    }
    // merge of an empty group is null, not a crash
    assert(daily.filter(lit(false)).agg(Cms.merge(col("sk"))).head.isNullAt(0))
  }

  test("SQL surface round-trips the Column API") {
    val s2 = try {
      org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .create()
    } catch { case _: Throwable => null }
    assume(s2 != null, "no extensions-enabled session available")
    import s2.implicits._
    Seq("a", "b", "a", "c", "a").toDF("k").createOrReplaceTempView("cms_t")
    val viaSql = s2.sql(
      "SELECT graft_cms_sketch(k, 4, 64) AS sk FROM cms_t")
      .head.getAs[Array[Byte]](0)
    val viaCol = s2.table("cms_t").agg(Cms.sketch(col("k"), 4, 64).as("sk"))
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(viaSql, viaCol))
    val est = s2.sql(
      "SELECT graft_cms_estimate((SELECT graft_cms_sketch(k, 4, 64) FROM cms_t), 'a') AS e")
      .head.getLong(0)
    assert(est == 3L)
    val merged = s2.sql(
      "SELECT graft_cms_estimate(graft_cms_merge(sk), 'a') AS e FROM " +
        "(SELECT graft_cms_sketch(k, 4, 64) AS sk FROM cms_t GROUP BY k)")
      .head.getLong(0)
    assert(merged == 3L)
  }

  test("NULL keys are skipped, not counted as a phantom value") {
    // self-review fix: bare XxHash64 hashed NULL to its seed, so a
    // mostly-NULL column reported the phantom as a heavy value — pin
    // byte equality with the null-free build and a NULL probe -> NULL
    val ss = spark
    import ss.implicits._
    val withNulls = Seq(Some("a"), Some("a"), None, None, None).toDF("k")
      .agg(Cms.sketch(col("k"), 4, 64)).head.getAs[Array[Byte]](0)
    val withoutNulls = Seq("a", "a").toDF("k")
      .agg(Cms.sketch(col("k"), 4, 64)).head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(withNulls, withoutNulls),
      "NULL rows changed the sketch bytes (phantom value)")
    val nullProbe = Seq(Option.empty[String]).toDF("k")
      .select(Cms.estimate(lit(withNulls), col("k"))).head
    assert(nullProbe.isNullAt(0), "NULL probe must answer NULL")
  }

  test("malformed input fails as a named error; sizing helper bounds") {
    intercept[IllegalArgumentException] {
      CmsUtil.estimateBytes(Array[Byte](1, 2, 3), 42L)
    }
    intercept[IllegalArgumentException] { // header claims the wrong length
      CmsUtil.estimateBytes(Array[Byte](0, 0, 0, 2, 0, 0, 0, 9), 42L)
    }
    // dims mismatch on union is a named error, not silent corruption
    val ss = spark
    import ss.implicits._
    val mixed = Seq(
      CmsUtil.toBytes(new Array[Long](4 * 64), 4, 64),
      CmsUtil.toBytes(new Array[Long](4 * 32), 4, 32)).toDF("sk")
    val ex = intercept[Exception] {
      mixed.coalesce(1).agg(Cms.merge(col("sk"))).head
    }
    assert(ex.getMessage != null)
    intercept[IllegalArgumentException] { CmsUtil.sizeFor(0.0, 0.01) }
    intercept[IllegalArgumentException] { CmsUtil.sizeFor(1e-9, 0.01) }
    val (d, w) = CmsUtil.sizeFor(0.01, 0.05)
    assert(d == 3 && w == math.ceil(math.E / 0.01).toInt)
  }
}
