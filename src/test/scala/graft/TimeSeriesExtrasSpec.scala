package graft

import org.apache.spark.sql.functions._
import graft.operators._

class TimeSeriesExtrasSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  test("ewma follows the recurrence with per-key reset, any partitioning") {
    val df = Seq((1, 1L, 10.0), (1, 2L, 20.0), (1, 3L, 30.0),
                 (2, 1L, 100.0), (2, 2L, 0.0)).toDF("k", "t", "v")
      .repartition(5) // scrambled input partitioning
    val got = TimeSeriesOps.ewma(df, "k", Seq("t"), "v", alpha = 0.5)
      .select("k", "t", "ewma").as[(Int, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1, 1L)) == 10.0)
    assert(got((1, 2L)) == 15.0)
    assert(got((1, 3L)) == 22.5)
    assert(got((2, 1L)) == 100.0)
    assert(got((2, 2L)) == 50.0)
  }

  test("cusum accumulates drift above target+slack, floors at zero") {
    val df = Seq((1, 1L, 10.0), (1, 2L, 10.0), (1, 3L, 25.0), (1, 4L, 25.0))
      .toDF("k", "t", "v")
    val got = TimeSeriesOps.cusum(df, "k", Seq("t"), "v", target = 10.0, slack = 2.0)
      .select("t", "cusum").as[(Long, Double)].collect().toMap
    assert(got(1L) == 0.0)   // max(0, 10-12)
    assert(got(2L) == 0.0)
    assert(got(3L) == 13.0)  // 0 + 25-12
    assert(got(4L) == 26.0)  // 13 + 25-12
  }

  test("kalman1d replays the exact driver-side fold and resets per key") {
    val vals = Seq(10.0, 12.0, 9.5, 14.0, 11.0, 10.5, 13.0)
    val df = (vals.zipWithIndex.map { case (v, i) => (1, i.toLong, v) } ++
      Seq((2, 0L, 100.0), (2, 1L, 90.0))).toDF("k", "t", "v")
      .repartition(4)
    val (q, r) = (0.05, 1.0)
    val got = TimeSeriesOps.kalman1d(df, "k", Seq("t"), "v", q, r)
      .select("k", "t", "kalman", "kalman_p")
      .as[(Int, Long, Double, Double)].collect()
      .map(x => (x._1, x._2) -> (x._3, x._4)).toMap
    // driver replay of the identical recurrence
    var st = (vals.head, r)
    assert(got((1, 0L)) == st)
    vals.tail.zipWithIndex.foreach { case (z, i) =>
      val pPred = st._2 + q
      val kGain = pPred / (pPred + r)
      st = (st._1 + kGain * (z - st._1), (1.0 - kGain) * pPred)
      assert(got((1, i.toLong + 1)) == st, s"row ${i + 1}")
    }
    // per-key reset: key 2 starts fresh from its own first observation
    assert(got((2, 0L)) == ((100.0, r)))
  }

  test("kalman1d posterior variance converges to the steady state q/r implies") {
    val (q, r) = (0.05, 1.0)
    val n = 300
    val df = (0 until n).map(i => (1, i.toLong, math.sin(i * 0.1) * 5))
      .toDF("k", "t", "v")
    val pLast = TimeSeriesOps.kalman1d(df, "k", Seq("t"), "v", q, r)
      .filter(col("t") === (n - 1)).select("kalman_p").as[Double].head()
    // fixed point of P = (1-K)(P+q): P* = (-q + sqrt(q^2 + 4qr)) / 2
    val pStar = (-q + math.sqrt(q * q + 4 * q * r)) / 2
    assert(math.abs(pLast - pStar) < 1e-9, s"p=$pLast vs P*=$pStar")
    // constant series: the estimate pins to the constant
    val const = (0 until 50).map(i => (1, i.toLong, 7.25)).toDF("k", "t", "v")
    val xs = TimeSeriesOps.kalman1d(const, "k", Seq("t"), "v", q, r)
      .select("kalman").as[Double].collect()
    assert(xs.forall(_ == 7.25))
  }

  test("walk-forward folds respect causality and cover every row") {
    val ev = Tables.events(spark, sf)
      .withColumn("us", unix_micros(col("ts")))
    val n = 5
    val folded = TimeSeriesOps.walkForwardFolds(ev, "us", n)
    assert(folded.count() == ev.count(), "folds must cover every row")
    val range = folded.agg(min("fold"), max("fold")).head
    assert(range.getInt(0) == 1 && range.getInt(1) == n)
    // equal-mass within sketch error: no fold under half the fair share
    val sizes = folded.groupBy("fold").count()
      .select("count").as[Long].collect()
    assert(sizes.min > ev.count() / n / 2, s"degenerate fold: ${sizes.toSeq}")
    // causality at every step: max(train time) <= min(test time)
    for (i <- 1 until n) {
      val (train, test) = TimeSeriesOps.walkForwardSplit(folded, i)
      val tMax = train.agg(max("us")).head.getLong(0)
      val tMin = test.agg(min("us")).head.getLong(0)
      assert(tMax <= tMin, s"fold $i leaks: train max $tMax > test min $tMin")
      assert(train.count() + (i + 1 to n).map(j =>
        folded.filter(col("fold") === j).count()).sum == ev.count())
    }
    intercept[IllegalArgumentException] {
      TimeSeriesOps.walkForwardFolds(folded, "us", 3) // 'fold' collision
    }
    // step with no test fold is refused (metadata-carried nFolds), not a
    // silent empty evaluation
    intercept[IllegalArgumentException] {
      TimeSeriesOps.walkForwardSplit(folded, n)
    }
  }

  test("walk-forward edge contracts: concentrated times refused, NULL times excluded") {
    // 70% of rows share one timestamp -> duplicate quantile cuts ->
    // intermediate folds would be silently empty; must refuse
    val ties = ((1 to 700).map(_ => (1, 50L)) ++
      (1 to 300).map(i => (1, 1000L + i))).toDF("k", "us")
    val err = intercept[IllegalArgumentException] {
      TimeSeriesOps.walkForwardFolds(ties, "us", 5)
    }
    assert(err.getMessage.contains("concentrated"))
    // NULL time -> NULL fold, excluded from every split (never fold 1)
    val withNull = (Seq(Some(1L), Some(2L), Some(3L), Some(4L), None))
      .map(t => (1, t)).toDF("k", "us")
    val folded = TimeSeriesOps.walkForwardFolds(withNull, "us", 2)
    assert(folded.filter(col("fold").isNull).count() == 1)
    val (train, test) = TimeSeriesOps.walkForwardSplit(folded, 1)
    assert(train.filter(col("us").isNull).count() == 0)
    assert(test.filter(col("us").isNull).count() == 0)
    assert(train.count() + test.count() == 4)
  }

  test("interpolate fills gaps time-weighted, leaves edges null") {
    val df = Seq(
      (1, 0L, Some(0.0)), (1, 10L, None), (1, 40L, Some(4.0)), (1, 50L, None)
    ).toDF("k", "ts_us", "v")
    val got = TimeSeriesOps.interpolate(df, "k", "ts_us", Seq("ts_us"), "v")
      .select("ts_us", "v_interp").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(0L) == Some(0.0))
    assert(got(10L) == Some(1.0)) // 0 + (4-0) * 10/40
    assert(got(40L) == Some(4.0))
    assert(got(50L) == None) // no following observation
  }

  test("outliers flags only |z| above threshold") {
    val vals = Seq.fill(20)(10.0) :+ 100.0
    val df = vals.zipWithIndex.map { case (v, i) => (1, i.toLong, v) }.toDF("k", "t", "v")
    val got = TimeSeriesOps.outliers(df, "k", "v", threshold = 2.0)
    assert(got.count() == 1)
    assert(got.head.getDouble(got.head.fieldIndex("v")) == 100.0)
  }

  test("diff and pct_change") {
    val df = Seq((1, 1L, 10.0), (1, 2L, 15.0)).toDF("k", "t", "v")
    val r = TimeSeriesOps.diff(df, "k", Seq("t"), "v")
      .filter(col("t") === 2).head
    assert(r.getDouble(r.fieldIndex("diff")) == 5.0)
    assert(r.getDouble(r.fieldIndex("pct_change")) == 0.5)
  }

  test("semi/anti relational query returns consistent counts") {
    val df = operators.Relational.qSemiAnti(spark, sf)
    df.collect().foreach { r =>
      val withOrders = r.getLong(r.fieldIndex("n_with_orders"))
      val noBig = if (r.isNullAt(r.fieldIndex("n_no_big"))) 0L
        else r.getLong(r.fieldIndex("n_no_big"))
      assert(noBig <= withOrders)
    }
  }
}
