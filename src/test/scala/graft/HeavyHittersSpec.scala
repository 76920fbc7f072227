package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.functions.HeavyHitters

/** Misra-Gries heavy-hitters aggregate: error bounds, exactness on small
  * domains, and partition-order robustness (the merge path). */
class HeavyHittersSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] =
    df.agg(HeavyHitters.heavyHitters(col("w"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("item"), col("e.est_count").as("c"))
      .as[(String, Long)].collect().toMap

  test("exact when distinct items <= k; deterministic output order") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("w")
    val got = df.agg(HeavyHitters.heavyHitters(col("w"), 8).as("hh"))
      .select(col("hh")).head.getAs[scala.collection.Seq[Row]](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got == Seq(("a", 5L), ("b", 3L), ("c", 1L)),
      s"small-domain sketch must be exact and ordered, got $got")
  }

  test("every item above n/(k+1) survives with count in [true - n/(k+1), true]") {
    val rnd = new scala.util.Random(42L)
    // skewed stream: two hot items + a long uniform tail
    val words = Seq.fill(3000)("hot1") ++ Seq.fill(1500)("hot2") ++
      Seq.fill(6000)("t" + rnd.nextInt(2000))
    val n = words.length
    val trueCounts = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val k = 20
    val slack = n.toDouble / (k + 1)
    Seq(1, 7).foreach { parts =>
      val got = sketch(rnd.shuffle(words).toDF("w").repartition(parts), k)
      assert(got.size <= k)
      trueCounts.filter(_._2 > slack).foreach { case (w, c) =>
        assert(got.contains(w), s"hot item $w (count $c > $slack) missing at parts=$parts")
        assert(got(w) <= c, s"$w overestimated: ${got(w)} > $c")
        assert(got(w) >= c - slack, s"$w underestimated past the bound: ${got(w)} < $c - $slack")
      }
      // the bound holds for every reported item, not just the hot ones
      got.foreach { case (w, est) =>
        val c = trueCounts.getOrElse(w, 0L)
        assert(est <= c && est >= c - slack, s"$w: est $est outside [${c - slack}, $c]")
      }
    }
  }

  test("keyProfile: exact stats and hot keys, null keys counted and surfaced") {
    // one mega-key (10k rows) + 2k NULL keys over a tail of 100 keys x 10
    val rows: Seq[String] = Seq.fill(10000)("hot") ++
      Seq.fill[String](2000)(null) ++
      (0 until 100).flatMap(i => Seq.fill(10)("k" + i))
    val prof = operators.Skew.keyProfile(
      new scala.util.Random(3L).shuffle(rows).toDF("w").repartition(5), "w")
      .head
    assert(prof.getAs[Long]("n_rows") == 13000L)
    assert(prof.getAs[Long]("n_keys") == 102L) // null group counts as a key
    assert(prof.getAs[Long]("n_null") == 2000L)
    assert(prof.getAs[Long]("max_n") == 10000L)
    val ratio = prof.getAs[Double]("skew_ratio")
    assert(ratio > 50.0, s"skew ratio $ratio should flag the mega-key")
    assert(prof.getAs[Long]("p50_n") == 10L)
    // hot keys are EXACT and include the null group at its true rank
    val hot = prof.getAs[scala.collection.Seq[Row]]("hot_keys")
    assert(hot.head.getString(0) == "hot" && hot.head.getLong(1) == 10000L,
      s"mega-key not first with exact count: ${hot.take(3)}")
    assert(hot(1).isNullAt(0) && hot(1).getLong(1) == 2000L,
      s"null key group not surfaced second: ${hot.take(3)}")
    // skew_ratio divides by the UNROUNDED average (r7 advice): 249 keys ×1
    // + 1 key ×2 → avg 1.004, ratio 2/1.004 = 1.99 — the pre-rounded avg
    // of 1.0 would report exactly 2.0
    val near = ((0 until 249).map(i => "u" + i) ++ Seq("v", "v")).toDF("w")
    val r2 = operators.Skew.keyProfile(near, "w").head
    assert(r2.getAs[Double]("skew_ratio") == 1.99,
      s"ratio ${r2.getAs[Double]("skew_ratio")} inherited display rounding")
    assert(r2.getAs[Double]("avg_n") == 1.0) // display value stays rounded
  }

  test("per-group sketches and map-side partials on the documents table") {
    // group by lang, sketch the length-bucket distribution — exercises the
    // aggregate through a real grouped plan with partial aggregation
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), (col("n_chars") / 100).cast("int").cast("string").as("w"))
    val got = docs.groupBy("lang")
      .agg(HeavyHitters.heavyHitters(col("w"), 5).as("hh"))
      .select(col("lang"), explode(col("hh")).as("e"))
      .select(col("lang"), col("e.item"), col("e.est_count"))
      .as[(String, String, Long)].collect()
    assert(got.nonEmpty)
    val n = docs.count()
    // every per-lang sketch is bounded and every reported count is a
    // legal underestimate of the exact bucket count
    val exact = docs.groupBy("lang", "w").count()
      .as[(String, String, Long)].collect()
      .map { case (l, w, c) => (l, w) -> c }.toMap
    got.foreach { case (l, w, est) =>
      assert(est >= 1 && est <= exact((l, w)))
    }
    assert(got.groupBy(_._1).values.forall(_.size <= 5))
    // the plan partial-aggregates map-side (ObjectHashAggregate pair)
    val plan = docs.groupBy("lang")
      .agg(HeavyHitters.heavyHitters(col("w"), 5).as("hh"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"heavy_hitters did not plan an object aggregate:\n${plan.take(1200)}")
  }
}
