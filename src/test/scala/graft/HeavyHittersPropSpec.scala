package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.HeavyHittersAgg

/** Randomized property tests for the Misra-Gries aggregate, driven
  * through the raw buffer API (update/merge/serialize/deserialize) — no
  * Spark jobs, so hundreds of random streams and arbitrary partition
  * splits are cheap, including the serialization boundary partial
  * aggregation crosses. Seeded: every run executes the same cases.
  */
class HeavyHittersPropSpec extends AnyFunSuite {

  private def runSketch(k: Int, parts: Seq[Seq[String]]): Map[String, Long] = {
    val agg = HeavyHittersAgg(BoundReference(0, StringType, nullable = true), k)
    val row = new GenericInternalRow(1)
    val partials = parts.map { p =>
      val buf = agg.createAggregationBuffer()
      p.foreach { w =>
        row.update(0, UTF8String.fromString(w))
        agg.update(buf, row)
      }
      // round-trip through the wire format partial aggregation uses
      agg.deserialize(agg.serialize(buf))
    }
    val merged = partials.reduceLeft(agg.merge)
    import scala.jdk.CollectionConverters._
    merged.asScala.map { case (item, c) => item.toString -> c }.toMap
  }

  private def randomStream(rnd: scala.util.Random): List[String] = {
    val alpha = 2 + rnd.nextInt(11)
    val len = 1 + rnd.nextInt(400)
    // zipf-ish skew half the time so hot items actually arise
    val skewed = rnd.nextBoolean()
    List.fill(len) {
      val i = if (skewed) math.min(alpha - 1, (alpha * math.pow(rnd.nextDouble(), 2)).toInt)
              else rnd.nextInt(alpha)
      "w" + i
    }
  }

  private def split(words: List[String], nParts: Int): Seq[Seq[String]] =
    words.grouped(math.max(1, words.length / nParts)).toSeq

  test("MG bound holds for every item under 300 random streams, splits, and k") {
    val rnd = new scala.util.Random(20260813L)
    (1 to 300).foreach { case_ =>
      val words = randomStream(rnd)
      val k = 1 + rnd.nextInt(8)
      val parts = split(words, 1 + rnd.nextInt(5))
      val sketch = runSketch(k, parts)
      val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val slack = words.length.toDouble / (k + 1)
      assert(sketch.size <= k, s"case $case_: ${sketch.size} > k=$k")
      // every reported count is a legal underestimate within the bound
      sketch.foreach { case (w, est) =>
        val c = exact.getOrElse(w, 0L)
        assert(est <= c, s"case $case_: $w overestimated: $est > $c")
        assert(est >= c - slack, s"case $case_: $w below bound: $est < $c - $slack")
      }
      // every true heavy hitter survives
      exact.filter(_._2 > slack).foreach { case (w, c) =>
        assert(sketch.contains(w), s"case $case_: heavy $w (count $c > $slack) lost")
      }
    }
  }

  test("exact when the domain fits in k, regardless of split") {
    val rnd = new scala.util.Random(99L)
    (1 to 100).foreach { case_ =>
      val words = randomStream(rnd)
      val parts = split(words, 1 + rnd.nextInt(5))
      val sketch = runSketch(words.distinct.size, parts)
      val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(sketch == exact,
        s"case $case_: small-domain sketch must be the exact count map")
    }
  }
}
