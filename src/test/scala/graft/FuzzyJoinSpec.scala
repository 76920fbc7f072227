package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

/** Edit-distance join: the blocked result must equal the brute-force
  * cross product EXACTLY — the q-gram count filter plus the short-string
  * length-band path claim zero false negatives, and the Levenshtein
  * verify kills the false positives, so set equality is the contract
  * (not recall-bounded like the LSH generators). */
class FuzzyJoinSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  /** Seeded corpus mixing the hard cases: short strings (below q and in
    * the vacuous-bound band), repeated grams, exact duplicates, and
    * mutated variants sitting exactly at / just past the threshold. */
  private def corpus(seed: Long, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val alpha = "abcde" // small alphabet → repeated grams, hash pressure
    def word(len: Int) = (0 until len).map(_ => alpha(rnd.nextInt(5))).mkString
    (0 until n).map { i =>
      val base = word(1 + rnd.nextInt(12))
      val s = rnd.nextInt(4) match {
        case 0 => base
        case 1 => // single substitution somewhere
          if (base.isEmpty) base
          else { val p = rnd.nextInt(base.length)
            base.updated(p, alpha(rnd.nextInt(5))) }
        case 2 => base + word(rnd.nextInt(3)) // insertions at the end
        case _ => base.drop(rnd.nextInt(2)) // deletion at the front
      }
      (i.toLong, s)
    }.filter(_._2.nonEmpty)
  }

  private def brute(df: org.apache.spark.sql.DataFrame, d: Int) =
    df.select(col("id").as("id_a"), col("s").as("s_a"))
      .crossJoin(df.select(col("id").as("id_b"), col("s").as("s_b")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= d)
      .select("id_a", "id_b", "dist")

  test("fuzzyPairs equals the brute-force cross join for d in {1, 2, 3} and q in {2, 3}") {
    val df = corpus(42L, 250).toDF("id", "s").cache()
    try {
      for (d <- Seq(1, 2, 3); q <- Seq(2, 3)) {
        val got = FuzzyJoin.fuzzyPairs(df, "id", "s", d, q)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        val want = brute(df, d)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        assert(got == want,
          s"d=$d q=$q: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
        assert(want.nonEmpty, s"d=$d vacuous corpus — strengthen the generator")
      }
    } finally { df.unpersist(); () }
  }

  test("two-sided join, nulls ignored, d=0 degenerates to exact match") {
    val left = Seq((1L, "kitten"), (2L, "sitting"), (3L, null.asInstanceOf[String]),
      (4L, "x")).toDF("id", "s")
    val right = Seq((10L, "mitten"), (11L, "sitting"), (12L, "y"),
      (13L, null.asInstanceOf[String])).toDF("id", "s")
    val got = FuzzyJoin.fuzzyJoin(left, right, "id", "s", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // kitten↔mitten dist 1; sitting↔sitting dist 0; x↔y dist 1 (short
    // path — both below every gram bound); nulls never pair
    assert(got == Set((1L, 10L, 1), (2L, 11L, 0), (4L, 12L, 1)), got.toString)
    val exact = FuzzyJoin.fuzzyJoin(left, right, "id", "s", maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(exact == Set((2L, 11L, 0)), exact.toString)
    intercept[IllegalArgumentException] {
      FuzzyJoin.fuzzyJoin(left, right, "id", "s", maxDist = -1)
    }
    intercept[IllegalArgumentException] {
      FuzzyJoin.fuzzyJoin(left, right, "id", "s", maxDist = 1, q = 0)
    }
  }

  test("long strings (above the deletion band) still equal brute force at d=1,2 — the prefix path at small d") {
    // 90-char strings: above delMax for both d=1 (64) and d=2 (24), so
    // these pairs route through the PREFIX path even at small d — the
    // band partition must stay complete on both sides of the boundary
    val rnd = new scala.util.Random(11L)
    val seeds = (0 until 6).map(_ =>
      (0 until 90).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    val docs = (0 until 120).map { i =>
      val s = seeds(i % 6)
      val p = rnd.nextInt(s.length)
      (i.toLong, s.updated(p, ('a' + rnd.nextInt(26)).toChar))
    } ++ Seq((500L, "x" * 90), (501L, "x" * 89)) // boundary + repetitive
    val df = docs.toDF("id", "s")
    for (d <- Seq(1, 2)) {
      val got = FuzzyJoin.fuzzyPairs(df, "id", "s", d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = brute(df, d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == want,
        s"d=$d: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
      assert(want.nonEmpty)
    }
  }

  test("ID-like domains (tiny gram diversity) block on deletion variants, not n²") {
    // sequential zero-padded ids — the domain whose ~120 distinct grams
    // defeat ANY gram-frequency blocking (this exact shape filled the
    // disk at the sf10 probe before the deletion band existed)
    val docs = (0 until 4000).map(i => (i.toLong, f"Customer#$i%09d")).toDF("id", "s")
    val got = FuzzyJoin.fuzzyPairs(docs, "id", "s", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = brute(docs, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want && want.nonEmpty,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("Persisted variants read the input through the cache exactly once; the handle frees the blocks") {
    // parquet-backed input so raw-source consultations are countable in
    // the executed plan — this pins the scaladoc's lineage claim as a
    // number instead of a "~"
    val tmp = java.nio.file.Files.createTempDirectory("fuzzy_persist").toString
    corpus(13L, 300).toDF("id", "s").write.parquet(s"$tmp/in")
    val input = ss.read.parquet(s"$tmp/in")

    val plain = FuzzyJoin.fuzzyPairs(input, "id", "s", maxDist = 1)
    val plainRows = plain.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val plainPlan = plain.queryExecution.executedPlan.toString
    val plainScans = "Scan parquet".r.findAllIn(plainPlan).length
    assert(plainScans >= 4,
      s"unpersisted form should consult the raw input repeatedly " +
        s"(the documented hazard), saw $plainScans")
    assert(!plainPlan.contains("InMemoryTableScan"))

    val before = ss.sparkContext.getPersistentRDDs.size
    val (got, handle) = FuzzyJoin.fuzzyPairsPersisted(input, "id", "s", maxDist = 1)
    val gotRows = got.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(gotRows == plainRows)
    val gotPlan = got.queryExecution.executedPlan.toString
    // every consultation goes through the single cache entry; the raw
    // scan appears only INSIDE the InMemoryRelation's build description
    assert(gotPlan.contains("InMemoryTableScan"), gotPlan.take(2000))
    assert(ss.sparkContext.getPersistentRDDs.size > before,
      "the projection must actually be persisted after materialization")
    handle.close()
    assert(ss.sparkContext.getPersistentRDDs.size == before,
      "close() must free the cache entry, not strand it")
    handle.close() // idempotent

    // two-sided persisted form: same rows as the unpersisted two-sided join
    val l2 = corpus(29L, 120).toDF("id", "s")
    val r2 = corpus(31L, 120).toDF("id", "s")
    val want2 = FuzzyJoin.fuzzyJoin(l2, r2, "id", "s", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val (got2, h2) = FuzzyJoin.fuzzyJoinPersisted(l2, r2, "id", "s", maxDist = 1)
    val got2Rows = got2.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    h2.close()
    assert(got2Rows == want2)
  }

  test("the gram path actually prunes: candidate count tracks matches, not n²") {
    // 400 strings in 8 tight clusters of near-duplicates + random tails:
    // the blocked join must verify FAR fewer pairs than 400·399/2
    val rnd = new scala.util.Random(7L)
    val seeds = (0 until 8).map(_ => (0 until 20).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    val docs = (0 until 400).map { i =>
      val s = seeds(i % 8)
      val p = rnd.nextInt(s.length)
      (i.toLong, s.updated(p, ('a' + rnd.nextInt(26)).toChar))
    }.toDF("id", "s")
    val got = FuzzyJoin.fuzzyPairs(docs, "id", "s", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = brute(docs, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
    // every true pair lives inside a cluster: cross-cluster 20-char
    // random seeds are nowhere near distance 2
    assert(want.forall { case (a, b, _) => a % 8 == b % 8 })
  }
}
