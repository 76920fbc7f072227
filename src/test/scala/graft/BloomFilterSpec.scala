package graft

import org.apache.spark.sql.functions._
import graft.functions.{Bloom, BloomUtil}

/** Bloom membership sketch: the mergeable-sketch family's membership
  * member, next to HLL (distincts) and Misra-Gries (frequencies).
  * Guarantees under test: NO false negatives ever; false-positive rate
  * near the design fpp; merge = bitwise OR so the result is IDENTICAL
  * under any partitioning (serialization boundary included); and the
  * semi-join-reduction use works end to end on real tables. */
class BloomFilterSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  test("no false negatives; fpp near design; identical bytes under any partitioning") {
    val members = (0 until 5000).map(i => s"member_$i")
    val df = members.toDF("w")
    def build(parts: Int): Array[Byte] =
      df.repartition(parts)
        .agg(Bloom.bloomFilter(col("w"), expectedItems = 5000, fpp = 0.02))
        .head.getAs[Array[Byte]](0)
    val f1 = build(1)
    val f7 = build(7)
    // OR-merge is associative+commutative: partitioning must not change a bit
    assert(java.util.Arrays.equals(f1, f7),
      "filter bytes differ across partitionings — merge is order-sensitive")
    // every member tests positive — a single false negative is a bug, not noise
    val fneg = df.select(Bloom.mightContain(lit(f1), col("w")).as("hit"))
      .filter(!col("hit")).count()
    assert(fneg == 0, s"$fneg false negatives")
    // observed fpp over 20k non-members within 2.5x of design (generous:
    // Kirsch-Mitzenmacher double hashing trades a small constant factor)
    val nonMembers = (0 until 20000).map(i => s"stranger_$i").toDF("w")
    val fpos = nonMembers.select(Bloom.mightContain(lit(f1), col("w")).as("hit"))
      .filter(col("hit")).count()
    val fpr = fpos.toDouble / 20000
    assert(fpr <= 0.05, s"observed fpr $fpr > 2.5x design 0.02")
    assert(fpr > 0.0, "zero false positives at 5k/0.02 is a broken probe " +
      "(filter too large or probe not reading the built bits)")
  }

  test("empty group yields an all-reject filter, not null; nulls ignored") {
    val empty = Seq.empty[String].toDF("w")
      .agg(Bloom.bloomFilter(col("w"), 100, 0.01)).head.getAs[Array[Byte]](0)
    assert(empty != null)
    val hit = Seq("x").toDF("w")
      .select(Bloom.mightContain(lit(empty), col("w"))).head.getBoolean(0)
    assert(!hit, "empty-set filter accepted a value")
    val withNulls = Seq(Some("a"), None, None).toDF("w")
      .agg(Bloom.bloomFilter(col("w"), 10, 0.01)).head.getAs[Array[Byte]](0)
    val a = Seq("a").toDF("w")
      .select(Bloom.mightContain(lit(withNulls), col("w"))).head.getBoolean(0)
    assert(a, "non-null member lost when null rows present")
    // NULL is not a member (self-review fix): bare XxHash64 hashed NULL
    // to its seed, recording a phantom member — pin byte equality with
    // the null-free build, and a NULL probe answering NULL, never true
    val withoutNulls = Seq("a").toDF("w")
      .agg(Bloom.bloomFilter(col("w"), 10, 0.01)).head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(withNulls, withoutNulls),
      "NULL rows changed the filter bytes (phantom member)")
    val nullProbe = Seq(Option.empty[String]).toDF("w")
      .select(Bloom.mightContain(lit(withNulls), col("w"))).head
    assert(nullProbe.isNullAt(0), "NULL probe must answer NULL, not a phantom hit")
  }

  test("semi-join reduction on real tables: filter scan == exact semi join + bounded overshoot") {
    // the 100 TB pattern: bloom of filtered orders keys pre-filters the
    // lineitem scan without shuffling lineitem
    val orders = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
    val li = Tables.lineitem(spark, sf)
    val nKeys = orders.select(countDistinct(col("o_orderkey"))).head.getLong(0)
    val filter = orders
      .agg(Bloom.bloomFilter(col("o_orderkey"), math.max(1L, nKeys), 0.01))
      .head.getAs[Array[Byte]](0)
    val viaBloom = li.filter(Bloom.mightContain(lit(filter), col("l_orderkey"))).count()
    val exact = li.join(orders.select("o_orderkey").distinct(),
      li("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val total = li.count()
    assert(viaBloom >= exact, "bloom dropped true matches (false negative)")
    // overshoot bounded by fpp over the non-matching rows, with slack
    assert(viaBloom - exact <= math.max(20L, ((total - exact) * 0.05).toLong),
      s"bloom passed ${viaBloom - exact} extra rows of ${total - exact} non-matching")
  }

  test("probe stays inside whole-stage codegen (no fallback in the hot path)") {
    val f = Seq("a", "b").toDF("w")
      .agg(Bloom.bloomFilter(col("w"), 10, 0.01)).head.getAs[Array[Byte]](0)
    val plan = Tables.documents(spark, sf)
      .filter(Bloom.mightContain(lit(f), col("doc_id")))
      .queryExecution.executedPlan.toString
    // codegen'd operators render with the `*(stageId)` prefix; a fallback
    // Filter would lose the star
    assert("\\*\\(\\d+\\) Filter bloommightcontain".r.findFirstIn(plan).nonEmpty,
      s"might_contain fell out of codegen:\n${plan.take(1200)}")
  }

  test("SQL surface round-trips with the Column API") {
    val ext = new GraftExtensions
    val s2 = try {
      org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(ext)
        .create()
    } catch { case _: Throwable => null }
    if (s2 != null) {
      import s2.implicits._
      val df = Seq("x", "y", "z").toDF("w")
      df.createOrReplaceTempView("t")
      val viaSql = s2.sql(
        "SELECT graft_bloom_filter(w, 3, 0.01d) AS f FROM t")
        .head.getAs[Array[Byte]](0)
      val viaCol = df.agg(Bloom.bloomFilter(col("w"), 3, 0.01))
        .head.getAs[Array[Byte]](0)
      assert(java.util.Arrays.equals(viaSql, viaCol))
      val probes = s2.sql(
        s"SELECT w, graft_might_contain((SELECT graft_bloom_filter(w, 3, 0.01d) FROM t), w) AS hit " +
          "FROM VALUES ('x'), ('nope') v(w)")
        .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
      assert(probes("x"), "SQL probe missed a member")
      // the NATURAL SQL spellings: a plain fraction parses as a DECIMAL
      // literal (not double — only 0.01d is), and billions of expected
      // items parse as a LONG literal; both must be accepted (the first
      // litDouble/litInt helpers rejected them)
      val natural = s2.sql(
        "SELECT graft_bloom_filter(w, 3000, 0.01) AS f FROM t")
        .head.getAs[Array[Byte]](0)
      assert(natural.length > BloomUtil.HEADER)
      // long literal reaches sizeFor (whose 1 GiB clamp then fires) —
      // the failure message proves the literal was ACCEPTED, not
      // rejected at the litLong boundary; building a billions-sized
      // filter for real is deliberately out of unit-test budget
      val bigLit = intercept[Exception] {
        s2.sql("SELECT graft_bloom_filter(w, 3000000000, 0.01) AS f FROM t")
          .head
      }
      assert(bigLit.getMessage.contains("shard the build"),
        s"long expectedItems literal rejected at the wrong layer: $bigLit")
      // do NOT close s2 (shared SparkContext)
    }
    // guardrails fire regardless of session support
    intercept[IllegalArgumentException] { BloomUtil.sizeFor(0, 0.01) }
    intercept[IllegalArgumentException] { BloomUtil.sizeFor(100, 1.5) }
    intercept[IllegalArgumentException] { BloomUtil.sizeFor(Long.MaxValue / 2, 1e-9) }
    // malformed probe input fails as a named error, not an index crash:
    // the SQL surface lets ANY binary column reach might_contain
    intercept[IllegalArgumentException] {
      BloomUtil.mightContain(Array[Byte](1, 2, 3), 42L)
    }
    intercept[IllegalArgumentException] { // header nWords=0 → mod-zero path
      BloomUtil.mightContain(Array[Byte](0, 0, 0, 1, 0, 0, 0, 0), 42L)
    }
    intercept[IllegalArgumentException] { // header claims more words than bytes
      BloomUtil.mightContain(Array[Byte](0, 0, 0, 1, 0, 0, 0, 9), 42L)
    }
  }
}
