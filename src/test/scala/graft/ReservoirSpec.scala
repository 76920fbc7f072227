package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{Reservoir, ReservoirBuffer, ReservoirUtil}

/** The mergeable distinct sample: a pure function of the value SET —
  * byte-deterministic under any partitioning and insertion order, exactly
  * replayable (the kept set IS the k values with the smallest xxhash64,
  * recomputed independently here), rollup-able, and exact below capacity. */
class ReservoirSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  private def hashOf(s: String): Long =
    graft.functions.ThetaUtil.flip(
      XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L))

  test("kept set == the k smallest-hash values, replayed independently") {
    val vals = (0 until 1000).map(i => s"doc_$i")
    val df = vals.toDF("v")
    val bytes = df.agg(Reservoir.sample(col("v"), 100).as("s"))
      .head.getAs[Array[Byte]]("s")
    val got = ReservoirUtil.valuesOf(bytes).map(_.toString).toSeq
    val want = vals.sortBy(hashOf).take(100)
    assert(got == want, "sample must be the bottom-100 by hash, hash-ordered")
  }

  test("byte-deterministic under partitioning/order; exact below capacity; duplicates collapse") {
    val vals = (0 until 500).map(i => s"v_${i % 200}") // duplicates on purpose
    def bytesOf(df: org.apache.spark.sql.DataFrame): Array[Byte] =
      df.agg(Reservoir.sample(col("v"), 64).as("s")).head.getAs[Array[Byte]]("s")
    val a = bytesOf(vals.toDF("v").repartition(1))
    val b = bytesOf(vals.toDF("v").repartition(13))
    val c = bytesOf(scala.util.Random.shuffle(vals).toDF("v").repartition(7))
    assert(java.util.Arrays.equals(a, b) && java.util.Arrays.equals(b, c),
      "sample bytes must not depend on partitioning or row order")
    // below capacity: 200 distinct < 256 -> the sample IS the distinct set
    val small = bytesOf(vals.toDF("v")) // k=64 < 200, stays a sample
    val full = vals.toDF("v")
      .agg(Reservoir.sample(col("v"), 256).as("s")).head.getAs[Array[Byte]]("s")
    assert(ReservoirUtil.valuesOf(full).map(_.toString).toSet ==
      vals.toSet, "below capacity the sample is exactly the distinct set")
    assert(ReservoirUtil.valuesOf(small).length == 64)
  }

  test("rollup: merge of per-day samples == whole-table sample, byte-for-byte") {
    val df = (0 until 600)
      .map(i => (i % 3, s"item_$i")).toDF("day", "v")
    val whole = df.agg(Reservoir.sample(col("v"), 50).as("s"))
      .head.getAs[Array[Byte]]("s")
    val rolled = df.groupBy("day")
      .agg(Reservoir.sample(col("v"), 50).as("s"))
      .agg(Reservoir.merge(col("s")).as("m"))
      .head.getAs[Array[Byte]]("m")
    assert(java.util.Arrays.equals(whole, rolled),
      "per-day samples must union to the whole-table sample bit-for-bit")
  }

  test("values probe, NULL skipping, and the SQL surface round-trip") {
    val df = Seq(Some("a"), None, Some("b"), Some("a"), None)
      .toDF("v")
    val out = df.agg(Reservoir.values(Reservoir.sample(col("v"), 10)).as("vs"))
      .head.getSeq[String](0)
    assert(out.toSet == Set("a", "b"), s"got $out")

    // extensions-enabled session on the shared context, never closed —
    // the SparkSpec contract, like ThetaSpec/KllSpec
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
    s2.createDataFrame(Seq(Tuple1(Option("a")), Tuple1(None),
      Tuple1(Option("b")), Tuple1(Option("a")))).toDF("v")
      .createOrReplaceTempView("resv_t")
    val sqlOut = s2.sql(
      "SELECT graft_sample_values(graft_sample_sketch(v, 10)) AS vs FROM resv_t")
      .head.getSeq[String](0)
    assert(sqlOut.toSet == Set("a", "b"))
    // ints sample too (cast on the way in), matching the Column API
    val n = s2.sql(
      "SELECT size(graft_sample_values(graft_sample_sketch(id, 5))) FROM range(100)")
      .head.getInt(0)
    assert(n == 5)
  }

  test("weighted sample: kept set == independently replayed top-k by ln(u)/w") {
    val rows = (0 until 400).map(i =>
      (s"d_$i", if (i % 20 == 0) 50.0 else 1.0)) // 20 heavy items
    val df = rows.toDF("v", "w")
    val bytes = df.agg(Reservoir.weighted(col("v"), col("w"), 40).as("s"))
      .head.getAs[Array[Byte]]("s")
    val got = graft.functions.WeightedReservoirUtil.valuesOf(bytes)
      .map(_.toString).toSeq
    // independent replay: same key function, driver-side
    def keyOf(v: String, w: Double): Double =
      graft.functions.WeightedReservoirUtil.keyOf(
        v.getBytes(java.nio.charset.StandardCharsets.UTF_8), w)
    val want = rows.map { case (v, w) => (keyOf(v, w), v) }
      .sortBy(-_._1).take(40).map(_._2)
    assert(got == want, "weighted sample must be the exact A-ES top-k, best-first")
    // weight bias is real: heavy items are 5% of the population but must
    // dominate the sample (each has u^(1/50) vs u — enormously larger keys)
    val heavy = got.count(v => v.stripPrefix("d_").toInt % 20 == 0)
    assert(heavy >= 15, s"only $heavy/20 heavy items sampled in k=40")
  }

  test("weighted sample: byte-determinism, max-weight dedup, and rollup union") {
    // the same value under different weights must compete at its MAX
    // weight, independent of row order or partitioning
    val rows = (0 until 300).map(i => (s"x_${i % 100}", 1.0 + (i % 7))) // dups, varied w
    def bytesOf(df: org.apache.spark.sql.DataFrame): Array[Byte] =
      df.agg(Reservoir.weighted(col("v"), col("w"), 32).as("s"))
        .head.getAs[Array[Byte]]("s")
    val a = bytesOf(rows.toDF("v", "w").repartition(1))
    val b = bytesOf(scala.util.Random.shuffle(rows).toDF("v", "w").repartition(11))
    assert(java.util.Arrays.equals(a, b))
    // rollup: per-part weighted samples union to the whole, byte-for-byte
    val df = rows.zipWithIndex.map { case ((v, w), i) => (i % 3, v, w) }
      .toDF("part", "v", "w")
    val whole = df.agg(Reservoir.weighted(col("v"), col("w"), 32).as("s"))
      .head.getAs[Array[Byte]]("s")
    val rolled = df.groupBy("part")
      .agg(Reservoir.weighted(col("v"), col("w"), 32).as("s"))
      .agg(Reservoir.weightedMerge(col("s")).as("m"))
      .head.getAs[Array[Byte]]("m")
    assert(java.util.Arrays.equals(whole, rolled))
  }

  test("weighted sample: SQL surface and non-positive-weight refusal") {
    val s2 = try {
      spark
      org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .create()
    } catch { case _: Throwable => null }
    assume(s2 != null, "no extensions-enabled session available")
    val n = s2.sql(
      "SELECT size(graft_wsample_values(graft_wsample_sketch(id, 1.0 + id, 7))) " +
        "FROM range(100)").head.getInt(0)
    assert(n == 7)
    val err = intercept[Exception] {
      (1 to 5).map(i => (s"v$i", 0.0)).toDF("v", "w")
        .agg(Reservoir.weighted(col("v"), col("w"), 3)).head
    }
    assert(err.getMessage != null)
    // w = Infinity would make every such value tie at key -0.0 and turn
    // inclusion into byte order — refused like non-positive weights
    intercept[IllegalArgumentException] {
      new graft.functions.WeightedReservoirBuffer(4)
        .add("x".getBytes, Double.PositiveInfinity)
    }
  }

  test("guardrails: k bounds, value-size cap, mixed-k merge, corrupt wire") {
    intercept[IllegalArgumentException] { new ReservoirBuffer(0) }
    intercept[IllegalArgumentException] { new ReservoirBuffer(1 << 17) }
    val buf = new ReservoirBuffer(4)
    intercept[IllegalArgumentException] {
      buf.add(1L, new Array[Byte](ReservoirUtil.MaxValueBytes + 1))
    }
    intercept[IllegalArgumentException] {
      buf.mergeIn(new ReservoirBuffer(8))
    }
    intercept[IllegalArgumentException] {
      ReservoirUtil.fromBytes(Array[Byte](0, 0, 0, 2, 0, 0, 0, 5))
    }
  }
}
