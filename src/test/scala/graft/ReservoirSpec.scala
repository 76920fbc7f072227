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
