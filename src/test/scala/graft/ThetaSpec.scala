package graft

import org.apache.spark.sql.functions._
import graft.functions.{Theta, ThetaUtil}

class ThetaSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  private def sketchOf(ids: org.apache.spark.sql.DataFrame, k: Int = 1024): Array[Byte] =
    ids.agg(Theta.sketch(col("id"), k).as("s"))
      .head.getAs[Array[Byte]]("s")

  test("below capacity the theta sketch is an exact distinct count") {
    val ev = Tables.events(spark, sf)
    val exact = ev.select(countDistinct(col("event_type"))).head.getLong(0)
    val est = ev.agg(
      Theta.estimate(Theta.sketch(col("event_type"), 1024)).as("d"))
      .head.getDouble(0)
    assert(est == exact.toDouble,
      s"under k distinct values the estimate must be exact: $est vs $exact")
  }

  test("distinct estimate lands within the 1/sqrt(k) error band at 20k distincts") {
    val n = 20000L
    val est = ThetaUtil.estimateBytes(sketchOf(spark.range(n).toDF("id")))
    val rel = math.abs(est - n) / n
    assert(rel <= 0.10, f"estimate $est%.0f vs $n: rel err $rel%.4f > 0.10")
  }

  test("rollup union is bit-for-bit: sketch-of-partitions == sketch-of-whole") {
    // KMV's union keeps the k smallest of the merged retained sets, which
    // IS the k smallest of the underlying union — so unlike the t-digest
    // and KLL (order-dependent compaction, bound-equality contracts), the
    // theta rollup can be pinned to BYTE equality, any grouping, any
    // merge order.
    val ids = spark.range(20000).toDF("id")
    val whole = sketchOf(ids)
    val viaRollup = ids
      .withColumn("g", col("id") % 7)
      .groupBy("g").agg(Theta.sketch(col("id"), 1024).as("s"))
      .agg(Theta.merge(col("s")).as("s"))
      .head.getAs[Array[Byte]]("s")
    assert(java.util.Arrays.equals(whole, viaRollup),
      "theta rollup union must be byte-identical to the direct sketch")
  }

  test("intersection and difference estimates hit the sample-scaling bound") {
    // A = [0, 12000), B = [6000, 18000): |A∩B| = 6000, |A\B| = 6000,
    // |B\A| = 6000 — same-magnitude overlap, the regime where
    // HLL-style inclusion-exclusion is already shaky and the direct
    // theta sample count is not
    val a = sketchOf(spark.range(0, 12000).toDF("id"))
    val b = sketchOf(spark.range(6000, 18000).toDF("id"))
    val inter = ThetaUtil.intersectBytes(a, b)
    val diff = ThetaUtil.aNotBBytes(a, b)
    assert(math.abs(inter - 6000) / 6000.0 <= 0.15,
      f"intersection estimate $inter%.0f vs 6000")
    assert(math.abs(diff - 6000) / 6000.0 <= 0.15,
      f"a-not-b estimate $diff%.0f vs 6000")
    // identity and annihilator checks are exact-ish by construction
    assert(ThetaUtil.aNotBBytes(a, a) == 0.0)
    val interSelf = ThetaUtil.intersectBytes(a, a)
    val estA = ThetaUtil.estimateBytes(a)
    assert(math.abs(interSelf - estA) / estA <= 1e-9,
      s"A∩A ($interSelf) must equal est(A) ($estA)")
  }

  test("theta set ops answer the contamination question on the documents table") {
    // the 100 TB use: |crawl ∩ corpus| without a join — here cross-checked
    // against the exact intersection on the small corpus
    val docs = Tables.documents(spark, sf)
    val crawl = docs.filter(col("doc_id") % 3 =!= 0).select(col("text"))
    val corpus = docs.filter(col("doc_id") % 2 === 0).select(col("text"))
    val exact = crawl.intersect(corpus).count().toDouble
    val Array(sa) = crawl.agg(Theta.sketch(col("text"), 4096).as("s"))
      .collect().map(_.getAs[Array[Byte]]("s"))
    val Array(sb) = corpus.agg(Theta.sketch(col("text"), 4096).as("s"))
      .collect().map(_.getAs[Array[Byte]]("s"))
    val est = ThetaUtil.intersectBytes(sa, sb)
    assert(exact > 0, "fixture degenerated: no overlap to estimate")
    assert(math.abs(est - exact) / exact <= 0.15,
      f"doc-overlap estimate $est%.0f vs exact $exact%.0f")
  }

  test("SQL surface: graft_theta_* registered, estimates match the Column API") {
    // SQL functions live in an extensions-enabled session (same shared
    // context, never closed — the SparkSpec contract, like KllSpec)
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
    s2.range(18000).toDF("id").createOrReplaceTempView("theta_ids")
    val viaSql = s2.sql(
      """SELECT graft_theta_estimate(graft_theta_sketch(id, 1024)) AS d
        |FROM theta_ids WHERE id < 12000""".stripMargin).head.getDouble(0)
    val viaCol = ThetaUtil.estimateBytes(
      sketchOf(spark.range(12000).toDF("id")))
    assert(viaSql == viaCol, s"SQL ($viaSql) != Column API ($viaCol)")
    val ops = s2.sql(
      """SELECT graft_theta_intersect(a, b) AS i, graft_theta_anotb(a, b) AS d
        |FROM (SELECT
        |  (SELECT graft_theta_sketch(id, 1024) FROM theta_ids WHERE id < 12000) AS a,
        |  (SELECT graft_theta_sketch(id, 1024) FROM theta_ids WHERE id >= 6000) AS b)
        |""".stripMargin).head
    assert(math.abs(ops.getDouble(0) - 6000) / 6000.0 <= 0.15)
    assert(math.abs(ops.getDouble(1) - 6000) / 6000.0 <= 0.15)
  }

  test("error envelope: estimate within 3/sqrt(k) across k and cardinality grid") {
    // deterministic property sweep (xxhash64 is fixed): for every (k, n)
    // cell the relative error must sit inside 3·RSE = 3/sqrt(k-2) — the
    // three-sigma band of the KMV estimator. Disjoint id ranges per cell
    // so every sketch sees fresh hash draws.
    var offset = 0L
    for (k <- Seq(256, 1024, 4096); n <- Seq(5000L, 20000L, 80000L)) {
      val est = ThetaUtil.estimateBytes(
        sketchOf(spark.range(offset, offset + n).toDF("id"), k))
      val rel = math.abs(est - n) / n
      val bound = 3.0 / math.sqrt(k - 2.0)
      assert(rel <= bound,
        f"k=$k n=$n: rel err $rel%.4f > 3*RSE $bound%.4f (est $est%.0f)")
      offset += n
    }
  }

  test("set-op error scales with 1/sqrt(k) too: intersection sweep over overlap fractions") {
    // |A| = |B| = 20k with overlap fraction f in {0.1, 0.5, 0.9}: the
    // theta intersection is a direct sample count below theta, so its
    // error tracks the SAME 1/sqrt(k) envelope whatever f is — the
    // property HLL inclusion-exclusion loses exactly when f is small.
    val n = 20000L
    for (f <- Seq(0.1, 0.5, 0.9)) {
      val overlap = (n * f).toLong
      val a = sketchOf(spark.range(0, n).toDF("id"), 4096)
      val b = sketchOf(spark.range(n - overlap, 2 * n - overlap).toDF("id"), 4096)
      val est = ThetaUtil.intersectBytes(a, b)
      // union-scaled error bound: the sample is drawn over A∪B
      val union = 2 * n - overlap
      val bound = 3.0 / math.sqrt(4096 - 2.0) * union
      assert(math.abs(est - overlap) <= bound,
        f"f=$f: |A∩B| est $est%.0f vs $overlap (bound ±$bound%.0f)")
    }
  }

  test("NULL is not a value: sketch over a nullable column equals the sketch of its non-null rows") {
    // XxHash64 maps NULL to its seed, so an unguarded wrap would count
    // one phantom distinct per nullable column (and that phantom would
    // "intersect" across unrelated columns) — the wrappers null out
    // before hashing instead (self-review fix). BYTE equality, the
    // strongest form of the claim.
    val df = spark.range(1000).toDF("id")
      .withColumn("v", when(col("id") % 3 === 0, lit(null)).otherwise(col("id")))
    val withNulls = df.agg(Theta.sketch(col("v"), 1024).as("s"))
      .head.getAs[Array[Byte]]("s")
    val withoutNulls = df.filter(col("v").isNotNull)
      .agg(Theta.sketch(col("v"), 1024).as("s")).head.getAs[Array[Byte]]("s")
    assert(java.util.Arrays.equals(withNulls, withoutNulls),
      "NULLs must not contribute a phantom hash")
    assert(ThetaUtil.estimateBytes(withNulls) ==
      df.filter(col("v").isNotNull).select(countDistinct("v"))
        .head.getLong(0).toDouble)
  }

  test("guardrails: degenerate k and mixed-k set ops are refused") {
    intercept[IllegalArgumentException] { new graft.functions.ThetaBuffer(4) }
    val a = sketchOf(spark.range(5000).toDF("id"), k = 1024)
    val b = sketchOf(spark.range(5000).toDF("id"), k = 2048)
    intercept[IllegalArgumentException] { ThetaUtil.intersectBytes(a, b) }
  }
}
