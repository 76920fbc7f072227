package graft

import org.apache.spark.sql.functions._

/** Contract of the scale-up generator (tools/GenScale): entity-wise
  * replication with preserved intra-copy structure and decorrelated
  * cross-copy content — the properties the SCALING probe's honesty
  * rests on (a naive verbatim copy would make every doc's dup-cluster
  * grow with the scale factor and the banded joins superlinear BY
  * CONSTRUCTION, not by engine defect).
  */
class GenScaleSpec extends SparkSpec {

  private lazy val scaled = tools.GenScale.scaled(spark, sf, factor = 2)

  test("genscale: entity counts scale by factor; dims stay fixed") {
    assert(scaled("lineitem").count() == 2 * Tables.lineitem(spark, sf).count())
    assert(scaled("events").count() == 2 * Tables.events(spark, sf).count())
    assert(scaled("documents").count() == 2 * Tables.documents(spark, sf).count())
    assert(scaled("region").count() == Tables.region(spark, sf).count())
    assert(scaled("nation").count() == Tables.nation(spark, sf).count())
    // keys stay unique — disjoint per-copy ranges
    assert(scaled("orders").select("o_orderkey").distinct().count() ==
      scaled("orders").count())
    // trajectory axis: 2× user_ids, same per-trajectory length profile
    val perUser = scaled("events").groupBy("user_id").count()
    val srcPerUser = Tables.events(spark, sf).groupBy("user_id").count()
    assert(perUser.count() == 2 * srcPerUser.count())
    assert(perUser.agg(max("count")).head().getLong(0) ==
      srcPerUser.agg(max("count")).head().getLong(0))
  }

  test("genscale: table filter writes only the named tables (the r16 documents-only 5M-doc corpus)") {
    val tmp = java.nio.file.Files.createTempDirectory("genscale_only").toString
    tools.GenScale.generate(spark, sf, tmp, factor = 2,
      only = Set("documents", "embeddings"))
    val written = new java.io.File(tmp).listFiles().map(_.getName).toSet
    assert(written == Set("documents.parquet", "embeddings.parquet"),
      s"filter leaked tables: $written")
    assert(spark.read.parquet(s"$tmp/documents.parquet").count() ==
      2 * Tables.documents(spark, sf).count(),
      "filtered generation must still scale the selected table")
  }

  test("genscale: FK integrity per copy (lineitem -> orders, orders -> customer)") {
    assert(scaled("lineitem").join(scaled("orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count() == 0)
    assert(scaled("orders").join(scaled("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count() == 0)
  }

  test("genscale: duplicate-rate invariance — dup surplus scales linearly, cross-copy similarity collapses") {
    val src = Tables.documents(spark, sf)
    val dst = scaled("documents")
    // exact-dup surplus (rows minus distinct texts) must scale by exactly
    // the factor: the cipher is a bijection on chars, so intra-copy text
    // equality is preserved and no NEW cross-copy duplicates appear
    val srcSurplus = src.count() - src.select("text").distinct().count()
    val dstSurplus = dst.count() - dst.select("text").distinct().count()
    assert(dstSurplus == 2 * srcSurplus,
      s"dup surplus $dstSurplus != 2 * $srcSurplus")
    // the cipher preserves length (n_chars column stays truthful)
    assert(dst.filter(length(col("text")) =!= col("n_chars")).count() == 0)
    // cross-copy token decorrelation: a copy-1 doc shares (almost) no
    // token hashes with its copy-0 source beyond whitespace/punct noise
    val docB = src.agg(max("doc_id")).head().getLong(0)
    var b = 1L; while (b <= docB) b *= 10
    val base = b
    val toks = dst.select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val pairs = toks.filter(col("doc_id") < base).as("a")
      .join(toks.filter(col("doc_id") >= base)
        .withColumn("doc_id", col("doc_id") - base).as("b"),
        Seq("doc_id", "tok"))
    val total = toks.filter(col("doc_id") < base).count()
    val shared = pairs.count()
    assert(shared.toDouble / total < 0.05,
      s"cross-copy token overlap $shared/$total — cipher not decorrelating")
  }

  test("genscale r10: cipher targets are per-class bijections, pairwise distinct across 200 copies") {
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val targets = (0 until 200).map(tools.GenScale.cipherTarget)
    // copy 0 is the identity — the bit-identical-copy-0 contract
    assert(targets(0) == lower + lower.toUpperCase + "0123456789")
    targets.foreach { t =>
      assert(t.length == 62)
      // each class permutes within itself (token shape preserved)
      assert(t.substring(0, 26).sorted == lower)
      assert(t.substring(26, 52).sorted == lower.toUpperCase)
      assert(t.substring(52).sorted == "0123456789")
    }
    // the r9 rotation cipher had period 26: copies i and i+26 shared all
    // letter mappings, so factor=100 would hand every doc ~3 fake
    // near-twins. Seeded permutations must have no such period.
    assert(targets.distinct.size == 200, "cipher collision across copies")
  }

  test("genscale r10: decorrelation survives the old rotation periods (copy 26 text, copy dim embeddings)") {
    // factor 65 reaches both failure modes of the r9 scheme: letter
    // rotation period 26 (copy 26) and embedding rotation period dim=64
    // (copy 64 was copy 0 verbatim)
    val big = tools.GenScale.scaled(spark, sf, factor = 65)

    val src = Tables.documents(spark, sf)
    val docB = src.agg(max("doc_id")).head().getLong(0)
    var b = 1L; while (b <= docB) b *= 10
    val base = b
    val toks = big("documents")
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val copy0 = toks.filter(col("doc_id") < base)
    val copy26 = toks
      .filter(col("doc_id") >= lit(26L * base) && col("doc_id") < lit(27L * base))
      .withColumn("doc_id", col("doc_id") - lit(26L * base))
    val shared = copy0.as("a").join(copy26.as("b"), Seq("doc_id", "tok")).count()
    val total = copy0.count()
    assert(shared.toDouble / total < 0.05,
      s"copy-26 token overlap $shared/$total — permutation cipher not decorrelating")

    val srcE = Tables.embeddings(spark, sf)
    val dim = srcE.select(size(col("embedding"))).head().getInt(0)
    assert(dim == 64, s"test assumes the testdata dim (update copy index if it changes): $dim")
    val vecB = srcE.agg(max("vec_id")).head().getLong(0)
    var vb = 1L; while (vb <= vecB) vb *= 10
    val e0 = big("embeddings").filter(col("vec_id") < vb)
      .select(col("vec_id").as("k"), col("embedding").as("e0"))
    val e64 = big("embeddings")
      .filter(col("vec_id") >= lit(64L * vb) && col("vec_id") < lit(65L * vb))
      .select((col("vec_id") - lit(64L * vb)).as("k"), col("embedding").as("e64"))
    val joined = e0.join(e64, "k")
    // under the r9 scheme copy 64's rotation was (64*7) mod 64 = 0 —
    // verbatim copies, exact twins for dedup_embed. Sign flips must break
    // that while preserving the norm exactly (same summation order here:
    // rotation is 0, flips are ±1 in float)
    assert(joined.filter(col("e0") === col("e64")).count() == 0,
      "copy 64 embeddings identical to copy 0 — rotation period not removed")
    val norm = (c: String) => aggregate(col(c), lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    val drift = joined.select(max(abs(norm("e0") - norm("e64")))).head().getDouble(0)
    assert(drift == 0.0, s"sign flip changed a norm by $drift")
  }

  test("genscale: embedding rotation preserves norms and intra-copy geometry") {
    val src = Tables.embeddings(spark, sf)
    val vecB = src.agg(max("vec_id")).head().getLong(0)
    var b = 1L; while (b <= vecB) b *= 10
    val base = b
    val dst = scaled("embeddings")
    val norm = aggregate(col("embedding"), lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    val byCopy = dst.select(pmod(col("vec_id"), lit(base)).as("k"),
        (col("vec_id") >= base).as("copy1"), norm.as("n2"))
      .groupBy("k").pivot("copy1", Seq(false, true)).agg(first("n2"))
    // rotation is orthogonal: per-vector norm identical across copies
    val drift = byCopy.select(max(abs(col("false") - col("true")))).head().getDouble(0)
    assert(drift < 1e-6, s"norm drift $drift")
  }
}
