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
