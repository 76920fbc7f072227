package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Int8 embedding quantization: error bounds and search quality. */
class QuantizationSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  test("quantization error is bounded by q_scale/2 per element; zero vectors safe") {
    val rnd = new scala.util.Random(7L)
    val rows = (1L to 50L).map(id =>
      (id, Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat).toSeq)) :+
      (99L, Seq.fill(16)(0.0f))
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.quantizeEmbeddings(df).collect()
    got.foreach { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding")
      val q = r.getAs[scala.collection.Seq[Byte]]("q_emb")
      val s = r.getAs[Double]("q_scale")
      assert(q.length == v.length)
      if (s == 0.0) {
        assert(v.forall(_ == 0.0f) && q.forall(_ == 0))
      } else {
        assert(q.forall(b => b >= -127 && b <= 127))
        v.zip(q).foreach { case (x, b) =>
          assert(math.abs(x - b * s) <= s / 2 + 1e-9,
            s"vec ${r.getLong(0)}: |$x - $b*$s| > scale/2")
        }
      }
      // q_norm matches the integer L2 norm of the quantized vector
      val n = math.sqrt(q.map(b => b.toLong * b.toLong).sum.toDouble)
      assert(math.abs(r.getAs[Double]("q_norm") - n) < 1e-12)
    }
  }

  test("quantized cosine tracks exact cosine; quantized top-k recall vs exact") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 10)
    val k = 5
    val exact = Similarity.annTopK(emb, queries, k)
      .select("q_id", "c_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val qc = Similarity.quantizeEmbeddings(emb)
    val approx = Similarity.annTopKQuantized(qc, qc.filter(col("vec_id") < 10), k)
    // per-pair cosine agreement: join quantized scores to exact scores
    val qcos = approx.select(col("q_id"), col("c_id"), col("cos").as("qcos"))
    val ecos = Similarity.annTopK(emb, queries, k)
      .select(col("q_id"), col("c_id"), col("cos").as("ecos"))
    val drift = qcos.join(ecos, Seq("q_id", "c_id"))
      .select(max(abs(col("qcos") - col("ecos")))).head.getDouble(0)
    assert(drift <= 0.02, s"quantized cosine drifts $drift > 0.02 from exact")
    // recall of the quantized top-k against the exact top-k
    val got = approx.select("q_id", "c_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (qid, want) =>
      (got.getOrElse(qid, Set.empty) & want).size.toDouble / want.size
    }
    val recall = recalls.sum / recalls.size
    assert(recall >= 0.8, s"quantized recall $recall < 0.8")
  }

  test("PQ: m-byte codes, deterministic encoding, ADC top-k recall vs exact L2") {
    val emb = Tables.embeddings(spark, sf)
    val dim = 64; val m = 8; val ks = 16; val k = 10
    val books = Similarity.pqCodebooks(emb, dim, m, ks)
    assert(books.length == m && books.forall(_.length == ks) &&
           books.forall(_.forall(_.length == dim / m)))
    val codes = Similarity.pqEncode(emb, dim, books)
    val codeRows = codes.collect()
    codeRows.foreach { r =>
      val c = r.getAs[scala.collection.Seq[Byte]]("pq_code")
      assert(c.length == m && c.forall(b => b >= 0 && b < ks))
    }
    // deterministic across partitionings (pinned codebooks + strict-< argmin)
    val again = Similarity.pqEncode(emb.repartition(7), dim, books).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Byte]]("pq_code")).toMap
    codeRows.foreach(r =>
      assert(again(r.getLong(0)) == r.getAs[scala.collection.Seq[Byte]]("pq_code")))

    val queries = emb.filter(col("vec_id") < 10)
    val got = Similarity.annPq(codes, queries, books, dim, k)
      .select("q_id", "c_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // exact L2 top-k on the driver (corpus is tiny at sf0.001)
    val all = emb.select(col("vec_id"),
        graft.functions.VectorOps.toDouble(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val byId = all.toMap
    val recalls = (0L until 10L).map { qid =>
      val qv = byId(qid)
      val want = all.filter(_._1 != qid)
        .map { case (id, v) =>
          var d = 0.0; var i = 0
          while (i < qv.length) { val t = qv(i) - v(i); d += t * t; i += 1 }
          (d, id)
        }.sorted.take(k).map(_._2).toSet
      (got.getOrElse(qid, Set.empty) & want).size.toDouble / k
    }
    // raw ADC ranks through 8-byte codes alone — measured ~0.32 recall@10
    // on this corpus, which is WHY production PQ always refines a
    // shortlist; pin a floor well above chance (k/n ≈ 0.02) so a broken
    // LUT or encoder still fails loudly
    val recall = recalls.sum / recalls.size
    assert(recall >= 0.2, s"PQ ADC recall@$k $recall < 0.2")

    // the production shape: ADC shortlist (10k) + exact re-rank
    val refined = Similarity.annPqRefined(emb, codes, queries, books, dim,
        k, shortlist = 10 * k)
      .select("q_id", "c_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val refRecalls = (0L until 10L).map { qid =>
      val qv = byId(qid)
      val want = all.filter(_._1 != qid)
        .map { case (id, v) =>
          var d = 0.0; var i = 0
          while (i < qv.length) { val t = qv(i) - v(i); d += t * t; i += 1 }
          (d, id)
        }.sorted.take(k).map(_._2).toSet
      (refined.getOrElse(qid, Set.empty) & want).size.toDouble / k
    }
    val refRecall = refRecalls.sum / refRecalls.size
    assert(refRecall >= 0.75, s"refined PQ recall@$k $refRecall < 0.75")
    assert(refRecall > recall, "re-rank did not improve over raw ADC")
  }

  test("IVF+PQ: residual codes scored per probed cell, refined recall vs exact L2") {
    val emb = Tables.embeddings(spark, sf)
    val dim = 64; val k = 10
    val queries = emb.filter(col("vec_id") < 10)
    val out = Similarity.annIvfPq(emb, queries, dim, nlist = 8, nprobe = 3,
      m = 8, ks = 16, k = k, shortlist = 10 * k)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"IVF+PQ shuffled the corpus through a join:\n${plan.take(1500)}")
    val got = out.select("q_id", "c_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val all = emb.select(col("vec_id"),
        graft.functions.VectorOps.toDouble(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val byId = all.toMap
    val recalls = (0L until 10L).map { qid =>
      val qv = byId(qid)
      val want = all.filter(_._1 != qid)
        .map { case (id, v) =>
          var d = 0.0; var i = 0
          while (i < qv.length) { val t = qv(i) - v(i); d += t * t; i += 1 }
          (d, id)
        }.sorted.take(k).map(_._2).toSet
      (got.getOrElse(qid, Set.empty) & want).size.toDouble / k
    }
    val recall = recalls.sum / recalls.size
    // ceiling is IVF cell recall (nprobe 3 of 8); the residual-PQ
    // shortlist + exact re-rank must preserve most of it
    assert(recall >= 0.5, s"IVF+PQ refined recall@$k $recall < 0.5")
  }
}
