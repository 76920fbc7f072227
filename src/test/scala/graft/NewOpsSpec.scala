package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, RangeJoin, Relational, Skew}

/** Round-2 operators: range join, funnel, clusters, salted agg, top-k. */
class NewOpsSpec extends SparkSpec {

  test("bucketized range join matches the naive BETWEEN join, no nested loop on the big side") {
    val ev = Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("ev_us"), col("event_id"))
    val iv = RangeJoin.intervals(spark)
    val got = RangeJoin.rangeJoin(ev, col("ev_us"), iv, bucketUs = 24L * 3600000000L)
      .select("event_id", "iv_id")
    val want = ev.join(iv,
        col("ev_us") >= col("start_us") && col("ev_us") <= col("end_us"))
      .select("event_id", "iv_id")
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    // equi-join on bucket: no cartesian, and the join is hash-based
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoop"))
  }

  test("smallest_k top-words matches the row_number window formulation") {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, sf)
      .select(col("lang"), explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
    val counts = toks.groupBy(col("lang"), col("word")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("word"))
    val want = counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5).select("lang", "rk", "word", "n")
    val got = Relational.qTopWords(spark, sf)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("smallest_k is exact across partitionings and handles ties/small groups") {
    val ss = TestSpark.spark
    import ss.implicits._
    val df = (1 to 1000).map(i => (i % 7, (i * 37) % 100, s"x$i")).toDF("g", "n", "s")
    for (parts <- Seq(1, 13)) {
      val got = df.repartition(parts)
        .groupBy("g")
        .agg(graft.functions.SmallestK.smallestK(struct(col("n"), col("s")), 5).as("top"))
        .select(col("g"), explode(col("top")).as("t"))
        .select(col("g"), col("t.n"), col("t.s"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("g").orderBy(col("n"), col("s"))
      val want = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
        .select("g", "n", "s")
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    }
    // group smaller than k
    val tiny = Seq((1, 5)).toDF("g", "n")
      .groupBy("g").agg(graft.functions.SmallestK.smallestK(col("n"), 3).as("t"))
      .select(size(col("t"))).head().getInt(0)
    assert(tiny == 1)
  }

  test("dedup clusters: labels are transitive, canonical is the component min") {
    val docs = Tables.documents(spark, sf)
    val out = Dedup.dedupClusters(docs, threshold = 0.5).cache()
    assert(out.count() == docs.count())
    // every cluster id is the min doc_id of its members
    val bad = out.groupBy("cluster_id").agg(min("doc_id").as("mn"))
      .filter(col("cluster_id") =!= col("mn")).count()
    assert(bad == 0)
    // edges connect docs in the SAME cluster (transitivity via fixpoint)
    val pairs = Dedup.ngramJaccardPairs(docs).filter(col("jaccard") >= 0.5)
    val l = out.select(col("doc_id").as("doc_id_a"), col("cluster_id").as("ca"))
    val r = out.select(col("doc_id").as("doc_id_b"), col("cluster_id").as("cb"))
    val split = pairs.join(l, "doc_id_a").join(r, "doc_id_b")
      .filter(col("ca") =!= col("cb")).count()
    assert(split == 0)
    // exactly one canonical per cluster
    val multi = out.groupBy("cluster_id")
      .agg(sum("is_canonical").as("nc")).filter(col("nc") =!= 1).count()
    assert(multi == 0)
    out.unpersist()
  }

  test("funnel stage counts are monotone and bounded by user count") {
    val r = Relational.qFunnel(spark, sf).head()
    val (nu, nv, nvc, nf) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nu >= nv && nv >= nvc && nvc >= nf)
    assert(nf >= 0 && nv > 0)
  }

  test("native shingle-hash jaccard matches the HOF string-set formulation") {
    val docs = Tables.documents(spark, sf)
    // set sizes agree
    val sizes = docs.select(
      size(Dedup.ngramSet(col("text"), 3)).as("want"),
      size(graft.functions.ShingleHashSet(lower(trim(col("text"))), 3)).as("got"))
    assert(sizes.filter(col("want") =!= col("got")).count() == 0)
    // pairwise jaccard agrees with the string-set computation
    val withS = docs.select(col("doc_id"), col("lang"), col("n_chars"),
      Dedup.ngramSet(col("text"), 3).as("g"))
    val a = withS.select(col("lang"), col("doc_id").as("doc_id_a"),
      col("n_chars").as("nc_a"), col("g").as("g_a"))
    val want = a.join(withS.select(col("lang"), col("doc_id").as("doc_id_b"),
        col("n_chars").as("nc_b"), col("g").as("g_b")), Seq("lang"))
      .filter(col("doc_id_a") < col("doc_id_b") &&
              abs(col("nc_a") - col("nc_b")) <= 2)
      .select(col("doc_id_a"), col("doc_id_b"),
        round(size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b"))), 6).as("jaccard"))
    val got = Dedup.ngramJaccardPairs(docs).select("doc_id_a", "doc_id_b", "jaccard")
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("char entropy: closed-form cases and empty/uniform behavior") {
    val ss = TestSpark.spark
    import ss.implicits._
    val df = Seq("", "aaaa", "ab", "abcd", "aab").toDF("t")
      .select(graft.functions.CharEntropy(col("t")).as("e"))
    val got = df.collect().map(_.getDouble(0))
    assert(got(0) == 0.0)                      // empty
    assert(got(1) == 0.0)                      // single symbol
    assert(math.abs(got(2) - 1.0) < 1e-12)     // two equally likely → 1 bit
    assert(math.abs(got(3) - 2.0) < 1e-12)     // four equally likely → 2 bits
    val h3 = -(2.0 / 3) * (math.log(2.0 / 3) / math.log(2)) -
      (1.0 / 3) * (math.log(1.0 / 3) / math.log(2))
    assert(math.abs(got(4) - h3) < 1e-12)
  }

  test("MAD outliers flag injected spikes but not the bulk") {
    val out = graft.operators.TimeSeriesQueries.tsMadOutliers(spark, sf)
    val n = out.count()
    val total = Tables.events(spark, sf).count()
    assert(n < total / 10, s"flagged $n of $total — MAD gate too loose")
    assert(out.filter(col("robust_z") <= 3.5).count() == 0)
  }

  test("window dedup keeps first event of each burst") {
    val kept = Relational.qWindowDedup(spark, sf)
    val total = Tables.events(spark, sf).count()
    assert(kept.count() > 0 && kept.count() <= total)
    // no two kept events of the same (user, type) within 10 min
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id", "event_type").orderBy("us")
    val viol = kept.withColumn("gap", col("us") - lag("us", 1).over(w))
      .filter(col("gap") <= 600000000L).count()
    assert(viol == 0)
  }

  test("holt smoothing matches a driver-side reference fold per trajectory") {
    val out = graft.operators.TimeSeriesQueries.tsHolt(spark, sf)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._3, t._2))
    val want = scala.collection.mutable.Map.empty[(Long, Long), (Double, Double)]
    var cur = -1L; var l = 0.0; var b = 0.0
    ev.foreach { case (u, id, _, x) =>
      if (u != cur) { cur = u; l = x; b = 0.0 }
      else {
        val l2 = 0.3 * x + (1.0 - 0.3) * (l + b)
        b = 0.2 * (l2 - l) + (1.0 - 0.2) * b
        l = l2
      }
      want((u, id)) = (l, b)
    }
    val got = out.select("user_id", "event_id", "level", "trend")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3))))
    assert(got.length == want.size)
    got.foreach { case (k, (gl, gt)) =>
      val (wl, wt) = want(k)
      // got is rounded to 6 dp; compare against the unrounded reference
      // within the rounding half-width
      assert(math.abs(gl - wl) < 5.1e-7 && math.abs(gt - wt) < 5.1e-7,
        s"holt mismatch at $k: got ($gl,$gt) want ($wl,$wt)")
    }
  }

  test("sketch rollup: unioned daily sketches estimate all-time distincts within 5%") {
    val est = Relational.qSketchRollup(spark, sf)
      .select("event_type", "est_users")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val e = est(k)
      assert(math.abs(e - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: sketch estimate $e vs exact $n")
    }
  }

  test("curation pipeline: gates partition the corpus, kept set is dup-free") {
    import graft.operators.TextOps
    val out = TextOps.pipelineCuration(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    assert(out.count() == docs.count())
    // reason is exactly '' iff kept
    assert(out.filter((col("kept") === 1) =!= (col("reason") === "")).count() == 0)
    // kept docs have no exact-duplicate texts among themselves
    val keptDocs = out.filter(col("kept") === 1).join(docs, "doc_id")
    val dupTexts = keptDocs.groupBy(md5(col("text").cast("binary")))
      .count().filter(col("count") > 1).count()
    assert(dupTexts == 0, "kept set contains exact duplicates")
    assert(keptDocs.count() > 0, "pipeline dropped everything")
    out.unpersist()
  }

  test("salted aggregation is exact vs the one-stage groupBy") {
    val ev = Tables.events(spark, sf)
    val got = Skew.saltedSumCount(ev, "event_type", "value")
      .select(col("event_type"), round(col("v_sum"), 2).as("s"), col("v_n"))
    val want = ev.groupBy("event_type")
      .agg(round(sum("value"), 2).as("s"), count("value").as("v_n"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }
}
