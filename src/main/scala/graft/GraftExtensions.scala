package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, XxHash64}
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType, IntegerType, LongType}
import graft.functions._

/** Session extension entry point: makes graft's native expressions
  * available to pure-SQL users without any Scala imports.
  *
  * Usage (spark-submit / spark-defaults):
  *   spark.sql.extensions=graft.GraftExtensions
  * or programmatically:
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Int parameters (shingle n, numHashes, k) must be literal in SQL. */
  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Long-or-int literal: SQL `3000000000` parses as LongType, and the
    * 100 TB semi-join use case (billions of expected join keys) must be
    * expressible from SQL, not just the Column API. */
  private def litLong(e: Expression, what: String): Long = e match {
    case Literal(l: Long, LongType) => l
    case Literal(i: Int, IntegerType) => i.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Numeric literal as double. A plain SQL fraction like `0.01` parses
    * as a DECIMAL literal, not DoubleType — only the `0.01D` spelling
    * produces a double — so the Decimal case is what the natural
    * `graft_bloom_filter(k, 5000, 0.01)` call actually hits. */
  private def litDouble(e: Expression, what: String): Double = e match {
    case Literal(d: Double, DoubleType) => d
    case Literal(f: Float, FloatType) => f.toDouble
    case Literal(dec: org.apache.spark.sql.types.Decimal, _: DecimalType) =>
      dec.toDouble
    case Literal(i: Int, IntegerType) => i.toDouble
    case Literal(l: Long, LongType) => l.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    def inject(name: String, builder: Seq[Expression] => Expression): Unit =
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(getClass.getName, name),
        builder))

    // native plan strategies (tier (c) operators) — the Column-API entry
    // points (plans.Ewma / plans.AsofJoin) install these lazily into
    // `experimental.extraStrategies`, but a conf-configured session gets
    // them up front so pre-built AsofJoinNode/EwmaNode plans are always
    // plannable
    e.injectPlannerStrategy(_ => graft.plans.EwmaStrategy)
    e.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)

    inject("graft_cosine", exprs => CosineSimilarity(exprs(0), exprs(1)))
    inject("graft_dist_sq", exprs => DistSq(exprs(0), exprs(1)))
    inject("graft_char_entropy", exprs => CharEntropy(exprs(0)))
    inject("graft_compress_ratio", exprs => CompressRatio(exprs(0)))
    inject("graft_sorted_intersect_count",
      exprs => SortedIntersectCount(exprs(0), exprs(1)))
    inject("graft_shingle_hash_set",
      exprs => ShingleHashSet(exprs(0), litInt(exprs(1), "shingle size")))
    inject("graft_minhash_sig",
      exprs => MinHashSig(exprs(0), litInt(exprs(1), "numHashes")))
    inject("graft_simhash64", exprs => SimHash64(exprs(0)))
    inject("graft_winnow_fingerprint",
      exprs => WinnowFingerprint(exprs(0), litInt(exprs(1), "gram size"),
        litInt(exprs(2), "winnow window")))
    inject("graft_weighted_outer_flat",
      exprs => WeightedOuterFlat(exprs(0), exprs(1)))
    inject("graft_normal_eq",
      exprs => NormalEqAgg(exprs(0), exprs(1), exprs(2))
        .toAggregateExpression())
    inject("graft_smallest_k",
      exprs => SmallestKAgg(exprs(0), litInt(exprs(1), "k"))
        .toAggregateExpression())
    // registered under the repo-wide graft_ prefix AND the bare name the
    // sketch literature uses — the frequency sketch was the one native
    // kernel a pure-SQL user could not reach (r7 verdict gap #1)
    Seq("graft_heavy_hitters", "heavy_hitters").foreach(n =>
      inject(n, exprs => HeavyHittersAgg(exprs(0), litInt(exprs(1), "k"))
        .toAggregateExpression()))
    // mergeable membership sketch + probe; values are null-safe-hashed
    // here so SQL users pass raw keys, exactly like the Column API (a
    // bare XxHash64 maps NULL to its seed — a phantom member that makes
    // might_contain(f, NULL) true and defeats NULL-probe filtering)
    inject("graft_bloom_filter", exprs => {
      val (nWords, nHashes) = BloomUtil.sizeFor(
        litLong(exprs(1), "expectedItems"), litDouble(exprs(2), "fpp"))
      BloomFilterAgg(HashIngest.nullSafeHash(exprs(0)), nWords, nHashes)
        .toAggregateExpression()
    })
    inject("graft_might_contain",
      exprs => BloomMightContain(exprs(0), HashIngest.nullSafeHash(exprs(1))))
    // count-min frequency sketch: build / rollup-union / point estimate
    inject("graft_cms_sketch", exprs =>
      CountMinAgg(HashIngest.nullSafeHash(exprs(0)), litInt(exprs(1), "depth"),
        litInt(exprs(2), "width")).toAggregateExpression())
    inject("graft_cms_merge",
      exprs => CmsMergeAgg(exprs(0)).toAggregateExpression())
    inject("graft_cms_estimate",
      exprs => CmsEstimate(exprs(0), HashIngest.nullSafeHash(exprs(1))))
    // inner-product join-size estimate off two same-dim sketches — the
    // "how big is this join" planner probe (never under-counts)
    inject("graft_cms_join_size", exprs => CmsJoinSize(exprs(0), exprs(1)))
    // t-digest quantile sketch: build / rollup-union / quantile probe.
    // The measure is cast to double here (SQL ints/decimals welcome), and
    // the probe quantile goes through litDouble — SQL `0.5` parses as a
    // DECIMAL literal, which the expression's double type-check would
    // otherwise reject (the graft_bloom_filter lesson).
    inject("graft_td_sketch", exprs =>
      TDigestAgg(org.apache.spark.sql.catalyst.expressions.Cast(
        exprs(0), DoubleType), litInt(exprs(1), "delta"))
        .toAggregateExpression())
    inject("graft_td_merge",
      exprs => TdMergeAgg(exprs(0)).toAggregateExpression())
    inject("graft_td_quantile", exprs =>
      TdQuantile(exprs(0), Literal(litDouble(exprs(1), "quantile"))))
    // CDF probe (r10): inverse of graft_td_quantile; x is a full
    // expression so a column scores per-row against one broadcast digest
    inject("graft_td_cdf", exprs =>
      TdCdf(exprs(0), org.apache.spark.sql.catalyst.expressions.Cast(
        exprs(1), DoubleType)))
    // KLL quantile sketch (r10): build / rollup-union / quantile probe —
    // the uniform-rank-bound complement to the t-digest, same
    // litInt/litDouble SQL-literal handling
    inject("graft_kll_sketch", exprs =>
      KllAgg(org.apache.spark.sql.catalyst.expressions.Cast(
        exprs(0), DoubleType), litInt(exprs(1), "k"))
        .toAggregateExpression())
    inject("graft_kll_merge",
      exprs => KllMergeAgg(exprs(0)).toAggregateExpression())
    inject("graft_kll_quantile", exprs =>
      KllQuantile(exprs(0), Literal(litDouble(exprs(1), "quantile"))))
    // CDF probe (r10): the inverse of graft_kll_quantile; x is a full
    // expression (not a literal) so a COLUMN can be scored per-row
    // against one broadcast sketch
    inject("graft_kll_rank", exprs =>
      KllRank(exprs(0), org.apache.spark.sql.catalyst.expressions.Cast(
        exprs(1), DoubleType)))
    // theta / KMV distinct sketch (r10): build / rollup-union / estimate,
    // plus the set expressions no other sketch in the family can answer
    // (intersection and difference cardinalities). Raw keys are
    // null-safe-hashed here, like graft_bloom_filter.
    inject("graft_theta_sketch", exprs =>
      ThetaAgg(HashIngest.nullSafeHash(exprs(0)), litInt(exprs(1), "k"))
        .toAggregateExpression())
    inject("graft_theta_merge",
      exprs => ThetaMergeAgg(exprs(0)).toAggregateExpression())
    inject("graft_theta_estimate", exprs => ThetaEstimate(exprs(0)))
    inject("graft_theta_intersect",
      exprs => ThetaSetOp(exprs(0), exprs(1), intersect = true))
    inject("graft_theta_anotb",
      exprs => ThetaSetOp(exprs(0), exprs(1), intersect = false))
    // mergeable distinct-uniform sample (r10): the value-carrying KMV
    // sibling of theta — build / rollup-union / values probe; the child
    // is cast to string like the Column API so any key type samples
    inject("graft_sample_sketch", exprs =>
      ReservoirAgg(org.apache.spark.sql.catalyst.expressions.Cast(
        exprs(0), org.apache.spark.sql.types.StringType),
        litInt(exprs(1), "k")).toAggregateExpression())
    inject("graft_sample_merge",
      exprs => ReservoirMergeAgg(exprs(0)).toAggregateExpression())
    inject("graft_sample_values", exprs => ReservoirValues(exprs(0)))
    // weighted (A-ES) variant: inclusion probability proportional to the
    // weight column; same cast-on-the-way-in treatment
    inject("graft_wsample_sketch", exprs =>
      WeightedReservoirAgg(
        org.apache.spark.sql.catalyst.expressions.Cast(
          exprs(0), org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.catalyst.expressions.Cast(
          exprs(1), org.apache.spark.sql.types.DoubleType),
        litInt(exprs(2), "k")).toAggregateExpression())
    inject("graft_wsample_merge",
      exprs => WeightedReservoirMergeAgg(exprs(0)).toAggregateExpression())
    inject("graft_wsample_values", exprs => WeightedReservoirValues(exprs(0)))
    inject("graft_vector_avg",
      exprs => VectorSumAgg(exprs(0), avg = true).toAggregateExpression())
    inject("graft_vector_sum",
      exprs => VectorSumAgg(exprs(0), avg = false).toAggregateExpression())
  }
}
