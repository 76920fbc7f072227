package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot-key aggregations.
  *
  * At 100 TB a handful of keys (one mega-user, one dominant event type)
  * can hold an entire aggregation stage hostage: every row of the hot key
  * lands on one reducer. Salting splits each key into `salts` sub-keys for
  * a partial aggregate, then merges the partials — two small shuffles
  * instead of one skewed one. AQE's skew-join handling covers joins; this
  * covers aggregations, where AQE does not re-split.
  */
object Skew {

  /** Two-stage salted aggregation: sum/count/min/max style merges only
    * (algebraic aggregates that compose associatively).
    *
    * `aggs` maps output column name -> (partial agg of the value column,
    * merge agg of the partial column). See [[saltedSum]] for the common
    * case.
    */
  def saltedAgg(df: DataFrame, key: String, salts: Int,
                aggs: Seq[(String, Column => Column, Column => Column)],
                valueCol: String): DataFrame = {
    val salted = df.withColumn("_salt", pmod(xxhash64(spark_partition_id(),
      monotonically_increasing_id()), lit(salts.toLong)))
    val partial = salted.groupBy(col(key), col("_salt"))
      .agg(aggs.head._2(col(valueCol)).as(s"_p_${aggs.head._1}"),
           aggs.tail.map(a => a._2(col(valueCol)).as(s"_p_${a._1}")): _*)
    partial.groupBy(col(key))
      .agg(aggs.head._3(col(s"_p_${aggs.head._1}")).as(aggs.head._1),
           aggs.tail.map(a => a._3(col(s"_p_${a._1}")).as(a._1)): _*)
  }

  /** Salted sum+count (the building blocks of any mean at scale). */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     salts: Int = 16): DataFrame =
    saltedAgg(df, key, salts, Seq(
      ("v_sum", (c: Column) => sum(c), (c: Column) => sum(c)),
      ("v_n", (c: Column) => count(c), (c: Column) => sum(c))), valueCol)

  /** Joins [[skewJoin]] supports: splitting the LEFT side into hot/cold
    * legs partitions the OUTPUT only when every output row is anchored to
    * exactly one left row. Right/full-outer joins break that invariant —
    * an unmatched right row would be emitted by BOTH legs (each leg sees
    * it unmatched against its slice of the left). */
  private val LeftAnchoredJoins =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti")

  /** Explicit hot-key split join — the join-side complement of
    * [[saltedAgg]] for the skew AQE cannot always save you from.
    *
    * AQE's skew-join handling splits oversized sort-merge partitions at
    * runtime, but it only triggers inside an SMJ whose statistics cross
    * its thresholds, and it still sorts the hot key's rows. The
    * production-grade alternative when the hot keys are KNOWN (one mega
    * user, a handful of dominant event types): route the hot keys' rows
    * through a broadcast join — no shuffle, no sort, each hot key's rows
    * stay spread across whatever partitions they already occupy — and
    * only the well-distributed remainder through the ordinary shuffle
    * join. At 100 TB this turns "one reducer owns the mega-key's 2 TB"
    * into "the mega-key never shuffles at all".
    *
    * Contract: equi-join on `key`; `joinType` must be left-anchored
    * (inner / left_outer / left_semi / left_anti — see
    * [[LeftAnchoredJoins]]); the RIGHT side's hot-key slice must be
    * broadcast-sized (it is `|hotKeys|` keys' worth of dim rows — small
    * by construction when hotKeys is the short head of a skewed
    * distribution). Row-level semantics are EXACTLY the plain join's:
    * NULL left keys ride the cold leg (where the equi-join treats them as
    * matchless, same as unsplit), and the legs partition the left side,
    * so output multiplicity per left row is unchanged.
    */
  def skewJoin(left: DataFrame, right: DataFrame, key: String,
               hotKeys: Seq[Any], joinType: String = "inner"): DataFrame = {
    require(hotKeys.nonEmpty, "skewJoin: hotKeys must be non-empty — " +
      "use a plain join when there is nothing to split")
    require(LeftAnchoredJoins.contains(joinType.toLowerCase),
      s"skewJoin: joinType '$joinType' is not left-anchored; splitting the " +
        "left side would duplicate or drop unmatched right rows " +
        s"(supported: ${LeftAnchoredJoins.toSeq.sorted.mkString(", ")})")
    // isin is three-valued: NULL key => NULL, which would vanish from BOTH
    // legs under filter(). Coalesce to false so NULL keys ride the cold leg.
    def isHot(df: DataFrame): Column =
      coalesce(df(key).isin(hotKeys: _*), lit(false))
    val hotLeft = left.filter(isHot(left))
    val coldLeft = left.filter(!isHot(left))
    // cold left rows cannot match hot right keys (equi-join), so the cold
    // leg's shuffled right side shrinks by exactly the hot rows
    val hotRight = right.filter(isHot(right))
    val coldRight = right.filter(!isHot(right))
    hotLeft.join(broadcast(hotRight), Seq(key), joinType)
      .unionByName(coldLeft.join(coldRight, Seq(key), joinType))
  }

  /** [[skewJoin]] with the hot set DETECTED from the left side: one
    * column-pruned count-by-key pass (partial aggregation keeps even the
    * hot key map-side safe — the scan this profile is cheap for is the
    * same reason [[keyProfile]] is), keys with ≥ `hotThreshold` rows,
    * capped at the `maxHot` largest. The driver holds at most `maxHot`
    * key values — bounded planner state, same budget class as a broadcast
    * hint. Falls back to the plain join when nothing crosses the
    * threshold, so it is always safe to leave in a pipeline.
    *
    * Scan accounting, honestly: the detection pass reads the key column
    * once, and [[skewJoin]]'s legs then each re-evaluate the `left`
    * lineage under their hot/cold filters. On a plain scan the legs read
    * disjoint row sets of the same files; for an EXPENSIVE derived
    * `left`, persist it before calling — otherwise the upstream pipeline
    * recomputes per leg. */
  def skewJoinAuto(left: DataFrame, right: DataFrame, key: String,
                   hotThreshold: Long, maxHot: Int = 64,
                   joinType: String = "inner"): DataFrame = {
    require(hotThreshold > 0 && maxHot > 0,
      s"skewJoinAuto: need positive hotThreshold/maxHot, " +
        s"got $hotThreshold/$maxHot")
    val hot = left.filter(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= hotThreshold)
      .orderBy(col("_n").desc, col(key)) // deterministic under count ties
      .limit(maxHot)
      .select(col(key)).collect().map(_.get(0)).toSeq
    if (hot.isEmpty) left.join(right, Seq(key), joinType)
    else skewJoin(left, right, key, hot, joinType)
  }

  /** Key-distribution skew profile — the diagnostic run BEFORE choosing a
    * mitigation (salting, broadcast, AQE skew-join) for a join/agg key at
    * scale. One row out:
    *  - exact cardinality stats from a per-key count (partial aggregation
    *    makes even the hot key's count map-side safe),
    *  - `n_null` — NULL keys counted explicitly (the classic join-skew
    *    cause; they group like any other key and must not be invisible),
    *  - approximate p50/p90/p99 of per-key frequencies,
    *  - `skew_ratio` = max/avg per-key count (1 ≈ uniform; the number
    *    that says whether the biggest reducer is the stage),
    *  - the top-k hot keys with their EXACT counts.
    * Everything derives from the ONE per-key count aggregate — df is
    * scanned once, and the top-k comes from the bounded-state smallest_k
    * over the (already tiny) counts frame, exact rather than a sketch.
    * ([[graft.functions.HeavyHitters]] remains the right tool when even
    * one count-by-key shuffle is unaffordable — e.g. sketching inside an
    * existing aggregation over an unbounded key domain.) A NULL hot key
    * appears in `hot_keys` with a null item.
    *
    * `hot_keys.item` is the key CAST TO STRING so one diagnostic schema
    * fits every key type — the typed identity is lost (e.g. 1L and "1"
    * render identically). Join the reported items back by value through
    * the same cast if a typed lookup is needed. */
  def keyProfile(df: DataFrame, key: String, k: Int = 10): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    counts.agg(
      sum(col("n")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      coalesce(sum(when(col(key).isNull, col("n"))), lit(0L)).as("n_null"),
      max(col("n")).as("max_n"),
      // unrounded: skew_ratio divides by this, and pre-rounded input would
      // bake avoidable error into the ratio (true avg 1.004 vs 1.0 is a
      // visible shift when max_n is large); display rounding happens in
      // the select below
      avg(col("n")).as("avg_raw"),
      expr("percentile_approx(n, array(0.5D, 0.9D, 0.99D), 10000)").as("pcts"),
      graft.functions.SmallestK.smallestK(
        struct((-col("n")).as("nn"), col(key).cast("string").as("item"),
          col("n")), k).as("topk"))
      .select(col("n_rows"), col("n_keys"), col("n_null"), col("max_n"),
        round(col("avg_raw"), 2).as("avg_n"),
        element_at(col("pcts"), 1).as("p50_n"),
        element_at(col("pcts"), 2).as("p90_n"),
        element_at(col("pcts"), 3).as("p99_n"),
        round(col("max_n") / col("avg_raw"), 2).as("skew_ratio"),
        transform(col("topk"),
          t => struct(t("item").as("item"), t("n").as("n"))).as("hot_keys"))
  }
}
