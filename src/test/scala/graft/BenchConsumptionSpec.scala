package graft

import org.apache.spark.sql.functions._

/** Pins the bench measurement premise behind the r8 consumption change:
  * `count()` lets Catalyst prune cardinality-neutral work (so rounds 1-7
  * under-measured projection-heavy queries — text_fingerprint benched
  * 0.12 s against 26 s of real Verify-path work), while `Bench.evaluate`
  * (noop v2 sink) pays for every output column of every row. The probe is
  * an accumulator-counting UDF in a projection: count() must leave it
  * untouched, evaluate() must hit every row. If the count() half ever
  * fails, Catalyst stopped pruning deterministic projections under count
  * — i.e. the premise, not just the fix, changed; re-read the Bench
  * consumption comment before touching either. */
class BenchConsumptionSpec extends SparkSpec {

  test("count() prunes an unused projection; Bench.evaluate pays for it") {
    val acc = spark.sparkContext.longAccumulator("bench-consumption-probe")
    val probe = udf { (x: Long) => acc.add(1); x }
    val df = spark.range(1000).select(probe(col("id")).as("y"))

    assert(df.count() == 1000)
    assert(acc.value == 0,
      s"count() evaluated the projection (${acc.value} rows) — the r1-r7 " +
        "under-measurement premise no longer holds")

    Bench.evaluate(df)
    assert(acc.value >= 1000,
      s"noop consumption skipped projection work: ${acc.value}/1000 rows")
  }

  test("evaluate consumes multi-column output incl. arrays") {
    val acc = spark.sparkContext.longAccumulator("bench-consumption-probe2")
    val probe = udf { (x: Long) => acc.add(1); Seq(x, x + 1) }
    val df = spark.range(100)
      .select(col("id"), probe(col("id")).as("arr"), lit("pad").as("s"))
    Bench.evaluate(df)
    assert(acc.value >= 100, s"array column unevaluated: ${acc.value}/100")
  }
}
