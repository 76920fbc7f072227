package graft

/** Plan-shape guardrails across the whole query surface: catches operators
  * that silently degrade into unpartitioned cartesian products — the class
  * of regression that is invisible at test scale and fatal at 100 TB.
  */
class PlanHygieneSpec extends SparkSpec {

  test("no query plans a CartesianProduct") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n${plan.take(2000)}")
    }
  }

  test("oracle-checked scans prune columns (no SELECT * scans of lineitem)") {
    val plan = operators.Relational.q1Agg(spark, sf)
      .queryExecution.executedPlan.toString
    // lineitem has 11 columns; q1 needs 7 — the scan must not read more
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(readSchema.split(",").length <= 7, s"unpruned scan: $readSchema")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "filter not pushed to parquet")
  }
}
