package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SCD-type-1 upsert (MERGE): source rows replace matching target rows by
  * key; unmatched source rows are inserted; unmatched target rows are kept.
  *
  * Shape: one full-outer join on the key (shuffle both sides once) +
  * column-wise coalesce — the lakehouse MERGE primitive expressed on plain
  * DataFrames. At 100 TB the join keys both sides by the merge key; with
  * bucketed targets (sources.Bucketing) the target side never re-shuffles.
  *
  * Coalesce semantics caveat: a NULL in a matched source row means "keep
  * the target's value", so scd1 cannot NULL OUT a populated column — the
  * standard SCD1-by-coalesce contract (surfaced by SnapshotDiffSpec's
  * round-trip, which replays whole rows for exactly that reason).
  */
object Upsert {

  def scd1(target: DataFrame, source: DataFrame, key: String): DataFrame = {
    val cols = target.columns
    require(source.columns.sameElements(cols), "schemas must match")
    val t = cols.filter(_ != key).foldLeft(target) { (d, c) =>
      d.withColumnRenamed(c, s"_t_$c")
    }
    val s = cols.filter(_ != key).foldLeft(source) { (d, c) =>
      d.withColumnRenamed(c, s"_s_$c")
    }
    t.join(s, Seq(key), "full_outer")
      .select(col(key) +: cols.filter(_ != key).map(c =>
        coalesce(col(s"_s_$c"), col(s"_t_$c")).as(c)): _*)
  }

  /** Snapshot diff — the read-side inverse of [[scd1]]: given two
    * snapshots of a keyed table, emit what changed. One row per key whose
    * state differs, tagged `op` ∈ {added, removed, changed}, with the
    * non-key columns of BOTH sides (`before_*` / `after_*`; null on the
    * absent side). This is the CDC extraction a pipeline runs between
    * ingests — "what did this crawl change" — and the input
    * `Dedup.incrementalLabels` / `Similarity.ivfAssign` style incremental
    * operators want, derived from plain snapshots when no log exists.
    *
    * Shape: ONE full-outer shuffle join on the key. Change detection
    * compares a single xxhash64 over the non-key columns computed
    * map-side on each side BEFORE the join output is inspected — wide
    * rows don't need column-by-column comparison logic, and the
    * hash-equal fast path discards unchanged keys with one long compare.
    * (Hash equality standing in for row equality accepts the 2^-64
    * collision mistaking one changed row for unchanged — the standard
    * CDC-by-hash tradeoff. Spark's multi-argument xxhash64 SKIPS null
    * inputs — `(null, "x")` and `("x", null)` would hash identically —
    * so each column is preceded by its own is-null marker in the hash
    * input, making null position part of the digest.) At 100 TB both
    * snapshots
    * shuffle once by key; bucketed snapshots (sources.Bucketing) would
    * shuffle neither.
    *
    * NULL keys never equi-join: a null-key row in each snapshot surfaces
    * as one `removed` and one `added`, not a comparison — keys are meant
    * to be keys. */
  def snapshotDiff(before: DataFrame, after: DataFrame,
                   key: String): DataFrame = {
    val cols = before.columns
    // names AND types: a type drift between snapshots (int -> long schema
    // evolution) hashes every row differently and would flood the diff
    // with false 'changed' rows — refuse loudly instead
    def sig(df: DataFrame) = df.schema.map(f => (f.name, f.dataType))
    require(sig(before) == sig(after),
      s"snapshotDiff: schemas must match, got ${sig(before).mkString(",")} " +
        s"vs ${sig(after).mkString(",")}")
    require(cols.contains(key), s"snapshotDiff: no key column '$key'")
    val dataCols = cols.filter(_ != key)
    def tagged(df: DataFrame, tag: String): DataFrame = {
      val hashInputs = dataCols.flatMap(c =>
        Seq(col(c).isNull.cast("int"), col(c)))
      // key-only snapshot: no data columns means no change is possible —
      // a constant digest makes the diff pure adds/removes (zero-arg
      // xxhash64 would throw)
      val hash = if (dataCols.isEmpty) lit(0L) else xxhash64(hashInputs: _*)
      val withHash = df
        .withColumn(s"_${tag}_hash", hash)
        .withColumn(s"_${tag}_present", lit(true))
      dataCols.foldLeft(withHash) { (d, c) =>
        d.withColumnRenamed(c, s"${tag}_$c")
      }
    }
    tagged(before, "before").join(tagged(after, "after"), Seq(key), "full_outer")
      .withColumn("op",
        when(col("_before_present").isNull, lit("added"))
          .when(col("_after_present").isNull, lit("removed"))
          .when(col("_before_hash") =!= col("_after_hash"), lit("changed")))
      .filter(col("op").isNotNull)
      .select(col("op") +: col(key) +:
        (dataCols.map(c => col(s"before_$c")) ++
          dataCols.map(c => col(s"after_$c"))): _*)
  }

  /** SparkEntry glue: customers upserted with a derived update set (every
    * 10th customer gets a refreshed acctbal; two synthetic inserts). */
  def qUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    // round at the LATTICE precision: 2-dp inputs × 1.1 are exact 3-dp
    // values, half of which end in 5 — i.e. exactly on round-2 half-way
    // points, where the engines' rounding implementations disagree
    // (surfaced at sf0.1: 4 of 1500 updated rows). At 3 dp every value
    // sits ON a lattice point, never on a boundary.
    val updates = cust.filter(col("c_custkey") % 10 === 0)
      .withColumn("c_acctbal", round(col("c_acctbal") * 1.1 + 100.0, 3))
    val inserts = spark.range(2).select(
      (col("id") + 900000000L).as("c_custkey"),
      concat(lit("Customer#new"), col("id").cast("string")).as("c_name"),
      lit(0).cast("int").as("c_nationkey"),
      lit(0.0).as("c_acctbal"),
      lit("BUILDING").as("c_mktsegment"))
    scd1(cust, updates.unionByName(inserts), "c_custkey")
  }

  val qUpsertSql: String =
    """WITH src AS (
      |  SELECT c_custkey, c_name, c_nationkey,
      |    round(c_acctbal * 1.1 + 100.0, 3) AS c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 10 = 0
      |  UNION ALL
      |  SELECT 900000000 + i AS c_custkey, 'Customer#new' || i AS c_name,
      |    CAST(0 AS INTEGER) AS c_nationkey, 0.0 AS c_acctbal,
      |    'BUILDING' AS c_mktsegment
      |  FROM range(2) t(i))
      |SELECT coalesce(s.c_custkey, t.c_custkey) AS c_custkey,
      |  coalesce(s.c_name, t.c_name) AS c_name,
      |  coalesce(s.c_nationkey, t.c_nationkey) AS c_nationkey,
      |  coalesce(s.c_acctbal, t.c_acctbal) AS c_acctbal,
      |  coalesce(s.c_mktsegment, t.c_mktsegment) AS c_mktsegment
      |FROM customer t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey""".stripMargin
}
