package graft

import org.apache.spark.sql.functions._
import graft.operators.Upsert

/** snapshotDiff: the CDC extraction between two keyed snapshots. The
  * semantics oracle is scd1 itself — applying the diff's adds+changes to
  * `before` and dropping its removes must reproduce `after` exactly. */
class SnapshotDiffSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  private lazy val before = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0),
    (5L, Option.empty[String].orNull, 50.0)
  ).toDF("k", "name", "v")

  private lazy val after = Seq(
    (1L, "a", 10.0),              // unchanged
    (2L, "b", 21.0),              // changed (value)
    (3L, Option.empty[String].orNull, 30.0), // changed (c -> NULL)
    (5L, Option.empty[String].orNull, 50.0), // unchanged (with a NULL col)
    (6L, "f", 60.0)               // added; 4 removed
  ).toDF("k", "name", "v")

  test("ops classified; unchanged keys absent; both sides' columns carried") {
    val d = Upsert.snapshotDiff(before, after, "k")
      .collect().map(r => r.getLong(1) -> r).toMap
    assert(d.keySet == Set(2L, 3L, 4L, 6L), s"got ${d.keySet}")
    assert(d(2L).getString(0) == "changed" && d(2L).getAs[Double]("after_v") == 21.0
      && d(2L).getAs[Double]("before_v") == 20.0)
    assert(d(3L).getString(0) == "changed" && d(3L).getAs[String]("after_name") == null)
    assert(d(4L).getString(0) == "removed" && d(4L).getAs[Any]("after_v") == null)
    assert(d(6L).getString(0) == "added" && d(6L).getAs[Any]("before_v") == null)
  }

  test("round-trip: before + diff == after, exactly") {
    // NOT via scd1: its per-column coalesce cannot write NULL over a
    // value (key 3 nulls its name here), which is exactly the class of
    // change a diff must carry — replay by replacing whole rows instead
    val diff = Upsert.snapshotDiff(before, after, "k")
    val touched = diff.filter(col("op").isin("changed", "removed")).select("k")
    val rebuilt = before.join(touched, Seq("k"), "left_anti")
      .unionByName(diff.filter(col("op").isin("added", "changed"))
        .select(col("k"), col("after_name").as("name"), col("after_v").as("v")))
    def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet
    assert(canon(rebuilt) == canon(after))
  }

  test("null position is part of the change digest: (null, x) vs (x, null) is 'changed'") {
    // Spark's multi-arg xxhash64 skips nulls, so without per-column null
    // markers these two rows would hash identically and the change would
    // be silently invisible
    val b = Seq((1L, Option.empty[String].orNull, "x")).toDF("k", "a", "b")
    val a = Seq((1L, "x", Option.empty[String].orNull)).toDF("k", "a", "b")
    val d = Upsert.snapshotDiff(b, a, "k").collect()
    assert(d.length == 1 && d.head.getString(0) == "changed")
  }

  test("identical snapshots diff to zero rows; schema/key/type mismatches are refused") {
    assert(Upsert.snapshotDiff(before, before, "k").count() == 0)
    intercept[IllegalArgumentException] {
      Upsert.snapshotDiff(before, after.drop("v"), "k")
    }
    intercept[IllegalArgumentException] {
      Upsert.snapshotDiff(before, after, "nope")
    }
    // same names, drifted type: int vs long would silently hash every
    // row as 'changed' — must refuse loudly instead
    intercept[IllegalArgumentException] {
      Upsert.snapshotDiff(before,
        after.withColumn("v", col("v").cast("float")), "k")
    }
  }

  test("key-only snapshots diff to pure adds/removes (no data columns, no crash)") {
    val b = Seq(1L, 2L, 3L).toDF("k")
    val a = Seq(2L, 3L, 4L).toDF("k")
    val d = Upsert.snapshotDiff(b, a, "k")
      .collect().map(r => r.getLong(1) -> r.getString(0)).toMap
    assert(d == Map(1L -> "removed", 4L -> "added"))
  }

  test("corpus-scale sanity on documents: injected churn is recovered exactly") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "n_chars")
    val mutated = docs
      .filter(col("doc_id") % 97 =!= 0) // drop ~1%
      .withColumn("n_chars",
        when(col("doc_id") % 13 === 0, col("n_chars") + 1)
          .otherwise(col("n_chars"))) // change ~8%
    val extra = Seq((900000001L, "en", 42L)).toDF("doc_id", "lang", "n_chars")
    val d = Upsert.snapshotDiff(docs, mutated.unionByName(extra), "doc_id")
      .groupBy("op").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nRemoved = docs.filter(col("doc_id") % 97 === 0).count()
    val nChanged = docs.filter(col("doc_id") % 97 =!= 0 &&
      col("doc_id") % 13 === 0).count()
    assert(d.getOrElse("removed", 0L) == nRemoved)
    assert(d.getOrElse("changed", 0L) == nChanged)
    assert(d.getOrElse("added", 0L) == 1L)
  }
}
