package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Hot-key split join: row-level equality with the plain join on every
  * supported join type (NULL keys and matchless keys included), plus the
  * plan shape that IS the operator — the hot leg must broadcast, the cold
  * leg must not carry the hot keys. */
class SkewJoinSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  // Zipf-ish left: key 7 owns ~2/3 of all rows, key 8 a chunk, the rest
  // uniform; a NULL-key row and a key (999) missing from the right
  // exercise the outer/anti edges.
  private lazy val left: DataFrame = {
    val hot = Seq.tabulate(2000)(i => (Some(7L), i.toDouble))
    val warm = Seq.tabulate(500)(i => (Some(8L), 10000 + i.toDouble))
    val cold = Seq.tabulate(300)(i => (Some((i % 30).toLong), 20000 + i.toDouble))
    val edge = Seq((None: Option[Long], -1.0), (Some(999L), -2.0))
    (hot ++ warm ++ cold ++ edge).toDF("k", "v")
  }

  private lazy val right: DataFrame =
    (0L until 30L).map(k => (k, s"dim_$k")).toDF("k", "name")

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq.sorted

  test("skewJoin == plain join on inner / left_outer / left_semi / left_anti") {
    for (jt <- Seq("inner", "left_outer", "left_semi", "left_anti")) {
      val plain = left.join(right, Seq("k"), jt)
      val split = Skew.skewJoin(left, right, "k", Seq(7L, 8L), jt)
      assert(split.columns.toSeq == plain.columns.toSeq, s"schema drift on $jt")
      assert(rows(split) == rows(plain), s"row drift on $jt")
    }
  }

  test("skewJoin plans a broadcast hot leg and a hot-free cold leg") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // kill auto-broadcast so any BroadcastHashJoin in the plan is OURS
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Skew.skewJoin(left, right, "k", Seq(7L, 8L))
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"hot leg must broadcast:\n${plan.take(1500)}")
      // the cold leg still exists as a non-broadcast join
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"cold leg must remain a shuffle join under threshold=-1:\n${plan.take(1500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("skewJoinAuto detects the hot head and equals the plain join; no-skew input falls through") {
    val auto = Skew.skewJoinAuto(left, right, "k", hotThreshold = 400)
    assert(rows(auto) == rows(left.join(right, Seq("k"))))
    // threshold above every key's count -> plain join path (still equal)
    val flat = Skew.skewJoinAuto(left, right, "k", hotThreshold = 1000000)
    assert(rows(flat) == rows(left.join(right, Seq("k"))))
  }

  test("seeded fuzz: 12 random skew shapes x 4 join types, all equal to the plain join") {
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(seed * 77L)
      val nKeys = 5 + rnd.nextInt(40)
      val l = (0 until 300 + rnd.nextInt(700)).map { i =>
        // zipf-ish key draw + occasional nulls and right-missing keys
        val k = if (rnd.nextInt(50) == 0) None
                else Some((nKeys * math.pow(rnd.nextDouble(), 3)).toLong)
        (k, i.toDouble)
      }.toDF("k", "v")
      val r = (0L until nKeys.toLong)
        .filter(_ => rnd.nextInt(10) > 0) // some keys missing from right
        .map(k => (k, s"d$k")).toDF("k", "name")
      val hot = l.groupBy("k").count().orderBy(col("count").desc)
        .limit(1 + rnd.nextInt(3)).collect().map(_.get(0)).filter(_ != null).toSeq
      if (hot.nonEmpty) {
        for (jt <- Seq("inner", "left_outer", "left_semi", "left_anti")) {
          val plain = l.join(r, Seq("k"), jt).collect()
            .map(_.mkString("|")).sorted.toSeq
          val split = Skew.skewJoin(l, r, "k", hot, jt).collect()
            .map(_.mkString("|")).sorted.toSeq
          assert(split == plain, s"seed $seed type $jt hot=$hot")
        }
      }
    }
  }

  test("skewJoin refuses non-left-anchored join types and empty hot sets") {
    intercept[IllegalArgumentException] {
      Skew.skewJoin(left, right, "k", Seq(7L), "full_outer")
    }
    intercept[IllegalArgumentException] {
      Skew.skewJoin(left, right, "k", Seq.empty)
    }
  }
}
