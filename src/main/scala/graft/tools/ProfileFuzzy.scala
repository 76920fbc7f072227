package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decide fuzzy_pairs_cname's fate with a measurement (r17 verdict #7):
  * five rounds of passive re-measurement (1042.9 → 829.0 s at sf10)
  * never tested an actual lever. The two candidates:
  *
  *  - q = 3 grams instead of the default q = 2 — the Ed-Join prefix is
  *    the d·q+1 RAREST grams, and on a long low-entropy domain
  *    (`Customer#%09d`: an 18-char constant prefix + 9 digits) the
  *    bigram alphabet is ~100 digit pairs, so every prefix gram is
  *    common and the candidate join explodes; trigrams are ~10× rarer
  *    each, shrinking candidates at the cost of one more prefix gram
  *    (d·q+1 = 4 vs 3) and a longer still-vacuous short-string band
  *    (len ≤ q(d+1)−1 = 5 < 18 — unused on this domain either way).
  *    Correctness at q=3 is already spec-pinned (FuzzyJoinSpec
  *    "d in {1, 2, 3} and q in {2, 3}").
  *  - fuzzyPairsPersisted — caches the prepped projection; expected
  *    marginal here because the input is a trivial format_string over
  *    custkey, but measured so the decision is on the record.
  *
  * Usage: ProfileFuzzy <sfDir> [reps=1] [variants=q2,q3,persisted]
  * Prints one JSON line.
  */
object ProfileFuzzy {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileFuzzy <sfDir> [reps] [variants]")
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 1
    val variants = if (args.length > 2) args(2).split(",").toSeq
                   else Seq("q2", "q3", "persisted")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Conf.applyTuned(spark)
    def log(s: String): Unit = System.err.println(s"[fuzzy_ab] $s")

    // the bench side-line's exact input: key-derived names (GenScale
    // replicates c_name verbatim, which inflates TRUE pairs
    // quadratically — a generator artifact; the key-derived domain
    // grows linearly). See Bench lib_additions4.
    val cust = graft.Tables.customerKernel(spark, sfDir)
      .select(col("c_custkey").as("id"),
        format_string("Customer#%09d", col("c_custkey")).as("s"))
    val n = cust.count()
    log(s"domain: $n distinct names from $sfDir")

    def evaluate(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def run(label: String)(f: () => Unit): Double = {
      val ts = (1 to reps).map { i =>
        val t0 = System.nanoTime(); f()
        val t = (System.nanoTime() - t0) / 1e9
        log(f"$label rep$i $t%.1f s"); t
      }.sorted
      ts(ts.size / 2)
    }

    val results = variants.map {
      case "q2" => "q2" -> run("q2 (default)")(() => evaluate(
        graft.operators.FuzzyJoin.fuzzyPairs(cust, "id", "s", maxDist = 1)))
      case "q3" => "q3" -> run("q3")(() => evaluate(
        graft.operators.FuzzyJoin.fuzzyPairs(cust, "id", "s", maxDist = 1,
          q = 3)))
      case "persisted" => "persisted_q2" -> run("persisted q2")(() => {
        val (df, h) = graft.operators.FuzzyJoin.fuzzyPairsPersisted(
          cust, "id", "s", maxDist = 1)
        try evaluate(df) finally h.close()
      })
      case other => sys.error(s"unknown variant $other")
    }
    // pair-count parity across the variants actually run this session
    // (same semantics whatever the blocking): one count per variant
    val counts = variants.map {
      case "q2" => graft.operators.FuzzyJoin.fuzzyPairs(
        cust, "id", "s", maxDist = 1).count()
      case "q3" => graft.operators.FuzzyJoin.fuzzyPairs(
        cust, "id", "s", maxDist = 1, q = 3).count()
      case "persisted" => graft.operators.FuzzyJoin.fuzzyPairs(
        cust, "id", "s", maxDist = 1).count()
    }
    require(counts.distinct.size == 1,
      s"variants disagree on the pair count: ${variants.zip(counts)}")
    log(s"pair count parity: ${counts.head} pairs from every variant")
    println(s"""{"metric":"fuzzy_ab","sf_dir":"$sfDir","names":$n,""" +
      s""""pairs":${counts.head},""" +
      results.map { case (k, v) =>
        f""""${k}_s":$v%.1f""" }.mkString(",") + "}")
    spark.stop()
  }
}
