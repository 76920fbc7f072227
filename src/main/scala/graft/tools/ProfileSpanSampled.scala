package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe for the r14 `sharedSpanPairsSampled` regression hunt: the
  * sf10 side-line moved 6.6 → 16 s when the mega sampler swapped from a
  * row_number window to `smallest_k` AND the span merge started carrying
  * (pos, df) structs. This times the operator's ISOLATED variants so the
  * two changes can be attributed separately:
  *   cur     — HEAD: smallest_k sampler + struct (pos, df) merge
  *   winOld  — r13: row_number sampler + int merge, group-max df
  *   skOld   — hybrid: smallest_k sampler + int merge, group-max df
  * Usage: ProfileSpanSampled [sfDir] [reps]. Not part of the gated
  * surface; variant bodies duplicate operator internals on purpose
  * (probe-only code — the operator itself stays single-source). */
object ProfileSpanSampled {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    // optional 3rd arg: run ONE variant (cur|win|hyb) so each variant can
    // get a fresh JVM — cross-variant heap state polluted the first A/B
    val only = if (args.length > 2) Some(args(2)) else None
    val n = 15; val maxDf = 50; val sampleDocs = 8
    val spark = SparkSession.builder()
      .appName("profile-span-sampled").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Conf.applyTuned(spark)
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))

    def mergeInts(sortedPs: Column): Column =
      aggregate(sortedPs, array().cast("array<struct<start:int,end:int>>"),
        (acc, p) => {
          val last = element_at(acc, -1)
          when(size(acc) > 0 && p <= last.getField("end"),
            concat(slice(acc, lit(1), size(acc) - 1),
              array(struct(last.getField("start").as("start"),
                (p + n).cast("int").as("end")))))
            .otherwise(concat(acc, array(struct(p.cast("int").as("start"),
              (p + n).cast("int").as("end")))))
        })

    def base(sampler: DataFrame => DataFrame): DataFrame = {
      val grams = docs.select(col("doc_id"),
        posexplode(graft.functions.ShingleHashSeq(
          lower(trim(col("text"))), n)).as(Seq("pos", "h")))
      val dfs = grams.groupBy(col("h"))
        .agg(count_distinct(col("doc_id")).as("_df"))
        .filter(col("_df") >= 2)
      val hits = grams.join(dfs, Seq("h"))
      val small = hits.filter(col("_df") <= maxDf)
      val megaSample = sampler(
        hits.filter(col("_df") > maxDf).select(col("h"), col("doc_id")).distinct())
      val mega = hits.filter(col("_df") > maxDf)
        .join(megaSample, Seq("h", "doc_id"))
      val all = small.unionByName(mega)
      val ga = all.select(col("h"), col("doc_id").as("id_a"),
        col("pos").as("pos_a"), col("_df"))
      val gb = all.select(col("h"), col("doc_id").as("id_b"), col("pos").as("pos_b"))
      ga.join(gb, Seq("h")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          (col("pos_a") - col("pos_b")).as("_diag"), col("pos_a"), col("_df"))
        .groupBy(col("id_a"), col("id_b"), col("_diag"))
        .agg(sort_array(collect_list(col("pos_a"))).as("_ps"),
          max(col("_df")).as("span_df"))
        .select(col("id_a"), col("id_b"), col("span_df"),
          explode(mergeInts(col("_ps"))).as("_s"))
    }
    val winSampler: DataFrame => DataFrame = d => d
      .withColumn("_rk", row_number().over(Window.partitionBy(col("h"))
        .orderBy(xxhash64(col("doc_id")), col("doc_id"))))
      .filter(col("_rk") <= sampleDocs).select(col("h"), col("doc_id"))
    val skSampler: DataFrame => DataFrame = d => d
      .groupBy(col("h"))
      .agg(graft.functions.SmallestK.smallestK(
        struct(xxhash64(col("doc_id")).as("rk"), col("doc_id").as("id")),
        sampleDocs).as("_ks"))
      .select(col("h"), explode(col("_ks")).as("_kv"))
      .select(col("h"), col("_kv.id").as("doc_id"))

    def time(label: String, f: () => DataFrame): Unit = {
      graft.Bench.evaluate(f()) // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.Bench.evaluate(f())
        (System.nanoTime() - t0) / 1e9
      }.sorted
      System.err.println(f"[pss] $label med=${ts(reps / 2)}%.3f s " +
        s"all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    if (only.forall(_ == "cur"))
      time("cur_smallestk_structdf", () =>
        graft.operators.Dedup.sharedSpanPairsSampled(docs, "doc_id", "text",
          n = n, maxDf = maxDf, sampleDocs = sampleDocs))
    if (only.forall(_ == "win"))
      time("old_window_groupmaxdf", () => base(winSampler))
    if (only.forall(_ == "hyb"))
      time("hyb_smallestk_groupmaxdf", () => base(skSampler))
    spark.stop()
  }
}
