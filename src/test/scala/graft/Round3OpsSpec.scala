package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, TextOps, TimeSeriesQueries}

/** Round-3 operators: winsorize, Fourier encodings, STL decomposition,
  * event-pattern matching, PII redaction, stratified sampling, length
  * histogram. */
class Round3OpsSpec extends SparkSpec {

  test("winsorize clips exactly to the per-key [p05, p95] band") {
    val out = TimeSeriesQueries.tsWinsorize(spark, sf).cache()
    // clipped values sit strictly inside the band; unclipped pass through
    val bad = out.filter(
      (col("clipped") === 0 && col("v_wins") =!= round(col("value"), 6)) ||
      (col("clipped") === 1 && col("v_wins") === round(col("value"), 6)))
    assert(bad.count() == 0)
    // about 10% of each trajectory gets clipped (5% per tail, interpolated)
    val rate = out.agg(avg(col("clipped"))).head.getDouble(0)
    assert(rate > 0.05 && rate < 0.15, s"clip rate $rate")
    out.unpersist()
  }

  test("fourier features lie on the unit circle and match calendar hour") {
    val out = TimeSeriesQueries.tsFourierFeatures(spark, sf)
    val offCircle = out.filter(
      abs(col("hod_sin") * col("hod_sin") + col("hod_cos") * col("hod_cos") - 1.0) > 1e-4 ||
      abs(col("dow_sin") * col("dow_sin") + col("dow_cos") * col("dow_cos") - 1.0) > 1e-4)
    assert(offCircle.count() == 0)
    // angle at exact midnight is 0 → sin 0, cos 1
    val midnight = out.filter(pmod(col("ts_us"), lit(86400000000L)) === 0)
    assert(midnight.filter(col("hod_sin") =!= 0.0 || col("hod_cos") =!= 1.0).count() == 0)
  }

  test("stl decomposition reconstructs: v = trend + seasonal + resid") {
    val out = TimeSeriesQueries.tsStlDecompose(spark, sf)
    val bad = out.filter(
      abs(col("v") - (col("trend") + col("seasonal") + col("resid"))) > 1e-5)
    assert(bad.count() == 0)
    // seasonal is the group mean of the detrended series, so residuals
    // average to zero within each (user, hour-of-day) group by construction
    val drift = out
      .withColumn("hod", pmod(expr("bucket_us div 3600000000"), lit(24)))
      .groupBy(col("user_id"), col("hod")).agg(avg(col("resid")).as("m"))
      .filter(abs(col("m")) > 1e-5)
    assert(drift.count() == 0)
  }

  test("event-pattern counts agree with a per-user funnel reachability check") {
    val out = Relational.qEventPattern(spark, sf).cache()
    // converted=1 exactly when some view precedes some purchase with no
    // error between them — cross-check on a small independent formulation
    val d = Tables.events(spark, sf)
      .withColumn("ts_us", unix_micros(col("ts")))
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .collect()
      .groupBy(_.getLong(0))
    val wantConverted = d.map { case (uid, rows) =>
      val seq = rows.sortBy(r => (r.getLong(1), r.getLong(2)))
        .map(_.getString(3).head).mkString
      uid -> (if ("v[cs]*p".r.findFirstIn(seq).isDefined) 1 else 0)
    }
    val got = out.select("user_id", "converted").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == wantConverted)
    out.unpersist()
  }

  test("pii redaction removes every targeted pattern and counts them") {
    val out = TextOps.textPiiRedact(spark, sf).cache()
    val leftover = out.filter(
      col("redacted").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}") ||
      col("redacted").rlike("\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b") ||
      col("redacted").rlike("\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b") ||
      col("redacted").rlike("\\+[0-9]{7,}"))
    assert(leftover.count() == 0)
    // injected PII is found: every 3rd doc has 2 emails, every 7th has ip+ssn+phone
    assert(out.filter(pmod(col("doc_id"), lit(3)) === 0 && col("n_email") < 2).count() == 0)
    assert(out.filter(pmod(col("doc_id"), lit(7)) === 0 &&
      (col("n_ip") < 1 || col("n_ssn") < 1 || col("n_phone") < 1)).count() == 0)
    out.unpersist()
  }

  test("stratified sample keeps exactly ceil(frac·n) docs per stratum") {
    val docs = Tables.documents(spark, sf)
    val out = TextOps.stratifiedSample(docs, "lang", 0.2)
    val got = out.groupBy(col("lang")).agg(count(lit(1)).as("k"),
      max(col("n_stratum")).as("n"))
    val bad = got.filter(col("k") =!= ceil(col("n") * 0.2).cast("long"))
    assert(bad.count() == 0)
    // deterministic: same result on rerun
    assert(TextOps.stratifiedSample(docs, "lang", 0.2).exceptAll(out).count() == 0)
  }

  test("repetition score: known ratio on a hand-built repetitive doc") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b c a b c a b c"), (2L, "one two three four five"))
      .toDF("doc_id", "text")
    val got = TextOps.repetitionScore(docs, "text")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2),
        r.getDouble(3), r.getInt(4))).toMap
    // 9 tokens -> 7 trigram slots, 3 distinct trigrams -> 1 - 3/7
    assert(got(1L) == ((7, 3, math.rint((1.0 - 3.0 / 7) * 1e6) / 1e6, 1)))
    // all-distinct doc: ratio 0, not repetitive
    assert(got(2L) == ((3, 3, 0.0, 0)))
  }

  test("pack chunks: offsets are dense per language and chunk-local offsets bounded") {
    val out = TextOps.docPackChunks(spark, sf).cache()
    // every doc's offset equals the sum of preceding docs' token counts
    val bad = out.filter(col("chunk_off") >= 512 || col("chunk_off") < 0 ||
      col("chunk_id") =!= expr("off div 512"))
    assert(bad.count() == 0)
    // total stream length per lang = last offset + last doc's tokens
    val byLang = out.groupBy(col("lang")).agg(
      sum(col("n_tok")).as("total"),
      max(col("off") + col("n_tok")).as("end"))
    assert(byLang.filter(col("total") =!= col("end")).count() == 0)
    out.unpersist()
  }

  test("contamination: probes self-match fully, flags require shared trigrams") {
    val out = TextOps.docContamination(spark, sf).cache()
    // the probe row overlaps itself completely and is never 'contaminated'
    val probes = out.filter(col("is_probe") === 1)
    assert(probes.filter(col("contaminated") === 1).count() == 0)
    assert(probes.filter(col("n_overlap") === 0).count() == 0)
    // non-probe flags appear iff overlap >= 1
    val bad = out.filter(col("is_probe") === 0 &&
      (col("contaminated") === 1) =!= (col("n_overlap") >= 1))
    assert(bad.count() == 0)
    out.unpersist()
  }

  test("length histogram covers every document exactly once") {
    val docs = Tables.documents(spark, sf)
    val out = TextOps.textLengthHist(spark, sf)
    val total = out.agg(sum(col("n_docs"))).head.getLong(0)
    assert(total == docs.count())
    // cumulative is monotone and ends at the total
    val last = out.orderBy(col("bucket_lo").desc).select("cum_docs").head.getLong(0)
    assert(last == total)
  }
}
