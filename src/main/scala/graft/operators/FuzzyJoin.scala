package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) join with COMPLETE q-gram blocking — the
  * record-linkage / entity-resolution primitive: all pairs (a, b) with
  * `lev(a, b) <= maxDist`, without the O(n²) cross product.
  *
  * The blocking is the positional q-gram count filter (Gravano et al.
  * 1999, "Approximate String Joins in a Database (Almost) for Free"):
  * one edit operation destroys at most q of a string's |s| − q + 1
  * q-grams, so two strings within edit distance d share at least
  * `max(|a|,|b|) − q + 1 − d·q` q-grams at position distance ≤ d. The
  * join therefore explodes positional q-grams, equi-joins on the gram
  * (with the position band as a residual condition), counts matches per
  * id pair, keeps pairs meeting the bound, and ONLY THEN verifies the
  * exact Levenshtein distance (with Spark's thresholded `levenshtein`,
  * which abandons a row early once d is exceeded). Join-row counting can
  * only OVERcount the lemma's matched-gram count (a repeated gram may
  * match several positions), so the filter admits false candidates —
  * killed by the verify — and can never drop a true pair.
  *
  * The bound is vacuous when `max(|a|,|b|) < q·(d+1)` — for such SHORT
  * pairs no number of shared grams is guaranteed. Completeness is kept by
  * a partition, not a prayer: pairs where BOTH strings are short (length
  * ≤ q·(d+1) − 1, which also covers gram-less strings shorter than q) go
  * through a length-banded bucket join among the shorts only (bounded:
  * short strings live in ≤ q·(d+1) length buckets and each probes 2d+1
  * of them), while any pair involving a longer string has bound ≥ 1 and
  * is caught by the gram path. The two paths are disjoint by the same
  * max-length test, so no pair is emitted twice.
  *
  * Scale shape (the minhashPairs discipline): the gram exchange carries
  * (id, len, pos, gram) — ids-only through the heavy shuffle, strings
  * re-attached to the SURVIVING candidates by two id joins before the
  * verify. Grams are length-q substrings, so the exchanged payload is
  * O(|s|) per string either way, but candidate verification never drags
  * full strings through the gram-count aggregation. Like every banded
  * generator in this file's family, the candidate count tracks the true
  * match rate plus the filter's false-positive rate, not n². */
object FuzzyJoin {

  private def grams(s: Column, q: Int): Column =
    transform(sequence(lit(0), length(s) - q),
      i => struct(i.as("pos"), s.substr(i + 1, lit(q)).as("g")))

  /** All (id_a, id_b, dist) with `lev(a.strCol, b.strCol) <= maxDist`,
    * for non-null strings. Both inputs need (`idCol`, `strCol`); ids must
    * be unique per side (it's a join key). Matching is case-sensitive —
    * normalize (e.g. `lower(trim(...))`) upstream if wanted. */
  def fuzzyJoin(left: DataFrame, right: DataFrame, idCol: String,
                strCol: String, maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 0, s"fuzzy join: maxDist must be >= 0, got $maxDist")
    require(q >= 1, s"fuzzy join: q must be >= 1, got $q")
    val shortMax = q * (maxDist + 1) - 1 // longest length with a vacuous bound
    def prep(df: DataFrame, side: String): DataFrame =
      df.select(col(idCol).as(s"id_$side"), col(strCol).as(s"s_$side"))
        .filter(col(s"s_$side").isNotNull)
        .withColumn(s"len_$side", length(col(s"s_$side")))
    val l = prep(left, "a")
    val r = prep(right, "b")

    // ---- gram path: every pair whose LONGER string exceeds shortMax ----
    // Strings shorter than q have no grams and are safely absent here: a
    // (gram-less, long) pair has max = len_long ≥ q(d+1), so
    // lev ≥ |len diff| ≥ q(d+1) − (q−1) = qd + 1 > d — never a match —
    // and (gram-less, short) pairs are the short path's job.
    def gramSide(df: DataFrame, side: String): DataFrame =
      df.filter(col(s"len_$side") >= q)
        .select(col(s"id_$side"), col(s"len_$side"),
          explode(grams(col(s"s_$side"), q)).as("t"))
        .select(col(s"id_$side"), col(s"len_$side"),
          col("t.pos").as(s"pos_$side"), col("t.g").as(s"g_$side"))
    val lg = gramSide(l, "a")
    val rg = gramSide(r, "b")
    // every column is side-suffixed, so the fuzzyPairs self-join cannot
    // hit ambiguous-attribute resolution
    val counted = lg.join(rg,
        col("g_a") === col("g_b") &&
          abs(col("pos_a") - col("pos_b")) <= maxDist &&
          abs(col("len_a") - col("len_b")) <= maxDist &&
          greatest(col("len_a"), col("len_b")) > shortMax)
      .groupBy(col("id_a"), col("id_b"), col("len_a"), col("len_b"))
      .agg(count(lit(1)).as("_shared"))
      .filter(col("_shared") >=
        greatest(col("len_a"), col("len_b")) - (q - 1) - maxDist * q)
      .select(col("id_a"), col("id_b"))
    val gramPairs = counted
      .join(l.select(col("id_a"), col("s_a")), Seq("id_a"))
      .join(r.select(col("id_b"), col("s_b")), Seq("id_b"))

    // ---- short path: both strings ≤ shortMax, length-banded buckets ----
    val ls = l.filter(col("len_a") <= shortMax)
      .withColumn("_lb", explode(sequence(
        greatest(col("len_a") - maxDist, lit(0)), col("len_a") + maxDist)))
    val rs = r.filter(col("len_b") <= shortMax)
    val shortPairs = ls.join(rs, col("_lb") === col("len_b"))
      .select(col("id_a"), col("id_b"), col("s_a"), col("s_b"))

    gramPairs.unionByName(shortPairs)
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Self-join form: unordered near-pairs within one frame
    * (id_a < id_b, so each pair once and no self-matches). */
  def fuzzyPairs(df: DataFrame, idCol: String, strCol: String,
                 maxDist: Int, q: Int = 2): DataFrame =
    fuzzyJoin(df, df, idCol, strCol, maxDist, q)
      .filter(col("id_a") < col("id_b"))
}
