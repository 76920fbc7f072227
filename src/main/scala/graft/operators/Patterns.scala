package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic MATCH_RECOGNIZE-style sequential pattern matching (r10,
  * SURVEY §2.2 row 27o) — the generalization of [[Relational.qEventPattern]]
  * from one hard-wired conversion regex to an arbitrary caller-supplied
  * pattern, with match POSITIONS mapped back to event timestamps (the part
  * `regexp_count` cannot do, and the part MATCH_RECOGNIZE consumers
  * actually use: when did the match start/end).
  *
  * Model: each event maps to a one-character symbol (the first char of
  * `symbolCol`, exactly like q_event_pattern's event-code alphabet); each
  * key's events collapse, ordered by (`tsCol`, symbol), into one symbol
  * string; a Java regex finds NON-OVERLAPPING matches left to right
  * (standard `Matcher.find` semantics — the same semantics DuckDB's
  * `regexp_extract_all` and the batch q_event_pattern oracle use, so the
  * per-key match COUNT cross-checks against q_event_pattern exactly).
  *
  * Scale shape: one shuffle (groupByKey on the sequence key); the regex
  * scan is map-side on the collapsed per-key string; output carries only
  * matches, never the sequence. Per-key state is the key's event count —
  * bounded by trajectory/session length, not table size (same contract as
  * q_event_pattern and sessionize; pair with ts_sessionize to bound it
  * further on open-ended keys).
  */
object Patterns {

  case class PatternMatch(key: Long, match_idx: Int, start_idx: Int,
                          end_idx: Int, start_us: Long, end_us: Long,
                          symbols: String)

  /** @param keyCol    sequence key (castable to long)
    * @param tsCol     total order within a key (castable to long, e.g.
    *                  epoch µs); ties break by symbol for determinism
    * @param symbolCol per-event symbol — first character is used.
    *                  NULL/empty-symbol events are EXCLUDED from the
    *                  sequence (they carry no letter of the alphabet and
    *                  a placeholder would let `.` match missing data) —
    *                  which also means adjacency is over the SYMBOLED
    *                  events only: "vp" matches v…p with an unsymboled
    *                  event in between. Callers needing missing events
    *                  to break adjacency should map them to an explicit
    *                  sentinel symbol outside the pattern's alphabet
    *                  before calling
    * @param pattern   Java regex over the symbol alphabet; validated on
    *                  the driver so a bad pattern fails at plan time, not
    *                  inside an executor. Zero-length matches are
    *                  discarded (an empty match has no event span). */
  def matchRecognize(df: DataFrame, keyCol: String, tsCol: String,
                     symbolCol: String, pattern: String): DataFrame = {
    val compiled = java.util.regex.Pattern.compile(pattern)
    val spark = df.sparkSession
    import spark.implicits._
    // events with a NULL/empty symbol carry no letter of the alphabet:
    // they are EXCLUDED from the sequence rather than mapped to a
    // placeholder char — a placeholder would make regex wildcards (`.`)
    // match missing data, and a null symbol also can't participate in
    // the sort tiebreak (self-review: the old placeholder was a raw NUL
    // that additionally made the file binary to git)
    val rows = df.select(col(keyCol).cast("long"), col(tsCol).cast("long"),
        substring(col(symbolCol), 1, 1)).as[(Long, Long, String)]
      .filter(r => r._3 != null && r._3.nonEmpty)
    rows.groupByKey(_._1).flatMapGroups { (k, it) =>
      val evs = it.toArray
      scala.util.Sorting.stableSort(evs,
        (a: (Long, Long, String), b: (Long, Long, String)) =>
          a._2 < b._2 || (a._2 == b._2 && a._3 < b._3))
      val sb = new java.lang.StringBuilder(evs.length)
      evs.foreach(e => sb.append(e._3.charAt(0)))
      val s = sb.toString
      val m = compiled.matcher(s)
      val out = scala.collection.mutable.ArrayBuffer.empty[PatternMatch]
      while (m.find()) {
        if (m.end() > m.start()) {
          out += PatternMatch(k, out.length, m.start(), m.end() - 1,
            evs(m.start())._2, evs(m.end() - 1)._2,
            s.substring(m.start(), m.end()))
        }
      }
      out.iterator
    }.toDF()
  }
}
