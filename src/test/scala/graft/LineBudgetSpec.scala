package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver archives only the last ~2000 chars of bench output and
  * parses the final line as JSON — so the emitted line must fit 1980 chars
  * under WORST-case per-query values, with the degrade ladder (2dp map →
  * 1dp map → headline+failures → headline) absorbing the overflow. The r7
  * line sat at ~1956/2000 chars; this spec exercises the ladder before the
  * driver ever needs it. */
class LineBudgetSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keySet.toSeq.sorted

  test("gated query set is the 94 the line budget was sized for") {
    // adding a gated query without re-checking the budget is exactly the
    // failure mode this suite exists to catch — update the budget story
    // (or prefer a lib-level operator) before bumping this number
    // (r13: 90 → 92 with fuzzy_pairs + curation_gate; r14: 92 → 93 with
    // curation_recipe; r15: 93 → 94 with curation_increment; the
    // worst-case ladder tests below re-size the budget with the real
    // name set)
    assert(names.size == 94, s"query count changed: ${names.size}")
  }

  test("real names + realistic centisecond values fit with full detail") {
    val results = names.map(_ -> 3.21).toMap
    val line = Bench.formatLine(results, Nil, "sf0.1")
    assert(line.length <= 1980, s"len=${line.length}")
    // full per-query detail survived (no degrade)
    assert(names.forall(n => line.contains("\"" + n + "\":")))
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.endsWith(""","sf":"sf0.1"}"""))
  }

  test("worst realistic values (two digits, no strippable zeros) keep the per-query map") {
    // 99.99 bounds every per-query value ever recorded on a DRIVER leg
    // (slowest gated query across 12 rounds: ~1.7 s at sf0.1; the sf10
    // probe's worst is ~35 s — still two digits — and the one former
    // >100 s side-line, the fuzzy join, is now a gated query with a
    // FIXED key domain precisely so its value cannot grow with SF).
    // The map must survive at some rung for any value in this range.
    val results = names.map(_ -> 99.99).toMap
    val line = Bench.formatLine(results, Nil, "sf0.1")
    assert(line.length <= 1980, s"len=${line.length}")
    assert(names.forall(n => line.contains("\"" + n + "\":")),
      s"per-query map dropped at realistic values:\n$line")
  }

  test("pathological 4-digit values degrade to a parseable headline, never overflow") {
    // at 92 queries an all-999.99 map no longer fits ANY rendering rung
    // (r13: the r12 spec expected the 1dp rung to hold at 90 names; two
    // more names pushed 1dp past the window too). The ladder's job here
    // is a clean landing: parseable headline, inside the archive window.
    val results = names.map(_ -> 999.99).toMap
    val line = Bench.formatLine(results, Nil, "sf0.1")
    assert(line.length <= 1980, s"degrade ladder failed: len=${line.length}")
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(!line.contains("999.99"), s"2dp rung chosen but does not fit:\n$line")
  }

  test("mass failure degrades to a headline, never overflows") {
    // every query failed with a huge negative wall: failures list + map
    // can exceed the window together; the ladder may drop the map and
    // even the failures list, but the headline must survive intact
    val results = names.map(_ -> -999.99).toMap
    val line = Bench.formatLine(results, names.toList, "sf0.1")
    assert(line.length <= 1980, s"len=${line.length}")
    assert(line.startsWith("""{"metric":"total","value":"""))
  }

  test("trailing-zero stripping keeps values valid JSON numbers") {
    val line = Bench.formatLine(
      Map("a" -> 0.50, "b" -> 1.00, "c" -> 0.001, "d" -> 12.30), Nil, "sf0.1")
    assert(line.contains("\"a\":0.5,\"b\":1,\"c\":0,\"d\":12.3"), line)
  }
}
