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

  test("gated query set is the 90 the line budget was sized for") {
    // adding a gated query without re-checking the budget is exactly the
    // failure mode this suite exists to catch — update the budget story
    // (or prefer a lib-level operator) before bumping this number
    assert(names.size == 90, s"query count changed: ${names.size}")
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

  test("worst-case 3-digit values still emit a parseable line <= 1980 chars") {
    // 999.99 is the worst 2dp rendering (no strippable zeros); with 90
    // queries the 2dp map cannot fit, so the ladder must degrade — and
    // whatever rung it lands on must still fit the archive window
    val results = names.map(_ -> 999.99).toMap
    val line = Bench.formatLine(results, Nil, "sf0.1")
    assert(line.length <= 1980, s"degrade ladder failed: len=${line.length}")
    assert(line.startsWith("""{"metric":"total","value":"""))
    // the 1dp rung (999.99 → "1000" after zero-strip) is the expected
    // landing spot: the per-query map must survive degradation, not
    // vanish, and the too-long 2dp rendering must be gone
    assert(line.contains("\"" + names.head + "\":"),
      s"per-query map dropped entirely:\n$line")
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
