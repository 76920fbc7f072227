package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical check of the SURVEY.md component tally (r10, after the r8
  * and r9 verdicts each caught a hand-maintained tally off by one, in
  * opposite directions): parse the §2 operator tables and §2.6 source
  * bullets, and fail the build if the FIRST stated
  * "N §2 rows + M sources = **T**" line disagrees with the actual count.
  * The first match is the current round's §3.5 section — history
  * sections keep their (possibly superseded) numbers for the record. */
class SurveyTallySpec extends AnyFunSuite {

  private lazy val lines: Seq[String] = {
    val f = new java.io.File(Forensics.repoRoot(), "SURVEY.md")
    assert(f.isFile, s"SURVEY.md not found at ${f.getPath}")
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.getLines().toVector finally src.close()
  }

  /** Data rows of the §2.1-§2.5 tables: inside the §2 section, a table
    * line that is neither a header (`| # |` / `| source |`) nor a
    * separator (`|---|`). */
  private def tableRows: Int = {
    var in2 = false
    var n = 0
    lines.foreach { l =>
      if (l.startsWith("## §2 ")) in2 = true
      else if (l.startsWith("## §3")) in2 = false
      else if (in2 && l.startsWith("|") && !l.startsWith("| #") &&
        !l.startsWith("|-") && !l.startsWith("| source")) n += 1
    }
    n
  }

  /** §2.6 sources: top-level bullets (wrapped continuations are
    * indented, so they don't double-count). */
  private def sourceBullets: Int = {
    var in26 = false
    var n = 0
    lines.foreach { l =>
      if (l.startsWith("### §2.6")) in26 = true
      else if (in26 && l.startsWith("## ")) in26 = false
      else if (in26 && l.startsWith("- ")) n += 1
    }
    n
  }

  test("the stated component tally matches the actual §2 table rows + sources") {
    val stated = raw"(\d+) §2 rows \+\s*(\d+) sources = \*\*(\d+)\*\*".r
    val first = lines.iterator.flatMap(stated.findFirstMatchIn).nextOption()
    assert(first.isDefined,
      "no 'N §2 rows + M sources = **T**' tally line found in SURVEY.md")
    val m = first.get
    val (sr, ss, st) = (m.group(1).toInt, m.group(2).toInt, m.group(3).toInt)
    val (ar, as_) = (tableRows, sourceBullets)
    assert(sr == ar, s"SURVEY claims $sr §2 rows but the tables have $ar")
    assert(ss == as_, s"SURVEY claims $ss sources but §2.6 lists $as_")
    assert(st == sr + ss, s"SURVEY tally $st != $sr + $ss")
    assert(st == ar + as_, s"SURVEY tally $st != actual ${ar + as_}")
  }

  test("sanity: the parser actually sees the five §2 tables and the source bullets") {
    // guards the parser itself — a silent regex/structure drift that
    // counted 0 rows would make the tally test vacuously green
    assert(tableRows >= 100, s"only $tableRows §2 rows parsed — parser broken?")
    assert(sourceBullets == 8, s"$sourceBullets §2.6 bullets parsed")
  }
}
