package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins tools/scaling_report.py's wave detector and comparator logic via
  * its own --selftest (synthetic forensics built from the r16 evidence:
  * the 169-vs-1657 near-miss gap must be labeled, a low gap with clean
  * reps must not be, a wave_rerun line is parsed and preferred only when
  * its own gap sample is healthy, and the alias rung round-trips). The
  * tool is part of the measurement surface — a silent detector
  * regression would mislabel the next scale leg — so its contract lives
  * in the sbt suite next to the engine's. */
class ToolsSelftestSpec extends AnyFunSuite {
  test("scaling_report.py --selftest passes") {
    val repo = Forensics.repoRoot()
    val script = new java.io.File(repo, "tools/scaling_report.py")
    assume(script.isFile, s"missing $script")
    val pb = new ProcessBuilder("python3", script.getPath, "--selftest")
    pb.directory(repo)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
    val code = p.waitFor()
    assert(code == 0 && out.contains("selftest pass"),
      s"scaling_report selftest failed (exit $code):\n$out")
  }
}
