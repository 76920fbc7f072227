package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, StandardCopyOption}

/** Test-fixture side files that simulate EXTERNAL inputs the reference
  * engine receives from outside (and that the driver's synthetic testdata
  * does not ship).
  *
  * Generation lives here — called once from Verify/Bench/spec SETUP, never
  * from inside a timed or gated query function — so the operators
  * themselves stay pure read+join. The bounded driver-side collect in
  * [[ensureRulLabels]] (ONE row per trajectory) is fixture generation, not
  * an operator.
  */
object Fixtures {

  /** Base directory for side files: configurable absolute base (so two
    * runs sharing a CWD can't collide), defaulting to the system temp dir. */
  private def baseDir: Path = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SIDE_DIR",
      s"${System.getProperty("java.io.tmpdir")}/graft-side")
    java.nio.file.Paths.get(base)
  }

  /** Absolute path of the per-sf RUL label side file (may not exist yet —
    * [[ensureRulLabels]] creates it). Keyed by the sf basename PLUS a
    * digest of the canonical path: two workspaces whose sf dirs share a
    * basename (or regenerated data under the same name) must not clobber
    * each other's label sets — a stale file would silently drop rows from
    * the inner label join while the oracle recomputes from its own
    * events. */
  def rulLabelPath(sfDir: String): String = {
    val f = new java.io.File(sfDir)
    val canonical = scala.util.Try(f.getCanonicalPath).getOrElse(f.getAbsolutePath)
    val digest = (scala.util.hashing.MurmurHash3.stringHash(canonical)
      & 0xFFFFFFFFL).toHexString
    baseDir.resolve(s"rul_labels_${f.getName}_$digest.txt")
      .toAbsolutePath.toString
  }

  // one write per (resolved path) per JVM — specs and mains can all call
  // ensure without re-collecting or re-writing
  private val written =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Simulates the reference's external RUL label files (`RUL_FD00x.txt`,
    * turbofan.py:100-103): a space-separated side file with one
    * `(trajectory_id, rul)` line per trajectory, generated
    * deterministically from the trajectory ids (`(id·37 + 11) mod 200`) so
    * the DuckDB oracle can recompute the same values without seeing the
    * file. Written to a temp file and atomically moved into place, so two
    * concurrent runs sharing a base dir and sf race benignly (last full
    * write wins; readers never observe a partial file). */
  def ensureRulLabels(spark: SparkSession, sfDir: String): String = {
    val target = rulLabelPath(sfDir)
    // memoize only AFTER the atomic move succeeds: marking up front would
    // let one failed write (unwritable base dir, full disk) poison every
    // later setup call in the JVM into a silent no-op
    if (!written.contains(target)) {
      Files.createDirectories(baseDir)
      val ids = Tables.events(spark, sfDir).select(col("user_id")).distinct()
        .orderBy(col("user_id")).collect()
        .map(_.get(0).asInstanceOf[Number].longValue())
      val content = ids.map(id => s"$id ${(id * 37 + 11) % 200}")
        .mkString("", "\n", "\n")
      val tmp = Files.createTempFile(baseDir, "rul_labels_", ".tmp")
      try {
        Files.write(tmp, content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        Files.move(tmp, java.nio.file.Paths.get(target),
          StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      } catch { case t: Throwable =>
        scala.util.Try(Files.deleteIfExists(tmp))
        throw t
      }
      written.add(target)
    }
    target
  }
}
