package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Durable per-round forensics for the bench/verify mains.
  *
  * The driver archives only the LAST ~2000 characters of a run's output —
  * the r7 per-rep GC lines proved the point by surviving for exactly one
  * (alphabetically last) query. Everything evidentiary therefore also goes
  * to a file under the repo root, named for the round and committed with
  * it, so spikes can be adjudicated from the record instead of re-run
  * folklore.
  */
object Forensics {

  /** Current round number inferred from the driver's committed artifacts
    * (`BENCH_r{N}.json` / `CORRECTNESS_r{N}.json` in the cwd, which is the
    * repo root when the driver or sbt runs the mains): max existing N + 1.
    * None when no artifact is visible (e.g. run from elsewhere). */
  def roundNumber(): Option[Int] = {
    val pat = "(?:BENCH|CORRECTNESS)_r(\\d+)\\.json".r
    Option(new java.io.File(".").listFiles())
      .map(_.toSeq.flatMap(f =>
        pat.findFirstMatchIn(f.getName).map(_.group(1).toInt)))
      .filter(_.nonEmpty).map(_.max + 1)
  }

  private def roundName(stem: String, ext: String): String = roundNumber()
    .map(n => f"${stem}_r$n%02d.$ext").getOrElse(s"$stem.$ext")

  def benchFile(): String = roundName("BENCH_FORENSICS", "txt")
  def verifyTimingsFile(): String = roundName("VERIFY_TIMINGS", "json")

  /** Stderr + file tee. The file is truncated on open and every line is
    * flushed immediately, so a run killed mid-bench still leaves all
    * evidence gathered so far on disk. A file-open failure degrades to
    * stderr-only — forensics must never abort the measurement they
    * document. */
  final class Tee(path: Option[String]) {
    private val out: Option[java.io.PrintWriter] = path.flatMap { p =>
      try Some(new java.io.PrintWriter(new java.io.FileWriter(p, false), true))
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[forensics] cannot open $p ($e); stderr only")
        None
      }
    }
    def log(s: String): Unit = { System.err.println(s); out.foreach(_.println(s)) }
    def close(): Unit = out.foreach(_.close())
  }

  /** Executor-side task-time accumulator. Task metrics are recorded by the
    * executor threads and are therefore IMMUNE to driver-side pauses: a
    * query whose wall time spikes while its task time stays flat was
    * stalled by the driver box (GC pause, CPU contention, scheduler
    * starvation), not by more cluster work — the distinction the r6/r7
    * spike post-mortems could not make from medians alone.
    *
    *  - `runMs`    Σ executorRunTime — the work the cluster actually did
    *  - `gcMs`     Σ jvmGCTime inside tasks
    *  - `schedMs`  Σ max(0, duration − run − deserialize − resultSer) —
    *               scheduler delay + queueing, the driver-congestion smell
    *  - `nTasks`   task count (plan-shape drift tripwire)
    */
  final class TaskTimeListener extends SparkListener {
    val runMs = new AtomicLong(0)
    val gcMs = new AtomicLong(0)
    val schedMs = new AtomicLong(0)
    val nTasks = new AtomicLong(0)
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      val i = te.taskInfo
      if (m != null) {
        runMs.addAndGet(m.executorRunTime)
        gcMs.addAndGet(m.jvmGCTime)
        if (i != null) {
          schedMs.addAndGet(math.max(0L, i.duration - m.executorRunTime -
            m.executorDeserializeTime - m.resultSerializationTime))
          nTasks.incrementAndGet()
        }
      }
    }
    def snapshot(): Snap = Snap(runMs.get, gcMs.get, schedMs.get, nTasks.get)
  }

  final case class Snap(runMs: Long, gcMs: Long, schedMs: Long, nTasks: Long) {
    def -(o: Snap): Snap =
      Snap(runMs - o.runMs, gcMs - o.gcMs, schedMs - o.schedMs, nTasks - o.nTasks)
    override def toString: String =
      s"task=${runMs}ms taskGc=${gcMs}ms sched=${schedMs}ms ntasks=$nTasks"
  }

  /** Flush the async listener bus so a snapshot taken right after an
    * action sees every task of that action. `listenerBus`/`waitUntilEmpty`
    * are `private[spark]` — public at the bytecode level, so plain
    * reflection reaches them (same pattern as the checkpoint-block
    * handle). Falls back to a bounded settle-poll if the reflective path
    * ever breaks on a Spark upgrade: forensic precision degrades, the
    * bench never fails. */
  def drainListenerBus(spark: SparkSession, l: TaskTimeListener): Unit =
    try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
    } catch { case scala.util.control.NonFatal(_) =>
      var last = l.snapshot()
      var settled = 0
      var i = 0
      while (settled < 2 && i < 20) {
        Thread.sleep(25)
        val now = l.snapshot()
        if (now == last) settled += 1 else { settled = 0; last = now }
        i += 1
      }
    }
}
