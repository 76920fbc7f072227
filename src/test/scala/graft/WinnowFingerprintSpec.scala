package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property suite for the native winnowing fingerprint: the monotonic
  * deque + run-collapse + distinct-in-order pipeline is checked against a
  * NAIVE reference (explicit per-window min scan over the same gram
  * hashes) on seeded random token sequences — the deque is the only
  * nontrivial state machine in the expression, and an off-by-one there
  * yields plausible-looking-but-wrong fingerprints no overlap assertion
  * would catch. The gram hashes themselves reuse the exact
  * SplitTokens/ShingleHashSet helpers the expression runs, so this pins
  * the WINNOWING, not the hashing. */
class WinnowFingerprintSpec extends AnyFunSuite {
  private val ss = TestSpark.spark
  import ss.implicits._

  /** Reference winnow over gram hashes: min of each length-w window
    * (earliest index wins ties), adjacent-duplicate collapse by VALUE,
    * then first-occurrence distinct — the documented contract. */
  private def naive(grams: Array[Long], w: Int): Seq[Long] = {
    if (grams.isEmpty) return Seq.empty
    val kept =
      if (grams.length <= w) Seq(grams.min)
      else (0 to grams.length - w).map(i => grams.slice(i, i + w).min)
    val collapsed = kept.foldLeft(List.empty[Long]) {
      case (acc, h) if acc.headOption.contains(h) => acc
      case (acc, h) => h :: acc
    }.reverse
    collapsed.distinct
  }

  /** Gram hashes exactly as the expression computes them (mix fold over
    * SplitTokens token hashes), via a ShingleHashSet-free local copy of
    * the fold so the test double-enters the hash math too. */
  private def gramHashes(text: String, k: Int): Array[Long] = {
    def mix(acc: Long, h: Long): Long = {
      var z = acc ^ h
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      (z ^ (z >>> 31)) + 0x9e3779b97f4a7c15L
    }
    val toks = text.split("\\s+", -1)
    def tokHash(t: String): Long = {
      val b = t.getBytes("UTF-8")
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
    }
    val hs = toks.map(tokHash)
    if (toks.length < k) Array(hs.foldLeft(0L)(mix))
    else (0 to toks.length - k).map(i =>
      (i until i + k).foldLeft(0L)((a, j) => mix(a, hs(j)))).toArray
  }

  private def viaSpark(texts: Seq[String], k: Int, w: Int): Seq[Seq[Long]] =
    texts.toDF("text")
      .select(functions.WinnowFingerprint(col("text"), k, w).as("fp"))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq

  test("matches the naive reference on seeded random token sequences") {
    val rnd = new scala.util.Random(20260813L)
    // small vocab forces duplicate grams (the run-collapse + re-selection
    // paths); lengths sweep the <k, <w, and long regimes
    val texts = (1 to 200).map { _ =>
      val n = rnd.nextInt(30)
      (1 to n).map(_ => s"t${rnd.nextInt(6)}").mkString(" ")
    }
    for (k <- Seq(1, 2, 3); w <- Seq(1, 2, 4, 7)) {
      val got = viaSpark(texts, k, w)
      texts.indices.foreach { i =>
        val want = naive(gramHashes(texts(i), k), w)
        assert(got(i) == want,
          s"k=$k w=$w text='${texts(i)}': got ${got(i)}, want $want")
      }
    }
  }

  test("edge inputs: empty, whitespace-only, single token") {
    val got = viaSpark(Seq("", "   ", "one", "a b"), 3, 4)
    got.foreach(fp => assert(fp.length == 1,
      s"sub-k inputs fingerprint as one all-token gram, got $fp"))
  }

  test("SQL registration round-trips the Column API") {
    // extensions-enabled session on the shared context (BloomFilterSpec
    // pattern); never closed — closing would kill the JVM-wide context
    val s2 = try {
      org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .create()
    } catch { case _: Throwable => null }
    assume(s2 != null, "no extensions-enabled session available")
    import s2.implicits._
    val text = "the quick brown fox jumps over the lazy dog"
    Seq(text).toDF("text").createOrReplaceTempView("wf_t")
    val viaSql = s2.sql(
      "SELECT graft_winnow_fingerprint(text, 3, 4) AS fp FROM wf_t")
      .head.getSeq[Long](0)
    val viaCol = viaSpark(Seq(text), 3, 4).head
    assert(viaSql == viaCol)
  }
}
