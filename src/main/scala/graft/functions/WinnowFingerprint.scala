package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (Schleimer et al., SIGMOD'03) in ONE
  * native pass: tokenize the UTF-8 bytes ([[SplitTokens]], exact
  * `split("\\s+")` parity), hash each SEQUENTIAL word `k`-gram with the
  * shared 64-bit mix fold ([[ShingleHashSet.mix]]), keep the minimum hash
  * of every sliding window of `w` grams via a monotonic deque (amortized
  * O(1) per window), and emit the distinct kept hashes in first-kept
  * order.
  *
  * Replaces the HOF formulation `transform(sequence(0, nWin-1), i =>
  * array_min(slice(hashes, i+1, w)))` whose inner `hashes` expression —
  * itself the whole shingle pipeline — was re-evaluated per WINDOW by the
  * interpreted lambda evaluator, and then duplicated once per derived
  * stat column by projection collapse: O(windows × grams × k) string work
  * per row per copy, measured at 27 s vs 0.7 s for the hashes alone at
  * sf0.01. Fingerprint VALUES differ from the HOF formulation (sequential
  * grams instead of first-occurrence-distinct, mix fold instead of
  * xxhash64 of the joined string) — faithful winnowing needs positional
  * grams, and all downstream use is set-overlap, which only observes
  * fingerprint-set equality.
  *
  * Edge rules: fewer than `k` tokens hash as one gram of all tokens
  * (ShingleHashSet parity); fewer than `w` grams keep the single global
  * minimum.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1, "gram size must be >= 1")
  require(w >= 1, "winnow window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprint expects string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprint.compute(input.asInstanceOf[UTF8String], k, w)

  /** Codegen = a static call into the compiled one-pass kernel: what the
    * fallback path paid per row was the interpreted eval dispatch and
    * value boxing AROUND the kernel (the r8 verdict's last interpreted
    * hot-path item), not the kernel itself — emitting the call keeps the
    * expression inside whole-stage codegen with zero per-row wrapping,
    * without unrolling a 100-line deque loop into Janino source. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFingerprint.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprint {
  def apply(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprint(ColumnBridge.expression(text), k, w))

  /** The one-pass winnowing kernel (shared by eval and codegen). */
  def compute(input: UTF8String, k: Int, w: Int): GenericArrayData = {
    val tokHash = SplitTokens.tokenHashes(input.getBytes)
    val nTok = tokHash.length
    // sequential k-gram hashes (positional — duplicates preserved)
    val grams: Array[Long] =
      if (nTok < k) {
        var h = 0L; var j = 0
        while (j < nTok) { h = ShingleHashSet.mix(h, tokHash(j)); j += 1 }
        Array(h)
      } else {
        val m = nTok - k + 1
        val g = new Array[Long](m)
        var i = 0
        while (i < m) {
          var h = 0L; var j = 0
          while (j < k) { h = ShingleHashSet.mix(h, tokHash(i + j)); j += 1 }
          g(i) = h; i += 1
        }
        g
      }
    val m = grams.length
    val kept = new Array[Long](m)
    var nKept = 0
    if (m <= w) {
      var min = grams(0); var i = 1
      while (i < m) { if (grams(i) < min) min = grams(i); i += 1 }
      kept(0) = min; nKept = 1
    } else {
      // monotonic deque of indices; front = argmin of the current window.
      // Ties keep the EARLIER index (strict < when evicting from the
      // back), so each distinct minimum is recorded once per run.
      val deque = new Array[Int](m)
      var head = 0; var tail = 0 // [head, tail) holds candidate indices
      var i = 0
      while (i < m) {
        while (tail > head && grams(deque(tail - 1)) > grams(i)) tail -= 1
        deque(tail) = i; tail += 1
        if (deque(head) <= i - w) head += 1
        if (i >= w - 1) {
          val sel = grams(deque(head))
          if (nKept == 0 || kept(nKept - 1) != sel) { kept(nKept) = sel; nKept += 1 }
        }
        i += 1
      }
    }
    // distinct in first-kept order (adjacent dupes already collapsed;
    // repeated content can re-select a hash later — drop re-occurrences)
    val seen = new java.util.HashSet[java.lang.Long](nKept * 2)
    val out = new Array[Long](nKept)
    var nOut = 0
    var i = 0
    while (i < nKept) {
      if (seen.add(kept(i))) { out(nOut) = kept(i); nOut += 1 }
      i += 1
    }
    new GenericArrayData(
      if (nOut == nKept) out else java.util.Arrays.copyOf(out, nOut))
  }
}
