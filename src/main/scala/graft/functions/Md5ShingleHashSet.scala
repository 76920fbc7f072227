package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct md5-60 hashes of the word `n`-grams of a text column —
  * the oracle-replayable twin of [[ShingleHashSet]], and the native
  * replacement for the interpreted HOF chain
  * `array_sort(array_distinct(transform(shingles(...), md5-conv-chain)))`
  * which cost 12.6 s at sf0.1 (every shingle STRING materialized, then an
  * interpreted 6-node md5/substr/conv/cast chain per element — the same
  * per-element-interpretation trap ShingleHashSet closed in r8).
  *
  * Hash contract (what the DuckDB oracle replays verbatim):
  * each window of `n` tokens, joined by a single ASCII space exactly as
  * `concat_ws(" ", …)` builds the shingle string, is md5-hashed; the hash
  * value is the first 8 digest bytes read LITTLE-endian (DuckDB's
  * `md5_number_upper`) shifted right 4 bits — 60 bits, positive in a
  * signed 64-bit long in both engines. Fewer than `n` tokens (including
  * empty text) hash as ONE shingle of all tokens — the [[ShingleHashSet]]
  * edge rule. Tokenization is the shared [[SplitTokens]]
  * (`split(text, "\\s+")` parity).
  *
  * One pass per document: tokenize, md5 each window straight from the
  * token byte spans (the joined shingle string never materializes), sort
  * + dedupe in place. The md5 digest is ~2-3× an xxhash64 — the price of
  * SQL replayability, paid map-side.
  */
case class Md5ShingleHashSet(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_shingle_hash_set expects string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    Md5ShingleHashSet.compute(input.asInstanceOf[UTF8String], n)

  // static call into the compiled kernel (the WinnowFingerprint pattern)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5ShingleHashSet.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5ShingleHashSet {
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(Md5ShingleHashSet(ColumnBridge.expression(text), n))

  /** The one-pass kernel (shared by eval and codegen). */
  def compute(input: UTF8String, n: Int): GenericArrayData = {
    val bytes = input.getBytes
    val (starts, ends, nTok) = SplitTokens.spans(bytes)
    val md = MessageDigest.getInstance("MD5")
    def hashWindow(w: Int, len: Int): Long = {
      md.reset()
      var j = 0
      while (j < len) {
        if (j > 0) md.update(' '.toByte)
        md.update(bytes, starts(w + j), ends(w + j) - starts(w + j))
        j += 1
      }
      Md5SimHash64.le64(md.digest()) >>> 4
    }
    val out: Array[Long] =
      if (nTok < n) Array(hashWindow(0, nTok))
      else {
        val m = nTok - n + 1
        val sh = new Array[Long](m)
        var w = 0
        while (w < m) { sh(w) = hashWindow(w, n); w += 1 }
        java.util.Arrays.sort(sh)
        var k = 0; var r = 0
        while (r < m) {
          if (r == 0 || sh(r) != sh(r - 1)) { sh(k) = sh(r); k += 1 }
          r += 1
        }
        if (k == m) sh else java.util.Arrays.copyOf(sh, k)
      }
    new GenericArrayData(out)
  }
}
