package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash whose per-token hash is md5-derived — the
  * oracle-replayable twin of [[SimHash64]].
  *
  * Token hash = the first 8 md5 digest bytes read little-endian, which is
  * exactly DuckDB's `md5_number_upper(token)`, so the whole sketch replays
  * in ANSI SQL (per-token ±1 bit votes, sketch bit = sign of the vote
  * sum) with zero float or wrap-around hazards. Tokenization and
  * distinct-by-hash semantics are [[SimHash64]]'s byte-for-byte (shared
  * [[SplitTokens]] / vote loop); ONLY the hash family differs — xxhash64
  * is not replayable in SQL, md5 is. Both are valid SimHash families; all
  * downstream use is hamming-banded candidate generation.
  *
  * Still one map-side pass per document: tokenize, md5 each distinct
  * token once, 64-bit vote loop. ~2-3× the per-token hash cost of
  * xxhash64 — the price of the correctness gate, paid map-side where it
  * scales embarrassingly.
  */
case class Md5SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_simhash64 expects string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      Md5SimHash64.compute(input.asInstanceOf[UTF8String]))

  // static call into the compiled kernel (the WinnowFingerprint pattern)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5SimHash64 {
  /** First 8 digest bytes as a little-endian long = DuckDB
    * `md5_number_upper`. */
  private[functions] def le64(d: Array[Byte]): Long =
    (d(0) & 0xFFL) | ((d(1) & 0xFFL) << 8) | ((d(2) & 0xFFL) << 16) |
      ((d(3) & 0xFFL) << 24) | ((d(4) & 0xFFL) << 32) | ((d(5) & 0xFFL) << 40) |
      ((d(6) & 0xFFL) << 48) | ((d(7) & 0xFFL) << 56)

  def apply(text: Column): Column =
    ColumnBridge.column(Md5SimHash64(ColumnBridge.expression(text)))

  /** The one-pass sketch kernel (shared by eval and codegen). */
  def compute(input: UTF8String): Long = {
    val bytes = input.getBytes
    val (starts, ends, n) = SplitTokens.spans(bytes)
    val md = MessageDigest.getInstance("MD5")
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      md.update(bytes, starts(i), ends(i) - starts(i))
      hashes(i) = le64(md.digest())
      i += 1
    }
    // distinct tokens via distinct hashes (array_distinct semantics,
    // modulo 2^-64 collisions — the same contract as SimHash64)
    java.util.Arrays.sort(hashes)
    SimHash64.voteSketch(hashes)
  }
}
