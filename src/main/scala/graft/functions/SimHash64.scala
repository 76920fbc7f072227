package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a text column, computed the standard way: ONE 64-bit
  * hash per distinct whitespace token, each of whose bits votes ±1 on the
  * corresponding sketch bit; sketch bit = sign of the vote sum.
  *
  * Replaces the HOF formulation that hashed every (bit, token) pair
  * separately — 64 hashes and 64 interpreted lambda evaluations per token
  * — with one tokenizer pass (byte-level, regex-\s runs, distinct via
  * sorted token hashes) and one vote loop per token. Sketch VALUES differ
  * from the per-bit-hash formulation (both are valid SimHash families;
  * all downstream use is hamming-banded candidate generation, which is
  * distribution-insensitive).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      SimHash64.compute(input.asInstanceOf[UTF8String]))

  // static call into the compiled kernel (the WinnowFingerprint pattern)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  def apply(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))

  /** The one-pass sketch kernel (shared by eval and codegen);
    * tokenization = exact `split("\\s+")` parity, shared with
    * ShingleHashSet (see SplitTokens for the edge-empty-token rules). */
  def compute(input: UTF8String): Long = {
    val hashes = SplitTokens.tokenHashes(input.getBytes)
    // distinct tokens (array_distinct semantics): sort + dedupe the hashes
    java.util.Arrays.sort(hashes)
    SimHash64.voteSketch(hashes)
  }

  /** Vote loop over sorted (hash-deduped) token hashes — shared with the
    * md5-family twin [[Md5SimHash64]]. */
  private[functions] def voteSketch(sorted: Array[Long]): Long = {
    val n = sorted.length
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (i == 0 || sorted(i) != sorted(i - 1)) {
        val h = sorted(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sketch = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sketch |= (1L << b)
      b += 1
    }
    sketch
  }
}
