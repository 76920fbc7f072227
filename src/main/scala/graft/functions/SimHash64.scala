package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    // tokenization = exact split("\\s+") parity, shared with
    // ShingleHashSet (see SplitTokens for the edge-empty-token rules)
    val hashes = SplitTokens.tokenHashes(
      input.asInstanceOf[UTF8String].getBytes)
    val n = hashes.length
    // distinct tokens (array_distinct semantics): sort + dedupe the hashes
    java.util.Arrays.sort(hashes)
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (i == 0 || hashes(i) != hashes(i - 1)) {
        val h = hashes(i)
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
    java.lang.Long.valueOf(sketch)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  def apply(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))
}
