package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (bits per character) of a string's code-point
  * distribution — a standard corpus-quality signal (gibberish and
  * binary-ish text score far from natural language's ~4 bits).
  *
  * One map-side pass per document: sort the code points, run-length count,
  * fold Σ c·ln c. The equivalent relational formulation (explode per char →
  * groupBy(doc, char) → re-aggregate) inflates the corpus ×n_chars through
  * a shuffle — exactly the pattern the oracle SQL uses and this expression
  * exists to avoid at scale.
  *
  * entropy = (ln n − (Σ c·ln c)/n) / ln 2, with c summed in code-point
  * order. The empty string counts as one empty-string "character" (n=1 →
  * entropy 0), matching `split('', '')` semantics in both engines.
  */
case class CharEntropy(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_entropy expects string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(CharEntropy.compute(input.asInstanceOf[UTF8String]))

  /** Codegen = a static call into the compiled kernel (same shape as the
    * other text expressions): eliminates the last interpreted eval
    * dispatch + boxing on the gated curation surface while keeping the
    * run-length loop out of Janino source. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropy.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropy {
  def apply(text: Column): Column =
    ColumnBridge.column(CharEntropy(ColumnBridge.expression(text)))

  /** The entropy kernel (shared by eval and codegen). */
  def compute(input: UTF8String): Double = {
    val cps = input.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return 0.0
    java.util.Arrays.sort(cps)
    var s = 0.0
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && cps(j) == cps(i)) j += 1
      val c = (j - i).toDouble
      s += c * math.log(c)
      i = j
    }
    (math.log(n.toDouble) - s / n) / math.log(2.0)
  }
}
