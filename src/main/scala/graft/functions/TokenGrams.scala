package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Native token n-gram kernels for the Stupid Backoff LM (and any other
  * token-window consumer): tokenization (lowercase, whitespace split,
  * empties dropped — the `wsTokens` contract) and window assembly happen
  * in ONE pass over the string per row.
  *
  * The HOF formulations they replace — `transform(sequence(...),
  * i -> concat_ws(" ", slice(ts, i, n)))` for grams and per-position
  * `element_at` triples for contexts — evaluate interpreted lambdas per
  * TOKEN (L·3 for the 3-order gram build), which benched the LM fit at
  * 16 s and the scoring explode at ~4 s of pure projection time at
  * sf0.1. Same output, one fused loop. */
object TokenGrams {

  /** Lowercased whitespace tokens, empties dropped — EXACTLY the
    * FILTERED `wsTokens` contract (`filter(wsTokens(c), length(_) > 0)`,
    * the form every token consumer in this repo uses): lowercase via
    * UTF8String (what Spark `lower` does) and the Java-regex `\s`
    * whitespace class (ASCII only — what `split(_, "\\s+")` matches),
    * NOT Character.isWhitespace (Unicode). The empty filter is part of
    * the contract, not an optimization: bare `wsTokens` emits a leading
    * "" token for text starting with non-space whitespace (Spark `trim`
    * strips only ' ', so `split` sees the leading `\t`/`\n`), and parity
    * holds against the filtered form only. */
  private[functions] def tokenize(s: UTF8String): Array[String] = {
    val str = s.toLowerCase.toString
    val out = new scala.collection.mutable.ArrayBuffer[String](16)
    @inline def ws(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    var i = 0
    val n = str.length
    while (i < n) {
      while (i < n && ws(str.charAt(i))) i += 1
      val start = i
      while (i < n && !ws(str.charAt(i))) i += 1
      if (i > start) out += str.substring(start, i)
    }
    out.toArray
  }

  /** All 1..maxN-gram strings (space-joined), concatenated by order. */
  def allGrams(s: UTF8String, maxN: Int): GenericArrayData = {
    val t = tokenize(s)
    val L = t.length
    var total = 0
    var n = 1
    while (n <= maxN) { total += math.max(0, L - n + 1); n += 1 }
    val out = new Array[Any](total)
    var k = 0
    n = 1
    while (n <= maxN) {
      var i = 0
      val last = L - n
      while (i <= last) {
        if (n == 1) out(k) = UTF8String.fromString(t(i))
        else {
          val sb = new java.lang.StringBuilder(t(i))
          var j = 1
          while (j < n) { sb.append(' '); sb.append(t(i + j)); j += 1 }
          out(k) = UTF8String.fromString(sb.toString)
        }
        k += 1; i += 1
      }
      n += 1
    }
    new GenericArrayData(out)
  }

  /** Per-token (w, w1 = predecessor, w2 = pre-predecessor) structs. */
  def contexts(s: UTF8String): GenericArrayData = {
    val t = tokenize(s)
    val out = new Array[Any](t.length)
    var i = 0
    while (i < t.length) {
      out(i) = InternalRow(
        UTF8String.fromString(t(i)),
        if (i >= 1) UTF8String.fromString(t(i - 1)) else null,
        if (i >= 2) UTF8String.fromString(t(i - 2)) else null)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `token_ngrams(text, maxN)`: every 1..maxN-gram of the lowercased
  * whitespace tokens, space-joined, grouped by ascending order. */
case class TokenNgrams(child: Expression, maxN: Int) extends UnaryExpression {
  require(maxN >= 1 && maxN <= 8, s"token_ngrams: maxN $maxN out of [1, 8]")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_ngrams expects string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    TokenGrams.allGrams(input.asInstanceOf[UTF8String], maxN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = TokenGrams.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = $obj.allGrams($s, $maxN);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenNgrams {
  def apply(c: Column, maxN: Int): Column =
    ColumnBridge.column(TokenNgrams(ColumnBridge.expression(c), maxN))
}

/** `token_contexts(text)`: per-token struct (w, w1, w2) with the two
  * predecessors (null where absent) — the LM scoring explode payload. */
case class TokenContexts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("w", StringType, nullable = false),
    StructField("w1", StringType, nullable = true),
    StructField("w2", StringType, nullable = true))), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_contexts expects string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    TokenGrams.contexts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = TokenGrams.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = $obj.contexts($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenContexts {
  def apply(c: Column): Column =
    ColumnBridge.column(TokenContexts(ColumnBridge.expression(c)))
}
