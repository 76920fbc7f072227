package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio of a string's UTF-8 bytes:
  * `compressed_len / raw_len`. A low ratio means highly repetitive
  * text — boilerplate, keyword stuffing, generated spam — and a near-1
  * ratio means high-entropy text (or binary junk); both tails are
  * standard LLM-curation reject signals (the Gopher rules family
  * thresholds exactly this statistic). SHORT-DOCUMENT CAVEAT: deflate's
  * fixed block overhead (~5-10 bytes) dominates tiny inputs — a 2-byte
  * string ratios at 3-5, not near 1 — so the signal is only meaningful
  * for documents of at least a few hundred bytes; a curation gate must
  * pair any upper-tail threshold with a minimum-length condition (or
  * treat ratios > ~1.1 as "too short to assess", which is what they
  * mean). Complements [[CharEntropy]]:
  * entropy sees only the UNIGRAM character distribution, while deflate's
  * LZ77 window catches REPEATED SUBSTRINGS — "abcabcabc…" has maximal
  * trigram repetition but near-uniform character entropy.
  *
  * Uses the JDK's zlib (level 6) through a thread-local reused
  * `Deflater` — a Deflater holds native memory, and allocating one per
  * row would put a malloc/free pair in the hot loop. Codegen emits one
  * static call per row; the deflate itself dominates.
  *
  * Determinism: deflate output length for a given input and level is
  * stable for a given zlib build. Across zlib VERSIONS the length can
  * shift by small amounts — so specs (and any oracle) must pin
  * PROPERTIES (repetitive ≪ random, bounds, monotone-ish behavior), not
  * exact ratios; this is the t-digest honesty rule applied to zlib.
  * NULL and empty strings yield NULL (nothing to assess). */
case class CompressRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"compress_ratio expects string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    CompressRatio.ratioOrNull(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CompressRatio.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val tmp = ctx.freshName("ratio")
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |Object $tmp = $cls.ratioOrNull($s);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $tmp).doubleValue(); }
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CompressRatio {
  def apply(c: Column): Column =
    ColumnBridge.column(CompressRatio(ColumnBridge.expression(c)))

  // one Deflater + output buffer per executor thread, reused across rows
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, /* nowrap = */ true)
  }
  private val buf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](64 * 1024)
  }

  /** java.lang.Double ratio, or null for null/empty input — boxed so the
    * generated code gets null-or-value in one call. */
  def ratioOrNull(s: UTF8String): java.lang.Double = {
    if (s == null) return null
    val bytes = s.getBytes
    if (bytes.length == 0) return null
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val out = buf.get()
    var total = 0L
    while (!d.finished()) {
      val n = d.deflate(out)
      total += n
      // a full buffer with more to come just loops; out is scratch only
      if (n == 0 && !d.finished()) {
        // cannot happen after finish() with input set, but never spin
        throw new IllegalStateException("compress_ratio: deflater stalled")
      }
    }
    java.lang.Double.valueOf(total.toDouble / bytes.length)
  }
}
