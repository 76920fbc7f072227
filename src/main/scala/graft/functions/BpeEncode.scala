package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE encoding: tokenize (the shared [[TokenGrams.tokenize]]
  * contract), then per word run the merge-rank loop — repeatedly merge
  * every left-to-right occurrence of the adjacent symbol pair with the
  * LOWEST learned rank until no adjacent pair has one (the GPT-2 encode
  * order, which reproduces the training-time merge sequence). The rank
  * map travels as a codegen reference object, so the generated source is
  * identical across refitted models (the NearestCentroid discipline) and
  * encoding stays inside whole-stage codegen.
  *
  * Unknown characters fall through as single symbols — a tokenizer that
  * throws on unseen input is useless on real corpora. NULL text → NULL. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  // Two-level rank map (left symbol -> right symbol -> rank) so the hot
  // pair-probe allocates NOTHING. The first draft probed one map with a
  // `a + " " + b` concatenated key — one char[]+String allocation per
  // adjacent pair per merge round, ~1.6 BILLION at the sf10 probe scale,
  // and whether C2's escape analysis elided them depended on JIT state
  // (inlining depth through the generated-class call site), which made
  // the composed curation gate's wall time swing 20× run-to-run
  // (20 s → 83 s reps in BENCH_FORENSICS_r13_scaleprobe_sf10 while the
  // thread dumps showed every task burning CPU right here). String keys
  // cache their hashCode, so the two probes of EXISTING instances are
  // pure lookups.
  @transient private lazy val ranks:
      java.util.HashMap[String, java.util.HashMap[String, Integer]] = {
    val m = new java.util.HashMap[String, java.util.HashMap[String, Integer]](
      merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.computeIfAbsent(a, _ => new java.util.HashMap[String, Integer](4))
        .putIfAbsent(b, Integer.valueOf(i))
    }
    m
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_encode expects string, got ${other.catalogString}")
    }

  /** One word's symbol array after all applicable merges. */
  private def encodeWord(w: String): scala.collection.mutable.ArrayBuffer[String] = {
    val syms = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var i = 0
    // single-char symbols come from the shared ASCII cache (one alloc
    // per NON-ascii char only) — the per-char .toString was the other
    // per-row allocation hot spot
    while (i < w.length) { syms += BpeEncode.charSym(w.charAt(i)); i += 1 }
    if (syms.nonEmpty) syms(syms.length - 1) += graft.ml.Bpe.WordEnd
    var done = syms.length <= 1
    while (!done) {
      // lowest-rank adjacent pair present in the word — two cached-hash
      // probes per pair, zero allocation
      var bestRank = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        val inner = ranks.get(syms(j))
        if (inner != null) {
          val r = inner.get(syms(j + 1))
          if (r != null && r < bestRank) bestRank = r
        }
        j += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val key = merges(bestRank)
        var k = 0
        while (k < syms.length - 1) {
          if (syms(k) == key._1 && syms(k + 1) == key._2) {
            syms(k) = key._1 + key._2
            syms.remove(k + 1)
          } else k += 1
        }
        if (syms.length <= 1) done = true
      }
    }
    syms
  }

  /** Public entry the generated code calls (nullSafeEval is protected). */
  def encode(input: UTF8String): GenericArrayData = {
    val words = TokenGrams.tokenize(input)
    val out = new scala.collection.mutable.ArrayBuffer[Any](words.length * 2)
    words.foreach { w =>
      encodeWord(w).foreach(sym => out += UTF8String.fromString(sym))
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeExpr", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.encode($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {
  def apply(c: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(c), merges))

  private val AsciiSyms: Array[String] =
    Array.tabulate(128)(i => String.valueOf(i.toChar))

  /** Single-character symbol, allocation-free for ASCII. */
  private[functions] def charSym(c: Char): String =
    if (c < 128) AsciiSyms(c) else String.valueOf(c)
}
