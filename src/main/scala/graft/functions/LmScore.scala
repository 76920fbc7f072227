package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass Stupid Backoff document scorer: tokenizes (the
  * [[TokenGrams.tokenize]] contract — the SAME tokenizer the LM was fit
  * with), walks the tokens once with their two predecessors, looks each
  * position up in the driver-folded ratio tables, and returns
  * `struct(lm_tokens, lm_avg_logprob)` — the whole per-document scoring
  * pipeline in one expression, no explode, no aggregation, no join.
  *
  * This is the STREAMING-SAFE twin of [[graft.ml.NgramLm.score]]'s
  * broadcast-join formulation: the join form is the right batch shape
  * (the ratio tables ride ordinary broadcast joins and the planner sees
  * everything), but its per-document groupBy + right-anchor join make it
  * a stateful streaming query. A curation gate in a Structured Streaming
  * pipeline needs the score to be row-local, and this kernel is exactly
  * that — the three ratio maps travel as codegen reference objects (the
  * [[AffineProject]] / [[BpeEncode]] model-shipping pattern), so the
  * expression stays inside whole-stage codegen and the generated source
  * is identical across refreshed models (Janino cache hits).
  *
  * Arithmetic is kept OPERATION-FOR-OPERATION identical to the join form
  * (same fold of ratios at model time, same coalesce order, same
  * `StrictMath.log` Spark's log expression uses), and a document's exploded token rows never
  * split across partitions in the join form, so both paths accumulate
  * the log-score sum in token order: NgramLmSpec pins BIT equality of
  * `lm_avg_logprob` between the two, not mere closeness.
  *
  * NULL text yields a NULL struct (standard null-safe expression
  * semantics); `NgramLm.scoreMapSide` coalesces to "" upstream so a
  * null document scores (0, NULL) like the join form's right-anchor —
  * direct users of the raw expression who want that contract should do
  * the same. */
case class LmScoreDoc(child: Expression, uni: Map[String, Double],
                      bi: Map[String, Double], tri: Map[String, Double],
                      floor1: Double, alpha: Double) extends UnaryExpression {

  // bi/tri are NESTED (context -> ... -> score) rather than flat maps on
  // space-joined keys, so the per-token probes allocate NOTHING — the
  // flat form concatenated a fresh key string per probe (~2/token), the
  // same escape-analysis-dependent churn pattern the r13 probe caught in
  // BpeEncode. Splitting happens once here, at model-ship time; the
  // Double values are the SAME objects either way, so the bit-equality
  // contract with the join form is untouched.
  @transient private lazy val uniH = LmScoreDoc.toJava(uni)
  @transient private lazy val biH = LmScoreDoc.toNested2(bi)
  @transient private lazy val triH = LmScoreDoc.toNested3(tri)
  // floor1/alpha ride the same reference array in codegen: emitting a
  // double as a source literal can lose the last bit through the decimal
  // round-trip, and bit equality with the join form is the contract
  @transient private lazy val params = Array(floor1, alpha)

  override def dataType: DataType = StructType(Seq(
    StructField("lm_tokens", LongType, nullable = false),
    StructField("lm_avg_logprob", DoubleType, nullable = true)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lm_score_doc expects string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    LmScoreDoc.score(input.asInstanceOf[UTF8String], uniH, biH, triH, params)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = LmScoreDoc.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val u = ctx.addReferenceObj("lmUni", uniH, "java.util.HashMap")
    val b = ctx.addReferenceObj("lmBi", biH, "java.util.HashMap")
    val t = ctx.addReferenceObj("lmTri", triH, "java.util.HashMap")
    val p = ctx.addReferenceObj("lmParams", params, "double[]")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = $obj.score($s, $u, $b, $t, $p);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LmScoreDoc {

  private[functions] def toJava(
      m: Map[String, Double]): java.util.HashMap[String, java.lang.Double] = {
    val h = new java.util.HashMap[String, java.lang.Double](
      math.max(8, (m.size / 0.75).toInt + 1))
    m.foreach { case (k, v) => h.put(k, java.lang.Double.valueOf(v)) }
    h
  }

  /** "w1 w" keys split once into w1 -> (w -> score). */
  private[functions] def toNested2(m: Map[String, Double])
      : java.util.HashMap[String, java.util.HashMap[String, java.lang.Double]] = {
    val h = new java.util.HashMap[String, java.util.HashMap[String, java.lang.Double]]()
    m.foreach { case (k, v) =>
      val sp = k.indexOf(' ')
      h.computeIfAbsent(k.substring(0, sp),
          _ => new java.util.HashMap[String, java.lang.Double](4))
        .put(k.substring(sp + 1), java.lang.Double.valueOf(v))
    }
    h
  }

  /** "w2 w1 w" keys split once into w2 -> w1 -> (w -> score). */
  private[functions] def toNested3(m: Map[String, Double]): java.util.HashMap[
      String, java.util.HashMap[String, java.util.HashMap[String, java.lang.Double]]] = {
    val h = new java.util.HashMap[String,
      java.util.HashMap[String, java.util.HashMap[String, java.lang.Double]]]()
    m.foreach { case (k, v) =>
      val s1 = k.indexOf(' ')
      val s2 = k.indexOf(' ', s1 + 1)
      h.computeIfAbsent(k.substring(0, s1), _ => new java.util.HashMap[
          String, java.util.HashMap[String, java.lang.Double]](4))
        .computeIfAbsent(k.substring(s1 + 1, s2),
          _ => new java.util.HashMap[String, java.lang.Double](4))
        .put(k.substring(s2 + 1), java.lang.Double.valueOf(v))
    }
    h
  }

  /** The per-document loop. Score per position (identical to the join
    * form's coalesce chain): s1 = uni(w) | floor1; sBi = bi(w1 w) |
    * α·s1; position ≥2 → tri(w2 w1 w) | α·sBi, position 1 → sBi,
    * position 0 → s1. */
  def score(s: UTF8String, uni: java.util.HashMap[String, java.lang.Double],
            bi: java.util.HashMap[String, java.util.HashMap[String, java.lang.Double]],
            tri: java.util.HashMap[String,
              java.util.HashMap[String, java.util.HashMap[String, java.lang.Double]]],
            params: Array[Double]): InternalRow = {
    val floor1 = params(0)
    val alpha = params(1)
    val t = TokenGrams.tokenize(s)
    val n = t.length
    if (n == 0) return InternalRow(0L, null)
    var sum = 0.0
    var i = 0
    while (i < n) {
      val w = t(i)
      val u = uni.get(w)
      val s1 = if (u == null) floor1 else u.doubleValue()
      val sTok =
        if (i == 0) s1
        else {
          // nested probes: zero allocation (see the lazy-val note)
          val bInner = bi.get(t(i - 1))
          val b = if (bInner == null) null else bInner.get(w)
          val sBi = if (b == null) alpha * s1 else b.doubleValue()
          if (i == 1) sBi
          else {
            val tMid = tri.get(t(i - 2))
            val tInner = if (tMid == null) null else tMid.get(t(i - 1))
            val tr = if (tInner == null) null else tInner.get(w)
            if (tr == null) alpha * sBi else tr.doubleValue()
          }
        }
      // StrictMath, not Math: Spark's `log` expression evaluates through
      // StrictMath.log, and Math.log may differ in the last bit on
      // intrinsic-enabled JVMs — the one-ulp drift the parity spec caught
      sum += java.lang.StrictMath.log(sTok)
      i += 1
    }
    InternalRow(n.toLong, sum / n)
  }

  def apply(c: Column, uni: Map[String, Double], bi: Map[String, Double],
            tri: Map[String, Double], floor1: Double, alpha: Double): Column =
    ColumnBridge.column(LmScoreDoc(ColumnBridge.expression(c),
      uni, bi, tri, floor1, alpha))
}
