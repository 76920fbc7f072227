package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Merging t-digest (Dunning & Ertl) — the quantile axis of the mergeable
  * sketch family (HLL = distinct, Misra-Gries = top-k, Count-Min =
  * frequency, Bloom = membership, t-digest = distribution shape).
  *
  * q_percentiles answers quantiles exactly in one shuffle, but its state
  * is the GROUP'S VALUES — it cannot pre-aggregate. The t-digest holds
  * O(δ) centroids per group whatever the group size, merges
  * associatively, and so composes with the same rollup pattern as the
  * other sketches (per-day digests → monthly quantiles without
  * re-reading rows) and with streaming state stores. Accuracy
  * concentrates at the tails — the k1 (arcsine) scale function bounds
  * each centroid's rank span by ~δ⁻¹·total near the median and much
  * tighter near q→0/1, which is what p99/p999 monitoring needs.
  *
  * Wire format (= both aggregates' serialized buffer):
  * `[int δ][int m][double min][double max][m × (double mean,
  * double weight)]`, big-endian, centroids sorted by mean.
  *
  * Compaction is deterministic given insertion order (no coin flips —
  * the greedy merge pass below), but insertion order itself follows
  * partition order, so unlike CMS/Bloom/MG the BYTES are not
  * partition-invariant; the rank-error guarantee is. Specs therefore pin
  * error bounds and invariants (monotone quantiles, exact min/max, exact
  * total weight), not byte equality. */
object TdUtil {
  final val HEADER = 24 // int delta + int m + double min + double max

  /** k1 scale: k(q) = δ·(asin(2q−1)/π + 1/2), k(0)=0 … k(1)=δ. A merged
    * centroid may span [qL, qR] only while k(qR) − k(qL) ≤ 1. */
  private def k(q: Double, delta: Int): Double =
    delta * (math.asin(2.0 * q - 1.0) / math.Pi + 0.5)

  /** Greedy merge pass over (means, weights)[0, n): sort by mean, then
    * fold neighbours while the combined centroid's k-span stays ≤ 1.
    * Returns packed (means, weights, m). Deterministic: ties in mean
    * merge left-to-right in sorted order. */
  def compact(means: Array[Double], weights: Array[Double], n: Int,
              delta: Int): (Array[Double], Array[Double], Int) = {
    if (n == 0) return (means, weights, 0)
    val idx = Array.range(0, n).map(Integer.valueOf)
    java.util.Arrays.sort(idx, (a: Integer, b: Integer) =>
      java.lang.Double.compare(means(a), means(b)))
    var total = 0.0
    var i = 0
    while (i < n) { total += weights(i); i += 1 }
    val om = new Array[Double](n)
    val ow = new Array[Double](n)
    var m = 0
    var curMean = means(idx(0))
    var curW = weights(idx(0))
    var wBefore = 0.0 // weight emitted before the current centroid
    var kLo = k(0.0, delta)
    i = 1
    while (i < n) {
      val nm = means(idx(i))
      val nw = weights(idx(i))
      val proposed = curW + nw
      if (k((wBefore + proposed) / total, delta) - kLo <= 1.0) {
        // weighted-mean absorb (numerically stable incremental form)
        curMean += (nm - curMean) * (nw / proposed)
        curW = proposed
      } else {
        om(m) = curMean; ow(m) = curW; m += 1
        wBefore += curW
        kLo = k(wBefore / total, delta)
        curMean = nm; curW = nw
      }
      i += 1
    }
    om(m) = curMean; ow(m) = curW; m += 1
    (om, ow, m)
  }

  def toBytes(means: Array[Double], weights: Array[Double], m: Int,
              delta: Int, min: Double, max: Double): Array[Byte] = {
    val out = new Array[Byte](HEADER + m * 16)
    putInt(out, 0, delta); putInt(out, 4, m)
    putDouble(out, 8, min); putDouble(out, 16, max)
    var i = 0
    while (i < m) {
      putDouble(out, HEADER + i * 16, means(i))
      putDouble(out, HEADER + i * 16 + 8, weights(i))
      i += 1
    }
    out
  }

  /** Header decode with byte-length validation — the SQL surface lets any
    * binary column reach the quantile/merge paths, and malformed input
    * must fail as a named error (the Bloom lesson). */
  def dims(bytes: Array[Byte]): (Int, Int) = {
    if (bytes.length < HEADER)
      throw new IllegalArgumentException(
        s"tdigest: ${bytes.length}-byte input is not a t-digest " +
          s"(shorter than the $HEADER-byte header)")
    val delta = getInt(bytes, 0)
    val m = getInt(bytes, 4)
    if (delta < 10 || delta > 10000 || m < 0 ||
        bytes.length != HEADER + m.toLong * 16L)
      throw new IllegalArgumentException(
        s"tdigest: input is not a t-digest (header says delta=$delta " +
          s"m=$m for ${bytes.length} bytes)")
    (delta, m)
  }

  /** Quantile straight off the wire bytes — centroid weights are treated
    * as massed at rank midpoints, linear interpolation between midpoints,
    * exact min/max at the extremes (the standard t-digest estimator). */
  def quantileBytes(bytes: Array[Byte], q: Double): Double = {
    val (_, m) = dims(bytes)
    if (m == 0) return Double.NaN
    require(q >= 0.0 && q <= 1.0, s"tdigest: quantile $q not in [0, 1]")
    val min = getDouble(bytes, 8)
    val max = getDouble(bytes, 16)
    def mean(i: Int) = getDouble(bytes, HEADER + i * 16)
    def weight(i: Int) = getDouble(bytes, HEADER + i * 16 + 8)
    var total = 0.0
    var i = 0
    while (i < m) { total += weight(i); i += 1 }
    val target = q * total
    if (m == 1) return mean(0)
    // cumulative midpoint walk
    var cum = 0.0
    var prevMid = 0.0
    var prevVal = min
    i = 0
    while (i < m) {
      val mid = cum + weight(i) / 2.0
      if (target < mid) {
        val span = mid - prevMid
        return if (span <= 0.0) mean(i)
        else prevVal + (mean(i) - prevVal) * ((target - prevMid) / span)
      }
      prevMid = mid; prevVal = mean(i)
      cum += weight(i)
      i += 1
    }
    // above the last midpoint: interpolate toward the exact max
    val span = total - prevMid
    if (span <= 0.0) max
    else prevVal + (max - prevVal) * ((target - prevMid) / span)
  }

  /** CDF probe — the inverse of [[quantileBytes]], same midpoint-mass
    * model walked the other way: estimated fraction of digested mass
    * <= x, exact 0/1 outside [min, max]. Completes the probe pair on the
    * t-digest exactly as `KllRank` does on the KLL side — the t-digest
    * answers it with TAIL-weighted accuracy (smaller centroids near the
    * extremes), the KLL with a uniform bound; same trade as the forward
    * probes. */
  def cdfBytes(bytes: Array[Byte], x: Double): Double = {
    val (_, m) = dims(bytes)
    if (m == 0) return Double.NaN
    val min = getDouble(bytes, 8)
    val max = getDouble(bytes, 16)
    if (x < min) return 0.0
    if (x >= max) return 1.0
    def mean(i: Int) = getDouble(bytes, HEADER + i * 16)
    def weight(i: Int) = getDouble(bytes, HEADER + i * 16 + 8)
    var total = 0.0
    var i = 0
    while (i < m) { total += weight(i); i += 1 }
    if (m == 1) return if (x >= mean(0)) 1.0 else 0.0
    // walk centroid midpoints; interpolate rank linearly between the
    // bracketing (value, rank-midpoint) knots — the inverse of the
    // quantile walk, so cdf(quantile(q)) round-trips to ~q
    var cum = 0.0
    var prevMid = 0.0
    var prevVal = min
    i = 0
    while (i < m) {
      val mid = cum + weight(i) / 2.0
      if (x < mean(i)) {
        val span = mean(i) - prevVal
        val r =
          if (span <= 0.0) mid
          else prevMid + (mid - prevMid) * ((x - prevVal) / span)
        return math.min(1.0, math.max(0.0, r / total))
      }
      prevMid = mid; prevVal = mean(i)
      cum += weight(i)
      i += 1
    }
    val span = max - prevVal
    val r =
      if (span <= 0.0) total
      else prevMid + (total - prevMid) * ((x - prevVal) / span)
    math.min(1.0, math.max(0.0, r / total))
  }

  private def putInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }
  private def getInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def putDouble(b: Array[Byte], off: Int, v: Double): Unit = {
    val l = java.lang.Double.doubleToLongBits(v)
    var j = 0
    while (j < 8) { b(off + j) = (l >>> (56 - 8 * j)).toByte; j += 1 }
  }
  private def getDouble(b: Array[Byte], off: Int): Double = {
    var l = 0L
    var j = 0
    while (j < 8) { l = (l << 8) | (b(off + j) & 0xffL); j += 1 }
    java.lang.Double.longBitsToDouble(l)
  }
}

/** Mutable aggregation buffer: merged centroids + an insertion buffer
  * that compacts when full (the Dunning merging-digest design — updates
  * are O(1) amortized, compactions O(buf·log buf)). */
final class TdBuffer(val delta: Int) {
  private val bufCap = math.max(64, 4 * delta)
  // merged region ≤ ~2δ centroids + buffer region, compacted together
  private var means = new Array[Double](bufCap + 2 * delta + 16)
  private var weights = new Array[Double](bufCap + 2 * delta + 16)
  private var merged = 0 // centroids [0, merged) are compacted
  private var n = 0      // total entries in use (merged + buffered)
  var min: Double = Double.PositiveInfinity
  var max: Double = Double.NegativeInfinity

  def add(x: Double, w: Double): Unit = {
    if (n == means.length) compactNow()
    means(n) = x; weights(n) = w; n += 1
    if (x < min) min = x
    if (x > max) max = x
  }

  private def compactNow(): Unit = {
    val (om, ow, m) = TdUtil.compact(means, weights, n, delta)
    System.arraycopy(om, 0, means, 0, m)
    System.arraycopy(ow, 0, weights, 0, m)
    merged = m; n = m
  }

  def mergeIn(other: TdBuffer): Unit = {
    // the cross-partition merge path skips addSketch's wire-format check,
    // so the δ agreement must be validated here too — mixed-δ digests
    // landing in different partitions would otherwise merge silently
    require(other.delta == delta,
      s"tdigest merge: sketch delta ${other.delta} != aggregate delta $delta")
    var i = 0
    while (i < other.n) { add(other.means(i), other.weights(i)); i += 1 }
    if (other.min < min) min = other.min
    if (other.max > max) max = other.max
  }

  def addSketch(bytes: Array[Byte]): Unit = {
    val (d, m) = TdUtil.dims(bytes)
    require(d == delta,
      s"tdigest merge: sketch delta $d != aggregate delta $delta")
    var i = 0
    while (i < m) {
      // decode straight off the wire (HEADER offsets match TdUtil)
      var lm = 0L; var lw = 0L
      var j = 0
      while (j < 8) {
        lm = (lm << 8) | (bytes(TdUtil.HEADER + i * 16 + j) & 0xffL)
        lw = (lw << 8) | (bytes(TdUtil.HEADER + i * 16 + 8 + j) & 0xffL)
        j += 1
      }
      add(java.lang.Double.longBitsToDouble(lm),
        java.lang.Double.longBitsToDouble(lw))
      i += 1
    }
    if (m > 0) {
      var lmin = 0L; var lmax = 0L
      var j = 0
      while (j < 8) {
        lmin = (lmin << 8) | (bytes(8 + j) & 0xffL)
        lmax = (lmax << 8) | (bytes(16 + j) & 0xffL)
        j += 1
      }
      val bmin = java.lang.Double.longBitsToDouble(lmin)
      val bmax = java.lang.Double.longBitsToDouble(lmax)
      if (bmin < min) min = bmin
      if (bmax > max) max = bmax
    }
  }

  def toBytes: Array[Byte] = {
    compactNow()
    TdUtil.toBytes(means, weights, merged, delta,
      if (merged == 0) 0.0 else min, if (merged == 0) 0.0 else max)
  }
}

/** Build aggregate: `td_sketch(x, δ)` folds a group's numeric values
  * into one `binary` t-digest. Nulls ignored; an empty group evals to an
  * empty digest (m=0; quantiles over it are NaN), not null. */
case class TDigestAgg(child: Expression, delta: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TdBuffer] {

  require(delta >= 10 && delta <= 10000,
    s"tdigest: delta $delta out of range [10, 10000]")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"td_sketch expects a double input (cast the measure), got " +
          s"${child.dataType.catalogString}")

  override def createAggregationBuffer(): TdBuffer = new TdBuffer(delta)

  override def update(buf: TdBuffer, input: InternalRow): TdBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double], 1.0)
    buf
  }

  override def merge(b1: TdBuffer, b2: TdBuffer): TdBuffer = {
    b1.mergeIn(b2); b1
  }

  override def eval(buf: TdBuffer): Any = buf.toBytes

  override def serialize(buf: TdBuffer): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): TdBuffer = {
    val (d, _) = TdUtil.dims(bytes)
    val b = new TdBuffer(d)
    b.addSketch(bytes)
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Rollup-union aggregate: `td_merge(sketch)` merges pre-built digests
  * (same δ) into one — per-day digests → monthly quantiles without
  * re-reading rows, exactly like cms_merge / the HLL rollup. Empty or
  * all-null groups eval to null (no δ to size an empty digest). */
case class TdMergeAgg(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Option[TdBuffer]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"td_merge expects binary digests, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Option[TdBuffer] = None

  private def absorb(acc: Option[TdBuffer], bytes: Array[Byte]): Option[TdBuffer] =
    acc match {
      case Some(b) => b.addSketch(bytes); acc
      case None =>
        val (d, _) = TdUtil.dims(bytes)
        val b = new TdBuffer(d)
        b.addSketch(bytes)
        Some(b)
    }

  override def update(buf: Option[TdBuffer], input: InternalRow): Option[TdBuffer] = {
    val v = child.eval(input)
    if (v == null) buf else absorb(buf, v.asInstanceOf[Array[Byte]])
  }

  override def merge(b1: Option[TdBuffer], b2: Option[TdBuffer]): Option[TdBuffer] =
    b2 match {
      case None => b1
      case Some(o) => b1 match {
        case None => b2
        case Some(b) => b.mergeIn(o); b1
      }
    }

  override def eval(buf: Option[TdBuffer]): Any =
    buf.map(_.toBytes).orNull

  override def serialize(buf: Option[TdBuffer]): Array[Byte] =
    buf.map(_.toBytes).getOrElse(Array.emptyByteArray)

  override def deserialize(bytes: Array[Byte]): Option[TdBuffer] =
    if (bytes.isEmpty) None
    else {
      val (d, _) = TdUtil.dims(bytes)
      val b = new TdBuffer(d)
      b.addSketch(bytes)
      Some(b)
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): TdMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TdMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `td_quantile(digest, q)`: quantile estimate off the wire bytes,
  * codegen'd like [[CmsEstimate]]. NaN for an empty digest. */
case class TdQuantile(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"td_quantile expects (binary digest, double quantile), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(sketch: Any, q: Any): Any =
    TdUtil.quantileBytes(sketch.asInstanceOf[Array[Byte]],
      q.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, q) =>
      s"graft.functions.TdUtil.quantileBytes($s, $q)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `td_cdf(digest, x)`: CDF probe off the wire bytes — the inverse of
  * [[TdQuantile]], codegen'd. NaN for an empty digest. */
case class TdCdf(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"td_cdf expects (binary digest, double value), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(sketch: Any, x: Any): Any =
    TdUtil.cdfBytes(sketch.asInstanceOf[Array[Byte]], x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, x) =>
      s"graft.functions.TdUtil.cdfBytes($s, $x)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Td {
  /** Aggregate a group's values into a t-digest. δ ≈ 100 gives ≲1%
    * mid-range rank error in ~2δ centroids of state. */
  def sketch(e: Column, delta: Int = 100): Column =
    ColumnBridge.column(TDigestAgg(
      ColumnBridge.expression(e.cast("double")), delta)
      .toAggregateExpression())

  /** Union pre-built digests (same δ) into one — the rollup path. */
  def merge(sketch: Column): Column =
    ColumnBridge.column(TdMergeAgg(ColumnBridge.expression(sketch))
      .toAggregateExpression())

  /** Quantile estimate against a [[sketch]]/[[merge]] result. */
  def quantile(sketch: Column, q: Double): Column = {
    require(q >= 0.0 && q <= 1.0, s"tdigest: quantile $q not in [0, 1]")
    ColumnBridge.column(TdQuantile(
      ColumnBridge.expression(sketch),
      org.apache.spark.sql.catalyst.expressions.Literal(q)))
  }

  /** CDF probe — estimated fraction of digested mass <= x. Column-valued
    * x (like `Kll.rank`) so a column scores per-row against one
    * broadcast digest. */
  def cdf(sketch: Column, x: Column): Column =
    ColumnBridge.column(TdCdf(
      ColumnBridge.expression(sketch),
      ColumnBridge.expression(x.cast("double"))))
}
