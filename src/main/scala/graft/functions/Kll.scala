package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** KLL quantile sketch (Karnin, Lang & Liberty, FOCS 2016) — the
  * UNIFORM-rank-bound complement to the tail-weighted t-digest
  * ([[TdUtil]]): a hierarchy of fixed-capacity compactors where level i
  * holds items of weight 2^i; a full level sorts and promotes every
  * second item (alternating offset), and capacities shrink geometrically
  * (×2/3) below the top level. Rank error is O(1/k) uniformly in q —
  * where the t-digest concentrates accuracy at the tails and relaxes
  * mid-range, KLL's guarantee is the same everywhere and
  * distribution-free, which is the property you want for SLO-style
  * "p50 within ±ε rank" contracts rather than p999 monitoring.
  *
  * Mergeable: levels concatenate, then overfull levels re-compact —
  * associative and commutative up to the compaction coin, so it
  * pre-aggregates and rolls up exactly like the other sketches
  * (per-day sketches → monthly quantiles) and rides streaming state
  * stores as a buffer (the heavyHittersStream pattern).
  *
  * Determinism stance (same honesty as the t-digest): the compaction
  * offset "coin" is a splitmix hash of (level, per-level compaction
  * count) — deterministic given insertion order, no RNG state in the
  * buffer — but insertion order follows partition order, so the BYTES
  * are not partition-invariant; the rank-error bound is. Specs pin
  * bounds and invariants (exact min/max, exact total weight, monotone
  * quantiles), not byte equality.
  *
  * Wire format (= the aggregates' serialized buffer), big-endian:
  * `[int k][int numLevels][long n][double min][double max]
  *  [numLevels × (int size, size × double)]` — levels bottom-up,
  * level payloads unsorted (sorting happens at compaction/query time).
  */
object KllUtil {
  final val MinLevelCap = 8

  /** Capacity of `level` when `top` is the current highest level:
    * k at the top, ×2/3 per step down, floored at [[MinLevelCap]]. */
  def cap(k: Int, level: Int, top: Int): Int =
    math.max(MinLevelCap,
      math.ceil(k * math.pow(2.0 / 3.0, (top - level).toDouble)).toInt)

  /** Deterministic compaction offset for (level, nth compaction of that
    * level): bit 0 of a splitmix64 finalizer — alternates irregularly so
    * an adversarial input order cannot line systematic error up, while
    * staying reproducible for a fixed insertion order. */
  def offsetBit(level: Int, count: Long): Int = {
    var z = level.toLong * 0x9E3779B97F4A7C15L + count * 0xD1B54A32D192ED03L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    ((z ^ (z >>> 31)) & 1L).toInt
  }

  def quantileBytes(bytes: Array[Byte], q: Double): Double = {
    require(q >= 0.0 && q <= 1.0, s"kll: quantile $q not in [0, 1]")
    require(bytes != null && bytes.length >= 4,
      s"kll: ${if (bytes == null) "null" else s"${bytes.length}-byte"} input is not a KLL sketch")
    val k = java.nio.ByteBuffer.wrap(bytes).getInt
    val b = new KllBuffer(k)
    b.addSketch(bytes)
    b.quantile(q)
  }

  /** CDF off the wire bytes — one allocation-free read-only pass over
    * the serialized levels (NOT a deserialize-into-buffer round-trip:
    * rank is this sketch's per-ROW probe via `Kll.rank(sketch, col)`,
    * and rebuilding a KllBuffer per input row — boxing ~3k doubles and
    * possibly compacting — would make the scoring pass GC-bound; caught
    * in self-review). Same estimate as [[KllBuffer.rank]]. */
  def rankBytes(bytes: Array[Byte], x: Double): Double = {
    require(bytes != null && bytes.length >= 32,
      s"kll: ${if (bytes == null) "null" else s"${bytes.length}-byte"} input is not a KLL sketch")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.getInt // k
    val nLevels = bb.getInt
    require(nLevels >= 1 && nLevels <= 64, s"kll: corrupt level count $nLevels")
    val n = bb.getLong
    if (n == 0L) return Double.NaN
    bb.getDouble; bb.getDouble // min, max
    var below = 0L
    var total = 0L
    var i = 0
    while (i < nLevels) {
      var sz = bb.getInt
      require(sz >= 0 && sz.toLong * 8 <= bb.remaining,
        s"kll: corrupt level size $sz at level $i")
      total += sz.toLong << i
      while (sz > 0) {
        if (bb.getDouble <= x) below += 1L << i
        sz -= 1
      }
      i += 1
    }
    below.toDouble / total
  }

  /** Item count straight off the wire header (bytes 8..15). */
  def countBytes(bytes: Array[Byte]): Long = {
    require(bytes != null && bytes.length >= 16,
      s"kll: ${if (bytes == null) "null" else s"${bytes.length}-byte"} input is not a KLL sketch")
    java.nio.ByteBuffer.wrap(bytes).getLong(8)
  }
}

/** Mutable aggregation buffer. `k` governs accuracy (ε ≈ O(1/k)). */
final class KllBuffer(val k: Int) {
  require(k >= 16 && k <= 65536, s"kll: k $k out of range [16, 65536]")

  // level i holds weight-2^i items; growable, payload order arbitrary
  private var levels = Array.fill(1)(new java.util.ArrayList[java.lang.Double]())
  private var compactions = new Array[Long](1)
  var n: Long = 0L
  var min: Double = Double.NaN
  var max: Double = Double.NaN

  private def top: Int = levels.length - 1

  private def ensureLevel(i: Int): Unit =
    if (i > top) {
      val nl = Array.fill(i + 1)(new java.util.ArrayList[java.lang.Double]())
      System.arraycopy(levels, 0, nl, 0, levels.length)
      val nc = new Array[Long](i + 1)
      System.arraycopy(compactions, 0, nc, 0, compactions.length)
      var j = levels.length
      while (j <= i) { nl(j) = new java.util.ArrayList[java.lang.Double](); j += 1 }
      levels = nl; compactions = nc
    }

  def add(x: Double): Unit = {
    if (n == 0L || x < min) min = x
    if (n == 0L || x > max) max = x
    n += 1
    levels(0).add(x)
    if (levels(0).size >= KllUtil.cap(k, 0, top)) compactCascade(0)
  }

  /** Sort the level, promote every second item (alternating offset) to
    * level+1, keep an odd leftover in place; weight is conserved exactly
    * (2 × weight-w items → 1 × weight-2w item). */
  private def compactLevel(i: Int): Unit = {
    val lvl = levels(i)
    val m = lvl.size
    if (m < 2) return
    val arr = new Array[Double](m)
    var j = 0
    while (j < m) { arr(j) = lvl.get(j); j += 1 }
    java.util.Arrays.sort(arr)
    val pairs = m / 2
    val off = KllUtil.offsetBit(i, compactions(i))
    compactions(i) += 1
    ensureLevel(i + 1)
    lvl.clear()
    // odd leftover: the largest element stays at this level, so the pairs
    // are arr[0, 2·pairs) and the promotion grid is exact
    if (m % 2 == 1) lvl.add(arr(m - 1))
    val up = levels(i + 1)
    j = 0
    while (j < pairs) { up.add(arr(2 * j + off)); j += 1 }
  }

  private def compactCascade(start: Int): Unit = {
    var i = start
    while (i <= top && levels(i).size >= KllUtil.cap(k, i, top)) {
      compactLevel(i)
      i += 1
    }
  }

  def mergeIn(other: KllBuffer): Unit = {
    require(other.k == k,
      s"kll: cannot merge sketches with different k (${other.k} vs $k)")
    if (other.n == 0L) return
    if (n == 0L || other.min < min) min = other.min
    if (n == 0L || other.max > max) max = other.max
    n += other.n
    ensureLevel(other.top)
    var i = 0
    while (i <= other.top) {
      levels(i).addAll(other.levels(i))
      i += 1
    }
    // re-establish capacity invariants bottom-up
    i = 0
    while (i <= top) {
      if (levels(i).size >= KllUtil.cap(k, i, top)) compactCascade(i)
      i += 1
    }
  }

  def quantile(q: Double): Double = {
    require(q >= 0.0 && q <= 1.0, s"kll: quantile $q not in [0, 1]")
    if (n == 0L) return Double.NaN
    if (q == 0.0) return min
    if (q == 1.0) return max
    var count = 0
    var i = 0
    while (i <= top) { count += levels(i).size; i += 1 }
    val items = new Array[Double](count)
    val weights = new Array[Long](count)
    var p = 0
    i = 0
    while (i <= top) {
      val lvl = levels(i)
      var j = 0
      while (j < lvl.size) {
        items(p) = lvl.get(j); weights(p) = 1L << i; p += 1; j += 1
      }
      i += 1
    }
    val idx = Array.range(0, count).map(Integer.valueOf)
    java.util.Arrays.sort(idx, (a: Integer, b: Integer) =>
      java.lang.Double.compare(items(a), items(b)))
    var totalW = 0L
    i = 0
    while (i < count) { totalW += weights(i); i += 1 }
    val target = q * totalW
    var cum = 0L
    i = 0
    while (i < count) {
      cum += weights(idx(i))
      if (cum >= target) return items(idx(i))
      i += 1
    }
    max
  }

  /** CDF probe — the inverse of [[quantile]]: estimated fraction of the
    * sketched mass that is <= x, same uniform O(1/k) rank-error bound
    * (the estimate IS a rank, which is exactly what the sketch
    * preserves). Answers "what percentile is THIS score" without any
    * inverse-search over quantile probes. */
  def rank(x: Double): Double = {
    if (n == 0L) return Double.NaN
    var below = 0L
    var i = 0
    while (i <= top) {
      val lvl = levels(i)
      var j = 0
      while (j < lvl.size) {
        if (lvl.get(j) <= x) below += 1L << i
        j += 1
      }
      i += 1
    }
    below.toDouble / totalWeight
  }

  /** Exact total weight across levels — must equal n at all times
    * (compaction trades 2×w for 1×2w; the odd leftover stays). */
  def totalWeight: Long = {
    var t = 0L
    var i = 0
    while (i <= top) { t += levels(i).size.toLong * (1L << i); i += 1 }
    t
  }

  def toBytes: Array[Byte] = {
    var payload = 0
    var i = 0
    while (i <= top) { payload += levels(i).size; i += 1 }
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + 8 + 8 + 8 +
      (top + 1) * 4 + payload * 8)
    bb.putInt(k).putInt(top + 1).putLong(n).putDouble(min).putDouble(max)
    i = 0
    while (i <= top) {
      val lvl = levels(i)
      bb.putInt(lvl.size)
      var j = 0
      while (j < lvl.size) { bb.putDouble(lvl.get(j)); j += 1 }
      i += 1
    }
    bb.array()
  }

  /** Merge serialized sketch bytes into this buffer (weight-preserving:
    * level-i items enter at level i, then capacities re-establish). */
  def addSketch(bytes: Array[Byte]): Unit = {
    require(bytes.length >= 32, s"kll: ${bytes.length}-byte input is not a KLL sketch")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val ok = bb.getInt
    require(ok == k, s"kll: cannot merge sketches with different k ($ok vs $k)")
    val nLevels = bb.getInt
    require(nLevels >= 1 && nLevels <= 64, s"kll: corrupt level count $nLevels")
    val on = bb.getLong
    if (on == 0L) return
    val omin = bb.getDouble; val omax = bb.getDouble
    if (n == 0L || omin < min) min = omin
    if (n == 0L || omax > max) max = omax
    n += on
    ensureLevel(nLevels - 1)
    var i = 0
    while (i < nLevels) {
      var sz = bb.getInt
      // sz.toLong: an adversarial sz near 2^29 overflows `sz * 8` in Int
      // space and slips past the guard it exists for (self-review catch)
      require(sz >= 0 && sz.toLong * 8 <= bb.remaining,
        s"kll: corrupt level size $sz at level $i")
      val lvl = levels(i)
      while (sz > 0) { lvl.add(bb.getDouble); sz -= 1 }
      i += 1
    }
    i = 0
    while (i <= top) {
      if (levels(i).size >= KllUtil.cap(k, i, top)) compactCascade(i)
      i += 1
    }
  }
}

/** Build aggregate: `kll_sketch(x, k)` — map-side partial sketches,
  * mergeable, O(k) items of state per group whatever the group size. */
case class KllAgg(child: Expression, k: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllBuffer] {

  require(k >= 16 && k <= 65536, s"kll_sketch: k $k out of range [16, 65536]")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kll_sketch expects a double input (cast the measure), got " +
          s"${child.dataType.catalogString}")

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: KllBuffer, b2: KllBuffer): KllBuffer = {
    b1.mergeIn(b2); b1
  }

  override def eval(buf: KllBuffer): Any = buf.toBytes
  override def serialize(buf: KllBuffer): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): KllBuffer = {
    require(bytes.length >= 4, "kll: empty buffer bytes")
    val bk = java.nio.ByteBuffer.wrap(bytes).getInt
    val b = new KllBuffer(bk)
    b.addSketch(bytes)
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Rollup-union aggregate: `kll_merge(sketch)` unions pre-built sketches
  * (same k). Empty/all-null groups eval to null. */
case class KllMergeAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Option[KllBuffer]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kll_merge expects binary sketches, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Option[KllBuffer] = None

  private def absorb(acc: Option[KllBuffer], bytes: Array[Byte]): Option[KllBuffer] =
    acc match {
      case Some(b) => b.addSketch(bytes); acc
      case None =>
        require(bytes.length >= 4, "kll_merge: corrupt sketch bytes")
        val bk = java.nio.ByteBuffer.wrap(bytes).getInt
        val b = new KllBuffer(bk)
        b.addSketch(bytes)
        Some(b)
    }

  override def update(buf: Option[KllBuffer], input: InternalRow): Option[KllBuffer] = {
    val v = child.eval(input)
    if (v == null) buf else absorb(buf, v.asInstanceOf[Array[Byte]])
  }

  override def merge(b1: Option[KllBuffer], b2: Option[KllBuffer]): Option[KllBuffer] =
    b2 match {
      case None => b1
      case Some(o) => b1 match {
        case None => b2
        case Some(b) => b.mergeIn(o); b1
      }
    }

  override def eval(buf: Option[KllBuffer]): Any = buf.map(_.toBytes).orNull
  override def serialize(buf: Option[KllBuffer]): Array[Byte] =
    buf.map(_.toBytes).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): Option[KllBuffer] =
    if (bytes.isEmpty) None
    else {
      val bk = java.nio.ByteBuffer.wrap(bytes).getInt
      val b = new KllBuffer(bk)
      b.addSketch(bytes)
      Some(b)
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `kll_quantile(sketch, q)`: quantile off the wire bytes, codegen'd. */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kll_quantile expects (binary sketch, double quantile), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(sketch: Any, q: Any): Any =
    KllUtil.quantileBytes(sketch.asInstanceOf[Array[Byte]], q.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, q) =>
      s"graft.functions.KllUtil.quantileBytes($s, $q)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `kll_rank(sketch, x)`: CDF probe off the wire bytes, codegen'd — the
  * inverse of [[KllQuantile]] ("what percentile is this score"), same
  * uniform rank-error bound because the answer IS a rank. */
case class KllRank(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kll_rank expects (binary sketch, double value), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(sketch: Any, x: Any): Any =
    KllUtil.rankBytes(sketch.asInstanceOf[Array[Byte]], x.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, x) =>
      s"graft.functions.KllUtil.rankBytes($s, $x)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Kll {
  /** Aggregate a group's values into a KLL sketch. k ≈ 200 gives ≲1.5%
    * uniform rank error in ~3k items of state. */
  def sketch(e: Column, k: Int = 200): Column =
    ColumnBridge.column(KllAgg(
      ColumnBridge.expression(e.cast("double")), k).toAggregateExpression())

  /** Union pre-built sketches (same k) — the rollup path. */
  def merge(sketch: Column): Column =
    ColumnBridge.column(KllMergeAgg(ColumnBridge.expression(sketch))
      .toAggregateExpression())

  /** Quantile estimate against a [[sketch]]/[[merge]] result. */
  def quantile(sketch: Column, q: Double): Column = {
    require(q >= 0.0 && q <= 1.0, s"kll: quantile $q not in [0, 1]")
    ColumnBridge.column(KllQuantile(
      ColumnBridge.expression(sketch),
      org.apache.spark.sql.catalyst.expressions.Literal(q)))
  }

  /** CDF probe — estimated fraction of sketched mass <= x. Column-valued
    * x on purpose: scoring a COLUMN of values against one broadcast
    * sketch ("each document's quality percentile vs the corpus") is the
    * per-row use a scalar-only API would forbid. */
  def rank(sketch: Column, x: Column): Column =
    ColumnBridge.column(KllRank(
      ColumnBridge.expression(sketch),
      ColumnBridge.expression(x.cast("double"))))
}
