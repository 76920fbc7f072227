package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Count-Min sketch plumbing shared by the build aggregate, the sketch
  * union aggregate, the point-estimate expression, and generated code.
  * Wire format (also both aggregates' serialized buffer):
  * `[int depth][int width][depth × width × long]`, big-endian, row-major.
  *
  * Row addressing reuses the Kirsch-Mitzenmacher double-hashing scheme of
  * [[BloomUtil]]: from one 64-bit input hash x, h1 = x and
  * h2 = splitmix64(x) | 1, row r probes column (h1 + r·h2) mod width —
  * pairwise-independent-enough per published CM analysis, one hash
  * evaluation per value.
  *
  * Estimates are ONE-SIDED: est(x) ≥ true(x) always, and
  * est(x) ≤ true(x) + ε·n with probability 1−δ for width = ⌈e/ε⌉,
  * depth = ⌈ln(1/δ)⌉ (Cormode & Muthukrishnan '05). */
object CmsUtil {
  final val HEADER = 8 // int depth + int width

  def add(counts: Array[Long], depth: Int, width: Int, hash: Long): Unit = {
    val h2 = BloomUtil.splitmix(hash) | 1L
    var r = 0
    var h = hash
    while (r < depth) {
      val c = java.lang.Long.remainderUnsigned(h, width.toLong).toInt
      counts(r * width + c) += 1L
      r += 1
      h += h2
    }
  }

  def estimate(counts: Array[Long], depth: Int, width: Int, hash: Long): Long = {
    val h2 = BloomUtil.splitmix(hash) | 1L
    var min = Long.MaxValue
    var r = 0
    var h = hash
    while (r < depth) {
      val c = java.lang.Long.remainderUnsigned(h, width.toLong).toInt
      val v = counts(r * width + c)
      if (v < min) min = v
      r += 1
      h += h2
    }
    min
  }

  def toBytes(counts: Array[Long], depth: Int, width: Int): Array[Byte] = {
    val out = new Array[Byte](HEADER + counts.length * 8)
    out(0) = (depth >>> 24).toByte; out(1) = (depth >>> 16).toByte
    out(2) = (depth >>> 8).toByte; out(3) = depth.toByte
    out(4) = (width >>> 24).toByte; out(5) = (width >>> 16).toByte
    out(6) = (width >>> 8).toByte; out(7) = width.toByte
    var i = 0
    while (i < counts.length) {
      val w = counts(i)
      val off = HEADER + (i << 3)
      var j = 0
      while (j < 8) { out(off + j) = (w >>> (56 - 8 * j)).toByte; j += 1 }
      i += 1
    }
    out
  }

  /** Header decode with byte-length validation — the SQL surface lets any
    * binary column reach the estimate/union paths, and malformed input
    * must fail as a named error (the Bloom lesson, applied from day one). */
  def dims(bytes: Array[Byte]): (Int, Int) = {
    if (bytes.length < HEADER)
      throw new IllegalArgumentException(
        s"cms: ${bytes.length}-byte input is not a count-min sketch " +
          s"(shorter than the $HEADER-byte header)")
    val depth = ((bytes(0) & 0xff) << 24) | ((bytes(1) & 0xff) << 16) |
      ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
    val width = ((bytes(4) & 0xff) << 24) | ((bytes(5) & 0xff) << 16) |
      ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
    if (depth < 1 || depth > 64 || width < 1 ||
        bytes.length != HEADER + depth.toLong * width.toLong * 8L)
      throw new IllegalArgumentException(
        s"cms: input is not a count-min sketch (header says depth=$depth " +
          s"width=$width for ${bytes.length} bytes)")
    (depth, width)
  }

  def fromBytes(bytes: Array[Byte]): (Array[Long], Int, Int) = {
    val (depth, width) = dims(bytes)
    val counts = new Array[Long](depth * width)
    var i = 0
    while (i < counts.length) {
      val off = HEADER + (i << 3)
      var w = 0L
      var j = 0
      while (j < 8) { w = (w << 8) | (bytes(off + j) & 0xffL); j += 1 }
      counts(i) = w
      i += 1
    }
    (counts, depth, width)
  }

  /** Point estimate straight off the wire bytes — codegen-friendly like
    * [[BloomUtil.mightContain]]. */
  def estimateBytes(sketch: Array[Byte], hash: Long): Long = {
    val (depth, width) = dims(sketch)
    val h2 = BloomUtil.splitmix(hash) | 1L
    var min = Long.MaxValue
    var r = 0
    var h = hash
    while (r < depth) {
      val c = java.lang.Long.remainderUnsigned(h, width.toLong).toInt
      val off = HEADER + ((r * width + c) << 3)
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (sketch(off + j) & 0xffL); j += 1 }
      if (v < min) min = v
      r += 1
      h += h2
    }
    min
  }

  /** Join-size estimate from two sketches of identical dimensions: the
    * Count-Min inner product (Cormode & Muthukrishnan, J. Alg. 2005,
    * §4.2) — est = min over rows r of Σ_c a[r][c]·b[r][c]. Every key
    * pair that joins lands in the same cell of every row (same hash
    * family by construction), so each row's dot product counts the TRUE
    * join size plus nonnegative collision cross-terms: the estimate
    * NEVER under-counts, and est ≤ true + ε·N_a·N_b with probability
    * ≥ 1−δ at the [[sizeFor]] dimensions (N = each side's row count).
    *
    * This is the "how big is this join going to be" question answered
    * from two KB-sized summaries BEFORE committing a 100 TB shuffle —
    * the planner input that decides broadcast vs shuffle vs
    * salt-the-hot-keys. Accumulated in double (row sums are KB-scale
    * loops; exact below 2^53 — join sizes beyond that are approximate
    * in any representation you'd act on). */
  def joinSizeBytes(a: Array[Byte], b: Array[Byte]): Double = {
    val (ca, da, wa) = fromBytes(a)
    val (cb, db, wb) = fromBytes(b)
    require(da == db && wa == wb,
      s"cms: join-size needs sketches of identical dimensions, got " +
        s"${da}x$wa vs ${db}x$wb")
    var min = Double.MaxValue
    var r = 0
    while (r < da) {
      var s = 0.0
      var c = 0
      while (c < wa) { s += ca(r * wa + c).toDouble * cb(r * wa + c); c += 1 }
      if (s < min) min = s
      r += 1
    }
    min
  }

  /** Standard sizing: width = ⌈e/ε⌉ columns (additive error ≤ ε·n),
    * depth = ⌈ln(1/δ)⌉ rows (with probability ≥ 1−δ). */
  def sizeFor(eps: Double, delta: Double): (Int, Int) = {
    require(eps > 0.0 && eps < 1.0, s"cms: eps $eps not in (0, 1)")
    require(delta > 0.0 && delta < 1.0, s"cms: delta $delta not in (0, 1)")
    val width = math.ceil(math.E / eps)
    require(width <= (1 << 24).toDouble,
      f"cms: eps $eps needs $width%.0f columns (> ${1 << 24}); raise eps")
    (math.max(1, math.ceil(math.log(1.0 / delta)).toInt),
      width.toInt)
  }
}

/** Count-Min build aggregate: `cms_sketch(xxhash64(e), depth, width)`
  * folds a group's values into one `binary` frequency sketch.
  *
  * Completes the mergeable-sketch family's frequency axis: Misra-Gries
  * ([[HeavyHittersAgg]]) answers "what are the top keys" with O(k) state
  * but forgets everything else; Count-Min answers "how often did THIS
  * key occur" for ANY key asked after the fact, in depth×width longs of
  * state, one-sided (never under-counts). Merge = element-wise sum —
  * associative and commutative, so partitioning never changes the bytes,
  * and per-partition sketches (per day, per shard) union losslessly into
  * coarser grains via [[CmsMergeAgg]] exactly like the HLL rollup
  * (q_sketch_rollup) — count frequencies once, ask at any granularity
  * later without re-reading rows.
  *
  * Input must already be a 64-bit hash (Column/SQL APIs wrap in
  * xxhash64): the sketch stores no raw values. Nulls are ignored. An
  * empty group evals to an all-zero sketch (estimates 0 for everything),
  * not null. */
case class CountMinAgg(child: Expression, depth: Int, width: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 64, s"cms: depth $depth out of range")
  require(width >= 1 && width <= (1 << 24), s"cms: width $width out of range")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cms_sketch expects a 64-bit hash input (wrap the key in " +
          s"xxhash64), got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) CmsUtil.add(buf, depth, width, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = CmsUtil.toBytes(buf, depth, width)

  override def serialize(buf: Array[Long]): Array[Byte] =
    CmsUtil.toBytes(buf, depth, width)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    CmsUtil.fromBytes(bytes)._1

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Sketch-union aggregate: `cms_merge(sketch)` element-wise-sums a
  * group of pre-built Count-Min sketches into one — the rollup path
  * (daily sketches → monthly estimates without re-reading rows). All
  * inputs must share (depth, width); the first non-null input fixes the
  * dims, a mismatch is a named error. Empty/all-null groups eval to
  * null (there is no universal empty sketch without dims to size it). */
case class CmsMergeAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cms_merge expects binary sketches, got ${child.dataType.catalogString}")

  // empty marker: zero-length array (no dims yet); real buffers carry the
  // full wire format so serialize/deserialize are identity
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def sumInto(acc: Array[Byte], add: Array[Byte]): Array[Byte] = {
    val (d1, w1) = CmsUtil.dims(acc)
    val (d2, w2) = CmsUtil.dims(add)
    if (d1 != d2 || w1 != w2)
      throw new IllegalArgumentException(
        s"cms_merge: sketch dims differ (${d1}x$w1 vs ${d2}x$w2)")
    // sum in the byte domain via decode/encode of each long (bounded
    // work: depth×width longs)
    var i = CmsUtil.HEADER
    while (i < acc.length) {
      var a = 0L; var b = 0L
      var j = 0
      while (j < 8) {
        a = (a << 8) | (acc(i + j) & 0xffL)
        b = (b << 8) | (add(i + j) & 0xffL)
        j += 1
      }
      val s = a + b
      var k = 0
      while (k < 8) { acc(i + k) = (s >>> (56 - 8 * k)).toByte; k += 1 }
      i += 8
    }
    acc
  }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val bytes = v.asInstanceOf[Array[Byte]]
      if (buf.isEmpty) bytes.clone()
      else sumInto(buf, bytes)
    }
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
    if (b2.isEmpty) b1
    else if (b1.isEmpty) b2
    else sumInto(b1, b2)

  override def eval(buf: Array[Byte]): Any = if (buf.isEmpty) null else buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `cms_estimate(sketch, xxhash64(e))`: one-sided frequency estimate of
  * `e` in the data the sketch was built over. Codegen'd straight through
  * [[CmsUtil.estimateBytes]]; the sketch side is normally a broadcast
  * scalar, the value side any column. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects (binary sketch, 64-bit hash), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(sketch: Any, hash: Any): Any =
    CmsUtil.estimateBytes(sketch.asInstanceOf[Array[Byte]],
      hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, h) =>
      s"graft.functions.CmsUtil.estimateBytes($s, $h)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `cms_join_size(a, b)` — inner-product join-size estimate off two
  * same-dimension sketch byte arrays, codegen'd. */
case class CmsJoinSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cms_join_size expects two binary sketches, got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CmsUtil.joinSizeBytes(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CmsUtil.joinSizeBytes($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Cms {
  /** Aggregate a group's keys into a Count-Min sketch. Any key type:
    * values are xxhash64'd on the way in via [[HashIngest.nullSafeHash]]
    * (NULL keys skipped, not counted as a phantom value). Default dims
    * bound the additive error at ~ε·n for ε ≈ e/2048 ≈ 0.13% with
    * δ ≈ 2%. */
  def sketch(e: Column, depth: Int = 4, width: Int = 2048): Column =
    ColumnBridge.column(CountMinAgg(
      HashIngest.nullSafeHash(ColumnBridge.expression(e)), depth, width)
      .toAggregateExpression())

  /** Union pre-built sketches (same dims) into one — the rollup path. */
  def merge(sketch: Column): Column =
    ColumnBridge.column(CmsMergeAgg(ColumnBridge.expression(sketch))
      .toAggregateExpression())

  /** Point frequency estimate against a [[sketch]]/[[merge]] result. The
    * probe value is xxhash64'd the same way the build side was, so types
    * must match (xxhash64 of 1L and of "1" differ). A NULL probe answers
    * NULL, never the phantom's count. */
  def estimate(sketch: Column, e: Column): Column =
    ColumnBridge.column(CmsEstimate(
      ColumnBridge.expression(sketch),
      HashIngest.nullSafeHash(ColumnBridge.expression(e))))

  /** Join-size estimate from two same-dimension sketches built over the
    * two sides' join keys — never under-counts; see
    * [[CmsUtil.joinSizeBytes]]. */
  def joinSize(a: Column, b: Column): Column =
    ColumnBridge.column(CmsJoinSize(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
