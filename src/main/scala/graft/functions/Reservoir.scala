package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable distinct-uniform SAMPLE: the value-carrying sibling of the
  * theta sketch. Keep the k distinct values whose xxhash64 is smallest —
  * a hash is a uniform random draw, so "k smallest hashes" IS a uniform
  * sample without replacement of the group's distinct values (the KMV /
  * bottom-k sampling construction the theta estimator is built on), and
  * it is the rare sample that MERGES: bottom-k of a union equals the
  * merge of per-partition bottom-k's, making the aggregate partial-safe,
  * rollup-able (per-day samples union into a monthly sample without
  * re-reading rows), and bit-for-bit deterministic under any
  * partitioning or insertion order — the same byte-equality contract as
  * theta, pinned in spec.
  *
  * What it is FOR at 100 TB: "show me 10 example documents per cluster /
  * 100 example user-ids per cohort" as ONE aggregation — where
  * `collect_list + slice` holds the whole group as state and a window
  * `row_number <= k` pays a per-group sort, this holds exactly k values
  * per group forever; and unlike `TABLESAMPLE` the result is stable
  * across runs, partitionings, AND incremental rollups.
  *
  * Not a row-frequency sample: duplicate values collapse (one draw per
  * DISTINCT value). For weighted row sampling see TextOps.weightedSample.
  *
  * State is O(k · value size): values ride in the buffer, so k and the
  * value column must be sized like a collect — the per-value byte cap
  * refuses payloads that would turn an agg buffer into a blob store.
  *
  * Hash ties between DIFFERENT values (≈ 2^-64) resolve to the
  * lexicographically smaller byte string — arbitrary, but order- and
  * partitioning-independent, which is what the determinism contract
  * needs.
  */
object ReservoirUtil {
  val MaxValueBytes: Int = 1 << 20

  /** Wire: [k:int][n:int] then n × ([flippedHash:long][len:int][utf8]),
    * sorted by flipped hash ascending. */
  def toBytes(k: Int, entries: Seq[(Long, Array[Byte])]): Array[Byte] = {
    val payload = entries.map(_._2.length).sum
    val bb = java.nio.ByteBuffer.allocate(8 + 12 * entries.length + payload)
    bb.putInt(k).putInt(entries.length)
    entries.foreach { case (h, v) => bb.putLong(h).putInt(v.length).put(v) }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): (Int, Seq[(Long, Array[Byte])]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val n = bb.getInt
    require(n >= 0 && n <= k,
      s"reservoir: corrupt sketch header (k=$k n=$n len=${bytes.length})")
    val out = Seq.newBuilder[(Long, Array[Byte])]
    var i = 0
    while (i < n) {
      val h = bb.getLong
      val len = bb.getInt
      require(len >= 0 && len <= bb.remaining(),
        s"reservoir: corrupt entry length $len at index $i")
      val v = new Array[Byte](len)
      bb.get(v)
      out += ((h, v))
      i += 1
    }
    require(bb.remaining() == 0,
      s"reservoir: ${bb.remaining()} trailing bytes")
    (k, out.result())
  }

  def valuesOf(bytes: Array[Byte]): Array[UTF8String] =
    fromBytes(bytes)._2.map(e => UTF8String.fromBytes(e._2)).toArray
}

/** Mutable bottom-k buffer: flipped-hash-ordered map to value bytes. */
final class ReservoirBuffer(val k: Int) {
  require(k >= 1 && k <= (1 << 16),
    s"reservoir: k=$k out of range [1, 65536] — the buffer carries VALUES; " +
      "for larger k you want a real table, not an agg state")
  private val map = new java.util.TreeMap[java.lang.Long, Array[Byte]]()
  private var threshold: Long = Long.MaxValue // map.lastKey once at capacity

  private def tieKeep(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (java.util.Arrays.compareUnsigned(a, b) <= 0) a else b

  def add(hash: Long, value: Array[Byte]): Unit = {
    require(value.length <= ReservoirUtil.MaxValueBytes,
      s"reservoir: value of ${value.length} bytes exceeds the " +
        s"${ReservoirUtil.MaxValueBytes}-byte cap — an agg buffer is not " +
        "a blob store; sample ids and join the payload back")
    val f = ThetaUtil.flip(hash)
    if (map.size < k) {
      val prev = map.get(f)
      map.put(f, if (prev == null) value else tieKeep(prev, value))
      if (map.size == k) threshold = map.lastKey()
    } else if (f <= threshold) {
      val prev = map.get(f)
      if (prev != null) map.put(f, tieKeep(prev, value))
      else {
        map.put(f, value)
        map.pollLastEntry()
        threshold = map.lastKey()
      }
    }
  }

  def mergeIn(other: ReservoirBuffer): Unit = {
    require(other.k == k,
      s"reservoir: cannot union samples of different k (${other.k} vs $k)")
    val it = other.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val f = e.getKey.longValue()
      if (map.size == k && f > threshold) return // other is sorted ascending
      add(ThetaUtil.flip(f), e.getValue) // add() re-flips
    }
  }

  def toBytes: Array[Byte] = {
    val out = Seq.newBuilder[(Long, Array[Byte])]
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out += ((e.getKey.longValue(), e.getValue))
    }
    ReservoirUtil.toBytes(k, out.result())
  }
}

object ReservoirBuffer {
  def fromBytes(bytes: Array[Byte]): ReservoirBuffer = {
    val (k, entries) = ReservoirUtil.fromBytes(bytes)
    val buf = new ReservoirBuffer(k)
    entries.foreach { case (f, v) => buf.add(ThetaUtil.flip(f), v) }
    buf
  }
}

/** `reservoir_sample(e, k)` — build aggregate over a STRING child (the
  * Column/SQL wrappers cast); the value's own bytes are hashed, so the
  * sample is a pure function of the value SET. */
case class ReservoirAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ReservoirBuffer] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"reservoir_sample expects a string value (cast first), got " +
          child.dataType.catalogString)

  override def createAggregationBuffer(): ReservoirBuffer = new ReservoirBuffer(k)

  override def update(buf: ReservoirBuffer, input: InternalRow): ReservoirBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val hash = XxHash64Function.hash(s, StringType, 42L)
      buf.add(hash, s.getBytes)
    }
    buf
  }

  override def merge(b1: ReservoirBuffer, b2: ReservoirBuffer): ReservoirBuffer = {
    b1.mergeIn(b2); b1
  }

  override def eval(buf: ReservoirBuffer): Any = buf.toBytes
  override def serialize(buf: ReservoirBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): ReservoirBuffer =
    ReservoirBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ReservoirAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ReservoirAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `reservoir_merge(sketch)` — union pre-built samples (the rollup path). */
case class ReservoirMergeAgg(child: Expression,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Option[ReservoirBuffer]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"reservoir_merge expects binary sketches, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Option[ReservoirBuffer] = None

  private def absorb(acc: Option[ReservoirBuffer],
                     other: ReservoirBuffer): Option[ReservoirBuffer] =
    acc match {
      case None => Some(other)
      case Some(b) => b.mergeIn(other); acc
    }

  override def update(buf: Option[ReservoirBuffer], input: InternalRow): Option[ReservoirBuffer] = {
    val v = child.eval(input)
    if (v == null) buf
    else absorb(buf, ReservoirBuffer.fromBytes(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(b1: Option[ReservoirBuffer],
                     b2: Option[ReservoirBuffer]): Option[ReservoirBuffer] =
    (b1, b2) match {
      case (_, None) => b1
      case (None, _) => b2
      case (Some(a), Some(b)) => a.mergeIn(b); b1
    }

  override def eval(buf: Option[ReservoirBuffer]): Any = buf.map(_.toBytes).orNull
  override def serialize(buf: Option[ReservoirBuffer]): Array[Byte] =
    buf.map(_.toBytes).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): Option[ReservoirBuffer] =
    if (bytes.isEmpty) None else Some(ReservoirBuffer.fromBytes(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): ReservoirMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ReservoirMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `reservoir_values(sketch)` — the sampled values, hash-ordered (i.e.
  * in uniform random yet deterministic order), codegen'd. */
case class ReservoirValues(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"reservoir_values expects a binary sketch, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(sketch: Any): Any =
    new GenericArrayData(
      ReservoirUtil.valuesOf(sketch.asInstanceOf[Array[Byte]])
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"(Object[]) graft.functions.ReservoirUtil.valuesOf($s))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Weighted sibling of the reservoir: Efraimidis-Spirakis (A-ES) sampling
  * without replacement as a mergeable aggregate. Each distinct value
  * draws its uniform u from its own hash (so the draw is a pure function
  * of the value, exactly like the unweighted sketch) and competes with
  * key = ln(u)/w — keeping the k LARGEST keys is distribution-identical
  * to weighted sampling without replacement with inclusion ∝ weight
  * (Efraimidis & Spirakis, IPL 2006, the u^(1/w) formulation in log
  * space). Same merge story as the unweighted sketch: top-k-of-union ==
  * union-of-top-k's, byte-deterministic, rollup-able, streaming-ready.
  *
  * A value seen with MULTIPLE weights competes at its MAX weight (keys
  * grow with w, so "max key wins" is the order- and partitioning-free
  * rule) — the distinct-value semantics of [[ReservoirAgg]], weighted.
  * For row-level weighted draws see TextOps.weightedSample.
  */
object WeightedReservoirUtil {
  /** Wire: [k:int][n:int] then n × ([key:double][len:int][utf8]), sorted
    * ascending by (key, value bytes). */
  def toBytes(k: Int, entries: Seq[(Double, Array[Byte])]): Array[Byte] = {
    val payload = entries.map(_._2.length).sum
    val bb = java.nio.ByteBuffer.allocate(8 + 12 * entries.length + payload)
    bb.putInt(k).putInt(entries.length)
    entries.foreach { case (key, v) => bb.putDouble(key).putInt(v.length).put(v) }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): (Int, Seq[(Double, Array[Byte])]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val n = bb.getInt
    require(n >= 0 && n <= k,
      s"weighted reservoir: corrupt header (k=$k n=$n len=${bytes.length})")
    val out = Seq.newBuilder[(Double, Array[Byte])]
    var i = 0
    while (i < n) {
      val key = bb.getDouble
      val len = bb.getInt
      require(len >= 0 && len <= bb.remaining(),
        s"weighted reservoir: corrupt entry length $len at index $i")
      val v = new Array[Byte](len)
      bb.get(v)
      out += ((key, v))
      i += 1
    }
    require(bb.remaining() == 0,
      s"weighted reservoir: ${bb.remaining()} trailing bytes")
    (k, out.result())
  }

  /** The A-ES key of a value at weight w: ln(u)/w with u = the value's
    * hash-uniform in [0, 1]. Deterministic per value. The u == 0 corner
    * (the one hash mapping to pos() == 0.0) yields key = −∞ — a valid
    * worst key, evicted first — and can never be NaN because weights are
    * required finite at ingest. */
  def keyOf(valueBytes: Array[Byte], w: Double): Double = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      UTF8String.fromBytes(valueBytes), StringType, 42L)
    val u = ThetaUtil.pos(ThetaUtil.flip(h))
    math.log(u) / w
  }

  /** Values best-first (descending key) from a sketch. */
  def valuesOf(bytes: Array[Byte]): Array[UTF8String] =
    fromBytes(bytes)._2.reverseIterator
      .map(e => UTF8String.fromBytes(e._2)).toArray
}

/** (key, value) node of the weighted buffer — top-level so buffers can
  * exchange entries during merge (a nested class would be path-dependent
  * per instance). */
private[functions] final class WrEntry(val key: Double, val value: Array[Byte])

private[functions] object WrEntry {
  val ord: java.util.Comparator[WrEntry] = new java.util.Comparator[WrEntry] {
    override def compare(a: WrEntry, b: WrEntry): Int = {
      val c = java.lang.Double.compare(a.key, b.key)
      if (c != 0) c else java.util.Arrays.compareUnsigned(a.value, b.value)
    }
  }
}

/** Mutable top-k-by-key buffer with per-value max-weight dedup. */
final class WeightedReservoirBuffer(val k: Int) {
  require(k >= 1 && k <= (1 << 16),
    s"weighted reservoir: k=$k out of range [1, 65536]")
  private val ord = WrEntry.ord
  private val tree = new java.util.TreeSet[WrEntry](ord)
  private val byValue = new java.util.HashMap[java.nio.ByteBuffer, WrEntry]()

  def add(value: Array[Byte], w: Double): Unit = {
    // finite required for real: w = Infinity would give every such value
    // key = -0.0 — all infinite weights tie at the top and inclusion
    // degenerates to byte order, the exact invisible bias this refusal
    // exists to prevent (NaN fails w > 0 on its own)
    require(w > 0 && java.lang.Double.isFinite(w),
      s"weighted reservoir: weight must be positive and finite, got $w — " +
        "filter or fix weights upstream; silently skipping bad weights " +
        "would bias the sample invisibly")
    require(value.length <= ReservoirUtil.MaxValueBytes,
      s"weighted reservoir: value of ${value.length} bytes exceeds the " +
        s"${ReservoirUtil.MaxValueBytes}-byte cap")
    addKeyed(WeightedReservoirUtil.keyOf(value, w), value)
  }

  private def addKeyed(key: Double, value: Array[Byte]): Unit = {
    val wrap = java.nio.ByteBuffer.wrap(value)
    val existing = byValue.get(wrap)
    if (existing != null) {
      if (key > existing.key) { // max-weight upgrade, order-independent
        tree.remove(existing)
        val e = new WrEntry(key, value)
        tree.add(e)
        byValue.put(wrap, e)
      }
    } else if (tree.size < k) {
      val e = new WrEntry(key, value)
      tree.add(e)
      byValue.put(wrap, e)
    } else if (tree.size > 0 && ord.compare(new WrEntry(key, value), tree.first()) > 0) {
      val evicted = tree.pollFirst()
      byValue.remove(java.nio.ByteBuffer.wrap(evicted.value))
      val e = new WrEntry(key, value)
      tree.add(e)
      byValue.put(wrap, e)
    }
  }

  def mergeIn(other: WeightedReservoirBuffer): Unit = {
    require(other.k == k,
      s"weighted reservoir: cannot union samples of different k (${other.k} vs $k)")
    // descending: once an incoming key cannot beat our floor (and cannot
    // be an upgrade — same value in our tree implies our key >= floor),
    // nothing later can either
    val it = other.tree.descendingIterator()
    while (it.hasNext) {
      val e = it.next()
      if (tree.size == k && ord.compare(e, tree.first()) <= 0) return
      addKeyed(e.key, e.value)
    }
  }

  def toBytes: Array[Byte] = {
    val out = Seq.newBuilder[(Double, Array[Byte])]
    val it = tree.iterator()
    while (it.hasNext) { val e = it.next(); out += ((e.key, e.value)) }
    WeightedReservoirUtil.toBytes(k, out.result())
  }
}

object WeightedReservoirBuffer {
  def fromBytes(bytes: Array[Byte]): WeightedReservoirBuffer = {
    val (k, entries) = WeightedReservoirUtil.fromBytes(bytes)
    val buf = new WeightedReservoirBuffer(k)
    entries.foreach { case (key, v) => buf.addKeyed(key, v) }
    buf
  }
}

/** `weighted_sample(e, w, k)` — A-ES build aggregate (string value,
  * double weight). */
case class WeightedReservoirAgg(valueChild: Expression, weightChild: Expression,
                                k: Int,
                                mutableAggBufferOffset: Int = 0,
                                inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[WeightedReservoirBuffer] {

  override def children: Seq[Expression] = valueChild :: weightChild :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (valueChild.dataType == StringType && weightChild.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"weighted_sample expects (string, double), got " +
          s"(${valueChild.dataType.catalogString}, ${weightChild.dataType.catalogString})")

  override def createAggregationBuffer(): WeightedReservoirBuffer =
    new WeightedReservoirBuffer(k)

  override def update(buf: WeightedReservoirBuffer, input: InternalRow): WeightedReservoirBuffer = {
    val v = valueChild.eval(input)
    val w = weightChild.eval(input)
    if (v != null && w != null)
      buf.add(v.asInstanceOf[UTF8String].getBytes, w.asInstanceOf[Double])
    buf
  }

  override def merge(b1: WeightedReservoirBuffer, b2: WeightedReservoirBuffer): WeightedReservoirBuffer = {
    b1.mergeIn(b2); b1
  }

  override def eval(buf: WeightedReservoirBuffer): Any = buf.toBytes
  override def serialize(buf: WeightedReservoirBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): WeightedReservoirBuffer =
    WeightedReservoirBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): WeightedReservoirAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WeightedReservoirAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(valueChild = newChildren(0), weightChild = newChildren(1))
}

/** `weighted_sample_merge(sketch)` — union pre-built weighted samples. */
case class WeightedReservoirMergeAgg(child: Expression,
                                     mutableAggBufferOffset: Int = 0,
                                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Option[WeightedReservoirBuffer]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"weighted_sample_merge expects binary sketches, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Option[WeightedReservoirBuffer] = None

  private def absorb(acc: Option[WeightedReservoirBuffer],
                     other: WeightedReservoirBuffer): Option[WeightedReservoirBuffer] =
    acc match {
      case None => Some(other)
      case Some(b) => b.mergeIn(other); acc
    }

  override def update(buf: Option[WeightedReservoirBuffer], input: InternalRow): Option[WeightedReservoirBuffer] = {
    val v = child.eval(input)
    if (v == null) buf
    else absorb(buf, WeightedReservoirBuffer.fromBytes(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(b1: Option[WeightedReservoirBuffer],
                     b2: Option[WeightedReservoirBuffer]): Option[WeightedReservoirBuffer] =
    (b1, b2) match {
      case (_, None) => b1
      case (None, _) => b2
      case (Some(a), Some(b)) => a.mergeIn(b); b1
    }

  override def eval(buf: Option[WeightedReservoirBuffer]): Any = buf.map(_.toBytes).orNull
  override def serialize(buf: Option[WeightedReservoirBuffer]): Array[Byte] =
    buf.map(_.toBytes).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): Option[WeightedReservoirBuffer] =
    if (bytes.isEmpty) None else Some(WeightedReservoirBuffer.fromBytes(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): WeightedReservoirMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WeightedReservoirMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `weighted_sample_values(sketch)` — sampled values BEST-FIRST
  * (descending A-ES key), codegen'd. */
case class WeightedReservoirValues(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"weighted_sample_values expects a binary sketch, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(sketch: Any): Any =
    new GenericArrayData(
      WeightedReservoirUtil.valuesOf(sketch.asInstanceOf[Array[Byte]])
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"(Object[]) graft.functions.WeightedReservoirUtil.valuesOf($s))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Reservoir {
  /** Sample up to k distinct values of e per group (cast to string).
    * NULLs are skipped — NULL is not a value. */
  def sample(e: Column, k: Int): Column =
    ColumnBridge.column(ReservoirAgg(
      Cast(ColumnBridge.expression(e), StringType), k).toAggregateExpression())

  /** Union pre-built samples (same k) — the rollup path. */
  def merge(sketch: Column): Column =
    ColumnBridge.column(ReservoirMergeAgg(ColumnBridge.expression(sketch))
      .toAggregateExpression())

  /** The sampled values as array<string>, deterministic hash order. */
  def values(sketch: Column): Column =
    ColumnBridge.column(ReservoirValues(ColumnBridge.expression(sketch)))

  /** Weighted (A-ES) sample of up to k distinct values per group:
    * inclusion probability ∝ weight, value cast to string, weight to
    * double. Rows with NULL value or weight are skipped; non-positive
    * weights fail loudly (silent skipping would bias invisibly). */
  def weighted(e: Column, w: Column, k: Int): Column =
    ColumnBridge.column(WeightedReservoirAgg(
      Cast(ColumnBridge.expression(e), StringType),
      Cast(ColumnBridge.expression(w), DoubleType), k).toAggregateExpression())

  /** Union pre-built weighted samples (same k) — the rollup path. */
  def weightedMerge(sketch: Column): Column =
    ColumnBridge.column(WeightedReservoirMergeAgg(ColumnBridge.expression(sketch))
      .toAggregateExpression())

  /** Weighted-sample values, best-first (descending A-ES key). */
  def weightedValues(sketch: Column): Column =
    ColumnBridge.column(WeightedReservoirValues(ColumnBridge.expression(sketch)))
}
