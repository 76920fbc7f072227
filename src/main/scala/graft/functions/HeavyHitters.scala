package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Misra-Gries heavy-hitters sketch: `heavy_hitters(e, k)` returns up to
  * `k` (item, est_count) candidates containing EVERY item whose true
  * frequency exceeds n/(k+1), with
  * `true_count − n/(k+1) <= est_count <= true_count`.
  *
  * The scale story: an exact per-item count of a hot-key column (top
  * domains, top tokens, top user agents over 100 TB) is a full
  * shuffle-by-item of the table; this sketch keeps k counters per group,
  * participates in map-side partial aggregation, and shuffles k rows of
  * state per partition — like [[SmallestKAgg]] but for FREQUENCY rather
  * than order, completing the sketch family next to HLL distincts
  * (q_approx_sketch). Summaries merge associatively (Agarwal et al.,
  * "Mergeable Summaries"): counts add, then the (k+1)-th largest count is
  * subtracted from every survivor — the same error bound telescopes, so
  * partial aggregation does not weaken the guarantee.
  *
  * When the group has at most k distinct items the decrement path never
  * fires and the counts are EXACT — the sketch degrades gracefully to a
  * plain count map.
  */
case class HeavyHittersAgg(child: Expression, k: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[Any, Long]] {

  require(k >= 1, "heavy_hitters requires k >= 1")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", child.dataType),
                   StructField("est_count", LongType))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters: ${child.dataType.catalogString} is not orderable")

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  private def copyValue(v: Any): Any = v match {
    case r: InternalRow => r.copy()
    case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
    case u: org.apache.spark.unsafe.types.UTF8String => u.copy()
    case other => other
  }

  override def createAggregationBuffer(): java.util.HashMap[Any, Long] =
    new java.util.HashMap[Any, Long](k * 2)

  /** Add `c` occurrences of `v`; on overflow of the k counters, subtract
    * the spill amount from everyone (the Misra-Gries decrement,
    * generalized to weighted adds for the merge path). */
  private def add(buf: java.util.HashMap[Any, Long], v: Any, c: Long): Unit = {
    val cur = buf.get(v)
    if (cur != 0L || buf.containsKey(v)) { buf.put(v, cur + c); return }
    if (buf.size() < k) { buf.put(copyValue(v), c); return }
    // k counters occupied by other items: decrement all by the largest
    // amount that keeps the bound — min(c, smallest current counter)
    var minC = Long.MaxValue
    val it0 = buf.values().iterator()
    while (it0.hasNext) minC = math.min(minC, it0.next())
    val dec = math.min(c, minC)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - dec
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
    val rem = c - dec
    if (rem > 0L) add(buf, v, rem) // slots freed iff some counter hit 0
  }

  override def update(buf: java.util.HashMap[Any, Long],
                      input: InternalRow): java.util.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v, 1L)
    buf
  }

  override def merge(b1: java.util.HashMap[Any, Long],
                     b2: java.util.HashMap[Any, Long]): java.util.HashMap[Any, Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // absent key unboxes to 0; put keeps the existing key object when
      // present and adopts b2's (already-private) copy when not
      b1.put(e.getKey, b1.get(e.getKey) + e.getValue)
    }
    if (b1.size() > k) {
      // subtract the (k+1)-th largest count from everyone; survivors <= k
      val counts = new Array[Long](b1.size())
      var i = 0
      val vi = b1.values().iterator()
      while (vi.hasNext) { counts(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - (k + 1)) // (k+1)-th largest
      val ei = b1.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        val nv = e.getValue - sub
        if (nv <= 0L) ei.remove() else e.setValue(nv)
      }
    }
    b1
  }

  override def eval(buf: java.util.HashMap[Any, Long]): Any = {
    // deterministic output order: est_count desc, item asc
    val entries = new java.util.ArrayList[java.util.Map.Entry[Any, Long]](buf.entrySet())
    entries.sort(new java.util.Comparator[java.util.Map.Entry[Any, Long]] {
      override def compare(a: java.util.Map.Entry[Any, Long],
                           b: java.util.Map.Entry[Any, Long]): Int = {
        val c = java.lang.Long.compare(b.getValue, a.getValue)
        if (c != 0) c else ordering.compare(a.getKey, b.getKey)
      }
    })
    val out = new Array[Any](entries.size())
    var i = 0
    while (i < entries.size()) {
      val e = entries.get(i)
      out(i) = InternalRow(e.getKey, e.getValue)
      i += 1
    }
    new GenericArrayData(out)
  }

  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))
  @transient private lazy val row = new UnsafeRow(1)

  override def serialize(buf: java.util.HashMap[Any, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size())
    val tmp = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      tmp.update(0, e.getKey)
      val u = proj(tmp)
      out.writeInt(u.getSizeInBytes)
      out.write(u.getBytes)
      out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Any, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[Any, Long](math.max(n * 2, k * 2))
    var i = 0
    while (i < n) {
      val sz = in.readInt()
      val b = new Array[Byte](sz)
      in.readFully(b)
      row.pointTo(b, sz)
      val v = copyValue(row.get(0, child.dataType))
      buf.put(v, in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HeavyHitters {
  /** Misra-Gries heavy hitters: up to k (item, est_count) candidates per
    * group, est_count desc. Every item with true frequency > n/(k+1) is
    * present; counts are exact when the group has <= k distinct items. */
  def heavyHitters(e: Column, k: Int): Column =
    ColumnBridge.column(HeavyHittersAgg(ColumnBridge.expression(e), k)
      .toAggregateExpression())
}
