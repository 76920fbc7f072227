package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Exact bounded-state top-k aggregate: `smallest_k(e, k)` returns the k
  * smallest values of `e` in the group, ascending, under the type's natural
  * ordering (structs compare lexicographically — encode "by n descending"
  * as `struct(-n, word)`).
  *
  * The scale story vs `row_number() OVER (PARTITION BY g ORDER BY ...)
  * <= k`: a window sorts EVERY row of every group on however many
  * partitions the group key hashes to — for a low-cardinality group key
  * (top words per language, top products per country) that is a handful of
  * partitions sorting the whole table. This aggregate keeps k rows of
  * state per group, participates in map-side partial aggregation, and
  * shuffles only k·groups rows per map partition. Exact (not sketch):
  * the k smallest of a union is contained in the union of per-partition
  * k-smallest.
  *
  * State is a size-capped sorted buffer of UnsafeRow copies (k is small by
  * design; insertion is O(k) with early exit when the candidate exceeds
  * the current max).
  */
case class SmallestKAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.ArrayList[Any]] {

  require(k >= 1, "smallest_k requires k >= 1")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"smallest_k: ${child.dataType.catalogString} is not orderable")

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  private def copyValue(v: Any): Any = v match {
    case r: InternalRow => r.copy()
    case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
    case u: org.apache.spark.unsafe.types.UTF8String => u.copy()
    case other => other
  }

  override def createAggregationBuffer(): java.util.ArrayList[Any] =
    new java.util.ArrayList[Any](k + 1)

  private def insert(buf: java.util.ArrayList[Any], v: Any): Unit = {
    if (buf.size() == k && ordering.compare(v, buf.get(k - 1)) >= 0) return
    // binary search for insertion point (first element > v)
    var lo = 0; var hi = buf.size()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ordering.compare(buf.get(mid), v) <= 0) lo = mid + 1 else hi = mid
    }
    buf.add(lo, copyValue(v))
    if (buf.size() > k) buf.remove(k)
  }

  override def update(buf: java.util.ArrayList[Any],
                      input: InternalRow): java.util.ArrayList[Any] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v)
    buf
  }

  override def merge(b1: java.util.ArrayList[Any],
                     b2: java.util.ArrayList[Any]): java.util.ArrayList[Any] = {
    val it = b2.iterator()
    while (it.hasNext) insert(b1, it.next())
    b1
  }

  override def eval(buf: java.util.ArrayList[Any]): Any =
    new GenericArrayData(buf.toArray())

  // serialize via UnsafeProjection of the element type
  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))
  @transient private lazy val row = new UnsafeRow(1)

  override def serialize(buf: java.util.ArrayList[Any]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size())
    val tmp = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    val it = buf.iterator()
    while (it.hasNext) {
      tmp.update(0, it.next())
      val u = proj(tmp)
      out.writeInt(u.getSizeInBytes)
      out.write(u.getBytes)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.ArrayList[Any] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.ArrayList[Any](math.max(n, k + 1))
    var i = 0
    while (i < n) {
      val sz = in.readInt()
      val b = new Array[Byte](sz)
      in.readFully(b)
      row.pointTo(b, sz)
      buf.add(copyValue(row.get(0, child.dataType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SmallestKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SmallestKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object SmallestK {
  /** k smallest values of `e` per group, ascending. */
  def smallestK(e: Column, k: Int): Column =
    ColumnBridge.column(SmallestKAgg(ColumnBridge.expression(e), k)
      .toAggregateExpression())
}
