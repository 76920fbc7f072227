package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Element-wise vector aggregates over `array<float|double>` columns —
  * `vector_sum` and `vector_avg`.
  *
  * The engine-native way to reduce a set of embeddings to a centroid /
  * document-average without exploding the corpus ×dim through a shuffle
  * (the posexplode + groupBy(dim) formulation) and without `dim` separate
  * aggregate expressions (a Janino compile whose size grows with dim).
  * State is one double[dim+1] (sums + count) per group; partial
  * aggregation (map-side combine) applies, so a groupBy shuffles only
  * k·(dim+1) doubles per map partition at any corpus size.
  *
  * Rows whose array is null are ignored. On ragged input the result spans
  * the LONGEST array seen (shorter arrays contribute to their prefix;
  * the count divides every dimension), which keeps the aggregate
  * associative and partition-order independent.
  */
case class VectorSumAgg(child: Expression, avg: Boolean,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private lazy val elemIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_sum/avg expects array<float|double>, got ${other.catalogString}")
    }

  // buffer layout: [s_0 .. s_{dim-1}, count]; empty marker = zero-length
  override def createAggregationBuffer(): Array[Double] = Array.empty[Double]

  override def update(buf: Array[Double], input: org.apache.spark.sql.catalyst.InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    // grow to the longest array seen (count stays at the tail) so the
    // result dimensionality is max-length regardless of row/partition
    // order — truncating to the first-seen length would make the
    // aggregate non-associative on ragged input
    val b =
      if (buf.length == 0) new Array[Double](n + 1)
      else if (n + 1 > buf.length) {
        val g = new Array[Double](n + 1)
        System.arraycopy(buf, 0, g, 0, buf.length - 1)
        g(n) = buf(buf.length - 1)
        g
      } else buf
    var i = 0
    while (i < n) {
      b(i) += (if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i))
      i += 1
    }
    b(b.length - 1) += 1.0
    b
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    if (b2.length == 0) return b1
    if (b1.length == 0) return b2
    val (big, small) = if (b1.length >= b2.length) (b1, b2) else (b2, b1)
    var i = 0
    // element-wise prefix add; counts live at each buffer's own tail
    while (i < small.length - 1) { big(i) += small(i); i += 1 }
    big(big.length - 1) += small(small.length - 1)
    big
  }

  override def eval(buf: Array[Double]): Any = {
    if (buf.length == 0) return null
    val n = buf.length - 1
    val cnt = buf(n)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = if (avg) buf(i) / cnt else buf(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object VectorAgg {
  /** Element-wise sum of the vectors in the group. */
  def vectorSum(v: Column): Column =
    ColumnBridge.column(VectorSumAgg(ColumnBridge.expression(v), avg = false)
      .toAggregateExpression())

  /** Element-wise mean of the vectors in the group. */
  def vectorAvg(v: Column): Column =
    ColumnBridge.column(VectorSumAgg(ColumnBridge.expression(v), avg = true)
      .toAggregateExpression())
}
