package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Static bit-twiddling shared by the aggregate, the membership test, and
  * generated code (a top-level Scala object gets Java-callable static
  * forwarders, so codegen can reference `graft.functions.BloomUtil`
  * directly). Filter wire format, also the aggregate's serialized buffer:
  * `[int nHashes][int nWords][nWords × long]`, big-endian.
  *
  * Bit addressing uses Kirsch-Mitzenmacher double hashing: from one
  * 64-bit input hash x, h1 = x and h2 = splitmix64(x) | 1, bit_i =
  * (h1 + i·h2) mod m. Oddness alone does NOT make the probe sequence a
  * full-period ring here (that needs gcd(h2, m) = 1, guaranteed only
  * when m is a power of two; m = nWords·64 can share odd factors with
  * h2) — the guarantee actually relied on is weaker and sufficient: the
  * cycle length is m/gcd(h2, m), and since m has a 2^6 factor and h2 is
  * odd, gcd ≤ nWords so the cycle is ≥ 64 ≥ k — the k probes of one key
  * never collide with each other. Two derived streams from one hash give
  * k independent-enough probes — published result, no k hash
  * evaluations per row. */
object BloomUtil {
  final val HEADER = 8 // int nHashes + int nWords

  def splitmix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def setBits(words: Array[Long], nHashes: Int, hash: Long): Unit = {
    val m = words.length.toLong * 64L
    val h2 = splitmix(hash) | 1L
    var i = 0
    var h = hash
    while (i < nHashes) {
      val bit = java.lang.Long.remainderUnsigned(h, m)
      words((bit >>> 6).toInt) |= (1L << (bit & 63L))
      i += 1
      h += h2
    }
  }

  /** Probe mirror of [[setBits]] on a live words array (no wire format)
    * — the form streaming state uses, where the filter lives as the
    * GroupState value between micro-batches. */
  def testBits(words: Array[Long], nHashes: Int, hash: Long): Boolean = {
    val m = words.length.toLong * 64L
    val h2 = splitmix(hash) | 1L
    var i = 0
    var h = hash
    while (i < nHashes) {
      val bit = java.lang.Long.remainderUnsigned(h, m)
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63L))) == 0L)
        return false
      i += 1
      h += h2
    }
    true
  }

  private def wordAt(bytes: Array[Byte], idx: Int): Long = {
    val off = HEADER + (idx << 3)
    var w = 0L
    var j = 0
    while (j < 8) { w = (w << 8) | (bytes(off + j) & 0xffL); j += 1 }
    w
  }

  /** Membership probe straight off the serialized bytes — no copy, no
    * ByteBuffer allocation; safe in a per-row codegen'd hot path. The
    * header is validated against the byte length first: the SQL surface
    * lets any binary column reach this, and a malformed input must fail
    * as a clear error, not an index/arithmetic crash deep in a task. */
  def mightContain(filter: Array[Byte], hash: Long): Boolean = {
    if (filter.length < HEADER)
      throw new IllegalArgumentException(
        s"might_contain: ${filter.length}-byte input is not a bloom filter" +
          s" (shorter than the $HEADER-byte header)")
    val nHashes = ((filter(0) & 0xff) << 24) | ((filter(1) & 0xff) << 16) |
      ((filter(2) & 0xff) << 8) | (filter(3) & 0xff)
    val nWords = ((filter(4) & 0xff) << 24) | ((filter(5) & 0xff) << 16) |
      ((filter(6) & 0xff) << 8) | (filter(7) & 0xff)
    if (nHashes < 1 || nHashes > 64 || nWords < 1 ||
        filter.length != HEADER + nWords.toLong * 8L)
      throw new IllegalArgumentException(
        s"might_contain: input is not a bloom filter (header says " +
          s"nHashes=$nHashes nWords=$nWords for ${filter.length} bytes)")
    val m = nWords.toLong * 64L
    val h2 = splitmix(hash) | 1L
    var i = 0
    var h = hash
    while (i < nHashes) {
      val bit = java.lang.Long.remainderUnsigned(h, m)
      if ((wordAt(filter, (bit >>> 6).toInt) & (1L << (bit & 63L))) == 0L)
        return false
      i += 1
      h += h2
    }
    true
  }

  def toBytes(words: Array[Long], nHashes: Int): Array[Byte] = {
    val out = new Array[Byte](HEADER + words.length * 8)
    out(0) = (nHashes >>> 24).toByte; out(1) = (nHashes >>> 16).toByte
    out(2) = (nHashes >>> 8).toByte; out(3) = nHashes.toByte
    val nw = words.length
    out(4) = (nw >>> 24).toByte; out(5) = (nw >>> 16).toByte
    out(6) = (nw >>> 8).toByte; out(7) = nw.toByte
    var i = 0
    while (i < nw) {
      val w = words(i)
      val off = HEADER + (i << 3)
      var j = 0
      while (j < 8) { out(off + j) = (w >>> (56 - 8 * j)).toByte; j += 1 }
      i += 1
    }
    out
  }

  def fromBytes(bytes: Array[Byte]): (Array[Long], Int) = {
    val nHashes = ((bytes(0) & 0xff) << 24) | ((bytes(1) & 0xff) << 16) |
      ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
    val nWords = ((bytes(4) & 0xff) << 24) | ((bytes(5) & 0xff) << 16) |
      ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
    val words = Array.tabulate(nWords)(wordAt(bytes, _))
    (words, nHashes)
  }

  /** Standard sizing: m = −n·ln p / ln²2 bits (rounded up to whole 64-bit
    * words), k = (m/n)·ln 2 probes. */
  def sizeFor(expectedItems: Long, fpp: Double): (Int, Int) = {
    require(expectedItems > 0, "bloom_filter: expectedItems must be > 0")
    require(fpp > 0.0 && fpp < 1.0, s"bloom_filter: fpp $fpp not in (0, 1)")
    val ln2 = math.log(2.0)
    // size in DOUBLE domain and bound-check before narrowing: a huge
    // n·ln(1/p) clamps at Long.MaxValue on conversion and `+ 63` would
    // then wrap negative, silently sizing the filter at one word
    val mBitsD = -expectedItems.toDouble * math.log(fpp) / (ln2 * ln2)
    val nWordsD = math.max(1.0, math.ceil(mBitsD / 64.0))
    require(nWordsD <= (1L << 27).toDouble,
      s"bloom_filter: $expectedItems items at fpp $fpp needs " +
        f"${nWordsD * 8}%.0f bytes (> 1 GiB); shard the build or raise fpp")
    val nWords = nWordsD.toLong
    val k = math.max(1, math.round((nWords * 64.0 / expectedItems) * ln2).toInt)
    (nWords.toInt, math.min(k, 64))
  }
}

/** Bloom-filter build aggregate: `bloom_filter(xxhash64(e), nWords,
  * nHashes)` folds a group's values into one `binary` membership sketch.
  *
  * The 100 TB use is semi-join reduction you can HOLD ON TO: build the
  * filter over the join keys of a filtered dimension once (k·m bits of
  * state, map-side partials, merge = bitwise OR — trivially associative
  * and commutative, so partitioning never changes the result), persist
  * the bytes, and pre-filter fact scans with [[BloomMightContain]] before
  * any shuffle — the manual form of the runtime-injected
  * `might_contain` the tuned conf already enables, for when the filter
  * must outlive one query (daily increments probing yesterday's corpus,
  * contamination lists, deny-lists). Completes the mergeable-sketch
  * family next to HLL (distincts) and Misra-Gries (frequencies):
  * membership was the missing member.
  *
  * Input must already be a 64-bit hash (the Column/SQL APIs wrap values
  * in `xxhash64` themselves) — the sketch stores NO raw values, so like
  * the MinHash digests it ships 8-byte hashes, never payloads. Nulls are
  * ignored (a null key can't join). An empty group evals to an all-zero
  * filter that rejects everything, not null — downstream `might_contain`
  * stays three-valued-logic-free. */
case class BloomFilterAgg(child: Expression, nWords: Int, nHashes: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(nWords >= 1 && nWords <= (1 << 27),
    s"bloom_filter: nWords $nWords out of range")
  require(nHashes >= 1 && nHashes <= 64,
    s"bloom_filter: nHashes $nHashes out of range")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_filter expects a 64-bit hash input (wrap the key in " +
          s"xxhash64), got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.setBits(buf, nHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = BloomUtil.toBytes(buf, nHashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomUtil.toBytes(buf, nHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomUtil.fromBytes(bytes)._1

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `might_contain(filter, xxhash64(e))`: true iff `e` MAY be in the set
  * the filter was built over — false is definitive (no false negatives),
  * true is probabilistic at the build's fpp. Codegen'd straight through
  * [[BloomUtil.mightContain]]; the filter side is normally a broadcast
  * scalar (subquery result or literal), the value side the fact column. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"might_contain expects (binary filter, 64-bit hash), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(filter: Any, hash: Any): Any =
    BloomUtil.mightContain(filter.asInstanceOf[Array[Byte]],
      hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, h) =>
      s"graft.functions.BloomUtil.mightContain($f, $h)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Bloom {
  /** Aggregate a group's keys into a Bloom filter sized for
    * `expectedItems` at false-positive rate `fpp`. Any key type: values
    * are xxhash64'd on the way in via [[HashIngest.nullSafeHash]] —
    * NULL keys are SKIPPED, not recorded as a phantom member (a NULL
    * key can't join, so a filter that "contains" NULL defeats the
    * semi-join use). */
  def bloomFilter(e: Column, expectedItems: Long, fpp: Double = 0.03): Column = {
    val (nWords, nHashes) = BloomUtil.sizeFor(expectedItems, fpp)
    ColumnBridge.column(BloomFilterAgg(
      HashIngest.nullSafeHash(ColumnBridge.expression(e)), nWords, nHashes)
      .toAggregateExpression())
  }

  /** Membership probe against a [[bloomFilter]] result. The probe value
    * is xxhash64'd the same way the build side was, so types must match
    * (xxhash64 of 1L and of "1" differ). A NULL probe answers NULL
    * (three-valued), never a phantom true. */
  def mightContain(filter: Column, e: Column): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(filter),
      HashIngest.nullSafeHash(ColumnBridge.expression(e))))
}
