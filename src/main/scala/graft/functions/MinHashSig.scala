package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge

/** MinHash signature over a pre-hashed shingle set (`array<bigint>`,
  * e.g. [[ShingleHashSet]] output): for each of `numHashes` seeded mixers,
  * the minimum mixed value across the set.
  *
  * One fused loop (numHashes × |set| mixes, no allocation) replacing the
  * interpreted nested-HOF formulation
  * `transform(sequence(...), seed -> array_min(transform(sh, xxhash64)))`,
  * which re-walks the shingle array once per hash function through the
  * expression interpreter. Map-side only; the signature is the standard
  * LSH banding input.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1, "numHashes must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects array<bigint>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = a.getLong(i)
      var s = 0
      while (s < numHashes) {
        val m = MinHashSig.mix(h, s)
        if (m < sig(s)) sig(s) = m
        s += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val h = ctx.freshName("h"); val z = ctx.freshName("z")
      s"""
         |int $n = $a.numElements();
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $s = 0; $s < $numHashes; $s++) {
         |    long $z = $h ^ ($s * 0x9e3779b97f4a7c15L + 0x9e3779b97f4a7c15L);
         |    $z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
         |    $z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
         |    $z = $z ^ ($z >>> 31);
         |    if ($z < $sig[$s]) $sig[$s] = $z;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  /** splitmix64 of (h ^ seeded-offset) — interpreted twin of the codegen. */
  private[functions] def mix(h: Long, seed: Int): Long = {
    var z = h ^ (seed * 0x9e3779b97f4a7c15L + 0x9e3779b97f4a7c15L)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def apply(shingleHashes: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingleHashes), numHashes))
}
