package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct 64-bit hashes of the word `n`-grams of a text column —
  * the one-pass replacement for
  * `array_sort(transform(array_distinct(<HOF shingling>), xxhash64))`.
  *
  * The HOF formulation materializes every shingle STRING (slice +
  * concat_ws per window, interpreted per element) before hashing it away;
  * at sf0.1 that was ~70% of the n-gram dedup runtime. This expression
  * tokenizes the UTF-8 bytes directly (tokens = runs not containing the
  * regex-\s ASCII class, matching `split(text, "\\s+")` after trim),
  * hashes each token once (xxhash64), combines each window of n token
  * hashes with a 64-bit mixer, then sorts + dedupes in place.
  *
  * The hash values are intentionally NOT equal to the HOF formulation's —
  * only shingle-set EQUALITY is preserved (equal shingles ⇔ equal hashes,
  * modulo 2^-64 collisions), which is all downstream set-similarity math
  * (SortedIntersectCount / Jaccard) observes.
  *
  * Mirrors the reference candidate-generation semantics: fewer than n
  * tokens (including the empty text) hash as ONE shingle of all tokens.
  */
case class ShingleHashSet(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_hash_set expects string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleHashSet.compute(input.asInstanceOf[UTF8String], n)

  // static call into the compiled kernel: stays inside whole-stage
  // codegen with no per-row interpreted dispatch or boxing (r9; the
  // WinnowFingerprint pattern)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashSet.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashSet {
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashSet(ColumnBridge.expression(text), n))

  /** The one-pass shingle-hash kernel (shared by eval and codegen);
    * tokenization = exact `split("\\s+")` parity, shared with SimHash64
    * (see SplitTokens for the edge-empty-token rules). */
  def compute(input: UTF8String, n: Int): GenericArrayData = {
    val tokHash = SplitTokens.tokenHashes(input.getBytes)
    val nTok = tokHash.length
    val out: Array[Long] =
      if (nTok < n) {
        // single shingle of all tokens (empty text folds zero tokens)
        var h = 0L; var j = 0
        while (j < nTok) { h = mix(h, tokHash(j)); j += 1 }
        Array(h)
      } else {
        val sh = windowHashes(tokHash, n)
        val m = sh.length
        java.util.Arrays.sort(sh)
        // dedupe in place
        var k = 0; var r = 0
        while (r < m) {
          if (r == 0 || sh(r) != sh(r - 1)) { sh(k) = sh(r); k += 1 }
          r += 1
        }
        if (k == m) sh else java.util.Arrays.copyOf(sh, k)
      }
    new GenericArrayData(out)
  }

  /** 64-bit mix fold over token hashes (splitmix-style finalizer per
    * step); shared gram-hash scheme with [[WinnowFingerprint]]. */
  private[functions] def mix(acc: Long, h: Long): Long = {
    var z = acc ^ h
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) + 0x9e3779b97f4a7c15L
  }

  /** ORDERED gram hashes: element i is the hash of the n-gram starting at
    * token position i — the positional variant [[ShingleHashSet]]'s
    * sort+dedupe discards. Shares the tokenizer and mix fold, so equal
    * grams hash equal across both variants. Docs shorter than n tokens
    * yield an EMPTY array (no full window exists — the span-dedup
    * contract, unlike the set variant's fold-all fallback). */
  def computeSeq(input: UTF8String, n: Int): GenericArrayData = {
    val tokHash = SplitTokens.tokenHashes(input.getBytes)
    if (tokHash.length < n) new GenericArrayData(Array.emptyLongArray)
    else new GenericArrayData(windowHashes(tokHash, n))
  }

  /** The windowed mix fold BOTH kernels build on — one definition, so
    * the "equal grams hash equal across variants" invariant cannot
    * drift between the set and positional forms. */
  private def windowHashes(tokHash: Array[Long], n: Int): Array[Long] = {
    val m = tokHash.length - n + 1
    val sh = new Array[Long](m)
    var w = 0
    while (w < m) {
      var h = 0L; var j = 0
      while (j < n) { h = mix(h, tokHash(w + j)); j += 1 }
      sh(w) = h; w += 1
    }
    sh
  }
}

/** Positional gram hashes (see [[ShingleHashSet.computeSeq]]): one 64-bit
  * hash per token position, in order — the map-side input of the
  * substring-span dedup, where the window INDEX is the datum the set
  * variant throws away. Same codegen pattern as the set variant. */
case class ShingleHashSeq(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_hash_seq expects string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    ShingleHashSet.computeSeq(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashSet.computeSeq($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashSeq {
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashSeq(ColumnBridge.expression(text), n))
}
