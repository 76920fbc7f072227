package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer learning and encoding (Sennrich et al.
  * ACL'16 — the subword scheme every modern LM tokenizer descends from),
  * in the shape that works at corpus scale:
  *
  * FIT is word-level BPE exactly as the reference tokenizer trainers do
  * it: ONE distributed aggregation collapses the corpus to a bounded
  * (word, count) frequency table — at 100 TB the corpus is trillions of
  * tokens but the kept word-type table is top-K bounded — and the merge
  * loop then runs on the DRIVER over that table, because each BPE merge
  * step needs the global argmax over pair counts, which is inherently
  * sequential (numMerges dependent iterations); re-aggregating the
  * corpus once per merge would be numMerges full scans for data the
  * word table already summarizes. Ties on pair count break
  * lexicographically — the fit is deterministic, independent of
  * partitioning.
  *
  * ENCODE is the GPT-2-style merge-rank loop — repeatedly merge the
  * adjacent pair with the lowest learned rank — as a NATIVE expression
  * ([[graft.functions.BpeEncode]]): the model (merge ranks) travels as a
  * codegen reference object, the per-word loop allocates one small
  * buffer, and the column pipeline stays inside whole-stage codegen.
  * Words are whitespace tokens (the `wsTokens` contract, same tokenizer
  * as the LM/NB family) with a word-end marker `</w>` appended to the
  * last symbol, so "low" the word and "low" the prefix of "lower" learn
  * distinct units — the standard Sennrich formulation. */
object Bpe {

  /** Learned model: merges in application order (rank = index). */
  case class BpeModel(merges: Array[(String, String)]) {
    require(merges != null)
    def vocab: Set[String] = merges.map { case (a, b) => a + b }.toSet
  }

  val WordEnd = "</w>"

  /** One aggregation → bounded word-frequency head → driver merge loop.
    * `maxWordTypes` bounds driver state (most-frequent word types kept,
    * ties lexicographic); with natural-language Zipf the head covers
    * almost all token mass, and the cut is explicit, not silent — the
    * returned coverage fraction says how much mass the kept types carry. */
  def fit(docs: DataFrame, textCol: String, numMerges: Int,
          maxWordTypes: Int = 1 << 16): (BpeModel, Double) = {
    require(numMerges >= 0, s"bpe: numMerges must be >= 0, got $numMerges")
    require(maxWordTypes >= 1, s"bpe: maxWordTypes must be >= 1, got $maxWordTypes")
    val words = docs
      .select(explode(graft.functions.TokenNgrams(col(textCol), 1)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val totRow = words.agg(sum(col("n"))).head
      require(!totRow.isNullAt(0), "bpe: empty corpus — no words to learn from")
      val total = totRow.getLong(0)
      val head = words.orderBy(col("n").desc, col("w")).limit(maxWordTypes)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val coverage = head.map(_._2).sum.toDouble / total
      (BpeModel(learnMerges(head, numMerges)), coverage)
    } finally words.unpersist(blocking = false)
  }

  /** The sequential merge loop over the word-frequency table. Symbol
    * sequences start as characters with [[WordEnd]] glued to the last;
    * each step merges the globally most-frequent adjacent pair
    * (ties: lexicographically smallest pair) everywhere it occurs.
    * Stops early when no pair occurs twice — merging a hapax pair
    * would memorize one word type, not learn a unit.
    *
    * INCREMENTAL, the way reference trainers do it: pair counts are
    * built once and then maintained by per-word deltas — a merge step
    * touches only the words that CONTAIN the merged pair (tracked by an
    * occurrence index), subtracting each affected word's old pair
    * multiset and adding its new one. Selection is a max-heap with lazy
    * invalidation (every count change pushes a fresh entry; stale
    * entries are discarded against the live count on pop). The first
    * formulation recounted every pair and rebuilt every word per step —
    * O(numMerges × total symbols) driver time, which at a realistic
    * 32k-merge / 64k-word-type fit is ~10¹⁰ hash updates; this is
    * O(total symbols + Σ affected-word lengths + heap traffic). */
  private[graft] def learnMerges(wordCounts: Array[(String, Long)],
                                 numMerges: Int): Array[(String, String)] = {
    import scala.collection.mutable
    val seqs: Array[mutable.ArrayBuffer[String]] = wordCounts.map { case (w, _) =>
      val syms = new mutable.ArrayBuffer[String](w.length)
      w.foreach(c => syms += c.toString)
      if (syms.nonEmpty) syms(syms.length - 1) += WordEnd
      syms
    }
    val wn: Array[Long] = wordCounts.map(_._2)
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val occ = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    // heap dequeues (highest count, then lexicographically smallest pair)
    val ord = new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val ca = y._2.compareTo(x._2)
          if (ca != 0) ca else y._3.compareTo(x._3)
        }
      }
    }
    val pq = mutable.PriorityQueue.empty[(Long, String, String)](ord)
    def bump(p: (String, String), delta: Long, idx: Int): Unit = {
      val n = pairCounts.getOrElse(p, 0L) + delta
      if (n <= 0L) pairCounts.remove(p) else pairCounts(p) = n
      if (delta > 0) occ.getOrElseUpdate(p, mutable.HashSet.empty) += idx
      if (n >= 2L) pq.enqueue((n, p._1, p._2))
    }
    seqs.indices.foreach { idx =>
      val syms = seqs(idx)
      var i = 0
      while (i < syms.length - 1) {
        bump((syms(i), syms(i + 1)), wn(idx), idx); i += 1
      }
    }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    // guard against re-learning a merged pair: if a later merge could
    // RECREATE an already-merged adjacency (a,b), it would re-enter the
    // counts and could be selected again — a duplicate rule that wastes
    // a numMerges slot. Recreation needs two DISTINCT rules producing
    // the same symbol string in different word contexts, which the
    // leftmost-first merge order appears to exclude (every construction
    // we tried — "abc" via (a,bc) vs (ab,c), run-of-a splits — dies on
    // the fact that the char adjacency inside the string merges the same
    // way everywhere); the set makes the invariant structural instead of
    // resting on that argument. Skipping is exact for encode either way:
    // ranks.putIfAbsent ignores duplicates, and the rank loop re-merges
    // any recreated adjacency at the original rank.
    val done = mutable.HashSet.empty[(String, String)]
    var step = 0
    var exhausted = false
    while (step < numMerges && !exhausted) {
      // pop to the first LIVE entry (count matches the current table)
      var best: Option[(String, String)] = None
      while (best.isEmpty && pq.nonEmpty) {
        val (n, a, b) = pq.dequeue()
        if (!done((a, b)) && pairCounts.getOrElse((a, b), 0L) == n && n >= 2L)
          best = Some((a, b))
      }
      best match {
        case None => exhausted = true // nothing repeats anymore
        case Some(p) =>
          merges += p
          done += p
          val affected = occ.getOrElse(p, mutable.HashSet.empty).toArray
          affected.foreach { idx =>
            val syms = seqs(idx)
            // the occurrence index is lazily maintained — re-validate
            var has = false
            var i = 0
            while (!has && i < syms.length - 1) {
              has = syms(i) == p._1 && syms(i + 1) == p._2; i += 1
            }
            if (has) {
              // delta = new pair multiset − old pair multiset
              i = 0
              while (i < syms.length - 1) {
                bump((syms(i), syms(i + 1)), -wn(idx), idx); i += 1
              }
              mergeInPlace(syms, p._1, p._2)
              i = 0
              while (i < syms.length - 1) {
                bump((syms(i), syms(i + 1)), wn(idx), idx); i += 1
              }
            }
          }
          occ.remove(p)
          step += 1
      }
    }
    merges.toArray
  }

  private def mergeInPlace(syms: scala.collection.mutable.ArrayBuffer[String],
                           a: String, b: String): Unit = {
    var i = 0
    while (i < syms.length - 1) {
      if (syms(i) == a && syms(i + 1) == b) {
        syms(i) = a + b
        syms.remove(i + 1)
      } else i += 1
    }
  }

  /** Append `outCol` = the BPE token array of `textCol` (per word: the
    * learned-rank merge loop; unknown characters pass through as single
    * symbols — byte/char fallback, never an error). Map-side native. */
  def encode(docs: DataFrame, textCol: String, model: BpeModel,
             outCol: String = "bpe_tokens"): DataFrame =
    docs.withColumn(outCol,
      graft.functions.BpeEncode(col(textCol), model.merges.toSeq))

  /** Per-document BPE token count — the budget column a packing /
    * pricing pipeline wants without materializing the token arrays. */
  def tokenCount(docs: DataFrame, textCol: String, model: BpeModel,
                 outCol: String = "bpe_n_tokens"): DataFrame =
    docs.withColumn(outCol,
      size(graft.functions.BpeEncode(col(textCol), model.merges.toSeq)))
}
