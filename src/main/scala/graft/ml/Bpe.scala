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
    * would memorize one word type, not learn a unit. */
  private[graft] def learnMerges(wordCounts: Array[(String, Long)],
                                 numMerges: Int): Array[(String, String)] = {
    var seqs: Array[(Array[String], Long)] = wordCounts.map { case (w, n) =>
      val chars = w.toCharArray.map(_.toString)
      if (chars.nonEmpty) chars(chars.length - 1) += WordEnd
      (chars, n)
    }.filter(_._1.nonEmpty)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    while (step < numMerges) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      val best = pairCounts.filter(_._2 >= 2).toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best match {
        case None => step = numMerges // converged: nothing repeats
        case Some((pair, _)) =>
          merges += pair
          seqs = seqs.map { case (syms, n) =>
            (mergePair(syms, pair._1, pair._2), n)
          }
          step += 1
      }
    }
    merges.toArray
  }

  private def mergePair(syms: Array[String], a: String, b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
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
