package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer learning and application (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units").
  *
  * Scale shape: BPE trains on the word-FREQUENCY table, not the raw
  * corpus — the distributed part is [[TextAnalysis.vocabulary]] (explode +
  * partial-aggregated count + heap top-K), after which the vocabulary is
  * bounded driver metadata (≤ topK rows) and the merge loop is exact local
  * arithmetic. Encoding ships the learned merge ranks in the task closure
  * and runs as a zero-shuffle scan — the same train-small/score-everywhere
  * split as IVF centroids and DSIR bucket totals.
  *
  * Determinism: pair selection breaks count ties lexicographically, so
  * the merge sequence — and therefore every encoding — is a pure function
  * of the input frequency table.
  */
object Bpe {

  /** Learn `numMerges` merges from a (word, count) table. Symbols start as
    * single characters; each round merges the (count desc, pair asc)-best
    * adjacent pair across the weighted vocabulary. Stops early when no
    * adjacent pair remains.
    */
  def learn(vocab: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    var words: Seq[(Array[String], Long)] =
      vocab.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val next = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
                next += best._1 + best._2; j += 2
              } else { next += syms(j); j += 1 }
            }
            (next.toArray, c)
          }
        }
        round += 1
      }
    }
    merges.toSeq
  }

  /** Learn merges from a corpus: distributed word counting (top
    * `vocabTopK` words — the Zipf head carries effectively all pair mass),
    * then local merge learning on the bounded table.
    */
  def learnFromCorpus(docs: DataFrame, textCol: String, numMerges: Int,
      vocabTopK: Int = 50000, minCount: Long = 1L): Seq[(String, String)] = {
    val vocab = TextAnalysis.vocabulary(docs, textCol, minCount, vocabTopK)
      .select("token", "cnt").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    learn(vocab, numMerges)
  }

  /** Encode text into BPE subword tokens (flat array, word-major order). */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    graft.functions.text.bpeEncode(text, merges)

  /** Exact subword token count under the learned merges — the real
    * tokenizer-budget number ([[TextAnalysis.approxBpeTokenCount]] is the
    * regex approximation for when no tokenizer has been trained).
    */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(encode(text, merges)).cast("long")

  /** Tokenizer fertility by group (the multilingual-fairness audit: how
    * many BYTES one subword token covers per language/source — a
    * tokenizer trained on English pays 2-4× more tokens per byte on
    * scripts it under-merges, which silently taxes those languages'
    * context budget and training compute). Zero-shuffle scan (merges
    * ride the closure) + one partial aggregate; integer output
    * (`bytes_per_token_permille = 1000·bytes div tokens`) so the audit
    * replays across engines.
    */
  def fertilityByGroup(docs: DataFrame, textCol: String, groupCol: String,
      merges: Seq[(String, String)]): DataFrame =
    docs.select(col(groupCol).as("__g"),
        tokenCount(col(textCol), merges).as("__tok"),
        octet_length(col(textCol)).cast("long").as("__bytes"))
      .groupBy("__g")
      .agg(count(lit(1)).as("n_docs"),
        sum("__tok").as("n_tokens"),
        sum("__bytes").as("n_bytes"))
      .select(col("__g").as(groupCol), col("n_docs"), col("n_tokens"), col("n_bytes"),
        call_function("div", lit(1000L) * col("n_bytes"),
          greatest(col("n_tokens"), lit(1L))).as("bytes_per_token_permille"))
}
