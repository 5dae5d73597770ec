package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword search over the corpus: BM25 ranking (Robertson & Zaragoza 2009,
  * "The Probabilistic Relevance Framework: BM25 and Beyond") computed as a
  * distributed inverted scoring pass — the retrieval half of a
  * training-data pipeline (mining documents for a topic, building eval
  * sets, spot-checking dedup clusters).
  *
  * Scale shape:
  *   - no materialized index is required: one corpus scan explodes tokens
  *     and keeps only query-term rows (the isin filter fuses into the same
  *     codegen stage as the explode, so non-matching tokens never shuffle);
  *     only (doc, term, tf) rows — bounded by |terms| per doc — reach the
  *     aggregation.
  *   - document frequencies form a ≤|terms|-row frame, broadcast back onto
  *     the postings; corpus-level scalars (N, avgdl) come from one tiny agg.
  *   - final top-k is TakeOrderedAndProject (per-partition heaps + driver
  *     merge of k rows), never a global sort.
  *
  * Determinism convention (same as [[Lm]] / [[Curation.dsirScores]]): the
  * integer posting layer (tf, df, dl) is oracle-gated (ns_bm25); the
  * ln-based score and its ranking are engine-local and gated in SearchSpec
  * by an exact driver-side replay.
  *
  * No counterpart in the reference engine; north-star operator.
  */
object Search {

  private def toks(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Query-term postings: one row per (document, matched term) with term
    * frequency and document length. `(id, term, tf, dl)`.
    */
  def termPostings(corpus: DataFrame, textCol: String, idCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    corpus
      .select(col(idCol).as("id"), toks(col(textCol)).as("toks"))
      .select(col("id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
      .filter(col("term").isin(terms.map(_.toLowerCase): _*))
      .groupBy("id", "dl", "term").agg(count(lit(1)).as("tf"))
  }

  /** BM25 top-k for a bag-of-words query. Output: `(id, n_terms, score)`
    * sorted best-first, ties broken by id.
    *
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5)) (the non-negative BM25+ form);
    * per-term contribution idf · tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)).
    */
  def bm25(corpus: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1 && k1 >= 0 && b >= 0 && b <= 1, "bad BM25 parameters")
    val stats = corpus
      .select(size(toks(col(textCol))).cast("long").as("dl"))
      .agg(count(lit(1)), avg(col("dl"))).head()
    val nDocs = stats.getLong(0)
    val avgdl = stats.getDouble(1)
    val post = termPostings(corpus, textCol, idCol, terms)
    val dfs = post.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf").cast("double") * (k1 + 1) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / avgdl))
    post.join(broadcast(dfs), "term")
      .select(col("id"), (idf * norm).as("contrib"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_terms"), sum(col("contrib")).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }
}
