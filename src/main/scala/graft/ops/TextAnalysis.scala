package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-level text analysis for training-data pipelines: token
  * statistics, quality scoring, language identification, fingerprinting.
  * Everything is a narrow, codegen'd projection — at 100 TB these run at
  * scan speed with zero shuffle.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish subword token estimate: words + punctuation marks counted
    * separately (a cheap, deterministic proxy for tokenizer cost used to
    * budget training corpora).
    */
  def approxBpeTokenCount(text: Column): Column =
    (regexp_count(text, lit("[A-Za-z0-9]{1,4}")) +
      regexp_count(text, lit("[^A-Za-z0-9\\s]"))).cast("long")

  /** Quality metrics struct: char length, word count, mean word length,
    * stopword ratio, punctuation ratio, uppercase ratio.
    */
  def qualityMetrics(text: Column, stopwords: Seq[String]): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    // guarded count: "" splits to [""] — empty text has zero words
    val nTok = when(length(trim(text)) === 0, lit(0)).otherwise(size(toks))
    val safeTok = greatest(nTok, lit(1)) // division guard
    val stopHits = size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
    struct(
      length(text).cast("long").as("n_chars"),
      nTok.cast("long").as("n_words"),
      // strip ALL whitespace (tabs/newlines too), matching the tokenizer
      (length(regexp_replace(text, "\\s", "")).cast("double") / safeTok).as("mean_word_len"),
      (stopHits.cast("double") / safeTok).as("stopword_ratio"),
      (regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double") / greatest(length(text), lit(1))).as("punct_ratio"),
      (regexp_count(text, lit("[A-Z]")).cast("double") / greatest(length(text), lit(1))).as("upper_ratio")
    )
  }

  val DefaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as")

  /** Character/stopword n-gram language-ID heuristic: per-language score =
    * count of language-marker tokens; prediction = argmax (alphabetical
    * tie-break), "und" when nothing matches. Markers are the standard
    * high-frequency function words per language.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit"),
    "es" -> Seq("el", "la", "los", "las", "que", "es", "con"),
    "fr" -> Seq("le", "la", "les", "est", "que", "avec", "pour"),
    "zh" -> Seq("的", "是", "了", "在", "我", "不")
  )

  def langScores(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    struct(LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      size(filter(toks, t => t.isin(markers.map(lit): _*))).cast("long").as(lang)
    }: _*)
  }

  /** Predicted language: argmax of langScores, alphabetical tie-break,
    * "und" if all zero.
    */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val langs = LangMarkers.keys.toSeq.sorted
    val best = langs.map(l => scores.getField(l)).reduce((a, b) => greatest(a, b))
    val pick = langs.reverse.foldLeft(lit("und")) { (acc, l) =>
      when(scores.getField(l) === best && best > 0, lit(l)).otherwise(acc)
    }
    pick
  }

  /** Lexicon-based sentiment: (positive hits − negative hits) and their
    * normalized score over the token count. Deterministic, codegen'd,
    * replicable in SQL — the cheap corpus-curation signal (SURVEY §7.2).
    */
  val PositiveLexicon: Seq[String] =
    Seq("good", "great", "excellent", "fast", "love", "best", "happy", "win", "nice", "cool")
  val NegativeLexicon: Seq[String] =
    Seq("bad", "terrible", "slow", "hate", "worst", "sad", "fail", "poor", "wrong", "broken")

  def sentiment(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val pos = size(filter(toks, t => t.isin(PositiveLexicon.map(lit): _*)))
    val neg = size(filter(toks, t => t.isin(NegativeLexicon.map(lit): _*)))
    struct(
      pos.cast("long").as("pos_hits"),
      neg.cast("long").as("neg_hits"),
      ((pos - neg).cast("double") / greatest(size(toks), lit(1))).as("score"))
  }

  /** Winnowing fingerprints (see graft.functions.text): distinct rolling-
    * hash minima, the standard near-dup/plagiarism document signature.
    */
  def fingerprint(text: Column, k: Int = 8, w: Int = 4): Column =
    graft.functions.text.winnowFingerprint(text, k, w)

  /** Full document-profile projection over a corpus. */
  def profile(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(
      col(idCol),
      wsTokenCount(col(textCol)).as("n_tokens_ws"),
      approxBpeTokenCount(col(textCol)).as("n_tokens_bpe"),
      qualityMetrics(col(textCol), DefaultStopwords).as("quality"),
      langId(col(textCol)).as("lang_pred"),
      fingerprint(col(textCol)).as("fingerprints"))
}
