package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composed corpus-curation pipeline: the standard pretraining flow
  * (exact dedup → language filter → quality filter → split assignment)
  * fused into one per-document *disposition* table — the provenance
  * artifact a data team audits. Stages share the individual operators'
  * signal expressions, and OpsSpec pins the composition law: pipeline
  * survivors equal the intersection of the standalone operators.
  *
  * Stage order follows the usual web-corpus pipelines (C4 / Gopher /
  * FineWeb lineage): dedup first so duplicated junk doesn't vote in
  * later statistics, language before quality so thresholds can be
  * per-language.
  *
  * Scale shape: digest, language id, and the quality conjunction are all
  * computed in the same scan stage (narrow projections over one
  * tokenization); the only data shuffles are the digest aggregation for
  * first-occurrence resolution (uniform 16-byte key) and its join back —
  * the same shape as [[Dedup.exactIndex]]. Split assignment is a pure
  * projection. One corpus pass + one digest exchange, regardless of how
  * many stages the pipeline grows.
  */
object Pipelines {

  /** Per-document disposition: `dropped_at` names the FIRST stage that
    * rejected the document (`'dedup' | 'lang' | 'quality'`, null =
    * survivor); survivors carry their deterministic train/val/test
    * `split`, dropped documents a null split.
    */
  def disposition(docs: DataFrame, textCol: String, idCol: String,
      keepLang: String = "en",
      minWords: Int = 30, minMeanWordLen: Double = 4.0,
      minStopwordHits: Int = 2,
      splitBands: Seq[(String, Int)] = Seq("train" -> 800, "val" -> 100, "test" -> 100),
      splitSeed: String = "graft-split"): DataFrame = {
    // ONE corpus scan computes every per-doc signal — digest, language
    // id, and the quality conjunction (Gopher filter with only the
    // word-count / mean-word-length / stopword rules armed; the
    // permissive bounds make the remaining conjuncts vacuously true).
    // First-occurrence resolution is a min-over-digest window on that
    // same frame: one exchange keyed by the uniform 16-byte digest, no
    // second read of the text column (a groupBy+join would re-scan the
    // corpus to rebuild digests). Digest groups are dup clusters — small
    // by construction, and the window buffer spills if a pathological
    // mass-duplicate appears. Adding a pipeline stage adds a projection
    // here, not a pass over the corpus.
    // NULL text digests to a per-doc sentinel so null-text rows form
    // singleton groups (they are not duplicates of each other) and fall
    // through to the language stage as 'und'
    val base = docs.select(col(idCol),
      coalesce(md5(col(textCol)), concat(lit("∅"), col(idCol).cast("string"))).as("digest"),
      TextAnalysis.langId(col(textCol)).as("lang_pred"),
      Curation.qualityKeep(Curation.curationStats(col(textCol)),
        minWords, Int.MaxValue, minMeanWordLen, Double.MaxValue,
        minStopwordHits, 0.0, 1.0, 1.0, 1.0, 1.0).as("q_keep"))
    val disp = base
      .withColumn("corpus_id", min(col(idCol)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("digest")))
      .select(col(idCol),
        when(col(idCol) =!= col("corpus_id"), "dedup")
          .when(col("lang_pred") =!= keepLang, "lang")
          .when(!col("q_keep"), "quality")
          .as("dropped_at"))
    Curation.assignSplit(disp, idCol, splitBands, splitSeed)
      .withColumn("split", when(col("dropped_at").isNull, col("split")))
      .select(col(idCol), col("dropped_at"), col("split"))
  }

  /** Stage funnel over a [[disposition]] frame: document counts per
    * (stage, split) — the audit summary a curation run is reviewed by
    * ("how much did each stage drop; how did survivors split"). A tiny
    * partial-aggregated rollup of the disposition table, so it composes
    * with a persisted disposition without recomputing the pipeline.
    */
  def funnel(disposition: DataFrame): DataFrame =
    disposition
      .groupBy(coalesce(col("dropped_at"), lit("kept")).as("stage"), col("split"))
      .agg(count(lit(1)).as("n"))
}
