package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.compile.SpecCompiler
import graft.spec.StreamSpec

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry demonstrates one operator family from SURVEY.md §2 running as
  * a Spark-native pipeline over the shared test tables; `oracleSql` holds the
  * DuckDB-equivalent SQL for the hash-match correctness gate.
  *
  * The geist-parity queries construct a JSON event stream from the `events`
  * table (to_json over native columns) and push it through the *compiled
  * StreamSpec pipeline* (graft.compile.SpecCompiler) — i.e. they exercise
  * the real operator implementations, not ad-hoc SQL.
  */
object SparkEntry {

  /** Kept at the historic access paths (tests, notebooks): the shared
    * table loader and the frozen gate models live in [[EntrySupport]]
    * since the round-6 tier split. */
  private[graft] def t(s: SparkSession, dir: String, name: String): DataFrame =
    EntrySupport.t(s, dir, name)
  private[graft] def FrozenBpeMerges = EntrySupport.FrozenBpeMerges
  private[graft] def FrozenQualityWeightsMicro = EntrySupport.FrozenQualityWeightsMicro
  private[graft] def FrozenQualityBiasMicro = EntrySupport.FrozenQualityBiasMicro
  private[graft] def FrozenPcaComponentsMicro = EntrySupport.FrozenPcaComponentsMicro
  private[graft] def FrozenPcaMeanMicro = EntrySupport.FrozenPcaMeanMicro

  // ----------------------------------------------------------- queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("session_routing")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EntriesParity.queries ++ EntriesAnalytics.queries ++ EntriesDedup.queries ++
      EntriesGraph.queries ++ EntriesCuration.queries ++ EntriesProfile.queries

  def oracleSql: Map[String, String] = {
    val base =
      EntriesParity.oracleSql ++ EntriesAnalytics.oracleSql ++
        EntriesDedup.oracleSql ++ EntriesGraph.oracleSql ++
        EntriesCuration.oracleSql ++ EntriesProfile.oracleSql
    // the funnel oracle is the disposition oracle wrapped in the audit
    // rollup — derived, so the two can never drift apart
    base +
      ("ns_pipeline_funnel" ->
        s"""WITH disp AS (
           |${base("ns_pipeline")}
           |)
           |SELECT coalesce(dropped_at, 'kept') AS stage, split, count(*)::BIGINT AS n
           |FROM disp GROUP BY 1, 2""".stripMargin) +
      // the repetition-value audit derives from the plan oracle; the d=500
      // staged fold collapses to the exact-halving identity 1000 div 2^e
      // (p·500 div 1000 = p div 2, and nested integer halvings equal
      // division by 2^e), so the SQL needs no recursive state
      ("ns_epoch_value" ->
        s"""WITH plan AS (
           |${base("ns_epoch_plan")}
           |),
           |x AS (SELECT stratum, tokens, epochs_milli,
           |        epochs_milli % 1000 AS frac,
           |        coalesce(list_sum(list_transform(range(epochs_milli // 1000),
           |          i -> 1000 // (1 << i))), 0) AS s,
           |        1000 // (1 << (epochs_milli // 1000)) AS p
           |      FROM plan),
           |y AS (SELECT stratum, tokens, epochs_milli,
           |        CAST((tokens * (s + (frac * p) // 1000)) // 1000 AS BIGINT) AS effective_tokens,
           |        CAST((tokens * epochs_milli) // 1000 AS BIGINT) AS raw_tokens
           |      FROM x)
           |SELECT stratum, tokens, epochs_milli, effective_tokens, raw_tokens,
           |       CASE WHEN raw_tokens > 0 THEN (effective_tokens * 1000) // raw_tokens
           |            ELSE NULL END AS value_permille
           |FROM y""".stripMargin) +
      // packing QA derives from the pack layout's own recursive replay —
      // the efficiency gate and the layout gate cannot drift apart
      ("ns_pack_efficiency" ->
        s"""WITH packed AS (
           |${base("ns_pack")}
           |)
           |SELECT pack_group, bin_idx, CAST(count(*) AS BIGINT) AS n_items,
           |       CAST(sum(n_tokens) AS BIGINT) AS used_tokens,
           |       CAST(128 - sum(n_tokens) AS BIGINT) AS waste_tokens,
           |       CAST((sum(n_tokens) * 1000) // 128 AS BIGINT) AS fill_permille
           |FROM packed GROUP BY 1, 2""".stripMargin)
  }
}
