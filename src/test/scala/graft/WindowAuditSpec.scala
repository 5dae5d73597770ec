package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec

/** Mechanical adjudication of every unpartitioned window in the contract.
  *
  * An unpartitioned WindowExec moves ALL rows through one task — the
  * single worst scale hazard a declarative plan can hide, and the one
  * Spark itself only warns about at runtime. Some frames are legitimately
  * global because they are METADATA-SIZED by construction (bucket-offset
  * prefix sums over ≤ `buckets` rows, B-row bootstrap replicate tables,
  * ≤ 64 log₂ buckets…), and each was previously adjudicated by hand in
  * scaladoc. This spec makes the adjudication structural (the
  * [[graft.streaming.RowLocal]] exempt-registry pattern): it walks the
  * physical plan of EVERY [[SparkEntry]] contract query, collects every
  * WindowExec with an empty partitionSpec, and matches it against an
  * explicit allowlist entry carrying the boundedness reason. A new
  * operator that sneaks a global sort of a data-sized frame into the
  * contract fails here by name, before any bench or 100× run can.
  */
class WindowAuditSpec extends AnyFunSuite {
  import SparkTestBase.spark

  private val sf = "/root/testdata/sf0.001"

  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.inputPlan
    case other => other
  }

  /** signature of an unpartitioned window: orderSpec | windowExpression,
    * with `#<exprId>` stripped so patterns are stable across plans */
  private def sig(w: WindowExec): String =
    s"${w.orderSpec.mkString(",")} | ${w.windowExpression.mkString(",")}"
      .replaceAll("#\\d+L?", "")

  /** Allowlist: query name → (substring pattern on the stripped
    * signature, boundedness reason). Patterns use STRUCTURAL column
    * names (the repo's `__`-prefixed temp columns and contract output
    * names), never expression ids. Every entry names WHY the frame is
    * bounded; a window matched by no entry fails the sweep, and an
    * entry matching no window fails as stale — the list can only track
    * reality.
    */
  private val bucketOffsets =
    "bucket-offset prefix sum over the <= `buckets`-row count frame (metadata, never row data)"
  private val postLimitRank =
    "rank AFTER orderBy+limit (plans as TakeOrderedAndProject) — the window sees <= topK rows"
  private val replicateFrame =
    "B-row bootstrap replicate frame (replicates <= 200 enforced by bootstrapMeans)"
  private val allow: Map[String, Seq[(String, String)]] = Map(
    // ns_align_scores needs no entry: its bucket offsets prefix-sum on the
    // DRIVER from the collected <= refBuckets-row count frame, so no
    // unpartitioned window exists in its plan at all
    "ns_bootstrap_ci" -> Seq(
      (" | count(1) windowspecdefinition" -> replicateFrame),
      ("mean_milli ASC NULLS FIRST,replicate ASC NULLS FIRST | row_number()" ->
        replicateFrame)),
    "ns_collocations" -> Seq(
      ("lift_micro DESC NULLS LAST,tok_a ASC NULLS FIRST" -> postLimitRank)),
    "ns_crosstab" -> Seq(
      (" | sum(n) windowspecdefinition" ->
        "label-pair cell frame, bounded by the crossTab exactness budget")),
    "ns_epoch_shuffle" -> Seq(("__bk ASC NULLS FIRST | sum(__n" -> bucketOffsets)),
    "ns_filter_funnel" -> Seq(
      ("stage0 ASC NULLS FIRST | sum(_w1" ->
        "stage-count frame — one row per pipeline stage")),
    "ns_hybrid" -> Seq(
      ("rrf_micro DESC NULLS LAST" -> postLimitRank),
      ("n_terms DESC NULLS LAST,tf_total DESC NULLS LAST" -> postLimitRank),
      ("sim DESC NULLS LAST" -> postLimitRank)),
    "ns_key_profile" -> Seq(
      ("cnt DESC NULLS LAST,event_type ASC NULLS FIRST" -> postLimitRank)),
    "ns_ngram_vocab" -> Seq(
      ("cnt DESC NULLS LAST,token ASC NULLS FIRST" -> postLimitRank)),
    "ns_distribution_drift" -> Seq(
      ("bucket ASC NULLS FIRST | sum(n_a)" ->
        "CDF prefix sums (both sides, one fused WindowExec) over the densified bucket spine — exactly `buckets` (<= 1e4) rows"),
      (" | sum(n_a) windowspecdefinition" ->
        "side totals over the buckets spine — metadata-sized"),
      (" | max(__x)" ->
        "KS max / EMD sum over the buckets spine — metadata-sized")),
    "ns_shard_manifest" -> Seq(
      (" | sum(bytes) windowspecdefinition" ->
        "manifest frame — one row per shard, <= `shards` rows by the groupBy key")),
    "ns_snm_join" -> Seq(("__bk ASC NULLS FIRST | sum(__n" -> bucketOffsets)),
    "ns_token_drift" -> Seq(
      ("contrib DESC NULLS LAST,tok ASC NULLS FIRST" -> postLimitRank)),
    "ns_vocab" -> Seq(
      ("cnt DESC NULLS LAST,token ASC NULLS FIRST" -> postLimitRank)),
    "ns_vocab_coverage" -> Seq(("__bk ASC NULLS FIRST | sum(__n" -> bucketOffsets)),
    "ns_waterfill" -> Seq(
      (" | sum(__w) windowspecdefinition" ->
        "strata-sized plan frame — one row per stratum"),
      ("__rk ASC NULLS FIRST,lang ASC NULLS FIRST | sum(__avail" ->
        "strata-sized plan frame — one row per stratum")),
    "ns_zipf" -> Seq(
      ("bucket ASC NULLS FIRST | lag(n_terms" ->
        "frequency-doubling bucket frame — <= 64 log2 buckets by construction"),
      (" | sum(n_tokens) windowspecdefinition" ->
        "frequency-doubling bucket frame — <= 64 log2 buckets by construction")))

  test("every unpartitioned contract-query window is allowlisted with a boundedness reason") {
    val offenders = scala.collection.mutable.ListBuffer[String]()
    val used = scala.collection.mutable.Set[(String, String)]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, mk) =>
      val root = unwrap(mk(spark, sf).queryExecution.executedPlan)
      root.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
        .foreach { w =>
          val s = sig(w)
          allow.getOrElse(name, Seq.empty)
            .find { case (p, _) => s.contains(p) } match {
            case Some((p, _)) => used += ((name, p))
            case None => offenders += s"$name: $s"
          }
        }
    }
    assert(offenders.isEmpty,
      s"unpartitioned windows with no allowlist reason (add one or bucket the frame):\n  ${offenders.mkString("\n  ")}")
    val unused = allow.toSeq.flatMap { case (q, ps) => ps.map(p => (q, p._1)) }
      .filterNot(used)
    assert(unused.isEmpty,
      s"stale allowlist entries (no contract query produces them — remove):\n  ${unused.mkString("\n  ")}")
  }
}
