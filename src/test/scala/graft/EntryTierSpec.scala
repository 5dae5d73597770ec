package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural gate for the round-6 tier split of the SparkEntry contract:
  * the maps are the contract, so the split must be invisible — every tier
  * pairs each `queries` entry with a same-named `oracleSql` entry IN THE
  * SAME FILE (a mis-paired oracle edit was the likeliest way to break a
  * green 199-query board at one 5.5 kLoC file), tiers are disjoint, and
  * the aggregated maps line up 1:1.
  */
class EntryTierSpec extends AnyFunSuite {

  private val tiers: Seq[(String, Set[String], Set[String])] = Seq(
    ("Parity", EntriesParity.queries.keySet, EntriesParity.oracleSql.keySet),
    ("Analytics", EntriesAnalytics.queries.keySet, EntriesAnalytics.oracleSql.keySet),
    ("Dedup", EntriesDedup.queries.keySet, EntriesDedup.oracleSql.keySet),
    ("Graph", EntriesGraph.queries.keySet, EntriesGraph.oracleSql.keySet),
    ("Curation", EntriesCuration.queries.keySet, EntriesCuration.oracleSql.keySet),
    ("Profile", EntriesProfile.queries.keySet, EntriesProfile.oracleSql.keySet))

  // oracles composed from other oracles in SparkEntry.oracleSql, not stored
  // in a tier file (the anti-drift convention)
  private val derivedOracles =
    Set("ns_pipeline_funnel", "ns_pack_efficiency", "ns_epoch_value",
      "ns_corpus_bleu", "ns_corpus_ter", "ns_corpus_rouge_l",
      "ns_corpus_chrf", "ns_corpus_rouge_n", "ns_passk_rollup",
      "ns_corpus_self_bleu", "ns_corpus_novelty", "ns_paired_bootstrap",
      "ns_paired_bootstrap_rouge", "ns_selfcons_rollup",
      "ns_paired_bootstrap_ci", "ns_paired_bootstrap_rouge_ci",
      "ns_corpus_bleu_multiref", "ns_approx_rand", "ns_gpass_rollup")

  test("every tier pairs queries and oracles by name (derived oracles excepted)") {
    tiers.foreach { case (name, q, o) =>
      val unpaired = (q -- o) -- derivedOracles
      val orphans = o -- q
      assert(unpaired.isEmpty, s"$name queries without a same-file oracle: ${unpaired.toSeq.sorted}")
      assert(orphans.isEmpty, s"$name oracles without a query: ${orphans.toSeq.sorted}")
    }
  }

  test("tiers are disjoint and aggregate 1:1 into the contract maps") {
    val all = tiers.flatMap(_._2)
    assert(all.size == all.toSet.size, {
      val dups = all.groupBy(identity).filter(_._2.size > 1).keys
      s"query names in more than one tier: ${dups.toSeq.sorted}"
    })
    assert(SparkEntry.queries.keySet == all.toSet)
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet,
      "every query must have an oracle (including derived ones)")
    assert(SparkEntry.queries.size == 276, s"contract size moved: ${SparkEntry.queries.size}")
    derivedOracles.foreach { d =>
      assert(SparkEntry.queries.contains(d) && SparkEntry.oracleSql.contains(d))
    }
  }
}
