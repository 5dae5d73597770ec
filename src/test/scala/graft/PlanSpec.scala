package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Physical-plan quality gates: the properties that make these operators
  * survive a 100 TB scale-up. These assert on the *executed plan*, not
  * results — regressions here are silent performance cliffs.
  */
class PlanSpec extends AnyFunSuite {
  import SparkTestBase.spark

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter + projection push down to the parquet scan") {
    val li = SparkEntry.t(spark, sf, "lineitem")
    val q = li.filter(col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    val plan = planOf(q)
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"),
      s"filter must reach the scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"scan must prune to the 2 projected columns:\n$plan")
  }

  test("compiled spec pipelines are shuffle-free narrow plans") {
    // B1 blacklist + extraction: filter + project only — no Exchange means
    // the whole transform pipelines in one stage and scales linearly.
    val q = SparkEntry.queries("b1_blacklist")(spark, sf)
    val plan = planOf(q)
    assert(!plan.contains("Exchange"), s"spec pipeline must not shuffle:\n$plan")
  }

  test("spec pipelines fuse filter+extraction into ONE JSON parse per row") {
    // predicate + extraction run inside a single Generate node (flatMap);
    // a separate EventPredExpr filter stage — or Catalyst re-inlining a
    // nullable projection into a pushed-down filter — would parse every
    // event twice
    val plan = planOf(SparkEntry.queries("b1_blacklist")(spark, sf)).toLowerCase
    assert("extractfieldsgen".r.findAllIn(plan).size == 1,
      s"exactly one fused generator expected:\n${plan.take(2000)}")
    assert(!plan.contains("eventpredexpr") && !plan.contains("extractfieldsexpr"),
      s"no second parse stage may appear:\n${plan.take(2000)}")
  }

  test("small dimension joins broadcast (q5)") {
    val plan = planOf(SparkEntry.queries("q5_nation_rollup")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"nation/region must broadcast:\n$plan")
  }

  test("q1 aggregation has a partial (map-side) aggregate before the shuffle") {
    val plan = planOf(SparkEntry.queries("q1_agg")(spark, sf))
    // two HashAggregate nodes around one Exchange = partial + final
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"partial agg expected:\n$plan")
  }

  test("minhash LSH computes the signature once (single project, no nested re-eval)") {
    val docs = SparkEntry.t(spark, sf, "documents")
    val q = graft.ops.Dedup.minhashCandidates(docs, "text", "doc_id")
    val plan = planOf(q)
    // the single-pass expression appears in the plan; the legacy nested-HOF
    // shape (transform(... transform(...))) must not
    assert(plan.contains("minhashexpr") || plan.toLowerCase.contains("minhash"),
      s"MinHashExpr expected in plan:\n${plan.take(2000)}")
  }

  test("lshTopK dedup exchange carries ids+sim only, never the embedding arrays") {
    val e = SparkEntry.t(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val plan = planOf(graft.ops.Similarity.lshTopK(e.filter(col("id") < 10), e, k = 3))
    // the (query_id, neighbor_id) dedup plans as an aggregate whose only
    // buffered value is the scalar sim — vectors must not ride the exchange
    assert(plan.contains("Exchange hashpartitioning(query_id"), s"dedup exchange expected:\n${plan.take(2000)}")
    assert(plan.contains("first(sim"), s"sim must be computed before the dedup:\n${plan.take(2000)}")
    assert(!plan.contains("first(qv") && !plan.contains("first(cv"),
      s"embedding arrays must not enter the dedup exchange:\n${plan.take(3000)}")
  }

  test("IVF refinement sample is a narrow filter (no single-partition GlobalLimit funnel)") {
    val e = SparkEntry.t(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
    val plan = planOf(graft.ops.Similarity.refinementSample(e, maxRefineVectors = 10, seed = 7))
    assert(!plan.contains("GlobalLimit") && !plan.contains("Sort "),
      s"sampling must be per-row hash thresholding:\n$plan")
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("exact dedup groups on the digest, not the document bytes") {
    val docs = SparkEntry.t(spark, sf, "documents")
    val plan = planOf(graft.ops.Dedup.exact(docs, "text", "doc_id"))
    // shuffle key must be the md5 digest column, keeping shuffle rows small
    assert(plan.contains("md5"), plan.take(1500))
    assert(plan.contains("Exchange hashpartitioning(__digest"), s"shuffle on digest expected:\n${plan.take(2000)}")
  }
}
