package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph signals for web-scale curation: PageRank is the standard
  * domain/page authority input to crawl-corpus quality filtering (rank the
  * link graph, keep documents from reputable hosts), alongside the lexical
  * signals in [[Curation]] and [[Web]].
  *
  * Arithmetic convention (same as RRF's nano-units and the LM's micronats):
  * ranks live in integer MICRO-units (1.0 == 1,000,000) and every step is
  * integer multiply / integer divide — contributions `rank div outdeg`,
  * damping `(17 * sum) div 20` (0.85 exactly). Long sums are
  * order-independent, so the whole fixed-point iteration replays
  * bit-for-bit in any engine (the `ns_pagerank` oracle unrolls it in SQL).
  * The rounding the integer divisions introduce is well under the
  * micro-unit resolution anyone thresholds at.
  *
  * Scale shape:
  *   - edges are enriched with out-degree ONCE before the loop; each
  *     iteration is then one join (ranks ⋈ edges on src — both sides
  *     hash-partition on the same key, so consecutive iterations reuse the
  *     partitioning) plus one partial-aggregated sum keyed by dst.
  *   - per-iteration state is one (node, rank) row per node — never
  *     edge-sized; ranks checkpoint (persist + materialize, dropping the
  *     previous checkpoint) every `persistEvery` rounds and at the end,
  *     so lineage stays bounded while paying one materialization job per
  *     `persistEvery` rounds instead of per round.
  *   - dangling nodes (no out-edges) leak their damped mass — the classic
  *     "leaky" simplification; the leak is deterministic so cross-engine
  *     equality still holds. Use the redistribute variant only if absolute
  *     probability mass matters, not ranking order.
  *
  * No counterpart in the reference engine; north-star operator.
  */
object Graph {

  /** Integer-exact PageRank over `edges` (one row per directed edge).
    * Returns (node, pr) in micro-units for every node appearing as a src
    * or dst. Parallel edges count as parallel (pre-`distinct` them if not
    * wanted). `iters` fixed-point rounds, damping 0.85, start mass 1.0.
    *
    * `redistributeDangling = true` closes the dangling-mass leak: each
    * round the summed rank of no-out-edge nodes is spread uniformly
    * (integer `div` — the sub-micro-unit remainder, < one micro-unit per
    * node, still leaks deterministically). The share rides along as a
    * broadcast one-row aggregate, so the loop stays action-free and
    * `persistEvery` batching is preserved; cost is one extra edge-free
    * aggregation per round. Leave it off when only ranking order matters.
    *
    * The returned frame is PERSISTED (it is the loop's final checkpoint —
    * unpersisting it here would force a full recompute on first use). The
    * caller owns `result.unpersist()` once consumed; repeated calls that
    * never unpersist accumulate node-sized cache entries until LRU
    * eviction.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, persistEvery: Int = 4,
      redistributeDangling: Boolean = false): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(persistEvery > 0, "persistEvery must be positive")
    // persist the raw edge frame first: out-degree, enrichment, and the
    // node set all derive from it — without this the caller's edge
    // construction (often a join + distinct) re-executes once per derived
    // frame
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).persist()
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // enrich once: the loop never re-joins the degree table
    val eo = e.join(outDeg, "src").persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()

    // dangling = nodes with no out-edges; node count only needed for the
    // redistribution quotient (both driver-side scalars, O(1))
    lazy val danglingNodes = nodes.join(outDeg.select(col("src").as("node")),
      Seq("node"), "left_anti").persist()
    lazy val nNodes: Long = nodes.count()

    var ranks = nodes.withColumn("pr", lit(1000000L))
    var prev: DataFrame = null
    for (i <- 1 to iters) {
      val contribs = eo.join(ranks, eo("src") === ranks("node"))
        .select(col("dst").as("node"), expr("pr div outdeg").as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      // per-node share of this round's dangling mass: floor(sum / N),
      // integer-exact, carried as a broadcast 1-row frame so the loop
      // stays action-free (a driver-side collect here would force one
      // extra job per round and break persistEvery batching)
      var next =
        if (!redistributeDangling)
          nodes.join(contribs, Seq("node"), "left")
            .select(col("node"),
              (lit(150000L) + expr("(17 * coalesce(s, CAST(0 AS BIGINT))) div 20"))
                .as("pr"))
        else {
          val shareDf = ranks.join(danglingNodes, "node")
            .agg(expr(s"coalesce(sum(pr), CAST(0 AS BIGINT)) div ${nNodes}L").as("__share"))
          nodes.join(contribs, Seq("node"), "left")
            .crossJoin(broadcast(shareDf))
            .select(col("node"),
              (lit(150000L) + expr("(17 * (coalesce(s, CAST(0 AS BIGINT)) + __share)) div 20"))
                .as("pr"))
        }
      // materialize every persistEvery rounds (and at the end): each
      // materialization is a full job, so cutting them 4x cuts fixed cost
      // 4x while lineage depth stays bounded at persistEvery rounds
      // (redistribution references `ranks` twice per round — contribs and
      // the dangling sum — so lineage fan-out is 2^persistEvery between
      // checkpoints: bounded and cheap for the default 4)
      if (i % persistEvery == 0 || i == iters) {
        next = next.persist()
        next.count() // materialize before dropping the previous checkpoint
        if (prev != null) prev.unpersist()
        prev = next
      }
      ranks = next
    }
    // for iters >= 1 the final round always checkpoints (i == iters arm),
    // so the result is materialized and the helper caches can drop; for
    // iters == 0 the returned start frame recomputes through the caller's
    // edge construction on use — trivially cheap, it is a constant column
    // over the node set. eo is edge-sized and must not outlive the call.
    e.unpersist()
    eo.unpersist()
    nodes.unpersist()
    if (redistributeDangling) danglingNodes.unpersist()
    ranks
  }

  /** Integer-exact HITS (Kleinberg hubs & authorities) over directed
    * edges: `iters` rounds of a(v) = Σ h(in-neighbors), h(u) = Σ a(out-
    * neighbors), each half-step max-normalized to micro-units (top score
    * = 1,000,000; L2 normalization would need a square root — max-norm
    * preserves the ranking and stays in integer arithmetic, so the
    * `ns_hits` oracle unrolls the rounds bit-for-bit, scalar-subquerying
    * the per-round maxima exactly like the dangling-mass shares of
    * [[pageRank]]'s redistribute mode). Returns (node, hub, auth),
    * zero-filled over the full node set.
    *
    * Complements PageRank for link-based curation: PageRank finds
    * endorsed domains; the hub score finds directory/aggregator domains
    * whose outlinks are worth crawling, the auth score content domains
    * worth keeping.
    *
    * Scale shape mirrors [[pageRank]]: per-round state is node-sized,
    * each half-step is one same-key join + partial-aggregated sum, the
    * round maxima ride as broadcast one-row frames (action-free loop),
    * and rounds checkpoint every `persistEvery` iterations. Integer
    * headroom: raw sums are ≤ max-degree × 10⁶ and the normalize
    * multiplies by 10⁶ again, so degrees up to ~9×10⁶ fit in a long —
    * pre-aggregate parallel edges (or weight them down) beyond that.
    * The returned frame is persisted (the loop's final checkpoint); the
    * caller owns `unpersist()`.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 2, persistEvery: Int = 2): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(persistEvery > 0, "persistEvery must be positive")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    def normalized(raw: DataFrame, rawCol: String, outCol: String): DataFrame = {
      val mx = raw.agg(greatest(coalesce(max(col(rawCol)), lit(1L)), lit(1L)).as("__mx"))
      nodes.join(raw, Seq("node"), "left")
        .crossJoin(broadcast(mx))
        .select(col("node"),
          expr(s"(coalesce($rawCol, CAST(0 AS BIGINT)) * 1000000) div __mx")
            .as(outCol))
    }
    var hubs = nodes.withColumn("h", lit(1000000L))
    var auths: DataFrame = null
    var prevH: DataFrame = null
    var prevA: DataFrame = null
    for (i <- 1 to iters) {
      val aRaw = e.join(hubs, e("src") === hubs("node"))
        .groupBy(col("dst")).agg(sum(col("h")).as("ar"))
        .select(col("dst").as("node"), col("ar"))
      auths = normalized(aRaw, "ar", "a")
      val hRaw = e.join(auths, e("dst") === auths("node"))
        .groupBy(col("src")).agg(sum(col("a")).as("hr"))
        .select(col("src").as("node"), col("hr"))
      var nextH = normalized(hRaw, "hr", "h")
      if (i % persistEvery == 0 || i == iters) {
        nextH = nextH.persist()
        auths = auths.persist()
        nextH.count()
        auths.count()
        if (prevH != null) { prevH.unpersist(); prevA.unpersist() }
        prevH = nextH
        prevA = auths
      }
      hubs = nextH
    }
    val out = hubs.select(col("node"), col("h").as("hub"))
      .join(auths.select(col("node"), col("a").as("auth")), "node")
      .persist()
    out.count()
    e.unpersist(); nodes.unpersist()
    if (prevH != null) { prevH.unpersist(); prevA.unpersist() }
    out
  }

  /** Per-node degree profile: (node, out_deg, in_deg), zero-filled for
    * nodes that only appear on one side. Two partial-aggregated counts and
    * an outer join of node-sized frames.
    */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val outD = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg"))
    val inD = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_deg"))
    outD.join(inD, Seq("node"), "full")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }
}
