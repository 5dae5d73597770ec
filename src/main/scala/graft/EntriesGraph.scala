package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.compile.SpecCompiler
import graft.spec.StreamSpec

/** Graph & web tier: rank/BFS/community loops, graph shape metrics, domains and the link graph.
  *
  * One tier of the [[SparkEntry]] contract (round-6 split of the 5.5 kLoC
  * registration file: the `queries`/`oracleSql` MAPS are the contract, the
  * file layout is not). Every `queries` entry here must pair with an
  * `oracleSql` entry of the SAME name in the SAME file - derived oracles
  * (ns_pipeline_funnel) are composed in [[SparkEntry.oracleSql]].
  */
private[graft] object EntriesGraph {
  import EntrySupport._

  /** Symmetrize a directed pair frame into both-direction edges with ONE
    * evaluation of the (usually join-derived) input: a 2-struct explode
    * per row instead of `unionAll` of two selects — the union's two
    * branches each re-evaluate the unpersisted orders⨝lineitem join +
    * distinct when the consuming operator materializes its edge cache
    * (round-11 optimization: the guide's "don't compute things twice"
    * rule; measured as a doubled join in the edge-build job of every
    * rank/BFS gate). Row multiset is identical to the union (order
    * differs — irrelevant to the set/aggregate consumers).
    */
  private def bothDirections(pairs: DataFrame, extra: Seq[String] = Nil): DataFrame = {
    val fwd = struct(col("cn").as("src") +: col("sn").as("dst") +:
      extra.map(col): _*)
    val rev = struct(col("sn").as("src") +: col("cn").as("dst") +:
      extra.map(col): _*)
    pairs.select(explode(array(fwd, rev)).as("__e")).select(col("__e.*"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ns_url_templates" -> ((s, dir) => {
      // site-structure mining: doc ids become {n}, md5 revisions {hex},
      // so each source host collapses to two template rows
      val d = t(s, dir, "documents")
      val url = concat(lit("https://"), col("source"),
        lit(".example.com/item/"), col("doc_id"),
        when(col("doc_id") % 3 === 0, concat(lit("/rev/"), md5(col("text"))))
          .otherwise(lit("/view")))
      graft.ops.Web.urlTemplates(d.select(url.as("url")), "url")
    }),
    "ns_url_canonical" -> ((s, dir) => {
      // URL canonicalization (web-corpus dedup key): four crawl-variant
      // shapes synthesized per doc — scheme/host case, www, default vs
      // explicit ports, empty paths, tracking params, fragments — pushed
      // through Web.canonicalUrl; the oracle replays every normalization
      // step with the same regex/string ops.
      val d = t(s, dir, "documents")
      val variant = pmod(col("doc_id"), lit(4))
      val url = concat(
        when(variant === 0, lit("HTTP://WWW.")).otherwise(lit("https://")),
        col("source"), lit(".example.com"),
        when(variant === 0, lit(":80")).when(variant === 1, lit(":443"))
          .when(variant === 2, lit(":8080")).otherwise(lit("")),
        when(variant === 3, lit(""))
          .otherwise(concat(lit("/docs/"), col("doc_id"))),
        lit("?utm_source=track&z="), col("lang"), lit("&a=1"),
        when(variant === 1, lit("&fbclid=f")).otherwise(lit("")),
        lit("#frag"))
      d.select(col("doc_id"), graft.ops.Web.canonicalUrl(url).as("canon"))
    }),
    "ns_pagerank" -> ((s, dir) => {
      // link-graph authority over the customer<->supplier bipartite graph
      // (distinct trading pairs, both directions): 3 integer-exact
      // fixed-point rounds in micro-units — the oracle unrolls the same
      // arithmetic in SQL, so every rank matches bit-for-bit.
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("cn"),
          concat(lit("s"), col("l_suppkey")).as("sn")).distinct()
      val edges = bothDirections(pairs)
      graft.ops.Graph.pageRank(edges, "src", "dst", iters = 3)
    }),
    "ns_triangles" -> ((s, dir) => {
      // Exact triangles + local clustering coefficient on the co-ordered-
      // parts graph (parts sharing an order are adjacent — each order's
      // parts form a clique, so the graph is triangle-rich and overlapping
      // orders fuse cliques). Fixed order slice keeps the gate SF-invariant;
      // the oracle replays orientation, wedges, and closure in SQL.
      val l = t(s, dir, "lineitem").filter(col("l_orderkey") <= 2000)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = l.select(col("ok"), col("pk").as("pa"))
        .join(l.select(col("ok"), col("pk").as("pb")), "ok")
        .where(col("pa") < col("pb")).select("pa", "pb").distinct()
      graft.ops.Graph.triangles(edges, "pa", "pb")
    }),
    "ns_neighbor_jaccard" -> ((s, dir) => {
      // structural mirror detection on the co-ordered-parts graph: part
      // pairs whose neighborhoods overlap in >= 2 nodes, Jaccard-scored in
      // permille. Guard above the max degree, so the output is exact and
      // the oracle replays wedge counting + true-degree Jaccard verbatim.
      val l = t(s, dir, "lineitem").filter(col("l_orderkey") <= 2000)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = l.select(col("ok"), col("pk").as("pa"))
        .join(l.select(col("ok"), col("pk").as("pb")), "ok")
        .where(col("pa") < col("pb")).select("pa", "pb").distinct()
      graft.ops.Graph.neighborJaccard(edges, "pa", "pb", minCommon = 2)
    }),
    "ns_reciprocity" -> ((s, dir) => {
      // directed-graph shape gate: parity-oriented part<->supplier edges
      // give genuine partial reciprocation; one semi-join on the swapped
      // key, one aggregate row
      val l = t(s, dir, "lineitem").filter(col("l_orderkey") <= 2000)
        .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"),
          col("l_linenumber").as("ln"))
        .where(col("pk") =!= col("sk"))
      val edges = l.select(
        when(col("ln") % 2 === 0, col("pk")).otherwise(col("sk")).as("s"),
        when(col("ln") % 2 === 0, col("sk")).otherwise(col("pk")).as("d"))
      graft.ops.Graph.reciprocity(edges, "s", "d")
    }),
    "ns_assortativity" -> ((s, dir) => {
      // degree-degree correlation of the co-ordered-parts graph — one
      // correlation row with the integer-exact corr tail; co-moments ride
      // the contract as STRING (hash-stable cross-engine; see
      // ns_correlation), the operator API keeps decimals
      val l = t(s, dir, "lineitem").filter(col("l_orderkey") <= 2000)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = l.select(col("ok"), col("pk").as("pa"))
        .join(l.select(col("ok"), col("pk").as("pb")), "ok")
        .where(col("pa") < col("pb")).select("pa", "pb").distinct()
      graft.ops.Graph.degreeAssortativity(edges, "pa", "pb")
        .select(col("col_x"), col("col_y"), col("n"),
          col("sum_x").cast("string").as("sum_x"),
          col("sum_y").cast("string").as("sum_y"),
          col("sum_x2").cast("string").as("sum_x2"),
          col("sum_y2").cast("string").as("sum_y2"),
          col("sum_xy").cast("string").as("sum_xy"),
          col("corr_permille"))
    }),
    "ns_label_prop" -> ((s, dir) => {
      // 3 fixed sync LPA rounds on the co-ordered-parts graph; the oracle
      // unrolls each round's neighbor-mode with the (count, label)-max tie
      val l = t(s, dir, "lineitem").filter(col("l_orderkey") <= 2000)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = l.select(col("ok"), col("pk").as("pa"))
        .join(l.select(col("ok"), col("pk").as("pb")), "ok")
        .where(col("pa") < col("pb")).select("pa", "pb").distinct()
      graft.ops.Graph.labelPropagation(edges, "pa", "pb", rounds = 3)
    }),
    "ns_kcore" -> ((s, dir) => {
      // 3-core of the co-ordered-parts graph (peeling to fixed point, 3
      // rounds at this SF). The oracle unrolls 6 peel rounds — extra
      // rounds past the fixed point are no-ops, so it equals convergence.
      val l = t(s, dir, "lineitem").filter(col("l_orderkey") <= 2000)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = l.select(col("ok"), col("pk").as("pa"))
        .join(l.select(col("ok"), col("pk").as("pb")), "ok")
        .where(col("pa") < col("pb")).select("pa", "pb").distinct()
      graft.ops.Graph.kCore(edges, "pa", "pb", k = 3L)
    }),
    "ns_hits" -> ((s, dir) => {
      // Hubs & authorities over the DIRECTED customer→supplier trading
      // graph (customers: pure hubs; suppliers: pure authorities): 2
      // max-normalized integer rounds — the oracle unrolls all four
      // half-steps with scalar-subquery maxima.
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val edges = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst")).distinct()
      graft.ops.Graph.hits(edges, "src", "dst", iters = 2)
    }),
    "ns_pagerank_dangling" -> ((s, dir) => {
      // dangling-mass redistribution gate: customer -> supplier edges only,
      // so every supplier is dangling; each round spreads
      // floor(sum(dangling pr) / N) to every node before damping. The
      // oracle unrolls the same integer arithmetic with a per-round scalar
      // subquery for the dangling sum.
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val edges = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst")).distinct()
      graft.ops.Graph.pageRank(edges, "src", "dst", iters = 3,
        redistributeDangling = true)
    }),
    "ns_ppr" -> ((s, dir) => {
      // personalized PageRank on the bipartite trading graph, restart mass
      // pinned to a deterministic supplier whitelist (s_suppkey % 7 == 1):
      // proximity-to-trusted-seeds vs ns_pagerank's global popularity. The
      // oracle unrolls 2 integer rounds with the seed indicator joined
      // into every damping step.
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("cn"),
          concat(lit("s"), col("l_suppkey")).as("sn")).distinct()
      val edges = bothDirections(pairs)
      val seeds = t(s, dir, "supplier").where(col("s_suppkey") % 7 === 1)
        .select(concat(lit("s"), col("s_suppkey")).as("seed"))
      graft.ops.Graph.personalizedPageRank(edges, "src", "dst", seeds, "seed",
        iters = 2)
    }),
    "ns_wpagerank" -> ((s, dir) => {
      // traffic-weighted authority: edge weight = order-line count between
      // customer and supplier, mass flows (pr * w) div sumw; oracle unrolls
      // 2 integer rounds with the weighted quotient
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(concat(lit("c"), col("o_custkey")).as("cn"),
          concat(lit("s"), col("l_suppkey")).as("sn"))
        .agg(count(lit(1)).as("w"))
      val edges = bothDirections(pairs, extra = Seq("w"))
      graft.ops.Graph.weightedPageRank(edges, "src", "dst", "w", iters = 2)
    }),
    "ns_seed_attribution" -> ((s, dir) => {
      // which whitelist supplier vouches for each node: min seed over
      // shortest paths. An eighth of orders (ns_seed_distance covers the
      // quarter graph — the two BFS gates would otherwise be the bench's
      // top pair for pure per-round job overhead); oracle = recursive
      // (node, seed) expansion with min-hops-then-min-seed rollup
      val o = t(s, dir, "orders").where(col("o_orderkey") % 8 === 1)
        .select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("cn"),
          concat(lit("s"), col("l_suppkey")).as("sn")).distinct()
      val edges = bothDirections(pairs)
      val seeds = t(s, dir, "supplier").where(col("s_suppkey") % 7 === 1)
        .select(concat(lit("s"), col("s_suppkey")).as("seed"))
      graft.ops.Graph.seedAttribution(edges, "src", "dst", seeds, "seed",
        maxHops = 3)
    }),
    "ns_seed_distance" -> ((s, dir) => {
      // BFS hop distance from the ns_ppr supplier whitelist over the same
      // bipartite trading graph — the hard crawl-radius cut next to ns_ppr's
      // soft endorsement ranking. The oracle is a DuckDB recursive CTE
      // (UNION-deduped frontier expansion, min(hops) per node). The graph
      // is a deterministic quarter of orders: the 3 checkpointed rounds pay
      // one edge-scan job each, so the gate trims the oracle-imposed edge
      // count, not the operator (round-4 gate-cost convention).
      val o = t(s, dir, "orders").where(col("o_orderkey") % 4 === 1)
        .select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("cn"),
          concat(lit("s"), col("l_suppkey")).as("sn")).distinct()
      val edges = bothDirections(pairs)
      val seeds = t(s, dir, "supplier").where(col("s_suppkey") % 7 === 1)
        .select(concat(lit("s"), col("s_suppkey")).as("seed"))
      graft.ops.Graph.seedDistance(edges, "src", "dst", seeds, "seed",
        maxHops = 3)
    }),
    "ns_domains" -> ((s, dir) => {
      // web-curation URL machinery over a deterministic URL column built
      // from real corpus columns (the corpus stores no URLs — same
      // constant-input pattern as the f8 useragent gate): parse, PSL-lite
      // registrable domain (example.<lang> declared public suffixes, www
      // stripping), blocklist tagging.
      val d = t(s, dir, "documents")
      val urls = d.select(col("doc_id"),
        concat(lit("https://"),
          when(pmod(col("doc_id"), lit(7)) === 0, lit("www.")).otherwise(lit("")),
          col("source"), lit(".example."), col("lang"),
          lit("/doc/"), col("doc_id"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit("?ref="), col("lang"))).otherwise(lit(""))).as("url"))
      graft.ops.Web.domainTag(urls, "url",
        blocklist = Seq("src1.example.en", "src2.example.de", "src3.example.zh"),
        multiLabelSuffixes = Seq("example.en", "example.de", "example.es",
          "example.fr", "example.zh"))
    }),
    "ns_links" -> ((s, dir) => {
      // HTML hyperlink extraction over deterministic markup built from
      // corpus columns (the corpus stores no HTML — same constant-input
      // pattern as ns_domains): each doc embeds an absolute, a
      // protocol-relative, a conditional root-relative, and a doc-relative
      // anchor plus three non-navigational ones; the oracle replays the
      // shared AnchorTagRegex through DuckDB's RE2 and every resolution
      // rule (the regex is RE2-portable by construction).
      graft.ops.Web.extractLinks(linksGateInput(s, dir), "text", "url", "doc_id")
    }),
    "ns_link_edges" -> ((s, dir) => {
      // Domain-level link graph over the same synthesized markup:
      // extractLinks → registrable domains (example.{org,net,com} declared
      // multi-label public suffixes so per-subdomain structure survives) →
      // (src, dst) edge weights + distinct-source-doc counts. The oracle
      // replays extraction, resolution, PSL-lite domains, and the
      // two-level aggregate.
      val links = graft.ops.Web.extractLinks(linksGateInput(s, dir), "text", "url", "doc_id")
      graft.ops.Web.linkEdges(links, "url", "doc_id",
        multiLabelSuffixes = Seq("example.org", "example.net", "example.com"))
    }),
    "ns_domain_filter" -> ((s, dir) => {
      // Table-driven blocklist tier (UT1-style million-entry lists):
      // broadcast anti-join on the registrable domain over the same URL
      // synthesis as ns_domains; blocked subdomains disappear with their
      // parents.
      import s.implicits._
      val d = t(s, dir, "documents")
      val urls = d.select(col("doc_id"),
        concat(lit("https://"),
          when(pmod(col("doc_id"), lit(7)) === 0, lit("www.")).otherwise(lit("")),
          col("source"), lit(".example."), col("lang"),
          lit("/doc/"), col("doc_id")).as("url"))
      val blocklist = Seq("src1.example.en", "src2.example.de", "src3.example.zh")
        .toDF("domain")
      graft.ops.Web.domainFilterTable(urls, "url", blocklist,
        multiLabelSuffixes = Seq("example.en", "example.de", "example.es",
          "example.fr", "example.zh"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "ns_url_templates" ->
      """WITH u AS (
        |  SELECT 'https://' || source || '.example.com/item/' || CAST(doc_id AS VARCHAR) ||
        |    CASE WHEN doc_id % 3 = 0 THEN '/rev/' || md5(text) ELSE '/view' END AS url
        |  FROM documents),
        |p AS (SELECT lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS host,
        |        regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path
        |      FROM u),
        |tt AS (SELECT host, array_to_string(list_transform(string_split(path, '/'), s ->
        |        CASE WHEN regexp_matches(s, '^[0-9]+$') THEN '{n}'
        |             WHEN regexp_matches(s, '^[0-9a-f]{8,}$') THEN '{hex}'
        |             WHEN length(s) >= 16 AND regexp_matches(s, '^[A-Za-z0-9_-]+$') THEN '{id}'
        |             ELSE s END), '/') AS template
        |      FROM p)
        |SELECT host, template, CAST(count(*) AS BIGINT) AS n_urls
        |FROM tt GROUP BY 1, 2""".stripMargin,
    "ns_url_canonical" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 0 THEN 'HTTP://WWW.' ELSE 'https://' END ||
        |    source || '.example.com' ||
        |    CASE doc_id % 4 WHEN 0 THEN ':80' WHEN 1 THEN ':443' WHEN 2 THEN ':8080' ELSE '' END ||
        |    CASE WHEN doc_id % 4 = 3 THEN '' ELSE '/docs/' || CAST(doc_id AS VARCHAR) END ||
        |    '?utm_source=track&z=' || lang || '&a=1' ||
        |    CASE WHEN doc_id % 4 = 1 THEN '&fbclid=f' ELSE '' END || '#frag' AS url
        |  FROM documents),
        |p AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(nf, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(nf, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS host0,
        |    regexp_extract(nf, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path0,
        |    regexp_extract(nf, '\?([^#]*)', 1) AS q
        |  FROM (SELECT doc_id, regexp_replace(url, '#.*$', '') AS nf FROM u)),
        |n AS (
        |  SELECT doc_id, scheme,
        |    CASE WHEN scheme = 'http' THEN regexp_replace(h1, ':80$', '')
        |         WHEN scheme = 'https' THEN regexp_replace(h1, ':443$', '')
        |         ELSE h1 END AS host,
        |    CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
        |    array_to_string(list_sort(list_filter(string_split(q, '&'),
        |      pp -> pp <> '' AND NOT (
        |        list_contains(['gclid','fbclid','igshid','mc_cid','mc_eid','ref','ref_src','spm','yclid','msclkid'],
        |                      string_split(pp, '=')[1])
        |        OR starts_with(string_split(pp, '=')[1], 'utm_')))), '&') AS q2
        |  FROM (SELECT doc_id, scheme, regexp_replace(host0, '^www\.', '') AS h1, path0, q FROM p))
        |SELECT doc_id,
        |       scheme || '://' || host || path ||
        |       CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END AS canon
        |FROM n""".stripMargin,
    "ns_neighbor_jaccard" ->
      """WITH l AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem WHERE l_orderkey <= 2000),
        |e0 AS (SELECT DISTINCT a.pk AS u, b.pk AS v FROM l a JOIN l b ON a.ok = b.ok AND a.pk < b.pk),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
        |        FROM (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0) GROUP BY 1),
        |nb AS (SELECT u AS n, v AS nb FROM e0 UNION ALL SELECT v, u FROM e0),
        |pairs AS (SELECT x.nb AS node_a, y.nb AS node_b, CAST(count(*) AS BIGINT) AS common
        |          FROM nb x JOIN nb y ON x.n = y.n AND x.nb < y.nb
        |          GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT p.node_a, p.node_b, p.common, da.deg AS deg_a, db.deg AS deg_b,
        |       CAST((1000 * p.common) // (da.deg + db.deg - p.common) AS BIGINT)
        |         AS jaccard_permille
        |FROM pairs p
        |JOIN deg da ON p.node_a = da.node
        |JOIN deg db ON p.node_b = db.node""".stripMargin,
    "ns_reciprocity" ->
      """WITH l AS (SELECT l_partkey AS pk, l_suppkey AS sk, l_linenumber AS ln
        |           FROM lineitem WHERE l_orderkey <= 2000),
        |e AS (SELECT DISTINCT CASE WHEN ln % 2 = 0 THEN pk ELSE sk END AS s,
        |             CASE WHEN ln % 2 = 0 THEN sk ELSE pk END AS d
        |      FROM l WHERE pk != sk),
        |r AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
        |rec AS (SELECT CAST(count(*) AS BIGINT) AS n_reciprocated FROM e a
        |        WHERE EXISTS (SELECT 1 FROM e b WHERE b.s = a.d AND b.d = a.s))
        |SELECT n_edges, n_reciprocated,
        |       CAST((n_reciprocated * 1000) // n_edges AS BIGINT) AS reciprocity_permille
        |FROM r, rec""".stripMargin,
    "ns_assortativity" ->
      """WITH l AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem WHERE l_orderkey <= 2000),
        |e0 AS (SELECT DISTINCT a.pk AS pa, b.pk AS pb FROM l a JOIN l b ON a.ok = b.ok AND a.pk < b.pk),
        |und AS (SELECT DISTINCT least(pa, pb) AS u, greatest(pa, pb) AS v FROM e0),
        |deg AS (SELECT node, COUNT(*) AS deg
        |        FROM (SELECT u AS node FROM und UNION ALL SELECT v FROM und) GROUP BY node),
        |bo AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
        |pr AS (SELECT CAST(ds.deg AS HUGEINT) AS x, CAST(dd.deg AS HUGEINT) AS y
        |       FROM bo JOIN deg ds ON bo.u = ds.node JOIN deg dd ON bo.v = dd.node),
        |s AS (SELECT count(*) AS n, sum(x) AS sum_x, sum(y) AS sum_y,
        |             sum(x*x) AS sum_x2, sum(y*y) AS sum_y2, sum(x*y) AS sum_xy FROM pr)
        |SELECT 'deg_src' AS col_x, 'deg_dst' AS col_y, CAST(n AS BIGINT) AS n,
        |  CAST(sum_x AS VARCHAR) AS sum_x, CAST(sum_y AS VARCHAR) AS sum_y,
        |  CAST(sum_x2 AS VARCHAR) AS sum_x2, CAST(sum_y2 AS VARCHAR) AS sum_y2,
        |  CAST(sum_xy AS VARCHAR) AS sum_xy,
        |  CASE WHEN (n*sum_x2 - sum_x*sum_x) > 0 AND (n*sum_y2 - sum_y*sum_y) > 0 THEN
        |    CAST(round(1000.0 * CAST(n*sum_xy - sum_x*sum_y AS DOUBLE) /
        |      (sqrt(CAST(n*sum_x2 - sum_x*sum_x AS DOUBLE)) *
        |       sqrt(CAST(n*sum_y2 - sum_y*sum_y AS DOUBLE)))) AS BIGINT)
        |  END AS corr_permille
        |FROM s""".stripMargin,
    "ns_label_prop" -> {
      // GENERATED 3-round sync-LPA unroll; winner = max (count, label)
      val rounds = (1 to 3).map { i =>
        s"""cnt$i AS MATERIALIZED (
           |  SELECT nb.n, l.label AS nbl, count(*) AS c
           |  FROM nbrs nb JOIN lab${i - 1} l ON nb.nb = l.node GROUP BY 1, 2),
           |win$i AS MATERIALIZED (
           |  SELECT n AS node, nbl AS label FROM (
           |    SELECT n, nbl, row_number() OVER (PARTITION BY n ORDER BY c DESC, nbl DESC) AS rn
           |    FROM cnt$i) WHERE rn = 1),
           |lab$i AS MATERIALIZED (
           |  SELECT l.node, COALESCE(w.label, l.label) AS label
           |  FROM lab${i - 1} l LEFT JOIN win$i w ON l.node = w.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH l AS MATERIALIZED (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem WHERE l_orderkey <= 2000),
         |e0 AS MATERIALIZED (SELECT DISTINCT a.pk AS pa, b.pk AS pb FROM l a JOIN l b ON a.ok = b.ok AND a.pk < b.pk),
         |und AS MATERIALIZED (SELECT DISTINCT least(pa, pb) AS u, greatest(pa, pb) AS v FROM e0),
         |nbrs AS MATERIALIZED (SELECT u AS n, v AS nb FROM und UNION ALL SELECT v, u FROM und),
         |lab0 AS MATERIALIZED (SELECT node, node AS label FROM (
         |  SELECT DISTINCT u AS node FROM und UNION SELECT DISTINCT v FROM und)),
         |$rounds
         |SELECT node, label FROM lab3""".stripMargin
    },
    "ns_kcore" -> {
      // GENERATED 6-round unroll of the peel loop; rounds past the fixed
      // point are identity, so the unroll equals Spark's run-to-convergence
      // MATERIALIZED: each round reads its predecessor several times —
      // unmaterialized CTEs would re-open the parquet per reference and
      // trip the process fd limit on the 6-round unroll
      val rounds = (1 to 6).map { i =>
        s"""d$i AS MATERIALIZED (SELECT node, count(*) AS d FROM (
           |  SELECT u AS node FROM r${i - 1} UNION ALL SELECT v FROM r${i - 1}) GROUP BY node),
           |k$i AS MATERIALIZED (SELECT node FROM d$i WHERE d >= 3),
           |r$i AS MATERIALIZED (SELECT u, v FROM r${i - 1}
           |        WHERE u IN (SELECT node FROM k$i) AND v IN (SELECT node FROM k$i))""".stripMargin
      }.mkString(",\n")
      s"""WITH l AS MATERIALIZED (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem WHERE l_orderkey <= 2000),
         |e0 AS MATERIALIZED (SELECT DISTINCT a.pk AS pa, b.pk AS pb FROM l a JOIN l b ON a.ok = b.ok AND a.pk < b.pk),
         |r0 AS MATERIALIZED (SELECT least(pa, pb) AS u, greatest(pa, pb) AS v FROM e0),
         |$rounds
         |SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
         |  SELECT u AS node FROM r6 UNION ALL SELECT v FROM r6) GROUP BY node""".stripMargin
    },
    "ns_triangles" ->
      """WITH l AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem WHERE l_orderkey <= 2000),
        |e0 AS (SELECT DISTINCT a.pk AS pa, b.pk AS pb FROM l a JOIN l b ON a.ok = b.ok AND a.pk < b.pk),
        |und AS (SELECT DISTINCT least(pa, pb) AS u, greatest(pa, pb) AS v FROM e0),
        |deg AS (SELECT node, COUNT(*) AS deg
        |        FROM (SELECT u AS node FROM und UNION ALL SELECT v FROM und) GROUP BY node),
        |wd AS (SELECT u, v, du.deg AS du, dv.deg AS dv
        |       FROM und JOIN deg du ON und.u = du.node JOIN deg dv ON und.v = dv.node),
        |fwd AS (SELECT CASE WHEN du <= dv THEN u ELSE v END AS s,
        |               CASE WHEN du <= dv THEN v ELSE u END AS t,
        |               CASE WHEN du <= dv THEN dv ELSE du END AS dt FROM wd),
        |wed AS (SELECT e1.s AS ws, e1.t AS wv, e2.t AS ww
        |        FROM fwd e1 JOIN fwd e2 ON e1.s = e2.s
        |        WHERE e1.dt < e2.dt OR (e1.dt = e2.dt AND e1.t < e2.t)),
        |tri AS (SELECT ws, wv, ww FROM wed JOIN fwd ON wed.wv = fwd.s AND wed.ww = fwd.t),
        |pn AS (SELECT node, COUNT(*) AS triangles
        |       FROM (SELECT ws AS node FROM tri UNION ALL SELECT wv FROM tri
        |             UNION ALL SELECT ww FROM tri) GROUP BY node)
        |SELECT deg.node, deg.deg,
        |  COALESCE(pn.triangles, 0) AS triangles,
        |  CASE WHEN deg.deg >= 2 THEN (2000 * COALESCE(pn.triangles, 0)) // (deg.deg * (deg.deg - 1))
        |       ELSE 0 END AS lcc_permille
        |FROM deg LEFT JOIN pn ON deg.node = pn.node""".stripMargin,
    "ns_pagerank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS cn,
        |                  's' || CAST(l_suppkey AS VARCHAR) AS sn
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT cn AS src, sn AS dst FROM pairs
        |      UNION ALL SELECT sn, cn FROM pairs),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
        |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM n),
        |c1 AS (SELECT e.dst AS node, sum(r.pr // d.outdeg) AS s
        |       FROM e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src GROUP BY 1),
        |r1 AS (SELECT n.node, CAST(150000 + (17 * coalesce(c1.s, 0)) // 20 AS BIGINT) AS pr
        |       FROM n LEFT JOIN c1 ON n.node = c1.node),
        |c2 AS (SELECT e.dst AS node, sum(r.pr // d.outdeg) AS s
        |       FROM e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src GROUP BY 1),
        |r2 AS (SELECT n.node, CAST(150000 + (17 * coalesce(c2.s, 0)) // 20 AS BIGINT) AS pr
        |       FROM n LEFT JOIN c2 ON n.node = c2.node),
        |c3 AS (SELECT e.dst AS node, sum(r.pr // d.outdeg) AS s
        |       FROM e JOIN r2 r ON e.src = r.node JOIN deg d ON e.src = d.src GROUP BY 1),
        |r3 AS (SELECT n.node, CAST(150000 + (17 * coalesce(c3.s, 0)) // 20 AS BIGINT) AS pr
        |       FROM n LEFT JOIN c3 ON n.node = c3.node)
        |SELECT node, pr FROM r3""".stripMargin,
    "ns_ppr" ->
      """WITH pairs AS (
        |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS cn,
        |                  's' || CAST(l_suppkey AS VARCHAR) AS sn
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT cn AS src, sn AS dst FROM pairs
        |      UNION ALL SELECT sn, cn FROM pairs),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
        |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |sd AS (SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node
        |       FROM supplier WHERE s_suppkey % 7 = 1),
        |ns AS (SELECT n.node,
        |              CASE WHEN sd.node IS NOT NULL THEN CAST(1 AS BIGINT)
        |                   ELSE CAST(0 AS BIGINT) END AS s
        |       FROM n LEFT JOIN sd ON n.node = sd.node),
        |r0 AS (SELECT node, CAST(s * 1000000 AS BIGINT) AS pr FROM ns),
        |c1 AS (SELECT e.dst AS node, sum(r.pr // d.outdeg) AS sc
        |       FROM e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src GROUP BY 1),
        |r1 AS (SELECT ns.node,
        |              CAST(ns.s * 150000 + (17 * coalesce(c1.sc, 0)) // 20 AS BIGINT) AS pr
        |       FROM ns LEFT JOIN c1 ON ns.node = c1.node),
        |c2 AS (SELECT e.dst AS node, sum(r.pr // d.outdeg) AS sc
        |       FROM e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src GROUP BY 1),
        |r2 AS (SELECT ns.node,
        |              CAST(ns.s * 150000 + (17 * coalesce(c2.sc, 0)) // 20 AS BIGINT) AS pr
        |       FROM ns LEFT JOIN c2 ON ns.node = c2.node)
        |SELECT node, pr FROM r2""".stripMargin,
    "ns_wpagerank" ->
      """WITH pairs AS (
        |  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS cn,
        |         's' || CAST(l_suppkey AS VARCHAR) AS sn,
        |         CAST(count(*) AS BIGINT) AS w
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1, 2),
        |e AS (SELECT cn AS src, sn AS dst, w FROM pairs
        |      UNION ALL SELECT sn, cn, w FROM pairs),
        |sw AS (SELECT src, CAST(sum(w) AS BIGINT) AS sumw FROM e GROUP BY 1),
        |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM n),
        |c1 AS (SELECT e.dst AS node, CAST(sum((r.pr * e.w) // s.sumw) AS BIGINT) AS sc
        |       FROM e JOIN r0 r ON e.src = r.node JOIN sw s ON e.src = s.src GROUP BY 1),
        |r1 AS (SELECT n.node, CAST(150000 + (17 * coalesce(c1.sc, 0)) // 20 AS BIGINT) AS pr
        |       FROM n LEFT JOIN c1 ON n.node = c1.node),
        |c2 AS (SELECT e.dst AS node, CAST(sum((r.pr * e.w) // s.sumw) AS BIGINT) AS sc
        |       FROM e JOIN r1 r ON e.src = r.node JOIN sw s ON e.src = s.src GROUP BY 1),
        |r2 AS (SELECT n.node, CAST(150000 + (17 * coalesce(c2.sc, 0)) // 20 AS BIGINT) AS pr
        |       FROM n LEFT JOIN c2 ON n.node = c2.node)
        |SELECT node, pr FROM r2""".stripMargin,
    "ns_seed_attribution" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS cn,
        |                  's' || CAST(l_suppkey AS VARCHAR) AS sn
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderkey % 8 = 1),
        |e AS (SELECT cn AS src, sn AS dst FROM pairs
        |      UNION ALL SELECT sn, cn FROM pairs),
        |sd AS (SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node
        |       FROM supplier WHERE s_suppkey % 7 = 1),
        |bfs(node, seed, hops) AS (
        |  SELECT node, node, CAST(0 AS BIGINT) AS hops FROM sd
        |  UNION
        |  SELECT e.dst, b.seed, b.hops + 1 FROM bfs b JOIN e ON e.src = b.node
        |  WHERE b.hops < 3),
        |m AS (SELECT node, min(hops) AS hops FROM bfs GROUP BY 1)
        |SELECT m.node, m.hops, min(b.seed) AS seed
        |FROM m JOIN bfs b ON b.node = m.node AND b.hops = m.hops
        |GROUP BY 1, 2""".stripMargin,
    "ns_seed_distance" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS cn,
        |                  's' || CAST(l_suppkey AS VARCHAR) AS sn
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderkey % 4 = 1),
        |e AS (SELECT cn AS src, sn AS dst FROM pairs
        |      UNION ALL SELECT sn, cn FROM pairs),
        |sd AS (SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node
        |       FROM supplier WHERE s_suppkey % 7 = 1),
        |bfs(node, hops) AS (
        |  SELECT node, CAST(0 AS BIGINT) AS hops FROM sd
        |  UNION
        |  SELECT e.dst, b.hops + 1 FROM bfs b JOIN e ON e.src = b.node
        |  WHERE b.hops < 3)
        |SELECT node, min(hops) AS hops FROM bfs GROUP BY node""".stripMargin,
    "ns_hits" ->
      """WITH e AS (
        |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
        |                  's' || CAST(l_suppkey AS VARCHAR) AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS h FROM n),
        |ar1 AS (SELECT e.dst AS node, CAST(sum(h.h) AS BIGINT) AS ar
        |        FROM e JOIN h0 h ON e.src = h.node GROUP BY 1),
        |am1 AS (SELECT greatest(CAST(coalesce(max(ar), 1) AS BIGINT), 1) AS m FROM ar1),
        |a1 AS (SELECT n.node, CAST((coalesce(ar.ar, 0) * 1000000) // (SELECT m FROM am1) AS BIGINT) AS a
        |       FROM n LEFT JOIN ar1 ar ON n.node = ar.node),
        |hr1 AS (SELECT e.src AS node, CAST(sum(a.a) AS BIGINT) AS hr
        |        FROM e JOIN a1 a ON e.dst = a.node GROUP BY 1),
        |hm1 AS (SELECT greatest(CAST(coalesce(max(hr), 1) AS BIGINT), 1) AS m FROM hr1),
        |h1 AS (SELECT n.node, CAST((coalesce(hr.hr, 0) * 1000000) // (SELECT m FROM hm1) AS BIGINT) AS h
        |       FROM n LEFT JOIN hr1 hr ON n.node = hr.node),
        |ar2 AS (SELECT e.dst AS node, CAST(sum(h.h) AS BIGINT) AS ar
        |        FROM e JOIN h1 h ON e.src = h.node GROUP BY 1),
        |am2 AS (SELECT greatest(CAST(coalesce(max(ar), 1) AS BIGINT), 1) AS m FROM ar2),
        |a2 AS (SELECT n.node, CAST((coalesce(ar.ar, 0) * 1000000) // (SELECT m FROM am2) AS BIGINT) AS a
        |       FROM n LEFT JOIN ar2 ar ON n.node = ar.node),
        |hr2 AS (SELECT e.src AS node, CAST(sum(a.a) AS BIGINT) AS hr
        |        FROM e JOIN a2 a ON e.dst = a.node GROUP BY 1),
        |hm2 AS (SELECT greatest(CAST(coalesce(max(hr), 1) AS BIGINT), 1) AS m FROM hr2),
        |h2 AS (SELECT n.node, CAST((coalesce(hr.hr, 0) * 1000000) // (SELECT m FROM hm2) AS BIGINT) AS h
        |       FROM n LEFT JOIN hr2 hr ON n.node = hr.node)
        |SELECT h2.node, h2.h AS hub, a2.a AS auth
        |FROM h2 JOIN a2 USING (node)""".stripMargin,
    "ns_pagerank_dangling" ->
      """WITH e AS (
        |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
        |                  's' || CAST(l_suppkey AS VARCHAR) AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
        |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM n),
        |dang AS (SELECT node FROM n WHERE node NOT IN (SELECT src FROM deg)),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM n),
        |s1 AS (SELECT CAST(coalesce(sum(r.pr), 0) AS BIGINT) // (SELECT c FROM nn) AS sh
        |       FROM r0 r JOIN dang USING (node)),
        |c1 AS (SELECT e.dst AS node, sum(r.pr // d.outdeg) AS s
        |       FROM e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src GROUP BY 1),
        |r1 AS (SELECT n.node, CAST(150000 + (17 * (coalesce(c1.s, 0) + (SELECT sh FROM s1))) // 20 AS BIGINT) AS pr
        |       FROM n LEFT JOIN c1 ON n.node = c1.node),
        |s2 AS (SELECT CAST(coalesce(sum(r.pr), 0) AS BIGINT) // (SELECT c FROM nn) AS sh
        |       FROM r1 r JOIN dang USING (node)),
        |c2 AS (SELECT e.dst AS node, sum(r.pr // d.outdeg) AS s
        |       FROM e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src GROUP BY 1),
        |r2 AS (SELECT n.node, CAST(150000 + (17 * (coalesce(c2.s, 0) + (SELECT sh FROM s2))) // 20 AS BIGINT) AS pr
        |       FROM n LEFT JOIN c2 ON n.node = c2.node),
        |s3 AS (SELECT CAST(coalesce(sum(r.pr), 0) AS BIGINT) // (SELECT c FROM nn) AS sh
        |       FROM r2 r JOIN dang USING (node)),
        |c3 AS (SELECT e.dst AS node, sum(r.pr // d.outdeg) AS s
        |       FROM e JOIN r2 r ON e.src = r.node JOIN deg d ON e.src = d.src GROUP BY 1),
        |r3 AS (SELECT n.node, CAST(150000 + (17 * (coalesce(c3.s, 0) + (SELECT sh FROM s3))) // 20 AS BIGINT) AS pr
        |       FROM n LEFT JOIN c3 ON n.node = c3.node)
        |SELECT node, pr FROM r3""".stripMargin,
    "ns_domains" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://' || CASE WHEN doc_id % 7 = 0 THEN 'www.' ELSE '' END ||
        |    source || '.example.' || lang || '/doc/' || doc_id ||
        |    CASE WHEN doc_id % 3 = 0 THEN '?ref=' || lang ELSE '' END AS url
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, url,
        |    regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1) AS scheme,
        |    lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS host,
        |    regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path,
        |    regexp_extract(url, '\?([^#]*)', 1) AS query
        |  FROM u),
        |r AS (
        |  SELECT *,
        |    CASE WHEN len(string_split(host, '.')) >= 3
        |              AND array_to_string(string_split(host, '.')[-2:], '.')
        |                  IN ('example.en', 'example.de', 'example.es', 'example.fr', 'example.zh')
        |         THEN array_to_string(string_split(host, '.')[-3:], '.')
        |         WHEN len(string_split(host, '.')) >= 2
        |         THEN array_to_string(string_split(host, '.')[-2:], '.')
        |         ELSE host END AS reg_domain
        |  FROM p)
        |SELECT doc_id, url, scheme, host, path, query, reg_domain,
        |       reg_domain IN ('src1.example.en', 'src2.example.de', 'src3.example.zh') AS blocked
        |FROM r""".stripMargin,
    "ns_links" ->
      s"""WITH $linksGateCtes
         |SELECT doc_id, url, link_pos, href, anchor, abs_url FROM links""".stripMargin,
    "ns_link_edges" ->
      s"""WITH $linksGateCtes,
         |h AS (
         |  SELECT doc_id,
         |    lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS shost,
         |    lower(regexp_extract(abs_url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS dhost
         |  FROM links),
         |g AS (
         |  SELECT doc_id,
         |    ${regDomainSql("shost", Seq("example.org", "example.net", "example.com"))} AS src_domain,
         |    ${regDomainSql("dhost", Seq("example.org", "example.net", "example.com"))} AS dst_domain
         |  FROM h)
         |SELECT src_domain, dst_domain, count(*) AS n_links,
         |       count(DISTINCT doc_id) AS n_src_docs
         |FROM g GROUP BY 1, 2""".stripMargin,
    "ns_domain_filter" ->
      s"""WITH u AS (
         |  SELECT doc_id,
         |    'https://' || CASE WHEN doc_id % 7 = 0 THEN 'www.' ELSE '' END ||
         |    source || '.example.' || lang || '/doc/' || doc_id AS url
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, url,
         |    lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS host
         |  FROM u),
         |r AS (
         |  SELECT doc_id, url,
         |    ${regDomainSql("host", Seq("example.en", "example.de", "example.es",
                "example.fr", "example.zh"))} AS reg
         |  FROM p)
         |SELECT doc_id, url FROM r
         |WHERE reg NOT IN ('src1.example.en', 'src2.example.de', 'src3.example.zh')""".stripMargin
  )
}
