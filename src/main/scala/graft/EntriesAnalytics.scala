package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.compile.SpecCompiler
import graft.spec.StreamSpec

/** Classic analytics tier: TPC-H-ish workhorses, windows, temporal joins/sessions, table governance, skew.
  *
  * One tier of the [[SparkEntry]] contract (round-6 split of the 5.5 kLoC
  * registration file: the `queries`/`oracleSql` MAPS are the contract, the
  * file layout is not). Every `queries` entry here must pair with an
  * `oracleSql` entry of the SAME name in the SAME file - derived oracles
  * (ns_pipeline_funnel) are composed in [[SparkEntry.oracleSql]].
  */
private[graft] object EntriesAnalytics {
  import EntrySupport._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ns_expectations" -> ((s, dir) =>
      // Deequ-style declarative contract check before snapshot promotion:
      // six rules (passing AND failing) in ONE corpus scan — nulls count
      // only against not_null, value rules skip them
      graft.ops.Tables.expectationReport(t(s, dir, "documents"), Seq(
        graft.ops.Expectation.NotNull("text"),
        graft.ops.Expectation.Unique("doc_id"),
        graft.ops.Expectation.Matches("lang", "^[a-z]{2}$"),
        graft.ops.Expectation.Between("n_chars", 100L, 100000L),
        graft.ops.Expectation.LengthBetween("text", 400L, 1000000L),
        graft.ops.Expectation.InSet("source", (0 to 9).map(i => s"src$i"))))),
    // ---- classic analytics over the TPC-H-ish tables (scale workhorses) ----
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("count_order"),
          avg(col("l_quantity")).as("avg_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    "q3_top_orders" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_custkey"))
        .agg(sum(col("l_quantity")).as("total_qty"), count(lit(1)).as("n_lines"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(10)
    }),
    "q5_nation_rollup" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_lines"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("r_name"), col("n_name"))
    }),
    "w2_windowed_agg" -> ((s, dir) => {
      // Event-time windowed aggregation (streaming-parity operator run in
      // batch: same code path powers the watermarked streaming form).
      val e = t(s, dir, "events")
      graft.streaming.Windows.windowedAgg(e, "ts", "event_type", "user_id", "1 hour")
    }),
    "w1_topn_per_user" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      e.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("user_id"), col("event_id"), col("rn"))
    }),
    "ns_salted_join" -> ((s, dir) => {
      // Salted skew join (Skew.saltedJoin): event_type is a 5-value key —
      // the degenerate-skew regime AQE splits can't fix (every split of a
      // hot partition re-lands the same build rows). The law "salted ==
      // plain equi-join" is the oracle: DuckDB runs the plain join, the
      // query runs the salt-and-replicate plan (saltFactor 8, row spread
      // keyed on event_id).
      val e = t(s, dir, "events")
      val skewed = e.select(col("event_type").as("etype"),
        col("event_id"), col("user_id"))
      val build = e.groupBy(col("event_type").as("etype"))
        .agg(countDistinct(col("user_id")).as("etype_users"))
      graft.ops.Skew.saltedJoin(skewed, build, "etype",
        rowKey = col("event_id"), saltFactor = 8)
    }),
    "ns_acf" -> ((s, dir) =>
      // hourly event-count autocorrelation at lags 1/2/24 — the
      // periodicity confirmation behind the seasonality cells; gaps are
      // zero-count buckets, not missing rows
      graft.ops.Temporal.acf(t(s, dir, "events"), "ts",
        bucketSeconds = 3600L, lags = Seq(1, 2, 24))),
    "ns_asof_join" -> ((s, dir) => {
      // each click attaches the user's latest at-or-before purchase —
      // DuckDB's native ASOF JOIN is the oracle; the Spark plan is the
      // union + one-exchange running-last formulation (no join node).
      // Right side deduped to unique (user, time) so the winner is
      // engine-independent.
      val e = t(s, dir, "events").select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"), col("event_type"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"), col("event_id").as("click_id"))
      val purchases = e.where(col("event_type") === "purchase")
        .groupBy("user_id", "ts_us").agg(min("event_id").as("purchase_id"))
      graft.ops.Temporal.asofJoin(clicks, purchases, Seq("user_id"), "ts_us",
        joinType = "inner")
    }),
    "ns_zorder" -> ((s, dir) => {
      // multi-dimensional layout key: 8-bit Morton interleave of
      // (l_partkey, l_suppkey) — the ordering column behind z-ordered
      // writes (compose with Tables.writeSharded); pure bit arithmetic,
      // replayed term-for-term by the oracle.
      val li = t(s, dir, "lineitem")
      li.select(col("l_orderkey"), col("l_linenumber"),
        graft.ops.Tables.zOrderValue(
          Seq(pmod(col("l_partkey"), lit(256)), pmod(col("l_suppkey"), lit(256))),
          bits = 8).as("zval"))
    }),
    "ns_retention" -> ((s, dir) => {
      // daily cohort retention over the event stream: cohort = first-seen
      // day, cells = distinct users active N days later. Window-min first
      // activity (no self-join); oracle replays with a min-join.
      val e = t(s, dir, "events").select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
      graft.ops.Temporal.cohortRetention(e, "user_id", "ts_us",
        period = 86400000000L)
    }),
    "ns_funnel" -> ((s, dir) => {
      // signup -> click -> purchase progression per user, strictly ordered,
      // greedy-earliest (optimal); one exchange, chained sort-free windows.
      // Oracle unrolls the conditional mins as one CTE per step.
      val e = t(s, dir, "events").select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      graft.ops.Temporal.funnel(e, Seq("user_id"), "ts_us", Seq(
        col("event_type") === "signup",
        col("event_type") === "click",
        col("event_type") === "purchase"))
    }),
    "ns_rolling" -> ((s, dir) => {
      // trailing 1h spend per user at every event — RANGE-frame rolling
      // sum/count over integer cents (FP-chain: value*100 then round is a
      // fixed-order double op both engines replay identically; the SUM is
      // over longs, so accumulation order cannot matter).
      val e = t(s, dir, "events").select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      graft.ops.Temporal.rolling(e, Seq("user_id"), "ts_us",
        window = 3600000000L, valueCol = "cents")
    }),
    "ns_gaps" -> ((s, dir) => {
      // downtime detection: every >6h silence per user in the event
      // stream; exactly one row per hole under any tie order
      val e = t(s, dir, "events").select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
      graft.ops.Temporal.gaps(e, Seq("user_id"), "ts_us",
        minGap = 21600000000L)
    }),
    "ns_file_stats" -> ((s, dir) => {
      // per-file manifest over the (single-file) lineitem table: counts,
      // min/max, null counts replayed by a whole-table aggregate. Multi-
      // file semantics (disjoint ranges, pruning) are gated in ScalaTest
      // where the file layout is under test control.
      graft.ops.Tables.fileStats(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_returnflag"))
        .select(regexp_extract(col("file"), "([^/]+)$", 1).as("file"),
          col("n_rows"),
          col("l_orderkey_min"), col("l_orderkey_max"), col("l_orderkey_nulls"),
          col("l_returnflag_min"), col("l_returnflag_max"),
          col("l_returnflag_nulls"))
    }),
    "ns_anomalies" -> ((s, dir) => {
      // trailing z-score screen: each spend flagged against its user's own
      // prior-24h mean/variance (integer cents, decimal-promoted squares);
      // the oracle replays the same RANGE frame + HUGEINT comparison.
      val e = t(s, dir, "events").select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      graft.ops.Temporal.anomalies(e, Seq("user_id"), "ts_us", "cents",
        windowUs = 86400000000L, kPermille = 2500L, minPoints = 5L)
    }),
    "ns_trending" -> ((s, dir) =>
      // top-3 event types per 6h tumbling window, deterministic ties
      graft.ops.Temporal.trendingTopK(
        t(s, dir, "events").select(unix_micros(col("ts")).as("ts_us"),
          col("event_type")),
        "ts_us", "event_type", windowMs = 21600000000L, k = 3)),
    "ns_seasonality" -> ((s, dir) =>
      // 168-cell traffic baseline: integer calendar arithmetic on
      // epoch-micros (dow 0 = Monday), exact distinct actors per cell
      graft.ops.Temporal.seasonality(
        t(s, dir, "events").select(unix_micros(col("ts")).as("ts_us"),
          col("user_id")),
        "ts_us", "user_id")),
    "ns_active_users" -> ((s, dir) =>
      // engagement rollup: exact distinct users + events per 6h window
      graft.ops.Temporal.activeActors(
        t(s, dir, "events").select(unix_micros(col("ts")).as("ts_us"),
          col("user_id")),
        "ts_us", "user_id", windowMs = 21600000000L)),
    "ns_transitions" -> ((s, dir) =>
      // Markov journey view: immediate-successor counts per user with
      // integer row-stochastic normalization, (time, id, type) tie order
      graft.ops.Temporal.transitions(
        t(s, dir, "events").select(col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"),
          col("event_type")),
        Seq("user_id"), "ts_us", "event_id", "event_type")),
    "ns_journey_match" -> ((s, dir) =>
      // CEP-lite gate: which users ever purchase DIRECTLY after a click
      // (funnel's anything-between cannot express adjacency). Fixed user
      // slice bounds the journey strings.
      graft.ops.Temporal.journeyMatch(
        t(s, dir, "events").filter(col("user_id") <= 300)
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
            col("event_id"), col("event_type")),
        Seq("user_id"), "ts_us", "event_id", "event_type",
        pattern = ".*click>purchase.*")),
    "ns_resample" -> ((s, dir) => {
      // Per-user 6h-grid LOCF series over integer cents: bucket winner is
      // max (ts, value) — an explicit tie rule the oracle replays with
      // row_number — and the carry is last-non-null over the user's own
      // grid. Fixed user slice keeps the grid bounded.
      val e = t(s, dir, "events").filter(col("user_id") <= 200)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          round(col("value") * 100).cast("long").as("cents"))
      graft.ops.Temporal.resample(e, Seq("user_id"), "ts_us", "cents",
        gridStep = 21600000000L)
    }),
    "ns_interval_join" -> ((s, dir) => {
      // overlapping exposure windows: 1h purchase windows x 30min click
      // windows per user — grid-cell interval join, each pair emitted from
      // exactly one cell; oracle is the plain overlap theta join.
      val e = t(s, dir, "events").select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"), col("event_type"))
      val p = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("ps"),
          (col("ts_us") + lit(3600000000L)).as("pe"),
          col("event_id").as("purchase_id"))
      val c = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("cs"),
          (col("ts_us") + lit(1800000000L)).as("ce"),
          col("event_id").as("click_id"))
      graft.ops.Temporal.intervalJoin(p, "ps", "pe", c, "cs", "ce",
        keyCols = Seq("user_id"), bucketWidth = 900000000L)
    }),
    "ns_sessionize" -> ((s, dir) => {
      // per-event session labels: 1h-gap sessions per user — the batch
      // twin of the streaming session_window (equivalence law in
      // TemporalSpec); oracle replays the boundary-sum window in SQL.
      val e = t(s, dir, "events").select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
      graft.ops.Temporal.sessionize(e, Seq("user_id"), "ts_us",
        gap = 3600000000L)
    }),
    "ns_session_stats" -> ((s, dir) => {
      // per-session rollup over the sessionize labels: bounds + size per
      // (user, session) — tie-safe aggregates on the delta-derived labels
      val e = t(s, dir, "events").select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
      graft.ops.Temporal.sessionStats(e, Seq("user_id"), "ts_us",
        gap = 3600000000L)
    }),
    "ns_range_join" -> ((s, dir) => {
      // attribution: clicks within one hour at-or-after a purchase by the
      // same user — point-in-interval via bucketized equi-join (15-min
      // cells), residual-filtered; oracle is the plain BETWEEN theta join.
      val e = t(s, dir, "events").select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"), col("event_type"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"), col("event_id").as("click_id"))
      val windows = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("w_start"),
          (col("ts_us") + lit(3600000000L)).as("w_end"),
          col("event_id").as("purchase_id"))
      graft.ops.Temporal.rangeJoin(clicks, "ts_us", windows, "w_start", "w_end",
        keyCols = Seq("user_id"), bucketWidth = 900000000L)
    }),
    "ns_stream_monitor" -> ((s, dir) =>
      // Batch-mode run of the streaming ingest-quality monitor — the SAME
      // code path the stream executes (watermark applies to streams only),
      // so the windowed counters oracle-gate here while StreamingSpec
      // covers the live micro-batch behavior. The HLL dup-rate column is
      // projected away: sketch values don't replay across engines.
      // props lengths are 8–9 chars, so keep = len >= 9 splits the corpus.
      graft.streaming.Windows.streamingCorpusMonitor(
        t(s, dir, "events"), "ts", "props", "event_type", "1 hour",
        keep = length(col("props")) >= 9)
        .drop("approx_distinct")),
    "ns_stream_drift" -> ((s, dir) =>
      // batch-mode run of the streaming drift monitor (same code path;
      // watermark applies to streams only): hourly windows of the
      // deterministic event-value derivation vs a frozen uniform
      // 10-bucket reference — per-window KS + EMD in micro
      graft.streaming.Windows.streamingDistributionDrift(
        t(s, dir, "events").select(col("ts"),
          ((col("event_id") * 37) % 1001).as("v")),
        "ts", "v", referenceShares = Seq.fill(10)(100L),
        windowDuration = "1 hour", lo = 0L, hi = 1000L)),
    "ns_stream_passk" -> ((s, dir) =>
      // batch-mode run of the streaming pass@k monitor (same code path;
      // watermark applies to streams only): hourly windows of the
      // ns_pass_at_k sample derivation — the live eval dashboard's
      // per-window estimator oracle-gates here, StreamingSpec covers
      // the micro-batch twin
      graft.streaming.Windows.streamingPassAtK(
        t(s, dir, "events").select(col("ts"),
          (col("user_id") % 50).as("problem"),
          (col("event_id") % 7 < 2).as("passed")),
        "ts", "problem", "passed", ks = Seq(1, 5), windowDuration = "1 hour")),
    "ns_stream_selfcons" -> ((s, dir) =>
      // batch-mode run of the streaming self-consistency monitor (same
      // code path; watermark applies to streams only): hourly windows of
      // the ns_self_consistency sample derivation, majority vote via the
      // wide-pivot one-aggregate shape — the live agreement-drift
      // dashboard oracle-gates here, StreamingSpec covers micro-batches
      graft.streaming.Windows.streamingSelfConsistency(
        t(s, dir, "events").select(col("ts"),
          (col("user_id") % 50).as("problem"),
          when(col("event_id") % 11 === 0, lit(null).cast("long"))
            .otherwise((col("event_id") * 3 + col("user_id")) % 5).as("answer")),
        "ts", "problem", "answer", nAnswers = 5, windowDuration = "1 hour")),
    "ns_stream_bleu" -> ((s, dir) =>
      // batch-mode run of the streaming corpus-BLEU monitor (same code
      // path; watermark applies to streams only): hourly windows of a
      // deterministic (cand, ref) pair derivation with a repeated token
      // (exercising the row-local clip) — the live generation-quality
      // dashboard; the pool+root tail is corpusBleu's own fragment
      graft.streaming.Windows.streamingCorpusBleu(
        t(s, dir, "events").select(col("ts"),
          concat_ws(" ", col("event_type"), col("event_type"), col("props"),
            (col("user_id") % 5).cast("string"),
            (col("event_id") % 3).cast("string")).as("cand"),
          concat_ws(" ", col("event_type"), col("props"),
            (col("user_id") % 5).cast("string"),
            (col("event_id") % 3).cast("string"),
            (col("event_id") % 7).cast("string")).as("ref")),
        "ts", "cand", "ref", windowDuration = "1 hour")),
    "ns_stream_rep" -> ((s, dir) =>
      // batch-mode run of the streaming rep-n monitor (same code path;
      // watermark applies to streams only): hourly windows of an
      // event-derived text with a REPEATED token (event_type twice), so
      // the pooled within-doc repetition is non-trivial
      graft.streaming.Windows.streamingSeqRep(
        t(s, dir, "events").select(col("ts"),
          concat_ws(" ", col("event_type"), col("props"), col("event_type"),
            (col("event_id") % 13).cast("string")).as("text")),
        "ts", "text", windowDuration = "1 hour", maxN = 2)),
    "ns_stream_novelty" -> ((s, dir) =>
      // batch-mode run of the streaming novelty monitor (same code path;
      // watermark applies to streams only): hourly windows of an
      // event-derived text against the documents corpus's frozen gram
      // index — the live memorization alarm; membership is a
      // stream-static left outer join, the pool is the one windowed
      // aggregate; the NoveltyIndex type makes a non-distinct static
      // side unrepresentable (the batch path's own convention)
      graft.streaming.Windows.streamingNovelty(
        t(s, dir, "events").select(col("ts"),
          concat_ws(" ", col("event_type"), col("props"),
            (col("event_id") % 13).cast("string")).as("text")),
        "ts", "text",
        graft.ops.EvalMetrics.noveltyIndex(
          t(s, dir, "documents").select(col("text")), "text", maxN = 2),
        windowDuration = "1 hour")),
    "ns_stream_paired_delta" -> ((s, dir) =>
      // batch-mode run of the streaming A/B monitor (same code path;
      // watermark applies to streams only): hourly windows of a paired
      // two-system score derivation (every 13th A score NULL —
      // abstentions drop visibly); row-local guarded delta, one
      // windowed aggregate
      graft.streaming.Windows.streamingPairedDelta(
        t(s, dir, "events").select(col("ts"),
          when(col("event_id") % 13 === 0, lit(null).cast("long"))
            .otherwise((col("event_id") * 3) % 100).as("ma"),
          ((col("event_id") * 7 + 1) % 100).as("mb")),
        "ts", "ma", "mb", windowDuration = "1 hour")),
    "ns_stream_calibration" -> ((s, dir) =>
      // Batch-mode run of the streaming calibration monitor — the SAME
      // code path the stream executes (watermark applies to streams
      // only), the ns_stream_monitor promotion pattern: the per-window
      // reliability buckets oracle-gate here while StreamingSpec covers
      // live micro-batches. Scorer/labels are the ns_calibration
      // synthetic derivation keyed on event_id, windowed hourly on ts.
      graft.streaming.Windows.streamingCalibration(
        t(s, dir, "events").select(col("ts"),
          ((col("event_id") * 37) % 1001).as("score"),
          when((col("event_id") * 37) % 1001 > 500,
            when(col("event_id") % 7 === 0, 0L).otherwise(1L))
            .otherwise(when(col("event_id") % 11 === 0, 1L).otherwise(0L))
            .as("label")),
        "ts", "score", "label", "1 hour", bucketWidth = 100L)),
    "ns_key_profile" -> ((s, dir) =>
      // Join-key skew measurement over the 5-value event_type key (the
      // same degenerate regime ns_salted_join exercises): top-3 keys with
      // integer share and hot-key multiple — the saltFactor evidence.
      graft.ops.Skew.keyProfile(
        t(s, dir, "events").select(col("event_type")), Seq("event_type"), k = 3)),
    "ns_integrity_audit" -> ((s, dir) =>
      // orphan check against a deliberately truncated dim table (TPC-H
      // fks are valid, so the gate drops customers > 1000 to synthesize
      // violations): orders whose customer vanished, with row counts
      graft.ops.Tables.integrityAudit(
        t(s, dir, "orders"), "o_custkey",
        t(s, dir, "customer").filter(col("c_custkey") <= 1000), "c_custkey")),
    "ns_changelog_merge" -> ((s, dir) => {
      // CDC merge gate: snapshot = docs <= 3000; a three-layer synthetic
      // changelog over docs <= 3600 exercises insert (keys past the
      // snapshot), update chains (v1 then v2), delete (v2 delete outranks
      // v1 upsert), the same-version upsert-over-delete tie (%16 keys
      // reinserted), and passthrough (odd keys). The oracle replays the
      // layers and the (version, is_upsert) winner rule.
      val docs = t(s, dir, "documents")
      val snap = docs.filter(col("doc_id") <= 3000)
        .select(col("doc_id"), col("text"), col("lang"))
      val base = docs.filter(col("doc_id") <= 3600)
      val c1 = base.filter(col("doc_id") % 2 === 0).select(col("doc_id"),
        lit("upsert").as("op"), lit(1L).as("version"),
        concat(lit("v1:"), col("text")).as("text"), col("lang"))
      val c2 = base.filter(col("doc_id") % 4 === 0).select(col("doc_id"),
        when(col("doc_id") % 8 === 0, "delete").otherwise("upsert").as("op"),
        lit(2L).as("version"),
        concat(lit("v2:"), col("text")).as("text"), col("lang"))
      val c3 = base.filter(col("doc_id") % 16 === 0).select(col("doc_id"),
        lit("upsert").as("op"), lit(2L).as("version"),
        concat(lit("v2b:"), col("text")).as("text"), col("lang"))
      graft.ops.Tables.applyChangelog(snap, c1.unionAll(c2).unionAll(c3), "doc_id")
    }),
    "ns_snapshot_diff" -> ((s, dir) => {
      // Dataset-versioning audit: two snapshots derived deterministically
      // from the documents table (old = id < 400; new = id >= 100 with
      // every 7th doc's text revised), diffed by md5 digest. The oracle
      // replays the digests and the full-outer classification.
      val docs = t(s, dir, "documents")
      val old = docs.filter(col("doc_id") < 400).select(col("doc_id"), col("text"))
      val nw = docs.filter(col("doc_id") >= 100).select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      graft.ops.Tables.snapshotDiff(old, nw, "doc_id", "text",
        includeUnchanged = true)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "ns_expectations" ->
      """WITH base AS MATERIALIZED (SELECT * FROM documents),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM base),
        |v(rule, colname, detail, n_violations) AS (
        |  SELECT 'not_null', 'text', '',
        |    CAST(count(*) FILTER (WHERE text IS NULL) AS BIGINT) FROM base
        |  UNION ALL SELECT 'unique', 'doc_id', '',
        |    CAST(count(doc_id) - count(DISTINCT doc_id) AS BIGINT) FROM base
        |  UNION ALL SELECT 'matches', 'lang', '^[a-z]{2}$',
        |    CAST(count(*) FILTER (WHERE lang IS NOT NULL
        |      AND NOT regexp_matches(lang, '^[a-z]{2}$')) AS BIGINT) FROM base
        |  UNION ALL SELECT 'between', 'n_chars', '[100, 100000]',
        |    CAST(count(*) FILTER (WHERE n_chars IS NOT NULL
        |      AND (n_chars < 100 OR n_chars > 100000)) AS BIGINT) FROM base
        |  UNION ALL SELECT 'length_between', 'text', '[400, 1000000]',
        |    CAST(count(*) FILTER (WHERE text IS NOT NULL
        |      AND (length(text) < 400 OR length(text) > 1000000)) AS BIGINT) FROM base
        |  UNION ALL SELECT 'in_set', 'source',
        |    '{src0,src1,src2,src3,src4,src5,src6,src7,src8,src9}',
        |    CAST(count(*) FILTER (WHERE source IS NOT NULL AND source NOT IN
        |      ('src0','src1','src2','src3','src4','src5','src6','src7','src8','src9'))
        |      AS BIGINT) FROM base)
        |SELECT rule, colname AS "column", detail, n.n_rows, n_violations,
        |  CASE WHEN n.n_rows > 0 THEN n_violations * 1000 // n.n_rows
        |       END AS violation_permille,
        |  n.n_rows > 0 AND n_violations = 0 AS passed
        |FROM v, n""".stripMargin,
    "ns_salted_join" ->
      """SELECT e.event_type AS etype, e.event_id, e.user_id, b.etype_users
        |FROM events e
        |JOIN (SELECT event_type, count(DISTINCT user_id) AS etype_users
        |      FROM events GROUP BY 1) b ON e.event_type = b.event_type""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |       count(*) AS count_order, avg(l_quantity) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_orders" ->
      """SELECT o_orderkey, o_custkey, sum(l_quantity) AS total_qty, count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderkey, o_custkey
        |ORDER BY total_qty DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_nation_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_lines, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "w1_topn_per_user" ->
      """SELECT user_id, event_id,
        |       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |FROM events
        |QUALIFY rn <= 3""".stripMargin,
    "w2_windowed_agg" ->
      """SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
        |       time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS window_end,
        |       event_type, count(*) AS n, CAST(sum(user_id) AS BIGINT) AS total
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    "ns_integrity_audit" ->
      """WITH ck AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n_rows
        |            FROM orders GROUP BY 1),
        |pk AS (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_custkey <= 1000)
        |SELECT CAST(ck.k AS VARCHAR) AS orphan_key, ck.n_rows
        |FROM ck LEFT JOIN pk ON ck.k = pk.k
        |WHERE pk.k IS NULL OR ck.k IS NULL""".stripMargin,
    "ns_changelog_merge" ->
      """WITH snap AS (SELECT doc_id, text, lang FROM documents WHERE doc_id <= 3000),
        |base AS (SELECT doc_id, text, lang FROM documents WHERE doc_id <= 3600),
        |ch AS (
        |  SELECT doc_id, 'upsert' AS op, CAST(1 AS BIGINT) AS version,
        |         'v1:' || text AS text, lang FROM base WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, CASE WHEN doc_id % 8 = 0 THEN 'delete' ELSE 'upsert' END,
        |         2, 'v2:' || text, lang FROM base WHERE doc_id % 4 = 0
        |  UNION ALL
        |  SELECT doc_id, 'upsert', 2, 'v2b:' || text, lang FROM base WHERE doc_id % 16 = 0),
        |w AS (
        |  SELECT doc_id, op, text, lang,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY version DESC, (op = 'upsert') DESC) AS rn
        |  FROM ch),
        |win AS (SELECT doc_id, op, text, lang FROM w WHERE rn = 1)
        |SELECT COALESCE(s.doc_id, win.doc_id) AS doc_id,
        |  CASE WHEN win.doc_id IS NOT NULL THEN win.text ELSE s.text END AS text,
        |  CASE WHEN win.doc_id IS NOT NULL THEN win.lang ELSE s.lang END AS lang
        |FROM snap s FULL OUTER JOIN win ON s.doc_id = win.doc_id
        |WHERE win.doc_id IS NULL OR win.op = 'upsert'""".stripMargin,
    "ns_snapshot_diff" ->
      """WITH old AS (
        |  SELECT doc_id, md5(text) AS old_digest FROM documents WHERE doc_id < 400
        |), nw AS (
        |  SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN md5(text || ' v2') ELSE md5(text) END AS new_digest
        |  FROM documents WHERE doc_id >= 100
        |)
        |SELECT coalesce(old.doc_id, nw.doc_id) AS doc_id,
        |       CASE WHEN old_digest IS NULL THEN 'added'
        |            WHEN new_digest IS NULL THEN 'removed'
        |            WHEN old_digest = new_digest THEN 'unchanged'
        |            ELSE 'changed' END AS status,
        |       old_digest, new_digest
        |FROM old FULL OUTER JOIN nw ON old.doc_id = nw.doc_id""".stripMargin,
    "ns_asof_join" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |                  event_id, event_type FROM events),
        |c AS (SELECT user_id, ts_us, event_id AS click_id FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts_us, min(event_id) AS purchase_id
        |      FROM e WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.user_id, c.ts_us, c.click_id,
        |       p.ts_us AS r_ts_us, p.purchase_id AS r_purchase_id
        |FROM c ASOF JOIN p ON c.user_id = p.user_id AND c.ts_us >= p.ts_us""".stripMargin,
    "ns_zorder" -> {
      val terms = (0 until 8).map(i =>
        s"(((pk >> $i) & 1) << ${2 * i}) + (((sk >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH b AS (SELECT l_orderkey, l_linenumber,
         |             CAST(l_partkey % 256 AS BIGINT) AS pk,
         |             CAST(l_suppkey % 256 AS BIGINT) AS sk
         |           FROM lineitem)
         |SELECT l_orderkey, l_linenumber, CAST($terms AS BIGINT) AS zval
         |FROM b""".stripMargin
    },
    "ns_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |           FROM events),
        |f AS (SELECT user_id, min(ts_us) AS ft FROM e GROUP BY 1)
        |SELECT CAST(ft // 86400000000 AS BIGINT) AS cohort,
        |       CAST((ts_us - ft) // 86400000000 AS BIGINT) AS period_idx,
        |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
        |FROM e JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "ns_funnel" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |                  event_type FROM events),
        |s1 AS (SELECT user_id,
        |         min(CASE WHEN event_type = 'signup' THEN ts_us END) AS t1
        |       FROM e GROUP BY 1),
        |s2 AS (SELECT e.user_id,
        |         min(CASE WHEN event_type = 'click' AND t1 IS NOT NULL
        |                       AND ts_us > t1 THEN ts_us END) AS t2
        |       FROM e JOIN s1 USING (user_id) GROUP BY 1),
        |s3 AS (SELECT e.user_id,
        |         min(CASE WHEN event_type = 'purchase' AND t2 IS NOT NULL
        |                       AND ts_us > t2 THEN ts_us END) AS t3
        |       FROM e JOIN s2 USING (user_id) GROUP BY 1)
        |SELECT s1.user_id, t1, t2, t3,
        |       CAST(CASE WHEN t3 IS NOT NULL THEN 3
        |                 WHEN t2 IS NOT NULL THEN 2
        |                 WHEN t1 IS NOT NULL THEN 1
        |                 ELSE 0 END AS BIGINT) AS depth
        |FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)""".stripMargin,
    "ns_rolling" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |                  event_id, CAST(round(value * 100) AS BIGINT) AS cents
        |           FROM events)
        |SELECT user_id, ts_us, event_id, cents,
        |       CAST(sum(cents) OVER w AS BIGINT) AS cents_wsum,
        |       CAST(count(*) OVER w AS BIGINT) AS w_n
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |                    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "ns_gaps" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |g AS (SELECT user_id,
        |             lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS gap_start,
        |             ts_us AS gap_end
        |      FROM e)
        |SELECT user_id, gap_start, gap_end, gap_end - gap_start AS gap
        |FROM g WHERE gap_end - gap_start > 21600000000""".stripMargin,
    "ns_file_stats" ->
      """SELECT 'lineitem.parquet' AS file, CAST(count(*) AS BIGINT) AS n_rows,
        |       min(l_orderkey) AS l_orderkey_min, max(l_orderkey) AS l_orderkey_max,
        |       CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS l_orderkey_nulls,
        |       min(l_returnflag) AS l_returnflag_min,
        |       max(l_returnflag) AS l_returnflag_max,
        |       CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS l_returnflag_nulls
        |FROM lineitem""".stripMargin,
    "ns_anomalies" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id,
        |                  CAST(round(value * 100) AS BIGINT) AS cents
        |           FROM events),
        |st AS (SELECT user_id, ts_us, event_id, cents,
        |              CAST(count(*) OVER w AS BIGINT) AS n_ref,
        |              CAST(coalesce(sum(cents) OVER w, 0) AS BIGINT) AS s,
        |              CAST(coalesce(sum(cents * cents) OVER w, 0) AS BIGINT) AS q
        |       FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |                           RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING))
        |SELECT user_id, ts_us, event_id, cents, n_ref,
        |       (n_ref >= 5 AND
        |        CAST(cents * n_ref - s AS HUGEINT) * CAST(cents * n_ref - s AS HUGEINT)
        |          * 1000000
        |          > 6250000 * CAST(n_ref * q - s * s AS HUGEINT)) AS is_anomaly
        |FROM st""".stripMargin,
    "ns_trending" ->
      """WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type FROM events),
        |c AS (SELECT (ts_us // 21600000000) * 21600000000 AS window_start,
        |             event_type AS item, CAST(count(*) AS BIGINT) AS cnt
        |      FROM e GROUP BY 1, 2),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY window_start
        |        ORDER BY cnt DESC, item) AS BIGINT) AS rank FROM c)
        |SELECT window_start, item, cnt, rank FROM r WHERE rank <= 3""".stripMargin,
    "ns_seasonality" ->
      """WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, user_id FROM events)
        |SELECT CAST(((ts_us // 86400000000) + 3) % 7 AS BIGINT) AS dow,
        |       CAST((ts_us // 3600000000) % 24 AS BIGINT) AS hour,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_actors
        |FROM e GROUP BY 1, 2""".stripMargin,
    "ns_active_users" ->
      """WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, user_id FROM events)
        |SELECT CAST((ts_us // 21600000000) * 21600000000 AS BIGINT) AS window_start,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_actors
        |FROM e GROUP BY 1""".stripMargin,
    "ns_transitions" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |                  event_id, event_type FROM events),
        |p AS (SELECT event_type AS from_type,
        |        lead(event_type) OVER (PARTITION BY user_id
        |          ORDER BY ts_us, event_id, event_type) AS to_type
        |      FROM e),
        |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |      FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |       CAST((n * 1000) // sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS permille_of_from
        |FROM c""".stripMargin,
    "ns_journey_match" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |                  event_id, event_type FROM events WHERE user_id <= 300)
        |SELECT user_id,
        |  string_agg(event_type, '>' ORDER BY ts_us, event_id, event_type) AS journey,
        |  regexp_matches(string_agg(event_type, '>' ORDER BY ts_us, event_id, event_type),
        |                 '.*click>purchase.*') AS is_match
        |FROM e GROUP BY 1""".stripMargin,
    "ns_resample" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |                  CAST(round(value * 100) AS BIGINT) AS cents
        |           FROM events WHERE user_id <= 200),
        |b0 AS (SELECT user_id, (ts_us // 21600000000) * 21600000000 AS tick, ts_us, cents FROM e),
        |bw AS (SELECT user_id, tick, cents,
        |         row_number() OVER (PARTITION BY user_id, tick ORDER BY ts_us DESC, cents DESC) AS rn,
        |         count(*) OVER (PARTITION BY user_id, tick) AS n_obs
        |       FROM b0),
        |b AS (SELECT user_id, tick, cents AS bv, CAST(n_obs AS BIGINT) AS n_obs FROM bw WHERE rn = 1),
        |sp AS (SELECT user_id, min(tick) AS lo, max(tick) AS hi FROM b GROUP BY 1),
        |g AS (SELECT user_id, unnest(range(lo, hi + 1, 21600000000)) AS tick FROM sp),
        |j AS (SELECT g.user_id, g.tick, b.bv, COALESCE(b.n_obs, 0) AS n_obs
        |      FROM g LEFT JOIN b ON g.user_id = b.user_id AND g.tick = b.tick)
        |SELECT user_id, tick,
        |  last_value(bv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY tick
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents,
        |  n_obs
        |FROM j""".stripMargin,
    "ns_interval_join" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |                  event_id, event_type FROM events),
        |p AS (SELECT user_id, ts_us AS ps, ts_us + 3600000000 AS pe,
        |             event_id AS purchase_id FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts_us AS cs, ts_us + 1800000000 AS ce,
        |             event_id AS click_id FROM e WHERE event_type = 'click')
        |SELECT p.user_id, ps, pe, purchase_id,
        |       cs AS r_cs, ce AS r_ce, click_id AS r_click_id
        |FROM p JOIN c ON p.user_id = c.user_id AND ps <= ce AND cs <= pe""".stripMargin,
    "ns_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |                  event_id FROM events),
        |b AS (SELECT user_id, ts_us, event_id,
        |        CASE WHEN lag(ts_us) OVER w IS NULL
        |                  OR ts_us - lag(ts_us) OVER w > 3600000000
        |             THEN 1 ELSE 0 END AS nb
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us))
        |SELECT user_id, ts_us, event_id,
        |       CAST(sum(nb) OVER (PARTITION BY user_id ORDER BY ts_us
        |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |FROM b""".stripMargin,
    "ns_session_stats" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |b AS (SELECT user_id, ts_us,
        |        CASE WHEN lag(ts_us) OVER w IS NULL
        |                  OR ts_us - lag(ts_us) OVER w > 3600000000
        |             THEN 1 ELSE 0 END AS nb
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
        |l AS (SELECT user_id, ts_us,
        |        CAST(sum(nb) OVER (PARTITION BY user_id ORDER BY ts_us
        |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |      FROM b)
        |SELECT user_id, session_seq, min(ts_us) AS session_start,
        |       max(ts_us) AS session_end, CAST(count(*) AS BIGINT) AS n_events
        |FROM l GROUP BY 1, 2""".stripMargin,
    "ns_range_join" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |                  event_id, event_type FROM events),
        |c AS (SELECT user_id, ts_us, event_id AS click_id FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts_us AS w_start, ts_us + 3600000000 AS w_end,
        |             event_id AS purchase_id FROM e WHERE event_type = 'purchase')
        |SELECT c.user_id, c.ts_us, c.click_id, w_start AS i_w_start,
        |       w_end AS i_w_end, purchase_id AS i_purchase_id
        |FROM c JOIN p ON c.user_id = p.user_id
        |             AND c.ts_us BETWEEN w_start AND w_end""".stripMargin,
    "ns_stream_monitor" ->
      """SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
        |       time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS window_end,
        |       event_type, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN len(trim(props)) = 0 THEN 0
        |                ELSE len(string_split_regex(trim(props), '\s+')) END) AS BIGINT) AS n_tokens,
        |       CAST(sum(CASE WHEN len(props) >= 9 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       CAST(sum(CASE WHEN len(trim(props)) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    "ns_stream_drift" ->
      """WITH s AS (SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
        |             (event_id * 37) % 1001 AS v FROM events),
        |b AS (SELECT window_start, greatest(0, least(9, v * 10 // 1000)) AS bucket,
        |             CAST(count(*) AS BIGINT) AS n FROM s GROUP BY 1, 2),
        |w AS (SELECT DISTINCT window_start FROM b),
        |sp AS (SELECT window_start, CAST(unnest(range(10)) AS BIGINT) AS bucket FROM w),
        |j AS (SELECT sp.window_start, sp.bucket, coalesce(b.n, 0) AS n
        |      FROM sp LEFT JOIN b USING (window_start, bucket)),
        |c AS (SELECT *, CAST(sum(n) OVER (PARTITION BY window_start ORDER BY bucket) AS HUGEINT) AS cum,
        |        CAST(sum(n) OVER (PARTITION BY window_start) AS HUGEINT) AS tot FROM j),
        |x AS (SELECT window_start, tot,
        |        abs(cum * 1000000 - (bucket + 1) * 100000 * tot) AS xx FROM c),
        |f AS (SELECT window_start, CAST(max(tot) AS BIGINT) AS n_obs,
        |        CAST(max(xx) // max(tot) AS BIGINT) AS ks_micro,
        |        CAST(sum(xx) // max(tot) AS BIGINT) AS emd_micro
        |      FROM x GROUP BY 1)
        |SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end,
        |       n_obs, ks_micro, emd_micro
        |FROM f""".stripMargin,
    "ns_stream_passk" ->
      """WITH per AS (SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
        |    user_id % 50 AS problem,
        |    CAST(count(*) AS BIGINT) AS n_samples,
        |    CAST(sum(CASE WHEN event_id % 7 < 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_passed
        |  FROM events GROUP BY 1, 2),
        |kk AS (SELECT CAST(unnest([1, 5]) AS BIGINT) AS k),
        |f AS (SELECT *, CASE WHEN k <= n_samples THEN
        |    list_reduce(list_prepend(1000000::BIGINT, range(0, k)),
        |      (acc, i) -> (acc * (n_samples - n_passed - i)) // (n_samples - i))
        |  END AS m FROM per, kk)
        |SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end,
        |  problem, n_samples, n_passed, k, 1000000 - m AS pass_at_k_micro
        |FROM f""".stripMargin,
    "ns_stream_selfcons" ->
      // the oracle is free to use the batch two-level shape (it is not
      // bound by streaming's one-aggregate rule); ties to the smallest
      // answer, matching the wide-pivot CASE's ascending first-match
      """WITH v AS (SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
        |    user_id % 50 AS problem, (event_id * 3 + user_id) % 5 AS ans,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events WHERE event_id % 11 <> 0 GROUP BY 1, 2, 3),
        |r AS (SELECT *, row_number() OVER (PARTITION BY window_start, problem
        |    ORDER BY c DESC, ans ASC) AS rn,
        |    CAST(sum(c) OVER (PARTITION BY window_start, problem) AS BIGINT) AS n_samples
        |  FROM v)
        |SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end,
        |  problem, ans AS majority_answer, c AS n_majority, n_samples,
        |  c * 1000 // n_samples AS majority_permille
        |FROM r WHERE rn = 1""".stripMargin,
    "ns_stream_bleu" ->
      // the oracle is free to use the batch two-level clip (per-event
      // gram aggregate, then the window pool); the root chain is the
      // shared isqrt fragment every BLEU-geo oracle compiles from. The
      // tk CTE slices BOTH sides to 64 tokens, mirroring the monitor's
      // maxTokens = 64 row-local-clip contract — without the slice, gate
      // parity would silently depend on the derived texts staying under
      // 64 tokens (they do today; the contract should not rely on it)
      s"""WITH src AS (SELECT event_id,
         |    time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS w,
         |    concat_ws(' ', event_type, event_type, props,
         |      CAST(user_id % 5 AS VARCHAR), CAST(event_id % 3 AS VARCHAR)) AS cand,
         |    concat_ws(' ', event_type, props, CAST(user_id % 5 AS VARCHAR),
         |      CAST(event_id % 3 AS VARCHAR), CAST(event_id % 7 AS VARCHAR)) AS ref
         |  FROM events),
         |tk AS MATERIALIZED (SELECT event_id, w,
         |    list_slice(list_filter(string_split_regex(trim(lower(coalesce(cand, ''))), '\\s+'),
         |               x -> x <> ''), 1, 64) AS ct,
         |    list_slice(list_filter(string_split_regex(trim(lower(coalesce(ref, ''))), '\\s+'),
         |               x -> x <> ''), 1, 64) AS rt
         |  FROM src),
         |ns AS (SELECT event_id, ct, rt, CAST(unnest([1, 2, 3, 4]) AS BIGINT) AS n FROM tk),
         |cgr AS (SELECT event_id, n, unnest(list_transform(range(1, len(ct) - n + 2),
         |          i -> array_to_string(list_slice(ct, i, i + n - 1), ' '))) AS gram FROM ns),
         |rgr AS (SELECT event_id, n, unnest(list_transform(range(1, len(rt) - n + 2),
         |          i -> array_to_string(list_slice(rt, i, i + n - 1), ' '))) AS gram FROM ns),
         |cc AS (SELECT event_id, n, gram, count(*) AS c FROM cgr GROUP BY 1, 2, 3),
         |rc AS (SELECT event_id, n, gram, count(*) AS r FROM rgr GROUP BY 1, 2, 3),
         |g AS (SELECT coalesce(cc.event_id, rc.event_id) AS event_id, coalesce(cc.n, rc.n) AS n,
         |        coalesce(cc.c, 0) AS c, coalesce(rc.r, 0) AS r
         |      FROM cc FULL JOIN rc ON cc.event_id = rc.event_id AND cc.n = rc.n AND cc.gram = rc.gram),
         |comp AS (SELECT event_id, n, CAST(sum(least(c, r)) AS BIGINT) AS m,
         |        CAST(sum(c) AS BIGINT) AS t FROM g GROUP BY 1, 2),
         |pw AS (SELECT tk.w, comp.n, CAST(sum(m) AS BIGINT) AS m,
         |        CAST(sum(t) AS BIGINT) AS t
         |      FROM comp JOIN tk ON comp.event_id = tk.event_id GROUP BY 1, 2),
         |lens AS (SELECT w, CAST(count(*) AS BIGINT) AS n_pairs,
         |    CAST(sum(len(ct)) AS BIGINT) AS cand_tokens,
         |    CAST(sum(len(rt)) AS BIGINT) AS ref_tokens
         |  FROM tk GROUP BY 1),
         |wide AS (SELECT lens.w, n_pairs, cand_tokens, ref_tokens,
         |    CAST(coalesce(sum(CASE WHEN n = 1 THEN m END), 0) AS BIGINT) AS m1,
         |    CAST(coalesce(sum(CASE WHEN n = 1 THEN t END), 0) AS BIGINT) AS t1,
         |    CAST(coalesce(sum(CASE WHEN n = 2 THEN m END), 0) AS BIGINT) AS m2,
         |    CAST(coalesce(sum(CASE WHEN n = 2 THEN t END), 0) AS BIGINT) AS t2,
         |    CAST(coalesce(sum(CASE WHEN n = 3 THEN m END), 0) AS BIGINT) AS m3,
         |    CAST(coalesce(sum(CASE WHEN n = 3 THEN t END), 0) AS BIGINT) AS t3,
         |    CAST(coalesce(sum(CASE WHEN n = 4 THEN m END), 0) AS BIGINT) AS m4,
         |    CAST(coalesce(sum(CASE WHEN n = 4 THEN t END), 0) AS BIGINT) AS t4
         |  FROM lens LEFT JOIN pw ON lens.w = pw.w GROUP BY 1, 2, 3, 4),
         |pp AS (SELECT *, CASE WHEN t1 > 0 THEN m1 * 1000 // t1 END AS p1,
         |    CASE WHEN t2 > 0 THEN m2 * 1000 // t2 END AS p2,
         |    CASE WHEN t3 > 0 THEN m3 * 1000 // t3 END AS p3,
         |    CASE WHEN t4 > 0 THEN m4 * 1000 // t4 END AS p4 FROM wide),
         |pr AS (SELECT *, p1 * p2 * p3 * p4 AS prod FROM pp),
         |${EntrySupport.isqrtChainSql}
         |SELECT w AS window_start, w + INTERVAL 1 HOUR AS window_end,
         |  n_pairs, cand_tokens, ref_tokens,
         |  m1 AS matches_1, t1 AS total_1, m2 AS matches_2, t2 AS total_2,
         |  m3 AS matches_3, t3 AS total_3, m4 AS matches_4, t4 AS total_4,
         |  CASE WHEN t1 > 0 AND t2 > 0 AND t3 > 0 AND t4 > 0 THEN geo END
         |    AS precision_geo_permille
         |FROM s2""".stripMargin,
    "ns_stream_rep" ->
      """WITH ev AS (SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS w,
        |    list_filter(string_split_regex(trim(lower(
        |      concat_ws(' ', event_type, props, event_type, CAST(event_id % 13 AS VARCHAR)))), '\s+'),
        |      x -> x <> '') AS t
        |  FROM events),
        |ns AS (SELECT w, t, CAST(unnest([1, 2]) AS BIGINT) AS n FROM ev),
        |g AS (SELECT w, n,
        |    CAST(len(t) - n + 1 AS BIGINT) AS total,
        |    CAST(len(list_distinct(list_transform(range(1, len(t) - n + 2),
        |      i -> array_to_string(list_slice(t, i, i + n - 1), ' ')))) AS BIGINT) AS dist
        |  FROM ns WHERE len(t) - n + 1 > 0)
        |SELECT w AS window_start, w + INTERVAL 1 HOUR AS window_end, n,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(total) AS BIGINT) AS total_grams,
        |  CAST(sum(dist) AS BIGINT) AS distinct_grams,
        |  1000 - (CAST(sum(dist) AS BIGINT) * 1000 // CAST(sum(total) AS BIGINT)) AS rep_permille
        |FROM g GROUP BY 1, 2, 3""".stripMargin,
    "ns_stream_novelty" ->
      """WITH ev AS (SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS w,
        |    list_filter(string_split_regex(trim(lower(
        |      concat_ws(' ', event_type, props, CAST(event_id % 13 AS VARCHAR)))), '\s+'),
        |      x -> x <> '') AS t
        |  FROM events),
        |ens AS (SELECT w, t, CAST(unnest([1, 2]) AS BIGINT) AS n FROM ev),
        |eg AS (SELECT w, n, unnest(list_transform(range(1, len(t) - n + 2),
        |        i -> array_to_string(list_slice(t, i, i + n - 1), ' '))) AS gram FROM ens),
        |rf AS (SELECT
        |    list_filter(string_split_regex(trim(lower(coalesce(text, ''))), '\s+'),
        |                x -> x <> '') AS t
        |  FROM documents),
        |rns AS (SELECT t, CAST(unnest([1, 2]) AS BIGINT) AS n FROM rf),
        |rgd AS (SELECT DISTINCT n, gram FROM
        |    (SELECT n, unnest(list_transform(range(1, len(t) - n + 2),
        |       i -> array_to_string(list_slice(t, i, i + n - 1), ' '))) AS gram FROM rns)),
        |j AS (SELECT eg.w, eg.n, CASE WHEN rgd.gram IS NULL THEN 1 ELSE 0 END AS novel
        |      FROM eg LEFT JOIN rgd ON eg.n = rgd.n AND eg.gram = rgd.gram)
        |SELECT w AS window_start, w + INTERVAL 1 HOUR AS window_end, n,
        |  CAST(count(*) AS BIGINT) AS total_grams,
        |  CAST(sum(novel) AS BIGINT) AS novel_grams,
        |  (CAST(sum(novel) AS BIGINT) * 1000) // CAST(count(*) AS BIGINT) AS novelty_permille
        |FROM j GROUP BY 1, 2, 3""".stripMargin,
    "ns_stream_paired_delta" ->
      """WITH s AS (SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS w,
        |    (event_id * 3) % 100 - ((event_id * 7 + 1) % 100) AS d
        |  FROM events WHERE event_id % 13 <> 0),
        |g AS (SELECT w, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS a_wins,
        |    CAST(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT) AS b_wins,
        |    CAST(sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties,
        |    CAST(sum(d) AS BIGINT) AS delta_sum
        |  FROM s GROUP BY 1)
        |SELECT w AS window_start, w + INTERVAL 1 HOUR AS window_end,
        |  n_pairs, a_wins, b_wins, ties, delta_sum,
        |  (delta_sum * 1000) // n_pairs AS mean_delta_milli
        |FROM g""".stripMargin,
    "ns_stream_calibration" ->
      """WITH s AS (SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
        |             (event_id * 37) % 1001 AS score,
        |             CASE WHEN (event_id * 37) % 1001 > 500
        |                  THEN (CASE WHEN event_id % 7 = 0 THEN 0 ELSE 1 END)
        |                  ELSE (CASE WHEN event_id % 11 = 0 THEN 1 ELSE 0 END)
        |             END AS label
        |           FROM events),
        |b AS (SELECT window_start, score // 100 AS bucket,
        |             CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(label) AS BIGINT) AS n_pos,
        |             CAST(sum(score) AS BIGINT) AS sum_s
        |      FROM s GROUP BY 1, 2)
        |SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end,
        |       bucket, n, n_pos,
        |       CAST(sum_s // n AS BIGINT) AS mean_score_milli,
        |       CAST((n_pos * 1000) // n AS BIGINT) AS observed_permille,
        |       CAST((n_pos * 1000) // n - sum_s // n AS BIGINT) AS gap_milli
        |FROM b""".stripMargin,
    "ns_key_profile" ->
      """WITH c AS (SELECT event_type, count(*) AS cnt FROM events GROUP BY 1),
        |s AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_rows, count(*) AS n_keys FROM c),
        |t3 AS (SELECT * FROM c ORDER BY cnt DESC, event_type LIMIT 3)
        |SELECT event_type, cnt, total_rows, n_keys,
        |  CAST(row_number() OVER (ORDER BY cnt DESC, event_type) AS BIGINT) AS key_rank,
        |  (cnt * 1000) // total_rows AS share_permille,
        |  (cnt * 1000) // greatest(total_rows // n_keys, 1) AS vs_mean_permille
        |FROM t3 CROSS JOIN s""".stripMargin,
    "ns_acf" ->
      """WITH c AS (SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 3600 AS BIGINT) AS bucket,
        |             CAST(count(*) AS BIGINT) AS x
        |           FROM events GROUP BY 1),
        |r AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM c),
        |d AS (SELECT gs.b AS bucket, coalesce(c.x, 0) AS x
        |      FROM (SELECT unnest(generate_series(lo, hi)) AS b FROM r) gs
        |      LEFT JOIN c ON c.bucket = gs.b),
        |pl AS (
        |  SELECT 1 AS lag, CAST(a.x AS HUGEINT) AS x, CAST(b.x AS HUGEINT) AS y
        |  FROM d a JOIN d b ON b.bucket = a.bucket + 1
        |  UNION ALL SELECT 2, CAST(a.x AS HUGEINT), CAST(b.x AS HUGEINT)
        |  FROM d a JOIN d b ON b.bucket = a.bucket + 2
        |  UNION ALL SELECT 24, CAST(a.x AS HUGEINT), CAST(b.x AS HUGEINT)
        |  FROM d a JOIN d b ON b.bucket = a.bucket + 24),
        |s AS (SELECT lag, count(*) AS n, sum(x) AS sum_x, sum(y) AS sum_y,
        |        sum(x*x) AS sum_x2, sum(y*y) AS sum_y2, sum(x*y) AS sum_xy
        |      FROM pl GROUP BY 1)
        |SELECT CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n,
        |  CASE WHEN (n*sum_x2 - sum_x*sum_x) > 0 AND (n*sum_y2 - sum_y*sum_y) > 0 THEN
        |    CAST(round(1000.0 * CAST(n*sum_xy - sum_x*sum_y AS DOUBLE) /
        |      (sqrt(CAST(n*sum_x2 - sum_x*sum_x AS DOUBLE)) *
        |       sqrt(CAST(n*sum_y2 - sum_y*sum_y AS DOUBLE)))) AS BIGINT)
        |  END AS corr_permille
        |FROM s""".stripMargin
  )
}
