package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for LLM training-data pipelines: PII
  * detection/redaction, benchmark decontamination, Gopher-style quality
  * filtering, corpus-wide line-level dedup, and deterministic (hash-based)
  * stratified sampling.
  *
  * Scale design (100 TB / 1000 executors):
  *   - PII + quality are pure per-row projections: scan speed, zero shuffle.
  *   - Decontamination broadcasts the benchmark n-gram set (eval benchmarks
  *     are tiny next to a training corpus), so the corpus side never
  *     shuffles its grams — the only exchange is the per-doc hit count,
  *     keyed by doc id.
  *   - Line dedup's first-occurrence resolution is a partial-aggregated
  *     groupBy on a uniform 64-bit line hash (map-side combine absorbs
  *     boilerplate lines that repeat millions of times); a window over the
  *     line key would funnel each hot line into one sorted partition.
  *   - Sampling decisions are pure hash predicates — no shuffle, no RNG
  *     state, reproducible across engines/retries (the same md5-affine
  *     portable family the dedup oracles use).
  */
object Curation {

  // ------------------------------------------------------------------ PII

  /** RE2-compatible patterns (no lookaround, no backreferences) so the very
    * same regexes run under java.util.regex (Spark codegen) and RE2-based
    * engines (the DuckDB correctness oracle, Go's regexp).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+\\d{1,2}-\\d{3}-\\d{3}-\\d{4}"
  val CcRe = "\\b\\d{13,16}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Per-document PII counts over the raw text — codegen'd regexp_count
    * projections, zero shuffle.
    */
  def piiStats(text: Column): Column = struct(
    regexp_count(text, lit(EmailRe)).cast("long").as("n_emails"),
    regexp_count(text, lit(PhoneRe)).cast("long").as("n_phones"),
    regexp_count(text, lit(CcRe)).cast("long").as("n_ccs"),
    regexp_count(text, lit(Ipv4Re)).cast("long").as("n_ips"))

  /** Redact PII in place. Order matters: emails first (their local part may
    * contain digits/dots), then phones (dashed digit groups), then card
    * numbers (long digit runs), then IPs (dotted short runs) — every later
    * pattern can no longer match inside an earlier redaction token.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"),
        CcRe, "<CC>"),
      Ipv4Re, "<IP>")

  // --------------------------------------------------- decontamination

  /** Distinct word n-grams (lowercased, whitespace-tokenized, sliding);
    * docs shorter than `n` tokens contribute their whole token string as a
    * single gram — the same convention as [[Dedup.shingles]], computed by
    * the one-pass WordNgramsExpr (the declarative HOF form costs ~100× per
    * row interpreted and gets re-inlined by extract-generator /
    * infer-filters rewrites).
    */
  def wordNgrams(text: Column, n: Int): Column =
    graft.functions.text.wordNgrams(text, n, distinct = true)

  /** Benchmark decontamination: flag corpus documents sharing at least
    * `minOverlap` distinct word n-grams with the benchmark/eval set — the
    * standard train/test-leak guard applied before training (n-gram overlap
    * against held-out benchmarks).
    *
    * The benchmark gram set is broadcast (default): corpus grams are
    * checked map-side and only per-doc hit counts shuffle (keyed by doc
    * id). Set `broadcastBenchmark = false` if the benchmark outgrows the
    * broadcast threshold — the join then shuffles on the gram string.
    *
    * Output: one row per corpus doc — (idCol, n_grams, n_contaminated_grams,
    * contaminated).
    */
  def decontaminate(
      corpus: DataFrame,
      benchmark: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 8,
      minOverlap: Int = 1,
      broadcastBenchmark: Boolean = true
  ): DataFrame = {
    val grams = wordNgrams(col(textCol), n)
    val bench0 = benchmark.select(explode(grams).as("gram")).distinct()
      .withColumn("__bench", lit(1))
    val bench = if (broadcastBenchmark) broadcast(bench0) else bench0
    // ONE corpus scan, ONE gram evaluation per doc: the grams array
    // materializes as an attribute BELOW the Generate (putting any sibling
    // expression in the same select as explode() would land it in the
    // Project Catalyst extracts ABOVE the Generate, re-running the
    // tokenize+shingle work once per exploded gram). n_grams is then just
    // the row count per doc: per-doc grams are distinct and the bench side
    // is distinct, so count(*) is the gram count and the hit sum is exactly
    // the distinct-overlap cardinality. The bench probe is a map-side
    // broadcast left join; the per-doc roll-up partial-aggregates.
    corpus.select(col(idCol), grams.as("__grams"))
      .select(col(idCol), explode(col("__grams")).as("gram"))
      .join(bench, Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__bench").isNotNull, 1L).otherwise(0L)).as("n_contaminated_grams"))
      .withColumn("contaminated", col("n_contaminated_grams") >= minOverlap)
  }

  /** Per-group contamination report: the release-gate rollup of
    * [[decontaminate]] — for each `groupCol` value (source, language,
    * crawl snapshot), how many docs overlap the benchmark and at what
    * per-mille rate. The number a data release actually publishes (and
    * the one that localizes a leak to the source that shipped it, which
    * per-doc flags don't). One extra groups-sized aggregate over the
    * per-doc frame; integer rate so the report replays cross-engine.
    */
  def contaminationReport(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, groupCol: String, n: Int = 8,
      minOverlap: Int = 1): DataFrame =
    decontaminate(corpus, benchmark, textCol, idCol, n, minOverlap)
      .join(corpus.select(col(idCol), col(groupCol)), Seq(idCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("contaminated"), 1L).otherwise(0L)).as("n_contaminated"))
      .withColumn("contaminated_permille",
        call_function("div", lit(1000L) * col("n_contaminated"), col("n_docs")))

  /** Near-duplicate decontamination: flag corpus documents that are
    * MinHash near-dups of any benchmark document (est Jaccard ≥
    * `minJaccard`), catching paraphrased / lightly-edited benchmark leaks
    * that exact n-gram overlap ([[decontaminate]]) misses. Pure
    * composition of the incremental-dedup machinery: the benchmark
    * becomes a [[graft.ops.Dedup.MinhashIndex]] (persist it once per
    * benchmark release and reuse across corpus versions), the corpus
    * plays the delta side, so cost is corpus-scan × bucket hit rate and
    * the shuffle carries signatures, never text. Output: input columns +
    * `contaminated`.
    */
  def decontaminateNearDup(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, minJaccard: Double = 0.8,
      shingleLen: Int = 3, numHashes: Int = 64, bands: Int = 16,
      maxBucket: Int = Int.MaxValue, portable: Boolean = false): DataFrame = {
    val idx = graft.ops.Dedup.minhashIndex(benchmark, textCol, idCol,
      shingleLen, numHashes, bands, portable)
    val hits = graft.ops.Dedup
      .incrementalMinhashCandidates(corpus, idx, textCol, idCol, maxBucket)
      .filter(col("est_jaccard") >= minJaccard)
      .select(col("batch_id").as("__contaminated_id")).distinct()
    corpus.join(hits, corpus(idCol) === col("__contaminated_id"), "left")
      .withColumn("contaminated", col("__contaminated_id").isNotNull)
      .drop("__contaminated_id")
  }

  /** Embedding-space decontamination — the SEMANTIC tier of the family
    * ([[decontaminate]] catches verbatim grams, [[decontaminateNearDup]]
    * lexical near-copies; this catches paraphrases and translations that
    * share no surface text with the benchmark, the leak n-gram methods
    * structurally miss). Per corpus vector: its maximum cosine against
    * ANY benchmark vector, the argmax benchmark id (ties to the smallest
    * id), and the `contaminated` flag at `minCosPermille`.
    *
    * Determinism: both sides micro-quantize, dots and squared norms are
    * integer, and the cosine takes the repo's fixed-order IEEE tail
    * (two sqrts, one divide, one floor — [[Embeddings.groupAffinity]]'s
    * convention), so the permille values, the flag, AND the argmax replay
    * bit-for-bit cross-engine. Zero-norm vectors score 0 everywhere.
    *
    * Scale shape: the benchmark (eval sets — thousands of rows) rides as
    * a BROADCAST build side; the corpus×benchmark expansion partial-
    * aggregates to one row per corpus id before any exchange, so shuffle
    * payload is corpus-sized ids+scores, never vectors. Benchmarks too
    * large to broadcast should first reduce via [[Similarity.ivfTopK]]
    * candidates — contamination is high-similarity by definition, ANN
    * recall's best regime.
    *
    * Output: corpus idCol + (best_benchmark_id, max_cos_permille,
    * contaminated).
    *
    * Id contract: benchmark ids must be NUMERIC (the deterministic argmax
    * tie-breaks toward the SMALLEST benchmark id via `max(struct(cos,
    * -bid))` — one partial-aggregable max instead of a window sort; a
    * string id fails analysis on the unary minus, and a Long.MinValue id
    * would overflow negation). Benchmark suites key by small integer ids;
    * map exotic id types to a dense long before calling.
    */
  def decontaminateEmbedding(corpus: DataFrame, benchmark: DataFrame,
      vecCol: String, idCol: String, minCosPermille: Long,
      dim: Int, quantScale: Long = 1000000L): DataFrame = {
    require(minCosPermille >= 0 && minCosPermille <= 1000,
      "minCosPermille must be in [0, 1000]")
    def q(df: DataFrame, id: String, v: String) = df.select(
      col(idCol).as(id),
      transform(col(vecCol).cast("array<double>"),
        x => round(x * quantScale).cast("long")).as(v))
      .filter(size(col(v)) === dim)
      .withColumn(s"${v}_nsq",
        aggregate(col(v), lit(0L), (acc, x) => acc + x * x))
    val c = q(corpus, "cid", "cq")
    val b = q(benchmark, "bid", "bq")
    val scored = c.crossJoin(broadcast(b))
      .select(col("cid"), col("bid"),
        when(col("cq_nsq") > 0 && col("bq_nsq") > 0,
          floor(lit(1000.0) *
            aggregate(zip_with(col("cq"), col("bq"), (x, y) => x * y),
              lit(0L), (acc, x) => acc + x) /
            (sqrt(col("cq_nsq").cast("double")) *
              sqrt(col("bq_nsq").cast("double")))).cast("long"))
          .otherwise(lit(0L)).as("cos_permille"))
    scored.groupBy(col("cid"))
      .agg(max(struct(col("cos_permille"), (-col("bid")).as("nb"))).as("m"))
      .select(col("cid").as(idCol),
        (-col("m.nb")).as("best_benchmark_id"),
        col("m.cos_permille").as("max_cos_permille"),
        (col("m.cos_permille") >= minCosPermille).as("contaminated"))
  }

  /** Decontamination for benchmark sets too large to broadcast as a hash
    * relation: a Bloom filter over the benchmark grams (bits, not strings —
    * ~10× smaller) pre-filters corpus grams MAP-SIDE, and only the
    * surviving candidates enter the exact shuffle join that removes the
    * filter's false positives. Results are therefore EXACT (Bloom filters
    * have no false negatives); the shuffle shrinks from every corpus gram
    * to the candidate survivors (expected: true hits + fpp × corpus grams).
    *
    * Output: (idCol, n_contaminated_grams, contaminated) — per-doc total
    * gram counts are not carried through the pre-filter; use
    * [[decontaminate]] when you need `n_grams`.
    */
  def decontaminateBloom(
      corpus: DataFrame,
      benchmark: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 8,
      minOverlap: Int = 1,
      fpp: Double = 0.01
  ): DataFrame = {
    import graft.functions.text
    val grams = wordNgrams(col(textCol), n)
    val benchGrams = benchmark.select(explode(grams).as("gram")).distinct().cache()
    // the distinct-gram count sizes the filter; one bounded action over the
    // (comparatively small) benchmark side, reusing its cached grams
    val nBench = math.max(benchGrams.count(), 1L)
    val bloom = benchGrams.stat.bloomFilter("gram", nBench, fpp)
    val candidates = corpus
      .select(col(idCol), grams.as("__grams"))
      .select(col(idCol), explode(col("__grams")).as("gram"))
      .where(text.bloomMightContain(bloom, col("gram")))
    // benchGrams stays cached into the returned plan (it feeds both the
    // filter build and the exact join); the context cleaner reclaims it
    // when the frame is released — same contract as connectedComponents
    candidates.join(benchGrams, Seq("gram")) // exact: kills Bloom FPs
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_contaminated_grams"))
      .withColumn("contaminated", col("n_contaminated_grams") >= minOverlap)
  }

  // --------------------------------------------------- line-level dedup

  /** Corpus-wide line-level deduplication (the C4 recipe, Raffel et al.
    * 2020 §2.2): every line keeps only its globally-first occurrence —
    * "first" = minimum (doc, position) — and documents are reassembled from
    * their surviving lines in original order. Documents whose every line is
    * seen earlier elsewhere are dropped entirely.
    *
    * Plan shape: explode to (doc, pos, line) → resolve first occurrence per
    * 64-bit line hash with a partial-aggregated min (map-side combine keeps
    * mega-duplicated boilerplate lines from hot-spotting one reducer, which
    * a window over the line would do) → same-key join filters survivors →
    * per-doc reassembly groupBy. Shuffle payload: the line hash + (id, pos)
    * on the aggregate side; line text moves only with its own row.
    *
    * Output: (idCol, n_lines, n_kept, text_dedup), one row per surviving
    * document.
    */
  /** WITHIN-document repeated-line removal: each line keeps only its first
    * occurrence INSIDE its own document (navigation bars, repeated headers,
    * templated footers stamped several times into one page) — the
    * document-local complement to [[lineDedup]]'s corpus-global pass, and
    * the one to run FIRST: local repeats are page structure, not shared
    * content, and removing them locally keeps the global pass's
    * first-occurrence winner from being a boilerplate copy.
    *
    * ZERO SHUFFLE: the whole operator is one scan-stage projection over
    * array HOFs (split → first-index filter → reassemble) — no explode, no
    * exchange, no window; at 100 TB it runs at scan speed like the quality
    * expressions. The first-index probe is O(lines²) string compares per
    * document worst-case — document-local by construction, the same budget
    * class as the gram expressions. Empty lines are structure and always
    * survive ([[lineDedup]]'s rule). The split never yields an empty
    * array (`split("") == [""]`), so the index sequence is well-defined.
    *
    * Output: (idCol, n_lines, n_kept, text_dedup), one row PER document —
    * unlike the global pass, a fully-duplicate document keeps its first
    * line (dedup is local; there is no "earlier document" to defer to).
    */
  def dedupeLinesInDoc(docs: DataFrame, textCol: String, idCol: String,
      sep: String = "\n"): DataFrame = {
    val sepRe = java.util.regex.Pattern.quote(sep)
    docs
      .select(col(idCol), split(col(textCol), sepRe).as("__ls"))
      .select(col(idCol), col("__ls"),
        filter(sequence(lit(0), size(col("__ls")) - 1),
          i => col("__ls").getItem(i) === "" ||
            array_position(col("__ls"), col("__ls").getItem(i))
              === (i + 1).cast("long")).as("__keep"))
      .select(col(idCol),
        size(col("__ls")).cast("long").as("n_lines"),
        size(col("__keep")).cast("long").as("n_kept"),
        array_join(transform(col("__keep"), i => col("__ls").getItem(i)), sep)
          .as("text_dedup"))
  }

  def lineDedup(docs: DataFrame, textCol: String, idCol: String, sep: String = "\n"): DataFrame = {
    val sepRe = java.util.regex.Pattern.quote(sep)
    // the per-doc line count rides along each exploded row (one long) so no
    // third corpus scan — and no re-evaluation of whatever expression built
    // textCol — is needed to report n_lines at the end. The count is
    // computed in its own projection BELOW the posexplode: as a sibling of
    // the generator it would land in the Project Catalyst extracts ABOVE
    // the Generate and re-split the document once per line (O(doc²))
    val lines = docs
      .select(col(idCol).as("__id"), split(col(textCol), sepRe).as("__ls"))
      .select(col("__id"), size(col("__ls")).cast("long").as("__n"), col("__ls"))
      .select(col("__id"), col("__n"),
        posexplode(col("__ls")).as(Seq("__pos", "__line")))
      .withColumn("__lh", xxhash64(col("__line")))
    // empty lines are structure (paragraph breaks), not dedupable content —
    // deduping them would delete every blank line in the corpus but one and
    // run unrelated paragraphs together; they also skip the aggregate, so
    // the most frequent "line" in real corpora never forms a bucket at all
    val content = lines.where(col("__line") =!= "")
    // the winner struct carries the line text so a 64-bit hash collision
    // degrades to keeping both colliding lines (the losing line fails the
    // text-equality check and survives everywhere) instead of silently
    // deleting one of them corpus-wide; the shuffle payload is one
    // candidate (id, pos, line) per distinct hash per map partition
    val first = content.groupBy(col("__lh"))
      .agg(min(struct(col("__id"), col("__pos"), col("__line"))).as("__first"))
    val kept = content.join(first, Seq("__lh"))
      .where((col("__id") === col("__first.__id") && col("__pos") === col("__first.__pos")) ||
        col("__line") =!= col("__first.__line"))
      .select(col("__id"), col("__n"), col("__pos"), col("__line"))
      .unionByName(lines.where(col("__line") === "")
        .select(col("__id"), col("__n"), col("__pos"), col("__line")))
    kept.groupBy(col("__id"))
      .agg(first_value(col("__n")).as("n_lines"),
        count(lit(1)).as("n_kept"),
        concat_ws(sep,
          transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
            s => s.getField("__line"))).as("text_dedup"))
      .select(col("__id").as(idCol), col("n_lines"), col("n_kept"), col("text_dedup"))
  }

  /** Exact duplicated-span removal (the ExactSubstr dedup of Lee et al.
    * 2021, "Deduplicating Training Data Makes Language Models Better"):
    * any run of `minTokens` consecutive tokens that occurs more than once
    * corpus-wide (across documents or repeated within one) is removed at
    * every occurrence except the first (minimal (doc, position)). The
    * reference construction is a single-node suffix array; the
    * distributed equivalent is shingle-keyed: every `minTokens`-gram
    * occurrence is keyed by a 120-bit content hash, duplicated grams are
    * found by a partial-aggregated groupBy on that fixed-width key (the
    * gram text itself never enters an exchange — a span of 50 tokens
    * would otherwise amplify the corpus ~50x through the shuffle), and
    * marked occurrences cover their token interval via an id+position
    * explode feeding a left-anti join. All exchanges carry ids, ints, or
    * the 30-byte key; document text crosses a shuffle exactly once, as
    * single tokens in the final per-doc reassembly. An accidental
    * collision needs two grams agreeing on 120 bits of md5; for
    * adversarial corpora escalate to a verify-join on gram text.
    *
    * Overlapping duplicated spans union their covers, so maximal
    * duplicated regions are removed as a whole. A document shorter than
    * `minTokens` emits no shingles (it can only be a whole-doc duplicate
    * — exact-dedup territory); a document whose every token is covered
    * vanishes from the output, like removeBoilerplate's vanishing docs.
    *
    * Output per doc: (idCol, n_tokens, n_kept, text_dedup) over the
    * shared normalization (trim → lower → whitespace split). `idCol`
    * must be integral (doc ids here are longs): first-occurrence
    * ordering packs (id, position) into one long to stay inside the
    * codegen'd hash aggregate.
    */
  def exactSubstrDedup(docs: DataFrame, textCol: String, idCol: String,
      minTokens: Int = 50): DataFrame = {
    require(minTokens >= 2, "a duplicated span needs at least 2 tokens")
    // token stream: n_tokens rides below the explode (lineDedup pattern —
    // as a generator sibling it would re-tokenize once per output row)
    val toks = docs
      .select(col(idCol).as("__id"),
        graft.functions.text.wordNgrams(col(textCol), 1, distinct = false).as("__ts"))
      .select(col("__id"), size(col("__ts")).cast("long").as("__n"), col("__ts"))
      .select(col("__id"), col("__n"), posexplode(col("__ts")).as(Seq("__tpos", "__tok")))
    // shingle occurrences: WordNgramsExpr emits one gram per start
    // position (and a single short gram below minTokens — the size guard
    // drops those docs before the explode)
    val sh = docs
      .select(col(idCol).as("__id"), col(textCol).as("__t"),
        graft.functions.text.wordNgrams(col(textCol), 1, distinct = false).as("__ts"))
      .where(size(col("__ts")) >= minTokens)
      .select(col("__id"),
        posexplode(graft.functions.text.wordNgrams(col("__t"), minTokens, distinct = false))
          .as(Seq("__pos", "__g")))
      .select(col("__id"), col("__pos"),
        substring(md5(concat(lit("graft-ss|"), col("__g"))), 1, 30).as("__k"))
    // first-occurrence resolution packs (id, pos) into one long so the
    // groupBy stays a codegen'd HashAggregate — min over a struct (or a
    // padded string) demotes to SortAggregate, a per-partition sort on
    // both sides of the exchange. Bounds: integral ids below ~9e12 and
    // docs under 1e6 tokens, both far beyond any real corpus row.
    def packedOrd(id: Column, pos: Column): Column =
      id.cast("long") * lit(1000000L) + pos
    val first = sh.groupBy(col("__k"))
      .agg(count(lit(1)).as("__c"), min(packedOrd(col("__id"), col("__pos"))).as("__w"))
      .where(col("__c") >= 2)
    val marked = sh.join(first, Seq("__k"))
      .where(packedOrd(col("__id"), col("__pos")) =!= col("__w"))
      .select(col("__id"), col("__pos"))
    // cover the token interval [pos, pos+minTokens); duplicate covers are
    // harmless under left_anti, so no distinct pass is needed
    val covered = marked.select(col("__id"),
      explode(sequence(col("__pos"), col("__pos") + lit(minTokens - 1))).as("__tpos"))
    toks.join(covered, Seq("__id", "__tpos"), "left_anti")
      .groupBy(col("__id"))
      .agg(first_value(col("__n")).as("n_tokens"),
        count(lit(1)).as("n_kept"),
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("__tpos"), col("__tok")))),
            s => s.getField("__tok"))).as("text_dedup"))
      .select(col("__id").as(idCol), col("n_tokens"), col("n_kept"), col("text_dedup"))
  }

  // --------------------------------------------------- boilerplate removal

  /** Per-line quality signals for boilerplate detection (the jusText /
    * trafilatura heuristic family, reduced to deterministic SQL-replicable
    * rules): token count, stopword hits (one-pass TokenSetCountsExpr —
    * the HOF filter∘isin form is interpreted and re-tokenizes per
    * consumer), link-marker count, and terminal punctuation. `keep` uses
    * integer per-mille thresholds so the decision is exact integer
    * arithmetic — no float-boundary drift between engines.
    *
    * Output per line: (idCol, n_lines, pos, line, n_words, stop_hits,
    * n_links, terminal_punct, keep). Pure narrow pipeline: split →
    * explode → codegen'd projections, zero shuffle.
    */
  def lineSignals(docs: DataFrame, textCol: String, idCol: String,
      sep: String = "\n", minWords: Int = 3, minStopPermille: Int = 0,
      maxLinkPermille: Int = 1000, requireTerminalPunct: Boolean = false,
      stopwords: Seq[String] = TextAnalysis.DefaultStopwords): DataFrame = {
    val sepRe = java.util.regex.Pattern.quote(sep)
    val lines = docs
      .select(col(idCol).as("__id"), split(col(textCol), sepRe).as("__ls"))
      .select(col("__id"), size(col("__ls")).cast("long").as("n_lines"), col("__ls"))
      .select(col("__id"), col("n_lines"),
        posexplode(col("__ls")).as(Seq("pos", "line")))
    val keepRule = col("n_words") >= minWords &&
      col("stop_hits") * 1000L >= lit(minStopPermille.toLong) * col("n_words") &&
      col("n_links") * 1000L <= lit(maxLinkPermille.toLong) * col("n_words") &&
      (if (requireTerminalPunct) col("terminal_punct") else lit(true))
    lines
      .select(col("__id"), col("n_lines"), col("pos"), col("line"),
        graft.functions.text.tokenSetCounts(col("line"), Seq(stopwords),
          Seq("stop"), "none").as("__ts"),
        regexp_count(col("line"), lit("(?:^| )(?:https?://|www\\.)"))
          .cast("long").as("n_links"),
        col("line").rlike("[.!?]$").as("terminal_punct"))
      .select(col("__id").as(idCol), col("n_lines"), col("pos"), col("line"),
        col("__ts.n_tokens").as("n_words"),
        col("__ts.counts").getItem(0).as("stop_hits"),
        col("n_links"), col("terminal_punct"))
      .withColumn("keep", keepRule)
  }

  /** Remove boilerplate lines and reassemble documents: lines failing the
    * [[lineSignals]] `keep` rule are dropped; survivors rejoin in original
    * order. Documents with no content lines left disappear entirely.
    * Output: (idCol, n_lines, n_kept, text_clean).
    */
  def removeBoilerplate(docs: DataFrame, textCol: String, idCol: String,
      sep: String = "\n", minWords: Int = 3, minStopPermille: Int = 0,
      maxLinkPermille: Int = 1000, requireTerminalPunct: Boolean = false,
      stopwords: Seq[String] = TextAnalysis.DefaultStopwords): DataFrame =
    lineSignals(docs, textCol, idCol, sep, minWords, minStopPermille,
      maxLinkPermille, requireTerminalPunct, stopwords)
      .where(col("keep"))
      .groupBy(col(idCol))
      .agg(first_value(col("n_lines")).as("n_lines"),
        count(lit(1)).as("n_kept"),
        concat_ws(sep,
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line"))).as("text_clean"))

  // --------------------------------------------------- chunking

  /** Split documents into fixed-size token chunks with overlap — the
    * training-sequence preparation step (context-window sizing). Output:
    * (idCol, chunk_idx, chunk, n_chunk_tokens), chunk_idx 0-based in
    * document order. A narrow generator stage: the chunks array
    * materializes below the posexplode (see the generator-trap notes) and
    * nothing shuffles.
    */
  def chunkByTokens(docs: DataFrame, textCol: String, idCol: String,
      size: Int, overlap: Int = 0): DataFrame =
    docs.select(col(idCol),
        graft.functions.text.wordChunks(col(textCol), size, overlap).as("__chunks"))
      .select(col(idCol), posexplode(col("__chunks")).as(Seq("chunk_idx", "chunk")))
      // chunks are single-space joined by construction, so a plain split
      // counts tokens exactly (codegen'd, no re-tokenization pass)
      .select(col(idCol), col("chunk_idx"), col("chunk"),
        org.apache.spark.sql.functions.size(split(col("chunk"), " ", -1))
          .cast("long").as("n_chunk_tokens"))

  /** Pack variable-length training sequences into fixed token-budget
    * context windows (greedy next-fit), distributed: rows are hashed into
    * `nGroups` pack groups, each group is packed independently in one pass
    * (PackBinsExpr), and the output assigns every input row a
    * (pack_group, bin_idx, bin_off) slot. Bins never exceed `budget`
    * unless a single sequence alone does (it then gets a bin of its own).
    *
    * Deliberately METADATA-ONLY: the collect/pack stage moves key columns
    * and a length — never the sequence text. Join the assignment back to
    * the payload on `keyCols` afterwards; that join is the caller's one
    * text shuffle and co-partitions with any downstream by-bin grouping.
    *
    * Scale shape (100 TB): one shuffle keyed by pack_group. Each group
    * packs sequentially (packing is inherently order-dependent), so
    * `nGroups` is the parallelism AND the per-group memory bound — size it
    * so corpusRows/nGroups stays in the low millions (a group holds ids +
    * lengths only, ~few dozen bytes/row). Group assignment is the portable
    * hash, so the layout is reproducible across engines and retries.
    *
    * Output: keyCols ++ (n_tokens, pack_group, bin_idx, bin_off), one row
    * per input row; packing order within a group is lexicographic on
    * keyCols, so the whole layout is deterministic.
    */
  def packSequences(df: DataFrame, lenCol: String, keyCols: Seq[String],
      budget: Int, nGroups: Int, seed: String = "graft"): DataFrame = {
    require(keyCols.nonEmpty && budget >= 1 && nGroups >= 1,
      "need key columns, budget >= 1, nGroups >= 1")
    val item = struct(keyCols.map(col) :+ col(lenCol).cast("long").as("__len"): _*)
    val grouped = df
      .select(pmod(portableHash31(concat_ws("|", keyCols.map(col): _*), seed),
          lit(nGroups.toLong)).as("pack_group"),
        item.as("__item"))
      .groupBy(col("pack_group"))
      .agg(array_sort(collect_list(col("__item"))).as("__items"))
    // lengths + assignments materialize as attributes BELOW the explode
    // (sibling-of-generator expressions are re-evaluated per output row)
    grouped
      .select(col("pack_group"), col("__items"),
        graft.functions.text.packBins(
          transform(col("__items"), x => x.getField("__len")), budget.toLong).as("__bins"))
      .select(col("pack_group"),
        explode(arrays_zip(col("__items"), col("__bins"))).as("__z"))
      .select(Seq(col("pack_group")) ++
        keyCols.map(k => col(s"__z.__items.$k").as(k)) ++ Seq(
        col("__z.__items.__len").as("n_tokens"),
        col("__z.__bins.bin").as("bin_idx"),
        col("__z.__bins.off").as("bin_off")): _*)
  }

  // --------------------------------------------------- quality filtering

  /** One-pass curation statistics (see CurationStatsExpr): word count, mean
    * word length, stopword hits, alphabetic-word fraction, and duplicate-
    * line ratios over `lineLen`-token lines.
    */
  def curationStats(text: Column, lineLen: Int = 20,
      stopwords: Seq[String] = TextAnalysis.DefaultStopwords): Column =
    graft.functions.text.curationStats(text, lineLen, stopwords)

  /** Gopher-style document quality filter (Rae et al. 2021 §A1.1): emit
    * every signal plus the conjunction `keep`. Thresholds are parameters —
    * corpus curation is threshold tuning, so the signals stay in the output
    * for re-filtering without recompute.
    */
  def qualityFilter(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      minStopwordHits: Int = 2,
      minAlphaWordFrac: Double = 0.8,
      maxDupLineFrac: Double = 0.3,
      maxDupLineCharFrac: Double = 0.3,
      maxDup2gramFrac: Double = 1.0,
      maxDup3gramFrac: Double = 1.0,
      lineLen: Int = 20
  ): DataFrame =
    docs.select(col(idCol), curationStats(col(textCol), lineLen).as("q"))
      .select(col(idCol),
        col("q.n_words").as("n_words"),
        col("q.mean_word_len").as("mean_word_len"),
        col("q.stop_hits").as("stop_hits"),
        col("q.frac_alpha").as("frac_alpha"),
        col("q.n_lines").as("n_lines"),
        col("q.dup_line_frac").as("dup_line_frac"),
        col("q.dup_char_frac").as("dup_char_frac"),
        col("q.dup_2gram_frac").as("dup_2gram_frac"),
        col("q.dup_3gram_frac").as("dup_3gram_frac"),
        qualityKeep(col("q"), minWords, maxWords, minMeanWordLen, maxMeanWordLen,
          minStopwordHits, minAlphaWordFrac, maxDupLineFrac, maxDupLineCharFrac,
          maxDup2gramFrac, maxDup3gramFrac).as("keep"))

  /** Context-budget truncation: keep the first `maxTokens` whitespace
    * tokens of each document, single-space rejoined — the hard-cap
    * companion to [[chunkByTokens]] (chunking keeps everything in
    * pieces; trimming keeps one budgeted head — embedding inputs,
    * prompt-context fields, preview columns). Whitespace normalizes to
    * single spaces as a side effect (the [[graft.ops.TextAnalysis.normalizeText]]
    * family convention: token CONTENT is preserved, layout is not).
    * Tokens are `split(trim, \s+)` — the corpus-wide tokenization rule.
    * Boundary divergence, by design: EMPTY text reports n_tokens = 1
    * (split of "" yields one empty token, and text_trim round-trips the
    * empty string), whereas [[graft.ops.TextAnalysis.wsTokenCount]]
    * guards empty to 0 — counting callers should use wsTokenCount;
    * this op's n_tokens exists to make n_kept/truncated self-consistent.
    *
    * Pure scan-stage projection (split, slice, rejoin): zero shuffle,
    * runs at scan speed at any corpus size. Output: (idCol, n_tokens,
    * n_kept, truncated, text_trim).
    */
  def trimToTokens(docs: DataFrame, textCol: String, idCol: String,
      maxTokens: Int): DataFrame = {
    require(maxTokens >= 1, "maxTokens must be >= 1")
    docs
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("__tk"))
      .select(col(idCol),
        size(col("__tk")).cast("long").as("n_tokens"),
        least(size(col("__tk")).cast("long"), lit(maxTokens.toLong)).as("n_kept"),
        (size(col("__tk")) > maxTokens).as("truncated"),
        array_join(slice(col("__tk"), 1, maxTokens), " ").as("text_trim"))
  }

  /** Filter-funnel attribution: apply named keep-rules IN ORDER and
    * report, per rule, how many documents it killed among the survivors
    * of every earlier rule — the curation debugging artifact behind every
    * "where did my corpus go?" question (a pipeline that drops 60% wants
    * to know WHICH rule, at which stage, before anyone re-tunes
    * thresholds). First-failing-rule attribution: a document failing
    * rules 2 and 4 counts against rule 2 only, so killed counts sum to
    * exactly (input − survivors) with no double counting — the funnel
    * reads top to bottom like the pipeline runs.
    *
    * A NULL rule result is a FAIL (three-valued logic would silently
    * attribute null-field docs to no rule at all).
    *
    * Scale shape: ONE scan, one partial-aggregated conditional-sum row —
    * NOT n sequential filter+count passes (n rules over 100 TB must not
    * mean n jobs); the rules-sized explode and cumulative window run on a
    * one-row frame. Output: (stage, rule, n_in, n_killed, n_out,
    * killed_permille), stage in application order.
    */
  def filterFunnel(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val names = rules.map(_._1)
    require(names.distinct.size == names.size, "rule names must be unique")
    val pass = rules.map { case (_, c) => coalesce(c, lit(false)) }
    val kills = rules.indices.map { i =>
      val prev = pass.take(i).foldLeft(lit(true))(_ && _)
      sum(when(prev && !pass(i), lit(1L)).otherwise(lit(0L))).as(s"__k$i")
    }
    val aggRow = df.agg(count(lit(1)).as("__n"), kills: _*)
    val stages = aggRow.select(col("__n"),
      posexplode(array(rules.indices.map(i =>
        struct(lit(names(i)).as("rule"), col(s"__k$i").as("killed"))): _*))
        .as(Seq("stage0", "rs")))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("stage0")).rowsBetween(Long.MinValue, -1)
    stages.select(
      (col("stage0") + 1).cast("long").as("stage"),
      col("rs.rule").as("rule"),
      (col("__n") - coalesce(sum(col("rs.killed")).over(w), lit(0L))).as("n_in"),
      col("rs.killed").as("n_killed"))
      .withColumn("n_out", col("n_in") - col("n_killed"))
      .withColumn("killed_permille", when(col("n_in") > 0,
        call_function("div", col("n_killed") * lit(1000L), col("n_in")))
        .otherwise(lit(0L)))
  }

  /** The quality-filter conjunction over a [[curationStats]] struct —
    * shared by [[qualityFilter]] and the composed pipeline so thresholds
    * have a single definition.
    */
  private[ops] def qualityKeep(q: Column,
      minWords: Int, maxWords: Int,
      minMeanWordLen: Double, maxMeanWordLen: Double,
      minStopwordHits: Int, minAlphaWordFrac: Double,
      maxDupLineFrac: Double, maxDupLineCharFrac: Double,
      maxDup2gramFrac: Double, maxDup3gramFrac: Double): Column =
    q.getField("n_words") >= minWords && q.getField("n_words") <= maxWords &&
      q.getField("mean_word_len") >= minMeanWordLen &&
      q.getField("mean_word_len") <= maxMeanWordLen &&
      q.getField("stop_hits") >= minStopwordHits &&
      q.getField("frac_alpha") >= minAlphaWordFrac &&
      q.getField("dup_line_frac") <= maxDupLineFrac &&
      q.getField("dup_char_frac") <= maxDupLineCharFrac &&
      q.getField("dup_2gram_frac") <= maxDup2gramFrac &&
      q.getField("dup_3gram_frac") <= maxDup3gramFrac

  /** The Gopher repetition-signal family CurationStatsExpr does not carry
    * (Rae et al. 2021 §A1.1 table A1): top-n-gram character fractions
    * (n = 2..4 — all occurrences of the single most frequent word n-gram,
    * ties to the byte-order-smallest gram) and duplicate-n-gram character
    * fractions (n = 5..10 — occurrences beyond the first). One row per
    * document: `(idCol, top_2gram, top_2gram_frac, ..., dup_10gram_frac)`.
    * Pure projection (one single-pass expression), zero shuffle — at
    * 100 TB this runs at scan speed alongside the other per-doc signals.
    * Denominator convention is total n-gram characters for that n, same
    * as the sibling dup_2/3gram signals (Gopher normalizes by document
    * characters — monotonically related; one convention family-wide).
    */
  def repetitionStats(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol),
        graft.functions.text.repetitionStats(col(textCol)).as("r"))
      .select(col(idCol) +: repetitionFields.map(f => col(s"r.$f").as(f)): _*)

  private[ops] val repetitionFields: Seq[String] =
    (2 to 4).flatMap(n => Seq(s"top_${n}gram", s"top_${n}gram_frac")) ++
      (5 to 10).map(n => s"dup_${n}gram_frac")

  /** [[repetitionStats]] plus the Gopher keep conjunction. Default
    * thresholds are Gopher's published table A1 values (top 0.20/0.18/0.16,
    * dup 0.15 down to 0.10); signals stay in the output so re-filtering is
    * a predicate, not a recompute.
    */
  def repetitionFilter(docs: DataFrame, textCol: String, idCol: String,
      maxTopFracs: Seq[Double] = Seq(0.20, 0.18, 0.16),
      maxDupFracs: Seq[Double] = Seq(0.15, 0.14, 0.13, 0.12, 0.11, 0.10)): DataFrame = {
    require(maxTopFracs.length == 3 && maxDupFracs.length == 6,
      "thresholds cover n=2..4 (top) and n=5..10 (dup)")
    val keep = (2 to 4).map(n => col(s"top_${n}gram_frac") <= maxTopFracs(n - 2))
      .reduce(_ && _) &&
      (5 to 10).map(n => col(s"dup_${n}gram_frac") <= maxDupFracs(n - 5)).reduce(_ && _)
    repetitionStats(docs, textCol, idCol).withColumn("keep", keep)
  }

  // ------------------------------------- importance resampling (DSIR)

  /** Sparse hashed n-gram (n = 1..2) feature counts per document — the
    * DSIR feature map (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling").
    */
  def dsirFeatures(text: Column, buckets: Int = 4096, portable: Boolean = false): Column =
    graft.functions.text.hashedNgramCounts(text, buckets, maxN = 2, portable)

  /** Global per-bucket gram totals for a corpus — the sufficient statistic
    * of the DSIR bag-of-grams model. One aggregation; the result is
    * `buckets` longs of driver metadata (like IVF centroids), reusable
    * across scoring runs — train once on the (small) target set and a raw
    * sample, then score any number of corpora without re-aggregating.
    */
  def dsirBucketTotals(df: DataFrame, textCol: String, buckets: Int = 4096,
      portable: Boolean = false): Array[Long] = {
    // features materialize as an attribute BELOW the explode: as the
    // generator child the tokenize+hash pass would be re-inlined into the
    // isnotnull/size guards InferFiltersFromGenerate adds (2 extra evals)
    val rows = df.select(dsirFeatures(col(textCol), buckets, portable).as("__f"))
      .select(explode(col("__f")).as("f"))
      .groupBy(col("f.bucket").as("bucket"))
      .agg(sum(col("f.c")).as("c"))
      .collect()
    val arr = new Array[Long](buckets)
    rows.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** DSIR importance scores: log( p̂_target(doc) / p̂_raw(doc) ) under
    * add-one-smoothed hashed bag-of-grams models, plus the exact integer
    * evidence counts behind it. Output per raw document:
    * (idCol, n_feats, t_hits, r_hits, score_micronats, logw) where
    * t_hits/r_hits are the inner products of the doc's feature counts with
    * the target/raw global bucket totals (exact integers — the
    * cross-engine-verifiable core) and score_micronats is
    * Σ_b c_b·round(1e6·(ln p_b − ln q_b)) — integer arithmetic over
    * driver-computed λ, so the score is bit-stable across partitions,
    * retries, and replays (a float dot would be summation-order-dependent).
    * logw = score_micronats / 1e6.
    *
    * Scale shape: training is two bounded aggregations (target is small by
    * definition; pass `rawTotals` from a sample or a previous run to avoid
    * re-scanning the raw corpus — the standard DSIR setup fits q̂ on a
    * fraction). Scoring is a pure map-side projection: zero shuffle at any
    * corpus size. Resample downstream with [[stratifiedSample]]-style
    * hash thresholds or top-k on logw.
    */
  def dsirScores(raw: DataFrame, target: DataFrame, textCol: String, idCol: String,
      buckets: Int = 4096, portable: Boolean = false,
      targetTotals: Option[Array[Long]] = None,
      rawTotals: Option[Array[Long]] = None): DataFrame = {
    val t = targetTotals.getOrElse(dsirBucketTotals(target, textCol, buckets, portable))
    val r = rawTotals.getOrElse(dsirBucketTotals(raw, textCol, buckets, portable))
    require(t.length == buckets && r.length == buckets,
      "precomputed totals must have one entry per bucket")
    val tTot = t.sum.toDouble + buckets
    val rTot = r.sum.toDouble + buckets
    val lambda = Array.tabulate(buckets) { b =>
      math.round(1e6 * (math.log((t(b) + 1.0) / tTot) - math.log((r(b) + 1.0) / rTot)))
    }
    raw.select(col(idCol),
        graft.functions.text.dsirDot(
          dsirFeatures(col(textCol), buckets, portable), t, r, lambda).as("__d"))
      .select(col(idCol),
        col("__d.n_feats").as("n_feats"),
        col("__d.t_hits").as("t_hits"),
        col("__d.r_hits").as("r_hits"),
        col("__d.score_micronats").as("score_micronats"),
        (col("__d.score_micronats") / 1e6).as("logw"))
  }

  /** DSIR selection step: Gumbel top-k sampling without replacement over
    * the importance weights — sampling k documents with probability
    * proportional to softmax(logw / temperature) is exactly taking the k
    * largest logw/T + Gumbel(0,1) keys (Gumbel-max trick). The noise is
    * derived from the portable id hash, so the selected set is a pure
    * deterministic function of (corpus, seed): reproducible resamples,
    * re-runnable on any engine that agrees on the hash (the ln calls keep
    * the KEYS engine-local, which is why the oracle gates [[dsirScores]]'s
    * integer layer instead — selection is property-gated in CurationSpec).
    *
    * temperature → 0 degenerates to deterministic top-k by logw;
    * temperature = 1 is the paper's sampled variant. Scale: key synthesis
    * is a zero-shuffle projection; top-k is TakeOrderedAndProject
    * (per-partition heaps, no global sort), k bounded by driver memory —
    * for billion-row selections, threshold on the key instead.
    */
  def dsirResample(scored: DataFrame, idCol: String, k: Int,
      temperature: Double = 1.0, seed: String = "graft-dsir"): DataFrame = {
    require(k >= 1 && temperature >= 0.0, "need k >= 1 and temperature >= 0")
    // u in (0,1): (h+1)/(P+1) with h uniform on [0, P-1]; never 0 or 1, so
    // both ln calls are finite
    val u = (portableHash31(col(idCol), seed) + lit(1.0)) / lit(2147483648.0)
    val gumbel = -log(-log(u))
    val key =
      if (temperature == 0.0) col("logw")
      else col("logw") / lit(temperature) + gumbel
    scored.withColumn("__key", key)
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
      .drop("__key")
  }

  /** Per-group form of [[dsirResample]]: the Gumbel-top-k weighted
    * selection with a quota of `k` PER GROUP (language, source) instead
    * of one global budget — importance-weighted selection that cannot
    * let one dominant stratum starve the rest (the global form follows
    * the weights wherever they mass; this form pins the mix). Same
    * scored input (`logw`), same temperature and seeded-Gumbel
    * semantics, so per-group results are reproducible across engines
    * and reruns. Plan shape: one rank window PER GROUP (never a global
    * sort/limit), so it scales with groups × k where the global form's
    * TakeOrdered is driver-bounded by k alone.
    */
  def dsirResampleByGroup(scored: DataFrame, idCol: String,
      groupCols: Seq[String], k: Int, temperature: Double = 1.0,
      seed: String = "graft-dsir"): DataFrame = {
    require(k >= 1 && temperature >= 0.0, "need k >= 1 and temperature >= 0")
    require(groupCols.nonEmpty, "groupCols must be non-empty — use dsirResample for a global budget")
    val u = (portableHash31(col(idCol), seed) + lit(1.0)) / lit(2147483648.0)
    val gumbel = -log(-log(u))
    val key =
      if (temperature == 0.0) col("logw")
      else col("logw") / lit(temperature) + gumbel
    scored.withColumn("__key", key)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(groupCols.map(col): _*)
          .orderBy(col("__key").desc, col(idCol))))
      .where(col("__rk") <= k)
      .drop("__key", "__rk")
  }

  // --------------------------------------------------- sampling / mixing

  /** Portable 31-bit hash of (seed|value) — identical to the SQL form
    * `('0x' || substr(md5(seed || '|' || CAST(v AS VARCHAR)), 1, 8))::UBIGINT
    * & 2147483647`, so sampling decisions are reproducible by any engine.
    */
  def portableHash31(v: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed + "|"), v.cast("string"))), 1, 8), 16, 10)
      .cast("long").bitwiseAND(lit(2147483647L))

  /** Deterministic per-stratum rate sampling for training-mix construction:
    * keep a row iff hash(id) mod 1000 < the stratum's per-mille rate.
    * Pure predicate — no shuffle, no RNG state, stable under retries and
    * recomputation (Spark `sample()` is neither portable nor per-stratum).
    * Rates are integer per-mille to keep the threshold compare exact across
    * engines (no float rounding at the boundary).
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      permille: Map[String, Int], defaultPermille: Int = 1000,
      seed: String = "graft"): DataFrame = {
    require((permille.values ++ Seq(defaultPermille)).forall(r => r >= 0 && r <= 1000),
      "per-mille rates must be in [0, 1000]")
    val rate = permille.foldLeft(lit(defaultPermille)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.where(pmod(portableHash31(col(idCol), seed), lit(1000L)) < rate)
  }

  /** Deterministic train/validation/test split assignment: each row gets
    * the label of the per-mille band its portable id-hash falls into
    * (cumulative thresholds in `bands` order; bands must sum to ≤ 1000 and
    * any remainder falls into the last band). Pure projection — zero
    * shuffle, no RNG state, stable across engines/retries/backfills, and
    * document-level (content dedup upstream keeps near-dups from
    * straddling the train/test boundary).
    */
  def assignSplit(df: DataFrame, idCol: String,
      bands: Seq[(String, Int)] = Seq("train" -> 800, "val" -> 100, "test" -> 100),
      seed: String = "graft-split"): DataFrame = {
    require(bands.nonEmpty && bands.forall(_._2 >= 0) && bands.map(_._2).sum <= 1000,
      "band per-milles must be non-negative and sum to <= 1000")
    val hv = pmod(portableHash31(col(idCol), seed), lit(1000L))
    val cum = bands.scanLeft(0)(_ + _._2).tail
    val expr = bands.init.zip(cum.init).foldRight(lit(bands.last._1): Column) {
      case (((label, _), hi), acc) => when(hv < hi, lit(label)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Leakage-free split assignment: band by the NEAR-DUP CLUSTER id
    * instead of the document id, so a cluster of near-duplicates can
    * never straddle train/test — the failure mode [[assignSplit]]'s
    * scaladoc warns about made structurally impossible instead of
    * procedurally avoided (id-banding after dedup still leaks when
    * dedup kept several members, e.g. [[Dedup.keepBest]] retention or a
    * threshold looser than "identical"). `clusters` is any (id,
    * cluster_id) assignment ([[Dedup.clusterAssignments]], SemDeDup
    * cells); unclustered docs (absent from `clusters`) band by their own
    * id — identical to [[assignSplit]] for singletons, so the two
    * operators agree wherever no clustering applies. One key join
    * against the assignment table; the hash/band arithmetic is the same
    * portable chain, so the oracle replays it.
    */
  def assignSplitByCluster(df: DataFrame, idCol: String, clusters: DataFrame,
      bands: Seq[(String, Int)] = Seq("train" -> 800, "val" -> 100, "test" -> 100),
      seed: String = "graft-split"): DataFrame = {
    require(bands.nonEmpty && bands.forall(_._2 >= 0) && bands.map(_._2).sum <= 1000,
      "band per-milles must be non-negative and sum to <= 1000")
    val withCluster = df.join(
      clusters.select(col("id").as(idCol), col("cluster_id").as("__cl")),
      Seq(idCol), "left")
    val hv = pmod(portableHash31(coalesce(col("__cl"), col(idCol)), seed), lit(1000L))
    val cum = bands.scanLeft(0)(_ + _._2).tail
    val expr = bands.init.zip(cum.init).foldRight(lit(bands.last._1): Column) {
      case (((label, _), hi), acc) => when(hv < hi, lit(label)).otherwise(acc)
    }
    withCluster.withColumn("split", expr).drop("__cl")
  }

  /** Deterministic global shuffle for training order: every row gets a
    * dense 0-based `shuffle_pos` equal to its rank under
    * `(portableHash31(seed-e<epoch> | id), id)` — a reproducible random
    * permutation of the corpus that any engine can replay (the DuckDB
    * oracle is one `row_number() OVER (ORDER BY hv, id)`), changes
    * completely between epochs, and never touches an RNG (stable under
    * task retries and backfills, unlike `orderBy(rand())`).
    *
    * Scale shape — TeraSort-style two-level ranking, because a global
    * `row_number()` window is a single-partition scale-killer: rows are
    * range-bucketed by the hash's high bits (`buckets` contiguous hash
    * ranges, so bucket order IS hash order), per-bucket counts (a
    * `buckets`-row aggregate, driver metadata like the IVF centroids)
    * prefix-sum into bucket offsets, and the final position is
    * offset(bucket) + rank-within-bucket — the window partitions by
    * bucket, never globally. The hash is uniform on [0, 2^31), so bucket
    * sizes concentrate at n/buckets; raise `buckets` until a bucket fits
    * an executor (1024 buckets at 100 TB ≈ 100 GB ranges of ROW IDS, i.e.
    * tiny (id, hash) pairs — size by row count, not payload).
    */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int = 0,
      seed: String = "graft-shuffle", buckets: Int = 1024): DataFrame = {
    require(epoch >= 0, "epoch must be >= 0")
    require(buckets >= 1, "buckets must be >= 1")
    val p = 2147483647L
    val width = p / buckets + 1 // ceil over the hash domain: bucket ids in [0, buckets)
    val hv = portableHash31(col(idCol), s"$seed-e$epoch")
    val withB = df.withColumn("__hv", hv)
      .withColumn("__bk", (col("__hv") / lit(width)).cast("int"))
    // per-bucket counts: a <= `buckets`-row frame; the prefix sum runs on
    // that metadata-sized frame (single-partition window over <= `buckets`
    // rows is fine — it never sees row data)
    val offsets = withB.groupBy(col("__bk")).agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(
          Window.orderBy(col("__bk")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__bk"), col("__off"))
    val ranked = withB.withColumn("__rk",
      row_number().over(
        Window.partitionBy(col("__bk")).orderBy(col("__hv"), col(idCol))))
    ranked.join(broadcast(offsets), "__bk")
      .withColumn("shuffle_pos", col("__off") + col("__rk") - 1)
      .drop("__hv", "__bk", "__rk", "__off")
  }

  /** Solve the per-stratum sampling rates that realize a target training
    * mix: given desired output fractions per stratum (by `weightCol`, e.g.
    * a token count) and optionally a total output budget, return the
    * per-mille rates to feed [[stratifiedSample]].
    *
    * With no budget the mix is scaled to the largest feasible size — the
    * stratum that binds first (availableWeight / targetFraction smallest)
    * samples at 1000‰ and everything else downsamples proportionally.
    * The per-stratum availability aggregate collects one row per stratum
    * (driver metadata, like IVF centroids), never row data.
    */
  def mixRates(df: DataFrame, stratumCol: String, weightCol: String,
      targetFractions: Map[String, Double],
      totalBudget: Option[Double] = None): Map[String, Int] = {
    require(targetFractions.nonEmpty && targetFractions.values.forall(_ >= 0) &&
      math.abs(targetFractions.values.sum - 1.0) < 1e-9,
      "target fractions must be non-negative and sum to 1")
    val avail: Map[String, Double] = df.groupBy(col(stratumCol))
      .agg(sum(col(weightCol)).as("w")).collect()
      .map(r => r.getString(0) -> r.getAs[Number]("w").doubleValue()).toMap
    val feasible = targetFractions.collect {
      case (s, f) if f > 0 => avail.getOrElse(s, 0.0) / f
    }
    val budgetMax = if (feasible.isEmpty) 0.0 else feasible.min
    val budget = totalBudget.fold(budgetMax)(math.min(_, budgetMax))
    targetFractions.map { case (s, f) =>
      val w = avail.getOrElse(s, 0.0)
      s -> (if (w <= 0 || f <= 0) 0
            else math.round(math.min(1.0, f * budget / w) * 1000).toInt)
    }
  }

  /** Temperature-smoothed target fractions (the multilingual-sampling
    * convention, e.g. multilingual BERT / XLM-R: p_s ∝ w_s^alpha): derive
    * the `targetFractions` input of [[mixRates]] from the corpus's own
    * per-stratum weights instead of hand-writing them. `alpha = 1`
    * reproduces the natural distribution, `alpha = 0` is uniform, and the
    * usual 0.2–0.7 range up-samples tail strata without letting the head
    * dominate. Driver-side arithmetic over one aggregation row per
    * stratum; compose as
    * `mixRates(df, s, w, temperatureFractions(df, s, w, alpha))`.
    */
  def temperatureFractions(df: DataFrame, stratumCol: String, weightCol: String,
      alpha: Double): Map[String, Double] = {
    require(alpha >= 0 && alpha <= 1, "alpha must be in [0, 1]")
    val w = df.groupBy(col(stratumCol)).agg(sum(col(weightCol)).as("w")).collect()
      .map(r => r.getString(0) -> r.getAs[Number]("w").doubleValue())
      .filter(_._2 > 0)
    require(w.nonEmpty, "no strata with positive weight")
    val powed = w.map { case (s, v) => s -> math.pow(v, alpha) }
    val z = powed.map(_._2).sum
    // deterministic: fix the iteration order before the normalizing sums
    powed.sortBy(_._1).map { case (s, v) => s -> v / z }.toMap
  }

  /** Epoch/repeat plan for a token-budgeted training mix: given one row
    * per stratum with its available (unique) token count and an integer
    * target mix in permille of the budget, compute per stratum
    *
    *   - `target_tokens`  = budget × permille div 1000
    *   - `epochs_milli`   = passes over the stratum required to supply
    *                        them (thousandths), capped at
    *                        `maxEpochsMilli` — the data-repetition budget
    *                        (≈4 epochs of repeats is the usual
    *                        near-lossless ceiling, after which repeated
    *                        data stops helping)
    *   - `planned_tokens` = tokens × epochs_milli div 1000
    *   - `shortfall`      = target − planned (what the repetition cap
    *                        refuses to cover; ≥ 0 by construction)
    *   - `achieved_permille` of the realized mix
    *
    * Strata absent from `targetPermille` plan zero (reported, not
    * dropped) — the audit row for "data we have but don't train on".
    * All-integer arithmetic, so the ns_epoch_plan oracle replays the
    * whole plan; compose upstream with [[temperatureFractions]] /
    * [[mixRates]] to derive the target mix itself.
    *
    * Scale: the frame is strata-sized (bounded by construction); the
    * target map rides the plan as a literal and the realized total joins
    * back as a one-row broadcast — no driver action anywhere.
    */
  def epochPlan(stats: DataFrame, stratumCol: String, tokensCol: String,
      targetPermille: Map[String, Int], budgetTokens: Long,
      maxEpochsMilli: Long = 4000L): DataFrame = {
    require(targetPermille.values.forall(_ >= 0) && targetPermille.values.sum <= 1000,
      "target permille must be non-negative and sum to <= 1000")
    require(budgetTokens >= 0 && maxEpochsMilli >= 0, "budget and epoch cap must be >= 0")
    val targetMap = map(targetPermille.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v.toLong)) }: _*)
    def idiv(a: Column, b: Column): Column = call_function("div", a, b)
    val planned = stats.select(
        col(stratumCol), col(tokensCol).cast("long").as("tokens"),
        coalesce(element_at(targetMap, col(stratumCol)), lit(0L)).as("permille"))
      .withColumn("target_tokens", idiv(lit(budgetTokens) * col("permille"), lit(1000L)))
      .withColumn("epochs_milli", least(
        when(col("tokens") > 0, idiv(col("target_tokens") * 1000L, col("tokens")))
          .otherwise(lit(0L)),
        lit(maxEpochsMilli)))
      .withColumn("planned_tokens", idiv(col("tokens") * col("epochs_milli"), lit(1000L)))
      .withColumn("shortfall", col("target_tokens") - col("planned_tokens"))
    val total = planned.agg(sum(col("planned_tokens")).as("__total"))
    planned.crossJoin(broadcast(total))
      .withColumn("achieved_permille",
        when(col("__total") > 0, idiv(col("planned_tokens") * 1000L, col("__total")))
          .otherwise(lit(0L)))
      .drop("__total")
  }

  /** Effective-token value of a repetition plan — the datablations-style
    * audit (Muennighoff et al. 2023, "Scaling Data-Constrained Language
    * Models": repeated epochs are worth roughly a constant fraction of
    * fresh data, decaying geometrically and to ~zero past ~4 epochs) for
    * an [[epochPlan]] output: per stratum, how many FRESH-equivalent
    * tokens the planned repetition actually buys. epochs_milli = E full
    * epochs + a fractional pass; epoch e is valued at decay^e, so
    *   effective = tokens · (Σ_{e<E} d^e + frac·d^E)   (all milli units)
    * with each power computed by the STAGED integer fold
    * p ← (p·d) div 1000 — deterministic rounding both engines replay
    * (for d = 500 the stages are exact halvings, so the fold equals
    * 1000 div 2^e in closed form — the gate's oracle uses that identity).
    * value_permille compares effective to RAW repeated tokens: how much
    * of the repetition budget is heat.
    *
    * Scale shape: row-local arithmetic over the strata-sized plan frame
    * (an array fold of ≤ 64 steps per row); the only DECIMAL(38,0) op is
    * the final tokens × factor product. epochs_milli beyond 64000 raises
    * (64 epochs is far past the regime where repetition carries any
    * value — and the exactness budget). Output: stratumCol + (tokens,
    * epochs_milli, effective_tokens, raw_tokens, value_permille).
    */
  def repeatedEpochValue(plan: DataFrame, stratumCol: String, tokensCol: String,
      epochsMilliCol: String, decayPermille: Long = 500L): DataFrame = {
    require(decayPermille >= 0 && decayPermille <= 1000,
      "decayPermille must be in [0, 1000]")
    val dec = "decimal(38,0)"
    def idiv(a: Column, b: Column): Column = call_function("div", a, b)
    val em = when(col(epochsMilliCol) >= 0 && col(epochsMilliCol) <= 64000L,
      col(epochsMilliCol).cast("long"))
      .otherwise(raise_error(concat(lit("repeatedEpochValue: epochs_milli for "),
        col(stratumCol).cast("string"),
        lit(" outside [0, 64000] - repetition past 64 epochs has no value to measure"))))
    // tokens guard mirrors waterfillPlan's 1e15 budget; value_permille's
    // effective·1000 multiply runs in DECIMAL(38,0) below (effective can
    // reach tokens·64 ≈ 6.4e16 at decay→1000, so ·1000 would wrap long)
    val tok = when(col(tokensCol) >= 0 && col(tokensCol) <= 1000000000000000L,
      col(tokensCol).cast("long"))
      .otherwise(raise_error(concat(lit("repeatedEpochValue: tokens for "),
        col(stratumCol).cast("string"),
        lit(" outside [0, 1e15] - the integer-exactness budget"))))
    val base = plan.select(col(stratumCol),
      tok.as("tokens"), em.as("epochs_milli"))
      .withColumn("__e", idiv(col("epochs_milli"), lit(1000L)))
      .withColumn("__frac", col("epochs_milli") - lit(1000L) * col("__e"))
      .withColumn("__fold", aggregate(
        when(col("__e") >= 1, sequence(lit(1L), col("__e")))
          .otherwise(array().cast("array<bigint>")),
        struct(lit(0L).as("s"), lit(1000L).as("p")),
        (acc, _) => struct(
          (acc.getField("s") + acc.getField("p")).as("s"),
          idiv(acc.getField("p") * decayPermille, lit(1000L)).as("p"))))
      .withColumn("__factor",
        col("__fold.s") + idiv(col("__frac") * col("__fold.p"), lit(1000L)))
    base.select(col(stratumCol), col("tokens"), col("epochs_milli"),
      idiv(col("tokens").cast(dec) * col("__factor"), lit(1000L).cast(dec))
        .cast("long").as("effective_tokens"),
      idiv(col("tokens").cast(dec) * col("epochs_milli"), lit(1000L).cast(dec))
        .cast("long").as("raw_tokens"))
      .withColumn("value_permille",
        when(col("raw_tokens") > 0,
          idiv(col("effective_tokens").cast(dec) * lit(1000L).cast("decimal(4,0)"),
            col("raw_tokens").cast(dec)))
          .otherwise(lit(null).cast("long")))
  }

  /** Split-leakage audit — the inspection half of [[assignSplitByCluster]]
    * (which PREVENTS leakage at assignment time; this AUDITS a split you
    * already have): per grouping key (dedup cluster, registrable domain,
    * author — whatever unit must not straddle train/eval), how many
    * splits its rows landed in. A key with n_splits > 1 leaks: its
    * near-duplicate or same-source rows sit on both sides of the
    * train/test fence and inflate eval. min/max split names the offending
    * pair without exploding the row.
    *
    * A NULL split is a DISTINCT assignment state, not an ignorable one:
    * a cluster half in 'train' and half unassigned is exactly the
    * leak-in-waiting this audit exists to surface (the unassigned rows
    * may be exported to eval later), so NULL counts toward n_splits and
    * flips `leaking` alongside any named split. first/last_split stay
    * the min/max of the NAMED splits (NULL has no order).
    *
    * One partial-aggregable groupBy keyed by the audit key (distinct
    * splits per key is bounded by the split count, so the agg state is
    * tiny); output is KEY-sized. Output: (keyCol, n_splits, n_rows,
    * first_split, last_split, leaking).
    */
  def splitLeakageAudit(df: DataFrame, keyCol: String, splitCol: String): DataFrame =
    df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(
        (countDistinct(col(splitCol)) +
          max(when(col(splitCol).isNull, 1L).otherwise(0L))).as("n_splits"),
        count(lit(1)).as("n_rows"),
        min(col(splitCol)).as("first_split"),
        max(col(splitCol)).as("last_split"))
      .withColumn("leaking", col("n_splits") > 1)

  /** Deterministic per-stratum quota: the `quota` rows with the smallest
    * portable hash per stratum (id tie-break) — an exact, reproducible
    * "take N per domain" for training-mix recipes. Exact top-N-per-group
    * sorts each stratum; at corpus scale pre-thin with [[stratifiedSample]]
    * at ~2× the expected rate first, then apply the quota to the survivors.
    */
  def stratifiedQuota(df: DataFrame, idCol: String, stratumCol: String, quota: Int,
      seed: String = "graft"): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(portableHash31(col(idCol), seed), col(idCol))
    // rank under a collision-proof temp name so a caller's own column
    // can't be silently overwritten and dropped
    val rk = s"__graft_quota_rk_${java.util.UUID.randomUUID().toString.take(8)}"
    df.withColumn(rk, row_number().over(w))
      .where(col(rk) <= quota)
      .drop(rk)
  }

  /** Per-group percentile rank of `scoreCol` as an integer per-mille
    * (`(rank - 1) * 1000 div (n - 1)`, ranks by score asc with `idCol`
    * breaking ties): the rank-based calibration that makes raw quality /
    * LM scores comparable ACROSS domains before a global threshold or mix
    * is applied (a 0.8 classifier score means different things in code vs
    * prose; permille 800 means the same thing everywhere). Singleton
    * groups get permille 0. Output: input columns + `outCol`.
    *
    * Scale: one window sort per group — the same shape (and the same
    * skewed-group caveat) as [[keepTopFraction]]'s exact tier; for
    * cardinality-skewed corpora compute a sketch-quantile bucket instead
    * ([[keepTopFractionApprox]]'s GK machinery generalizes).
    */
  def percentileRank(df: DataFrame, scoreCol: String, idCol: String,
      groupCols: Seq[String], outCol: String = "permille"): DataFrame = {
    require(groupCols.nonEmpty,
      "groupCols must be non-empty (a global rank is a single-partition sort; bucket globally with keepTopFractionApprox instead)")
    require(!df.columns.contains(outCol), s"output column $outCol collides with input")
    val part = groupCols.map(col)
    val rk = row_number()
      .over(Window.partitionBy(part: _*).orderBy(col(scoreCol).asc, col(idCol).asc))
      .cast("long")
    val n = count(lit(1)).over(Window.partitionBy(part: _*))
    df.withColumn(outCol,
      call_function("div", (rk - 1L) * 1000L, greatest(n - 1L, lit(1L))).cast("int"))
  }

  /** Per-group top-fraction keep, exact tier: retain the best
    * `keepPermille`‰ of each group by `scoreCol` (descending, `idCol`
    * tie-break) — the CCNet/quality-threshold shape "keep the top X% per
    * language", but per-group and deterministic. A row survives iff
    * `rank * 1000 <= group_size * keepPermille` (pure integer predicate:
    * floor semantics, exactly replayable by any engine; groups smaller
    * than 1000/keepPermille keep nothing). One exchange: the rank and the
    * group count share the same hash partitioning. At corpus scale prefer
    * [[keepTopFractionApprox]], which never sorts the corpus.
    */
  def keepTopFraction(df: DataFrame, scoreCol: String, groupCols: Seq[String],
      keepPermille: Int, idCol: String): DataFrame = {
    require(keepPermille >= 0 && keepPermille <= 1000,
      "keepPermille must be in [0, 1000]")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val part = groupCols.map(col)
    val ranked = Window.partitionBy(part: _*)
      .orderBy(col(scoreCol).desc, col(idCol))
    val whole = Window.partitionBy(part: _*)
    val rk = s"__graft_topfrac_rk_${java.util.UUID.randomUUID().toString.take(8)}"
    val n = s"__graft_topfrac_n_${java.util.UUID.randomUUID().toString.take(8)}"
    // row_number is int — the rank*1000 product must widen to long or it
    // overflows on groups past ~2.1M rows
    df.withColumn(rk, row_number().over(ranked).cast("long"))
      .withColumn(n, count(lit(1)).over(whole))
      .where(col(rk) * 1000 <= col(n) * keepPermille)
      .drop(rk, n)
  }

  /** Per-group top-fraction keep, sketch tier: per-group score threshold
    * from a mergeable approx-percentile sketch (partial-agg, one tiny row
    * per group), broadcast back, rows kept by a scan-stage
    * `score >= threshold` compare. No window, no corpus sort — the 100 TB
    * path. Boundary rows within the sketch's rank error of the true
    * threshold may differ from [[keepTopFraction]] (and score ties all
    * pass, where the exact tier cuts by id); the containment law relating
    * the tiers at ±`accuracy` rank error is test-gated. Rows with a NULL
    * group column are dropped here (equi-join semantics) where the exact
    * tier treats NULL as its own group — normalize nulls upstream if that
    * distinction matters.
    */
  def keepTopFractionApprox(df: DataFrame, scoreCol: String,
      groupCols: Seq[String], keepPermille: Int,
      accuracy: Int = 10000): DataFrame = {
    require(keepPermille >= 0 && keepPermille <= 1000,
      "keepPermille must be in [0, 1000]")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    if (keepPermille == 0) return df.where(lit(false))
    val thrName = s"__graft_topfrac_thr_${java.util.UUID.randomUUID().toString.take(8)}"
    val thresholds = df.groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(col(scoreCol), lit(1.0 - keepPermille / 1000.0),
        lit(accuracy)).as(thrName))
    df.join(broadcast(thresholds), groupCols)
      .where(col(scoreCol) >= col(thrName))
      .select(df.columns.map(col): _*) // the join key-first reorder is an artifact
  }

  /** Quantile alignment: map every row's score onto a REFERENCE corpus's
    * score distribution — the rank-preserving recalibration for merging
    * corpora scored by DIFFERENT classifiers (per-language quality
    * models, two vintage scorers): a document at the 37th percentile of
    * its group gets the reference's 37th-percentile score, so one
    * threshold means one thing across every source. Histogram matching /
    * quantile normalization, per group.
    *
    * Exact, engine-free semantics: within each group, rank r by
    * (score asc, id asc) over group size n maps to reference rank
    * ceil(r·m/n) = (r·m + n − 1) div n of the m reference rows sorted
    * ascending — rank-to-rank integer arithmetic, no percentile floats.
    * The aligned value is a MEMBER of the reference's score multiset
    * (selection, never interpolation), so float scores replay exactly
    * too: no arithmetic ever touches the score value. Reference ties:
    * any tie order selects the same VALUE, so the output is total-order
    * independent.
    *
    * Scale shape: the group rank+count share one hash partitioning
    * (the [[keepTopFraction]] exchange); the reference ranking is a
    * TWO-LEVEL bucket-offset rank (the [[vocabCoverage]] /
    * [[epochShuffle]] pattern): range-bucket the reference on the score,
    * per-bucket `row_number` partitioned by bucket, plus broadcast bucket
    * offsets prefix-summed on the driver from the collected ≤
    * `refBuckets`-row count frame (the same single read also supplies the
    * reference total and the empty-reference guard) — no
    * global single-partition sort, so the reference can be corpus-sized,
    * though a uniform ~10⁶-row sample of the target distribution is
    * still all a quantile curve needs. Rank ties across any bucket order
    * select the same VALUE (equal scores land in one range bucket), so
    * the output stays total-order independent. The alignment itself is
    * an equi-join on the computed reference rank.
    *
    * Output: groupCols + (idCol, scoreCol, pct_permille, aligned_score).
    */
  def alignScores(df: DataFrame, scoreCol: String, idCol: String,
      groupCols: Seq[String], ref: DataFrame, refScoreCol: String,
      refBuckets: Int = 64): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(refBuckets >= 1, "refBuckets must be >= 1")
    val part = groupCols.map(col)
    val ranked = Window.partitionBy(part: _*)
      .orderBy(col(scoreCol), col(idCol))
    val whole = Window.partitionBy(part: _*)
    // range partitions follow the rank order, so global rank = bucket
    // offset (a broadcast ≤ refBuckets-row prefix sum) + rank within the
    // bucket; equal scores share a range bucket, so every tie order
    // computes the same (__align_idx → __align_rv) mapping
    val rvRanged = ref.select(col(refScoreCol).as("__align_rv"))
      .repartitionByRange(refBuckets, col("__align_rv"))
      .withColumn("__align_bk", spark_partition_id())
    // ONE aggregate evaluation of the bucketed reference yields the
    // per-bucket counts (≤ refBuckets rows); the bucket offsets (prefix
    // sum), the reference total m, and the empty-ref guard all derive on
    // the driver from that single collect — no second evaluation of the
    // offsets aggregate inside the final plan (the single-read rule) and
    // no separate ref.count() scan. A nondeterministic reference
    // (sample() without a seed) is unsupported here, as for all range
    // partitioning: the boundary-sampling pass alone re-evaluates it.
    // An empty reference must raise eagerly: lazily it would compute
    // __align_idx = 0 for every row and the inner join below would
    // silently emit an EMPTY frame (AQE empty-relation propagation prunes
    // any lazy raise_error guard before it evaluates).
    val bucketCounts = rvRanged.groupBy(col("__align_bk"))
      .agg(count(lit(1)).as("__align_bn"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val m = bucketCounts.map(_._2).sum
    require(m > 0, "alignScores: reference corpus is empty — nothing to align to")
    var running = 0L
    val offsetRows = bucketCounts.map { case (bk, n) =>
      val off = running; running += n; (bk, off)
    }.toSeq
    val sparkS = df.sparkSession
    import sparkS.implicits._
    val rvOffsets = offsetRows.toDF("__align_bk", "__align_off")
    val refRanked = rvRanged
      .withColumn("__align_pr", row_number().over(
        Window.partitionBy(col("__align_bk")).orderBy(col("__align_rv")))
        .cast("long"))
      .join(broadcast(rvOffsets), "__align_bk")
      .withColumn("__align_idx", col("__align_off") + col("__align_pr"))
      .select(col("__align_idx"), col("__align_rv"))
    df.select((groupCols :+ idCol :+ scoreCol).map(col): _*)
      .withColumn("__align_r", row_number().over(ranked).cast("long"))
      .withColumn("__align_n", count(lit(1)).over(whole))
      .withColumn("__align_idx", call_function("div",
        col("__align_r") * lit(m) + col("__align_n") - 1,
        col("__align_n")))
      .withColumn("pct_permille", call_function("div",
        col("__align_r") * 1000, col("__align_n")))
      .join(refRanked, "__align_idx")
      .select((groupCols :+ idCol :+ scoreCol).map(col) :+
        col("pct_permille") :+ col("__align_rv").as("aligned_score"): _*)
  }

  // ------------------------------------------------- release governance

  /** Deterministic canary insertion — the training-data governance tool
    * behind memorization audits (the "secret sharer" methodology, Carlini
    * et al. 2019, reduced to its data-side half): plant unique, easily
    * greppable marker tokens into a hash-selected `ratePermille` slice of
    * the corpus BEFORE training, then measure how often they resurface in
    * model generations with [[canaryRecall]] — the canary recall curve is
    * the standard memorization dial. Everything derives from the portable
    * id hash (selection, the canary token, and its insertion position),
    * so re-running the pipeline replants byte-identical canaries: no RNG,
    * no state, retry-stable — the same contract as [[stratifiedSample]].
    *
    * ROW-LOCAL (registered under the RowLocal batch==stream law): one
    * token splice per selected row; unselected rows pass their text
    * through VERBATIM (no whitespace normalization — the corpus must not
    * change where no canary lands). Canary shape: `prefix-<62-bit hash>`
    * (two independent 31-bit portable hashes combined), whitespace-free
    * by construction; distinct per document up to the birthday budget
    * (~0.4% chance of any collision at 2·10⁸ planted canaries). NULL
    * text rows pass through unselected (no splice target exists).
    * Output: (idCol, text_out, has_canary, canary [null when unselected]).
    */
  def insertCanaries(docs: DataFrame, textCol: String, idCol: String,
      ratePermille: Int, prefix: String = "GRAFT-CANARY",
      seed: String = "graft-canary"): DataFrame = {
    require(ratePermille >= 0 && ratePermille <= 1000,
      "ratePermille must be in [0, 1000]")
    require(prefix.nonEmpty && !prefix.exists(_.isWhitespace),
      "prefix must be a non-empty whitespace-free token")
    // NULL text can take no splice: such rows pass through unselected
    // (has_canary=false) rather than claiming a canary that was never
    // planted — a phantom canary would permanently deflate recall
    val selected = col(textCol).isNotNull &&
      pmod(portableHash31(col(idCol), s"$seed-select"), lit(1000L)) <
        ratePermille.toLong
    // 62-bit token (two independent 31-bit hashes): collision budget —
    // at 2·10⁸ planted canaries the chance of ANY pair colliding is
    // ~0.4% (birthday over 2⁶²); the 31-bit form collided at ~65k docs
    val canary = concat(lit(prefix + "-"),
      (portableHash31(col(idCol), s"$seed-token") * lit(2147483648L) +
        portableHash31(col(idCol), s"$seed-token2")).cast("string"))
    val toks = split(trim(col(textCol)), "\\s+")
    val n = when(length(trim(col(textCol))) === 0, lit(0)).otherwise(size(toks))
    val p = pmod(portableHash31(col(idCol), s"$seed-pos"), (n + 1).cast("long"))
      .cast("int")
    val spliced = concat(slice(toks, lit(1), p), array(canary),
      slice(toks, p + 1, n - p))
    docs.select(col(idCol),
      when(selected, array_join(spliced, " ")).otherwise(col(textCol))
        .as("text_out"),
      selected.as("has_canary"),
      when(selected, canary).as("canary"))
  }

  /** Canary recall report — the measurement half of [[insertCanaries]]:
    * given a generations/output corpus and the planted canary table,
    * count how often each canary resurfaces. Detection is a regexp token
    * extraction (`prefix-digits`) exploded and counted, then a keyed left
    * join back onto the canary table — never a contains-scan of outputs
    * per canary (that would be |canaries| passes over the generations; at
    * a 10⁹-generation audit the extraction form is one pass and the join
    * carries only actual matches). Output per canary: (canary, n_hits,
    * found) — aggregate recall is `avg(found)` downstream; per-canary rows
    * keep the which-documents-leak question answerable.
    */
  def canaryRecall(outputs: DataFrame, textCol: String, canaries: DataFrame,
      canaryCol: String, prefix: String = "GRAFT-CANARY"): DataFrame = {
    require(prefix.nonEmpty && !prefix.exists(_.isWhitespace),
      "prefix must be a non-empty whitespace-free token")
    val pat = java.util.regex.Pattern.quote(prefix) + "-[0-9]+"
    val hits = outputs
      .select(explode(regexp_extract_all(col(textCol), lit(pat), lit(0)))
        .as("canary"))
      .groupBy("canary").agg(count(lit(1)).as("n_hits"))
    canaries.select(col(canaryCol).as("canary"))
      .where(col("canary").isNotNull).distinct()
      .join(hits, Seq("canary"), "left")
      .select(col("canary"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("found"))
  }

  /** k-anonymity audit over quasi-identifier columns (Sweeney 2002): every
    * equivalence class (distinct quasi-identifier combination) smaller
    * than `k`, with its size — the re-identification risk check before
    * releasing a metadata-rich dataset (a class of 1 on (zip, age-band,
    * source) points at ONE person even with names stripped). NULL
    * quasi-values form their own class (null is itself identifying).
    * One partial-aggregated groupBy; output is classes, never rows.
    * Output: quasiCols + (class_size), ascending risk order = smallest
    * classes first after an orderBy downstream.
    */
  /** SFT dialog hygiene audit over a conversation column
    * (`array<struct<role: string, content: string>>`): the structural
    * checks every instruction-tuning pipeline runs before packing
    * transcripts into training sequences — turn count, who opens/closes,
    * role alternation, empty turns, and leaked special/template tokens
    * (`<|...|>` markers by default; pass the corpus's own artifact pattern
    * for others). Counts, not verdicts: acceptance thresholds differ per
    * recipe (single-turn completion data legitimately "fails" alternation),
    * and the counts feed [[filterFunnel]] as named kill reasons.
    *
    * One narrow projection per dialog row — the array HOFs (zip_with over
    * the off-by-one slices for repeats, filter for empties/specials)
    * evaluate per row with no shuffle, so the audit runs at scan speed and
    * composes with the pack/chunk stages that follow. Dialogs are audited
    * as stored; null message arrays are the caller's schema bug, not
    * silently zeroed.
    *
    * Output: (id, n_turns, first_role, last_role, n_role_repeats
    * [consecutive same-role pairs], n_empty [whitespace-only contents],
    * n_special [messages containing the artifact pattern]).
    */
  def dialogAudit(df: DataFrame, idCol: String, msgsCol: String,
      specialPattern: String = "<\\|[A-Za-z_]+\\|>"): DataFrame = {
    val m = col(msgsCol)
    val pairLen = greatest(size(m) - 1, lit(0))
    val repeats = zip_with(slice(m, lit(1), pairLen), slice(m, lit(2), pairLen),
      (a, b) => (a.getField("role") === b.getField("role")).cast("long"))
    df.select(col(idCol),
      size(m).cast("long").as("n_turns"),
      try_element_at(m, lit(1)).getField("role").as("first_role"),
      try_element_at(m, lit(-1)).getField("role").as("last_role"),
      coalesce(aggregate(repeats, lit(0L), (acc, x) => acc + x), lit(0L))
        .as("n_role_repeats"),
      size(filter(m, x => trim(x.getField("content")) === ""))
        .cast("long").as("n_empty"),
      size(filter(m, x => x.getField("content").rlike(specialPattern)))
        .cast("long").as("n_special"))
  }

  /** [[redactPii]] applied inside every turn of a dialog column
    * (`array<struct<role, content>>`): roles and turn order pass through
    * untouched, each content goes through the same 4-pattern regexp chain
    * as the flat-text form — one per-row projection, the [[dialogAudit]]
    * convention. SFT transcripts leak PII in user turns specifically
    * (people paste their own emails/numbers at the model), so redaction
    * must run before packing, at the turn level, not on a flattened blob
    * whose role boundaries a later parser has to re-guess.
    */
  def redactDialog(msgs: Column): Column =
    transform(msgs, m => struct(m.getField("role").as("role"),
      redactPii(m.getField("content")).as("content")))

  /** Deterministic word dropout for denoising-objective data prep (the
    * corruption half of a T5/BART-style pipeline): drop each whitespace
    * token with probability `dropPermille`/1000, decided by the portable
    * hash of (doc id, token position) — NO RNG, so the corrupted corpus is
    * identical under retries, recomputation, and engine replay (the
    * [[stratifiedSample]] determinism contract, applied per token). Seed
    * variation produces independent corruption draws of the same corpus.
    *
    * One indexed array-HOF filter per row (Spark's 0-based lambda index;
    * the oracle uses DuckDB's 1-based and subtracts) — zero shuffle,
    * scan-stage. Output: (id, text [kept tokens rejoined with single
    * spaces — whitespace shape is NOT preserved, this feeds a tokenizer,
    * not a renderer], n_tokens, n_kept).
    */
  def wordDropout(df: DataFrame, idCol: String, textCol: String,
      dropPermille: Int, seed: String = "graft-dropout"): DataFrame = {
    require(dropPermille >= 0 && dropPermille <= 1000,
      "dropPermille must be in [0, 1000]")
    val toks = when(length(trim(col(textCol))) === 0,
      array().cast("array<string>"))
      .otherwise(split(trim(col(textCol)), "\\s+"))
    val kept = filter(toks, (_, i) =>
      pmod(portableHash31(
        concat(col(idCol).cast("string"), lit(":"), i.cast("string")), seed),
        lit(1000L)) >= dropPermille)
    // stage the filtered array through ONE column (round-11): `kept`
    // referenced twice re-ran the per-token hash filter twice per row —
    // the spanCorrupt staging discipline
    df.withColumn("__kept", kept)
      .select(col(idCol),
        array_join(col("__kept"), " ").as("text"),
        size(toks).cast("long").as("n_tokens"),
        size(col("__kept")).cast("long").as("n_kept"))
  }

  /** Greedy selection under a token budget: per group, take documents in
    * (score desc, id asc) order while the RUNNING token total stays
    * within `tokenBudget` — the "best data that fits" selection every
    * budgeted training run makes after scoring ([[keepTopFraction]] cuts
    * by fraction of documents; budgets are in TOKENS, and a fraction cut
    * can blow a token budget 10× when length correlates with score).
    * STRICT-PREFIX by contract: selection stops at the first document
    * that would overflow — later shorter documents are NOT back-filled.
    * That forgoes a little budget utilization but keeps the plan one
    * slim rank-window pass (skip-and-refill is a sequential fold whose
    * distributed form collects group-sized state — the wrong trade at
    * corpus scale, and the refill set it adds is exactly the
    * lowest-scoring tail the budget cut exists to drop).
    *
    * One window exchange keyed by group carrying (id, score, tokens)
    * only — document payloads never shuffle; join selected ids back to
    * fetch text. Output: (group cols…, id, score, n_tokens, cum_tokens
    * [running total INCLUDING this doc], selected [1/0]).
    */
  def selectByTokenBudget(df: DataFrame, groupCols: Seq[String],
      idCol: String, scoreCol: String, tokensCol: String,
      tokenBudget: Long): DataFrame = {
    require(tokenBudget >= 0, "tokenBudget must be >= 0")
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*)
      .orderBy(col(scoreCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(g :+ col(idCol) :+ col(scoreCol) :+
        col(tokensCol).cast("long").as("n_tokens"): _*)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("selected", (col("cum_tokens") <= tokenBudget).cast("int"))
  }

  /** Preference-pair hygiene audit for RLHF/DPO datasets: the structural
    * checks run before a (prompt, chosen, rejected) triple enters
    * preference training — identical sides (the gradient is zero and the
    * pair is pure noise), empty sides, and degenerate length imbalance
    * (a 20:1 length ratio usually means the "preference" is just length;
    * reward models famously overfit it). Counts and flags, not verdicts —
    * thresholds are recipe-specific and the columns feed [[filterFunnel]]
    * as named kill reasons.
    *
    * One scan-stage projection: (id, identical [chosen == rejected
    * byte-equal], chosen_empty, rejected_empty, n_tokens_chosen,
    * n_tokens_rejected, len_ratio_permille [1000·shorter div longer,
    * 1000 when both empty]).
    */
  def preferencePairAudit(df: DataFrame, idCol: String, chosenCol: String,
      rejectedCol: String): DataFrame = {
    def tokCount(c: Column): Column =
      when(length(trim(c)) === 0, lit(0L))
        .otherwise(size(split(trim(c), "\\s+")).cast("long"))
    val nc = tokCount(col(chosenCol))
    val nr = tokCount(col(rejectedCol))
    val shorter = least(nc, nr)
    val longer = greatest(nc, nr)
    df.select(col(idCol),
      (col(chosenCol) === col(rejectedCol)).cast("int").as("identical"),
      (nc === 0L).cast("int").as("chosen_empty"),
      (nr === 0L).cast("int").as("rejected_empty"),
      nc.as("n_tokens_chosen"),
      nr.as("n_tokens_rejected"),
      when(longer === 0L, lit(1000L))
        .otherwise(call_function("div", shorter * 1000L, longer))
        .as("len_ratio_permille"))
  }

  /** Mine preference pairs from scored completions — the RLHF/DPO data
    * construction step downstream of [[preferencePairAudit]] (which checks
    * pairs you already HAVE; this builds them): per prompt, the
    * highest-scored completion becomes `chosen` and the lowest `rejected`,
    * emitted only when the score gap clears `minGap` (a pair whose margin
    * is inside scorer noise teaches the reward model nothing — standard
    * practice is to drop it). Deterministic argmax/argmin: score ties
    * break toward the SMALLEST completion id on both sides (ids must be
    * numeric — the [[decontaminateEmbedding]] id contract), so the pair
    * set replays bit-for-bit. Prompts with a single completion, or where
    * best == worst after tie-breaks, emit nothing.
    *
    * ONE partial-aggregable groupBy (two max(struct) aggregates), no
    * window sort, no join — per-prompt state is two structs regardless of
    * completions per prompt, so a 10⁹-prompt corpus shuffles one row per
    * prompt. Output: (promptCol, chosen_id, rejected_id, chosen_score,
    * rejected_score, gap).
    */
  def preferencePairsFromScores(df: DataFrame, promptCol: String,
      idCol: String, scoreCol: String, minGap: Long = 1L): DataFrame = {
    require(minGap >= 1, "minGap must be >= 1 (a zero-gap pair is a coin flip)")
    val best = max(struct(col(scoreCol).as("s"), (-col(idCol)).as("ni")))
    val worst = max(struct((-col(scoreCol)).as("ns"), (-col(idCol)).as("ni")))
    df.where(col(idCol).isNotNull && col(scoreCol).isNotNull)
      .groupBy(col(promptCol))
      .agg(best.as("b"), worst.as("w"))
      .select(col(promptCol),
        (-col("b.ni")).as("chosen_id"), (-col("w.ni")).as("rejected_id"),
        col("b.s").as("chosen_score"), (-col("w.ns")).as("rejected_score"),
        (col("b.s") + col("w.ns")).as("gap"))
      .where(col("gap") >= minGap)
  }

  /** Preference-GRAPH consistency audit — the pairwise-judgment QA that
    * [[preferencePairAudit]] (per-pair hygiene) cannot see: contradictions
    * and intransitivity ACROSS a prompt's judgments. When the same pair is
    * judged both ways, or the majority tournament contains a cycle
    * (a ≻ b ≻ c ≻ a), a Bradley-Terry/DPO objective is being fed
    * label noise — these are the prompts to re-adjudicate or drop.
    *
    * Per prompt, over judgments (winner, loser): unordered pairs get
    * majority direction (strict majority; equal wins = tied, no edge),
    * then directed 3-cycles are enumerated in the majority graph. Each
    * cycle counts ONCE: the join requires the lexicographically smallest
    * node to open the cycle (a 3-cycle has exactly one rotation starting
    * at its minimum), so no post-hoc dedup.
    *
    * Scale shape: everything is keyed by prompt — pair reduction is one
    * partial-aggregated groupBy(prompt, lo, hi); the cycle join is two
    * self-joins on (prompt, node) keys whose volume is Σ_p k_p³ worst
    * case for k_p completions per prompt. k is a sampling knob (best-of-k
    * generation, typically ≤ 64), not a data-sized dimension, so the
    * per-prompt cube is bounded by construction; there is no global hub —
    * a "celebrity" completion exists only inside its own prompt. Output
    * is prompt-sized: (promptCol, n_judgments, n_pairs, n_contradictory,
    * n_tied, n_cycles, consistent).
    */
  /** Shared judgment→pair reduction for the tournament family: drop
    * null/self judgments, canonicalize each pair to (a = least, b =
    * greatest), and partial-aggregate per-direction win counts — ONE
    * definition so [[preferenceConsistency]] and [[copelandScores]] can
    * never diverge on the null/tie/self conventions.
    * Output: (p, a, b, n_ab, n_ba).
    */
  private def pairMajorities(df: DataFrame, promptCol: String,
      winnerCol: String, loserCol: String): (DataFrame, DataFrame) = {
    val judg = df.where(col(winnerCol).isNotNull && col(loserCol).isNotNull &&
        col(winnerCol) =!= col(loserCol))
      .select(col(promptCol).as("p"), col(winnerCol).as("w"), col(loserCol).as("l"))
    val pairs = judg
      .select(col("p"), least(col("w"), col("l")).as("a"),
        greatest(col("w"), col("l")).as("b"),
        (col("w") === least(col("w"), col("l"))).cast("long").as("aw"))
      .groupBy("p", "a", "b")
      .agg(sum(col("aw")).as("n_ab"), sum(lit(1L) - col("aw")).as("n_ba"))
    (judg, pairs)
  }

  def preferenceConsistency(df: DataFrame, promptCol: String,
      winnerCol: String, loserCol: String): DataFrame = {
    val (judg, pairs) = pairMajorities(df, promptCol, winnerCol, loserCol)
    val flagged = pairs.select(col("p"), col("a"), col("b"),
      col("n_ab"), col("n_ba"),
      (col("n_ab") > 0 && col("n_ba") > 0).cast("long").as("contradictory"),
      (col("n_ab") === col("n_ba")).cast("long").as("tied"))
    // strict-majority tournament edges src -> dst ("src beats dst")
    val maj = flagged.where(col("n_ab") =!= col("n_ba"))
      .select(col("p"),
        when(col("n_ab") > col("n_ba"), col("a")).otherwise(col("b")).as("s"),
        when(col("n_ab") > col("n_ba"), col("b")).otherwise(col("a")).as("t"))
    val cycles = maj.select(col("p"), col("s").as("x"), col("t").as("y"))
      .join(maj.select(col("p"), col("s").as("y"), col("t").as("z")), Seq("p", "y"))
      .where(col("x") < col("y") && col("x") < col("z"))
      .join(maj.select(col("p"), col("s").as("z"), col("t").as("x")), Seq("p", "z", "x"))
      .groupBy("p").agg(count(lit(1)).as("n_cycles"))
    val perPrompt = judg.groupBy("p").agg(count(lit(1)).as("n_judgments"))
      .join(flagged.groupBy("p").agg(count(lit(1)).as("n_pairs"),
        sum(col("contradictory")).as("n_contradictory"),
        sum(col("tied")).as("n_tied")), Seq("p"))
      .join(cycles, Seq("p"), "left")
    perPrompt.select(col("p").as(promptCol), col("n_judgments"), col("n_pairs"),
      col("n_contradictory"), col("n_tied"),
      coalesce(col("n_cycles"), lit(0L)).as("n_cycles"),
      (col("n_contradictory") === 0 &&
        coalesce(col("n_cycles"), lit(0L)) === 0).as("consistent"))
  }

  /** Copeland ranking over pairwise judgments: per (prompt, item), wins −
    * losses in the strict-majority tournament, the standard
    * cycle-tolerant way to pick best-of-k from preference data when
    * [[preferenceConsistency]] shows the tournament is not a clean order
    * (argmax-by-score needs scores; Copeland needs only the judgments).
    * Ties (equal wins on a pair) score neither side. `rk` ranks within
    * the prompt by (copeland desc, item asc) — deterministic, so "take
    * rk = 1 as chosen, rk = k as rejected" replays bit-for-bit.
    *
    * Scale shape: one partial-aggregated pair reduction keyed by
    * (prompt, lo, hi), one explode back to per-(prompt, item) rows, one
    * window partitioned BY PROMPT (k rows per partition, never global).
    * Output: (promptCol, item, wins, losses, ties, copeland, rk).
    */
  def copelandScores(df: DataFrame, promptCol: String,
      winnerCol: String, loserCol: String): DataFrame = {
    val (_, pairs) = pairMajorities(df, promptCol, winnerCol, loserCol)
    // per pair, each endpoint gets one (win|loss|tie) outcome row
    val outcomes = pairs.select(col("p"), explode(array(
        struct(col("a").as("item"),
          (col("n_ab") > col("n_ba")).cast("long").as("win"),
          (col("n_ab") < col("n_ba")).cast("long").as("loss"),
          (col("n_ab") === col("n_ba")).cast("long").as("tie")),
        struct(col("b").as("item"),
          (col("n_ba") > col("n_ab")).cast("long").as("win"),
          (col("n_ba") < col("n_ab")).cast("long").as("loss"),
          (col("n_ab") === col("n_ba")).cast("long").as("tie")))).as("o"))
      .select(col("p"), col("o.item").as("item"), col("o.win").as("win"),
        col("o.loss").as("loss"), col("o.tie").as("tie"))
    val scored = outcomes.groupBy("p", "item")
      .agg(sum(col("win")).as("wins"), sum(col("loss")).as("losses"),
        sum(col("tie")).as("ties"))
      .withColumn("copeland", col("wins") - col("losses"))
    scored
      .withColumn("rk", row_number().over(Window.partitionBy(col("p"))
        .orderBy(col("copeland").desc, col("item").asc)).cast("long"))
      .select(col("p").as(promptCol), col("item"), col("wins"), col("losses"),
        col("ties"), col("copeland"), col("rk"))
  }

  /** Bradley-Terry skill fitting over pairwise judgments by
    * minorization-maximization (Hunter 2004) — the STRENGTH estimate the
    * win-count rankings ([[copelandScores]]) cannot give: Copeland says
    * who beats whom; BT says by how much, which is what reward-model
    * data QA, annotator-pool weighting, and leaderboard aggregation
    * actually consume. `iters` MM rounds of
    *
    *   sᵢ ← wᵢ / Σⱼ nᵢⱼ / (sᵢ + sⱼ)
    *
    * in integer micro-units (every item starts at 10⁶; each round
    * max-normalizes the leader back to 10⁶ — the [[graft.ops.Graph.hits]]
    * convention: max-norm needs no square root, preserves ratios, and
    * keeps every intermediate inside integer arithmetic, so the oracle
    * unrolls the rounds bit-for-bit). Items that never win fit to skill
    * 0 (their MM fixed point; the +ε-smoothing variants are caller
    * policy). MM converges monotonically for connected comparison
    * graphs; disconnected components fit independently, which is the
    * right answer (no information orders them).
    *
    * Integer envelope: per-pair game counts ≤ 10⁶ (guarded — beyond that
    * nᵢⱼ·10¹² wraps a long; at 10⁶ games per PAIR you are aggregating a
    * duplicate stream, not judgments); per-item sums carry in
    * DECIMAL(38,0). Division floors compound deterministically, so skills
    * replay exactly in any engine with 128-bit integer division.
    *
    * Scale shape: judgments reduce ONCE, to oriented pair counts
    * (partial-agg; wins, games, and the unordered pair frame all derive
    * from that pair-sized frame); each round is one skill join per pair side + one
    * item-keyed partial-agg sum + a broadcast one-row max — all frames
    * item- or pair-sized, never judgment-sized. Loop discipline
    * (SCALE.md "Iterative operators"): each round references the previous
    * skills TWICE (both pair endpoints) and its own raw frame twice (the
    * max-norm), so skills localCheckpoint per round — a cache would grow
    * the LOGICAL plan ~8× per round and the plan STRING geometrically —
    * with superseded checkpoint blocks released via
    * `bridge.unpersistLocalCheckpoint`. The returned frame is itself a
    * LOCAL CHECKPOINT (materialized inside the call; blocks are
    * ContextCleaner-collected once unreferenced).
    *
    * Output: (item, wins, games, skill_micro), one row per item ever
    * judged. No rank column by design — ordering is `ORDER BY skill_micro
    * DESC, item` at the consumer, which keeps this frame window-free.
    */
  def bradleyTerry(df: DataFrame, winnerCol: String, loserCol: String,
      iters: Int = 4): DataFrame = {
    require(iters >= 1 && iters <= 16, "iters must be in [1, 16]")
    val M = 1000000L
    val dec = "decimal(38,0)"
    def idiv(a: Column, b: Column): Column = call_function("div", a, b)
    val j = df.select(col(winnerCol).cast("long").as("w"),
        col(loserCol).cast("long").as("l"))
      .where(col("w").isNotNull && col("l").isNotNull && col("w") =!= col("l"))
    // the judgment stream reduces ONCE, to ORIENTED pair counts — the
    // pair-sized frame every other input (unordered pairs, wins, games)
    // derives from; a second judgment-sized aggregate would re-evaluate
    // an expensive upstream (scored frame, join) twice
    val oriented = j.groupBy("w", "l").agg(count(lit(1)).as("__nw")).persist()
    val pairs = oriented.select(least(col("w"), col("l")).as("a"),
        greatest(col("w"), col("l")).as("b"), col("__nw"))
      .groupBy("a", "b").agg(sum(col("__nw")).as("n"))
      .withColumn("n", when(col("n") <= 1000000L, col("n"))
        .otherwise(raise_error(concat(lit("bradleyTerry: pair ("),
          col("a").cast("string"), lit(", "), col("b").cast("string"),
          lit(") carries > 1e6 games - outside the integer envelope")))))
      .persist()
    val wins = oriented.groupBy(col("w").as("item")).agg(sum(col("__nw")).as("wins"))
    val games = pairs.select(col("a").as("item"), col("n"))
      .union(pairs.select(col("b").as("item"), col("n")))
      .groupBy("item").agg(sum(col("n")).as("games"))
    val base = games.join(wins, Seq("item"), "left")
      .select(col("item"), coalesce(col("wins"), lit(0L)).as("wins"), col("games"))
      .persist()

    var cur = base.select(col("item"), lit(M).as("s")).localCheckpoint(true)
    for (_ <- 1 to iters) {
      val sa = cur.select(col("item").as("a"), col("s").as("__sa"))
      val sb = cur.select(col("item").as("b"), col("s").as("__sb"))
      // term = n·M² div (sᵢ+sⱼ); both-zero skills contribute nothing
      // (their pair is mutual-zero-win — no mass to exchange)
      val terms = pairs.join(sa, "a").join(sb, "b")
        .select(col("a"), col("b"),
          when(col("__sa") + col("__sb") > 0,
            idiv(col("n") * M * M, col("__sa") + col("__sb")))
            .otherwise(lit(0L)).as("t"))
      val denom = terms.select(col("a").as("item"), col("t"))
        .union(terms.select(col("b").as("item"), col("t")))
        .groupBy("item").agg(sum(col("t").cast(dec)).as("d"))
      // raw persists (cache, not checkpoint: its lineage is one shallow
      // round body over the checkpointed cur) because the max-norm
      // references it twice; the round's eager checkpoint materializes it
      val raw = base.join(denom, Seq("item"), "left")
        .select(col("item"),
          when(coalesce(col("d"), lit(0L).cast(dec)) > 0,
            idiv((col("wins") * M).cast(dec) * lit(M).cast(dec), col("d")))
            .otherwise(lit(0L)).as("r"))
        .persist()
      // broadcast one-row max-norm (never 0 while any judgment exists:
      // some item won, its denominator is positive, its raw is positive)
      val mx = raw.agg(max(col("r")).as("__mx"))
      val next = raw.crossJoin(broadcast(mx))
        .select(col("item"), idiv(col("r") * M, greatest(col("__mx"), lit(1L)))
          .as("s"))
        .localCheckpoint(true)
      raw.unpersist()
      org.apache.spark.sql.graft.bridge.unpersistLocalCheckpoint(cur)
      cur = next
    }
    // checkpoint the RESULT before releasing the final round's blocks —
    // the seedDistance contract (the result must not alias released
    // storage; a cache would stay recomputable-from-lineage into
    // destroyed blocks)
    val out = base.join(cur, "item")
      .select(col("item"), col("wins"), col("games"), col("s").as("skill_micro"))
      .localCheckpoint(true)
    org.apache.spark.sql.graft.bridge.unpersistLocalCheckpoint(cur)
    oriented.unpersist(); pairs.unpersist(); base.unpersist()
    out
  }

  /** Waterfilling token allocation — the mixture planner for the case
    * [[epochPlan]] punts on: you have target WEIGHTS (not a fixed permille
    * per stratum) and some strata cannot supply their proportional share.
    * Proportional-to-weight allocation caps each stratum at its available
    * tokens and redistributes the surplus among uncapped strata, again
    * proportionally — the exact waterfill, computed in closed form rather
    * than by iteration.
    *
    * Closed form: sort strata by avail/weight ascending (the order in
    * which they hit their caps as the water level rises). With inclusive
    * prefix sums A_i, W_i and totals Atot, Wtot, stratum i is capped iff
    *   avail_i · (Wtot − W_i) ≤ weight_i · (budget − A_i)
    * — a predicate monotone along the sort order (the capped set is a
    * prefix). Uncapped strata get floor(weight_i · N / D) with
    * N = budget − Σ_capped avail, D = Wtot − Σ_capped weight. Flooring
    * undershoots the budget by < |uncapped| tokens — allocation never
    * exceeds the budget and never exceeds availability.
    *
    * Exact ordering without a float: the sort key is the DECIMAL
    * quotient (avail·10¹²) / weight. With weights ≤ 10⁶ two DISTINCT
    * ratios a₁/w₁ ≠ a₂/w₂ differ by ≥ 1/(w₁w₂) ≥ 10⁻¹², so the scaled
    * keys differ by ≥ 1 while the decimal division's rounding error is
    * ≤ 5·10⁻⁷ per key — order is preserved exactly, and equal ratios get
    * equal keys (equal ratios cap together, so order between them is
    * immaterial). (Spark's `div` returns BIGINT, which the 10¹²-scaled
    * numerator would overflow — hence decimal division, not integral.)
    * Weights beyond 10⁶ or avail beyond 10¹⁵ raise (the exactness
    * budget — a petatoken per stratum; 100 TB of text is ~2.5·10¹³
    * tokens TOTAL); negative inputs raise; weight-0 strata allocate 0
    * and are reported, not dropped (the [[epochPlan]] convention). All
    * products live in DECIMAL(38,0); outputs are BIGINT.
    *
    * Scale shape: the frame is STRATA-sized (domains/sources — bounded by
    * construction, the epochPlan contract), so the single-partition
    * ordering window is metadata-sized; the capped-set rollup broadcasts
    * back as a one-row crossJoin. Output: (stratumCol, available, weight,
    * allocated, capped, fill_permille).
    */
  def waterfillPlan(stats: DataFrame, stratumCol: String, tokensCol: String,
      weightCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0 && budgetTokens <= 1000000000000000L,
      "budget must be in [0, 1e15] (the integer-exactness budget)")
    val dec = "decimal(38,0)"
    // double-underscore temp names: Spark resolves columns
    // case-insensitively, so e.g. a prefix-sum named "W" would silently
    // REPLACE the weight column "w"
    val base = stats.select(col(stratumCol),
      when(col(tokensCol) >= 0 && col(tokensCol) <= 1000000000000000L,
        col(tokensCol).cast("long"))
        .otherwise(raise_error(concat(lit("waterfillPlan: available tokens for "),
          col(stratumCol).cast("string"),
          lit(" outside [0, 1e15] - the exact-ordering budget")))).as("__avail"),
      when(col(weightCol) >= 0 && col(weightCol) <= 1000000L,
        col(weightCol).cast("long"))
        .otherwise(raise_error(concat(lit("waterfillPlan: weight for "),
          col(stratumCol).cast("string"),
          lit(" outside [0, 1e6] - the exact-ordering budget")))).as("__w"))
    val act = base.where(col("__w") > 0)
      .withColumn("__rk",
        (col("__avail").cast(dec) * lit("1000000000000").cast(dec)) / col("__w"))
    val ord = Window.orderBy(col("__rk"), col(stratumCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(lit(1))
    val withPrefix = act
      .withColumn("__pa", sum(col("__avail")).over(ord).cast(dec))
      .withColumn("__pw", sum(col("__w")).over(ord).cast(dec))
      .withColumn("__wtot", sum(col("__w")).over(tot).cast(dec))
      .withColumn("__capped",
        col("__avail").cast(dec) * (col("__wtot") - col("__pw")) <=
          col("__w").cast(dec) * (lit(budgetTokens).cast(dec) - col("__pa")))
    val level = withPrefix.agg(
      coalesce(sum(when(col("__capped"), col("__avail"))), lit(0L)).cast(dec).as("__ca"),
      coalesce(sum(when(col("__capped"), col("__w"))), lit(0L)).cast(dec).as("__cw"),
      coalesce(max(col("__wtot")), lit(0).cast(dec)).as("__wt"))
    val alloc = withPrefix.crossJoin(broadcast(level))
      .select(col(stratumCol), col("__avail"), col("__w"),
        when(col("__capped"), col("__avail"))
          .otherwise(call_function("div",
            col("__w").cast(dec) * (lit(budgetTokens).cast(dec) - col("__ca")),
            col("__wt") - col("__cw")).cast("long")).as("allocated"),
        col("__capped").as("capped"))
    val zeroW = base.where(col("__w") <= 0)
      .select(col(stratumCol), col("__avail"), col("__w"),
        lit(0L).as("allocated"), lit(false).as("capped"))
    alloc.unionByName(zeroW)
      .select(col(stratumCol), col("__avail").as("available"),
        col("__w").as("weight"), col("allocated"), col("capped"),
        when(col("__avail") > 0,
          call_function("div", col("allocated") * 1000L, col("__avail")))
          .otherwise(lit(0L)).as("fill_permille"))
  }

  /** Exact floor integer square root as pure codegen'd column arithmetic:
    * seed with the IEEE `sqrt` of the value, then one up- and one
    * down-correction against DECIMAL(38,0) squares. Valid for inputs in
    * [0, 10³⁰]: the double representation error is ≤ 2⁻⁵³ relative, so
    * the seeded root is within ±1 of the true floor and the corrections
    * land it exactly — no BigInteger fallback, no codegen break. The
    * same 3-step recipe replays in DuckDB (floor(sqrt) + HUGEINT
    * corrections), so isqrt-derived contracts oracle exactly.
    */
  private[ops] def isqrtExact(x: Column): Column = {
    val dec = "decimal(38,0)"
    val r0 = floor(sqrt(x.cast("double"))).cast("long")
    val up = when(((r0 + 1).cast("decimal(19,0)") * (r0 + 1).cast("decimal(19,0)"))
        .cast(dec) <= x.cast(dec), r0 + 1).otherwise(r0)
    when((up.cast("decimal(19,0)") * up.cast("decimal(19,0)"))
      .cast(dec) > x.cast(dec), up - 1).otherwise(up)
  }

  /** Temperature-scaled mixture weights (the multilingual sampling rule
    * of mC4 [Raffel et al. 2020] and XLM-R [Conneau et al. 2020]):
    * stratum i samples with weight nᵢ^α, α = `alphaQuarters`/4 — α = 1
    * is natural sampling, lower α flattens the mixture toward small
    * strata (the standard fix for head languages drowning the tail).
    * Integer-exact on the quarter-power grid via [[isqrtExact]]:
    * n^(1/2) = isqrt(n), n^(1/4) = isqrt(isqrt(n)), and n^(3/4) is
    * DEFINED as isqrt(n·isqrt(n)) — floors compound deterministically
    * and identically on any engine, which is the contract (the float
    * power it approximates differs by < 1 part in isqrt(n)).
    * target_tokens = budget·wᵢ div Σw is the unconstrained allocation;
    * when strata have hard supply caps, feed the weights into
    * [[waterfillPlan]] instead (its weight guard admits w ≤ 10⁶ — scale
    * shares down first).
    *
    * Guards mirror the planning family: tokens in [0, 10¹⁵] (so n·isqrt(n)
    * ≤ 10²²·⁵ sits inside the isqrt envelope), budget in [0, 10¹⁵].
    * One row-local weight projection + a one-row broadcast total;
    * output is STRATUM-sized: (stratumCol, tokens, weight,
    * share_permille, target_tokens).
    */
  def temperatureMixture(stats: DataFrame, stratumCol: String, tokensCol: String,
      alphaQuarters: Int = 2, budgetTokens: Long = 0L): DataFrame = {
    require(alphaQuarters >= 1 && alphaQuarters <= 4,
      "alphaQuarters must be in [1, 4] (alpha = quarters/4)")
    require(budgetTokens >= 0 && budgetTokens <= 1000000000000000L,
      "budget must be in [0, 1e15] (the integer-exactness budget)")
    val dec = "decimal(38,0)"
    val n = when(col(tokensCol) >= 0 && col(tokensCol) <= 1000000000000000L,
      col(tokensCol).cast("long"))
      .otherwise(raise_error(concat(lit("temperatureMixture: tokens for "),
        col(stratumCol).cast("string"),
        lit(" outside [0, 1e15] - the integer-exactness budget"))))
    val base = stats.select(col(stratumCol), n.as("tokens"))
      .withColumn("__s1", isqrtExact(col("tokens")))
    val w = alphaQuarters match {
      case 1 => isqrtExact(col("__s1"))
      case 2 => col("__s1")
      case 3 => isqrtExact(col("tokens").cast(dec) * col("__s1").cast(dec))
      case 4 => col("tokens")
    }
    val weighted = base.withColumn("__w", w)
    val total = weighted.agg(sum(col("__w").cast(dec)).as("__tot"))
    weighted.crossJoin(broadcast(total))
      .select(col(stratumCol), col("tokens"), col("__w").as("weight"),
        when(col("__tot") > 0,
          call_function("div", col("__w").cast(dec) * lit(1000L).cast("decimal(4,0)"),
            col("__tot"))).otherwise(lit(0L)).as("share_permille"),
        when(col("__tot") > 0,
          call_function("div", col("__w").cast(dec) * lit(budgetTokens).cast(dec),
            col("__tot"))).otherwise(lit(0L)).as("target_tokens"))
  }

  /** Packing-efficiency audit over a packed corpus (the QA report for
    * [[packSequences]]/[[packDialog]] outputs, or any frame carrying a bin
    * assignment): per bin, item count, used tokens, waste against the
    * budget, and integer fill rate. Packing quality is a first-order
    * training-cost lever — 5% padding waste on a 10¹² -token run is
    * 5·10¹⁰ tokens of heat — and this is the artifact that catches a bad
    * budget/length distribution interaction before the GPUs do.
    * Overfull bins (used > budget — only possible when a single item
    * alone exceeds the budget, which the packers permit by design) report
    * negative waste rather than clamping: they are the rows to look at.
    *
    * One partial-aggregated groupBy; output is BIN-sized. Output:
    * binCols ++ (n_items, used_tokens, waste_tokens, fill_permille).
    */
  def packEfficiency(packed: DataFrame, binCols: Seq[String], lenCol: String,
      budget: Long): DataFrame = {
    require(binCols.nonEmpty, "binCols must be non-empty")
    require(budget >= 1, "budget must be >= 1")
    packed.groupBy(binCols.map(col): _*)
      .agg(count(lit(1)).as("n_items"),
        sum(col(lenCol)).cast("long").as("used_tokens"))
      .select(binCols.map(col) ++ Seq(
        col("n_items"), col("used_tokens"),
        (lit(budget) - col("used_tokens")).as("waste_tokens"),
        call_function("div", col("used_tokens") * 1000L, lit(budget))
          .as("fill_permille")): _*)
  }

  /** T5-style span corruption, deterministic: mask contiguous token spans
    * with numbered sentinels and emit the (corrupted, target) pair the
    * denoising objective trains on — `corrupted` keeps unmasked tokens
    * with `<extra_id_k>` where span k was, `target` lists each sentinel
    * followed by the tokens it hides. Span STARTS are per-(doc, position)
    * portable-hash decisions at `startPermille` (the [[wordDropout]]
    * contract: no RNG, replay-identical); spans run `spanLen` tokens and
    * never overlap — a position inside an active span can't start a new
    * one, which is the sequential rule that makes this a FOLD (one
    * array-HOF aggregate over index-tagged tokens, zero shuffle) rather
    * than an independent per-token map.
    *
    * Cost bound: the fold APPENDS to its accumulator arrays, and Catalyst
    * array concat copies — per-doc cost is O(tokens²) in element moves.
    * That is immaterial at the training-document regime (≤ ~10k tokens:
    * tens of millions of moves, microseconds) but wrong for book-length
    * monoliths — run [[chunkByTokens]] FIRST, which the pipeline wants
    * anyway (corruption applies to training-sized pieces, and chunking
    * after corruption would split sentinel/target pairs across chunks).
    *
    * Output: (id, corrupted, target, n_tokens, n_spans).
    */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
      startPermille: Int, spanLen: Int = 3,
      seed: String = "graft-span"): DataFrame = {
    require(startPermille >= 0 && startPermille <= 1000,
      "startPermille must be in [0, 1000]")
    require(spanLen >= 1, "spanLen must be >= 1")
    val toks = when(length(trim(col(textCol))) === 0,
      array().cast("array<string>"))
      .otherwise(split(trim(col(textCol)), "\\s+"))
    val indexed = transform(toks, (t, i) => struct(t.as("t"), i.as("i")))
    val zero = struct(lit(0).as("nf"), lit(0).as("k"),
      array().cast("array<string>").as("corr"),
      array().cast("array<string>").as("tgt"))
    val folded = aggregate(indexed, zero, (st, p) => {
      val t = p.getField("t")
      val i = p.getField("i")
      val inSpan = i < st.getField("nf")
      val opens = !inSpan &&
        pmod(portableHash31(
          concat(col(idCol).cast("string"), lit(":"), i.cast("string")), seed),
          lit(1000L)) < startPermille
      val sentinel = concat(lit("<extra_id_"),
        st.getField("k").cast("string"), lit(">"))
      struct(
        when(opens, i + spanLen).otherwise(st.getField("nf")).as("nf"),
        when(opens, st.getField("k") + 1).otherwise(st.getField("k")).as("k"),
        when(opens, concat(st.getField("corr"), array(sentinel)))
          .otherwise(when(inSpan, st.getField("corr"))
            .otherwise(concat(st.getField("corr"), array(t)))).as("corr"),
        when(opens, concat(st.getField("tgt"), array(sentinel), array(t)))
          .otherwise(when(inSpan, concat(st.getField("tgt"), array(t)))
            .otherwise(st.getField("tgt"))).as("tgt"))
    })
    // stage the fold through ONE column before extracting its three
    // fields (round-11: referencing `folded` directly in three output
    // expressions evaluated the whole per-token fold three times per row
    // — the staged-kernel discipline bleuComponents already follows;
    // cost-aware CollapseProject keeps the non-cheap alias a separate
    // Project, so the fold runs once)
    df.withColumn("__sc", folded)
      .select(col(idCol),
        array_join(col("__sc").getField("corr"), " ").as("corrupted"),
        array_join(col("__sc").getField("tgt"), " ").as("target"),
        size(toks).cast("long").as("n_tokens"),
        col("__sc").getField("k").cast("long").as("n_spans"))
  }

  /** Assemble per-conversation transcript columns from an event-shaped
    * frame: one `array<struct<role, content>>` row per key, turns ordered
    * by `orderCol` (which must be unique per key — it pins the sort inside
    * the collected array, so assembly is deterministic under any shuffle
    * order). THE one grouping exchange of the dialog tier: every
    * downstream dialog op ([[dialogAudit]], [[redactDialog]],
    * [[packDialog]]) is a zero-shuffle projection over this output, so a
    * pipeline assembles once and audits/redacts/packs in the same stage.
    */
  def assembleDialogs(events: DataFrame, keyCol: String, orderCol: String,
      roleCol: String, contentCol: String): DataFrame = {
    val m = struct(col(orderCol).as("__o"), col(roleCol).as("role"),
      col(contentCol).as("content"))
    events
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(m)).as("__m"))
      .select(col(keyCol), transform(col("__m"), x => struct(
        x.getField("role").as("role"),
        x.getField("content").as("content"))).as("msgs"))
  }

  /** Turn-aligned dialog packing: assign each turn of a conversation to a
    * training chunk by greedy first-fit over a whitespace-token budget,
    * WITHOUT ever splitting a turn — the SFT counterpart of
    * [[chunkByTokens]] (which splits flat text mid-stream): a truncated
    * assistant turn teaches truncation, so chunk boundaries must fall
    * between turns. Rule: a turn opens a new chunk iff the running count
    * is nonzero and adding it would exceed `tokenBudget`; an oversized
    * single turn therefore occupies its own chunk rather than vanishing.
    *
    * The fold runs as ONE array-HOF `aggregate` per dialog row (state =
    * (running tokens, chunk idx, per-turn assignment array)) — zero
    * shuffle, scan speed, the [[dialogAudit]] convention — and the result
    * scalarizes to (id, pos, chunk_idx, n_tokens) rows ready to group
    * into packed sequences.
    */
  def packDialog(df: DataFrame, idCol: String, msgsCol: String,
      tokenBudget: Long): DataFrame = {
    require(tokenBudget >= 1, "tokenBudget must be >= 1")
    val toks = transform(col(msgsCol), m => {
      val c = m.getField("content")
      when(length(trim(c)) === 0, lit(0L))
        .otherwise(size(split(trim(c), "\\s+")).cast("long"))
    })
    val zero = struct(lit(0L).as("cum"), lit(0L).as("idx"),
      array().cast("array<bigint>").as("chunks"))
    val folded = aggregate(toks, zero,
      (st, t) => {
        val opens = st.getField("cum") > 0 &&
          st.getField("cum") + t > tokenBudget
        val idx = when(opens, st.getField("idx") + 1L)
          .otherwise(st.getField("idx"))
        struct(
          when(opens, t).otherwise(st.getField("cum") + t).as("cum"),
          idx.as("idx"),
          concat(st.getField("chunks"), array(idx)).as("chunks"))
      })
    df.select(col(idCol), posexplode(
        arrays_zip(folded.getField("chunks").as("c"), toks.as("t")))
        .as(Seq("pos", "z")))
      .select(col(idCol), col("pos"),
        col("z.c").as("chunk_idx"), col("z.t").as("n_tokens"))
  }

  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2, "need quasi columns and k >= 2")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .where(col("class_size") < k)
  }

  /** l-diversity audit (Machanavajjhala et al. 2007), distinct-l form:
    * equivalence classes whose SENSITIVE column carries fewer than `l`
    * distinct values — the attack [[kAnonymityAudit]] cannot see: a class
    * of 50 people is 50-anonymous, but if all 50 share one diagnosis the
    * attribute still discloses. Run it after the k audit passes; classes
    * this audit flags need generalization of the quasi columns or
    * suppression even though they are large enough for k.
    *
    * NULL sensitive values count as one distinct value (null discloses
    * "value withheld", itself an attribute). Exact distinct per class =
    * one two-level partial aggregate (class+value, then class) — same
    * exchange discipline as the k audit; output is classes, never rows.
    * Output: quasiCols + (class_size, sensitive_diversity).
    */
  def lDiversityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty && l >= 2, "need quasi columns and l >= 2")
    require(!quasiCols.contains(sensitiveCol),
      "sensitive column cannot be a quasi-identifier")
    df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__n")).as("class_size"),
        count(lit(1)).as("sensitive_diversity"))
      .where(col("sensitive_diversity") < l)
  }

  /** t-closeness audit (Li et al. 2007), categorical/variational form:
    * equivalence classes whose SENSITIVE-value distribution sits more
    * than `tPermille` total-variation distance from the corpus-global
    * distribution — the skew attack [[lDiversityAudit]] cannot see: a
    * class can carry l distinct diagnoses and still be 98% one rare
    * disease, disclosing it probabilistically. Distance per class c =
    * ½·Σ_v |n_vc/n_c − N_v/N|, reported in integer permille.
    *
    * Exact arithmetic: counts cast to DECIMAL(38,0) before the cross
    * products (n_vc·N spans N² — decimal removes the long-overflow
    * budget entirely), one integral divide at the end:
    * dist = (500·Σ_v |n_vc·N − N_v·n_c|) div (n_c·N). Values ABSENT
    * from a class still contribute N_v·n_c to the sum; rather than
    * materializing the class×value cross product, the absent mass folds
    * in closed form: Σ_absent N_v·n_c = n_c·N − Σ_present N_v·n_c, so
    * only the present (class, value) pairs ever exist as rows. NULL
    * sensitive values are a value (the [[lDiversityAudit]] rule — the
    * global join is null-safe), NULL quasi-values a class.
    *
    * Scale shape: one partial-aggregated groupBy on class+value, a
    * window re-key on the class (nc), a BROADCAST null-safe join of the
    * value-cardinality-sized global table, and a final class-keyed
    * aggregate that reuses the window's partitioning — rows never flow,
    * classes do. Output: quasiCols + (class_size, dist_permille) for
    * breaching classes only.
    */
  def tClosenessAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, tPermille: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need quasi columns")
    require(tPermille >= 0 && tPermille < 1000,
      "tPermille must be in [0, 1000)")
    require(!quasiCols.contains(sensitiveCol),
      "sensitive column cannot be a quasi-identifier")
    val dec = "decimal(38,0)"
    val vc = df
      .groupBy((quasiCols.map(col) :+ col(sensitiveCol).as("__v")): _*)
      .agg(count(lit(1)).cast(dec).as("__nvc"))
    val gv = df.groupBy(col(sensitiveCol).as("__gv"))
      .agg(count(lit(1)).cast(dec).as("__nv"))
    val tot = df.agg(count(lit(1)).cast(dec).as("__N"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(quasiCols.map(col): _*)
    vc.withColumn("__nc", sum(col("__nvc")).over(w))
      .join(broadcast(gv), col("__v") <=> col("__gv"))
      .crossJoin(broadcast(tot))
      .groupBy(quasiCols.map(col): _*)
      .agg(max(col("__nc")).as("__nc2"), max(col("__N")).as("__N2"),
        // present pairs: |n_vc·N − N_v·n_c| minus the N_v·n_c the
        // closed-form absent mass (n_c·N) double-counts
        sum(abs(col("__nvc") * col("__N") - col("__nv") * col("__nc"))
          - col("__nv") * col("__nc")).as("__sp"))
      .select((quasiCols.map(col) :+
        col("__nc2").cast("long").as("class_size") :+
        call_function("div",
          lit(500L) * (col("__sp") + col("__nc2") * col("__N2")),
          col("__nc2") * col("__N2")).as("dist_permille")): _*)
      .where(col("dist_permille") > tPermille)
  }

  /** Enforce k-anonymity by suppression: drop every row whose
    * quasi-identifier class is smaller than `k` (the conservative
    * baseline next to generalization, which is schema-specific and the
    * caller's job — bucket `age` to bands, truncate `zip`, THEN suppress
    * what still violates). The class-size table is one partial aggregate
    * keyed like the data, so the enforcement join co-partitions with it;
    * rows, not classes, are what flow out. Suppression rate is the
    * [[kAnonymityAudit]] class mass over the row count — audit first,
    * generalize until the rate is acceptable, suppress last.
    */
  def suppressToK(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2, "need quasi columns and k >= 2")
    // null-SAFE join keys: a plain equi-join would never match a NULL
    // quasi-value, silently suppressing the whole null class regardless
    // of its size — <=> keeps the audit's nulls-form-a-class semantics
    val sizes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__cs"))
      .where(col("__cs") >= k)
      .select(quasiCols.map(c => col(c).as(s"__q_$c")): _*)
    val cond = quasiCols.map(c => col(c) <=> col(s"__q_$c")).reduce(_ && _)
    df.join(sizes, cond, "left_semi")
  }
}
