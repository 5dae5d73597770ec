package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity joins (record linkage / fuzzy entity matching):
  * find all cross- or self-pairs of short strings within Levenshtein
  * distance `maxDist`, without ever forming the all-pairs product.
  *
  * Candidate generation is PassJoin segment blocking (Li, Deng, Feng 2011;
  * see [[graft.functions.text.PassJoinKeysExpr]] for the pigeonhole
  * argument): equality on (targetLen, segIdx, segText) keys is provably
  * COMPLETE for ed <= maxDist, so the verified output equals the brute-
  * force join — the property the DuckDB all-pairs oracle (ns_fuzzy_join)
  * checks end-to-end. Verification is Spark's codegen'd `levenshtein`.
  *
  * Scale shape: each indexed row emits O((2d+1)^2 (d+1)) short substring
  * keys (75 for d = 2) — the exchange carries keys plus the strings being
  * matched, which this operator assumes are SHORT (names, titles, codes;
  * for document bodies use the MinHash/SimHash family instead). The join
  * is a plain shuffled equi-join on the key triple, so selectivity comes
  * from segment diversity: corpora sharing long constant prefixes (serial
  * numbers, "Customer#...") collapse many rows into one bucket. That
  * degrades toward (but never past) verify-everything; `maxBucket` is the
  * documented skew guard for the tail — finite values trade completeness
  * in oversized buckets for a bounded worst case, exactly like the LSH
  * generators' guard. Blocking operates on UTF-16 code units while the
  * verify distance is code-point based — identical for BMP text; corpora
  * with supplementary-plane characters should normalize first.
  */
object Fuzzy {

  /** All pairs (idA from `left`, idB from `right`) with
    * `levenshtein(textA, textB) <= maxDist`, plus the distance. Null
    * strings and ids never match. Output: (idA, idB, dist), distinct.
    */
  def editDistanceJoin(
      left: DataFrame, leftText: String, leftId: String,
      right: DataFrame, rightText: String, rightId: String,
      maxDist: Int,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val lk = left
      .where(col(leftText).isNotNull && col(leftId).isNotNull)
      .select(col(leftId).as("__lid"), col(leftText).as("__ls"),
        explode(graft.functions.text.passJoinKeys(col(leftText), maxDist, index = false)).as("k"))
      .select(col("__lid"), col("__ls"), col("k.l"), col("k.seg"), col("k.sub"))
    val rk = right
      .where(col(rightText).isNotNull && col(rightId).isNotNull)
      .select(col(rightId).as("__rid"), col(rightText).as("__rs"),
        explode(graft.functions.text.passJoinKeys(col(rightText), maxDist, index = true)).as("k"))
      .select(col("__rid"), col("__rs"), col("k.l"), col("k.seg"), col("k.sub"))
    val keys = Seq("l", "seg", "sub")
    Dedup.capBuckets(lk, keys, maxBucket)
      .join(Dedup.capBuckets(rk, keys, maxBucket), keys)
      // candidate pair once, regardless of how many segments matched
      .dropDuplicates("__lid", "__rid")
      .withColumn("dist", levenshtein(col("__ls"), col("__rs")))
      .where(col("dist") <= maxDist)
      .select(col("__lid").as("idA"), col("__rid").as("idB"), col("dist"))
  }

  /** Self-join form for near-duplicate keys within one table: unordered
    * pairs (idA < idB) within `maxDist`. The id column must be orderable.
    */
  def editDistanceSelfJoin(df: DataFrame, textCol: String, idCol: String,
      maxDist: Int, maxBucket: Int = Int.MaxValue): DataFrame =
    editDistanceJoin(df, textCol, idCol, df, textCol, idCol, maxDist, maxBucket)
      .where(col("idA") < col("idB"))

  import org.apache.spark.sql.Column

  /** Jaro-Winkler record linkage (Winkler 1990; the Fellegi-Sunter-era
    * comparator still standard for person/entity name matching): all
    * cross-pairs with `jaroWinkler(textA, textB) >= minSim`, generated
    * under caller-supplied BLOCKING and verified with the exact
    * [[graft.functions.text.JaroWinklerExpr]] comparator (bit-identical
    * to DuckDB's `jaro_winkler_similarity`, see the expression doc).
    *
    * Unlike Levenshtein (pigeonhole-complete PassJoin segments, see
    * [[editDistanceJoin]]), Jaro-Winkler admits NO exact filter-key
    * family: two strings can exceed any threshold while sharing no
    * contiguous substring (matches need only fall inside the Jaro
    * window). Real record-linkage systems therefore block on a modeling
    * key — phonetic code, first token, zip code, sorted-neighborhood key
    * (Christen 2012 survey) — accepting that recall is defined BY the
    * blocking choice. This operator makes that contract explicit:
    * `blockKey` maps the text column to a join key (default: first byte,
    * uppercased — the classic initial-letter block); pairs in different
    * blocks are out of scope by definition, and the `ns_jw_join` gate
    * replays blocking + threshold end-to-end in the oracle.
    *
    * Scale shape: one shuffled equi-join on the block key; per-block cost
    * is quadratic, so blocks must be kept small BY THE KEY CHOICE (that
    * too is standard practice), with `maxBucket` as the hard skew guard —
    * oversized blocks are capped (trading recall inside them, like the
    * LSH generators' guard) rather than detonating a task. Comparator
    * cost is O(len_a * len_b) per candidate on short strings. Output:
    * (idA, idB, sim DOUBLE), one row per qualifying pair.
    */
  def jaroWinklerJoin(
      left: DataFrame, leftText: String, leftId: String,
      right: DataFrame, rightText: String, rightId: String,
      minSim: Double,
      blockKey: Column => Column = c => upper(substring(c, 1, 1)),
      maxBucket: Int = Int.MaxValue): DataFrame = {
    require(minSim >= 0.0 && minSim <= 1.0, "minSim must be in [0, 1]")
    val lk = left
      .where(col(leftText).isNotNull && col(leftId).isNotNull)
      .select(col(leftId).as("__lid"), col(leftText).as("__ls"),
        blockKey(col(leftText)).as("__bk"))
    val rk = right
      .where(col(rightText).isNotNull && col(rightId).isNotNull)
      .select(col(rightId).as("__rid"), col(rightText).as("__rs"),
        blockKey(col(rightText)).as("__bk"))
    Dedup.capBuckets(lk, Seq("__bk"), maxBucket)
      .join(Dedup.capBuckets(rk, Seq("__bk"), maxBucket), Seq("__bk"))
      .withColumn("sim", graft.functions.text.jaroWinkler(col("__ls"), col("__rs")))
      .where(col("sim") >= minSim)
      .select(col("__lid").as("idA"), col("__rid").as("idB"), col("sim"))
  }

  /** Self-join form: unordered pairs (idA < idB) with similarity at or
    * above `minSim` under the same blocking contract.
    */
  def jaroWinklerSelfJoin(df: DataFrame, textCol: String, idCol: String,
      minSim: Double,
      blockKey: Column => Column = c => upper(substring(c, 1, 1)),
      maxBucket: Int = Int.MaxValue): DataFrame =
    jaroWinklerJoin(df, textCol, idCol, df, textCol, idCol, minSim, blockKey, maxBucket)
      .where(col("idA") < col("idB"))

  /** One-call entity resolution: blocking → Jaro-Winkler comparator →
    * transitive closure → canonical representative. The standard
    * merge/purge pipeline as one composition of the audited parts
    * ([[jaroWinklerSelfJoin]] for match pairs,
    * [[graft.ops.Dedup.clusterAssignments]] for the hybrid
    * label-prop/star-contraction closure), so its scale and correctness
    * properties are exactly those parts': blocked equi-join candidates,
    * O(log n) clustering rounds, no all-pairs stage.
    *
    * Canonical choice: the cluster's MINIMUM id — deterministic and
    * schema-free. For quality-aware survivorship (best record wins, not
    * lowest id) run [[graft.ops.Dedup.keepBest]] over the returned
    * cluster_id with your score column instead.
    *
    * Output: (id, cluster_id, is_canonical); unmatched records are their
    * own singleton cluster.
    */
  def resolveEntities(df: DataFrame, textCol: String, idCol: String,
      minSim: Double = 0.92,
      blockKey: Column => Column = c => upper(substring(c, 1, 1)),
      maxBucket: Int = Int.MaxValue): DataFrame = {
    val pairs = jaroWinklerSelfJoin(df, textCol, idCol, minSim, blockKey, maxBucket)
      .select(col("idA"), col("idB"))
    graft.ops.Dedup.clusterAssignments(df, idCol, pairs)
      .select(col("id"), col("cluster_id"),
        (col("id") === col("cluster_id")).as("is_canonical"))
  }

  /** Sorted-neighborhood candidate generation (Hernández/Stolfo 1995, the
    * merge/purge method): sort the corpus by `keyCol` (a blocking key —
    * normalized name, address line, phonetic code) and emit every pair
    * within `window` positions of each other. The third blocking family
    * next to value-equality ([[jaroWinklerJoin]]'s blockKey) and structure
    * ([[editDistanceJoin]]'s segments): it catches near-misses that CROSS
    * a block boundary (e.g. "smith"/"smyth" under an initial-letter block
    * share a block, but "aalto "/"aalto" with a stray leading space do
    * not — sorted order still puts them adjacent). Verify candidates with
    * any comparator ([[jaroWinklerJoin]]'s expression via
    * `graft_jaro_winkler`, levenshtein, a field-wise rule).
    *
    * Scale shape — no global window, no product:
    *   - the global 0-based position over (key, id) comes from a TeraSort-
    *     style two-level rank (the [[graft.ops.Curation.epochShuffle]]
    *     construction): range-exchange into `buckets` ordered ranges,
    *     per-bucket `row_number`, plus a broadcast bucket-size prefix sum
    *     (metadata-sized — the single-partition window only ever sees
    *     <= `buckets` rows). Range boundaries come from Spark's sampling
    *     range partitioner; boundaries affect only which bucket ranks a
    *     row, never the final position, so the output is deterministic.
    *   - the neighborhood self-join is an EQUI-join on block id
    *     (`pos div window`): the right side is duplicated into its block
    *     and predecessor block, so a pair at rank distance d < window
    *     falls in exactly one (block, block) key match — O(n·window)
    *     candidates, two rows exchanged per right row, never a range or
    *     nested-loop join.
    *
    * Output: (idA, idB, dist) with dist = rank distance in [1, window),
    * idA the lower-ranked row. SNM's contract is positional, so dist is
    * audit information: dist 1 pairs are adjacent in sort order.
    */
  def sortedNeighborhoodJoin(df: DataFrame, keyCol: String, idCol: String,
      window: Int, buckets: Int = 64): DataFrame = {
    require(window >= 2, "window must be >= 2 (window 1 pairs nothing)")
    require(buckets >= 1, "buckets must be >= 1")
    val ranged = df.select(col(keyCol).as("__k"), col(idCol).as("__id"))
      .repartitionByRange(buckets, col("__k"), col("__id"))
      .withColumn("__bk", spark_partition_id())
    val offsets = ranged.groupBy(col("__bk")).agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("__bk"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__bk"), col("__off"))
    val pos = ranged.withColumn("__rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("__bk")).orderBy(col("__k"), col("__id"))).cast("long"))
      .join(broadcast(offsets), "__bk")
      .select(col("__id"), (col("__off") + col("__rk") - 1L).as("__pos"))
    val w = window.toLong
    val a = pos.select(col("__id").as("idA"), col("__pos").as("__pa"),
      call_function("div", col("__pos"), lit(w)).as("__blk"))
    val b = pos.select(col("__id").as("idB"), col("__pos").as("__pb"),
        array(call_function("div", col("__pos"), lit(w)),
          call_function("div", col("__pos"), lit(w)) - 1L).as("__blks"))
      .select(col("idB"), col("__pb"), explode(col("__blks")).as("__blk"))
    a.join(b, Seq("__blk"))
      .where(col("__pb") > col("__pa") && col("__pb") - col("__pa") < w)
      .select(col("idA"), col("idB"), (col("__pb") - col("__pa")).as("dist"))
  }
}
