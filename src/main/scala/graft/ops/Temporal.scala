package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins: as-of join (each left row picks
  * the nearest right row at-or-before / at-or-after it per key) and
  * point-in-interval range join. Both are everyday event-analytics shapes
  * (attribution, latest-dimension-as-of, session attach) and both have
  * naive formulations that explode at scale — these implementations are the
  * linear-cost ones.
  *
  * Scale shapes:
  *   - [[asofJoin]] never builds a join: both sides union into one stream,
  *     ONE hash exchange on the key, and a running last/first-non-null
  *     window resolves every left row in a single ordered pass per key.
  *     Cost is one shuffle of (key, time, payload) — linear in rows — vs
  *     the O(left × right per key) range-join + argmax formulation. Skewed
  *     keys degrade to a per-key sort, not a quadratic blowup.
  *   - [[rangeJoin]] buckets time into `bucketWidth` cells: intervals
  *     replicate into the cells they cover (sequence-explode), points map
  *     to exactly one cell, and the match becomes an equi-join on
  *     (keys, cell) + an exact residual filter. The planner gets a hash
  *     join instead of the BroadcastNestedLoopJoin a raw θ-predicate
  *     forces. Replication factor = avg interval length / bucketWidth + 1,
  *     the knob that trades shuffle volume against residual selectivity.
  *
  * Determinism: when several right rows share (key, time), the as-of winner
  * among them is tie-broken by the ordered payload struct (time first, then
  * remaining right columns in input order) — total and engine-portable.
  * DuckDB's ASOF JOIN is the oracle for the backward direction
  * (`ns_asof_join`); forward + tolerance laws are gated in TemporalSpec.
  *
  * No counterpart in the reference engine; north-star operator.
  */
object Temporal {

  /** Floor division that stays on integers (exact for any long), positive or
    * negative domain: (x - pmod(x, w)) is exactly divisible by w, and the
    * `div` operator is integral — no double rounding anywhere (a `/` here
    * would be IEEE division and silently wrong beyond 2^53).
    */
  private def floorDiv(x: Column, w: Long): Column =
    call_function("div", x - pmod(x, lit(w)), lit(w))

  /** Shared interval-side bucketization for [[rangeJoin]]/[[intervalJoin]]:
    * drop inverted intervals, prefix non-key columns (prefix "" keeps the
    * originals), replicate each row into every `bucketWidth` cell the
    * interval covers as `__b`. The input must not already carry a `__b`
    * column.
    */
  private def bucketizeIntervals(df: DataFrame, startCol: String,
      endCol: String, keyCols: Seq[String], prefix: String,
      bucketWidth: Long): DataFrame = {
    require(!df.columns.contains("__b"), "input must not carry a __b column")
    val payload = df.columns.filterNot(keyCols.contains).toSeq
    df.where(col(startCol) <= col(endCol))
      .select(keyCols.map(col) ++ payload.map(c => col(c).as(prefix + c)): _*)
      .withColumn("__b", explode(sequence(
        floorDiv(col(prefix + startCol), bucketWidth),
        floorDiv(col(prefix + endCol), bucketWidth))))
  }

  /** As-of join. For every left row, attach the right row with the same
    * `keyCols` whose `timeCol` is the latest <= left time (`backward`) or
    * the earliest >= left time (`forward`), optionally only when within
    * `tolerance` time units. Right payload columns (everything but the
    * keys) come back prefixed with `rightPrefix`; unmatched left rows keep
    * nulls there (`joinType = "left"`) or drop (`joinType = "inner"`).
    *
    * `timeCol` must exist on both sides with an orderable type; `tolerance`
    * additionally requires it to be numeric (e.g. epoch micros).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      timeCol: String, direction: String = "backward",
      joinType: String = "left", tolerance: Option[Long] = None,
      rightPrefix: String = "r_"): DataFrame = {
    require(Seq("backward", "forward").contains(direction), s"bad direction $direction")
    require(Seq("left", "inner").contains(joinType), s"bad joinType $joinType")
    require(keyCols.nonEmpty, "need at least one key column")
    require(!keyCols.contains(timeCol), "timeCol cannot be a key")

    val leftCols = left.columns.toSeq
    // right payload = time first (deterministic tie-break major), then the
    // rest in input order
    val rPayload = timeCol +: right.columns.filterNot(c =>
      keyCols.contains(c) || c == timeCol).toSeq

    val lpayType = left.select(struct(leftCols.map(col): _*)).schema.head.dataType
    val rpayType = right.select(struct(rPayload.map(col): _*)).schema.head.dataType

    // Side ordering places right rows where the inclusive bound needs them:
    // backward (t_r <= t_l): right sorts before left at equal time;
    // forward  (t_r >= t_l): right sorts after left at equal time.
    val (sideRight, sideLeft) = if (direction == "backward") (0, 1) else (1, 0)

    val l2 = left.select(
      keyCols.map(col) ++ Seq(
        col(timeCol).as("__t"), lit(sideLeft).as("__side"),
        struct(leftCols.map(col): _*).as("__lpay"),
        lit(null).cast(rpayType).as("__rpay")): _*)
    // Null keys never match under equi-join/ASOF semantics. The union+window
    // formulation would otherwise co-partition null-key rows and match them;
    // dropping right-side null keys restores join behavior (null-key left
    // rows then sit in a right-free partition: null match → kept with nulls
    // under "left", dropped under "inner" — exactly the join formulation).
    val r2 = right
      .where(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keyCols.map(col) ++ Seq(
          col(timeCol).as("__t"), lit(sideRight).as("__side"),
          lit(null).cast(lpayType).as("__lpay"),
          struct(rPayload.map(col): _*).as("__rpay")): _*)

    // one exchange; __rpay as the final sort column makes equal-(time, side)
    // right rows resolve to a deterministic winner (max/min payload struct)
    val ord = Seq(col("__t"), col("__side"), col("__rpay"))
    val base = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    val matchExpr =
      if (direction == "backward")
        last(col("__rpay"), ignoreNulls = true)
          .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      else
        first(col("__rpay"), ignoreNulls = true)
          .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing))

    val withMatch = l2.unionByName(r2)
      .withColumn("__match", matchExpr)
      .where(col("__side") === sideLeft)

    val inTol = tolerance match {
      case None => col("__match").isNotNull
      case Some(tol) => col("__match").isNotNull &&
        abs(col("__t") - col("__match").getField(timeCol)) <= tol
    }
    val filtered = if (joinType == "inner") withMatch.where(inTol)
                   else withMatch.withColumn("__ok", inTol)
    val okCol = if (joinType == "inner") lit(true) else col("__ok")

    val rOut = rPayload.map(c =>
      when(okCol, col("__match").getField(c)).as(rightPrefix + c))
    filtered.select(col("__lpay.*") +: rOut: _*)
  }

  /** Gap-based sessionization: label every event with its session ordinal
    * per key (1-based `session_seq`): a new session starts when the gap to
    * the previous event of the same key exceeds `gap` time units. The
    * batch twin of Structured Streaming's `session_window` (same gap
    * semantics over closed history; the streaming side lives in
    * `streaming/Windows.sessionAgg`), but per-EVENT — the label a feature
    * join needs, not just per-session aggregates.
    *
    * Deterministic under time ties: the boundary predicate depends only on
    * the time DELTA (equal times never split), so every ordering of tied
    * rows yields the same labels. One key exchange + one ordered pass —
    * the same cost envelope as [[asofJoin]].
    */
  def sessionize(events: DataFrame, keyCols: Seq[String], timeCol: String,
      gap: Long, seqCol: String = "session_seq"): DataFrame = {
    require(gap >= 0, "gap must be >= 0")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(timeCol))
    val newSession = when(
      lag(col(timeCol), 1).over(w).isNull ||
        col(timeCol) - lag(col(timeCol), 1).over(w) > gap, 1L).otherwise(0L)
    events.withColumn(seqCol,
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session aggregates over [[sessionize]] labels: (keys, session_seq,
    * session_start, session_end, n_events). Partial-aggregated on top of
    * the already-partitioned labeled stream.
    */
  def sessionStats(events: DataFrame, keyCols: Seq[String], timeCol: String,
      gap: Long): DataFrame = {
    sessionize(events, keyCols, timeCol, gap)
      .groupBy((keyCols :+ "session_seq").map(col): _*)
      .agg(min(col(timeCol)).as("session_start"),
        max(col(timeCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Funnel analysis: per key, the earliest strictly-ordered completion of
    * `steps` (step i+1 must happen strictly after the chosen step i — the
    * greedy earliest choice is optimal: taking the earliest valid t_i can
    * only widen what later steps may match). One output row per key:
    * `(keys..., t1..tn nullable, depth)` where `t_i` is the chosen time of
    * step i and `depth` counts completed steps.
    *
    * Plan shape: ONE key exchange; each step is a conditional-min Window
    * over the whole partition (no orderBy → no sort), chained on the
    * previous step's time; a final partial-aggregated collapse emits one
    * row per key. N steps = N window ops over the same exchange, not N
    * scans or joins.
    */
  def funnel(events: DataFrame, keyCols: Seq[String], timeCol: String,
      steps: Seq[Column]): DataFrame = {
    require(steps.nonEmpty, "need at least one step predicate")
    val w = Window.partitionBy(keyCols.map(col): _*)
    var df = events
    var prevT: Option[String] = None
    // internal __-prefixed names: a user column named t1 must not be
    // clobbered while later step predicates still evaluate against it
    steps.zipWithIndex.foreach { case (pred, i) =>
      val name = s"__t${i + 1}"
      val gated = prevT match {
        case None => pred
        case Some(p) => pred && col(p).isNotNull && col(timeCol) > col(p)
      }
      df = df.withColumn(name, min(when(gated, col(timeCol))).over(w))
      prevT = Some(name)
    }
    val tCols = steps.indices.map(i => s"t${i + 1}")
    val collapsed = df.groupBy(keyCols.map(col): _*)
      .agg(max(col("__" + tCols.head)).as(tCols.head),
        tCols.tail.map(c => max(col("__" + c)).as(c)): _*)
    // chaining makes step times monotone-null (t_i null => t_{i+1} null),
    // so the deepest non-null step is the funnel depth
    val depth = coalesce(
      (tCols.zipWithIndex.reverse.map { case (c, i) =>
        when(col(c).isNotNull, lit((i + 1).toLong))
      } :+ lit(0L)): _*)
    collapsed.withColumn("depth", depth)
  }

  /** Cohort retention matrix: assign every actor to the absolute period of
    * its first activity (`cohort = floor(first_time / period)`), then count
    * distinct actors active in each (cohort, periods-since-first) cell.
    * Output: `(cohort, period_idx, n_active)`.
    *
    * Plan shape: first-activity via a sort-free window min on the actor
    * key (one exchange), period arithmetic as a projection, then ONE
    * partial-aggregated distinct on (cohort, period_idx, actor) — never a
    * self-join of the event table against first-activity rows.
    * `timeCol` must be numeric (e.g. epoch micros). Null actors are
    * dropped (the SQL first-activity join would drop them too — keeping
    * the window and join formulations interchangeable).
    */
  def cohortRetention(events: DataFrame, actorCol: String, timeCol: String,
      period: Long): DataFrame = {
    require(period > 0, "period must be positive")
    val w = Window.partitionBy(actorCol)
    events
      .where(col(actorCol).isNotNull)
      .withColumn("__ft", min(col(timeCol)).over(w))
      .select(
        floorDiv(col("__ft"), period).as("cohort"),
        floorDiv(col(timeCol) - col("__ft"), period).as("period_idx"),
        col(actorCol).as("__actor"))
      .groupBy("cohort", "period_idx")
      .agg(countDistinct("__actor").as("n_active"))
  }

  /** Point-in-interval range join: points row matches interval row when
    * keys are equal and `startCol <= pointCol <= endCol` (closed bounds).
    * Interval columns come back prefixed with `prefix`. Intervals with
    * start > end are dropped. One output row per matching pair.
    *
    * `bucketWidth` is the cell size of the equi-join key: pick it near the
    * typical interval length so each interval replicates into O(1) cells —
    * it is deliberately NOT defaulted, because a width far below the
    * interval span sequence-explodes each interval into span/width rows
    * (a 1-hour interval in epoch micros at width 1 is 3.6e9 cells).
    */
  def rangeJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      keyCols: Seq[String] = Nil, bucketWidth: Long,
      prefix: String = "i_"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p2 = points.withColumn("__b", floorDiv(col(pointCol), bucketWidth))
    val i2 = bucketizeIntervals(intervals, startCol, endCol, keyCols,
      prefix, bucketWidth)
    p2.join(i2, keyCols :+ "__b")
      .where(col(pointCol).between(col(prefix + startCol), col(prefix + endCol)))
      .drop("__b")
  }

  /** Trailing rolling-window aggregates: for every event, the sum and
    * count of `valueCol` over the same key's events in
    * `[time - window, time]` (RANGE frame — rows with equal time are
    * peers and always share one frame, so ties can't skew either value).
    * Appends `<valueCol>_wsum` and `w_n`. One key exchange + one ordered
    * pass, like the other per-key operators here.
    *
    * `valueCol` should be integral (sum longs, not IEEE doubles — scale
    * currency to cents first) so the accumulation order inside the frame
    * cannot change the result across engines.
    */
  def rolling(events: DataFrame, keyCols: Seq[String], timeCol: String,
      window: Long, valueCol: String, sumCol: String = null,
      cntCol: String = "w_n"): DataFrame = {
    require(window >= 0, "window must be >= 0")
    val sumName = Option(sumCol).getOrElse(s"${valueCol}_wsum")
    Seq(sumName, cntCol).foreach { c =>
      require(!events.columns.contains(c),
        s"output column $c already exists — pass sumCol/cntCol to rename")
    }
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(timeCol))
      .rangeBetween(-window, 0)
    events
      .withColumn(sumName, sum(col(valueCol)).over(w))
      .withColumn(cntCol, count(lit(1)).over(w))
  }

  /** Silence/downtime detection — the inverse of [[sessionize]]: per key,
    * every consecutive-event interval LONGER than `minGap` time units,
    * as one row (key, gap_start, gap_end, gap). Sessionize groups the
    * activity; this reports the holes — feed outages in ingest streams,
    * sensor dropouts, churn-risk inactivity windows. The same lag shape
    * as sessionize's boundary detection (one exchange on the keys, one
    * ordered pass per key), emitting boundaries instead of labels.
    *
    * Tie-safe: with k equal-time rows closing a gap, exactly ONE of them
    * (whichever sorts first) sees the pre-gap predecessor — the other
    * k−1 see a tie neighbor, delta 0 — so every tie order emits the
    * identical one-row-per-gap set and the oracle hashes equal.
    */
  def gaps(events: DataFrame, keyCols: Seq[String], timeCol: String,
      minGap: Long): DataFrame = {
    require(minGap >= 1, "minGap must be >= 1")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(timeCol))
    events
      .select(keyCols.map(col) :+ col(timeCol): _*)
      .withColumn("gap_start", lag(col(timeCol), 1).over(w))
      .withColumn("gap_end", col(timeCol))
      .withColumn("gap", col("gap_end") - col("gap_start"))
      .where(col("gap") > minGap)
      .select(keyCols.map(col) :+ col("gap_start") :+ col("gap_end") :+ col("gap"): _*)
  }

  /** Trailing z-score anomaly screen: flag each point whose deviation from
    * its OWN key's trailing-window mean exceeds `kPermille/1000` standard
    * deviations — the streaming-shaped outlier detector for metric
    * pipelines (ingest-rate spikes, quality-score collapses, sensor
    * glitches), complementing [[graft.ops.Profile.robustOutliers]]' global
    * per-group screen with a time-local reference window.
    *
    * The reference frame is `RANGE [ts − windowUs, ts − 1]` — the point
    * itself and ALL points at its exact timestamp are excluded, so (a) a
    * lone spike cannot mask itself by inflating its own reference
    * statistics, and (b) equal-time peers see identical frames, making the
    * flag independent of tie order (the oracle hash-matches under any
    * sort). Integer-exact: with n/s/q = count/sum/sum-of-squares over the
    * frame, `z² > k²  ⟺  (x·n − s)² · 10⁶ > kPermille² · (n·q − s²)` —
    * every term integer, promoted to DECIMAL(38,0) for the squares
    * (inputs |x| ≤ ~10⁹ with n ≤ ~10⁶ stay inside 38 digits; q is a LONG
    * sum of x², so keep |x| ≤ ~3·10⁶ at million-row windows — same
    * overflow-budget convention as the PCA moments). A zero-variance
    * reference (all values equal) flags ANY deviation, the natural limit.
    *
    * One exchange keyed by `keyCols`, one ordered pass per key computing
    * all three window aggregates over the same frame (single Window node);
    * rows with fewer than `minPoints` reference points are never flagged.
    * Output: input columns + `n_ref` + `is_anomaly`.
    */
  def anomalies(events: DataFrame, keyCols: Seq[String], timeCol: String,
      valueCol: String, windowUs: Long, kPermille: Long = 3000L,
      minPoints: Long = 5L): DataFrame = {
    require(windowUs >= 1, "windowUs must be >= 1")
    require(kPermille >= 0, "kPermille must be >= 0")
    require(minPoints >= 1, "minPoints must be >= 1")
    Seq("n_ref", "is_anomaly").foreach { c =>
      require(!events.columns.contains(c), s"output column $c already exists")
    }
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(timeCol))
      .rangeBetween(-windowUs, -1)
    val x = col(valueCol)
    // pre-project the square: as a plain column all three aggregates share
    // ONE Window node (an inline x*x forces a second window pass)
    val withStats = events
      .withColumn("__x2", x * x)
      .withColumn("n_ref", count(lit(1)).over(w))
      .withColumn("__s", coalesce(sum(x).over(w), lit(0L)))
      .withColumn("__q", coalesce(sum(col("__x2")).over(w), lit(0L)))
      .drop("__x2")
    // promote BEFORE multiplying: x·n and n·q can overflow LONG long
    // before the decimal cast would see them
    val dec = "decimal(38,0)"
    val dev = x.cast(dec) * col("n_ref") - col("__s")
    val den = col("n_ref").cast(dec) * col("__q") -
      col("__s").cast(dec) * col("__s")
    withStats
      .withColumn("is_anomaly",
        col("n_ref") >= minPoints &&
          dev * dev * lit(1000000L) > lit(kPermille * kPermille) * den)
      .drop("__s", "__q")
  }

  /** Interval-overlap join: left [s,e] × right [s,e] pairs that overlap
    * (closed bounds: `ls <= re && rs <= le`), keys equal. Right columns
    * come back prefixed. Both sides bucketize like [[rangeJoin]]; each
    * overlapping pair is emitted from exactly ONE cell — the one holding
    * `greatest(ls, rs)` (the overlap start) — so no distinct/dedup
    * exchange is needed afterward, the classic grid-join attribution
    * trick. Inverted intervals are dropped on both sides.
    */
  def intervalJoin(left: DataFrame, leftStart: String, leftEnd: String,
      right: DataFrame, rightStart: String, rightEnd: String,
      keyCols: Seq[String] = Nil, bucketWidth: Long,
      prefix: String = "r_"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // left columns stay unprefixed: a left column already spelled like a
    // prefixed right name (e.g. left "r_rs" vs right "rs") would silently
    // produce ambiguous output names — reject up front like the __b and
    // rolling-output guards
    val collisions = left.columns.filterNot(keyCols.contains).toSet
      .intersect(right.columns.filterNot(keyCols.contains).map(prefix + _).toSet)
    require(collisions.isEmpty,
      s"left columns collide with prefixed right names: ${collisions.mkString(", ")} — pass a different prefix")
    val l2 = bucketizeIntervals(left, leftStart, leftEnd, keyCols,
      prefix = "", bucketWidth)
    val r2 = bucketizeIntervals(right, rightStart, rightEnd, keyCols,
      prefix, bucketWidth)
    l2.join(r2, keyCols :+ "__b")
      .where(col(leftStart) <= col(prefix + rightEnd) &&
        col(prefix + rightStart) <= col(leftEnd) &&
        // attribute the pair to the single cell containing overlap start
        col("__b") === floorDiv(greatest(col(leftStart), col(prefix + rightStart)),
          bucketWidth))
      .drop("__b")
  }

  /** Trending items per time window: top-`k` `itemCol` values by count
    * in each `windowMs` tumbling bucket, deterministic ties (count desc,
    * item asc) — the dashboard/alerting staple (what spiked this hour)
    * and the windowed face of [[graft.ops.Profile.heavyHitters]]. One
    * partial-aggregated (window, item) count, then a rank window
    * PARTITIONED BY WINDOW — windows are numerous, so the ranking
    * parallelizes across them and no partition ever holds more than one
    * window's distinct items. Output: (window_start, item, cnt, rank).
    */
  def trendingTopK(events: DataFrame, timeCol: String, itemCol: String,
      windowMs: Long, k: Int): DataFrame = {
    require(windowMs > 0 && k >= 1, "need windowMs > 0 and k >= 1")
    events
      .select((floorDiv(col(timeCol), windowMs) * windowMs).as("window_start"),
        col(itemCol).as("item"))
      .groupBy("window_start", "item").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("window_start")
          .orderBy(col("cnt").desc, col("item"))).cast("long"))
      .where(col("rank") <= k)
  }

  /** Journey pattern matching (CEP-lite): per key, the time-ordered
    * event-type sequence rendered as a `sep`-joined string, matched
    * against a regex — the expressiveness layer [[funnel]] lacks
    * (alternation `a|b`, repetition `(x>)*`, IMMEDIATE adjacency
    * `click>purchase` vs funnel's anything-between). Write patterns
    * against the encoded form, e.g. `.*click>purchase.*` = "a purchase
    * directly after a click".
    *
    * Determinism: events sort by (time, id, type) struct order before
    * joining, so same-timestamp events have a pinned order. Keep
    * patterns in the RE2-portable subset (no backrefs/lookaround — the
    * repo-wide regex convention) so the oracle replays them.
    *
    * Scale shape: ONE partial-agg collect per key; state is the key's
    * journey string, so bound the key first — compose with
    * [[sessionize]] and key by (user, session_id) to make journeys
    * session-sized rather than lifetime-sized (the note every
    * collect_list operator here carries).
    *
    * Output: keyCols + (journey, is_match).
    */
  def journeyMatch(events: DataFrame, keyCols: Seq[String], timeCol: String,
      idCol: String, typeCol: String, pattern: String,
      sep: String = ">"): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    events.groupBy(keyCols.map(col): _*)
      .agg(concat_ws(sep, transform(
        array_sort(collect_list(struct(col(timeCol), col(idCol), col(typeCol)))),
        s => s.getField(typeCol))).as("journey"))
      .withColumn("is_match", col("journey").rlike(pattern))
  }

  /** Seasonality profile: event and distinct-actor counts per
    * (day-of-week, hour-of-day) slot — the 168-cell traffic baseline
    * behind capacity planning, anomaly reference curves ("is Tuesday 3am
    * ALWAYS this quiet?"), and load-shaped ingest scheduling. Pure
    * integer calendar arithmetic on epoch-micros (hour = µs div 3600s
    * mod 24, dow = epoch-day + 3 mod 7 with 0 = Monday — epoch day 0 was
    * a Thursday): no timezone tables, no locale, so every cell replays
    * bit-for-bit in any engine. UTC by construction; shift `timeCol` by
    * a fixed offset upstream for local-time profiles.
    *
    * Scale shape: one partial-aggregated groupBy onto AT MOST 168 cells —
    * the distinct-actor count is the standard two-phase expand, whose
    * first exchange is keyed (cell, actor): bounded by actors × 168, and
    * the final frame is metadata-sized. Output: (dow, hour, n_events,
    * n_actors), only observed cells.
    */
  def seasonality(events: DataFrame, timeCol: String,
      actorCol: String): DataFrame =
    events.select(
      ((floorDiv(col(timeCol), 86400000000L) + 3) % 7).as("dow"),
      (floorDiv(col(timeCol), 3600000000L) % 24).as("hour"),
      col(actorCol).as("__a"))
      .groupBy("dow", "hour")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("__a")).as("n_actors"))

  /** Active-actor rollup per tumbling window: exact distinct actors and
    * event counts per `windowMs` bucket — DAU/WAU-style engagement
    * curves and the denominator feed for [[retention]]. Exact tier (the
    * contract): two-phase distinct whose first exchange is keyed
    * (window, actor). At 100 TB actor cardinalities, swap the exact
    * distinct for `approx_count_distinct` — same plan shape, sketch-sized
    * partials (the profile family's exact/sketch split).
    *
    * Output: (window_start, n_events, n_actors).
    */
  def activeActors(events: DataFrame, timeCol: String, actorCol: String,
      windowMs: Long): DataFrame = {
    require(windowMs > 0, "windowMs must be positive")
    events
      .select((floorDiv(col(timeCol), windowMs) * windowMs).as("window_start"),
        col(actorCol).as("__a"))
      .groupBy("window_start")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("__a")).as("n_actors"))
  }

  /** First-order transition matrix over per-key event sequences: how
    * often type A is IMMEDIATELY followed by type B within the same key —
    * the Markov-chain view of user journeys ([[funnel]] asks "did the
    * ordered stages happen"; this asks "what usually happens next"),
    * feeding next-step prediction baselines, anomalous-flow detection
    * (a transition with near-zero mass suddenly spiking), and UX funnel
    * design. The terminal event of each key has no successor and emits
    * nothing.
    *
    * Determinism: successors resolve by lead over the (time, id, type)
    * struct order — the [[journeyMatch]] tie rule — so same-timestamp
    * events transition in a pinned order. `permille_of_from` =
    * (1000·n) div Σ n over the same from_type: integer row-stochastic
    * normalization.
    *
    * Scale shape: one hash exchange on the keys for the lead window
    * (events carry (key, ts, id, type) only), then a partial-aggregated
    * pair count onto a types²-bounded frame; the normalization window
    * runs on that tiny frame. Output: (from_type, to_type, n,
    * permille_of_from).
    */
  def transitions(events: DataFrame, keyCols: Seq[String], timeCol: String,
      idCol: String, typeCol: String): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol), col(idCol), col("from_type"))
    val pairs = events
      .select(keyCols.map(col) :+ col(timeCol) :+ col(idCol) :+
        col(typeCol).as("from_type"): _*)
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val wf = Window.partitionBy(col("from_type"))
    pairs.withColumn("permille_of_from",
      call_function("div", col("n") * lit(1000L), sum(col("n")).over(wf)))
  }

  /** Regular-grid resampling with last-observation-carried-forward: per
    * key, one row per `gridStep` tick from the key's first to last
    * observation bucket, carrying the latest value at-or-before the tick
    * across empty buckets — the irregular-telemetry → fixed-step-series
    * transform feeding rolling windows, drift monitors, and
    * sequence-model featurization (all of which assume an evenly spaced,
    * gap-free series).
    *
    * Deterministic by construction: the per-bucket representative is the
    * observation with the lexicographically greatest (time, value) — one
    * `max(struct)` partial aggregate, an explicit tie rule instead of
    * engine-dependent arg_max — and the carry-forward is
    * `last(ignoreNulls)` over the per-key tick order. Ticks are
    * `floorDiv(t, gridStep) * gridStep` (floor semantics shared with
    * [[rangeJoin]]'s buckets), so a tick's value includes observations AT
    * the tick. No leading nulls: each key's grid starts at its own first
    * observed bucket.
    *
    * Scale shape: one partial-agg reduction to (key, bucket) rows, one
    * per-key min/max aggregate, `sequence`-exploded grid rows (the OUTPUT
    * size — `gridStep` is the caller's series resolution, and the
    * require-guard caps ticks-per-key against a mis-sized step), and one
    * window over each key's own grid — never a global window, never a
    * join wider than the grid itself.
    *
    * Output: keyCols + (tick, `valueCol`, n_obs); n_obs = observations in
    * that bucket (0 on gap ticks the carry filled).
    */
  def resample(events: DataFrame, keyCols: Seq[String], timeCol: String,
      valueCol: String, gridStep: Long, maxTicksPerKey: Long = 1000000L): DataFrame = {
    require(gridStep > 0, "gridStep must be positive")
    require(keyCols.nonEmpty, "keyCols must be non-empty (a keyless series is one global window)")
    val tick = (floorDiv(col(timeCol), gridStep) * gridStep).as("tick")
    val buckets = events
      .select(keyCols.map(col) :+ tick :+ col(timeCol).as("__t") :+ col(valueCol).as("__v"): _*)
      .groupBy(keyCols.map(col) :+ col("tick"): _*)
      .agg(max(struct(col("__t"), col("__v"))).getField("__v").as("__bv"),
        count(lit(1)).as("n_obs"))
    val spans = buckets.groupBy(keyCols.map(col): _*)
      .agg(min("tick").as("__lo"), max("tick").as("__hi"))
      .withColumn("__nt",
        call_function("div", col("__hi") - col("__lo"), lit(gridStep)) + 1)
    // a mis-sized step (micros step on a millis column) would explode the
    // grid a millionfold — fail loudly per key instead of OOMing the stage
    val guardedHi = when(col("__nt") <= maxTicksPerKey, col("__hi"))
      .otherwise(raise_error(concat(
        lit(s"resample: a key spans more than maxTicksPerKey=$maxTicksPerKey ticks — widen gridStep ("),
        col("__nt").cast("string"), lit(" ticks)"))))
    val grid = spans.select(keyCols.map(col) :+
      explode(sequence(col("__lo"), guardedHi, lit(gridStep))).as("tick"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("tick"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(buckets, keyCols :+ "tick", "left")
      .select(keyCols.map(col) :+ col("tick") :+
        last(col("__bv"), ignoreNulls = true).over(w).as(valueCol) :+
        coalesce(col("n_obs"), lit(0L)).as("n_obs"): _*)
  }

  /** Autocorrelation of the event-count series at the requested lags —
    * the quantitative follow-up to [[seasonality]]'s calendar cells: a
    * spike at lag = 24 (hourly buckets) CONFIRMS daily periodicity, decay
    * across small lags measures burstiness, and near-zero everywhere says
    * the arrival process is memoryless (so [[anomalies]]' trailing-window
    * z-scores are well-calibrated). Missing buckets count as ZERO events
    * (the series is densified from min to max bucket — gaps are data, not
    * absent rows; skipping them would silently splice the series).
    *
    * Per lag: one equi-join of the dense series against itself shifted by
    * the lag (bucket keys — hash join, never a window over one
    * partition), then [[Profile.correlationMatrix]]'s exact-decimal
    * moments with the integer-exact corr tail. The dense frame derives from
    * one (bucket) count exchange that Spark's exchange reuse shares
    * across lags; its length is the TIME RANGE over the bucket width, not
    * the corpus — pick bucket widths that keep it series-sized (a year of
    * seconds is 31M rows; of minutes, 0.5M).
    *
    * Output: (lag, n [pairs entering the correlation], corr_permille —
    * null when either side of the pair set is constant).
    */
  def acf(events: DataFrame, timeCol: String, bucketSeconds: Long,
      lags: Seq[Int]): DataFrame = {
    require(bucketSeconds >= 1, "bucketSeconds must be >= 1")
    require(lags.nonEmpty && lags.forall(_ >= 1), "lags must be >= 1")
    val bucket = call_function("div",
      call_function("div", unix_micros(col(timeCol)), lit(1000000L)),
      lit(bucketSeconds))
    val counts = events.select(bucket.as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("x"))
    val dense = counts.agg(min("bucket").as("lo"), max("bucket").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("x"), lit(0L)).as("x"))
    lags.map { l =>
      val shifted = dense.select((col("bucket") - l).as("bucket"),
        col("x").as("xl"))
      val pairs = dense.select(col("bucket"), col("x").as("x0"))
        .join(shifted, "bucket").select(col("x0"), col("xl"))
      Profile.correlationMatrix(pairs, Seq("x0", "xl"))
        .select(lit(l).as("lag"), col("n"), col("corr_permille"))
    }.reduce(_.unionAll(_))
  }
}
