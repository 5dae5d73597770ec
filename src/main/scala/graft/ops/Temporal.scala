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
    * negative domain: (x - pmod(x, w)) is exactly divisible by w.
    */
  private def floorDiv(x: Column, w: Long): Column =
    ((x - pmod(x, lit(w))) / lit(w)).cast("long")

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
    val r2 = right.select(
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

  /** Point-in-interval range join: points row matches interval row when
    * keys are equal and `startCol <= pointCol <= endCol` (closed bounds).
    * Interval columns come back prefixed with `prefix`. Intervals with
    * start > end are dropped. One output row per matching pair.
    *
    * `bucketWidth` is the cell size of the equi-join key: pick it near the
    * typical interval length so each interval replicates into O(1) cells.
    */
  def rangeJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      keyCols: Seq[String] = Nil, bucketWidth: Long = 1L,
      prefix: String = "i_"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p2 = points.withColumn("__b", floorDiv(col(pointCol), bucketWidth))
    val iPayload = intervals.columns.filterNot(keyCols.contains).toSeq
    val i2 = intervals
      .where(col(startCol) <= col(endCol))
      .select(keyCols.map(col) ++ iPayload.map(c => col(c).as(prefix + c)): _*)
      .withColumn("__b", explode(sequence(
        floorDiv(col(prefix + startCol), bucketWidth),
        floorDiv(col(prefix + endCol), bucketWidth))))
    p2.join(i2, keyCols :+ "__b")
      .where(col(pointCol).between(col(prefix + startCol), col(prefix + endCol)))
      .drop("__b")
  }
}
