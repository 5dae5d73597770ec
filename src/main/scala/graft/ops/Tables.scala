package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table persistence for the operators' reusable side artifacts
  * (dedup digest indexes, minhash band entries, embedding code tables).
  *
  * At 100 TB, bucketing is how a REPEATED join stops paying its shuffle:
  * writing both sides bucketed (and sorted) on the join key means every
  * subsequent join — tonight's delta against the corpus index, tomorrow's
  * too — reads pre-partitioned, pre-sorted buckets and zips them with NO
  * exchange on either side. One shuffle at write time amortizes over
  * every later ingest. PlanSpec gates the exchange-free join shape.
  *
  * The helpers are thin by design: bucketing lives in the table catalog
  * (`saveAsTable`), so the index builders stay pure DataFrames and any
  * operator output can be persisted this way.
  */
object Tables {

  /** Write `df` as a parquet table bucketed AND sorted by `key` —
    * `buckets` should match (or divide evenly into) the partition count
    * the consuming joins run with, and both join sides must use the same
    * bucket count for the exchange-free zip.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(buckets > 0, "buckets must be positive")
    df.write.mode(mode).format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (symmetry helper — `spark.table` is all
    * it takes; bucketing metadata rides the catalog entry).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Write a frame as `nShards` size-balanced, internally-ordered parquet
    * files — the output-shaping step of a training-data run (downstream
    * loaders want even shards: one straggler file serializes the last
    * wave of every consumer). `repartitionByRange` SAMPLES the key
    * distribution to place boundaries, so shards stay balanced under
    * skewed keys where hash-modulo sharding would not;
    * `sortWithinPartitions` makes each shard internally ordered by the
    * key (resumable, mergeable reads). Pick a high-cardinality key (doc
    * id, pack id) — range sharding a low-cardinality key degenerates to
    * however many distinct values exist.
    */
  def writeSharded(df: DataFrame, path: String, keyCol: String, nShards: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(nShards > 0, "nShards must be positive")
    df.repartitionByRange(nShards, org.apache.spark.sql.functions.col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode(mode).parquet(path)
  }

  /** Z-order (Morton) interleave of `cols`, each clamped to its low `bits`
    * bits: bit i of column j lands at output bit `i * nCols + j`, so rows
    * close in EVERY dimension get close z-values. Sorting/range-sharding
    * by this value co-locates multi-column neighborhoods in the same
    * parquet files, which turns per-file column min/max into an effective
    * multi-dimensional prune — the layout step behind "OPTIMIZE ZORDER
    * BY" in lakehouse engines, here as a plain deterministic column any
    * writer can order by (compose with [[writeSharded]]).
    *
    * Inputs must be non-negative integers already scaled to fit `bits`
    * (rank or min-max normalize first — resolution beyond `bits` bits is
    * ignored by design). `bits * nCols` must fit a long (<= 63). Pure
    * bit arithmetic: engine-portable, exactly replayable in SQL.
    */
  def zOrderValue(cols: Seq[org.apache.spark.sql.Column], bits: Int)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
    require(cols.nonEmpty, "need at least one column")
    // overflow-free form of bits * cols.size <= 63
    require(bits > 0 && bits <= 63 / cols.size,
      s"bits*nCols must be in [1, 63], got bits=$bits nCols=${cols.size}")
    val n = cols.size
    val parts = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * n + j)
    parts.reduce(_ + _)
  }
}
