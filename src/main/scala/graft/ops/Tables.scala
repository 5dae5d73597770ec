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
}
