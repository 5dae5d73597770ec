package graft.sinks

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Sink-side operator semantics (SURVEY.md §2 G1-G9): row-key synthesis,
  * multi-table routing with whitelists, column mapping/renaming, dynamic
  * column names, ingestion-time pseudo-column, insert-id dedup, and the
  * keyed read-back API.
  *
  * The compiler turns a sink spec's customConfig into per-table
  * `DataFrame => DataFrame` stages, shared by batch verification and
  * streaming foreachBatch writers. All stages are narrow projections /
  * filters except insert-id dedup (a per-batch aggregation on the insert
  * key — uniform, bounded by batch size).
  */
object SinkCompiler {

  /** "@GeistIngestionTime" pseudo-field (entity/spec.go:28-29). */
  val GeistIngestionTime = "@GeistIngestionTime"

  final case class RowKey(keys: Seq[String] = Nil, delimiter: String = "", predefined: String = "")
  final case class Whitelist(id: String, wtype: String, values: Seq[String])
  /** BigQuery-style column (name or nameFromId) — kafkasrc-bigquerysink-fooevents.json. */
  final case class ColumnSpec(
      name: String,
      valueFromId: String,
      nameFromIdPrefix: String = "",
      nameFromIdSuffix: String = "",
      nameFromIdPreset: Seq[String] = Nil)
  /** BigTable-style qualifier within a column family: fixed `name`, or a
    * dynamic `nameFromId` (prefix + suffix field — G4, e.g.
    * apisrc-bigtablesink-fooround.json "frt-&lt;fooTrackingId&gt;").
    */
  final case class Qualifier(id: String, name: String,
      nameFromIdPrefix: String = "", nameFromIdSuffix: String = "",
      nameFromIdPreset: Seq[String] = Nil)

  final case class TableSpec(
      name: String,
      rowKey: RowKey = RowKey(),
      whitelist: Option[Whitelist] = None,
      qualifiers: Seq[Qualifier] = Nil,
      columns: Seq[ColumnSpec] = Nil,
      insertIdFromId: String = "",
      partitionField: String = "",
      partitionType: String = "DAY",
      clustering: Seq[String] = Nil,
      requirePartitionFilter: Boolean = false)

  /** Parse the `tables` array of a sink customConfig (bigtable/bigquery
    * shapes; unknown fields ignored like the reference's plugins do).
    */
  def parseTables(customConfig: JsonNode): Seq[TableSpec] = {
    val tables = Option(customConfig).flatMap(c => Option(c.get("tables"))).toSeq
      .flatMap(_.elements().asScala)
    tables.map { t =>
      def s(n: JsonNode, f: String): String =
        Option(n.get(f)).filterNot(_.isNull).map(_.asText("")).getOrElse("")
      val rowKey = Option(t.get("rowKey")).map { rk =>
        RowKey(
          keys = Option(rk.get("keys")).map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Nil),
          delimiter = s(rk, "delimiter"),
          predefined = s(rk, "predefined"))
      }.getOrElse(RowKey())
      val whitelist = Option(t.get("whitelist")).map { w =>
        Whitelist(s(w, "id"), if (s(w, "type").isEmpty) "or" else s(w, "type"),
          Option(w.get("values")).map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Nil))
      }
      val qualifiers = Option(t.get("columnFamilies")).toSeq
        .flatMap(_.elements().asScala)
        .flatMap(cf => Option(cf.get("columnQualifiers")).toSeq.flatMap(_.elements().asScala))
        .map { q =>
          val nfi = Option(q.get("nameFromId"))
          Qualifier(s(q, "id"), s(q, "name"),
            nameFromIdPrefix = nfi.map(n => s(n, "prefix")).getOrElse(""),
            nameFromIdSuffix = nfi.map(n => s(n, "suffixFromId")).getOrElse(""),
            nameFromIdPreset = nfi.flatMap(n => Option(n.get("preset")))
              .map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Nil))
        }
      val columns = Option(t.get("columns")).toSeq.flatMap(_.elements().asScala).map { c =>
        val nfi = Option(c.get("nameFromId"))
        ColumnSpec(
          name = s(c, "name"),
          valueFromId = s(c, "valueFromId"),
          nameFromIdPrefix = nfi.map(n => s(n, "prefix")).getOrElse(""),
          nameFromIdSuffix = nfi.map(n => s(n, "suffixFromId")).getOrElse(""),
          nameFromIdPreset = nfi.flatMap(n => Option(n.get("preset")))
            .map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Nil))
      }
      val tableCreation = Option(t.get("tableCreation"))
      val timePartitioning = tableCreation.flatMap(tc => Option(tc.get("timePartitioning")))
      val partitionField = timePartitioning.map(tp => s(tp, "field")).getOrElse("")
      val partitionType = timePartitioning.map(tp => s(tp, "type"))
        .filter(_.nonEmpty).getOrElse("DAY")
      val clustering = tableCreation
        .flatMap(tc => Option(tc.get("clustering")))
        .map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Nil)
      val requirePartitionFilter = tableCreation
        .flatMap(tc => Option(tc.get("requirePartitionFilter"))).exists(_.asBoolean(false))
      TableSpec(s(t, "name"), rowKey, whitelist, qualifiers, columns,
        insertIdFromId = s(t, "insertIdFromId"), partitionField = partitionField,
        partitionType = partitionType, clustering = clustering,
        requirePartitionFilter = requirePartitionFilter)
    }
  }

  /** Whitelist routing (G2): `or` = any value matches; `and` = all match. */
  def whitelistPred(w: Whitelist): Column = w.wtype match {
    case "and" => w.values.map(v => col(w.id) === lit(v)).reduceOption(_ && _).getOrElse(lit(true))
    case _ => col(w.id).isin(w.values.map(_.asInstanceOf[Any]): _*)
  }

  /** Row-key synthesis (G1): concat of field values with delimiter;
    * `predefined: timestampIso` keys on ingestion time; `keysInMap` is
    * handled by exploding the map column (D2 — see keysInMapFrame).
    */
  def rowKeyCol(rk: RowKey): Column = rk.predefined match {
    case "timestampIso" => date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    case _ => concat_ws(rk.delimiter, rk.keys.map(col): _*)
  }

  /** D2/G1 `keysInMap`: one sink row per map entry, key = map key. */
  def keysInMapFrame(df: DataFrame, mapCol: String): DataFrame =
    df.select(explode(col(mapCol)).as(Seq("key", "value")))

  /** Full per-table stage: whitelist filter → insert-id dedup → row key +
    * column mapping (bigtable qualifiers or bigquery columns incl.
    * ingestion time and preset dynamic names).
    */
  def tableStage(table: TableSpec)(df: DataFrame): DataFrame = {
    var out = df
    table.whitelist.foreach(w => out = out.filter(whitelistPred(w)))
    if (table.insertIdFromId.nonEmpty)
      out = out.dropDuplicates(table.insertIdFromId)

    if (table.columns.nonEmpty) {
      // BigQuery-style projection
      val cols: Seq[Column] = table.columns.flatMap { c =>
        val value: Column =
          if (c.valueFromId == GeistIngestionTime) current_timestamp()
          else col(c.valueFromId)
        if (c.name.nonEmpty) Seq(value.as(c.name))
        else if (c.nameFromIdPreset.nonEmpty)
          // dynamic column per preset value (G4): populated when the
          // suffix field holds that value, else null
          c.nameFromIdPreset.map(p =>
            when(col(c.nameFromIdSuffix) === lit(p), value).as(s"${c.nameFromIdPrefix}$p"))
        else
          // open-ended dynamic name (G4, apisrc-bigtablesink-fooround.json
          // "frt-<fooTrackingId>"): unknown column domain → a map column,
          // the columnar-native shape for value-derived names. Rows from
          // other branches carry a null suffix — no dynamic column (null
          // map), never a null map key.
          Seq(when(col(c.nameFromIdSuffix).isNotNull,
            map(concat(lit(c.nameFromIdPrefix), col(c.nameFromIdSuffix).cast("string")), value))
            .as(s"${c.nameFromIdPrefix}cols"))
      }
      out.select(cols: _*)
    } else if (table.qualifiers.nonEmpty) {
      // BigTable-style: row key + renamed qualifiers. Dynamic nameFromId
      // qualifiers mirror the columns path: preset → one column per preset
      // value; open-ended → a map column (value-derived names have no
      // static column domain).
      val key = rowKeyCol(table.rowKey).as("key")
      val qcols: Seq[Column] = table.qualifiers.flatMap { q =>
        if (q.name.nonEmpty) Seq(col(q.id).as(q.name))
        else if (q.nameFromIdPreset.nonEmpty)
          q.nameFromIdPreset.map(p =>
            when(col(q.nameFromIdSuffix) === lit(p), col(q.id)).as(s"${q.nameFromIdPrefix}$p"))
        else if (q.nameFromIdSuffix.nonEmpty)
          Seq(when(col(q.nameFromIdSuffix).isNotNull,
            map(concat(lit(q.nameFromIdPrefix), col(q.nameFromIdSuffix).cast("string")), col(q.id)))
            .as(s"${q.nameFromIdPrefix}cols"))
        else Seq(col(q.id).as(q.id))
      }
      out.select(key +: qcols: _*)
    } else if (table.rowKey.keys.nonEmpty || table.rowKey.predefined.nonEmpty) {
      out.withColumn("key", rowKeyCol(table.rowKey))
    } else out
  }
}

/** Kafka sink message mapping (G7, pubsubsrc-kafkasink-foologs.json):
  * `message.payloadFromId` selects which transformed field becomes the
  * outgoing record value; the frame is ready for
  * `.writeStream.format("kafka").option("topic", ...)`.
  */
object KafkaSinkStage {
  def apply(payloadFromId: String, keyFromId: Option[String] = None)(df: DataFrame): DataFrame = {
    val value = col(payloadFromId).cast("binary").as("value")
    keyFromId match {
      case Some(k) => df.select(col(k).cast("binary").as("key"), value)
      case None => df.select(value)
    }
  }
}

/** Keyed parquet-backed sink with the read-back API (G9):
  * QueryTypeKeyValue / CompositeKeyValue / All
  * (/root/reference/entity/extractor.go:104-132). The batch analog of the
  * reference's BigTable sink-extractor; lookups are parquet
  * predicate-pushdown scans on the key column.
  *
  * G6 table-creation semantics map to their Spark-columnar analogs
  * (kafkasrc-bigquerysink-fooevents.json "tableCreation"):
  *   - timePartitioning {type, field} → a derived `__pdate` directory
  *     partition (date_trunc of the field): partition pruning on read is
  *     the columnar form of BQ's time partitions
  *   - clustering [cols] → sortWithinPartitions before write: row-group
  *     locality gives parquet min/max pruning on the clustered columns,
  *     exactly what BQ clustering buys
  *   - requirePartitionFilter → full-table read-back refuses to scan
  *     without a partition predicate (use [[timeRange]]); key lookups stay
  *     allowed (they are the BigTable row-key path, not a BQ table scan)
  *   - garbageCollectionPolicy maxAge → [[gcMaxAge]] drops aged partition
  *     directories (a metadata operation, no data rewrite)
  */
final class KeyedTableSink(
    val path: String,
    val partitionField: String = "",
    val partitionType: String = "DAY",
    val clustering: Seq[String] = Nil,
    val requirePartitionFilter: Boolean = false,
    /** Target rows per written file when the caller supplies the batch size
      * (`write(df, knownRows)`): an unbounded micro-batch stream appends
      * sparkPartitions × batches files without packing — the classic
      * small-files failure on a long-lived table. Default ~1M small keyed
      * rows ≈ tens of MB of parquet, a sane file size for later scans;
      * tunable per sink via the `rowsPerFile` sink property (rows are the
      * unit the runtime's fused batch probe already knows — no byte
      * estimation pass).
      */
    val rowsPerFile: Long = 1000000L) {
  require(rowsPerFile >= 1, s"rowsPerFile must be >= 1 (got $rowsPerFile)")

  private def truncUnit: String = partitionType.toUpperCase match {
    case "HOUR" => "hour"
    case "MONTH" => "month"
    case "YEAR" => "year"
    case _ => "day"
  }

  def write(df: DataFrame, knownRows: Long = -1L): Unit = {
    val hasPartition = partitionField.nonEmpty
    // fail fast rather than silently degrade: a batch missing the
    // configured partition column would write an unpartitioned layout into
    // a partitioned directory tree, breaking partition discovery for every
    // subsequent read of the table
    require(!hasPartition || df.columns.contains(partitionField),
      s"table at $path is time-partitioned on '$partitionField' but the batch has columns ${df.columns.mkString(",")}")
    var out = df
    // small-files control: pack small batches into ~rowsPerFile-row files.
    // coalesce is NARROW — no shuffle, no extra job, the write job just
    // runs fewer tasks — and large batches keep full write parallelism:
    // coalesce never increases the partition count, so a target above the
    // frame's partitioning is a no-op (no defaultParallelism cap — capping
    // would merge a 256-partition 200M-row batch down to the core count,
    // producing oversized files AND fewer write tasks). Applied before the
    // clustering sort so sortWithinPartitions orders the merged output.
    if (knownRows >= 0) {
      val target = math.min(Int.MaxValue.toLong,
        math.max(1L, (knownRows + rowsPerFile - 1) / rowsPerFile))
      out = out.coalesce(target.toInt)
    }
    if (hasPartition)
      out = out.withColumn("__pdate", date_trunc(truncUnit, col(partitionField)))
    val clusterCols = clustering.filter(out.columns.contains)
    if (clusterCols.nonEmpty)
      out = out.sortWithinPartitions(clusterCols.map(col): _*)
    val w = out.write.mode("append")
    (if (hasPartition) w.partitionBy("__pdate") else w).parquet(path)
  }

  private def table(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.read.parquet(path)

  def keyValue(spark: org.apache.spark.sql.SparkSession, key: String): DataFrame =
    table(spark).filter(col("key") === key)

  def compositeKeyValue(spark: org.apache.spark.sql.SparkSession, parts: Seq[String], delimiter: String): DataFrame =
    keyValue(spark, parts.mkString(delimiter))

  def all(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    require(!requirePartitionFilter,
      s"table at $path requires a partition filter (requirePartitionFilter): use timeRange")
    table(spark)
  }

  /** G6 retention (BigTable garbageCollectionPolicy maxAge analog): drop
    * whole partition directories strictly older than `olderThan` — age-based
    * TTL is a directory delete, never a data rewrite. Returns the number of
    * partitions dropped. Partition dir names carry Spark's escaped partition
    * value (`__pdate=2024-06-01 00%3A00%3A00`); values are unescaped before
    * comparison.
    */
  def gcMaxAge(olderThan: java.sql.Timestamp): Int = {
    require(partitionField.nonEmpty, s"table at $path has no time partitioning")
    val root = new java.io.File(path)
    val dirs = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("__pdate="))
    def delete(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(delete)
      f.delete()
    }
    val dropped = dirs.filter { d =>
      val escaped = d.getName.stripPrefix("__pdate=")
      val value = java.net.URLDecoder.decode(escaped.replace("+", "%2B"), "UTF-8")
      try java.sql.Timestamp.valueOf(value).before(olderThan)
      catch { case _: IllegalArgumentException => false } // unknown dir: keep
    }
    dropped.foreach(delete)
    dropped.length
  }

  /** Scan over [from, to) of the time-partitioning field: partitions prune
    * on the TRUNCATED bounds (a row at 18:00 lives in the 00:00 day
    * partition, so pruning must include the partition containing `from`),
    * then the exact field predicate trims the boundary partitions.
    */
  def timeRange(spark: org.apache.spark.sql.SparkSession,
      from: java.sql.Timestamp, to: java.sql.Timestamp): DataFrame = {
    require(partitionField.nonEmpty, s"table at $path has no time partitioning")
    table(spark)
      .filter(col("__pdate") >= date_trunc(truncUnit, lit(from)) && col("__pdate") < lit(to))
      .filter(col(partitionField) >= lit(from) && col(partitionField) < lit(to))
  }
}

/** Void/noop sink (G8): counts loads, optional error simulation via sink
  * properties (simulateError: alwaysRetryable | alwaysUnretryable,
  * maxErrors) — /root/reference/internal/pkg/entity/void/loader.go:40-156.
  */
final class VoidSink(props: Map[String, String]) {
  import java.util.concurrent.atomic.{AtomicLong, AtomicInteger}
  val eventsLoaded = new AtomicLong(0)
  val batches = new AtomicLong(0)
  private val errorsSimulated = new AtomicInteger(0)
  private val maxErrors = props.get("maxErrors").flatMap(_.toIntOption).getOrElse(Int.MaxValue)

  final case class SimulatedError(retryable: Boolean)
    extends RuntimeException(s"simulated ${if (retryable) "retryable" else "unretryable"} error")

  /** Returns the batch row count; throws per the simulateError contract.
    * `knownCount` skips the count job when the caller already probed the
    * batch size (the runtime's fused emptiness probe) — per-micro-batch
    * job count is the streaming throughput floor.
    */
  def load(df: DataFrame, knownCount: Long = -1L): Long = {
    props.get("simulateError") match {
      case Some(mode @ ("alwaysRetryable" | "alwaysUnretryable")) if errorsSimulated.get() < maxErrors =>
        errorsSimulated.incrementAndGet()
        throw SimulatedError(retryable = mode == "alwaysRetryable")
      case _ =>
    }
    val n = if (knownCount >= 0) knownCount else df.count()
    eventsLoaded.addAndGet(n)
    batches.incrementAndGet()
    n
  }
}
