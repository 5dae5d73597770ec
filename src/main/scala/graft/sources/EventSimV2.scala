package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 registration of the eventsim tick source:
  * `spark.readStream.format("eventsim")` (micro-batch) and
  * `spark.read.format("eventsim")` (bounded batch) — the custom-source
  * registry mapping of SURVEY §2 A5, exercised end-to-end instead of
  * riding the built-in rate source.
  *
  * Design split (Spark-first): the SOURCE is only the simulation CLOCK —
  * it emits the rate-source-compatible tick schema (timestamp TIMESTAMP,
  * value LONG), one micro-batch per simulation trigger, deterministically
  * derived from (batch index, options). Event GENERATION stays the
  * codegen'd Catalyst projection of [[EventSim.withGeneratedJson]] layered
  * on top by [[EventSim.stream]] — generating inside the reader would turn
  * a whole-stage-codegen projection into a row loop. Determinism is the
  * one semantic upgrade over `rate-micro-batch`: that source anchors
  * timestamps to wall-clock start time, this one to `startTimestampMs`,
  * so a replayed stream produces bit-identical rows (and the ScalaTest
  * gate can diff it against [[EventSim.batch]] exactly).
  *
  * Options: `rowsPerBatch` (ticks per trigger, default 1),
  * `advanceMillisPerBatch` (sim resolution, default 1000),
  * `startTimestampMs` (epoch millis of trigger 0, default 0),
  * `numBatches` (bounded batch-read size, default 10; ignored when
  * streaming). Scale: partition planning is one `InputPartition` per
  * trigger carrying four longs; row synthesis is O(1) per row with no
  * driver state beyond the latest offset — the reference's eventsim loop
  * (eventsim.go StreamExtract) is per-pod single-threaded, this
  * parallelizes across executors by trigger.
  */
class EventSimSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "eventsim"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventSimSourceProvider.tickSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EventSimTable(new CaseInsensitiveStringMap(properties))
}

object EventSimSourceProvider {
  /** rate-source-compatible tick schema, so the generation projection is
    * format-agnostic.
    */
  val tickSchema: StructType = StructType(Seq(
    StructField("timestamp", TimestampType, nullable = false),
    StructField("value", LongType, nullable = false)))
}

final class EventSimTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val rowsPerBatch = options.getLong("rowsPerBatch", 1L)
  private val advanceMs = options.getLong("advanceMillisPerBatch", 1000L)
  private val startMs = options.getLong("startTimestampMs", 0L)
  private val numBatches = options.getLong("numBatches", 10L)
  require(rowsPerBatch >= 1, "rowsPerBatch must be >= 1")

  override def name(): String = s"eventsim(rowsPerBatch=$rowsPerBatch)"
  override def schema(): StructType = EventSimSourceProvider.tickSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = EventSimSourceProvider.tickSchema
      override def toBatch: Batch = this
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new EventSimMicroBatchStream(rowsPerBatch, advanceMs, startMs)
      override def planInputPartitions(): Array[InputPartition] =
        (0L until numBatches)
          .map(b => EventSimPartition(b, rowsPerBatch, advanceMs, startMs): InputPartition)
          .toArray
      override def createReaderFactory(): PartitionReaderFactory = EventSimReaderFactory
    }
}

/** One simulation trigger; four longs of driver state per partition. */
final case class EventSimPartition(batch: Long, rowsPerBatch: Long,
    advanceMs: Long, startMs: Long) extends InputPartition

object EventSimReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[EventSimPartition]
    new PartitionReader[InternalRow] {
      private var slot = -1L
      override def next(): Boolean = { slot += 1; slot < part.rowsPerBatch }
      override def get(): InternalRow = InternalRow(
        (part.startMs + part.batch * part.advanceMs) * 1000L, // micros
        part.batch * part.rowsPerBatch + slot)
      override def close(): Unit = ()
    }
  }
}

final case class EventSimOffset(batch: Long) extends Offset {
  override def json(): String = batch.toString
}

/** Offset = trigger index; every `latestOffset` poll advances the clock by
  * one trigger (the trigger cadence itself is the streaming query's
  * `Trigger.ProcessingTime`, matching the reference's sim-resolution loop).
  * Restart-safe: offsets serialize as the bare index and partitions are a
  * pure function of it.
  */
final class EventSimMicroBatchStream(rowsPerBatch: Long, advanceMs: Long,
    startMs: Long) extends MicroBatchStream {
  @volatile private var latest = 0L
  override def initialOffset(): Offset = EventSimOffset(0L)
  override def latestOffset(): Offset = { latest += 1; EventSimOffset(latest) }
  override def deserializeOffset(json: String): Offset = {
    val o = EventSimOffset(json.toLong)
    // resume the clock from the checkpoint rather than trigger 0
    if (o.batch > latest) latest = o.batch
    o
  }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[EventSimOffset].batch
    val e = end.asInstanceOf[EventSimOffset].batch
    (s until e)
      .map(b => EventSimPartition(b, rowsPerBatch, advanceMs, startMs): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = EventSimReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
