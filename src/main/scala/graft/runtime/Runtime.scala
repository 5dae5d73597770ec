package graft.runtime

import java.util.concurrent.atomic.AtomicLong
import java.util.concurrent.{ArrayBlockingQueue, ConcurrentHashMap}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.compile.SpecCompiler
import graft.compile.SpecCompiler.CompiledPipeline
import graft.sinks.{KeyedTableSink, SinkCompiler, VoidSink}
import graft.spec.{Houe, SpecValidationException, StreamSpec}

import scala.jdk.CollectionConverters._

/** Per-stream running metrics (reference entity/common.go:36-73; counters
  * aggregated across executors — here across batches/publishes).
  */
final class Metrics {
  val eventsProcessed = new AtomicLong(0)
  val eventProcessingTimeMicros = new AtomicLong(0)
  val microbatches = new AtomicLong(0)
  val bytesProcessed = new AtomicLong(0)
  val eventsStoredInSink = new AtomicLong(0)
  val sinkProcessingTimeMicros = new AtomicLong(0)
  val sinkOperations = new AtomicLong(0)
  val bytesIngested = new AtomicLong(0)
  def snapshot: Map[String, Long] = Map(
    "EventsProcessed" -> eventsProcessed.get,
    "EventProcessingTimeMicros" -> eventProcessingTimeMicros.get,
    "Microbatches" -> microbatches.get,
    "BytesProcessed" -> bytesProcessed.get,
    "EventsStoredInSink" -> eventsStoredInSink.get,
    "SinkProcessingTimeMicros" -> sinkProcessingTimeMicros.get,
    "SinkOperations" -> sinkOperations.get,
    "BytesIngested" -> bytesIngested.get)
}

/** Marker for stream-level failures the supervisor should self-heal from
  * (event-processing retries exhausted on a retryable error): the reference
  * restarts the stream with exponential backoff in that case
  * (entity/spec.go MaxEventProcessingRetries doc, engine/executor.go Run
  * loop), while unretryable houe=fail terminations stay down for manual
  * restart.
  */
final class RetryableStreamException(msg: String, cause: Throwable)
  extends RuntimeException(msg, cause)

/** Leveled operational notification (entity/notify.go:5-42): carries the
  * emitting code origin (class.method:line — the reference's func/file/line
  * from runtime.Caller) and, for ERROR level, a bounded stack excerpt
  * (pkg/notify/notify.go:20-159).
  */
final case class NotificationEvent(level: String, streamId: String, message: String,
    timestamp: java.time.Instant = java.time.Instant.now(),
    origin: String = "", stack: Seq[String] = Nil)

/** Bounded non-blocking notification bus: full buffer drops events
  * (pkg/notify/notify.go:155-158, default size 64).
  */
final class Notifier(bufferSize: Int = 64) {
  val queue = new ArrayBlockingQueue[NotificationEvent](bufferSize)
  def notify(level: String, streamId: String, msg: String): Unit = {
    // ERROR pays for a stack excerpt; other levels only walk the few
    // frames needed to name the caller (notifications fire per batch/retry,
    // so a full getStackTrace on every INFO/WARN would be wasted work)
    val (origin, stack) =
      if (level == "ERROR") {
        val frames = Thread.currentThread().getStackTrace
        val callerIdx = frames.indexWhere(f =>
          !f.getClassName.startsWith("java.lang.Thread") &&
            !f.getClassName.contains("Notifier"))
        if (callerIdx < 0) ("", Nil)
        else {
          val f = frames(callerIdx)
          (s"${f.getClassName}.${f.getMethodName}:${f.getLineNumber}",
            frames.slice(callerIdx, callerIdx + 8).map(_.toString).toSeq)
        }
      } else {
        val caller = java.lang.StackWalker.getInstance().walk { s =>
          s.limit(8).filter(f => !f.getClassName.contains("Notifier"))
            .findFirst()
        }
        val origin =
          if (caller.isPresent) {
            val f = caller.get
            s"${f.getClassName}.${f.getMethodName}:${f.getLineNumber}"
          } else ""
        (origin, Nil)
      }
    queue.offer(NotificationEvent(level, streamId, msg,
      java.time.Instant.now(), origin, stack)) // drop on full
  }
  def drain(): Seq[NotificationEvent] = {
    val out = new java.util.ArrayList[NotificationEvent]()
    queue.drainTo(out)
    out.asScala.toSeq
  }
}

/** Spec registry (J1/J3): version-gated registration, per-env ops
  * resolution, disable handling, protected ids, optional parquet-backed
  * spec table for bootstrap (registry-as-a-table; the reference's
  * registry-as-a-stream collapses to this in a Spark runtime).
  */
final class Registry(spark: SparkSession, specTablePath: Option[String], env: String) {
  private val specs = new ConcurrentHashMap[String, StreamSpec]()
  private val protectedIds = Set("geist-specs", "geist-adminevents")

  /** Bootstrap from the persisted spec table (registry.go:110-145 Fetch). */
  def fetch(): Unit = specTablePath.foreach { path =>
    // no java.io.File gate: the spec table may live on any Hadoop FS
    // (s3a/hdfs) — a missing/empty path is simply "nothing registered yet"
    try {
      spark.read.parquet(path)
        .groupBy("id").agg(max_by(col("specJson"), col("version")).as("specJson"))
        .collect()
        .foreach { r =>
          StreamSpec.parse(r.getAs[String]("specJson")).foreach(s => specs.put(s.id, s))
        }
    } catch { case _: org.apache.spark.sql.AnalysisException => }
  }

  /** Validate + version-gate + persist + cache
    * (registry.go:167-182 ExistsWithSameOrHigherVersion).
    */
  def register(specJson: String): Either[SpecValidationException, StreamSpec] = {
    StreamSpec.parse(specJson).flatMap { spec =>
      if (protectedIds.contains(spec.id))
        Left(SpecValidationException(s"stream id ${spec.id} is protected"))
      else Option(specs.get(spec.id)) match {
        case Some(existing) if existing.version >= spec.version =>
          Left(SpecValidationException(
            s"spec ${spec.id} with version ${spec.version} already exists with same or higher version"))
        case _ =>
          specTablePath.foreach { path =>
            import spark.implicits._
            Seq((spec.id, spec.version, specJson)).toDF("id", "version", "specJson")
              .write.mode("append").parquet(path)
          }
          specs.put(spec.id, spec)
          Right(spec)
      }
    }
  }

  def get(id: String): Option[StreamSpec] = Option(specs.get(id))
  def all: Seq[StreamSpec] = specs.values.asScala.toSeq
  def isDisabled(spec: StreamSpec): Boolean = spec.isDisabledIn(env)
}

/** One deployed stream: compiled pipeline + sink + metrics. */
final class Stream(
    val spec: StreamSpec,
    val pipeline: CompiledPipeline,
    val metrics: Metrics,
    supervisor: Supervisor) {

  @volatile var query: Option[StreamingQuery] = None
  private[runtime] val voidSink = new VoidSink(spec.sink.config.properties)
  private[runtime] val tables = spec.sink.config.customConfig
    .map(SinkCompiler.parseTables).getOrElse(Nil)
  // one keyed table per sink table: mixed-schema tables must not share a
  // parquet directory (multi-table specs write differently-shaped rows);
  // each sink carries its table's G6 creation config (partitioning,
  // clustering, partition-filter requirement)
  private def sinkOf(path: String, t: Option[SinkCompiler.TableSpec]): KeyedTableSink = {
    val rowsPerFile = spec.sink.config.properties.get("rowsPerFile")
      .map(_.toLong).getOrElse(1000000L)
    t match {
      case Some(ts) => new KeyedTableSink(path, ts.partitionField, ts.partitionType,
        ts.clustering, ts.requirePartitionFilter, rowsPerFile)
      case None => new KeyedTableSink(path, rowsPerFile = rowsPerFile)
    }
  }
  private[runtime] val keyedSinks: Map[String, KeyedTableSink] =
    supervisor.config.sinkRoot.map { root =>
      if (tables.size > 1)
        tables.map(t => t.name -> sinkOf(s"$root/${spec.id}/${t.name}", Some(t))).toMap
      else Map("default" -> sinkOf(s"$root/${spec.id}", tables.headOption))
    }.getOrElse(Map.empty)
  private[runtime] def keyedSink: Option[KeyedTableSink] =
    keyedSinks.values.headOption
  private[runtime] def keyedSinkFor(table: String): Option[KeyedTableSink] =
    keyedSinks.get(table).orElse(keyedSinks.get("default"))

  /** Process one micro-batch of raw events (the executor's ProcessEvent —
    * engine/executor.go:175-251): pipeline → per-table sink stages → load
    * with retry/backoff (executor.go:282-329) → houe policy on the
    * unretryable side-output. Returns the resource id of the last write.
    */
  @volatile private[runtime] var shutdownRequested = false

  // I3 self-heal bookkeeping (engine/executor.go:136-153): whether the last
  // query termination is retryable, and the per-stream restart backoff that
  // doubles up to ops.maxStreamRetryBackoffIntervalSec. State lives on the
  // Stream (like the reference's per-executor backoffDuration) so hot-swap
  // resets it but query restarts don't. Like the reference, backoff is
  // NOT reset after a successful recovery — it grows (capped) for the
  // deployment's lifetime; only a re-register/hot-swap starts fresh.
  @volatile private[runtime] var lastFailureRetryable = false
  @volatile private[runtime] var restartCount = 0
  private[runtime] var backoffMs = -1L
  private[runtime] def nextBackoffMs(baseMs: Long): Long = synchronized {
    val cap = spec.ops.maxStreamRetryBackoffIntervalSec * 1000L
    backoffMs = if (backoffMs <= 0) math.min(baseMs, cap) else math.min(backoffMs * 2, cap)
    restartCount += 1
    backoffMs
  }

  def processBatch(rawEvents: DataFrame): String = {
    // caches must unpersist even when the batch throws — under I3 the
    // self-heal loop re-runs a failing batch indefinitely, so a leak here
    // would accumulate one orphaned cached frame per restart cycle
    var hookFrame: Option[DataFrame] = None
    var cachedEvents: Option[DataFrame] = None
    val t0 = System.nanoTime()
    try processBatchInner(rawEvents,
      f => { hookFrame = Some(f); f }, f => { cachedEvents = Some(f); f })
    finally {
      // deferred, like the reference's processEventExit (executor.go:
      // 344-352, registered before any work): Microbatches and the
      // processing-time counter advance on EVERY batch attempt — hook
      // failures, transform errors, and sink failures included
      metrics.microbatches.incrementAndGet()
      metrics.eventProcessingTimeMicros.addAndGet((System.nanoTime() - t0) / 1000)
      hookFrame.foreach(_.unpersist())
      cachedEvents.foreach(_.unpersist())
    }
  }

  private def processBatchInner(rawEvents: DataFrame,
      trackHook: DataFrame => DataFrame,
      trackEvents: DataFrame => DataFrame): String = {
    var resourceId = "<noResourceId>"

    // F9 pre-transform hook: distributed per-event action evaluation.
    // hook mode carries (raw event count, raw byte volume, ingested-
    // candidate bytes) out of the hook aggregation so the processed
    // counters need no second rawEvents scan and no separate ingested pass
    var hookStats: Option[(Long, Long, Long)] = None
    val events = supervisor.config.preTransformHook match {
      case None => rawEvents
      case Some(h) =>
        val sparkS = supervisor.spark
        import sparkS.implicits._
        val sid = spec.id
        val maxRetries = spec.ops.maxEventProcessingRetries
        val acted = rawEvents.select("value").as[String].map { e =>
          var action = h(sid, e)
          var attempts = 0
          while (action == Hooks.RetryableError && attempts < maxRetries) {
            attempts += 1; action = h(sid, e)
          }
          // __rawlen is the PRE-hook byte length: BytesProcessed counts
          // what arrived from the source, not what a Proceed(e2) rewrote
          action match {
            case Hooks.Proceed(e2) => ("p", e2, e.length)
            case Hooks.Skip => ("s", e, e.length)
            case Hooks.RetryableError | Hooks.UnretryableError => ("u", e, e.length)
            case Hooks.Shutdown => ("x", e, e.length)
          }
        }.toDF("__act", "value", "__rawlen").cache()
        trackHook(acted)
        // one aggregation covers every hook-action decision (previously two
        // isEmpty probes = two extra job submissions per micro-batch), the
        // processed counters (count + raw byte volume per action), AND the
        // ingested-candidate bytes over the surviving 'p' rows; the DLQ
        // write stays lazy — only submitted when flagged rows exist
        val actRows = acted.groupBy(org.apache.spark.sql.functions.col("__act"))
          .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("__n"),
            org.apache.spark.sql.functions.coalesce(
              org.apache.spark.sql.functions.sum(col("__rawlen")).cast("long"),
              org.apache.spark.sql.functions.lit(0L)).as("__b"),
            org.apache.spark.sql.functions.coalesce(
              org.apache.spark.sql.functions.sum(
                org.apache.spark.sql.functions.when(
                  col("__act") === "p" && pipeline.ingestedCol(col("value")),
                  org.apache.spark.sql.functions.length(col("value")))).cast("long"),
              org.apache.spark.sql.functions.lit(0L)).as("__i"))
          .collect()
        val actCounts = actRows.map(r => r.getString(0) -> r.getLong(1)).toMap
        hookStats = Some((actRows.map(_.getLong(1)).sum,
          actRows.map(_.getLong(2)).sum, actRows.map(_.getLong(3)).sum))
        // the reference credits Events/Bytes at the top of the per-event
        // loop, BEFORE the hook-action dispatch (executor.go:196-198) — so
        // a batch the hook flags unretryable under houe=fail still advances
        // the processed counters (the throw below happens after this)
        metrics.eventsProcessed.addAndGet(hookStats.get._1)
        metrics.bytesProcessed.addAndGet(hookStats.get._2)
        if (actCounts.getOrElse("u", 0L) > 0) {
          spec.ops.handlingOfUnretryableEvents match {
            case Houe.Fail => throw new RuntimeException(s"hook flagged unretryable events in ${spec.id} (houe=fail)")
            case Houe.Dlq => supervisor.config.sinkRoot.foreach(root =>
              acted.filter(org.apache.spark.sql.functions.col("__act") === "u")
                .select("value").write.mode("append").parquet(s"$root/${spec.id}__dlq"))
            case _ => supervisor.notifier.notify("WARN", spec.id, "hook: unretryable events discarded")
          }
        }
        if (actCounts.getOrElse("x", 0L) > 0)
          shutdownRequested = true
        acted.filter(org.apache.spark.sql.functions.col("__act") === "p").select("value")
    }

    // cache: the event frame feeds every branch, the error frame, and the
    // stats action — without it each is a full recomputation of the batch
    val cachedEvents = trackEvents(events.cache())
    val branches = pipeline(cachedEvents)

    // Processed counters advance whether or not the sink loads succeed
    // (executor_test.go:536-575: Microbatches/EventsProcessed/BytesProcessed
    // grow across the MockLoader_Error and RetryableError legs while the
    // sink counters stay flat) — so they are accounted BEFORE the loads
    // (hook mode accounted them above, before the houe dispatch;
    // Microbatches + processing time are deferred in processBatch).
    //
    // Per-batch job budget: micro-batch throughput at high rates is
    // bounded by fixed per-job cost, so each fused action is direct
    // events/sec. Without a hook, cachedEvents has exactly rawEvents'
    // rows, so ONE action computes count, byte volume, AND the
    // ingested-candidate bytes (and materializes the cache every branch
    // load reuses). With a hook, count + raw bytes already came out of
    // the hook aggregation above — no second rawEvents scan either way.
    import org.apache.spark.sql.functions.{coalesce => fnCoalesce, count => fnCount, length => fnLength, lit => fnLit, sum => fnSum, when => fnWhen}
    val ingestedBytesCol = fnCoalesce(
      fnSum(fnWhen(pipeline.ingestedCol(col("value")), fnLength(col("value"))))
        .cast("long"), fnLit(0L)).as("__ingestable")
    val fusedStats = hookStats.getOrElse {
      val r = cachedEvents.select(
        fnCount(fnLit(1)),
        fnCoalesce(fnSum(fnLength(col("value"))).cast("long"), fnLit(0L)),
        ingestedBytesCol).collect()(0)
      metrics.eventsProcessed.addAndGet(r.getLong(0))
      metrics.bytesProcessed.addAndGet(r.getLong(1))
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }

    branches.foreach { case (_, branchDf0) =>
      // F10 post-transform hook stage on the branch output.
      val branchDf = supervisor.config.postTransformStage
        .map(stage => stage(spec, branchDf0)).getOrElse(branchDf0)
      val routed: Seq[(String, DataFrame)] =
        if (tables.nonEmpty) tables.map(tb => tb.name -> SinkCompiler.tableStage(tb)(branchDf))
        else Seq("default" -> branchDf)
      routed.foreach { case (tableName, out) =>
        val sunk = loadWithRetry(out, tableName)
        if (sunk._2.nonEmpty) resourceId = sunk._2
      }
    }

    // unretryable error path (regexp non-match): houe policy (I4)
    val errors = pipeline.errorFrame(cachedEvents)
    spec.ops.handlingOfUnretryableEvents match {
      case Houe.Fail =>
        if (!errors.isEmpty)
          throw new RuntimeException(s"unretryable events in stream ${spec.id} with houe=fail")
      case Houe.Dlq =>
        supervisor.config.sinkRoot.foreach { root =>
          val dlq = errors
          if (!dlq.isEmpty) dlq.write.mode("append").parquet(s"$root/${spec.id}__dlq")
        }
      case _ => // default/discard: drop, count via notifier
        ()
    }

    // H1 BytesIngested (executor.go:236-249): the raw bytes of (post-hook)
    // events whose transform produced ≥1 record, CREDITED only once the
    // whole batch — every sink load AND the houe policy — succeeded (a
    // throwing load above skips this line). An all-excluded batch credits
    // 0 (nothing transformed → no load, executor_test.go:518-533). The
    // value itself was fused into the stats action (hook-free mode) or the
    // hook aggregation ('p'-row sum, post-hook values) — no extra job.
    metrics.bytesIngested.addAndGet(fusedStats._3)
    if (shutdownRequested) supervisor.requestShutdown(spec.id)
    resourceId
  }

  /** Sink load with event-level retry + exponential backoff
    * (executor.go:282-329; defaults entity/spec.go:11-18). Unretryable
    * errors propagate immediately; retryable retry up to
    * maxEventProcessingRetries.
    */
  private def loadWithRetry(out0: DataFrame, tableName: String): (Long, String) = {
    val maxRetries = spec.ops.maxEventProcessingRetries
    var attempt = 0
    var backoffMs = supervisor.config.retryBackoffBaseMs
    // cache: write + stats must observe the SAME rows (current_timestamp
    // row keys would otherwise differ between the write and the stats scan)
    val out = out0.cache()
    try {
    // Nothing transformed for this table → successful no-op: no load
    // attempt, no sink operation, no error simulation (executor.go:240-243;
    // executor_test.go:518-533 pins SinkOperations/EventsStoredInSink flat
    // across an all-excluded batch). ONE action probes the batch size AND
    // (keyed sinks) the deterministic min row key, materializing the cache
    // the write below reuses — per-batch job count is the throughput floor
    // at high event rates. The probe sits OUTSIDE the retry loop: retries
    // re-run only the write.
    val keyed = supervisor.config.customLoaders.get(spec.sink.sinkType).isEmpty &&
      keyedSinkFor(tableName).isDefined && out.columns.contains("key")
    val probeCols = org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)) +:
      (if (keyed) Seq(org.apache.spark.sql.functions.min(col("key"))) else Nil)
    val probe = out.select(probeCols: _*).collect()(0)
    val batchRows = probe.getLong(0)
    if (batchRows == 0L) return (0L, "")
    val minKey = if (keyed) Option(probe.getString(1)).getOrElse("") else ""
    while (true) {
      try {
        val t0 = System.nanoTime()
        val (n, rid) = supervisor.config.customLoaders.get(spec.sink.sinkType) match {
          case Some(loader) => // A5: pluggable loader returns the resource id
            (batchRows, loader(spec, out))
          case None => keyedSinkFor(tableName) match {
            case Some(ks) if out.columns.contains("key") =>
              ks.write(out, batchRows) // size hint packs small-batch files
              (batchRows, minKey) // both came out of the fused probe
            case _ =>
              (voidSink.load(out, batchRows), "<noResourceId>")
          }
        }
        metrics.sinkOperations.incrementAndGet()
        // per successful load, like the reference's sinkMetrics.Events
        // (executor.go:295) — NOT at batch end, so a later houe=fail abort
        // still accounts rows that did land in the sink
        metrics.eventsStoredInSink.addAndGet(n)
        metrics.sinkProcessingTimeMicros.addAndGet((System.nanoTime() - t0) / 1000)
        return (n, rid)
      } catch {
        case e: VoidSink#SimulatedError if e.retryable && attempt < maxRetries =>
          attempt += 1
          supervisor.notifier.notify("WARN", spec.id, s"retryable sink error, attempt $attempt: ${e.getMessage}")
          Thread.sleep(backoffMs)
          backoffMs *= 2
        case e: VoidSink#SimulatedError if e.retryable =>
          throw new RetryableStreamException(s"retries exhausted after $attempt attempts", e)
      }
    }
    (0L, "")
    } finally out.unpersist()
  }
}

final case class RuntimeConfig(
    env: String = "dev",
    specTablePath: Option[String] = None,
    sinkRoot: Option[String] = None,
    retryBackoffBaseMs: Long = 2000,
    /** I3: initial stream-restart backoff (reference
      * defaultInitialStreamExtractRetryBackoffDuration = 4 s); doubles per
      * restart, capped at ops.maxStreamRetryBackoffIntervalSec.
      */
    streamRetryBackoffBaseMs: Long = 4000,
    notifyBufferSize: Int = 64,
    /** A4: when set, kafka-source specs start as streaming queries. */
    kafkaBootstrapServers: Option[String] = None,
    /** I1: checkpoint root for streaming queries — offsets + state survive
      * restarts, giving exactly-once into idempotent/keyed sinks.
      */
    checkpointRoot: Option[String] = None,
    /** F9: per-event pre-transform hook (enrich/skip/error/shutdown). */
    preTransformHook: Option[Hooks.PreTransformHook] = None,
    /** F10: per-branch post-transform stage. */
    postTransformStage: Option[Hooks.PostTransformStage] = None,
    /** A5: custom pluggable source builders by source type id; must return
      * a (streaming or batch) frame with a string `value` column.
      */
    customSources: Map[String, (SparkSession, StreamSpec) => DataFrame] = Map.empty,
    /** A5: custom pluggable loaders by sink type id; return the resource id. */
    customLoaders: Map[String, (StreamSpec, DataFrame) => String] = Map.empty)

/** Stream supervisor (I2-I7, supervisor.go): deploys registered streams,
  * hot-swaps executors on spec upgrade, shuts down disabled streams,
  * restarts failed streaming queries with exponential backoff.
  */
final class Supervisor(val spark: SparkSession, val config: RuntimeConfig) {
  val notifier = new Notifier(config.notifyBufferSize)

  val registry = new Registry(spark, config.specTablePath, config.env)
  private val streams = new ConcurrentHashMap[String, Stream]()
  private val metricsMap = new ConcurrentHashMap[String, Metrics]()

  // I3 self-heal: map each running query to its stream so the terminate
  // listener can tell our queries (and their streams) from anything else
  // on the shared SparkSession.
  private val trackedRuns = new ConcurrentHashMap[java.util.UUID, String]()
  private val restartScheduler =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-stream-restart"); t.setDaemon(true); t
    })
  private val healListener = new org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    override def onQueryStarted(event: QueryStartedEvent): Unit = ()
    override def onQueryProgress(event: QueryProgressEvent): Unit = ()
    override def onQueryTerminated(event: QueryTerminatedEvent): Unit = {
      val sid = trackedRuns.remove(event.runId)
      if (sid != null && event.exception.isDefined) handleQueryFailure(sid)
      // the control channel gets the same self-heal as the streams it
      // upgrades: a transient FS error must not silently end push-mode
      // sync while the operator believes it is active
      if (event.exception.isDefined) adminWatch.foreach { q =>
        if (q.runId == event.runId) {
          adminWatch = None
          val trig = adminWatchTriggerMs
          notifier.notify("WARN", "geist-adminevents",
            s"admin watch failed (${event.exception.get.take(120)}); restarting in ${config.streamRetryBackoffBaseMs} ms")
          restartScheduler.schedule(new Runnable {
            override def run(): Unit =
              try { watchRegistry(trig); () }
              catch { case e: Exception =>
                notifier.notify("ERROR", "geist-adminevents",
                  s"admin watch restart failed: ${e.getMessage}") }
          }, config.streamRetryBackoffBaseMs, java.util.concurrent.TimeUnit.MILLISECONDS)
        }
      }
    }
  }
  spark.streams.addListener(healListener)

  /** Serializes deploy / hot-swap / shutdown / self-heal-restart against
    * each other: without it a restart timer firing during a hot-swap could
    * start a zombie query on the orphaned old Stream, sharing the new
    * query's checkpoint dir and sink paths.
    */
  private val deployLock = new Object

  private def handleQueryFailure(sid: String): Unit = {
    Option(streams.get(sid)).foreach { st =>
      if (st.lastFailureRetryable) {
        val delay = st.nextBackoffMs(config.streamRetryBackoffBaseMs)
        notifier.notify("WARN", sid,
          s"stream restart (#${st.restartCount}) in ${delay} ms")
        restartScheduler.schedule(new Runnable {
          override def run(): Unit =
            try restartQuery(sid, st)
            catch { case e: Exception =>
              notifier.notify("ERROR", sid, s"stream restart failed: ${e.getMessage}") }
        }, delay, java.util.concurrent.TimeUnit.MILLISECONDS)
      } else
        notifier.notify("ERROR", sid,
          "stream terminated with unretryable error; manual restart required")
    }
  }

  /** I3: restart the failed query on the SAME Stream (pipeline, sinks and
    * their counters survive — the reference's StreamExtract restart loop
    * keeps the executor/loader instances too); skip if the stream was
    * hot-swapped or shut down while the backoff timer ran.
    */
  private def restartQuery(sid: String, st: Stream): Unit = deployLock.synchronized {
    if (streams.get(sid) eq st) {
      st.lastFailureRetryable = false
      startStreamingQuery(st)
    }
  }

  def metrics(streamId: String): Metrics =
    metricsMap.computeIfAbsent(streamId, _ => new Metrics)

  def stream(id: String): Option[Stream] = Option(streams.get(id))
  def deployedIds: Set[String] = streams.keySet().asScala.toSet

  /** Register (or upgrade) a stream spec and (re)deploy it — the
    * RegisterStream + handleStreamRegistryModified flow
    * (geist.go:83-108, supervisor.go:220-250).
    */
  def registerStream(specJson: String): Either[SpecValidationException, String] = {
    // Validate AND compile before touching the registry or the running
    // stream: a spec that parses but cannot compile (e.g. unsupported
    // gjson path syntax) must be rejected without persisting it or
    // killing the healthy deployment.
    StreamSpec.parse(specJson).flatMap { parsed =>
      val resolved = resolveOps(parsed)
      try SpecCompiler.compile(resolved)
      catch {
        case e: Exception =>
          return Left(SpecValidationException(s"spec ${parsed.id} failed to compile: ${e.getMessage}"))
      }
      // source-config dry validation: catches bad eventsim/kafka config
      // before the registry persists anything or the old stream stops
      try validateSource(resolved)
      catch {
        case e: Exception =>
          return Left(SpecValidationException(s"spec ${parsed.id} source config invalid: ${e.getMessage}"))
      }
      registry.register(specJson).flatMap { _ =>
        deployLock.synchronized {
          // hot-swap: stop any existing deployment of this id (I7)
          Option(streams.get(resolved.id)).foreach(shutdownStream)
          if (!registry.isDisabled(parsed)) {
            try { deploy(resolved); Right(resolved.id) }
            catch {
              case e: Exception =>
                // environmental deploy failure: surface via the contract (the
                // spec is persisted; bootstrap/retry can redeploy once fixed)
                notifier.notify("ERROR", resolved.id, s"deploy failed: ${e.getMessage}")
                streams.remove(resolved.id)
                Left(SpecValidationException(s"spec ${resolved.id} failed to deploy: ${e.getMessage}"))
            }
          } else {
            notifier.notify("INFO", resolved.id, "stream registered disabled; not deployed")
            Right(resolved.id)
          }
        }
      }
    }
  }

  /** Dry-run the source configuration (no query started, nothing stopped). */
  private def validateSource(spec: StreamSpec): Unit = spec.source.sourceType match {
    case "eventsim" =>
      val sim = spec.source.config.customConfig
        .map(graft.sources.EventSim.fromNode).getOrElse(graft.sources.EventSim.SimSpec())
      if (sim.eventGeneration.genType == "sinusoid") {
        require(sim.eventGeneration.periodSeconds > 0, "sinusoid requires positive periodSeconds")
        if (sim.eventGeneration.peakTime.nonEmpty)
          java.time.Instant.parse(sim.eventGeneration.peakTime) // throws on bad format
      }
    case "kafka" =>
      graft.sources.KafkaSource.parseConfig(spec, config.env)
    case _ =>
  }

  /** Effective ops for this environment (registry.go:88-106
    * adjustOpsConfig): opsPerEnv overrides replace the base ops wholesale.
    */
  private def resolveOps(spec: StreamSpec): StreamSpec =
    spec.copy(ops = spec.opsFor(config.env))

  /** Bootstrap persisted specs and deploy the enabled ones — the restart /
    * cross-pod sync entry point (registry.go Fetch + deployAllStreams).
    */
  def bootstrap(): Unit = {
    registry.fetch()
    registry.all.foreach { spec =>
      if (!registry.isDisabled(spec) && !streams.containsKey(spec.id))
        try deployLock.synchronized { deploy(resolveOps(spec)) }
        catch { case e: Exception =>
          notifier.notify("ERROR", spec.id, s"bootstrap deploy failed: ${e.getMessage}") }
    }
  }

  /** J2 cross-pod registry sync (supervisor.go:281-317
    * handleStreamRegistryModified): another driver persisted spec changes;
    * re-fetch the shared registry table and reconcile the local
    * deployment — hot-swap streams whose persisted version is newer, shut
    * down streams now disabled for this env, deploy newly-registered ones.
    * The reference fans the trigger out via an admin event stream; with
    * the registry as a shared table, any control signal (timer, admin
    * topic, HTTP) simply invokes sync().
    */
  def sync(): Unit = {
    registry.fetch()
    registry.all.foreach { spec =>
      try deployLock.synchronized {
        (Option(streams.get(spec.id)), registry.isDisabled(spec)) match {
          case (Some(st), true) =>
            notifier.notify("INFO", spec.id, "sync: disabled in registry; shutting down")
            shutdownStream(st)
          case (Some(st), false) if spec.version > st.spec.version =>
            // same safety ordering as registerStream: prove the new spec
            // compiles and its source config is sane BEFORE stopping the
            // healthy running version — a spec that deploys on the driver
            // that persisted it can still fail environmentally here
            val resolved = resolveOps(spec)
            SpecCompiler.compile(resolved)
            validateSource(resolved)
            notifier.notify("INFO", spec.id, s"sync: hot-swapping to version ${spec.version}")
            shutdownStream(st)
            deployOrRemove(resolved)
          case (None, false) =>
            deployOrRemove(resolveOps(spec))
          case _ => () // already current, or disabled and not deployed
        }
      }
      catch { case e: Exception =>
        notifier.notify("ERROR", spec.id, s"sync failed for ${spec.id}: ${e.getMessage}") }
    }
  }

  /** J2 push channel — the reference's cross-pod admin event stream
    * (internal/pkg/admin/adminspec.go:19-63 "geist-adminevents",
    * supervisor.go:281-317 handleStreamRegistryModified) re-expressed
    * Spark-first: every registry change IS an append to the shared spec
    * table, so the admin event stream is a Structured Streaming file
    * source over that table — each spec file another driver persists
    * arrives as a micro-batch here and triggers [[sync]]. No extra
    * broker: the registry's own storage is the control topic, and any
    * shared filesystem (HDFS/S3A) delivers it to every driver.
    *
    * Loopback appends from THIS driver also fire; sync() is idempotent
    * (version-gated per spec), so a self-triggered pass is a no-op.
    * The returned query is owned by the supervisor — shutdownAll stops
    * it; stop it directly to fall back to poll-mode sync(). A failed
    * watch self-heals with the same backoff as the streams it upgrades
    * (the terminate listener restarts it; a clean stop does not).
    */
  @volatile private var adminWatch: Option[StreamingQuery] = None
  @volatile private var adminWatchTriggerMs: Long = 2000
  def watchRegistry(triggerMs: Long = 2000): StreamingQuery = deployLock.synchronized {
    adminWatchTriggerMs = triggerMs
    adminWatch.filter(_.isActive).getOrElse {
      val path = config.specTablePath.getOrElse(
        throw new IllegalStateException("watchRegistry requires specTablePath"))
      // the table may not exist before the first register; the file source
      // requires the directory, so create it through the Hadoop FS API
      // (works on any scheme, not just local disk)
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) fs.mkdirs(p)
      val src = spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "id STRING, version INT, specJson STRING"))
        .parquet(path)
      var writer = src.writeStream
        .outputMode("append").queryName("geist-adminevents")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(triggerMs))
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // the batch content is only a wake-up signal: sync() re-reads the
          // authoritative registry state (max version per id), so ordering
          // or batching of the change files cannot produce a stale deploy
          if (!batch.isEmpty) sync()
        }
      config.checkpointRoot.foreach(r =>
        writer = writer.option("checkpointLocation", s"$r/geist-adminevents"))
      val q = writer.start()
      adminWatch = Some(q)
      q
    }
  }

  /** Deploy, and on failure remove the half-registered Stream so a later
    * sync/register can retry (a zombie entry would otherwise report as
    * deployed forever while no query runs).
    */
  private def deployOrRemove(spec: StreamSpec): Unit =
    try deploy(spec)
    catch { case e: Exception => streams.remove(spec.id); throw e }

  private def deploy(spec: StreamSpec): Unit = {
    val pipeline = SpecCompiler.compile(spec)
    val st = new Stream(spec, pipeline, metrics(spec.id), this)
    streams.put(spec.id, st)
    startStreamingQuery(st)
  }

  /** Start (or I3-restart) the stream's query. Separate from [[deploy]] so
    * a self-heal restart reuses the SAME Stream — compiled pipeline, sink
    * instances and their error counters survive, matching the reference's
    * StreamExtract restart loop which keeps the executor and loader.
    */
  private def startStreamingQuery(st: Stream): Unit = {
    val spec = st.spec
    // shared streaming start: houe-aware error guard + checkpointing for
    // every source kind
    def startQuery(src: DataFrame, trigger: Option[org.apache.spark.sql.streaming.Trigger]): Unit = {
      var writer = src.select(col("value")).writeStream
        .outputMode("append").queryName(spec.id)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          try { st.processBatch(batch); () }
          catch {
            case e: RetryableStreamException =>
              // event-level retries exhausted: fail the query so the
              // supervisor's listener restarts it with backoff (I3)
              st.lastFailureRetryable = true
              notifier.notify("ERROR", spec.id, s"batch failed (retryable): ${e.getMessage}")
              throw e
            case e: Exception =>
              notifier.notify("ERROR", spec.id, s"batch failed: ${e.getMessage}")
              if (spec.ops.handlingOfUnretryableEvents == Houe.Fail) {
                st.lastFailureRetryable = false // stays down; manual restart
                throw e
              }
          }
        }
      config.checkpointRoot.foreach(r => writer = writer.option("checkpointLocation", s"$r/${spec.id}"))
      trigger.foreach(t => writer = writer.trigger(t))
      val q = writer.start()
      st.query = Some(q)
      trackedRuns.put(q.runId, spec.id)
      // a query can fail during initialization and terminate BEFORE the
      // runId registration above — the listener then found no mapping.
      // Settle such races here; remove-then-handle keeps the two paths
      // idempotent (whichever runs second sees no mapping and no-ops).
      if (!q.isActive) {
        val sid = trackedRuns.remove(q.runId)
        if (sid != null && q.exception.isDefined) handleQueryFailure(sid)
      }
    }
    config.customSources.get(spec.source.sourceType) match {
      case Some(builder) => // A5: pluggable source
        val src = builder(spark, spec)
        if (src.isStreaming) startQuery(src, None)
        else st.processBatch(src.select(col("value")))
        notifier.notify("INFO", spec.id, s"custom source '${spec.source.sourceType}' started")
        return
      case None =>
    }
    spec.source.sourceType match {
      case "eventsim" =>
        val sim = spec.source.config.customConfig
          .map(graft.sources.EventSim.fromNode).getOrElse(graft.sources.EventSim.SimSpec())
        val src = graft.sources.EventSim.stream(spark, sim, seed = 42L)
        // the sim resolution IS the trigger cadence (eventsim.go StreamExtract loop)
        startQuery(src, Some(org.apache.spark.sql.streaming.Trigger
          .ProcessingTime(sim.simResolutionMilliseconds)))
        notifier.notify("INFO", spec.id, "eventsim stream started")
      case "geistapi" =>
        // interactive push source: events arrive via publish()
        notifier.notify("INFO", spec.id, "geistapi stream ready for publish")
      case "kafka" if config.kafkaBootstrapServers.nonEmpty =>
        val src = graft.sources.KafkaSource.stream(spark, spec, config.env,
          config.kafkaBootstrapServers.get)
        // I5 micro-batch shaping: timeout threshold → trigger interval
        val trigger = if (spec.ops.microBatch)
          Some(org.apache.spark.sql.streaming.Trigger.ProcessingTime(spec.ops.microBatchTimeoutMs))
        else None
        startQuery(src, trigger)
        notifier.notify("INFO", spec.id, "kafka stream started")
      case other =>
        // kafka-without-brokers/pubsub etc. need external infrastructure;
        // registered but not auto-started in this environment.
        notifier.notify("INFO", spec.id, s"source type '$other' registered; start requires external source")
    }
  }

  /** Interactive publish (A1, geist.go:123-145): synchronous — returns the
    * sink resource id once the event is fully processed and loaded.
    */
  def publish(streamId: String, eventJson: String): String = {
    val st = Option(streams.get(streamId))
      .getOrElse(throw new IllegalArgumentException(s"stream not found: $streamId"))
    require(st.spec.source.sourceType == "geistapi",
      s"publish only supported for geistapi sources (stream $streamId is ${st.spec.source.sourceType})")
    import spark.implicits._
    val df = Seq(eventJson).toDF("value")
    // BytesIngested is accounted inside processBatch (H1 parity: every
    // path credits post-transform, post-sink — executor.go:236-249), not
    // pre-credited here.
    st.processBatch(df)
  }

  private def shutdownStream(st: Stream): Unit = {
    st.query.foreach { q =>
      trackedRuns.remove(q.runId)
      try q.stop() catch { case _: Exception => }
    }
    streams.remove(st.spec.id)
  }

  /** Hook-initiated shutdown (executor.go:253-280 HookActionShutdown).
    * For streaming queries the request arrives on the query's own
    * foreachBatch thread — StreamingQuery.stop() joins that thread, so a
    * synchronous stop would self-deadlock; stop from a separate thread.
    */
  private[runtime] def requestShutdown(streamId: String): Unit = {
    Option(streams.get(streamId)).foreach { st =>
      notifier.notify("INFO", streamId, "shutdown requested by hook")
      if (st.query.isDefined) {
        val t = new Thread(() => deployLock.synchronized { shutdownStream(st) },
          s"graft-shutdown-$streamId")
        t.setDaemon(true)
        t.start()
      } else deployLock.synchronized { shutdownStream(st) }
    }
  }

  def shutdownAll(): Unit = {
    restartScheduler.shutdownNow()
    adminWatch.foreach(q => try q.stop() catch { case _: Exception => })
    adminWatch = None
    deployLock.synchronized {
      streams.values.asScala.toSeq.foreach(shutdownStream)
    }
    spark.streams.removeListener(healListener)
  }
}

/** Public facade with the reference's API surface (geist.go). */
final class Geist(spark: SparkSession, config: RuntimeConfig = RuntimeConfig()) {
  private val supervisor = new Supervisor(spark, config)

  def registerStream(specJson: String): Either[SpecValidationException, String] =
    supervisor.registerStream(specJson)
  /** Restart entry point: load persisted specs and deploy enabled streams. */
  def bootstrap(): Unit = supervisor.bootstrap()
  /** J2: reconcile this driver against registry changes persisted by
    * another driver (hot-swap upgrades, shut down disabled, deploy new).
    */
  def sync(): Unit = supervisor.sync()
  /** J2 push mode: subscribe to the shared registry as a stream — registry
    * appends from any driver trigger sync() here without polling.
    */
  def watchRegistry(triggerMs: Long = 2000): StreamingQuery =
    supervisor.watchRegistry(triggerMs)
  def publish(streamId: String, eventJson: String): String =
    supervisor.publish(streamId, eventJson)
  def getStreamSpec(id: String): Option[StreamSpec] = supervisor.registry.get(id)
  def getStreamSpecs: Seq[StreamSpec] = supervisor.registry.all
  def validateStreamSpec(json: String): Either[SpecValidationException, StreamSpec] =
    StreamSpec.parse(json)
  def metrics(streamId: String): Map[String, Long] = supervisor.metrics(streamId).snapshot
  def notifications(): Seq[NotificationEvent] = supervisor.notifier.drain()
  def deployedIds: Set[String] = supervisor.deployedIds
  def readback(streamId: String): Option[KeyedTableSink] =
    supervisor.stream(streamId).flatMap(_.keyedSink)
  /** EnrichEvent helper (F11, geist.go:209-214): set a field in raw JSON. */
  def enrichEvent(eventJson: String, path: String, value: String): String =
    Geist.setJsonField(eventJson, path, value)
  def shutdown(): Unit = supervisor.shutdownAll()
}

object Geist {
  /** sjson-SetBytes-style field injection on a JSON document (F11). */
  def setJsonField(json: String, path: String, value: String): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = try mapper.readTree(json) catch { case _: Exception => mapper.createObjectNode() }
    val obj = root match {
      case o: com.fasterxml.jackson.databind.node.ObjectNode => o
      // non-object roots (arrays, scalars) cannot take a field: pass the
      // event through unchanged rather than silently replacing it
      case _ => return json
    }
    val segs = path.split("\\.")
    var cur = obj
    segs.init.foreach { s =>
      cur = Option(cur.get(s)) match {
        case Some(o: com.fasterxml.jackson.databind.node.ObjectNode) => o
        case _ =>
          val n = mapper.createObjectNode(); cur.set(s, n); n
      }
    }
    cur.put(segs.last, value)
    mapper.writeValueAsString(obj)
  }
}
