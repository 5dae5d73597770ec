package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.runtime.{Geist, RuntimeConfig}

/** Lifecycle / runtime conformance mirroring the reference's engine tests
  * (geist_test.go, internal/pkg/engine/executor_test.go, supervisor_test.go).
  */
class RuntimeSpec extends AnyFunSuite {
  import SparkTestBase.spark

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-rt").toString

  private def apiSpec(ns: String, suffix: String, version: Int = 1,
      sink: String = """{"type": "void"}""", extra: String = "") =
    s"""{
       |  "namespace": "$ns", "streamIdSuffix": "$suffix", "version": $version,
       |  "description": "...", $extra
       |  "source": {"type": "geistapi"},
       |  "transform": {
       |    "extractFields": [{"fields": [
       |      {"id": "name", "jsonPath": "name"},
       |      {"id": "custId", "jsonPath": "cust.id"}
       |    ]}]
       |  },
       |  "sink": $sink
       |}""".stripMargin

  test("register + publish + keyed sink readback round trip (A1/G1/G9)") {
    val g = new Geist(spark, RuntimeConfig(sinkRoot = Some(tmpDir()), retryBackoffBaseMs = 1))
    val sink =
      """{"type": "bigtable", "config": {"customConfig": {"tables": [
        |  {"name": "t", "rowKey": {"keys": ["name", "custId"], "delimiter": "#"},
        |   "columnFamilies": [{"name": "d", "columnQualifiers": [
        |     {"id": "custId", "name": "cid"}]}]}
        |]}}}""".stripMargin
    val id = g.registerStream(apiSpec("rt", "roundtrip", sink = sink))
      .fold(e => fail(e.msg), identity)
    assert(id == "rt-roundtrip")

    val rid = g.publish(id, """{"name": "EVENT_A", "cust": {"id": "c42"}}""")
    assert(rid == "EVENT_A#c42", "resource id = synthesized row key (geist.go:117-123)")

    val rb = g.readback(id).get
    val row = rb.keyValue(spark, "EVENT_A#c42").collect()
    assert(row.length == 1 && row(0).getAs[String]("cid") == "c42")
    assert(rb.compositeKeyValue(spark, Seq("EVENT_A", "c42"), "#").count() == 1)
    assert(rb.all(spark).count() == 1)
    g.shutdown()
  }

  test("version gating: same-or-lower version rejected, higher hot-swaps (J1/I7)") {
    val g = new Geist(spark, RuntimeConfig(retryBackoffBaseMs = 1))
    assert(g.registerStream(apiSpec("rt", "vgate", 2)).isRight)
    assert(g.registerStream(apiSpec("rt", "vgate", 2)).isLeft, "same version rejected")
    assert(g.registerStream(apiSpec("rt", "vgate", 1)).isLeft, "lower version rejected")
    assert(g.registerStream(apiSpec("rt", "vgate", 3)).isRight, "upgrade accepted")
    assert(g.getStreamSpec("rt-vgate").get.version == 3)
    g.shutdown()
  }

  test("disabled spec registers but does not deploy; per-env ops override (I7)") {
    val g = new Geist(spark, RuntimeConfig(env = "prod", retryBackoffBaseMs = 1))
    assert(g.registerStream(apiSpec("rt", "disabled", extra = """"disabled": true,""")).isRight)
    assert(!g.deployedIds.contains("rt-disabled"))
    // opsPerEnv disables only in prod (registry.go:88-106 semantics)
    val perEnv = apiSpec("rt", "envdis",
      extra = """"opsPerEnv": {"prod": {"disabled": true}},""")
    assert(g.registerStream(perEnv).isRight)
    assert(!g.deployedIds.contains("rt-envdis"))
    g.shutdown()
  }

  test("retryable sink errors retry with backoff then succeed (I2, executor_test.go:555-573)") {
    val g = new Geist(spark, RuntimeConfig(retryBackoffBaseMs = 1))
    val sink =
      """{"type": "void", "config": {"properties": [
        |  {"key": "simulateError", "value": "alwaysRetryable"},
        |  {"key": "maxErrors", "value": "3"}]}}""".stripMargin
    val id = g.registerStream(apiSpec("rt", "retry", sink = sink)).fold(e => fail(e.msg), identity)
    val rid = g.publish(id, """{"name": "X", "cust": {"id": "1"}}""")
    assert(rid == "<noResourceId>")
    val m = g.metrics(id)
    assert(m("EventsProcessed") == 1)
    assert(m("SinkOperations") == 1, "eventually succeeded after simulated retryable errors")
    val notes = g.notifications()
    assert(notes.count(_.level == "WARN") == 3, "three retry warnings")
    // notification enrichment (pkg/notify/notify.go:20-159): each event
    // carries its emitting code origin as class.method:line
    assert(notes.filter(_.level == "WARN").forall(n =>
      n.origin.contains("Stream") && n.origin.contains(":")),
      s"retry warnings must carry origin, got: ${notes.map(_.origin)}")
    g.shutdown()
  }

  test("unretryable simulated errors propagate (executor_test.go hook matrix)") {
    val g = new Geist(spark, RuntimeConfig(retryBackoffBaseMs = 1))
    val sink =
      """{"type": "void", "config": {"properties": [
        |  {"key": "simulateError", "value": "alwaysUnretryable"}]}}""".stripMargin
    val id = g.registerStream(apiSpec("rt", "unretry", sink = sink)).fold(e => fail(e.msg), identity)
    intercept[Exception] { g.publish(id, """{"name": "X"}""") }
    g.shutdown()
  }

  test("houe=fail fails the batch on regexp non-match; default discards (I4)") {
    def spec(houe: String, suffix: String) =
      s"""{
         |  "namespace": "rt", "streamIdSuffix": "$suffix", "version": 1,
         |  "description": "...",
         |  "ops": {"handlingOfUnretryableEvents": "$houe"},
         |  "source": {"type": "geistapi"},
         |  "transform": {
         |    "extractFields": [{"fields": [{"id": "line", "jsonPath": "payload", "type": "string"}]}],
         |    "regexp": {"expression": "^(?P<n>\\\\d+)$$", "field": "line"}
         |  },
         |  "sink": {"type": "void"}
         |}""".stripMargin
    val g = new Geist(spark, RuntimeConfig(retryBackoffBaseMs = 1))
    val failId = g.registerStream(spec("fail", "houefail")).fold(e => fail(e.msg), identity)
    intercept[Exception] { g.publish(failId, """{"payload": "not-a-number"}""") }
    val discId = g.registerStream(spec("discard", "houedisc")).fold(e => fail(e.msg), identity)
    g.publish(discId, """{"payload": "also-not"}""") // silently discarded
    assert(g.metrics(discId)("EventsProcessed") == 1)
    g.shutdown()
  }

  test("houe=dlq writes unretryable events to the dead-letter table (I4)") {
    val root = tmpDir()
    val spec =
      """{
        |  "namespace": "rt", "streamIdSuffix": "dlq", "version": 1,
        |  "description": "...",
        |  "ops": {"handlingOfUnretryableEvents": "dlq"},
        |  "source": {"type": "geistapi"},
        |  "transform": {
        |    "extractFields": [{"fields": [{"id": "line", "jsonPath": "payload", "type": "string"}]}],
        |    "regexp": {"expression": "^(?P<n>\\d+)$", "field": "line"}
        |  },
        |  "sink": {"type": "void"}
        |}""".stripMargin
    val g = new Geist(spark, RuntimeConfig(retryBackoffBaseMs = 1, sinkRoot = Some(root)))
    val id = g.registerStream(spec).fold(e => fail(e.msg), identity)
    g.publish(id, """{"payload": "123"}""") // matches → no DLQ entry
    g.publish(id, """{"payload": "not-a-number"}""") // → DLQ
    val dlq = spark.read.parquet(s"$root/${id}__dlq")
    assert(dlq.count() == 1, "exactly the non-matching event must reach the DLQ")
    g.shutdown()
  }

  test("metrics accounting across publishes (H1, geist_test.go golden counters)") {
    val g = new Geist(spark, RuntimeConfig(retryBackoffBaseMs = 1))
    val id = g.registerStream(apiSpec("rt", "metrics")).fold(e => fail(e.msg), identity)
    (1 to 5).foreach(i => g.publish(id, s"""{"name": "E$i", "cust": {"id": "c$i"}}"""))
    val m = g.metrics(id)
    assert(m("EventsProcessed") == 5)
    assert(m("Microbatches") == 5)
    assert(m("EventsStoredInSink") == 5)
    assert(m("SinkOperations") == 5)
    assert(m("BytesIngested") > 0)
    g.shutdown()
  }

  test("protected registry ids rejected; spec table bootstrap (J1)") {
    val specTable = tmpDir() + "/specs"
    val g = new Geist(spark, RuntimeConfig(specTablePath = Some(specTable), retryBackoffBaseMs = 1))
    assert(g.registerStream(apiSpec("geist", "specs")).isLeft, "registry stream id is protected")
    assert(g.registerStream(apiSpec("rt", "boot", 4)).isRight)
    g.shutdown()
    // a fresh instance bootstraps the persisted spec via the public API
    val g2 = new Geist(spark, RuntimeConfig(specTablePath = Some(specTable), retryBackoffBaseMs = 1))
    g2.bootstrap()
    assert(g2.getStreamSpec("rt-boot").exists(_.version == 4))
    assert(g2.deployedIds.contains("rt-boot"), "bootstrap deploys enabled streams")
    g2.shutdown()
  }

  test("a spec that parses but cannot compile is rejected without killing the running stream") {
    val g = new Geist(spark, RuntimeConfig(retryBackoffBaseMs = 1))
    assert(g.registerStream(apiSpec("rt", "guard", 1)).isRight)
    assert(g.deployedIds.contains("rt-guard"))
    // an operator-less array query is unsupported gjson syntax →
    // compile-time rejection
    val poisoned = apiSpec("rt", "guard", 2)
      .replace("\"jsonPath\": \"cust.id\"", "\"jsonPath\": \"cust.#(id).x\"")
    val res = g.registerStream(poisoned)
    assert(res.isLeft, "uncompilable spec must be rejected as a validation error")
    assert(res.left.exists(_.msg.contains("failed to compile")))
    assert(g.deployedIds.contains("rt-guard"), "running v1 stream must survive")
    assert(g.getStreamSpec("rt-guard").get.version == 1, "poisoned spec must not be persisted")
    g.shutdown()
  }

  test("opsPerEnv overrides resolve at deployment (houe per env)") {
    // houe=fail only in prod: a regexp non-match must throw in prod but
    // discard in dev.
    def spec(ns: String) =
      s"""{
         |  "namespace": "$ns", "streamIdSuffix": "envops", "version": 1,
         |  "description": "...",
         |  "ops": {"handlingOfUnretryableEvents": "discard"},
         |  "opsPerEnv": {"prod": {"handlingOfUnretryableEvents": "fail"}},
         |  "source": {"type": "geistapi"},
         |  "transform": {
         |    "extractFields": [{"fields": [{"id": "line", "jsonPath": "p", "type": "string"}]}],
         |    "regexp": {"expression": "^(?P<n>\\\\d+)$$", "field": "line"}
         |  },
         |  "sink": {"type": "void"}
         |}""".stripMargin
    val prod = new Geist(spark, RuntimeConfig(env = "prod", retryBackoffBaseMs = 1))
    val idP = prod.registerStream(spec("rtp")).fold(e => fail(e.msg), identity)
    intercept[Exception] { prod.publish(idP, """{"p": "oops"}""") }
    prod.shutdown()
    val dev = new Geist(spark, RuntimeConfig(env = "dev", retryBackoffBaseMs = 1))
    val idD = dev.registerStream(spec("rtd")).fold(e => fail(e.msg), identity)
    dev.publish(idD, """{"p": "oops"}""") // discarded, no throw
    dev.shutdown()
  }

  test("enrichEvent injects fields by path (F11, geist_test.go:386-398)") {
    val out = Geist.setJsonField("""{"a": 1}""", "meta.source", "hook")
    assert(out == """{"a":1,"meta":{"source":"hook"}}""")
  }

  test("checkpointed stream resumes offsets after restart (I1)") {
    val ckpt = tmpDir()
    def freshGeist() = new Geist(spark, RuntimeConfig(retryBackoffBaseMs = 1,
      checkpointRoot = Some(ckpt)))
    val spec =
      """{
        |  "namespace": "rt", "streamIdSuffix": "ckpt", "version": 1,
        |  "description": "...",
        |  "source": {"type": "eventsim", "config": {"customConfig": {
        |    "simResolutionMilliseconds": 200,
        |    "eventSpec": {"fields": [{"field": "n", "randomizedValue": {"type": "int", "min": 1, "max": 9}}]}
        |  }}},
        |  "transform": {"extractFields": [{"fields": [{"id": "n", "jsonPath": "n", "type": "integer"}]}]},
        |  "sink": {"type": "void"}
        |}""".stripMargin
    val g1 = freshGeist()
    val id = g1.registerStream(spec).fold(e => fail(e.msg), identity)
    val deadline = System.currentTimeMillis() + 20000
    while (g1.metrics(id)("Microbatches") < 2 && System.currentTimeMillis() < deadline)
      Thread.sleep(200)
    assert(g1.metrics(id)("Microbatches") >= 2)
    g1.shutdown()
    // offsets were checkpointed: the rate source persists its last value
    val offsetsDir = new java.io.File(s"$ckpt/$id/offsets")
    assert(offsetsDir.exists && offsetsDir.listFiles().nonEmpty,
      "checkpoint offsets must be written")
    def batchIds() = offsetsDir.listFiles().map(_.getName).filter(_.forall(_.isDigit)).map(_.toInt)
    val lastBatch = batchIds().max
    // a fresh engine instance resumes from the checkpoint, not batch 0
    val g2 = freshGeist()
    g2.registerStream(spec).fold(e => fail(e.msg), identity)
    val deadline2 = System.currentTimeMillis() + 20000
    while (batchIds().max <= lastBatch &&
      System.currentTimeMillis() < deadline2) Thread.sleep(200)
    assert(batchIds().max > lastBatch,
      "restarted query must continue the checkpointed batch sequence")
    g2.shutdown()
  }

  test("J2 cross-driver sync: upgrades hot-swap, disables undeploy (supervisor.go:281-317)") {
    val specTable = tmpDir() + "/specs"
    def driver() = new Geist(spark, RuntimeConfig(specTablePath = Some(specTable), retryBackoffBaseMs = 1))
    val g1 = driver()
    assert(g1.registerStream(apiSpec("rt", "sync", 1)).isRight)
    // a second driver picks the spec up from the shared registry table
    val g2 = driver()
    g2.bootstrap()
    assert(g2.deployedIds.contains("rt-sync"))
    assert(g2.getStreamSpec("rt-sync").get.version == 1)
    // driver 1 upgrades; driver 2 reconciles to the new version
    assert(g1.registerStream(apiSpec("rt", "sync", 2)).isRight)
    g2.sync()
    assert(g2.getStreamSpec("rt-sync").get.version == 2)
    assert(g2.deployedIds.contains("rt-sync"))
    // driver 1 disables; driver 2 undeploys on sync
    assert(g1.registerStream(apiSpec("rt", "sync", 3, extra = """"disabled": true,""")).isRight)
    g2.sync()
    assert(!g2.deployedIds.contains("rt-sync"), "disabled spec must undeploy on sync")
    g1.shutdown(); g2.shutdown()
  }

  test("J2 push channel: registry appends from another driver trigger sync without polling " +
      "(adminspec.go:19-63 geist-adminevents)") {
    val specTable = tmpDir() + "/specs"
    def driver() = new Geist(spark, RuntimeConfig(specTablePath = Some(specTable), retryBackoffBaseMs = 1))
    val g1 = driver()
    val g2 = driver()
    val watch = g2.watchRegistry(triggerMs = 100)
    def await(cond: => Boolean, what: String): Unit = {
      val deadline = System.currentTimeMillis() + 30000
      while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(cond, s"push-mode sync never observed: $what")
    }
    // driver 1 registers; driver 2's admin stream deploys it, no sync() call
    assert(g1.registerStream(apiSpec("rt", "push", 1)).isRight)
    await(g2.deployedIds.contains("rt-push"), "initial deploy")
    // upgrade propagates as a hot-swap
    assert(g1.registerStream(apiSpec("rt", "push", 2)).isRight)
    await(g2.getStreamSpec("rt-push").exists(_.version == 2), "hot-swap to v2")
    assert(g2.deployedIds.contains("rt-push"))
    // disable propagates as an undeploy
    assert(g1.registerStream(apiSpec("rt", "push", 3, extra = """"disabled": true,""")).isRight)
    await(!g2.deployedIds.contains("rt-push"), "undeploy of disabled spec")
    assert(watch.isActive, "admin watch must survive the reconciliations it triggers")
    g1.shutdown(); g2.shutdown()
    assert(!watch.isActive, "shutdown must stop the admin watch query")
  }

  test("I3 self-heal: failed stream restarts with backoff and recovers (executor.go:119-158)") {
    val g = new Geist(spark, RuntimeConfig(retryBackoffBaseMs = 1, streamRetryBackoffBaseMs = 100))
    val spec =
      """{
        |  "namespace": "rt", "streamIdSuffix": "heal", "version": 1,
        |  "description": "...",
        |  "ops": {"maxEventProcessingRetries": 1},
        |  "source": {"type": "eventsim", "config": {"customConfig": {
        |    "simResolutionMilliseconds": 300,
        |    "eventGeneration": {"type": "random", "minCount": 1, "maxCount": 2},
        |    "eventSpec": {"fields": [{"field": "name", "predefinedValues": [{"value": "PING"}]}]}
        |  }}},
        |  "transform": {"extractFields": [{"fields": [{"id": "name", "jsonPath": "name"}]}]},
        |  "sink": {"type": "void", "config": {"properties": [
        |    {"key": "simulateError", "value": "alwaysRetryable"},
        |    {"key": "maxErrors", "value": "3"}]}}
        |}""".stripMargin
    val id = g.registerStream(spec).fold(e => fail(e.msg), identity)
    // batch 1 exhausts event-level retries (2 of the 3 simulated errors) →
    // the query dies retryably → the supervisor restarts it after backoff →
    // the restarted batch consumes the last error on the SAME sink instance
    // (state survives restart, like the reference's loader) and then loads.
    val deadline = System.currentTimeMillis() + 30000
    val notes = scala.collection.mutable.ArrayBuffer.empty[graft.runtime.NotificationEvent]
    while (g.metrics(id)("SinkOperations") < 1 && System.currentTimeMillis() < deadline) {
      notes ++= g.notifications(); Thread.sleep(250)
    }
    notes ++= g.notifications()
    assert(g.metrics(id)("SinkOperations") >= 1,
      s"stream must recover and load after self-heal restart; notes=${notes.map(_.message)}")
    assert(notes.exists(n => n.level == "WARN" && n.message.startsWith("stream restart (#1) in")),
      s"restart notification expected, got: ${notes.map(_.message)}")
    assert(notes.filter(_.level == "ERROR").forall(_.stack.nonEmpty),
      "ERROR notifications must carry a stack excerpt")
    assert(g.deployedIds.contains(id))
    g.shutdown()
  }

  test("I3: unretryable failure with houe=fail stays down — no self-heal (executor.go Run loop)") {
    val g = new Geist(spark, RuntimeConfig(retryBackoffBaseMs = 1, streamRetryBackoffBaseMs = 50))
    val spec =
      """{
        |  "namespace": "rt", "streamIdSuffix": "staydown", "version": 1,
        |  "description": "...",
        |  "ops": {"handlingOfUnretryableEvents": "fail"},
        |  "source": {"type": "eventsim", "config": {"customConfig": {
        |    "simResolutionMilliseconds": 300,
        |    "eventSpec": {"fields": [{"field": "name", "predefinedValues": [{"value": "PING"}]}]}
        |  }}},
        |  "transform": {"extractFields": [{"fields": [{"id": "name", "jsonPath": "name"}]}]},
        |  "sink": {"type": "void", "config": {"properties": [
        |    {"key": "simulateError", "value": "alwaysUnretryable"}]}}
        |}""".stripMargin
    val id = g.registerStream(spec).fold(e => fail(e.msg), identity)
    val deadline = System.currentTimeMillis() + 30000
    val notes = scala.collection.mutable.ArrayBuffer.empty[graft.runtime.NotificationEvent]
    while (!notes.exists(_.message.contains("manual restart required")) &&
      System.currentTimeMillis() < deadline) {
      notes ++= g.notifications(); Thread.sleep(250)
    }
    assert(notes.exists(n => n.level == "ERROR" && n.message.contains("manual restart required")),
      s"unretryable termination note expected, got: ${notes.map(_.message)}")
    assert(!notes.exists(_.message.startsWith("stream restart")), "must not self-heal on houe=fail")
    assert(g.metrics(id)("SinkOperations") == 0)
    g.shutdown()
  }

  test("eventsim stream deploys, processes batches, and hot-swaps (A2/I7)") {
    val g = new Geist(spark, RuntimeConfig(retryBackoffBaseMs = 1))
    val spec =
      """{
        |  "namespace": "rt", "streamIdSuffix": "sim", "version": 1,
        |  "description": "...",
        |  "source": {"type": "eventsim", "config": {"customConfig": {
        |    "simResolutionMilliseconds": 500,
        |    "eventGeneration": {"type": "random", "minCount": 1, "maxCount": 3},
        |    "eventSpec": {"fields": [
        |      {"field": "name", "predefinedValues": [{"value": "PING"}]},
        |      {"field": "n", "randomizedValue": {"type": "int", "min": 1, "max": 5}}]}
        |  }}},
        |  "transform": {"extractFields": [{"fields": [
        |    {"id": "name", "jsonPath": "name"},
        |    {"id": "n", "jsonPath": "n", "type": "integer"}]}]},
        |  "sink": {"type": "void"}
        |}""".stripMargin
    val id = g.registerStream(spec).fold(e => fail(e.msg), identity)
    val deadline = System.currentTimeMillis() + 20000
    while (g.metrics(id)("Microbatches") < 2 && System.currentTimeMillis() < deadline)
      Thread.sleep(250)
    assert(g.metrics(id)("Microbatches") >= 2, "streaming query must process micro-batches")
    assert(g.metrics(id)("EventsProcessed") > 0)
    // hot-swap with v2 stops the old query and redeploys
    assert(g.registerStream(spec.replace("\"version\": 1", "\"version\": 2")).isRight)
    assert(g.getStreamSpec(id).get.version == 2)
    g.shutdown()
  }

  // ---------------------------------------------------------------------
  // H1 metric-delta golden matrix (executor_test.go:515-610): after every
  // processed batch the FULL counter snapshot must equal the expected map —
  // the reference's assertEqualMetrics style, which catches any
  // counter-accounting drift (e.g. BytesIngested credited on the wrong
  // path) that a lone `> 0` assertion cannot.
  // ---------------------------------------------------------------------

  private def metricSpec(suffix: String, sink: String) =
    s"""{
       |  "namespace": "mt", "streamIdSuffix": "$suffix", "version": 1,
       |  "description": "...",
       |  "source": {"type": "geistapi"},
       |  "transform": {
       |    "excludeEventsWith": [{"key": "name", "values": ["USELESS_EVENT"]}],
       |    "extractFields": [{"fields": [{"id": "name", "jsonPath": "name"}]}]
       |  },
       |  "sink": $sink
       |}""".stripMargin

  /** Snapshot minus the duration counters (the reference's Metrics compare
    * also omits them — they are monotonic wall-clock, not golden-able).
    */
  private def counters(sup: graft.runtime.Supervisor, id: String): Map[String, Long] =
    sup.metrics(id).snapshot -- Seq("EventProcessingTimeMicros", "SinkProcessingTimeMicros")

  test("metric goldens: happy path, excluded batch, multi-event batch (executor_test.go:502-534,576-610)") {
    val sup = new graft.runtime.Supervisor(spark, RuntimeConfig(retryBackoffBaseMs = 1))
    val id = sup.registerStream(metricSpec("golden", """{"type": "void"}"""))
      .fold(e => fail(e.msg), identity)
    val tiny = """{"name": "GREAT_EVENT"}"""
    val tiny2 = """{"name": "COOL_EVENT_2"}"""
    val useless = """{"name": "USELESS_EVENT"}"""

    // happy path: ingested bytes == processed bytes, one sink op
    sup.publish(id, tiny)
    assert(counters(sup, id) == Map(
      "Microbatches" -> 1L, "EventsProcessed" -> 1L,
      "BytesProcessed" -> tiny.length.toLong,
      "EventsStoredInSink" -> 1L, "SinkOperations" -> 1L,
      "BytesIngested" -> tiny.length.toLong))

    // nothing to transform: processed counters advance, sink counters and
    // BytesIngested stay flat — no load attempt for an all-excluded batch
    sup.publish(id, useless)
    assert(counters(sup, id) == Map(
      "Microbatches" -> 2L, "EventsProcessed" -> 2L,
      "BytesProcessed" -> (tiny.length + useless.length).toLong,
      "EventsStoredInSink" -> 1L, "SinkOperations" -> 1L,
      "BytesIngested" -> tiny.length.toLong))

    // multi-event micro-batch (TestExecutorProcessMultiEvent): both events'
    // bytes ingested, ONE sink operation for the whole batch
    val s = spark
    import s.implicits._
    sup.stream(id).get.processBatch(Seq(tiny, tiny2).toDF("value"))
    assert(counters(sup, id) == Map(
      "Microbatches" -> 3L, "EventsProcessed" -> 4L,
      "BytesProcessed" -> (2 * tiny.length + useless.length + tiny2.length).toLong,
      "EventsStoredInSink" -> 3L, "SinkOperations" -> 2L,
      "BytesIngested" -> (2 * tiny.length + tiny2.length).toLong))
    sup.shutdownAll()
  }

  test("job-count gate: a micro-batch stays within its job budget (streaming throughput floor)") {
    // per-batch Spark job count is the micro-batch throughput floor at
    // high event rates (SCALE.md "Streaming runtime"): the round-8 fusion
    // took a batch from 6 jobs to 3 — the hook aggregation carries action
    // tallies + processed counters + ingested bytes, the sink probe
    // carries batch size + min row key and materializes the cache the
    // write reuses. This pins the budget so an innocent extra .count()
    // can't silently tax every micro-batch at every deployment.
    val keyedSink =
      """{"type": "bigtable", "config": {"customConfig": {"tables": [
        |  {"name": "t", "rowKey": {"keys": ["name"], "delimiter": "#"},
        |   "columnFamilies": [{"name": "d", "columnQualifiers": [
        |     {"id": "name", "name": "n"}]}]}
        |]}}}""".stripMargin
    def jobsPerPublish(hook: Boolean): Int = {
      val sup = new graft.runtime.Supervisor(spark, RuntimeConfig(
        sinkRoot = Some(tmpDir()), retryBackoffBaseMs = 1,
        preTransformHook =
          if (hook) Some((_: String, e: String) => graft.runtime.Hooks.Proceed(e))
          else None))
      val id = sup.registerStream(metricSpec(s"jobs$hook", keyedSink))
        .fold(e => fail(e.msg), identity)
      sup.publish(id, """{"name": "WARM_EVENT"}""") // untimed plan warm-up
      val jobs = SparkTestBase.countJobs {
        sup.publish(id, """{"name": "GREAT_EVENT"}""")
      }
      sup.shutdownAll()
      jobs
    }
    val hookJobs = jobsPerPublish(hook = true)
    val plainJobs = jobsPerPublish(hook = false)
    // measured composition (both modes): 3 ACTIONS — [hook aggregation |
    // fused stats] + sink probe + parquet write — which AQE executes as 7
    // scheduler jobs (each aggregate's shuffle runs as 2 stage-
    // materialization sub-jobs plus the result job; the narrow write is
    // 1). Budget 8 leaves one job of engine variance while still failing
    // a regression to per-concern actions (6 actions ≈ 13+ jobs).
    assert(hookJobs <= 8, s"hook-mode micro-batch used $hookJobs jobs (budget 8 ≈ 3 actions)")
    assert(plainJobs <= 8, s"hook-free micro-batch used $plainJobs jobs (budget 8 ≈ 3 actions)")
  }

  test("metric goldens: failed sink loads advance processed counters only (executor_test.go:536-575)") {
    val sup = new graft.runtime.Supervisor(spark, RuntimeConfig(retryBackoffBaseMs = 1))
    val tiny = """{"name": "GREAT_EVENT"}"""
    val processedOnly = Map(
      "Microbatches" -> 1L, "EventsProcessed" -> 1L,
      "BytesProcessed" -> tiny.length.toLong,
      "EventsStoredInSink" -> 0L, "SinkOperations" -> 0L,
      "BytesIngested" -> 0L)

    // unretryable load error (MockLoader_Error leg)
    val idU = sup.registerStream(metricSpec("goldenu",
      """{"type": "void", "config": {"properties": [
        |  {"key": "simulateError", "value": "alwaysUnretryable"}]}}""".stripMargin))
      .fold(e => fail(e.msg), identity)
    intercept[Exception] { sup.publish(idU, tiny) }
    assert(counters(sup, idU) == processedOnly)

    // retryable load error, retries exhausted (MockLoader_RetryableError leg)
    val idR = sup.registerStream(metricSpec("goldenr",
      """{"type": "void", "config": {"properties": [
        |  {"key": "simulateError", "value": "alwaysRetryable"}]}}""".stripMargin))
      .fold(e => fail(e.msg), identity)
    intercept[graft.runtime.RetryableStreamException] { sup.publish(idR, tiny) }
    assert(counters(sup, idR) == processedOnly)
    sup.shutdownAll()
  }
}
