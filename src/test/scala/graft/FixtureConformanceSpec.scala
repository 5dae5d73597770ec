package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import com.fasterxml.jackson.databind.ObjectMapper

import graft.compile.SpecCompiler
import graft.sinks.SinkCompiler
import graft.spec.StreamSpec

/** Verbatim conformance against the reference's fixture corpus: every spec
  * JSON under /root/reference/test/specs and the event fixtures under
  * /root/reference/test/events are loaded from disk (not re-authored
  * inline) and run end-to-end through parse → compile → transform → sink
  * stage, asserting the literal outputs the reference's own tests pin
  * (entity/transform/transformer_test.go, entity/spec_test.go).
  */
class FixtureConformanceSpec extends AnyFunSuite {
  import SparkTestBase.spark
  import spark.implicits._

  private val specDir = "/root/reference/test/specs/"
  private val eventDir = "/root/reference/test/events/"
  private val mapper = new ObjectMapper()

  private def read(path: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")

  private def specFromFile(name: String): StreamSpec =
    StreamSpec.parseUnsafe(read(specDir + name))

  private def eventsDf(events: String*): DataFrame = events.toSeq.toDF("value")

  private def sinkTables(spec: StreamSpec) =
    SinkCompiler.parseTables(spec.sink.config.customConfig.orNull)

  private val allSpecFiles = Seq(
    "apisrc-bigtablesink-fooround.json",
    "apisrc-bigtablesink-minimal.json",
    "kafkasrc-bigquerysink-fooevents.json",
    "kafkasrc-bigtablesink-featurex.json",
    "kafkasrc-bigtablesink-multitable-session.json",
    "kafkasrc-bigtablesink-user.json",
    "kafkasrc-bigtablesink-xch-eur.json",
    "pubsubsrc-firestoresink-regspec.json",
    "pubsubsrc-kafkasink-foologs.json",
    "pubsubsrc-regexp-barusage-voidsink.json",
    "pubsubsrc-regexp-reqs-voidsink.json")

  test("every reference fixture spec parses and compiles (entity/spec_test.go)") {
    allSpecFiles.foreach { f =>
      val spec = specFromFile(f)
      assert(spec.version >= 1, s"$f: version")
      assert(spec.id == s"${spec.namespace}-${spec.streamIdSuffix}", s"$f: id")
      val p = SpecCompiler.compile(spec)
      assert(p.branches.nonEmpty, s"$f: no compiled branches")
    }
  }

  // ------------------------------------------------- apisrc-bigtablesink-fooround

  test("fooround fixture: FRT branch extraction + open-ended nameFromId qualifier " +
    "(extractor_test.go:39, entity/spec.go nameFromId)") {
    val spec = specFromFile("apisrc-bigtablesink-fooround.json")
    val event = read(eventDir + "foo_round_tracking.json")
    val p = SpecCompiler.compile(spec)
    val out = p(eventsDf(event)).toMap

    // event is FOO_ROUND_TRACKING: the FRF branch must not fire
    assert(out("fields_0").count() == 0)
    val frt = out("fields_1").collect()
    assert(frt.length == 1)
    // rawEventFRT carries no "type" → binary, the reference's []byte default
    assert(frt(0).getString(0) == "a9f5e7e7-6020-4eb8-ad16-00e27c3b1ab6")
    assert(frt(0).getLong(1) == 1L)
    assert(new String(frt(0).getAs[Array[Byte]](2), "UTF-8") == event)

    // sink: rowKey = fooRoundId; qualifier "frf" fixed-name, "frt-" dynamic
    val tables = sinkTables(spec)
    assert(tables.head.name == "geisttest_apitobigtable_fooround")
    val q = tables.head.qualifiers
    assert(q.map(_.id) == Seq("rawEventFRF", "rawEventFRT"))
    assert(q(0).name == "frf")
    assert(q(1).name.isEmpty && q(1).nameFromIdPrefix == "frt-" &&
      q(1).nameFromIdSuffix == "fooTrackingId")

    val union = out("fields_0").unionByName(out("fields_1"), allowMissingColumns = true)
    val staged = SinkCompiler.tableStage(tables.head)(union).collect()
    assert(staged.length == 1)
    val row = staged(0)
    assert(row.getAs[String]("key") == "a9f5e7e7-6020-4eb8-ad16-00e27c3b1ab6")
    assert(row.getAs[Array[Byte]]("frf") == null)
    val dyn = row.getAs[Map[String, Array[Byte]]]("frt-cols")
    assert(dyn.keySet == Set("frt-1"))
    assert(new String(dyn("frt-1"), "UTF-8") == event)
  }

  // ------------------------------------------------ kafkasrc-bigtablesink-featurex

  test("featurex fixture: extractItemsFromArray keyed map + keysInMap row keys " +
    "(transformer_test.go:468-487)") {
    val spec = specFromFile("kafkasrc-bigtablesink-featurex.json")
    val event = read(eventDir + "featurex_config_snapshot.json")
    val p = SpecCompiler.compile(spec)
    val out = p(eventsDf(event)).toMap.apply("arrayItemsMapId")

    val items = out.collect()(0).getMap[String, String](0).toMap
    assert(items.keySet == Set("cust1#prod_y", "cust1#prod_z", "cust2#prod_x"))
    // values are the raw array items, verbatim (gjson Raw semantics):
    // structurally identical to the source array elements
    val data = mapper.readTree(event).get("data")
    Seq(0, 1, 2).foreach { i =>
      val item = data.get(i)
      val key = item.get("custId").asText + "#" + item.get("prodId").asText
      assert(mapper.readTree(items(key)) == item, s"item $key not verbatim")
    }

    // rowKey predefined keysInMap: one sink row per map entry
    val tables = sinkTables(spec)
    assert(tables.head.rowKey.predefined == "keysInMap")
    val keyed = SinkCompiler.keysInMapFrame(out, "arrayItemsMapId")
    assert(keyed.select("key").as[String].collect().sorted.toSeq ==
      Seq("cust1#prod_y", "cust1#prod_z", "cust2#prod_x"))
  }

  // ------------------------------------------------- apisrc-bigtablesink-minimal

  test("minimal fixture: raw-event passthrough + timestampIso row key") {
    val spec = specFromFile("apisrc-bigtablesink-minimal.json")
    val event = read(eventDir + "foo_session_begin_ex1.json")
    val p = SpecCompiler.compile(spec)
    val out = p(eventsDf(event)).toMap.apply("fields")
    assert(out.collect() sameElements Array(Row(event)))

    val tables = sinkTables(spec)
    assert(tables.head.rowKey.predefined == "timestampIso")
    val staged = SinkCompiler.tableStage(tables.head)(out).collect()(0)
    assert(staged.getAs[String]("event") == event)
    assert(staged.getAs[String]("key")
      .matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}Z"""))
  }

  // --------------------------------------------------- kafkasrc-bigtablesink-user

  test("user fixture: typed extraction + composite delimited row key") {
    val spec = specFromFile("kafkasrc-bigtablesink-user.json")
    val event = read(eventDir + "foo_session_begin_ex1.json")
    val p = SpecCompiler.compile(spec)
    val out = p(eventsDf(event)).toMap.apply("fields")
    assert(out.collect()(0) == Row("somecust", "855f4462-05ab-4134-9c82-27d07e0e5a63",
      89L, "somename", "SEK"))

    val staged = SinkCompiler.tableStage(sinkTables(spec).head)(out).collect()(0)
    assert(staged == Row("somecust#89", "855f4462-05ab-4134-9c82-27d07e0e5a63",
      "somename", "SEK"))
  }

  // ------------------------------------- kafkasrc-bigtablesink-multitable-session

  test("multitable-session fixture: branch split + per-table whitelist routing " +
    "(transformer_test.go:38-64)") {
    val spec = specFromFile("kafkasrc-bigtablesink-multitable-session.json")
    val begin = read(eventDir + "foo_session_begin_ex1.json")
    val end = read(eventDir + "foo_session_end_ex1.json")
    val p = SpecCompiler.compile(spec)
    val out = p(eventsDf(begin, end)).toMap

    // the fixture's pId carries NO type → string (unlike the typed inline
    // variant in TransformConformanceSpec)
    val b = out("fields_0").collect()
    assert(b.length == 1)
    assert(b(0) == Row("FOO_SESSION_BEGIN", "somecust",
      "855f4462-05ab-4134-9c82-27d07e0e5a63", "89", "somename", "SEK"))
    val e = out("fields_1").collect()
    assert(e.length == 1)
    // the end-event fixture spells the key pHostIP while the spec path is
    // pHostIp — our clean-room gjson subset is case-sensitive, so the field
    // extracts as the missing-field default "" (the reference test prints
    // but never asserts this field)
    assert(e(0) == Row("FOO_SESSION_END", "somecust",
      "1572608299710-89-KD7FJAGE7C0GO", "89", ""))

    val union = out("fields_0").unionByName(out("fields_1"), allowMissingColumns = true)
    val tables = sinkTables(spec)
    assert(tables.map(_.name) == Seq("p_master_data", "s_master_data"))

    val pMaster = SinkCompiler.tableStage(tables(0))(union).collect()
    assert(pMaster.length == 1)
    assert(pMaster(0) == Row("somecust#89", "855f4462-05ab-4134-9c82-27d07e0e5a63",
      "somename", "SEK"))

    val sMaster = SinkCompiler.tableStage(tables(1))(union).collect()
    assert(sMaster.length == 1)
    assert(sMaster(0) == Row("1572608299710-89-KD7FJAGE7C0GO#somecust", "89", ""))
  }

  // --------------------------------------------------- kafkasrc-bigtablesink-xch-eur

  test("xch-eur fixture: array-query conditional routing on the real event " +
    "(transformer_test.go:374-409)") {
    val spec = specFromFile("kafkasrc-bigtablesink-xch-eur.json")
    val p = SpecCompiler.compile(spec)
    val fileEvent = read(eventDir + "xch_rates_updated.json")
    val applicable =
      """{"name":"XCH_RATES_UPDATED","version":"1.0","ts":"2099-12-07T23:21:43.735Z","id":"c84fc871-c8cb-4c8b-8a09-f4ba969ac843","data":[{"base":"EUR","rates":{"HRK":0.14726,"CHF":1}}]}"""
    val nonApplicable = applicable.replace("\"EUR\"", "\"CHF\"").replace("2099", "2059")

    val rows = p(eventsDf(fileEvent, applicable, nonApplicable)).toMap
      .apply("fields").collect()
    assert(rows.length == 2)
    val byDate = rows.map(r => r.getString(1) -> r.getString(0)).toMap
    assert(byDate.keySet == Set("2019-12-07T13:21:42.615Z", "2099-12-07T23:21:43.735Z"))
    // compact literal event: verbatim raw extraction
    assert(byDate("2099-12-07T23:21:43.735Z") == """{"HRK":0.14726,"CHF":1}""")
    // file event: EUR rates block, verbatim (structural equality with the
    // source node; exact SEK spot value pinned)
    val eurRates = mapper.readTree(byDate("2019-12-07T13:21:42.615Z"))
    assert(eurRates == mapper.readTree(fileEvent).get("data").get(1).get("rates"))
    assert(eurRates.get("SEK").asDouble == 0.095203)

    // row key = eventDate
    val staged = SinkCompiler.tableStage(sinkTables(spec).head)(
      p(eventsDf(applicable)).toMap.apply("fields")).collect()(0)
    assert(staged.getAs[String]("key") == "2099-12-07T23:21:43.735Z")
    assert(staged.getAs[String]("rates") == """{"HRK":0.14726,"CHF":1}""")
  }

  test("regexp validation messages match the reference verbatim (entity/spec_test.go:79-93)") {
    val raw = read(specDir + "pubsubsrc-regexp-reqs-voidsink.json")
    def withExpr(e: String): String =
      raw.replaceFirst("\"expression\":\\s*\"[^\"]*(?:\\\\.[^\"]*)*\"",
        java.util.regex.Matcher.quoteReplacement("\"expression\": \"" + e + "\""))
    // groupless expressions fail with the reference's exact message
    Seq("this should error,,,", "^.*").foreach { e =>
      val err = intercept[graft.spec.SpecValidationException] {
        StreamSpec.parseUnsafe(withExpr(e))
      }
      assert(err.getMessage ==
        s"no groupings where found in regular expression $e")
    }
    // a named group restores validity
    val ok = StreamSpec.parseUnsafe(withExpr("^(?P<testGroup>)"))
    assert(ok.transform.regexp.get.groups == Seq("testGroup"))
  }

  // ------------------------------------------------ pubsubsrc-regexp-reqs-voidsink

  test("regexp reqs fixture: exact regexppayload from the spec file " +
    "(transformer_test.go:66-92)") {
    val spec = specFromFile("pubsubsrc-regexp-reqs-voidsink.json")
    val sdJson =
      """{"insertId":"a6bf3a8d-4fe0-40d9-bfce-0ebe5bdbdb86","labels":{"foo":"bar"},"logName":"fooservice/accesslog","rcvTimestamp":"2020-06-16T12:06:31.869709059Z","textPayload":"cust1-loc1.somesite.com|11.222.123.123|https://<lots more stuff>|<ua info...>|-|-|-|[17/Jun/2020:09:10:25 +0200]<|GET /some/reqPath;more-stuff... HTTP/1.1|200|996|19","timestamp":"2020-06-16T12:06:26.723709116Z"}"""
    val p = SpecCompiler.compile(spec)
    val rows = p(eventsDf(sdJson)).toMap.apply("fields").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("regexppayload") ==
      """{"customer":"cust1","httpResponse":"200","httpVerb":"GET","ip":"11.222.123.123","port":"","reqLoc":"loc1","reqPath":"/some/reqPath","ts":"2020-06-17T09:10:25+02:00"}""")
  }

  test("regexp reqs fixture: removing extractFields is a compile error " +
    "(transformer_test.go:93-98 'wanted field was not extracted')") {
    val spec = specFromFile("pubsubsrc-regexp-reqs-voidsink.json")
    val stripped = spec.copy(transform = spec.transform.copy(extractFields = Nil))
    val err = intercept[IllegalArgumentException] { SpecCompiler.compile(stripped) }
    assert(err.getMessage.contains("logEvent"))
  }

  // -------------------------------------------- pubsubsrc-regexp-barusage-voidsink

  test("regexp barusage fixture: exact regexppayload incl. comma-fraction time " +
    "(transformer_test.go:99-112)") {
    val spec = specFromFile("pubsubsrc-regexp-barusage-voidsink.json")
    val sdJson =
      """{"insertId":"d5696f71-9202-45e4-ba9d-40d467fb7516","labels":{"foo":"bar"},"logName":"fooservice/accesslog","rcvTimestamp":"2020-06-16T12:06:31.869709059Z","textPayload":"2020-07-01 16:06:57,695 +0200 INFO  [LOG_cust2.BarService.getUserInfo] (HTTP-126) Invocation took: 493 ms (492835106 ns)","timestamp":"2020-06-16T12:06:26.723709116Z"}"""
    val p = SpecCompiler.compile(spec)
    val rows = p(eventsDf(sdJson)).toMap.apply("fields").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("regexppayload") ==
      """{"customer":"cust2","logLevel":"INFO","method":"getUserInfo","responseTime":"493","ts":"2020-07-01T16:06:57+02:00"}""")
  }

  // ---------------------------------------------------- pubsubsrc-kafkasink-foologs

  test("foologs fixture: raw payload passthrough to kafka sink message") {
    val spec = specFromFile("pubsubsrc-kafkasink-foologs.json")
    val event = read(eventDir + "platform_change_event_ex1.json")
    val p = SpecCompiler.compile(spec)
    val out = p(eventsDf(event)).toMap.apply("fields")
    // "payload" carries no "type" → binary (reference []byte default)
    assert(new String(out.collect()(0).getAs[Array[Byte]]("payload"), "UTF-8") == event)

    // message.payloadFromId from the sink customConfig drives the outgoing
    // record value (G7)
    val payloadFrom = spec.sink.config.customConfig.get
      .get("message").get("payloadFromId").asText
    assert(payloadFrom == "payload")
    val msg = graft.sinks.KafkaSinkStage(payloadFrom)(out).collect()(0)
    assert(new String(msg.getAs[Array[Byte]]("value"), "UTF-8") == event)
  }

  // ------------------------------------------------- pubsubsrc-firestoresink-regspec

  test("regspec fixture: spec-registration stream extracts id parts + verbatim spec") {
    val spec = specFromFile("pubsubsrc-firestoresink-regspec.json")
    val event = read(eventDir + "geist_spec_minimal_api_void.json")
    val p = SpecCompiler.compile(spec)
    val out = p(eventsDf(event)).toMap.apply("fields")
    val row = out.collect()(0)
    assert(row == Row("geisttest", "eventlogstream", event))

    // firestore entityNameFromIds == composite delimited key synthesis
    val named = out.withColumn("entityName",
      SinkCompiler.rowKeyCol(SinkCompiler.RowKey(Seq("namespace", "idSuffix"), "-")))
    assert(named.select("entityName").as[String].collect()(0) == "geisttest-eventlogstream")
  }

  // ------------------------------------------------- kafkasrc-bigquerysink-fooevents

  test("fooevents fixture: typed casts, preset dynamic columns, insert-id dedup, " +
    "tableCreation (SinkSpec shape, now from the file)") {
    val spec = specFromFile("kafkasrc-bigquerysink-fooevents.json")
    val event = read(eventDir + "foo_round_tracking.json")
    assert(spec.opsFor("any").handlingOfUnretryableEvents == "fail")
    val p = SpecCompiler.compile(spec)
    // duplicate event: insertIdFromId dedup must keep one
    val out = p(eventsDf(event, event)).toMap.apply("fields")

    val tables = sinkTables(spec)
    val t = tables.head
    assert(t.name == "fooevents_v1" && t.insertIdFromId == "insertId")
    assert(t.partitionField == "dateIngested" && t.partitionType == "DAY")
    assert(t.clustering == Seq("customerId") && t.requirePartitionFilter)

    val staged = SinkCompiler.tableStage(t)(out)
    assert(staged.columns.toSeq == Seq("dateIngested", "eventDate", "customerId",
      "FOO_ROUND_BEGIN", "FOO_ROUND_FINISHED", "FOO_ROUND_TRACKING",
      "FOO_SESSION_BEGIN", "FOO_SESSION_END"))
    val rows = staged.collect()
    assert(rows.length == 1, "insert-id dedup must collapse the duplicate")
    val row = rows(0)
    assert(row.getAs[java.sql.Timestamp]("eventDate").getTime == 1581818496173L)
    assert(row.getAs[String]("customerId") == "somecust")
    assert(row.getAs[String]("FOO_ROUND_TRACKING") == event)
    assert(row.getAs[String]("FOO_ROUND_FINISHED") == null)
  }
}
