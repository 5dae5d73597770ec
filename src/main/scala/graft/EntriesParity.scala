package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.compile.SpecCompiler
import graft.spec.StreamSpec

/** Geist-parity tier: spec-compiled pipelines (filters, extraction, transforms, sinks) over the JSON event stream.
  *
  * One tier of the [[SparkEntry]] contract (round-6 split of the 5.5 kLoC
  * registration file: the `queries`/`oracleSql` MAPS are the contract, the
  * file layout is not). Every `queries` entry here must pair with an
  * `oracleSql` entry of the SAME name in the SAME file - derived oracles
  * (ns_pipeline_funnel) are composed in [[SparkEntry.oracleSql]].
  */
private[graft] object EntriesParity {
  import EntrySupport._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- geist parity: spec-compiled pipelines over the event stream ----
    "session_routing" -> ((s, dir) => {
      pipelineOf(routingSpec)(eventJson(s, dir)).head._2
    }),
    "event_split" -> ((s, dir) => {
      // C2: one event → N branch outputs with different schemas,
      // union-by-name with null fill for the single-sink shape.
      val branches = pipelineOf(routingSpec)(eventJson(s, dir)).map(_._2)
      branches.reduce(_.unionByName(_, allowMissingColumns = true))
    }),
    "b1_blacklist" -> ((s, dir) => pipelineOf(blacklistSpec)(eventJson(s, dir)).head._2),
    "b2_whitelist" -> ((s, dir) => pipelineOf(whitelistSpec)(eventJson(s, dir)).head._2),
    "b4_dnf_exclusion" -> ((s, dir) => pipelineOf(dnfSpec)(eventJson(s, dir)).head._2),
    "d1_items_from_array" -> ((s, dir) => {
      // Array source: two items per event, built from native columns.
      val e = t(s, dir, "events")
      val arrayJson = e.select(
        col("event_id").as("eid"),
        to_json(struct(array(
          struct(col("event_type").as("t"), concat(lit("u"), col("user_id")).as("u")),
          struct(col("event_type").as("t"), concat(lit("k"), get_json_object(col("props"), "$.k")).as("u"))
        ).as("xs"))).as("value"))
      // Keyed-map output (D1) exploded to rows for the sink/oracle shape.
      val p = pipelineOf(itemsSpec)
      p.applyWith(arrayJson, p.branches.head, "value", Seq("eid"))
        .select(col("eid"), explode(col("m")).as(Seq("item_key", "item_json")))
    }),
    "e1_regexp" -> ((s, dir) => pipelineOf(regexpSpec)(eventJson(s, dir)).head._2),
    "e2_timeconv" -> ((s, dir) => {
      // E2: Go-layout time conversion inside the regexp transform, over the
      // three layout families the reference exercises
      // (transformer_test.go:66-133): an access-log layout, the
      // comma-fraction quirk ("15:04:05.999" parsing "16:06:57,695"), and a
      // 12-hour AM/PM layout. Each event's ts is formatted into a log line,
      // pushed through the compiled pipeline, and converted back to
      // RFC3339 — DuckDB reproduces the conversion with strftime.
      val e = t(s, dir, "events")
      def stage(tag: String, sparkFmt: String, goLayout: String): DataFrame = {
        val json = e.select(to_json(struct(col("event_id").as("eid"),
          date_format(col("ts"), sparkFmt).as("line"))).as("value"))
        val spec = specTemplate(
          s"""{
             |  "extractFields": [{"fields": [
             |    {"id": "eid", "jsonPath": "eid", "type": "integer"},
             |    {"id": "line", "jsonPath": "line", "type": "string"}]}],
             |  "regexp": {
             |    "field": "line",
             |    "expression": "^(?P<ts>.+)$$",
             |    "timeConversion": {"field": "ts", "inputFormat": "$goLayout"}
             |  }
             |}""".stripMargin)
        pipelineOf(spec)(json).head._2
          .select(col("eid"), lit(tag).as("layout"), col("regexppayload"))
      }
      stage("accesslog", "dd/MMM/yyyy:HH:mm:ss Z", "02/Jan/2006:15:04:05 -0700")
        .unionByName(stage("commafrac", "yyyy-MM-dd HH:mm:ss,SSS Z", "2006-01-02 15:04:05.999 -0700"))
        .unionByName(stage("ampm", "yyyy-MM-dd hh:mm:ss a Z", "2006-01-02 03:04:05 PM -0700"))
    }),
    "e3_casts" -> ((s, dir) => pipelineOf(castsSpec)(eventJson(s, dir)).head._2),
    "g1_rowkey" -> ((s, dir) => {
      // Sink row-key synthesis (G1): concat_ws over extracted fields.
      val out = pipelineOf(routingSpec)(eventJson(s, dir)).head._2
      out.select(concat_ws("#", col("name"), col("custId"), col("eid")).as("row_key"),
        col("amount"))
    }),
    "g2_multitable_routing" -> ((s, dir) => {
      // Multi-table sink routing (G2/G3): whitelist per table + qualifier
      // renames, compiled by the sink compiler from a bigtable-shaped spec.
      val out = pipelineOf(routingSpec)(eventJson(s, dir)).head._2
      val tablesJson =
        """{"tables": [
          |  {"name": "p_master", "rowKey": {"keys": ["name", "custId"], "delimiter": "#"},
          |   "whitelist": {"id": "name", "type": "or", "values": ["purchase"]},
          |   "columnFamilies": [{"name": "d", "columnQualifiers": [
          |     {"id": "k", "name": "kq"}, {"id": "amount", "name": "amt"}]}]}
          |]}""".stripMargin
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val tables = graft.sinks.SinkCompiler.parseTables(mapper.readTree(tablesJson))
      graft.sinks.SinkCompiler.tableStage(tables.head)(out)
    }),
    "g4_dynamic_columns" -> ((s, dir) => {
      // Dynamic column names from field values (G4): preset event-name
      // columns, one populated per row.
      val out = pipelineOf(routingSpec)(eventJson(s, dir)).head._2
        .unionByName(pipelineOf(routingSpec)(eventJson(s, dir))(1)._2, allowMissingColumns = true)
      val tablesJson =
        """{"tables": [
          |  {"name": "bq", "columns": [
          |    {"name": "custId", "valueFromId": "custId"},
          |    {"nameFromId": {"prefix": "evt-", "suffixFromId": "name",
          |     "preset": ["purchase", "signup"]}, "valueFromId": "k"}
          |  ]}
          |]}""".stripMargin
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val tables = graft.sinks.SinkCompiler.parseTables(mapper.readTree(tablesJson))
      graft.sinks.SinkCompiler.tableStage(tables.head)(out)
    }),
    "g4_open_dynamic" -> ((s, dir) => {
      // Open-ended dynamic qualifier names (G4, the
      // apisrc-bigtablesink-fooround.json "frt-<fooTrackingId>" shape):
      // unknown name domain → map column, exploded here to (col_name, v)
      // rows so the gate hashes scalars.
      val out = pipelineOf(routingSpec)(eventJson(s, dir)).head._2
      val tablesJson =
        """{"tables": [
          |  {"name": "bt", "rowKey": {"keys": ["eid"]},
          |   "columnFamilies": [{"name": "d", "columnQualifiers": [
          |     {"id": "amount", "name": "amt"},
          |     {"id": "k", "nameFromId": {"prefix": "evt-", "suffixFromId": "custId"}}]}]}
          |]}""".stripMargin
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val tables = graft.sinks.SinkCompiler.parseTables(mapper.readTree(tablesJson))
      graft.sinks.SinkCompiler.tableStage(tables.head)(out)
        .select(col("key"), col("amt"),
          explode(col("`evt-cols`")).as(Seq("col_name", "v")))
    }),
    "c4_array_query" -> ((s, dir) => {
      // gjson array-query projection (C4, the xch-eur shape): rates arrays
      // are synthesized from native columns, then `data.#(base=="EUR")`
      // routes (branch predicate) and projects (field paths) through the
      // compiled pipeline; rows without an EUR entry drop.
      val e = t(s, dir, "events")
      val json = e.select(to_json(struct(
        lit("XCH_RATES_UPDATED").as("name"),
        col("event_id").as("eid"),
        array(
          struct(lit("CHF").as("base"),
            struct((col("value") * 2).as("SEK"), (col("user_id") + 7).as("NOK")).as("rates")),
          struct(
            when(col("event_type") === "purchase", lit("EUR")).otherwise(lit("GBP")).as("base"),
            struct(col("value").as("SEK"), col("user_id").as("NOK")).as("rates"))
        ).as("data"))).as("value"))
      val spec = specTemplate(
        """{
          |  "extractFields": [{
          |    "forEventsWith": [
          |      {"key": "name", "value": "XCH_RATES_UPDATED"},
          |      {"key": "data.#(base==\"EUR\").base", "value": "EUR"}],
          |    "fields": [
          |      {"id": "eid", "jsonPath": "eid", "type": "integer"},
          |      {"id": "sek", "jsonPath": "data.#(base==\"EUR\").rates.SEK", "type": "float"},
          |      {"id": "nok", "jsonPath": "data.#(base==\"EUR\").rates.NOK", "type": "integer"}]
          |  }]
          |}""".stripMargin)
      pipelineOf(spec)(json).head._2
    }),
    "d2_keys_in_map" -> ((s, dir) => {
      // D2: map keys become sink row keys (rowKey.predefined: keysInMap).
      val e = t(s, dir, "events")
      val arrayJson = e.select(
        to_json(struct(array(
          struct(col("event_type").as("t"), concat(lit("u"), col("user_id")).as("u"))
        ).as("xs"))).as("value"))
      val p = pipelineOf(itemsSpec)
      val mapFrame = p(arrayJson).head._2
      graft.sinks.SinkCompiler.keysInMapFrame(mapFrame, "m")
    }),
    "f8_useragent" -> ((s, dir) => {
      // UA parse (F8): classify a UA string chosen per row (rows-only check;
      // exact-golden covered by ScalaTest).
      val uas = array(
        lit("Mozilla%2F5.0%20(iPhone%3B%20CPU%20iPhone%20OS%2014_6%20like%20Mac%20OS%20X)%20AppleWebKit%2F605.1.15%20(KHTML%2C%20like%20Gecko)%20Version%2F14.1.1%20Mobile%2F15E148%20Safari%2F604.1"),
        lit("Mozilla%2F5.0%20(Windows%20NT%2010.0%3B%20Win64%3B%20x64)%20AppleWebKit%2F537.36%20(KHTML%2C%20like%20Gecko)%20Chrome%2F93.0.4577.82%20Safari%2F537.36"),
        lit("Mozilla%2F5.0%20(Linux%3B%20Android%2010%3B%20SNE-LX3)%20AppleWebKit%2F537.36%20(KHTML%2C%20like%20Gecko)%20Chrome%2F92.0.4515.115%20Mobile%20Safari%2F537.36"))
      val e = t(s, dir, "events")
      e.select(col("event_id").as("eid"),
        graft.functions.gjson.parseUserAgent(
          element_at(uas, (pmod(col("event_id"), lit(3)) + 1).cast("int"))).as("ua_json"))
    }),
    "e4_ingestion_time" -> ((s, dir) => {
      // @GeistIngestionTime (E4): the SINK COMPILER attaches the ingestion
      // timestamp (tableStage maps valueFromId "@GeistIngestionTime" to the
      // wall clock, Sinks.scala). The value is nondeterministic, so the
      // contract asserts its deterministic invariants on the REAL sink
      // output — the column exists, is non-null, and post-dates the build
      // era for every routed row. Deleting the attachment in the sink
      // compiler nulls has_ingestion_ts and fails the hash gate.
      val out = pipelineOf(routingSpec)(eventJson(s, dir)).head._2
      val tablesJson =
        """{"tables": [
          |  {"name": "bq", "columns": [
          |    {"name": "eid", "valueFromId": "eid"},
          |    {"name": "dateIngested", "valueFromId": "@GeistIngestionTime"}
          |  ]}
          |]}""".stripMargin
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val tables = graft.sinks.SinkCompiler.parseTables(mapper.readTree(tablesJson))
      graft.sinks.SinkCompiler.tableStage(tables.head)(out)
        .select(col("eid"),
          col("dateIngested").isNotNull.as("has_ingestion_ts"),
          (col("dateIngested") >= lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))).as("ingested_after_build"))
    }),
    "g5_insertid_dedup" -> ((s, dir) => {
      // Insert-id best-effort dedup (G5): first event per (user, type).
      val e = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id"), col("event_type")).orderBy(col("event_id"))
      e.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    }),
    "b6_branch_exclusion" -> ((s, dir) => {
      // Branch-scoped excludeEventsWith (B6): the exclusion lives INSIDE the
      // extractFields branch (reference: transformer.go applies each
      // branch's own blacklist after its forEventsWith router), so it only
      // filters this branch's rows — a second branch would be untouched.
      val spec = specTemplate(
        """{
          |  "extractFields": [{
          |    "forEventsWith": [{"key": "foo.evtType", "value": "purchase"}],
          |    "excludeEventsWith": [
          |      {"key": "props.k", "values": ["42", "7"]},
          |      {"key": "foo.custId", "values": ["13"]}
          |    ],
          |    "fields": [
          |      {"id": "eid", "jsonPath": "eid", "type": "integer"},
          |      {"id": "name", "jsonPath": "foo.evtType"},
          |      {"id": "custId", "jsonPath": "foo.custId", "type": "integer"},
          |      {"id": "k", "jsonPath": "props.k", "type": "integer"}]
          |  }]
          |}""".stripMargin)
      pipelineOf(spec)(eventJson(s, dir)).head._2
    }),
    "c3_raw_json" -> ((s, dir) => {
      // Nested-object raw-JSON extraction (C3): an untyped field whose path
      // lands on an OBJECT returns the verbatim source substring (gjson
      // Result.Raw — graft.json.Js preserves offsets precisely for this).
      // The event JSON is built by Spark's to_json, so the expected verbatim
      // text is its compact serialization, reconstructible by concat in the
      // oracle. Longs and strings only: float formatting is not portable.
      val e = t(s, dir, "events")
      val json = e.select(to_json(struct(
        col("event_id").as("eid"),
        struct(col("event_type").as("evtType"), col("user_id").as("custId")).as("obj")
      )).as("value"))
      val spec = specTemplate(
        """{
          |  "extractFields": [{"fields": [
          |    {"id": "eid", "jsonPath": "eid", "type": "integer"},
          |    {"id": "objRaw", "jsonPath": "obj"}]}]
          |}""".stripMargin)
      pipelineOf(spec)(json).head._2
    }),
    "g6_partitioning" -> ((s, dir) => {
      // Table-creation semantics (G6): DAY time partitioning (derived
      // __pdate directory column), clustering sort, requirePartitionFilter
      // honored via the timeRange read-back. The query writes the events
      // table through the REAL sink and reads a 10-day range back — output
      // rows prove partition assignment (__pdate) and range trimming; the
      // oracle replays both with date_trunc.
      val out = java.nio.file.Files.createTempDirectory("graft_g6_").toFile
        .getAbsolutePath + "/tbl"
      val sink = new graft.sinks.KeyedTableSink(out, partitionField = "ts",
        partitionType = "DAY", clustering = Seq("user_id"),
        requirePartitionFilter = true)
      sink.write(t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts")))
      sink.timeRange(s,
          java.sql.Timestamp.valueOf("2024-01-10 00:00:00"),
          java.sql.Timestamp.valueOf("2024-01-20 00:00:00"))
        .select(col("event_id"), col("user_id"), col("__pdate"))
    }),
    "g7_kafka_mapping" -> ((s, dir) => {
      // Kafka sink message mapping (G7, pubsubsrc-kafkasink-foologs.json):
      // message.payloadFromId picks the outgoing value, keyFromId the key;
      // the stage emits binary key/value ready for the kafka writer. Cast
      // back to string here so the gate hashes scalars (the cast is
      // lossless: both fields are UTF-8 text).
      val spec = specTemplate(
        """{
          |  "extractFields": [{"fields": [
          |    {"id": "key_field", "jsonPath": "foo.evtType"},
          |    {"id": "line", "jsonPath": "textPayload", "type": "string"}]}],
          |  "regexp": {
          |    "field": "line",
          |    "expression": "^(?P<evt>[a-z]+)\\|(?P<uid>\\d+)\\|(?P<k>\\d+)$"
          |  }
          |}""".stripMargin)
      val out = pipelineOf(spec)(eventJson(s, dir)).head._2
      graft.sinks.KafkaSinkStage("regexppayload", keyFromId = Some("key_field"))(out)
        .select(col("key").cast("string").as("msg_key"),
          col("value").cast("string").as("msg_value"))
    }),
    "g9_readback" -> ((s, dir) => {
      // Sink read-back (G9): the FULL ExtractFromSink enum (reference
      // entity/extractor.go:104-132) over one written table —
      // QueryTypeCompositeKeyValue (kv branch: one composite row-key get,
      // key predicate pushed to the parquet scan), QueryTypeAll (all
      // branch: the whole-table scan), and the timeRange window (range
      // branch: day-partition pruning + exact field trim). The query
      // writes the events table through the REAL sink (G1-synthesized
      // event_type#user_id row key, DAY time-partitioning on ts) and
      // unions the three read paths tagged by query_type; DuckDB replays
      // each as the equivalent filter over the same source rows.
      val out = java.nio.file.Files.createTempDirectory("graft_g9_").toFile
        .getAbsolutePath + "/tbl"
      val sink = new graft.sinks.KeyedTableSink(out,
        partitionField = "ts", partitionType = "DAY", clustering = Seq("key"))
      sink.write(t(s, dir, "events")
        .select(concat_ws("#", col("event_type"), col("user_id")).as("key"),
          col("event_id"), col("user_id"), col("event_type"), col("value"),
          col("ts")))
      val cols = Seq(col("key"), col("event_id"), col("user_id"),
        col("event_type"), col("value"))
      val kv = sink.compositeKeyValue(s, Seq("purchase", "7"), "#")
        .select(lit("kv").as("query_type") +: cols: _*)
      val rng = sink.timeRange(s,
        java.sql.Timestamp.valueOf("2024-01-10 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-12 00:00:00"))
        .select(lit("range").as("query_type") +: cols: _*)
      val all = sink.all(s)
        .select(lit("all").as("query_type") +: cols: _*)
      kv.unionAll(rng).unionAll(all)
    }),
    "a2_eventsim" -> ((s, dir) => {
      // Deterministic synthetic source (A2/A3): seeded generators, weighted
      // categorical, sinusoid rate — end-to-end through the spec pipeline.
      val sim = graft.sources.EventSim.parseSpec(
        """{"simResolutionMilliseconds": 1000,
          |  "eventGeneration": {"type": "sinusoid", "minCount": 0, "maxCount": 20,
          |                      "periodSeconds": 120, "peakTime": "2024-06-01T00:00:00Z"},
          |  "eventSpec": {"fields": [
          |    {"field": "name", "predefinedValues": [
          |      {"value": "CONN_OPENED", "frequencyFactor": 6},
          |      {"value": "CONN_CLOSED", "frequencyFactor": 4}]},
          |    {"field": "cust", "setOfStrings": {"amount": 50, "prefix": "c"}},
          |    {"field": "amount", "randomizedValue": {"type": "float", "min": 0, "max": 100, "maxFractionDigits": 2}}
          |  ]}}""".stripMargin)
      val events = graft.sources.EventSim.batch(s, sim, triggers = 120,
        java.time.Instant.parse("2024-06-01T00:00:00Z"), seed = 42L)
      val p = pipelineOf(specTemplate(
        """{"extractFields": [{
          |  "forEventsWith": [{"key": "name", "value": "CONN_OPENED"}],
          |  "fields": [
          |    {"id": "name", "jsonPath": "name"},
          |    {"id": "cust", "jsonPath": "cust"},
          |    {"id": "amount", "jsonPath": "amount", "type": "float"}
          |  ]}]}""".stripMargin))
      // Fixed-seed golden aggregate: the generator is deterministic
      // (seed 42, pinned epoch), so per-customer counts and cent-exact
      // amount sums are pinned against a VALUES-literal oracle — gating
      // cross-round/cross-JVM determinism of the whole generator stack
      // (weighted CDF, setOfStrings, sinusoid rate) plus the spec pipeline.
      p(events).head._2
        .groupBy(col("cust"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("amount") * 100).cast("long")).as("amount_cents"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "session_routing" ->
      """SELECT event_id AS eid, event_type AS name, user_id AS custId,
        |       value AS amount, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE event_type = 'purchase'""".stripMargin,
    "event_split" ->
      """SELECT event_id AS eid, event_type AS name, user_id AS custId,
        |       value AS amount, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE event_type = 'purchase'
        |UNION ALL BY NAME
        |SELECT event_id AS eid, event_type AS name, user_id AS custId,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE event_type = 'signup'""".stripMargin,
    "b1_blacklist" ->
      """SELECT event_id AS eid, event_type AS name FROM events
        |WHERE event_type NOT IN ('error', 'view')""".stripMargin,
    "b2_whitelist" ->
      """SELECT event_id AS eid, event_type AS name FROM events
        |WHERE event_type IN ('purchase', 'signup')""".stripMargin,
    "b4_dnf_exclusion" ->
      """SELECT event_id AS eid, event_type AS name,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events
        |WHERE NOT ((event_type = 'click' AND json_extract_string(props, '$.k') = '42')
        |        OR (event_type = 'view' AND CAST(user_id AS VARCHAR) = '0'))""".stripMargin,
    "d1_items_from_array" ->
      """WITH src AS (
        |  SELECT event_id AS eid, event_type AS t,
        |         'u' || CAST(user_id AS VARCHAR) AS u1,
        |         'k' || json_extract_string(props, '$.k') AS u2
        |  FROM events
        |)
        |SELECT eid, t || '#' || u1 AS item_key,
        |       to_json(struct_pack(t := t, u := u1)) AS item_json FROM src
        |UNION ALL
        |SELECT eid, t || '#' || u2 AS item_key,
        |       to_json(struct_pack(t := t, u := u2)) AS item_json FROM src""".stripMargin,
    "e1_regexp" ->
      """SELECT event_id AS eid,
        |       to_json(struct_pack(
        |         evt := event_type,
        |         k := json_extract_string(props, '$.k'),
        |         uid := CAST(user_id AS VARCHAR))) AS regexppayload
        |FROM events""".stripMargin,
    "e2_timeconv" ->
      """WITH s AS (SELECT event_id AS eid,
        |                 date_trunc('second', CAST(ts AS TIMESTAMP)) AS tsec
        |          FROM events)
        |SELECT eid, 'accesslog' AS layout,
        |       '{"ts":"' || strftime(tsec, '%Y-%m-%dT%H:%M:%S') || 'Z"}' AS regexppayload FROM s
        |UNION ALL
        |SELECT eid, 'commafrac' AS layout,
        |       '{"ts":"' || strftime(tsec, '%Y-%m-%dT%H:%M:%S') || 'Z"}' AS regexppayload FROM s
        |UNION ALL
        |SELECT eid, 'ampm' AS layout,
        |       '{"ts":"' || strftime(tsec, '%Y-%m-%dT%H:%M:%S') || 'Z"}' AS regexppayload FROM s""".stripMargin,
    "e3_casts" ->
      """SELECT event_id AS eid,
        |       date_trunc('milliseconds', CAST(ts AS TIMESTAMP)) AS unix_ts,
        |       date_trunc('milliseconds', CAST(ts AS TIMESTAMP)) AS iso_ts,
        |       value AS amount,
        |       '' AS flag
        |FROM events""".stripMargin,
    "g1_rowkey" ->
      """SELECT event_type || '#' || CAST(user_id AS VARCHAR) || '#' || CAST(event_id AS VARCHAR) AS row_key,
        |       value AS amount
        |FROM events WHERE event_type = 'purchase'""".stripMargin,
    "g5_insertid_dedup" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) = 1""".stripMargin,
    "g2_multitable_routing" ->
      """SELECT event_type || '#' || CAST(user_id AS VARCHAR) AS key,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS kq,
        |       value AS amt
        |FROM events WHERE event_type = 'purchase'""".stripMargin,
    "g4_dynamic_columns" ->
      """SELECT user_id AS custId,
        |       CASE WHEN event_type = 'purchase'
        |            THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS "evt-purchase",
        |       CASE WHEN event_type = 'signup'
        |            THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS "evt-signup"
        |FROM events WHERE event_type IN ('purchase', 'signup')""".stripMargin,
    "g4_open_dynamic" ->
      """SELECT CAST(event_id AS VARCHAR) AS key,
        |       value AS amt,
        |       'evt-' || CAST(user_id AS VARCHAR) AS col_name,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS v
        |FROM events WHERE event_type = 'purchase'""".stripMargin,
    "c4_array_query" ->
      """SELECT event_id AS eid, value AS sek, user_id AS nok
        |FROM events WHERE event_type = 'purchase'""".stripMargin,
    "e4_ingestion_time" ->
      """SELECT event_id AS eid, true AS has_ingestion_ts, true AS ingested_after_build
        |FROM events WHERE event_type = 'purchase'""".stripMargin,
    "b6_branch_exclusion" ->
      """SELECT event_id AS eid, event_type AS name, user_id AS custId,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events
        |WHERE event_type = 'purchase'
        |  AND NOT (json_extract_string(props, '$.k') IN ('42', '7')
        |        OR CAST(user_id AS VARCHAR) = '13')""".stripMargin,
    "c3_raw_json" ->
      """SELECT event_id AS eid,
        |       '{"evtType":"' || event_type || '","custId":' ||
        |         CAST(user_id AS VARCHAR) || '}' AS objRaw
        |FROM events""".stripMargin,
    "g6_partitioning" ->
      """SELECT event_id, user_id,
        |       date_trunc('day', CAST(ts AS TIMESTAMP)) AS __pdate
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-20 00:00:00'""".stripMargin,
    "g7_kafka_mapping" ->
      """SELECT event_type AS msg_key,
        |       to_json(struct_pack(
        |         evt := event_type,
        |         k := json_extract_string(props, '$.k'),
        |         uid := CAST(user_id AS VARCHAR))) AS msg_value
        |FROM events""".stripMargin,
    "g9_readback" ->
      """WITH src AS (
        |  SELECT event_type || '#' || CAST(user_id AS VARCHAR) AS key,
        |         event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events)
        |SELECT 'kv' AS query_type, key, event_id, user_id, event_type, value
        |FROM src WHERE event_type = 'purchase' AND user_id = 7
        |UNION ALL
        |SELECT 'range', key, event_id, user_id, event_type, value
        |FROM src WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |             AND ts < TIMESTAMP '2024-01-12 00:00:00'
        |UNION ALL
        |SELECT 'all', key, event_id, user_id, event_type, value
        |FROM src""".stripMargin,
    "f8_useragent" ->
      """SELECT event_id AS eid,
        |  CASE event_id % 3
        |    WHEN 0 THEN '{"platform":"iPhone","operatingSystem":{"name":"iPhone OS","fullName":"CPU iPhone OS 14_6 like Mac OS X","version":"14.6"},"localization":"","browser":{"name":"Safari","version":"14.1.1","engine":"AppleWebKit","engineVersion":"605.1.15"},"bot":false,"mobile":true}'
        |    WHEN 1 THEN '{"platform":"Windows NT 10.0","operatingSystem":{"name":"Windows","fullName":"Windows 10","version":"10"},"localization":"","browser":{"name":"Chrome","version":"93.0.4577.82","engine":"AppleWebKit","engineVersion":"537.36"},"bot":false,"mobile":false}'
        |    ELSE '{"platform":"Linux","operatingSystem":{"name":"Android","fullName":"Android 10","version":"10"},"localization":"","browser":{"name":"Chrome","version":"92.0.4515.115","engine":"AppleWebKit","engineVersion":"537.36"},"bot":false,"mobile":true}'
        |  END AS ua_json
        |FROM events""".stripMargin,
    "d2_keys_in_map" ->
      """SELECT event_type || '#u' || CAST(user_id AS VARCHAR) AS key,
        |       to_json(struct_pack(t := event_type, u := 'u' || CAST(user_id AS VARCHAR))) AS value
        |FROM events""".stripMargin,
    // Fixed-seed golden (seed 42, epoch 2024-06-01T00:00:00Z, 120 triggers):
    // per-customer event counts + cent-exact amount sums of the CONN_OPENED
    // branch. Pins cross-engine/cross-round determinism of the eventsim
    // generator stack; regenerate via the a2_eventsim query if the
    // generator's seeded sequence is ever intentionally changed.
    "a2_eventsim" ->
      """SELECT cust, CAST(n AS BIGINT) AS n, CAST(amount_cents AS BIGINT) AS amount_cents
        |FROM (VALUES
        |  ('c1', 10, 57434), ('c10', 20, 89413), ('c11', 16, 80303),
        |  ('c12', 17, 102831), ('c13', 19, 78364), ('c14', 12, 71082),
        |  ('c15', 17, 84582), ('c16', 17, 67101), ('c17', 11, 58964),
        |  ('c18', 17, 87353), ('c19', 18, 84250), ('c2', 19, 125027),
        |  ('c20', 13, 69171), ('c21', 12, 45739), ('c22', 15, 57078),
        |  ('c23', 18, 86210), ('c24', 18, 86519), ('c25', 14, 76136),
        |  ('c26', 13, 47069), ('c27', 14, 78690), ('c28', 19, 102782),
        |  ('c29', 13, 51147), ('c3', 8, 43700), ('c30', 17, 77432),
        |  ('c31', 22, 143880), ('c32', 11, 56733), ('c33', 16, 82897),
        |  ('c34', 18, 98239), ('c35', 14, 53873), ('c36', 10, 51653),
        |  ('c37', 13, 68532), ('c38', 13, 66831), ('c39', 9, 37155),
        |  ('c4', 21, 119121), ('c40', 19, 116033), ('c41', 13, 63967),
        |  ('c42', 14, 67359), ('c43', 15, 90393), ('c44', 7, 36040),
        |  ('c45', 6, 18129), ('c46', 7, 43086), ('c47', 17, 71929),
        |  ('c48', 11, 58995), ('c49', 11, 42602), ('c5', 12, 67022),
        |  ('c50', 21, 108768), ('c6', 14, 48909), ('c7', 19, 94501),
        |  ('c8', 12, 56431), ('c9', 12, 57536)
        |) AS t(cust, n, amount_cents)""".stripMargin
  )
}
