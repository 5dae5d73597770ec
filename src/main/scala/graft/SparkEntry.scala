package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.compile.SpecCompiler
import graft.spec.StreamSpec

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry demonstrates one operator family from SURVEY.md §2 running as
  * a Spark-native pipeline over the shared test tables; `oracleSql` holds the
  * DuckDB-equivalent SQL for the hash-match correctness gate.
  *
  * The geist-parity queries construct a JSON event stream from the `events`
  * table (to_json over native columns) and push it through the *compiled
  * StreamSpec pipeline* (graft.compile.SpecCompiler) — i.e. they exercise
  * the real operator implementations, not ad-hoc SQL.
  */
object SparkEntry {

  private[graft] def t(s: SparkSession, dir: String, name: String): DataFrame = {
    // The events table stores ts as TIMESTAMP(NANOS), which Spark's parquet
    // reader rejects by default; read it as long nanos and truncate to the
    // engine's microsecond timestamps (DuckDB's CAST(ts AS TIMESTAMP) does
    // the same truncation on the oracle side).
    try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Exception => }
    val df = s.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(_.name == "ts") match {
      case Some(f) if f.dataType == org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000"))) // integral div: no double rounding
      case Some(f) if f.dataType == org.apache.spark.sql.types.TimestampNTZType =>
        // driver-regenerated data may store naive micros (no UTC flag),
        // which a default session infers as TIMESTAMP_NTZ; our sessions
        // run UTC with NTZ inference off, but guard against foreign
        // sessions (driver smoke) — the cast reads the wall-clock as
        // session-local, which under UTC matches DuckDB's naive semantics
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** The events table as a raw JSON event stream, as a geist source would
    * deliver it: one JSON document per event, "value" column.
    * Shape: {"eid":N,"foo":{"evtType":s,"custId":N,"amount":f},"props":{"k":N},
    *         "textPayload":"evt|uid|k","ut":millis,"iso":"..."}
    */
  private def eventJson(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    e.select(
      to_json(
        struct(
          col("event_id").as("eid"),
          struct(
            col("event_type").as("evtType"),
            col("user_id").as("custId"),
            col("value").as("amount")
          ).as("foo"),
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).as("props"),
          concat_ws("|", col("event_type"), col("user_id"),
            get_json_object(col("props"), "$.k")).as("textPayload"),
          unix_millis(col("ts")).as("ut"),
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").as("iso")
        )
      ).as("value")
    )
  }

  private def pipelineOf(specJson: String) =
    SpecCompiler.compile(StreamSpec.parseUnsafe(specJson))

  private def specTemplate(transformBody: String): String =
    s"""{
       |  "namespace": "graft", "streamIdSuffix": "q", "version": 1,
       |  "description": "driver-contract query",
       |  "source": {"type": "geistapi"},
       |  "transform": $transformBody,
       |  "sink": {"type": "void"}
       |}""".stripMargin

  /** 13-token tail injected by `ns_substr_dedup` to create duplicated
    * spans (leading space: it's appended to running text).
    */
  private[graft] val SubstrDedupTail =
    " this work is licensed under a creative commons attribution license all rights reserved"

  /** Frozen BPE merge table: `Bpe.learnFromCorpus(sf0.001 documents, 64
    * merges, vocabTopK 50000, minCount 1)`, inlined so the tokenizer is a
    * fixed artifact (BpeSpec re-derives it from the corpus to pin
    * provenance). Both the `ns_bpe` query and its oracle are generated
    * from this one list, so Scala and SQL cannot drift.
    */
  private[graft] val FrozenBpeMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"), ("l", "u"),
    ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"), ("a", "n"), ("c", "an"),
    ("s", "can"), ("c", "o"), ("co", "lu"), ("colu", "m"), ("colum", "n"),
    ("d", "ow"), ("in", "dow"), ("w", "indow"), ("d", "er"), ("or", "der"),
    ("or", "t"), ("s", "ort"), ("par", "t"), ("u", "p"), ("a", "g"),
    ("ag", "g"), ("a", "lu"), ("alu", "e"), ("v", "alue"), ("in", "e"),
    ("l", "ine"), ("e", "y"), ("k", "ey"), ("j", "o"), ("jo", "in"),
    ("g", "e"), ("mer", "ge"), ("er", "y"), ("g", "r"), ("gr", "o"),
    ("gro", "up"), ("q", "u"), ("qu", "ery"), ("c", "t"), ("ct", "or"),
    ("e", "ctor"), ("v", "ector"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("l", "ow"), ("s", "low"), ("a", "m"), ("e", "am"), ("r", "eam"),
    ("st", "ream"), ("f", "i"), ("fi", "l"), ("fil", "t"), ("filt", "er"),
    ("a", "st"), ("f", "ast"))

  /** Frozen quality-classifier gate model:
    * `Classifier.train(sf0.001 documents, label = stopword-fraction >=
    * 6.4%, buckets 64, maxN 1, iters 50, portable)` — inlined so the
    * scorer gates against a fixed artifact (ClassifierSpec re-derives it
    * from the corpus to pin provenance, the FrozenBpeMerges pattern).
    * Both the `ns_quality_classifier` query and its oracle are generated
    * from this one array, so Scala and SQL cannot drift.
    */
  private[graft] val FrozenQualityWeightsMicro: Array[Long] = Array(
    -88816L, -2577154L, 0L, 0L, 0L, -3545677L, 0L, 0L, 0L, 0L, -4002629L,
    0L, -1662112L, -721798L, -774144L, 0L, 0L, 0L, 0L, 856751L, 0L, 0L,
    -261801L, 1547663L, 0L, -3789078L, 0L, -544088L, 0L, 0L, -1343157L,
    -218544L, -3488741L, 0L, 0L, 0L, -808700L, 0L, 0L, -994438L, 0L,
    35630L, 0L, 0L, 0L, 9768990L, 0L, 0L, -564139L, -1798726L, 0L, 0L,
    0L, 0L, 0L, -55507L, -809214L, 17656653L, -1289915L, 0L, 0L,
    -696238L, 0L, 0L)
  private[graft] val FrozenQualityBiasMicro: Long = -170240L

  /** DuckDB replay of the frozen classifier's scoring: recompute portable
    * hashed unigram buckets, join the inlined weight table, integer dot +
    * integer margin sign — value-for-value the scorer's arithmetic.
    */
  private def qualityOracleSql: String = {
    val nBuckets = FrozenQualityWeightsMicro.length // literals derive from the
    val values = FrozenQualityWeightsMicro.zipWithIndex // frozen array: no drift
      .map { case (w, b) => s"($b, ${w})" }.mkString(", ")
    s"""WITH tk AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents),
       |b AS (
       |  SELECT doc_id,
       |    CAST((('0x' || substr(md5(g), 1, 8))::UBIGINT & 2147483647) % $nBuckets AS INT) AS bucket,
       |    count(*) AS c
       |  FROM (SELECT doc_id, unnest(toks) AS g FROM tk) GROUP BY 1, 2),
       |w(bucket, wm) AS (VALUES $values),
       |s AS (
       |  SELECT b.doc_id,
       |    CAST(sum(b.c) AS BIGINT) AS n_feats,
       |    CAST(sum(b.c * w.wm) AS BIGINT) AS dot_micro
       |  FROM b JOIN w USING (bucket) GROUP BY 1)
       |SELECT doc_id, n_feats, dot_micro,
       |       dot_micro + (${FrozenQualityBiasMicro}) * n_feats > 0 AS predicted
       |FROM s""".stripMargin
  }

  /** Frozen PCA gate basis: `Embeddings.trainPca(sf0.001 embeddings,
    * dim 64, k 4)` — inlined so projection gates against a fixed artifact
    * (EmbeddingsSpec re-derives it to pin provenance); the query and its
    * oracle are both generated from this one array.
    */
  private[graft] val FrozenPcaComponentsMicro: Array[Array[Long]] = Array(
    Array(
      -148827L, -58049L, 43575L, -173283L, 8858L, 235811L, 169725L, 158988L,
      64539L, -236562L, 225757L, 47036L, 62054L, 114844L, 221932L, 66995L,
      -104744L, 16620L, -115888L, 124432L, -49509L, 41750L, -189276L, -39085L,
      92673L, -215611L, 45146L, 235886L, 58647L, 35038L, 13611L, -10174L,
      -37786L, 105016L, -294644L, 18753L, -86303L, -506L, 23427L, 28956L,
      84420L, 63847L, 113910L, 75813L, -80885L, -221800L, -73610L, 302326L,
      87312L, -136750L, 135253L, 71733L, -61038L, 21305L, -24158L, -125776L,
      -50156L, 103313L, -61741L, 14281L, 29864L, 3813L, -248260L, -90804L),
    Array(
      -102894L, 95621L, 262900L, -101434L, 99004L, -224674L, -90603L, -57528L,
      -216372L, -58801L, 64241L, 66691L, 67549L, -6207L, -102223L, 41199L,
      142718L, -25986L, 179735L, -227338L, 290204L, 77507L, -207200L, 260448L,
      -79141L, 8760L, -6198L, -13172L, 81459L, 92662L, 82985L, 41386L,
      160377L, 137816L, 8604L, -233877L, -27140L, 103004L, 27483L, -30349L,
      117315L, -262573L, 75843L, 35223L, 73179L, -147197L, -140622L, 29036L,
      161959L, 54223L, 57642L, 93611L, -24913L, 33224L, 161598L, -85149L,
      115977L, 49241L, -65286L, -92397L, -27410L, 128169L, -77786L, 197423L),
    Array(
      180579L, -54678L, -112846L, 268148L, 67548L, 75063L, -6652L, 419742L,
      -26285L, -141982L, -25518L, 117621L, 38795L, -107820L, -76471L, -26251L,
      186602L, -112783L, -80115L, 48295L, -162173L, 41611L, -60167L, 89935L,
      27434L, 19031L, 40943L, 191325L, 193690L, -132490L, 28523L, 43073L,
      78502L, -134029L, -139923L, 6925L, 102897L, 192250L, 28245L, 85875L,
      -61587L, -33974L, -25198L, -57621L, 117843L, 125083L, -25340L, 196159L,
      -190977L, 51810L, 6278L, -8242L, -16421L, 119924L, 161272L, 107854L,
      158604L, -148865L, -42718L, -204530L, 32672L, 168317L, 97082L, 216310L),
    Array(
      -57162L, -72557L, 98266L, 69507L, -52799L, 145177L, -86678L, -28523L,
      89408L, 204884L, -13755L, 94574L, -107820L, 28154L, -24808L, -87082L,
      -53739L, 197309L, -7771L, -27634L, -32936L, -210912L, 54024L, 223283L,
      -230054L, 56121L, 78637L, 174980L, -31649L, 13995L, 96179L, 213127L,
      29444L, 82851L, -90083L, 62918L, -213609L, -142438L, 255354L, -107677L,
      -111401L, 185144L, 4024L, -120655L, -71985L, 578L, 96436L, -61089L,
      -54916L, 30729L, 114267L, 299051L, -284023L, -14906L, 243434L, 57382L,
      -14686L, 129445L, -127933L, -11140L, 111850L, -88269L, 113630L, 129496L))

  /** Frozen corpus mean (micro-units) for the centered projection —
    * derived with the basis; EmbeddingsSpec pins its provenance.
    */
  private[graft] val FrozenPcaMeanMicro: Array[Long] = Array(
    -2928L, -1427L, 1498L, 8534L, -1857L, -2655L, 97L, -9131L,
    -11225L, -4404L, 7712L, -9148L, -202L, 4818L, 4733L, -2985L,
    618L, -1411L, -1994L, -5096L, -6201L, -1744L, 3859L, -11007L,
    -2966L, -3075L, -714L, -2857L, -5044L, -3281L, -10473L, 309L,
    2068L, 4834L, -2873L, 4292L, 967L, -398L, -9004L, 9728L,
    -3610L, -8340L, 3472L, 2822L, -6098L, -11641L, 478L, -2170L,
    2422L, 1335L, -490L, -1996L, 3327L, 7020L, 9967L, 37L,
    3835L, 2453L, -6527L, 2123L, -3090L, 1494L, -4200L, 1213L)

  /** DuckDB replay of the frozen-basis projection: micro-quantize each
    * component (shared round convention), subtract the inlined mean, join
    * the inlined (k, i, w) weight table, exact integer dot per
    * (vector, component).
    */
  private def pcaOracleSql: String = {
    val values = (for {
      (row, k) <- FrozenPcaComponentsMicro.zipWithIndex
      (w, i) <- row.zipWithIndex
    } yield s"($k, ${i + 1}, ${w})").mkString(", ")
    val means = FrozenPcaMeanMicro.zipWithIndex
      .map { case (mu, i) => s"(${i + 1}, ${mu})" }.mkString(", ")
    val dim = FrozenPcaMeanMicro.length // literals derive from the frozen arrays
    s"""WITH q AS (
       |  SELECT vec_id,
       |    list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000000) AS BIGINT)) AS qe
       |  FROM embeddings WHERE len(embedding) = $dim),
       |e AS (SELECT vec_id, unnest(range(1, ${dim + 1})) AS i, unnest(qe) AS x FROM q),
       |p(k, i, w) AS (VALUES $values),
       |m(i, mu) AS (VALUES $means)
       |SELECT e.vec_id, CAST(p.k AS INT) AS comp_idx,
       |       CAST(sum((e.x - m.mu) * p.w) AS BIGINT) AS proj
       |FROM e JOIN p USING (i) JOIN m USING (i) GROUP BY 1, 2""".stripMargin
  }

  /** DuckDB replay of BPE encoding: each word becomes a symbol string
    * (single-space pad, double-space between symbols — so a plain
    * left-to-right replace() of ' A  B ' with ' AB ' merges pairwise
    * occurrences exactly like the encoder's one-pass merge, including
    * back-to-back runs), then the merges are applied in rank order.
    * Sequential rank-order application equals the iterative lowest-rank
    * algorithm because a learned merge's output symbol only ever appears
    * in strictly-higher-rank pairs.
    */
  /** Frozen-BPE encode CTEs (tk → w → e with per-word subword lists) —
    * shared by the encode gate (`ns_bpe`) and the fertility gate
    * (`ns_bpe_fertility`) so both replay the SAME merge chain.
    */
  private def bpeEncodeCtes: String = {
    val symStr = "' ' || array_to_string(list_transform(range(1, length(word)+1), " +
      "i -> substr(word, i, 1)), '  ') || ' '"
    val chain = FrozenBpeMerges.foldLeft(symStr) { case (acc, (a, b)) =>
      s"replace($acc, ' $a  $b ', ' $a$b ')"
    }
    s"""tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents),
       |w AS (SELECT doc_id, unnest(range(1, len(toks)+1)) AS wpos, unnest(toks) AS word FROM tk),
       |e AS (SELECT doc_id, wpos,
       |        CASE WHEN word = '' THEN [] ELSE string_split(trim($chain), '  ') END AS subs
       |      FROM w)""".stripMargin
  }

  private def bpeOracleSql: String =
    s"""WITH $bpeEncodeCtes,
       |x AS (SELECT doc_id, wpos, unnest(range(1, len(subs)+1)) AS spos, unnest(subs) AS tok FROM e)
       |SELECT doc_id,
       |       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY wpos, spos) - 1 AS INT) AS pos,
       |       tok AS token
       |FROM x""".stripMargin

  // ------------------------------------------------------------ specs

  private val routingSpec = specTemplate(
    """{
      |  "extractFields": [
      |    {
      |      "forEventsWith": [{"key": "foo.evtType", "value": "purchase"}],
      |      "fields": [
      |        {"id": "eid", "jsonPath": "eid", "type": "integer"},
      |        {"id": "name", "jsonPath": "foo.evtType"},
      |        {"id": "custId", "jsonPath": "foo.custId", "type": "integer"},
      |        {"id": "amount", "jsonPath": "foo.amount", "type": "float"},
      |        {"id": "k", "jsonPath": "props.k", "type": "integer"}
      |      ]
      |    },
      |    {
      |      "forEventsWith": [{"key": "foo.evtType", "value": "signup"}],
      |      "fields": [
      |        {"id": "eid", "jsonPath": "eid", "type": "integer"},
      |        {"id": "name", "jsonPath": "foo.evtType"},
      |        {"id": "custId", "jsonPath": "foo.custId", "type": "integer"},
      |        {"id": "k", "jsonPath": "props.k", "type": "integer"}
      |      ]
      |    }
      |  ]
      |}""".stripMargin)

  private val blacklistSpec = specTemplate(
    """{
      |  "excludeEventsWith": [
      |    {"key": "foo.evtType", "values": ["error", "view"]}
      |  ],
      |  "extractFields": [{"fields": [
      |    {"id": "eid", "jsonPath": "eid", "type": "integer"},
      |    {"id": "name", "jsonPath": "foo.evtType"}
      |  ]}]
      |}""".stripMargin)

  private val whitelistSpec = specTemplate(
    """{
      |  "excludeEventsWith": [
      |    {"key": "foo.evtType", "valuesNotIn": ["purchase", "signup"]}
      |  ],
      |  "extractFields": [{"fields": [
      |    {"id": "eid", "jsonPath": "eid", "type": "integer"},
      |    {"id": "name", "jsonPath": "foo.evtType"}
      |  ]}]
      |}""".stripMargin)

  private val dnfSpec = specTemplate(
    """{
      |  "excludeEventsWithMultipleConditions": [
      |    {"filters": [
      |      {"key": "foo.evtType", "values": ["click"]},
      |      {"key": "props.k", "values": ["42"]}
      |    ]},
      |    {"filters": [
      |      {"key": "foo.evtType", "values": ["view"]},
      |      {"key": "foo.custId", "values": ["0"]}
      |    ]}
      |  ],
      |  "extractFields": [{"fields": [
      |    {"id": "eid", "jsonPath": "eid", "type": "integer"},
      |    {"id": "name", "jsonPath": "foo.evtType"},
      |    {"id": "k", "jsonPath": "props.k", "type": "integer"}
      |  ]}]
      |}""".stripMargin)

  private val itemsSpec = specTemplate(
    """{
      |  "extractItemsFromArray": [
      |    {
      |      "id": "m",
      |      "items": {
      |        "jsonPathToArray": "xs",
      |        "idFromItemFields": {"delimiter": "#", "fields": ["t", "u"]}
      |      }
      |    }
      |  ]
      |}""".stripMargin)

  private val regexpSpec = specTemplate(
    """{
      |  "extractFields": [{"fields": [
      |    {"id": "eid", "jsonPath": "eid", "type": "integer"},
      |    {"id": "line", "jsonPath": "textPayload", "type": "string"}
      |  ]}],
      |  "regexp": {
      |    "field": "line",
      |    "expression": "^(?P<evt>[a-z]+)\\|(?P<uid>\\d+)\\|(?P<k>\\d+)$"
      |  }
      |}""".stripMargin)

  private val castsSpec = specTemplate(
    """{
      |  "extractFields": [{"fields": [
      |    {"id": "eid", "jsonPath": "eid", "type": "integer"},
      |    {"id": "unix_ts", "jsonPath": "ut", "type": "unixTimestamp"},
      |    {"id": "iso_ts", "jsonPath": "iso", "type": "isoTimestamp"},
      |    {"id": "amount", "jsonPath": "foo.amount", "type": "float"},
      |    {"id": "flag", "jsonPath": "missing.field"}
      |  ]}]
      |}""".stripMargin)

  // ----------------------------------------------------------- queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("session_routing")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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

    // ---- classic analytics over the TPC-H-ish tables (scale workhorses) ----
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("count_order"),
          avg(col("l_quantity")).as("avg_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    "q3_top_orders" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_custkey"))
        .agg(sum(col("l_quantity")).as("total_qty"), count(lit(1)).as("n_lines"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(10)
    }),
    "q5_nation_rollup" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_lines"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("r_name"), col("n_name"))
    }),
    "w2_windowed_agg" -> ((s, dir) => {
      // Event-time windowed aggregation (streaming-parity operator run in
      // batch: same code path powers the watermarked streaming form).
      val e = t(s, dir, "events")
      graft.streaming.Windows.windowedAgg(e, "ts", "event_type", "user_id", "1 hour")
    }),
    "w1_topn_per_user" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      e.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("user_id"), col("event_id"), col("rn"))
    }),

    // ---- training-data pipeline operators (north star) ----
    "ns_dedup_exact" -> ((s, dir) =>
      graft.ops.Dedup.exact(t(s, dir, "documents"), "text", "doc_id")),
    "ns_url_templates" -> ((s, dir) => {
      // site-structure mining: doc ids become {n}, md5 revisions {hex},
      // so each source host collapses to two template rows
      val d = t(s, dir, "documents")
      val url = concat(lit("https://"), col("source"),
        lit(".example.com/item/"), col("doc_id"),
        when(col("doc_id") % 3 === 0, concat(lit("/rev/"), md5(col("text"))))
          .otherwise(lit("/view")))
      graft.ops.Web.urlTemplates(d.select(url.as("url")), "url")
    }),
    "ns_url_canonical" -> ((s, dir) => {
      // URL canonicalization (web-corpus dedup key): four crawl-variant
      // shapes synthesized per doc — scheme/host case, www, default vs
      // explicit ports, empty paths, tracking params, fragments — pushed
      // through Web.canonicalUrl; the oracle replays every normalization
      // step with the same regex/string ops.
      val d = t(s, dir, "documents")
      val variant = pmod(col("doc_id"), lit(4))
      val url = concat(
        when(variant === 0, lit("HTTP://WWW.")).otherwise(lit("https://")),
        col("source"), lit(".example.com"),
        when(variant === 0, lit(":80")).when(variant === 1, lit(":443"))
          .when(variant === 2, lit(":8080")).otherwise(lit("")),
        when(variant === 3, lit(""))
          .otherwise(concat(lit("/docs/"), col("doc_id"))),
        lit("?utm_source=track&z="), col("lang"), lit("&a=1"),
        when(variant === 1, lit("&fbclid=f")).otherwise(lit("")),
        lit("#frag"))
      d.select(col("doc_id"), graft.ops.Web.canonicalUrl(url).as("canon"))
    }),
    "ns_embed_pca" -> ((s, dir) => {
      // PCA projection with the FROZEN basis: exact integer dots of
      // micro-quantized embeddings against micro-quantized components —
      // the decision-grade preprocessing step before the ANN tiers.
      // posexplode scalarizes for the hash gate (pandas cannot sort
      // array cells).
      val model = graft.ops.Embeddings.PcaModel(
        FrozenPcaComponentsMicro, FrozenPcaMeanMicro,
        dim = 64, quantScale = 1000000L)
      graft.ops.Embeddings.project(t(s, dir, "embeddings"), "vec_id", "embedding", model)
        .select(col("id").as("vec_id"),
          posexplode(col("proj")).as(Seq("comp_idx", "proj")))
    }),
    "ns_quality_classifier" -> ((s, dir) => {
      // Model-based quality filtering (fastText/logreg analog): score every
      // document with the FROZEN trained linear model — integer dot over
      // portable hashed unigram features + integer margin sign, so the
      // decision itself replays in DuckDB. Training provenance is pinned
      // by ClassifierSpec (re-derives the frozen weights from sf0.001).
      val model = graft.ops.Classifier.QualityModel(
        FrozenQualityWeightsMicro, FrozenQualityBiasMicro,
        buckets = 64, maxN = 1, portable = true)
      graft.ops.Classifier.score(t(s, dir, "documents"), model, "text", "doc_id")
        .select(col("id").as("doc_id"), col("n_feats"), col("dot_micro"),
          col("predicted"))
    }),
    "ns_salted_join" -> ((s, dir) => {
      // Salted skew join (Skew.saltedJoin): event_type is a 5-value key —
      // the degenerate-skew regime AQE splits can't fix (every split of a
      // hot partition re-lands the same build rows). The law "salted ==
      // plain equi-join" is the oracle: DuckDB runs the plain join, the
      // query runs the salt-and-replicate plan (saltFactor 8, row spread
      // keyed on event_id).
      val e = t(s, dir, "events")
      val skewed = e.select(col("event_type").as("etype"),
        col("event_id"), col("user_id"))
      val build = e.groupBy(col("event_type").as("etype"))
        .agg(countDistinct(col("user_id")).as("etype_users"))
      graft.ops.Skew.saltedJoin(skewed, build, "etype",
        rowKey = col("event_id"), saltFactor = 8)
    }),
    // portable (md5) hash family: the DuckDB oracle recomputes the full
    // 64-hash signature per document and mirrors the banding semantics
    // (∃ band with identical signature rows), so the candidate set is
    // hash-verified end-to-end, not just row-counted. The maxBucket skew
    // guard is disabled here so the query's semantics are EXACTLY the
    // oracle's at any corpus composition (the guard's pair-bounding is
    // covered by its own OpsSpec test).
    "ns_dedup_minhash" -> ((s, dir) =>
      graft.ops.Dedup.minhashCandidates(t(s, dir, "documents"), "text", "doc_id",
        maxBucket = Int.MaxValue, portable = true)
        .filter(col("est_jaccard") >= 0.5)),
    "ns_dedup_simhash" -> ((s, dir) =>
      graft.ops.Dedup.simhashCandidates(t(s, dir, "documents"), "text", "doc_id",
        maxDist = 10, maxBucket = Int.MaxValue, portable = true)),
    "ns_dedup_cluster" -> ((s, dir) => {
      // End-to-end near-dup dedup: minhash candidates → connected
      // components → one cluster id (min reachable doc) per document.
      // The oracle recomputes the same pair graph (portable signatures)
      // and resolves components with a recursive transitive closure.
      val docs = t(s, dir, "documents")
      val pairs = graft.ops.Dedup.minhashCandidates(docs, "text", "doc_id",
        maxBucket = Int.MaxValue, portable = true)
        .filter(col("est_jaccard") >= 0.5).select("idA", "idB")
      graft.ops.Dedup.clusterAssignments(docs, "doc_id", pairs)
        .select(col("id").as("doc_id"), col("cluster_id"))
    }),
    "ns_cluster_stats" -> ((s, dir) => {
      // cluster-size histogram gate on a deterministic synthetic
      // assignment (doc_id % 97 — the ns_keep_best precedent: the
      // operator under test is the HISTOGRAM; the clustering itself is
      // pinned by ns_dedup_cluster, and re-running it here would only
      // re-pay that gate's oracle-imposed cost)
      graft.ops.Dedup.clusterStats(
        t(s, dir, "documents").select(col("doc_id").as("id"),
          (col("doc_id") % 97).as("cluster_id")))
    }),
    "ns_keep_best" -> ((s, dir) => {
      // Quality-aware duplicate resolution: keep the longest member per
      // cluster (integer score → exactly replayable; ties break by min
      // id). Gated on a PRECOMPUTED deterministic cluster table — the
      // clustering path itself is pinned by ns_dedup_cluster, and re-running
      // minhash + transitive closure here (round 4's shape) tripled the
      // gate's cost on both engines without gating anything new. This is
      // how keepBest runs in production anyway: over a persisted cluster
      // assignment, not fused to the generator.
      val clustered = t(s, dir, "documents")
        .select(col("doc_id").as("id"),
          pmod(col("doc_id"), lit(97L)).as("cluster_id"),
          length(col("text")).cast("long").as("quality"))
      graft.ops.Dedup.keepBest(clustered, "id", "cluster_id", "quality")
        .select(col("id").as("doc_id"), col("cluster_id"), col("quality"),
          col("n_members"), col("keep"))
    }),
    "ns_ngram_jaccard" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 100)
      val ids = d.select(col("doc_id"))
      val pairs = ids.select(col("doc_id").as("idA"))
        .join(ids.select(col("doc_id").as("idB")), col("idA") < col("idB"))
      graft.ops.Dedup.ngramJaccard(pairs, t(s, dir, "documents"), "text", "doc_id")
    }),
    "ns_embed_topk" -> ((s, dir) => {
      // corpus bounded to vec_id < 1000 (the whole table at the
      // correctness SF): the ANN gates deliberately run exhaustively to
      // equal exact top-k, so their bench cost is oracle-imposed — the
      // bound caps it without touching what the gate proves. Applied to
      // the shared exactTopKSql fragment + every query that uses it.
      val e = t(s, dir, "embeddings").filter(col("vec_id") < 1000)
        .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
      graft.ops.Similarity.bruteForceTopK(e.filter(col("id") < 50), e, k = 5)
    }),
    "ns_hard_negatives" -> ((s, dir) => {
      // contrastive-pair mining gate: per query, top-5 most-similar
      // DIFFERENT-label corpus vectors — exact cosine ranking, rank-only
      // output like the ANN gates
      val e = t(s, dir, "embeddings").filter(col("vec_id") < 1000)
        .select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("vec"), col("label"))
      graft.ops.Similarity.hardNegatives(e.filter(col("id") < 50), e, k = 5)
    }),
    // ANN correctness gates run in provably-exhaustive mode (probe every
    // bucket / every IVF cell): the output must then EQUAL exact top-k, so
    // the DuckDB exact-cosine oracle pins the whole pipeline — bucketing,
    // probing, candidate dedup, ranking. Approximate-setting recall (the
    // scale path: probes ≪ 2^planes, nprobe ≪ nCentroids) is gated by
    // ScalaTest recall tests in OpsSpec.
    "ns_ann_lsh" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").filter(col("vec_id") < 1000)
        .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
      graft.ops.Similarity.lshTopK(e.filter(col("id") < 50), e, k = 5,
        planes = 4, tables = 2, probes = 16)
    }),
    "ns_ann_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").filter(col("vec_id") < 1000)
        .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
      graft.ops.Similarity.ivfTopK(e.filter(col("id") < 50), e, k = 5,
        nCentroids = 16, nprobe = 16)
    }),
    "ns_dedup_embed" -> ((s, dir) => {
      // vec_id < 1000 covers the whole table at the correctness SF (500
      // vectors at sf0.01) and bounds the exhaustive-probe gate mode's
      // deliberate all-pairs cost at bench SFs — the all-pairs term is the
      // gate's oracle contract, not the operator's scale path
      val e = t(s, dir, "embeddings").filter(col("vec_id") < 1000)
        .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
      // exhaustive probing makes every pair collide already in table 0, so
      // one table is enough for the correctness gate (more tables only add
      // recall in approximate mode)
      graft.ops.Dedup.embeddingCandidates(e, "vec", "id", threshold = 0.48,
        planes = 4, tables = 1, probes = 16)
        .select(col("idA"), col("idB")) // int-only output for determinism
    }),
    "ns_semdedup" -> ((s, dir) => {
      // SemDeDup in gate mode: nCentroids = 1 makes the within-cell graph
      // the exact pairwise graph, so the oracle pins clustering + cosine +
      // component resolution end to end (cell-pruning recall is
      // OpsSpec-gated). Threshold matches ns_dedup_embed's 0.48 — a
      // boundary the two engines' float cosines are known to agree on.
      // same vec_id < 1000 bound as ns_dedup_embed: full table at the
      // correctness SF, bounded quadratic-by-contract cost at bench SFs
      val e = t(s, dir, "embeddings").filter(col("vec_id") < 1000)
        .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
      graft.ops.Dedup.semanticDedup(e, "vec", "id", threshold = 0.48, nCentroids = 1)
    }),
    "ns_margin_pairs" -> ((s, dir) => {
      // absolute-margin pair mining on int8 codes: integer dots make the
      // best-vs-runner-up margin exact, so the accept DECISION replays;
      // 30000 splits the 50 queries roughly in half at this SF
      val e = t(s, dir, "embeddings").where(col("vec_id") < 1000)
        .select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("vec"))
      val codes = graft.ops.Similarity.quantizeInt8(e)
        .select(col("id"), col("codes").cast("array<double>").as("vec"))
      graft.ops.Similarity.marginPairs(
        codes.where(col("id") < 50), codes, minMargin = 30000L)
    }),
    "ns_kcenter" -> ((s, dir) => {
      // greedy k-center on int8-quantized vectors: every distance is an
      // exact integer (codes-as-doubles, partial sums < 2^53), so the
      // 4-round selection replays bit-for-bit in the unrolled SQL
      val e = t(s, dir, "embeddings").where(col("vec_id") < 500)
        .select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("vec"))
      val codes = graft.ops.Similarity.quantizeInt8(e)
        .select(col("id"), col("codes").cast("array<double>").as("vec"))
      graft.ops.Similarity.kCenterSelect(codes, "vec", "id", k = 4, firstId = 0L)
    }),
    "ns_prototypes" -> ((s, dir) => {
      // SSL-prototypes pruning in fixed-centroid gate mode: 4 one-hot
      // centroids (dims 0/16/32/48) make cell assignment and the
      // prototypicality ranking exactly replayable in SQL — trained-
      // centroid mode is OpsSpec-gated. The float sim column is excluded
      // per the determinism convention; the rank column pins it.
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("vec"))
      val cents = Array.tabulate(4)(j =>
        Array.tabulate(64)(d => if (d == j * 16) 1.0 else 0.0))
      graft.ops.Similarity.prototypicality(e, "vec", "id",
          keepFrac = 0.7, centroids = Some(cents))
        .select(col("id"), col("cell"), col("rank"), col("n_cell"), col("keep"))
    }),
    "ns_dialog_audit" -> ((s, dir) => {
      // SFT transcript hygiene: dialogs assembled deterministically from
      // the event stream (role by event_id parity, empties and special-
      // token leaks injected by modulus), audited with the array-HOF
      // operator; the oracle computes the same checks in row form
      // (arg_min/arg_max + lag window) — two independent formulations of
      // the same contract.
      val e = t(s, dir, "events")
        .where(col("user_id") % 20 === 3)
        .select(col("user_id"), col("event_id"),
          when(col("event_id") % 2 === 0, lit("user"))
            .otherwise(lit("assistant")).as("role"),
          when(col("event_id") % 97 === 0, lit(""))
            .when(col("event_id") % 53 === 0,
              concat(col("event_type"), lit(" <|endoftext|>")))
            .otherwise(col("event_type")).as("content"))
      val dialogs = graft.ops.Curation.assembleDialogs(e, "user_id",
        "event_id", "role", "content")
      graft.ops.Curation.dialogAudit(dialogs, "user_id", "msgs")
    }),
    "ns_gini" -> ((s, dir) =>
      // corpus-concentration headline: how dominated is doc mass per
      // source; tie-invariant coefficient sum makes the milli exact
      graft.ops.Profile.giniByGroup(t(s, dir, "documents"), "n_chars",
        Seq("source"))),
    "ns_token_budget" -> ((s, dir) =>
      // best-data-that-fits: per source, highest-scoring docs until the
      // token budget; strict prefix, slim window exchange
      graft.ops.Curation.selectByTokenBudget(
        t(s, dir, "documents").select(col("doc_id"), col("source"),
          col("n_chars").as("score"),
          call_function("div", col("n_chars"), lit(5L)).as("toks")),
        Seq("source"), "doc_id", "score", "toks", tokenBudget = 3000L)),
    "ns_balance" -> ((s, dir) =>
      // label balance of event types per deterministic split assignment:
      // inverse-Simpson effective labels, integer-exact (no ln)
      graft.ops.Profile.balanceReport(
        t(s, dir, "events").select(col("event_type"),
          (pmod(col("event_id"), lit(10)) < 8).cast("string").as("split")),
        Seq("split"), "event_type")),
    "ns_confusion" -> ((s, dir) => {
      // per-label precision/recall/F1 on the same rater setup as ns_kappa;
      // F1 in count form (2000·tp div (2tp+fp+fn)) avoids milli rounding
      val e = t(s, dir, "events").select(
        col("event_type").as("gold"),
        when(col("event_id") % 5 === 0, lit("view"))
          .otherwise(col("event_type")).as("pred"))
      graft.ops.Profile.confusionReport(e, "gold", "pred")
    }),
    "ns_kappa" -> ((s, dir) => {
      // rater-agreement QA: rater B disagrees on every 5th event (labels
      // it 'view'); chance-corrected agreement in exact DECIMAL milli
      val e = t(s, dir, "events").select(
        col("event_type").as("ra"),
        when(col("event_id") % 5 === 0, lit("view"))
          .otherwise(col("event_type")).as("rb"))
      graft.ops.Profile.cohenKappa(e, "ra", "rb")
    }),
    "ns_preference_audit" -> ((s, dir) => {
      // synthetic preference pairs from the corpus: every 7th rejected is
      // byte-identical to chosen, every 11th is emptied, the rest get a
      // word swap; the audit flags each failure class
      val pairs = t(s, dir, "documents").select(col("doc_id"),
        col("text").as("chosen"),
        when(col("doc_id") % 7 === 0, col("text"))
          .when(col("doc_id") % 11 === 0, lit(""))
          .otherwise(replace(col("text"), lit("value"), lit("worth")))
          .as("rejected"))
      graft.ops.Curation.preferencePairAudit(pairs, "doc_id",
        "chosen", "rejected")
    }),
    "ns_span_corrupt" -> ((s, dir) =>
      // T5-style sentinel masking at 150 permille, 3-token spans; the
      // oracle replays the fold as a recursive CTE over token positions
      // carrying (next-free, sentinel counter, both accumulating strings)
      graft.ops.Curation.spanCorrupt(t(s, dir, "documents"), "doc_id",
        "text", startPermille = 150, spanLen = 3)),
    "ns_word_dropout" -> ((s, dir) =>
      // deterministic 200-permille token corruption; the oracle recomputes
      // the per-(doc, position) portable hash with DuckDB's 1-based lambda
      // index shifted to Spark's 0-based
      graft.ops.Curation.wordDropout(t(s, dir, "documents"), "doc_id",
        "text", dropPermille = 200)),
    "ns_dialog_pipeline" -> ((s, dir) => {
      // SFT capstone: assemble -> audit-filter (no empty turns, <= 1
      // template leak) -> per-turn redact -> turn-aligned pack at budget
      // 9; one grouping exchange total, everything downstream is
      // projections. The oracle derives from the audit/redact/pack
      // fragments in row form, so the composition cannot drift from the
      // single-op gates.
      val e = t(s, dir, "events").where(col("user_id") % 20 === 3)
        .select(col("user_id"), col("event_id"),
          when(col("event_id") % 2 === 0, lit("user"))
            .otherwise(lit("assistant")).as("role"),
          concat(
            when(col("event_id") % 97 === 0, lit(""))
              .when(col("event_id") % 53 === 0,
                concat(col("event_type"), lit(" <|endoftext|>")))
              .otherwise(col("event_type")),
            when(col("event_id") % 3 === 0,
              concat(lit(" mail u"), col("event_id"), lit("@ex.com")))
              .otherwise(lit(""))).as("content"))
      val dialogs = graft.ops.Curation.assembleDialogs(e, "user_id",
        "event_id", "role", "content")
      val audit = graft.ops.Curation.dialogAudit(dialogs, "user_id", "msgs")
      val keep = audit.where(col("n_empty") === 0 && col("n_special") <= 1)
        .select("user_id")
      val clean = dialogs.join(keep, Seq("user_id"), "left_semi")
      val red = clean.select(col("user_id"),
        graft.ops.Curation.redactDialog(col("msgs")).as("msgs"))
      graft.ops.Curation.packDialog(red, "user_id", "msgs", tokenBudget = 9L)
    }),
    "ns_dialog_pack" -> ((s, dir) => {
      // turn-aligned greedy packing at budget 7; turn token counts are
      // deterministic (event_id % 5 + 1 repeats of the event type), and
      // the oracle replays the fold as a recursive CTE over turn positions
      val e = t(s, dir, "events").where(col("user_id") % 20 === 3)
        .select(col("user_id"), col("event_id"),
          when(col("event_id") % 2 === 0, lit("user"))
            .otherwise(lit("assistant")).as("role"),
          repeat(concat(col("event_type"), lit(" ")),
            (col("event_id") % 5 + 1).cast("int")).as("content"))
      val dialogs = graft.ops.Curation.assembleDialogs(e, "user_id",
        "event_id", "role", "content")
      graft.ops.Curation.packDialog(dialogs, "user_id", "msgs", tokenBudget = 7L)
    }),
    "ns_dialog_redact" -> ((s, dir) => {
      // per-turn PII redaction inside assembled dialogs; output scalarizes
      // via posexplode (the compare harness hashes scalars only) and the
      // oracle replays the regexp chain in row form with row_number-1 pos
      val e = t(s, dir, "events").where(col("user_id") % 20 === 3)
        .select(col("user_id"), col("event_id"),
          when(col("event_id") % 2 === 0, lit("user"))
            .otherwise(lit("assistant")).as("role"),
          concat(col("event_type"),
            when(col("event_id") % 3 === 0,
              concat(lit(" mail u"), col("event_id"), lit("@ex.com")))
              .otherwise(lit("")),
            when(col("event_id") % 5 === 0,
              concat(lit(" ip 10.0.0."), col("event_id") % 256))
              .otherwise(lit(""))).as("content"))
      val dialogs = graft.ops.Curation.assembleDialogs(e, "user_id",
        "event_id", "role", "content")
      dialogs.select(col("user_id"),
          posexplode(graft.ops.Curation.redactDialog(col("msgs")))
            .as(Seq("pos", "m")))
        .select(col("user_id"), col("pos"),
          col("m.role").as("role"), col("m.content").as("content"))
    }),
    "ns_benford" -> ((s, dir) =>
      // first-digit law audit over an organic magnitude (o_totalprice,
      // Benford-ish) and a dense surrogate key (o_custkey, flat — large
      // dev_milli by construction): the audit reports, thresholds are the
      // caller's
      graft.ops.Profile.benfordAudit(t(s, dir, "orders"),
        Seq("o_totalprice", "o_custkey"))),
    "ns_code_signals" -> ((s, dir) => {
      // code-vs-prose router features: five RE2-class regexp counts + two
      // permille ratios, one scan projection, replayed verbatim in DuckDB.
      // The corpus is single-line prose, so the gate derives a mixed corpus
      // deterministically first (chained plain substring replaces — both
      // engines scan left-to-right over the source): statement lines,
      // indented lines, camelCase idents, and fenced blocks on every third
      // doc.
      t(s, dir, "documents")
        .select(col("doc_id"),
          concat(
            replace(replace(replace(col("text"),
              lit(" table "), lit(";\n")),
              lit(" row "), lit("\n    ")),
              lit("fast"), lit("fastPath")),
            when(col("doc_id") % 3 === 0,
              lit("\n```\ncode();\n```")).otherwise(lit(""))).as("text"))
        .select(col("doc_id"),
          graft.ops.TextAnalysis.codeSignals(col("text")).as("c"))
        .select(col("doc_id"),
          col("c.n_lines").as("n_lines"),
          col("c.fenced_blocks").as("fenced_blocks"),
          col("c.semi_brace_lines").as("semi_brace_lines"),
          col("c.indented_lines").as("indented_lines"),
          col("c.camel_idents").as("camel_idents"),
          col("c.semi_brace_permille").as("semi_brace_permille"),
          col("c.indent_permille").as("indent_permille"))
    }),
    "ns_acf" -> ((s, dir) =>
      // hourly event-count autocorrelation at lags 1/2/24 — the
      // periodicity confirmation behind the seasonality cells; gaps are
      // zero-count buckets, not missing rows
      graft.ops.Temporal.acf(t(s, dir, "events"), "ts",
        bucketSeconds = 3600L, lags = Seq(1, 2, 24))),
    "ns_sentences" -> ((s, dir) =>
      // sentence rows from the punctuated corpus (same ' value ' -> '. '
      // synthesis as ns_readability); scalarized via posexplode
      t(s, dir, "documents")
        .select(col("doc_id"),
          replace(col("text"), lit(" value "), lit(". ")).as("text"))
        .select(col("doc_id"),
          posexplode(graft.ops.TextAnalysis.sentences(col("text")))
            .as(Seq("pos", "sentence")))),
    "ns_lexical_diversity" -> ((s, dir) =>
      // type-token and hapax ratios per doc; Spark counts hapaxes by
      // sorted-neighbor isolation, the oracle by per-type frequency — two
      // formulations of the same count
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.ops.TextAnalysis.lexicalDiversity(col("text")).as("d"))
        .select(col("doc_id"),
          col("d.n_tokens").as("n_tokens"),
          col("d.n_types").as("n_types"),
          col("d.ttr_permille").as("ttr_permille"),
          col("d.hapax_permille").as("hapax_permille"))),
    "ns_readability" -> ((s, dir) => {
      // Flesch + FK grade in integer milli-points: three regexp_counts and
      // integer divides — one codegen'd scan projection, replayed in DuckDB
      // with len(regexp_extract_all(...)).
      // sentence punctuation is synthesized deterministically (the corpus
      // is unpunctuated word soup): every " value " becomes a period break
      t(s, dir, "documents")
        .select(col("doc_id"),
          replace(col("text"), lit(" value "), lit(". ")).as("text"))
        .select(col("doc_id"),
          graft.ops.TextAnalysis.readability(col("text")).as("r"))
        .select(col("doc_id"),
          col("r.n_words").as("n_words"),
          col("r.n_sentences").as("n_sentences"),
          col("r.n_syllables").as("n_syllables"),
          col("r.flesch_milli").as("flesch_milli"),
          col("r.fk_grade_milli").as("fk_grade_milli"))
    }),
    "ns_text_profile" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      import graft.ops.TextAnalysis._
      d.select(
        col("doc_id"),
        wsTokenCount(col("text")).as("n_tokens_ws"),
        approxBpeTokenCount(col("text")).as("n_tokens_bpe"),
        qualityMetrics(col("text"), DefaultStopwords).as("q"),
        langScores(col("text")).getField("en").as("en_score"),
        langId(col("text")).as("lang_pred"))
        .select(col("doc_id"), col("n_tokens_ws"), col("n_tokens_bpe"),
          col("q.n_chars").as("n_chars"), col("q.n_words").as("n_words"),
          col("q.mean_word_len").as("mean_word_len"),
          col("q.stopword_ratio").as("stopword_ratio"),
          col("q.punct_ratio").as("punct_ratio"),
          col("en_score"), col("lang_pred"))
    }),
    "ns_sentiment" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.select(col("doc_id"), graft.ops.TextAnalysis.sentiment(col("text")).as("snt"))
        .select(col("doc_id"), col("snt.pos_hits").as("pos_hits"),
          col("snt.neg_hits").as("neg_hits"), col("snt.score").as("score"))
    }),
    "ns_fingerprint" -> ((s, dir) => {
      // portable winnowing: the oracle recomputes every k-gram hash and the
      // window minima in SQL; the output aggregates the fingerprint set so
      // values (not just counts) are hash-compared.
      val d = t(s, dir, "documents")
      d.select(col("doc_id"),
        graft.functions.text.winnowFingerprint(col("text"), k = 8, w = 4, portable = true).as("fps"))
        .select(col("doc_id"),
          size(col("fps")).cast("long").as("n_fp"),
          array_min(col("fps")).as("fp_min"),
          array_max(col("fps")).as("fp_max"),
          when(size(col("fps")) === 0, lit(null).cast("long"))
            .otherwise(aggregate(col("fps"), lit(0L), (acc, x) => acc + x)).as("fp_sum"))
    }),
    "ns_chunk" -> ((s, dir) =>
      // training-sequence chunking: 32-token windows, 8-token overlap
      graft.ops.Curation.chunkByTokens(t(s, dir, "documents"), "text", "doc_id",
        size = 32, overlap = 8)),
    "ns_pack" -> ((s, dir) => {
      // chunk → pack pipeline: 32-token chunks greedily packed into
      // 128-token context windows across 8 hash pack-groups. Every slot
      // assignment (group, bin, offset) is deterministic, so the oracle
      // replays the same next-fit recurrence in SQL.
      val chunks = graft.ops.Curation.chunkByTokens(t(s, dir, "documents"),
        "text", "doc_id", size = 32, overlap = 8)
      graft.ops.Curation.packSequences(chunks, "n_chunk_tokens",
        Seq("doc_id", "chunk_idx"), budget = 128, nGroups = 8)
    }),
    "ns_vocab" -> ((s, dir) =>
      // corpus frequency table: top-100 tokens seen >= 2 times, ranked
      // (count desc, token asc) — deterministic incl. ties
      graft.ops.TextAnalysis.vocabulary(t(s, dir, "documents"), "text",
        minCount = 2L, topK = 100)),
    "ns_collocations" -> ((s, dir) =>
      // phrase-table gate: top-50 adjacent pairs seen >= 5 times ranked by
      // exact-decimal lift (micro-units) — observed over independence, the
      // transcendental-free PMI stand-in
      graft.ops.TextAnalysis.collocations(t(s, dir, "documents"), "text",
        minCount = 5L, topK = 50)),
    "ns_profile_grouped" -> ((s, dir) =>
      // exact per-language corpus profile (docs, tokens, vocab breadth,
      // nearest-rank length quantiles) — the oracle twin of the
      // sketch-tier groupProfileSketch (gated in ProfileSpec/PlanSpec)
      graft.ops.Profile.groupProfile(t(s, dir, "documents"), "text", "lang")),
    "ns_heavy_hitters" -> ((s, dir) =>
      // top-5 tokens per language, deterministic ties (count desc, token asc)
      graft.ops.Profile.heavyHitters(t(s, dir, "documents"), "text", "lang", 5)),
    "ns_analyze_table" -> ((s, dir) =>
      // ANALYZE-style one-pass column stats on orders (long, string,
      // double, timestamp columns) — exact tier; every value mapped to
      // BIGINT (string = char lengths, double = floor micro-units,
      // timestamp = epoch micros) so the oracle replays per-column.
      graft.ops.Profile.analyzeColumns(t(s, dir, "orders"))),
    "ns_pagerank" -> ((s, dir) => {
      // link-graph authority over the customer<->supplier bipartite graph
      // (distinct trading pairs, both directions): 3 integer-exact
      // fixed-point rounds in micro-units — the oracle unrolls the same
      // arithmetic in SQL, so every rank matches bit-for-bit.
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("cn"),
          concat(lit("s"), col("l_suppkey")).as("sn")).distinct()
      val edges = pairs.select(col("cn").as("src"), col("sn").as("dst"))
        .unionAll(pairs.select(col("sn").as("src"), col("cn").as("dst")))
      graft.ops.Graph.pageRank(edges, "src", "dst", iters = 3)
    }),
    "ns_triangles" -> ((s, dir) => {
      // Exact triangles + local clustering coefficient on the co-ordered-
      // parts graph (parts sharing an order are adjacent — each order's
      // parts form a clique, so the graph is triangle-rich and overlapping
      // orders fuse cliques). Fixed order slice keeps the gate SF-invariant;
      // the oracle replays orientation, wedges, and closure in SQL.
      val l = t(s, dir, "lineitem").filter(col("l_orderkey") <= 2000)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = l.select(col("ok"), col("pk").as("pa"))
        .join(l.select(col("ok"), col("pk").as("pb")), "ok")
        .where(col("pa") < col("pb")).select("pa", "pb").distinct()
      graft.ops.Graph.triangles(edges, "pa", "pb")
    }),
    "ns_neighbor_jaccard" -> ((s, dir) => {
      // structural mirror detection on the co-ordered-parts graph: part
      // pairs whose neighborhoods overlap in >= 2 nodes, Jaccard-scored in
      // permille. Guard above the max degree, so the output is exact and
      // the oracle replays wedge counting + true-degree Jaccard verbatim.
      val l = t(s, dir, "lineitem").filter(col("l_orderkey") <= 2000)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = l.select(col("ok"), col("pk").as("pa"))
        .join(l.select(col("ok"), col("pk").as("pb")), "ok")
        .where(col("pa") < col("pb")).select("pa", "pb").distinct()
      graft.ops.Graph.neighborJaccard(edges, "pa", "pb", minCommon = 2)
    }),
    "ns_reciprocity" -> ((s, dir) => {
      // directed-graph shape gate: parity-oriented part<->supplier edges
      // give genuine partial reciprocation; one semi-join on the swapped
      // key, one aggregate row
      val l = t(s, dir, "lineitem").filter(col("l_orderkey") <= 2000)
        .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"),
          col("l_linenumber").as("ln"))
        .where(col("pk") =!= col("sk"))
      val edges = l.select(
        when(col("ln") % 2 === 0, col("pk")).otherwise(col("sk")).as("s"),
        when(col("ln") % 2 === 0, col("sk")).otherwise(col("pk")).as("d"))
      graft.ops.Graph.reciprocity(edges, "s", "d")
    }),
    "ns_assortativity" -> ((s, dir) => {
      // degree-degree correlation of the co-ordered-parts graph — one
      // correlation row with the integer-exact corr tail; co-moments ride
      // the contract as STRING (hash-stable cross-engine; see
      // ns_correlation), the operator API keeps decimals
      val l = t(s, dir, "lineitem").filter(col("l_orderkey") <= 2000)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = l.select(col("ok"), col("pk").as("pa"))
        .join(l.select(col("ok"), col("pk").as("pb")), "ok")
        .where(col("pa") < col("pb")).select("pa", "pb").distinct()
      graft.ops.Graph.degreeAssortativity(edges, "pa", "pb")
        .select(col("col_x"), col("col_y"), col("n"),
          col("sum_x").cast("string").as("sum_x"),
          col("sum_y").cast("string").as("sum_y"),
          col("sum_x2").cast("string").as("sum_x2"),
          col("sum_y2").cast("string").as("sum_y2"),
          col("sum_xy").cast("string").as("sum_xy"),
          col("corr_permille"))
    }),
    "ns_label_prop" -> ((s, dir) => {
      // 3 fixed sync LPA rounds on the co-ordered-parts graph; the oracle
      // unrolls each round's neighbor-mode with the (count, label)-max tie
      val l = t(s, dir, "lineitem").filter(col("l_orderkey") <= 2000)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = l.select(col("ok"), col("pk").as("pa"))
        .join(l.select(col("ok"), col("pk").as("pb")), "ok")
        .where(col("pa") < col("pb")).select("pa", "pb").distinct()
      graft.ops.Graph.labelPropagation(edges, "pa", "pb", rounds = 3)
    }),
    "ns_kcore" -> ((s, dir) => {
      // 3-core of the co-ordered-parts graph (peeling to fixed point, 3
      // rounds at this SF). The oracle unrolls 6 peel rounds — extra
      // rounds past the fixed point are no-ops, so it equals convergence.
      val l = t(s, dir, "lineitem").filter(col("l_orderkey") <= 2000)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = l.select(col("ok"), col("pk").as("pa"))
        .join(l.select(col("ok"), col("pk").as("pb")), "ok")
        .where(col("pa") < col("pb")).select("pa", "pb").distinct()
      graft.ops.Graph.kCore(edges, "pa", "pb", k = 3L)
    }),
    "ns_hits" -> ((s, dir) => {
      // Hubs & authorities over the DIRECTED customer→supplier trading
      // graph (customers: pure hubs; suppliers: pure authorities): 2
      // max-normalized integer rounds — the oracle unrolls all four
      // half-steps with scalar-subquery maxima.
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val edges = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst")).distinct()
      graft.ops.Graph.hits(edges, "src", "dst", iters = 2)
    }),
    "ns_pagerank_dangling" -> ((s, dir) => {
      // dangling-mass redistribution gate: customer -> supplier edges only,
      // so every supplier is dangling; each round spreads
      // floor(sum(dangling pr) / N) to every node before damping. The
      // oracle unrolls the same integer arithmetic with a per-round scalar
      // subquery for the dangling sum.
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val edges = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst")).distinct()
      graft.ops.Graph.pageRank(edges, "src", "dst", iters = 3,
        redistributeDangling = true)
    }),
    "ns_ppr" -> ((s, dir) => {
      // personalized PageRank on the bipartite trading graph, restart mass
      // pinned to a deterministic supplier whitelist (s_suppkey % 7 == 1):
      // proximity-to-trusted-seeds vs ns_pagerank's global popularity. The
      // oracle unrolls 2 integer rounds with the seed indicator joined
      // into every damping step.
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("cn"),
          concat(lit("s"), col("l_suppkey")).as("sn")).distinct()
      val edges = pairs.select(col("cn").as("src"), col("sn").as("dst"))
        .unionAll(pairs.select(col("sn").as("src"), col("cn").as("dst")))
      val seeds = t(s, dir, "supplier").where(col("s_suppkey") % 7 === 1)
        .select(concat(lit("s"), col("s_suppkey")).as("seed"))
      graft.ops.Graph.personalizedPageRank(edges, "src", "dst", seeds, "seed",
        iters = 2)
    }),
    "ns_wpagerank" -> ((s, dir) => {
      // traffic-weighted authority: edge weight = order-line count between
      // customer and supplier, mass flows (pr * w) div sumw; oracle unrolls
      // 2 integer rounds with the weighted quotient
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(concat(lit("c"), col("o_custkey")).as("cn"),
          concat(lit("s"), col("l_suppkey")).as("sn"))
        .agg(count(lit(1)).as("w"))
      val edges = pairs.select(col("cn").as("src"), col("sn").as("dst"), col("w"))
        .unionAll(pairs.select(col("sn").as("src"), col("cn").as("dst"), col("w")))
      graft.ops.Graph.weightedPageRank(edges, "src", "dst", "w", iters = 2)
    }),
    "ns_seed_attribution" -> ((s, dir) => {
      // which whitelist supplier vouches for each node: min seed over
      // shortest paths. An eighth of orders (ns_seed_distance covers the
      // quarter graph — the two BFS gates would otherwise be the bench's
      // top pair for pure per-round job overhead); oracle = recursive
      // (node, seed) expansion with min-hops-then-min-seed rollup
      val o = t(s, dir, "orders").where(col("o_orderkey") % 8 === 1)
        .select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("cn"),
          concat(lit("s"), col("l_suppkey")).as("sn")).distinct()
      val edges = pairs.select(col("cn").as("src"), col("sn").as("dst"))
        .unionAll(pairs.select(col("sn").as("src"), col("cn").as("dst")))
      val seeds = t(s, dir, "supplier").where(col("s_suppkey") % 7 === 1)
        .select(concat(lit("s"), col("s_suppkey")).as("seed"))
      graft.ops.Graph.seedAttribution(edges, "src", "dst", seeds, "seed",
        maxHops = 3)
    }),
    "ns_seed_distance" -> ((s, dir) => {
      // BFS hop distance from the ns_ppr supplier whitelist over the same
      // bipartite trading graph — the hard crawl-radius cut next to ns_ppr's
      // soft endorsement ranking. The oracle is a DuckDB recursive CTE
      // (UNION-deduped frontier expansion, min(hops) per node). The graph
      // is a deterministic quarter of orders: the 3 checkpointed rounds pay
      // one edge-scan job each, so the gate trims the oracle-imposed edge
      // count, not the operator (round-4 gate-cost convention).
      val o = t(s, dir, "orders").where(col("o_orderkey") % 4 === 1)
        .select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("cn"),
          concat(lit("s"), col("l_suppkey")).as("sn")).distinct()
      val edges = pairs.select(col("cn").as("src"), col("sn").as("dst"))
        .unionAll(pairs.select(col("sn").as("src"), col("cn").as("dst")))
      val seeds = t(s, dir, "supplier").where(col("s_suppkey") % 7 === 1)
        .select(concat(lit("s"), col("s_suppkey")).as("seed"))
      graft.ops.Graph.seedDistance(edges, "src", "dst", seeds, "seed",
        maxHops = 3)
    }),
    "ns_asof_join" -> ((s, dir) => {
      // each click attaches the user's latest at-or-before purchase —
      // DuckDB's native ASOF JOIN is the oracle; the Spark plan is the
      // union + one-exchange running-last formulation (no join node).
      // Right side deduped to unique (user, time) so the winner is
      // engine-independent.
      val e = t(s, dir, "events").select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"), col("event_type"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"), col("event_id").as("click_id"))
      val purchases = e.where(col("event_type") === "purchase")
        .groupBy("user_id", "ts_us").agg(min("event_id").as("purchase_id"))
      graft.ops.Temporal.asofJoin(clicks, purchases, Seq("user_id"), "ts_us",
        joinType = "inner")
    }),
    "ns_zorder" -> ((s, dir) => {
      // multi-dimensional layout key: 8-bit Morton interleave of
      // (l_partkey, l_suppkey) — the ordering column behind z-ordered
      // writes (compose with Tables.writeSharded); pure bit arithmetic,
      // replayed term-for-term by the oracle.
      val li = t(s, dir, "lineitem")
      li.select(col("l_orderkey"), col("l_linenumber"),
        graft.ops.Tables.zOrderValue(
          Seq(pmod(col("l_partkey"), lit(256)), pmod(col("l_suppkey"), lit(256))),
          bits = 8).as("zval"))
    }),
    "ns_retention" -> ((s, dir) => {
      // daily cohort retention over the event stream: cohort = first-seen
      // day, cells = distinct users active N days later. Window-min first
      // activity (no self-join); oracle replays with a min-join.
      val e = t(s, dir, "events").select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
      graft.ops.Temporal.cohortRetention(e, "user_id", "ts_us",
        period = 86400000000L)
    }),
    "ns_funnel" -> ((s, dir) => {
      // signup -> click -> purchase progression per user, strictly ordered,
      // greedy-earliest (optimal); one exchange, chained sort-free windows.
      // Oracle unrolls the conditional mins as one CTE per step.
      val e = t(s, dir, "events").select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      graft.ops.Temporal.funnel(e, Seq("user_id"), "ts_us", Seq(
        col("event_type") === "signup",
        col("event_type") === "click",
        col("event_type") === "purchase"))
    }),
    "ns_rolling" -> ((s, dir) => {
      // trailing 1h spend per user at every event — RANGE-frame rolling
      // sum/count over integer cents (FP-chain: value*100 then round is a
      // fixed-order double op both engines replay identically; the SUM is
      // over longs, so accumulation order cannot matter).
      val e = t(s, dir, "events").select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      graft.ops.Temporal.rolling(e, Seq("user_id"), "ts_us",
        window = 3600000000L, valueCol = "cents")
    }),
    "ns_gaps" -> ((s, dir) => {
      // downtime detection: every >6h silence per user in the event
      // stream; exactly one row per hole under any tie order
      val e = t(s, dir, "events").select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
      graft.ops.Temporal.gaps(e, Seq("user_id"), "ts_us",
        minGap = 21600000000L)
    }),
    "ns_ldiversity" -> ((s, dir) => {
      // attribute-disclosure audit: customers whose order-status history
      // carries < 3 distinct values — k-anonymity-safe classes the
      // diversity audit still flags
      graft.ops.Curation.lDiversityAudit(t(s, dir, "orders"),
        Seq("o_custkey"), "o_orderstatus", l = 3)
    }),
    "ns_tcloseness" -> ((s, dir) => {
      // distribution-skew disclosure audit: order-priority classes whose
      // status mix sits > 5 permille total-variation from the global mix —
      // exact decimal cross products, one integral divide, so membership
      // (not just the distance) replays bit-for-bit
      graft.ops.Curation.tClosenessAudit(t(s, dir, "orders"),
        Seq("o_orderpriority"), "o_orderstatus", tPermille = 5L)
    }),
    "ns_crosstab" -> ((s, dir) =>
      // categorical association gate: lang × source contingency with
      // exact-decimal lift — marginals from windows (null-safe), one
      // cells-sized frame after the first aggregate
      graft.ops.Profile.crossTab(t(s, dir, "documents"), "lang", "source")),
    "ns_fd" -> ((s, dir) => {
      // functional-dependency discovery over three order columns: the key
      // direction holds, the reverses are violated; oracle replays each
      // pair's two-level distinct aggregate
      graft.ops.Profile.functionalDependencies(t(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderpriority"))
    }),
    "ns_file_stats" -> ((s, dir) => {
      // per-file manifest over the (single-file) lineitem table: counts,
      // min/max, null counts replayed by a whole-table aggregate. Multi-
      // file semantics (disjoint ranges, pruning) are gated in ScalaTest
      // where the file layout is under test control.
      graft.ops.Tables.fileStats(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_returnflag"))
        .select(regexp_extract(col("file"), "([^/]+)$", 1).as("file"),
          col("n_rows"),
          col("l_orderkey_min"), col("l_orderkey_max"), col("l_orderkey_nulls"),
          col("l_returnflag_min"), col("l_returnflag_max"),
          col("l_returnflag_nulls"))
    }),
    "ns_anomalies" -> ((s, dir) => {
      // trailing z-score screen: each spend flagged against its user's own
      // prior-24h mean/variance (integer cents, decimal-promoted squares);
      // the oracle replays the same RANGE frame + HUGEINT comparison.
      val e = t(s, dir, "events").select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      graft.ops.Temporal.anomalies(e, Seq("user_id"), "ts_us", "cents",
        windowUs = 86400000000L, kPermille = 2500L, minPoints = 5L)
    }),
    "ns_trending" -> ((s, dir) =>
      // top-3 event types per 6h tumbling window, deterministic ties
      graft.ops.Temporal.trendingTopK(
        t(s, dir, "events").select(unix_micros(col("ts")).as("ts_us"),
          col("event_type")),
        "ts_us", "event_type", windowMs = 21600000000L, k = 3)),
    "ns_seasonality" -> ((s, dir) =>
      // 168-cell traffic baseline: integer calendar arithmetic on
      // epoch-micros (dow 0 = Monday), exact distinct actors per cell
      graft.ops.Temporal.seasonality(
        t(s, dir, "events").select(unix_micros(col("ts")).as("ts_us"),
          col("user_id")),
        "ts_us", "user_id")),
    "ns_active_users" -> ((s, dir) =>
      // engagement rollup: exact distinct users + events per 6h window
      graft.ops.Temporal.activeActors(
        t(s, dir, "events").select(unix_micros(col("ts")).as("ts_us"),
          col("user_id")),
        "ts_us", "user_id", windowMs = 21600000000L)),
    "ns_transitions" -> ((s, dir) =>
      // Markov journey view: immediate-successor counts per user with
      // integer row-stochastic normalization, (time, id, type) tie order
      graft.ops.Temporal.transitions(
        t(s, dir, "events").select(col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"),
          col("event_type")),
        Seq("user_id"), "ts_us", "event_id", "event_type")),
    "ns_journey_match" -> ((s, dir) =>
      // CEP-lite gate: which users ever purchase DIRECTLY after a click
      // (funnel's anything-between cannot express adjacency). Fixed user
      // slice bounds the journey strings.
      graft.ops.Temporal.journeyMatch(
        t(s, dir, "events").filter(col("user_id") <= 300)
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
            col("event_id"), col("event_type")),
        Seq("user_id"), "ts_us", "event_id", "event_type",
        pattern = ".*click>purchase.*")),
    "ns_resample" -> ((s, dir) => {
      // Per-user 6h-grid LOCF series over integer cents: bucket winner is
      // max (ts, value) — an explicit tie rule the oracle replays with
      // row_number — and the carry is last-non-null over the user's own
      // grid. Fixed user slice keeps the grid bounded.
      val e = t(s, dir, "events").filter(col("user_id") <= 200)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          round(col("value") * 100).cast("long").as("cents"))
      graft.ops.Temporal.resample(e, Seq("user_id"), "ts_us", "cents",
        gridStep = 21600000000L)
    }),
    "ns_interval_join" -> ((s, dir) => {
      // overlapping exposure windows: 1h purchase windows x 30min click
      // windows per user — grid-cell interval join, each pair emitted from
      // exactly one cell; oracle is the plain overlap theta join.
      val e = t(s, dir, "events").select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"), col("event_type"))
      val p = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("ps"),
          (col("ts_us") + lit(3600000000L)).as("pe"),
          col("event_id").as("purchase_id"))
      val c = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("cs"),
          (col("ts_us") + lit(1800000000L)).as("ce"),
          col("event_id").as("click_id"))
      graft.ops.Temporal.intervalJoin(p, "ps", "pe", c, "cs", "ce",
        keyCols = Seq("user_id"), bucketWidth = 900000000L)
    }),
    "ns_sessionize" -> ((s, dir) => {
      // per-event session labels: 1h-gap sessions per user — the batch
      // twin of the streaming session_window (equivalence law in
      // TemporalSpec); oracle replays the boundary-sum window in SQL.
      val e = t(s, dir, "events").select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
      graft.ops.Temporal.sessionize(e, Seq("user_id"), "ts_us",
        gap = 3600000000L)
    }),
    "ns_session_stats" -> ((s, dir) => {
      // per-session rollup over the sessionize labels: bounds + size per
      // (user, session) — tie-safe aggregates on the delta-derived labels
      val e = t(s, dir, "events").select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
      graft.ops.Temporal.sessionStats(e, Seq("user_id"), "ts_us",
        gap = 3600000000L)
    }),
    "ns_trim_tokens" -> ((s, dir) =>
      // context-budget truncation: first 50 whitespace tokens, single-space
      // rejoin (the normalize-family whitespace convention), with counts
      // and the truncation flag — pure scan-stage projection
      graft.ops.Curation.trimToTokens(t(s, dir, "documents"), "text",
        "doc_id", maxTokens = 50)),
    "ns_range_join" -> ((s, dir) => {
      // attribution: clicks within one hour at-or-after a purchase by the
      // same user — point-in-interval via bucketized equi-join (15-min
      // cells), residual-filtered; oracle is the plain BETWEEN theta join.
      val e = t(s, dir, "events").select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"), col("event_type"))
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"), col("event_id").as("click_id"))
      val windows = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("w_start"),
          (col("ts_us") + lit(3600000000L)).as("w_end"),
          col("event_id").as("purchase_id"))
      graft.ops.Temporal.rangeJoin(clicks, "ts_us", windows, "w_start", "w_end",
        keyCols = Seq("user_id"), bucketWidth = 900000000L)
    }),
    "ns_split" -> ((s, dir) =>
      // deterministic 80/10/10 split assignment by portable id hash
      graft.ops.Curation.assignSplit(t(s, dir, "documents"), "doc_id")
        .select("doc_id", "split")),
    "ns_epoch_shuffle" -> ((s, dir) =>
      // deterministic training-order permutation: dense 0-based rank in
      // (portable-hash, id) order, computed with the bucketed two-level
      // rank (never a global window). The oracle IS the global window —
      // one row_number over the same hash — so the distributed ranking
      // must agree with the single-node definition exactly.
      graft.ops.Curation.epochShuffle(t(s, dir, "documents"), "doc_id", epoch = 1)
        .select(col("doc_id"), col("shuffle_pos"))),
    "ns_domains" -> ((s, dir) => {
      // web-curation URL machinery over a deterministic URL column built
      // from real corpus columns (the corpus stores no URLs — same
      // constant-input pattern as the f8 useragent gate): parse, PSL-lite
      // registrable domain (example.<lang> declared public suffixes, www
      // stripping), blocklist tagging.
      val d = t(s, dir, "documents")
      val urls = d.select(col("doc_id"),
        concat(lit("https://"),
          when(pmod(col("doc_id"), lit(7)) === 0, lit("www.")).otherwise(lit("")),
          col("source"), lit(".example."), col("lang"),
          lit("/doc/"), col("doc_id"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit("?ref="), col("lang"))).otherwise(lit(""))).as("url"))
      graft.ops.Web.domainTag(urls, "url",
        blocklist = Seq("src1.example.en", "src2.example.de", "src3.example.zh"),
        multiLabelSuffixes = Seq("example.en", "example.de", "example.es",
          "example.fr", "example.zh"))
    }),
    "ns_links" -> ((s, dir) => {
      // HTML hyperlink extraction over deterministic markup built from
      // corpus columns (the corpus stores no HTML — same constant-input
      // pattern as ns_domains): each doc embeds an absolute, a
      // protocol-relative, a conditional root-relative, and a doc-relative
      // anchor plus three non-navigational ones; the oracle replays the
      // shared AnchorTagRegex through DuckDB's RE2 and every resolution
      // rule (the regex is RE2-portable by construction).
      graft.ops.Web.extractLinks(linksGateInput(s, dir), "text", "url", "doc_id")
    }),
    "ns_link_edges" -> ((s, dir) => {
      // Domain-level link graph over the same synthesized markup:
      // extractLinks → registrable domains (example.{org,net,com} declared
      // multi-label public suffixes so per-subdomain structure survives) →
      // (src, dst) edge weights + distinct-source-doc counts. The oracle
      // replays extraction, resolution, PSL-lite domains, and the
      // two-level aggregate.
      val links = graft.ops.Web.extractLinks(linksGateInput(s, dir), "text", "url", "doc_id")
      graft.ops.Web.linkEdges(links, "url", "doc_id",
        multiLabelSuffixes = Seq("example.org", "example.net", "example.com"))
    }),
    "ns_boilerplate" -> ((s, dir) => {
      // restructure into 5-word lines (same convention as ns_line_dedup),
      // then drop boilerplate lines: < 3 words or stopword ratio < 10%
      val d = t(s, dir, "documents")
      val structured = d.select(col("doc_id"),
        regexp_replace(lower(trim(col("text"))), "((?:\\S+ ){4}\\S+) ", "$1\n").as("text"))
      graft.ops.Curation.removeBoilerplate(structured, "text", "doc_id", "\n",
        minWords = 3, minStopPermille = 100)
    }),
    "ns_dsir" -> ((s, dir) => {
      // DSIR importance machinery, integer-exact subset: hashed 1..2-gram
      // bucket counts (portable hashes) dotted with the global target
      // (lang='de') and raw bucket totals. The ln-based score column is
      // excluded here — libm differences across engines make it
      // non-hash-comparable — and is property-gated in CurationSpec.
      val d = t(s, dir, "documents")
      graft.ops.Curation.dsirScores(d, d.filter(col("lang") === "de"),
        "text", "doc_id", buckets = 1024, portable = true)
        .select("doc_id", "n_feats", "t_hits", "r_hits")
    }),
    "ns_lm_score" -> ((s, dir) => {
      // CCNet-style LM quality scoring, integer-exact subset: a
      // stupid-backoff bigram model trained on the even-id half of the
      // corpus scores every document. The ln-based micronat/ppl columns
      // are engine-local (libm differences are not hash-comparable) and
      // are gated by LmSpec's driver-side replay; the oracle pins the
      // exact join layer — token/OOV/bigram-hit counts and count sums.
      val d = t(s, dir, "documents")
      val model = graft.ops.Lm.train(
        d.filter(pmod(col("doc_id"), lit(2)) === 0), "text")
      graft.ops.Lm.score(d, "text", "doc_id", model)
        .select("doc_id", "n_tokens", "n_oov", "n_hits", "sum_cb", "sum_cw")
    }),
    "ns_bm25" -> ((s, dir) => {
      // BM25 keyword search, integer-exact layer: per-(doc, query-term)
      // postings with tf and dl — the inverted-scoring input the ranking
      // is a pure function of. The ln-based score/ordering is engine-local
      // (libm) and gated by SearchSpec's exact driver-side replay.
      val d = t(s, dir, "documents")
      graft.ops.Search.termPostings(d, "text", "doc_id",
          Seq("join", "filter", "spark"))
        .select(col("id").as("doc_id"), col("term"), col("tf"),
          col("dl").cast("long").as("dl"))
    }),
    "ns_bm25_indexed" -> ((s, dir) => {
      // persisted-index tier: the FULL inverted index restricted to the
      // same query terms must carry the same postings the scan tier
      // derives — shared oracle SQL, so the tiers cannot drift
      val idx = graft.ops.Search.buildBm25Index(t(s, dir, "documents"),
        "text", "doc_id")
      idx.postings.filter(col("term").isin("join", "filter", "spark"))
        .select(col("id").as("doc_id"), col("term"), col("tf"), col("dl"))
    }),
    "ns_substring_candidates" -> ((s, dir) => {
      // MOSS-style shared-substring candidates over winnowing fingerprints
      // (guard disabled + portable hashes so n_shared is EXACTLY the
      // fingerprint-set intersection the oracle recomputes; the skew
      // guard's pair-bounding has its own OpsSpec test). Bounded to 200
      // docs so the oracle's all-pairs intersect stays cheap at any SF.
      val d = t(s, dir, "documents").filter(col("doc_id") < 200)
      graft.ops.Dedup.fingerprintCandidates(d, "text", "doc_id",
        k = 8, w = 4, minShared = 30, maxBucket = Int.MaxValue, portable = true)
    }),
    "ns_substr_dedup" -> ((s, dir) => {
      // ExactSubstr span dedup over a deterministic duplicate injection
      // (the raw corpus is random word soup with no repeated 8-grams, so
      // a shared 13-token license tail is appended to every 3rd doc and
      // appended twice to every 5th — cross-doc AND intra-doc repeats;
      // same constant-injection pattern as ns_pii_redact). The oracle
      // replays shingling, 120-bit keys, first-occurrence resolution,
      // interval covers, and reassembly in SQL.
      val d = t(s, dir, "documents")
      val inj = d.select(col("doc_id"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(3)) === 0, lit(SubstrDedupTail)).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5)) === 0, lit(SubstrDedupTail + SubstrDedupTail))
            .otherwise(lit(""))).as("text"))
      graft.ops.Curation.exactSubstrDedup(inj, "text", "doc_id", minTokens = 8)
    }),
    "ns_bpe_fertility" -> ((s, dir) =>
      // tokenizer-fairness audit: bytes-per-token by language under the
      // frozen merges — shared encode CTEs with ns_bpe
      graft.ops.Bpe.fertilityByGroup(t(s, dir, "documents"), "text", "lang",
        FrozenBpeMerges)),
    "ns_bpe" -> ((s, dir) => {
      // frozen BPE tokenizer (trained once on the sf0.001 corpus via
      // Bpe.learnFromCorpus, then applied everywhere — the standard
      // train-small/apply-everywhere tokenizer lifecycle). Encoding ships
      // the merge ranks in the task closure and runs as a zero-shuffle
      // scan; the oracle replays the same merges in rank order as a
      // DuckDB replace() chain, which is provably equivalent to the
      // iterative lowest-rank encoder for learned merge tables (a merge
      // can only create pairs of strictly higher rank).
      val d = t(s, dir, "documents")
      d.select(col("doc_id"),
        posexplode(graft.ops.Bpe.encode(col("text"), FrozenBpeMerges))
          .as(Seq("pos", "token")))
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
    }),
    // ---- corpus curation (training-mix construction) ----
    "ns_pii_redact" -> ((s, dir) => {
      // PII is injected deterministically from doc_id (the corpus itself is
      // PII-free word soup), so detection counts vary 0/1 per category and
      // the redaction output is fully oracle-checkable.
      val d = t(s, dir, "documents")
      val injected = d.select(col("doc_id"), concat(
        col("text"),
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit(" contact u"), col("doc_id").cast("string"), lit("@ex.com"))).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit(" call +1-555-123-"), lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(lit(" card 4111"), lpad(col("doc_id").cast("string"), 12, "0"))).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(lit(" ip 10."), pmod(col("doc_id"), lit(256)).cast("string"),
            lit(".0."), pmod(col("doc_id"), lit(100)).cast("string"))).otherwise(lit(""))
      ).as("text"))
      injected.select(col("doc_id"),
        graft.ops.Curation.piiStats(col("text")).as("p"),
        graft.ops.Curation.redactPii(col("text")).as("redacted"))
        .select(col("doc_id"), col("p.n_emails").as("n_emails"), col("p.n_phones").as("n_phones"),
          col("p.n_ccs").as("n_ccs"), col("p.n_ips").as("n_ips"), col("redacted"))
    }),
    "ns_decontaminate" -> ((s, dir) => {
      // benchmark = every 17th doc (an "eval set"); corpus = the rest.
      // 4-word grams give a non-trivial contamination rate on this corpus.
      val d = t(s, dir, "documents")
      graft.ops.Curation.decontaminate(
        d.filter(pmod(col("doc_id"), lit(17)) =!= 0),
        d.filter(pmod(col("doc_id"), lit(17)) === 0),
        "text", "doc_id", n = 4)
    }),
    "ns_split_by_cluster" -> ((s, dir) => {
      // leakage-free split gate on a deterministic synthetic clustering
      // (%37): members of one cluster must share a split label; docs
      // outside the cluster table band by their own id
      val d = t(s, dir, "documents")
      val clusters = d.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("id"), (col("doc_id") % 37).as("cluster_id"))
      graft.ops.Curation.assignSplitByCluster(
          d.select(col("doc_id"), col("lang")), "doc_id", clusters)
        .select(col("doc_id"), col("lang"), col("split"))
    }),
    "ns_contamination_report" -> ((s, dir) => {
      // per-source rollup of the same benchmark split ns_decontaminate
      // pins — the release-gate number, with shared gram semantics
      val d = t(s, dir, "documents")
      graft.ops.Curation.contaminationReport(
        d.filter(pmod(col("doc_id"), lit(17)) =!= 0),
        d.filter(pmod(col("doc_id"), lit(17)) === 0),
        "text", "doc_id", "source", n = 4)
    }),
    "ns_badwords" -> ((s, dir) => {
      // Blocklist term matching: one Aho-Corasick pass per doc counting
      // every (overlapping) occurrence of each term plus the distinct-term
      // count. Terms deliberately include a phrase, a high-frequency
      // single char (matches inside words — substring semantics are the
      // contract), and an absent term. The oracle replays with a
      // positional substring scan per term.
      graft.ops.TextAnalysis.termMatchStats(t(s, dir, "documents"),
        "text", "doc_id",
        terms = Seq("big table", "slow", "a", "nosuchterm"), minMatches = 3)
    }),
    "ns_decontaminate_bloom" -> ((s, dir) => {
      // The Bloom-prefiltered tier of decontamination (the 100 TB path:
      // benchmark grams become a fixed-size bit filter checked map-side;
      // only candidate survivors enter the exact join that kills the
      // filter's false positives). EXACTNESS is the operator's contract —
      // no false negatives, FPs removed — so the oracle is the plain
      // distinct-overlap count restricted to hit docs, identical to
      // ns_decontaminate's construction minus the zero-hit rows.
      val d = t(s, dir, "documents")
      graft.ops.Curation.decontaminateBloom(
        d.filter(pmod(col("doc_id"), lit(17)) =!= 0),
        d.filter(pmod(col("doc_id"), lit(17)) === 0),
        "text", "doc_id", n = 4)
    }),
    "ns_align_scores" -> ((s, dir) => {
      // quantile recalibration gate: per-language n_chars ranks map onto
      // the reference sample's (doc_id < 100) distribution — rank-to-rank
      // integer selection, aligned values are reference multiset members
      val docs = t(s, dir, "documents")
      graft.ops.Curation.alignScores(docs, "n_chars", "doc_id",
        Seq("lang"), docs.filter(col("doc_id") < 100), "n_chars")
    }),
    "ns_filter_funnel" -> ((s, dir) =>
      // per-rule kill attribution in application order, one scan: chars
      // floor, language allowlist, approximate word floor — n_killed sums
      // to exactly input minus survivors
      graft.ops.Curation.filterFunnel(t(s, dir, "documents"), Seq(
        "min_chars" -> (col("n_chars") >= 100),
        "lang_ok" -> (col("lang") =!= "zh"),
        "min_words" -> (length(col("text"))
          - length(translate(col("text"), " ", "")) + 1 >= 30)))),
    "ns_quality_filter" -> ((s, dir) =>
      // thresholds chosen so each rule actually splits this corpus
      // (106 short docs, 6 low-MWL, 112 low-stopword, 181 with dup 2-token
      // lines at sf0.01); lineLen=2 exercises the duplicate-line rules.
      graft.ops.Curation.qualityFilter(t(s, dir, "documents"), "text", "doc_id",
        minWords = 30, maxWords = 10000, minMeanWordLen = 4.0, maxMeanWordLen = 10.0,
        minStopwordHits = 2, minAlphaWordFrac = 0.9,
        maxDupLineFrac = 0.05, maxDupLineCharFrac = 0.05,
        maxDup2gramFrac = 0.08, maxDup3gramFrac = 0.04, lineLen = 2)),
    "ns_repetition" -> ((s, dir) =>
      // Gopher repetition signals (top-2/3/4-gram + dup-5..10-gram char
      // fractions). Top thresholds tightened from Gopher's table-A1 values
      // so keep actually splits this corpus (352/500 at sf0.01); dup
      // thresholds stay Gopher's (this corpus has no 5-gram repeats, the
      // fractions themselves are still hashed).
      graft.ops.Curation.repetitionFilter(t(s, dir, "documents"), "text", "doc_id",
        maxTopFracs = Seq(0.05, 0.04, 0.04))),
    "ns_fuzzy_join" -> ((s, dir) => {
      // PassJoin edit-distance self-join on customer names (ed <= 2 =
      // names differing in <= 2 digit edits). Blocking is provably
      // complete, so the output EQUALS the oracle's brute-force join.
      // The id cap keeps the gate (and its quadratic oracle) SF-invariant.
      val c = t(s, dir, "customer").filter(col("c_custkey") <= 1000)
      graft.ops.Fuzzy.editDistanceSelfJoin(c, "c_name", "c_custkey", maxDist = 2)
    }),
    "ns_jaccard_join" -> ((s, dir) => {
      // EXACT set-similarity self-join (df-ordered prefix filtering — no
      // hashing, no approximation): 3-gram Jaccard >= 0.5. Unbounded
      // buckets = provably complete, so the output EQUALS the all-pairs
      // oracle. Fixed id slice keeps the quadratic oracle SF-invariant.
      val d = t(s, dir, "documents").filter(col("doc_id") <= 1000)
      graft.ops.Dedup.jaccardJoin(d, "text", "doc_id", minJaccardPermille = 500)
    }),
    "ns_containment_join" -> ((s, dir) => {
      // Directional containment (sub mostly inside sup) at 70% of the
      // sub's 3-gram set — unbounded buckets = provably complete, so
      // output EQUALS the all-pairs oracle. Same fixed slice as the
      // symmetric gate; asymmetric pairs (short-in-long) appear only
      // here, symmetric near-dups appear in both directions.
      val d = t(s, dir, "documents").filter(col("doc_id") <= 1000)
      graft.ops.Dedup.containmentJoin(d, "text", "doc_id", minContainPermille = 700)
    }),
    "ns_jaro_winkler" -> ((s, dir) => {
      // Scalar parity gate for the Jaro-Winkler comparator: score every
      // adjacent (k, k+1) part-name pair, emit micro-unit floors. The
      // oracle replays with DuckDB's OWN jaro_winkler_similarity (byte-
      // based Jaro, 0.7 boost threshold, 4-byte prefix cap), which
      // JaroWinklerExpr matches bit-for-bit — same FP reduction order —
      // so the floor is deterministic. Linear in |part|: SF-scaling safe.
      val p = t(s, dir, "part").select(col("p_partkey").as("id"), col("p_name").as("nm"))
      val b = p.select((col("id") - 1).as("id"), col("nm").as("nm2"))
      p.join(b, "id").select(col("id"),
        floor(graft.functions.text.jaroWinkler(col("nm"), col("nm2")) * lit(1e6))
          .cast("long").as("sim_ppm"))
    }),
    "ns_jw_join" -> ((s, dir) => {
      // Record-linkage join: initial-letter blocking + exact comparator,
      // replayed END-TO-END (blocking included) by the oracle, so the
      // gate checks the operator's documented contract — pairs sharing
      // the block key at/above threshold — not a weaker projection of
      // it. Fixed id slice keeps the quadratic-in-block cost SF-invariant.
      val p = t(s, dir, "part").filter(col("p_partkey") <= 600)
      graft.ops.Fuzzy.jaroWinklerSelfJoin(p, "p_name", "p_partkey", minSim = 0.92)
        .select(col("idA"), col("idB"),
          floor(col("sim") * lit(1e6)).cast("long").as("sim_ppm"))
    }),
    "ns_snm_join" -> ((s, dir) =>
      // Sorted-neighborhood candidates over customer names, window 5 —
      // deterministic positional pairs regardless of the range
      // partitioner's sampled boundaries (two-level rank); the oracle is
      // one global row_number + a rank-distance join.
      graft.ops.Fuzzy.sortedNeighborhoodJoin(
        t(s, dir, "customer").filter(col("c_custkey") <= 2000),
        "c_name", "c_custkey", window = 5, buckets = 8)),
    "ns_entity_resolution" -> ((s, dir) =>
      // end-to-end ER capstone: JW blocking + 0.92 threshold + transitive
      // closure + min-id canonical — the oracle replays blocking,
      // comparator, recursive closure, and the canonical rule
      graft.ops.Fuzzy.resolveEntities(
        t(s, dir, "part").filter(col("p_partkey") <= 600),
        "p_name", "p_partkey", minSim = 0.92)),
    "ns_percentile_rank" -> ((s, dir) =>
      // cross-domain score calibration: per-language integer per-mille
      // percentile of a length score — rank*1000 div (n-1), ties by id
      graft.ops.Curation.percentileRank(
        t(s, dir, "documents").select(col("doc_id"), col("lang"),
          length(col("text")).cast("long").as("score")),
        "score", "doc_id", Seq("lang"))),
    "ns_distinctive_terms" -> ((s, dir) =>
      // integer contrastive tf-idf (tf * 1e6 div df) — the FP-log-free
      // ranking replays exactly in DuckDB
      graft.ops.Profile.distinctiveTerms(t(s, dir, "documents"), "text",
        "lang", "doc_id", k = 10)),
    "ns_strip_markup" -> ((s, dir) => {
      // Markup-removal gate: both engines wrap every document in the SAME
      // HTML scaffold (tags, comment, script/style blocks, the named
      // entities) and must extract the identical text. The scaffold is
      // shared via htmlWrapSpark/htmlWrapSqlExpr.
      val docs = t(s, dir, "documents")
      docs.select(col("doc_id"),
        graft.ops.TextAnalysis.stripMarkup(htmlWrapSpark(col("text"))).as("clean"))
    }),
    "ns_script_profile" -> ((s, dir) => {
      // Unicode-script histogram gate: inject fixed non-Latin runs (unicode
      // literals on the Spark side — chr() wraps at 256) so every class has
      // mass; the oracle SQL is GENERATED from the same ScriptClasses table.
      val docs = t(s, dir, "documents")
      val mixed = concat(col("text"), scriptInjectLit)
      graft.ops.TextAnalysis.scriptProfile(
        docs.select(col("doc_id"), mixed.as("text")), "text", "doc_id")
    }),
    "ns_cross_corpus" -> ((s, dir) => {
      // Priority cross-corpus dedup: pseudo-corpora from one table (id mod
      // 3), "wiki" outranks "web"; winner = min (priority, id) per digest.
      val docs = t(s, dir, "documents")
      graft.ops.Dedup.crossCorpusDedup(
        Seq(
          "wiki" -> docs.filter(col("doc_id") % 3 === 0),
          "web" -> docs.filter(col("doc_id") % 3 =!= 0)),
        "text", "doc_id")
    }),
    "ns_token_drift" -> ((s, dir) => {
      // Integer-exact unigram drift between two pseudo-snapshots (id mod
      // 2): micro-frequency diff² div sum — values AND ranking replay.
      val docs = t(s, dir, "documents")
      graft.ops.Profile.tokenDrift(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "text", k = 50)
    }),
    "ns_stream_monitor" -> ((s, dir) =>
      // Batch-mode run of the streaming ingest-quality monitor — the SAME
      // code path the stream executes (watermark applies to streams only),
      // so the windowed counters oracle-gate here while StreamingSpec
      // covers the live micro-batch behavior. The HLL dup-rate column is
      // projected away: sketch values don't replay across engines.
      // props lengths are 8–9 chars, so keep = len >= 9 splits the corpus.
      graft.streaming.Windows.streamingCorpusMonitor(
        t(s, dir, "events"), "ts", "props", "event_type", "1 hour",
        keep = length(col("props")) >= 9)
        .drop("approx_distinct")),
    "ns_key_profile" -> ((s, dir) =>
      // Join-key skew measurement over the 5-value event_type key (the
      // same degenerate regime ns_salted_join exercises): top-3 keys with
      // integer share and hot-key multiple — the saltFactor evidence.
      graft.ops.Skew.keyProfile(
        t(s, dir, "events").select(col("event_type")), Seq("event_type"), k = 3)),
    "ns_domain_filter" -> ((s, dir) => {
      // Table-driven blocklist tier (UT1-style million-entry lists):
      // broadcast anti-join on the registrable domain over the same URL
      // synthesis as ns_domains; blocked subdomains disappear with their
      // parents.
      import s.implicits._
      val d = t(s, dir, "documents")
      val urls = d.select(col("doc_id"),
        concat(lit("https://"),
          when(pmod(col("doc_id"), lit(7)) === 0, lit("www.")).otherwise(lit("")),
          col("source"), lit(".example."), col("lang"),
          lit("/doc/"), col("doc_id")).as("url"))
      val blocklist = Seq("src1.example.en", "src2.example.de", "src3.example.zh")
        .toDF("domain")
      graft.ops.Web.domainFilterTable(urls, "url", blocklist,
        multiLabelSuffixes = Seq("example.en", "example.de", "example.es",
          "example.fr", "example.zh"))
    }),
    "ns_epoch_plan" -> ((s, dir) => {
      // Token-budgeted epoch plan over per-language corpus stats: with a
      // 30k budget and a 2.5-epoch repetition cap, the de target (450‰)
      // is cap-limited (shortfall > 0), en/es/fr are satisfiable, and zh
      // is untargeted (audit row). All-integer → full DuckDB replay.
      val stats = t(s, dir, "documents")
        .groupBy(col("lang").as("stratum"))
        .agg(sum(graft.ops.TextAnalysis.wsTokenCount(col("text"))).as("tokens"))
      graft.ops.Curation.epochPlan(stats, "stratum", "tokens",
        targetPermille = Map("en" -> 200, "de" -> 450, "es" -> 250, "fr" -> 100),
        budgetTokens = 30000L, maxEpochsMilli = 2500L)
    }),
    "ns_keywords" -> ((s, dir) => {
      // Per-doc top-5 keywords by the integer tf-idf variant (inverse
      // prevalence in permille), df-adaptive stopword drop at 790‰.
      // Integer scores + alphabetical ties make rank/tf/df/score replay
      // exactly in the DuckDB window.
      graft.ops.TextAnalysis.keywords(t(s, dir, "documents"), "text", "doc_id",
        k = 5, minTermLen = 3, maxDfPermille = 790)
    }),
    "ns_profile_drift" -> ((s, dir) => {
      // Shape drift between two pseudo-snapshots (doc_id parity): per
      // (lang, metric) integer deltas of the exact group profile —
      // "did the corpus shape move between releases".
      val docs = t(s, dir, "documents")
      graft.ops.Profile.profileDrift(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), "text", "lang")
    }),
    "ns_line_dedup" -> ((s, dir) => {
      // restructure the word soup into 5-word lines (the corpus has no
      // newlines), then C4-style global line dedup: only the first global
      // occurrence of each line survives; docs reassemble in order.
      // Chunking via one codegen'd regexp_replace (every 5th token
      // separator becomes \n) — the transform∘slice HOF formulation is
      // interpreted and re-evaluates per consumer of the frame.
      val d = t(s, dir, "documents")
      val structured = d.select(col("doc_id"),
        regexp_replace(lower(trim(col("text"))), "((?:\\S+ ){4}\\S+) ", "$1\n").as("text"))
      graft.ops.Curation.lineDedup(structured, "text", "doc_id", "\n")
    }),
    "ns_line_dedup_doc" -> ((s, dir) => {
      // within-doc repeat removal: restructure into 5-word lines, then
      // plant a repeat of each doc's own first line — the zero-shuffle
      // local pass must remove exactly the planted copy and reassemble
      val structured = regexp_replace(lower(trim(col("text"))),
        "((?:\\S+ ){4}\\S+) ", "$1\n")
      val planted = concat(structured, lit("\n"),
        substring_index(structured, "\n", 1))
      graft.ops.Curation.dedupeLinesInDoc(
        t(s, dir, "documents").select(col("doc_id"), planted.as("text")),
        "text", "doc_id", "\n")
    }),
    "ns_sample_stratified" -> ((s, dir) => {
      // deterministic training-mix sampling: per-language per-mille rates
      // (mode=rate) and an exact per-language quota (mode=quota), both
      // driven by the portable md5 hash so DuckDB reproduces membership.
      val d = t(s, dir, "documents")
      val rates = Map("en" -> 250, "de" -> 900, "es" -> 500, "fr" -> 750, "zh" -> 100)
      graft.ops.Curation.stratifiedSample(d, "doc_id", "lang", rates, defaultPermille = 0)
        .select(lit("rate").as("mode"), col("doc_id"), col("lang"))
        .unionByName(
          graft.ops.Curation.stratifiedQuota(d, "doc_id", "lang", quota = 20)
            .select(lit("quota").as("mode"), col("doc_id"), col("lang")))
    }),
    "ns_multimodal" -> ((s, dir) => {
      val media = graft.ops.Multimodal.fromDocuments(t(s, dir, "documents"), "doc_id", "text", "text/plain")
      // md5-derived metadata (see Multimodal.fromDocuments) lets the oracle
      // recompute n_frames; n_nonzero gates the decode-stub feature output
      // (every ASCII payload byte votes >0 into its dim — so exactly
      // min(n_bytes, dim) feature dims are positive).
      graft.ops.Multimodal.extractFeatures(media, dim = 16).toDF()
        .select(col("media_id"), col("n_frames"), size(col("feature")).as("feat_dim"),
          size(filter(col("feature"), x => x > 0)).as("n_nonzero"))
    }),
    "ns_ann_pq" -> ((s, dir) => {
      // Product-quantization ANN in lossless gate mode: ksub = 512 ≥ the
      // sf0.01 corpus's distinct subvectors per subspace, so codebooks
      // reconstruct every vector exactly, ADC scoring IS the exact cosine
      // (per-subspace partial sums differ from the sequential cosine only
      // in final ulps — the gate corpus's neighbor margins are many orders
      // larger, the same FP-margin assumption the LSH/IVF gates make),
      // and the output must EQUAL exact brute-force top-k (exactTopKSql
      // oracle — mutually gated with LSH/IVF/brute force). Compression-mode
      // recall (ksub ≪ corpus, the 100 TB memory-bound tier) is
      // OpsSpec-gated.
      val e = t(s, dir, "embeddings").filter(col("vec_id") < 1000)
        .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
      graft.ops.Similarity.pqTopK(e.filter(col("id") < 50), e, k = 5, m = 8, ksub = 512)
    }),
    "ns_media_phash" -> ((s, dir) => {
      // 60-bit perceptual hash per media payload. Pure-integer threshold
      // arithmetic (see MediaPHashExpr) and ASCII gate data (byte ==
      // character) make the hash exactly replayable in the DuckDB oracle
      // from per-position-class byte sums.
      val media = graft.ops.Multimodal.fromDocuments(
        t(s, dir, "documents"), "doc_id", "text", "text/plain")
      graft.ops.Multimodal.pHash(media)
    }),
    "ns_media_neardup" -> ((s, dir) => {
      // Banded-pHash near-dup pairs in gate mode (skew cap disabled so the
      // SQL band self-join replays the pair set exactly; the capped scale
      // path is OpsSpec-gated).
      val media = graft.ops.Multimodal.fromDocuments(
        t(s, dir, "documents"), "doc_id", "text", "text/plain")
      graft.ops.Multimodal.phashCandidates(media, maxDist = 3, maxBucket = Int.MaxValue)
    }),
    "ns_incremental_exact" -> ((s, dir) => {
      // Continuous-ingestion exact dedup: docs < 250 stand in for the
      // existing corpus (its index would be a persisted table), >= 250 for
      // the new batch. The oracle replays digest building, the corpus
      // anti-lookup, and within-batch first-occurrence.
      val docs = t(s, dir, "documents")
      val index = graft.ops.Dedup.exactIndex(
        docs.filter(col("doc_id") < 250), "text", "doc_id")
      graft.ops.Dedup.incrementalExact(
        docs.filter(col("doc_id") >= 250), index, "text", "doc_id")
    }),
    "ns_incremental_neardup" -> ((s, dir) => {
      // Near-dup candidates of the new batch against the prebuilt corpus
      // minhash index — portable hash family + cap disabled so DuckDB
      // replays signatures, band equality, and est_jaccard exactly.
      val docs = t(s, dir, "documents")
      val index = graft.ops.Dedup.minhashIndex(
        docs.filter(col("doc_id") < 250), "text", "doc_id", portable = true)
      graft.ops.Dedup.incrementalMinhashCandidates(
        docs.filter(col("doc_id") >= 250), index, "text", "doc_id",
        maxBucket = Int.MaxValue)
    }),
    "ns_incremental_simhash" -> ((s, dir) => {
      // SimHash analog of ns_incremental_neardup: batch vs prebuilt
      // simhash index, portable hashes + cap disabled so DuckDB replays
      // fingerprints, chunk banding, and hamming exactly.
      val docs = t(s, dir, "documents")
      val index = graft.ops.Dedup.simhashIndex(
        docs.filter(col("doc_id") < 250), "text", "doc_id", portable = true)
      graft.ops.Dedup.incrementalSimhashCandidates(
        docs.filter(col("doc_id") >= 250), index, "text", "doc_id",
        maxDist = 10, maxBucket = Int.MaxValue)
    }),
    "ns_length_histogram" -> ((s, dir) => {
      // Integer log2-bucket length histogram per language — bucket is a
      // binary-digit count, so boundaries replay with no FP log.
      graft.ops.Profile.lengthHistogram(t(s, dir, "documents"), "text", "lang")
    }),
    "ns_audit_candidates" -> ((s, dir) => {
      // Self-audit gate: hash-sample half the minhash candidates and
      // verify them with exact unigram Jaccard at a 500permille bar. Every
      // stage — banded candidates, portable-hash sampling, integer
      // cross-multiply verdicts, the per-mille precision — replays in
      // DuckDB via the shared fragments.
      val docs = t(s, dir, "documents")
      val pairs = graft.ops.Dedup.minhashCandidates(docs, "text", "doc_id",
        maxBucket = Int.MaxValue, portable = true)
        .filter(col("est_jaccard") >= 0.5).select("idA", "idB")
      graft.ops.Dedup.auditCandidates(pairs, docs, "text", "doc_id",
        minJaccardPermille = 500, samplePermille = 500)
    }),
    "ns_audit_recall" -> ((s, dir) => {
      // Recall-audit gate: portable-hash-sample 600permille of a fixed doc
      // slice, build the complete 3-gram-Jaccard>=0.5 truth set among the
      // sampled docs with the exact prefix-filtered join (3-gram = the
      // shingle family the minhash signatures hash — truth and generator
      // must grade the SAME similarity), and measure how many truth pairs
      // the minhash generator surfaced. Every stage replays in DuckDB.
      val docs = t(s, dir, "documents")
      val pairs = graft.ops.Dedup.minhashCandidates(docs, "text", "doc_id",
        maxBucket = Int.MaxValue, portable = true)
        .filter(col("est_jaccard") >= 0.5).select("idA", "idB")
      graft.ops.Dedup.auditRecall(pairs, docs.filter(col("doc_id") <= 2000),
        "text", "doc_id", minJaccardPermille = 500, samplePermille = 600,
        shingleLen = 3)
    }),
    "ns_ranking_eval" -> ((s, dir) => {
      // Retrieval-eval harness gate: grade exact cosine top-5 against the
      // label ground truth (same-label vectors are the relevant set).
      // Both rankings and metrics are integer-exact, so DuckDB replays
      // recall@5 and MRR bit-for-bit on top of the shared exact-top-k
      // oracle.
      val e = t(s, dir, "embeddings").filter(col("vec_id") < 1000)
        .select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("vec"), col("label"))
      val predicted = graft.ops.Similarity.bruteForceTopK(
        e.select("id", "vec").filter(col("id") < 50), e.select("id", "vec"), k = 5)
        .withColumnRenamed("neighbor_id", "doc_id")
      val truth = e.select(col("id").as("query_id"), col("label"))
        .filter(col("query_id") < 50)
        .join(e.select(col("id").as("doc_id"), col("label")), "label")
        .filter(col("query_id") =!= col("doc_id"))
        .select("query_id", "doc_id")
      graft.ops.Search.rankingMetrics(predicted, truth, k = 5)
    }),
    "ns_embed_pool" -> ((s, dir) =>
      // chunk→doc mean pooling gate: pool the embeddings per label into
      // integer micro-unit prototypes — exact division, replayed per
      // (label, dim) by the oracle
      graft.ops.Embeddings.meanPool(t(s, dir, "embeddings"), "label",
        "embedding", dim = 64)),
    "ns_group_affinity" -> ((s, dir) =>
      // Corpus-cartography gate: pairwise centroid affinity between the
      // label groups — integer-exact pooled components, dots, and squared
      // norms; the cosine's fixed-order IEEE tail (two sqrts, one divide,
      // one floor) replays bit-for-bit in DuckDB
      graft.ops.Embeddings.groupAffinity(t(s, dir, "embeddings"), "label",
        "embedding", dim = 64)),
    "ns_embed_outliers" -> ((s, dir) =>
      // Label-noise triage gate: integer squared distance to the own-label
      // centroid + deterministic outlier rank — no floats, bit-exact replay
      graft.ops.Embeddings.centroidOutliers(t(s, dir, "embeddings"), "label",
        "vec_id", "embedding", dim = 64)),
    "ns_embed_profile" -> ((s, dir) => {
      // Embedding QA: per-dim exact integer micro-moments + collapsed
      // flag over the embeddings table. Every value is a long sum/min/max
      // of quantized ints, so DuckDB replays the profile bit-for-bit.
      graft.ops.Embeddings.embeddingProfile(t(s, dir, "embeddings"),
        "embedding", dim = 64)
    }),
    "ns_embed_norms" -> ((s, dir) => {
      // One-row corpus norm profile (squared micro-norm extremes, zero
      // vectors, truncated integer mean).
      graft.ops.Embeddings.normProfile(t(s, dir, "embeddings"),
        "embedding", dim = 64)
    }),
    "ns_normalize" -> ((s, dir) => {
      // Canonical text normalization gate: both engines build the SAME
      // messy variant of every document (tabs, NBSP, a control char,
      // a unicode line separator, double spaces, mixed case appended)
      // and must normalize it to the identical canonical string.
      val docs = t(s, dir, "documents")
      // literals, not chr(): Spark's chr wraps at 256 (chr(8232) = "("),
      // DuckDB's chr is by codepoint — the SQL side uses chr(codepoint)
      val messy = concat(
        lit("\t"), col("text"), lit("  "),
        lit("\u00a0"), lit("MiXeD  CASE"),
        lit("\u0007"), lit("\u2028"),
        lit(" tail "))
      docs.select(col("doc_id"),
        graft.ops.TextAnalysis.normalizeText(messy).as("norm"))
    }),
    "ns_decontaminate_neardup" -> ((s, dir) => {
      // Near-dup decontamination: docs < 250 play the benchmark, the rest
      // the corpus; portable hashes + exhaustive buckets so the oracle
      // replays the banded candidate generation and the Jaccard threshold
      // exactly (same shared fragments as the other minhash gates).
      val docs = t(s, dir, "documents")
      graft.ops.Curation.decontaminateNearDup(
        docs.filter(col("doc_id") >= 250).select("doc_id", "text"),
        docs.filter(col("doc_id") < 250),
        "text", "doc_id", minJaccard = 0.5, portable = true)
        .select(col("doc_id"), col("contaminated"))
    }),
    "ns_index_stats" -> ((s, dir) => {
      // index health gate: bucket-size histogram over band-slice buckets
      // of the portable minhash signatures (slice-as-bucket keeps the
      // bucket key oracle-replayable; the histogram reduction is what the
      // gate pins)
      val docs = t(s, dir, "documents")
      val sig = graft.ops.Dedup.minhashSigAndBuckets(col("text"),
        3, 64, 16, portable = true).getField("sig")
      val entries = docs.select(col("doc_id"), sig.as("sig"))
        .select(col("doc_id"), posexplode(transform(
          sequence(lit(0), lit(15)),
          b => concat_ws(",", slice(col("sig"), b * 4 + 1, lit(4)))))
          .as(Seq("band", "bucket")))
      graft.ops.Dedup.indexStats(entries, Seq("band", "bucket"))
    }),
    "ns_incremental_embed" -> ((s, dir) => {
      // semantic incremental-index tier: vectors >= 400 probe the < 400
      // index with exhaustive probes (2^planes) so candidates are
      // provably complete and the all-pairs integer-cosine oracle pins
      // bucketing, collision, scoring, and the threshold; tables = 2
      // (one fully-probed table is already complete — the second
      // exercises the multi-table dedup without oracle-imposed cost)
      val e = t(s, dir, "embeddings")
      val idx = graft.ops.Dedup.embedIndex(
        e.filter(col("vec_id") < 100), "embedding", "vec_id", tables = 2)
      graft.ops.Dedup.incrementalEmbedCandidates(
        e.filter(col("vec_id") >= 100 && col("vec_id") < 1100), idx,
        "embedding", "vec_id", minCosPermille = 400L, probes = 16)
    }),
    "ns_decontaminate_embed" -> ((s, dir) => {
      // Semantic decontamination tier: vectors < 25 play the benchmark;
      // per corpus vector its max integer-cosine over the benchmark, the
      // deterministic argmax, and the flag at 990 permille
      val e = t(s, dir, "embeddings")
      graft.ops.Curation.decontaminateEmbedding(e,
        e.filter(col("vec_id") < 25), "embedding", "vec_id",
        minCosPermille = 990L, dim = 64)
    }),
    "ns_dataset_card" -> ((s, dir) => {
      // One-call per-language dataset card (exact tier): profile counts +
      // exact dup rate + Gopher-quality keep rate (same thresholds as the
      // ns_quality_filter gate — the oracle reuses that SQL verbatim via
      // qualityFilterSql, so the two gates cannot drift).
      val docs = t(s, dir, "documents")
      val keep = graft.ops.Curation.qualityFilter(docs, "text", "doc_id",
        minWords = 30, maxWords = 10000, minMeanWordLen = 4.0, maxMeanWordLen = 10.0,
        minStopwordHits = 2, minAlphaWordFrac = 0.9,
        maxDupLineFrac = 0.05, maxDupLineCharFrac = 0.05,
        maxDup2gramFrac = 0.08, maxDup3gramFrac = 0.04, lineLen = 2)
        .select(col("doc_id"), col("keep"))
      graft.ops.Profile.datasetCard(
        docs.select("doc_id", "lang", "text").join(keep, "doc_id"),
        "text", "lang", keepCol = Some("keep"))
    }),
    "ns_correlation" -> ((s, dir) => {
      // one-scan Pearson matrix over integer metrics: exact decimal
      // co-moments + the integer-exact BigInteger-isqrt corr tail. The
      // CONTRACT casts the scale-0 decimal co-moments to STRING (plain
      // integer text, identical in Spark and DuckDB) because DECIMAL is
      // the one type generic hash comparators stringify differently per
      // engine path; the operator API keeps decimals.
      val m = graft.ops.Profile.correlationMatrix(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents")),
        Seq("o_orderkey", "o_custkey", "cents"))
      m.select(col("col_x"), col("col_y"), col("n"),
        col("sum_x").cast("string").as("sum_x"),
        col("sum_y").cast("string").as("sum_y"),
        col("sum_x2").cast("string").as("sum_x2"),
        col("sum_y2").cast("string").as("sum_y2"),
        col("sum_xy").cast("string").as("sum_xy"),
        col("corr_permille"))
    }),
    "ns_robust_outliers" -> ((s, dir) =>
      // median/MAD spend-spike screen per event type at the 3.5-MAD rule,
      // integer cents — both medians replay as rank windows in the oracle
      graft.ops.Profile.robustOutliers(
        t(s, dir, "events").select(col("event_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("cents")),
        "cents", "event_id", Seq("event_type"))),
    "ns_integrity_audit" -> ((s, dir) =>
      // orphan check against a deliberately truncated dim table (TPC-H
      // fks are valid, so the gate drops customers > 1000 to synthesize
      // violations): orders whose customer vanished, with row counts
      graft.ops.Tables.integrityAudit(
        t(s, dir, "orders"), "o_custkey",
        t(s, dir, "customer").filter(col("c_custkey") <= 1000), "c_custkey")),
    "ns_kanon_audit" -> ((s, dir) =>
      // re-identification risk audit: (nation, segment) classes smaller
      // than k=10 — classes out, never rows
      graft.ops.Curation.kAnonymityAudit(t(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"), k = 10L)),
    "ns_kanon_suppress" -> ((s, dir) =>
      // suppression enforcement: rows surviving the k=10 bar, slim output
      graft.ops.Curation.suppressToK(t(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"), k = 10L)
        .select("c_custkey", "c_nationkey", "c_mktsegment")),
    "ns_changelog_merge" -> ((s, dir) => {
      // CDC merge gate: snapshot = docs <= 3000; a three-layer synthetic
      // changelog over docs <= 3600 exercises insert (keys past the
      // snapshot), update chains (v1 then v2), delete (v2 delete outranks
      // v1 upsert), the same-version upsert-over-delete tie (%16 keys
      // reinserted), and passthrough (odd keys). The oracle replays the
      // layers and the (version, is_upsert) winner rule.
      val docs = t(s, dir, "documents")
      val snap = docs.filter(col("doc_id") <= 3000)
        .select(col("doc_id"), col("text"), col("lang"))
      val base = docs.filter(col("doc_id") <= 3600)
      val c1 = base.filter(col("doc_id") % 2 === 0).select(col("doc_id"),
        lit("upsert").as("op"), lit(1L).as("version"),
        concat(lit("v1:"), col("text")).as("text"), col("lang"))
      val c2 = base.filter(col("doc_id") % 4 === 0).select(col("doc_id"),
        when(col("doc_id") % 8 === 0, "delete").otherwise("upsert").as("op"),
        lit(2L).as("version"),
        concat(lit("v2:"), col("text")).as("text"), col("lang"))
      val c3 = base.filter(col("doc_id") % 16 === 0).select(col("doc_id"),
        lit("upsert").as("op"), lit(2L).as("version"),
        concat(lit("v2b:"), col("text")).as("text"), col("lang"))
      graft.ops.Tables.applyChangelog(snap, c1.unionAll(c2).unionAll(c3), "doc_id")
    }),
    "ns_snapshot_diff" -> ((s, dir) => {
      // Dataset-versioning audit: two snapshots derived deterministically
      // from the documents table (old = id < 400; new = id >= 100 with
      // every 7th doc's text revised), diffed by md5 digest. The oracle
      // replays the digests and the full-outer classification.
      val docs = t(s, dir, "documents")
      val old = docs.filter(col("doc_id") < 400).select(col("doc_id"), col("text"))
      val nw = docs.filter(col("doc_id") >= 100).select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      graft.ops.Tables.snapshotDiff(old, nw, "doc_id", "text",
        includeUnchanged = true)
    }),
    "ns_corpus_overlap" -> ((s, dir) => {
      // Dataset-overlap audit: corpus-level MinHash signatures of two
      // document snapshots (portable hash family), joined per hash
      // component. The oracle recomputes every per-doc signature, takes
      // the same element-wise minima per corpus, and replays the match
      // flags — pinning signature, merge, and compare end to end.
      val docs = t(s, dir, "documents")
      graft.ops.Dedup.corpusOverlap(
        graft.ops.Dedup.corpusSignature(
          docs.filter(col("doc_id") < 250), "text", portable = true),
        graft.ops.Dedup.corpusSignature(
          docs.filter(col("doc_id") >= 250), "text", portable = true))
    }),
    "ns_top_fraction" -> ((s, dir) => {
      // Per-language top-300‰ quality keep (exact tier, n_chars as the
      // integer score): pure integer rank predicate, so DuckDB replays
      // the kept set row-for-row including the doc_id tie-break.
      val docs = t(s, dir, "documents").select("doc_id", "lang", "n_chars")
      graft.ops.Curation.keepTopFraction(docs, "n_chars", Seq("lang"), 300, "doc_id")
    }),
    "ns_hybrid" -> ((s, dir) => {
      // Hybrid retrieval gate: RRF-fuse two rankings that are BOTH exactly
      // replayable — the integer tf/coverage keyword tier and the
      // exact-cosine vector tier — so the oracle pins the whole fusion
      // (contribution integer division, accumulation, final ranking).
      // hybridTopK's BM25+vector default follows the BM25 determinism
      // convention (float ranking gated in SearchSpec).
      val docs = t(s, dir, "documents")
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
      val qv = e.filter(col("id") === 0).select("vec").head().getSeq[Double](0).toArray
      val text = graft.ops.Search.tfTopK(docs, "text", "doc_id",
        Seq("join", "filter", "data"), k = 100)
      val vec = graft.ops.Search.vectorTopK(e, qv, k = 100)
      graft.ops.Search.rrfFuse(Seq(text, vec), k = 50)
    }),
    "ns_pipeline" -> ((s, dir) =>
      // Composed curation pipeline (dedup → lang → quality → split): the
      // oracle replays every stage AND the first-drop precedence, pinning
      // that the operators compose without semantic drift.
      graft.ops.Pipelines.disposition(t(s, dir, "documents"), "text", "doc_id")),
    "ns_pipeline_funnel" -> ((s, dir) =>
      // the audit rollup of the disposition table (stage × split counts)
      graft.ops.Pipelines.funnel(
        graft.ops.Pipelines.disposition(t(s, dir, "documents"), "text", "doc_id"))),
    "ns_embed_int8" -> ((s, dir) => {
      // int8 scalar quantization: the rounding chain is deterministic
      // IEEE double ops in fixed order, so codes replay bit-for-bit.
      // posexplode scalarizes the codes array — the check harness sorts
      // rows with pandas, which cannot order array cells.
      val e = t(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vec"))
      graft.ops.Similarity.quantizeInt8(e)
        .select(col("id"), col("vmin"), col("vmax"),
          posexplode(col("codes")).as(Seq("pos", "code")))
    }),
    "ns_media_frames" -> ((s, dir) => {
      // fixed-stride frame fingerprints (31-bit md5-derived — the oracle
      // recomputes every window hash)
      val media = graft.ops.Multimodal.fromDocuments(
        t(s, dir, "documents"), "doc_id", "text", "text/plain")
      graft.ops.Multimodal.frameFingerprints(media, n = 8, w = 16, stride = 64)
    }),
    "ns_media_keyframes" -> ((s, dir) => {
      // shot-boundary gate: synthesize held shots (block1 ×3 then
      // block2 ×2 of each doc's padded payload) — the keyframe reduction
      // must emit exactly the run starts, replayed fp-for-fp
      val planted = t(s, dir, "documents").select(col("doc_id"),
        concat(
          repeat(substring(rpad(col("text"), 192, "x"), 1, 64), 3),
          repeat(substring(rpad(col("text"), 192, "x"), 65, 64), 2)).as("text"))
      val media = graft.ops.Multimodal.fromDocuments(
        planted, "doc_id", "text", "text/plain")
      graft.ops.Multimodal.keyframes(media, n = 8, w = 16, stride = 64)
    }),
    "ns_media_frame_neardup" -> ((s, dir) => {
      // frame-overlap near-dup gate: corpus ∪ tail-trimmed copies
      // (media_id + 100000) — fixed-stride anchoring makes each trimmed
      // copy collide with its original on every frame the trim didn't
      // touch, so the pair set is rich and exactly replayable
      val docs = t(s, dir, "documents")
      val trimmed = docs.select((col("doc_id") + 100000).as("doc_id"),
        expr("substr(text, 1, greatest(length(text) - 5, 0))").as("text"))
      val media = graft.ops.Multimodal.fromDocuments(
        docs.select("doc_id", "text").unionByName(trimmed), "doc_id", "text", "text/plain")
      graft.ops.Multimodal.frameNearDupCandidates(media, n = 8, w = 16,
        stride = 64, minShared = 4, maxBucket = Int.MaxValue)
    }),
    "ns_ngram_vocab" -> ((s, dir) =>
      // collocation table: the n>1 face of the vocabulary machinery
      // (same heap-top-K plan, bigram grams)
      graft.ops.TextAnalysis.vocabulary(t(s, dir, "documents"), "text",
        minCount = 2, topK = 100, n = 2))
  )

  /** Query-term postings (tf, dl) replay — shared by the scan-tier
    * (`ns_bm25`) and index-tier (`ns_bm25_indexed`) gates so the two
    * tiers are pinned to the SAME inverted representation.
    */
  private val bm25PostingsOracleSql: String =
    """WITH tk AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents)
      |SELECT doc_id, t AS term, count(*) AS tf, CAST(any_value(n) AS BIGINT) AS dl
      |FROM (SELECT doc_id, len(toks) AS n, unnest(toks) AS t FROM tk)
      |WHERE t IN ('join', 'filter', 'spark')
      |GROUP BY 1, 2""".stripMargin

  /** The 64 portable-minhash signature components as DuckDB expressions —
    * generated from the SAME affine constants the Spark-side
    * MinHashExpr(portable = true) uses (graft.functions.text.PortableHash),
    * so the oracle recomputes signatures value-for-value.
    */
  private def minhashSigSql: String = {
    import graft.functions.text.PortableHash
    (0 until 64).map(j =>
      s"list_min(list_transform(hs, h -> (${PortableHash.a(j)} * h + ${PortableHash.b(j)}) % ${PortableHash.P}))")
      .mkString("[", ",\n          ", "]")
  }

  /** Shared CTE stanza computing per-document portable-minhash signatures —
    * one definition feeds every minhash-derived oracle (candidates +
    * clustering) so the hash family can never silently diverge between
    * them.
    */
  /** Full Gopher-quality replay (per-doc signals + keep decision) with the
    * ns_quality_filter gate thresholds — shared verbatim by
    * ns_quality_filter and the per-language keep-rate leg of
    * ns_dataset_card, so the two oracles can never drift.
    */
  private val qualityFilterSql: String =
    """WITH tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
      |st AS (
      |  SELECT doc_id, len(toks) AS n_words,
      |    list_sum(list_transform(toks, t -> length(t))) AS sum_chars,
      |    len(list_filter(toks, x -> x IN ('the','a','an','and','or','of','to','in','is','it','that','for','on','with','as'))) AS stop_hits,
      |    len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha_words,
      |    list_transform(range(1, (len(toks) + 1) // 2 + 1),
      |      i -> array_to_string(toks[(i-1)*2+1 : (i-1)*2+2], ' ')) AS lines,
      |    CASE WHEN len(toks) < 2 THEN [] ELSE list_transform(range(1, len(toks)),
      |      i -> array_to_string(toks[i:i+1], ' ')) END AS g2,
      |    CASE WHEN len(toks) < 3 THEN [] ELSE list_transform(range(1, len(toks) - 1),
      |      i -> array_to_string(toks[i:i+2], ' ')) END AS g3
      |  FROM tk),
      |st2 AS (
      |  SELECT *, len(lines) AS n_lines, len(list_distinct(lines)) AS n_dist,
      |    list_sum(list_transform(lines, l -> length(l))) AS chars_total,
      |    list_sum(list_transform(list_distinct(lines), l -> length(l))) AS chars_dist,
      |    CASE WHEN len(g2) = 0 THEN 0.0
      |      ELSE CAST(list_sum(list_transform(g2, x -> length(x))) - list_sum(list_transform(list_distinct(g2), x -> length(x))) AS DOUBLE)
      |           / list_sum(list_transform(g2, x -> length(x))) END AS d2,
      |    CASE WHEN len(g3) = 0 THEN 0.0
      |      ELSE CAST(list_sum(list_transform(g3, x -> length(x))) - list_sum(list_transform(list_distinct(g3), x -> length(x))) AS DOUBLE)
      |           / list_sum(list_transform(g3, x -> length(x))) END AS d3
      |  FROM st)
      |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
      |  CAST(sum_chars AS DOUBLE) / n_words AS mean_word_len,
      |  CAST(stop_hits AS BIGINT) AS stop_hits,
      |  CAST(alpha_words AS DOUBLE) / n_words AS frac_alpha,
      |  CAST(n_lines AS BIGINT) AS n_lines,
      |  CAST(n_lines - n_dist AS DOUBLE) / n_lines AS dup_line_frac,
      |  CASE WHEN chars_total = 0 THEN 0.0
      |       ELSE CAST(chars_total - chars_dist AS DOUBLE) / chars_total END AS dup_char_frac,
      |  d2 AS dup_2gram_frac,
      |  d3 AS dup_3gram_frac,
      |  (n_words >= 30 AND n_words <= 10000
      |   AND CAST(sum_chars AS DOUBLE) / n_words >= 4.0
      |   AND CAST(sum_chars AS DOUBLE) / n_words <= 10.0
      |   AND stop_hits >= 2
      |   AND CAST(alpha_words AS DOUBLE) / n_words >= 0.9
      |   AND CAST(n_lines - n_dist AS DOUBLE) / n_lines <= 0.05
      |   AND CAST(chars_total - chars_dist AS DOUBLE) / chars_total <= 0.05
      |   AND d2 <= 0.08 AND d3 <= 0.04) AS keep
      |FROM st2""".stripMargin

  /** Gopher repetition-signal replay for ns_repetition — CTEs generated per
    * n from the same (n, threshold) tables the Spark query uses, so the
    * two sides can't drift. Top-gram ties replay via ORDER BY cnt DESC,
    * gram (binary collation = the expression's UTF-8-byte tie rule).
    */
  private def repetitionSql: String = {
    val topThresholds = Seq(2 -> 0.05, 3 -> 0.04, 4 -> 0.04)
    val dupThresholds = Seq(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)
    def gramsOf(n: Int) =
      s"CASE WHEN len(toks) < $n THEN [] ELSE list_transform(range(1, len(toks) - $n + 2), i -> array_to_string(toks[i:i+${n - 1}], ' ')) END"
    val tops = topThresholds.map { case (n, _) =>
      s"""g$n AS (SELECT doc_id, ${gramsOf(n)} AS gs FROM tk),
         |c$n AS (SELECT doc_id, g AS gram, count(*) AS cnt
         |        FROM (SELECT doc_id, unnest(gs) AS g FROM g$n) GROUP BY 1, 2),
         |w$n AS (SELECT doc_id, gram, cnt,
         |          row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram) AS rn,
         |          sum(cnt * length(gram)) OVER (PARTITION BY doc_id) AS total FROM c$n),
         |t$n AS (SELECT doc_id, gram AS top_gram,
         |          CAST(cnt * length(gram) AS DOUBLE) / total AS top_frac FROM w$n WHERE rn = 1)""".stripMargin
    }
    val dups = dupThresholds.map { case (n, _) =>
      s"""d$n AS (
         |  SELECT doc_id, CASE WHEN len(gs) = 0 THEN 0.0
         |    ELSE CAST(list_sum(list_transform(gs, x -> length(x))) - list_sum(list_transform(list_distinct(gs), x -> length(x))) AS DOUBLE)
         |         / list_sum(list_transform(gs, x -> length(x))) END AS dup_frac
         |  FROM (SELECT doc_id, ${gramsOf(n)} AS gs FROM tk))""".stripMargin
    }
    val keep = (topThresholds.map { case (n, t) => s"COALESCE(t$n.top_frac, 0.0) <= $t" } ++
      dupThresholds.map { case (n, t) => s"d$n.dup_frac <= $t" }).mkString(" AND ")
    s"""WITH tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents),
       |${(tops ++ dups).mkString(",\n")}
       |SELECT tk.doc_id,
       |  ${topThresholds.map { case (n, _) =>
            s"COALESCE(t$n.top_gram, '') AS top_${n}gram, COALESCE(t$n.top_frac, 0.0) AS top_${n}gram_frac" }
            .mkString(",\n  ")},
       |  ${dupThresholds.map { case (n, _) => s"d$n.dup_frac AS dup_${n}gram_frac" }.mkString(",\n  ")},
       |  ($keep) AS keep
       |FROM tk
       |${topThresholds.map { case (n, _) => s"LEFT JOIN t$n USING (doc_id)" }.mkString(" ")}
       |${dupThresholds.map { case (n, _) => s"JOIN d$n USING (doc_id)" }.mkString(" ")}""".stripMargin
  }

  /** Shared HTML scaffold for ns_strip_markup: both engines wrap the
    * document text in THIS string (no single quotes — it goes into a SQL
    * literal verbatim) and must strip it back to
    * `Doc <text> & tail "q" <3 'a'`. Kept as one pair of constants so the
    * two sides cannot drift.
    */
  private val htmlPrefix =
    "<html><head><style type=\"text/css\">p { color: red }</style>" +
      "<script>var x = \"<b>1</b>\";</script></head>" +
      "<body><!-- note --><h1>Doc</h1><p class=\"lead\">"
  private val htmlSuffix =
    " &amp; tail &quot;q&quot;&nbsp;&lt;3 &apos;a&#39;</p></body></html>"

  private def htmlWrapSpark(inner: Column): Column =
    concat(lit(htmlPrefix), inner, lit(htmlSuffix))

  /** DuckDB replay of one [[graft.ops.Profile.groupProfile]] pass over
    * `documents` restricted by `whereSql`, as a chain of CTEs ending in
    * `<pref>p(lang, n_docs, total_tokens, distinct_tokens, p50_tokens,
    * p90_tokens)`. Shared by ns_profile_grouped-family gates so a derived
    * gate (profile drift) cannot diverge from the base profile replay.
    */
  private def profileSideCtes(pref: String, whereSql: String): String =
    raw"""${pref}d AS (
         |  SELECT lang, CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n
         |  FROM documents $whereSql),
         |${pref}b AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |             CAST(sum(n) AS BIGINT) AS total_tokens FROM ${pref}d GROUP BY 1),
         |${pref}r AS (SELECT lang, n, row_number() OVER (PARTITION BY lang ORDER BY n) AS rn,
         |             count(*) OVER (PARTITION BY lang) AS cnt FROM ${pref}d),
         |${pref}q AS (SELECT lang,
         |        max(CASE WHEN rn = CAST(ceil(0.5 * cnt) AS BIGINT) THEN n END) AS p50_tokens,
         |        max(CASE WHEN rn = CAST(ceil(0.9 * cnt) AS BIGINT) THEN n END) AS p90_tokens
         |      FROM ${pref}r GROUP BY 1),
         |${pref}tk AS (SELECT lang, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
         |       FROM documents $whereSql),
         |${pref}dt AS (SELECT lang, CAST(count(DISTINCT tok) AS BIGINT) AS distinct_tokens
         |       FROM ${pref}tk GROUP BY 1),
         |${pref}p AS (SELECT b.lang, n_docs, total_tokens, distinct_tokens, p50_tokens, p90_tokens
         |       FROM ${pref}b b JOIN ${pref}dt USING (lang) JOIN ${pref}q USING (lang))""".stripMargin

  /** DuckDB replay of [[graft.ops.Web.registrableDomain]] (PSL-lite) over
    * a host-typed SQL expression — shared by the ns_domains-family gates.
    */
  private def regDomainSql(hostExpr: String, suffixes: Seq[String]): String = {
    val inList = suffixes.map(x => s"'$x'").mkString(", ")
    s"""CASE WHEN len(string_split($hostExpr, '.')) >= 3
       |          AND array_to_string(string_split($hostExpr, '.')[-2:], '.') IN ($inList)
       |     THEN array_to_string(string_split($hostExpr, '.')[-3:], '.')
       |     WHEN len(string_split($hostExpr, '.')) >= 2
       |     THEN array_to_string(string_split($hostExpr, '.')[-2:], '.')
       |     ELSE $hostExpr END""".stripMargin
  }

  /** DuckDB twin of [[linksGateInput]] + [[graft.ops.Web.extractLinks]]:
    * synthesizes the identical markup, extracts with the same
    * AnchorTagRegex (both engines run RE2-compatible patterns), and
    * replays the drop-filter and all four absolutization rules. Ends with
    * a `links` CTE of (doc_id, url, link_pos, href, anchor, abs_url).
    * Note DuckDB regexp_replace needs the explicit 'g' flag to match
    * Spark's replace-all default.
    */
  private def linksGateCtes: String =
    """d AS (
      |  SELECT doc_id,
      |    'https://' || source || '.example.com/dir/page' || doc_id || '.html' AS url,
      |    '<p>intro</p><A class="nav" HREF="https://ext' || (doc_id % 5) ||
      |      '.example.org/p?q=1">Ext <b>' || lang || '</b>' || chr(10) || ' site</A>' ||
      |      '<a href="//cdn' || (doc_id % 3) || '.example.net/lib.js">proto rel</a>' ||
      |      CASE WHEN doc_id % 2 = 0 THEN '<a href="/abs/' || doc_id || '">abs path</a>' ELSE '' END ||
      |      '<a href="rel' || (doc_id % 7) || '.html">doc rel</a><a href="#top">t</a>' ||
      |      '<a href="mailto:a@b.c">m</a><a href="javascript:void(0)">j</a>' AS text
      |  FROM documents),
      |lx AS (
      |  SELECT doc_id, url,
      |    regexp_extract_all(text, '(?i)<a\s[^>]*href="([^"]*)"[^>]*>([\s\S]*?)</a>', 1) AS hrefs,
      |    regexp_extract_all(text, '(?i)<a\s[^>]*href="([^"]*)"[^>]*>([\s\S]*?)</a>', 2) AS anchors
      |  FROM d),
      |li AS (
      |  SELECT doc_id, url, CAST(i AS INT) AS link_pos,
      |         hrefs[CAST(i AS INT) + 1] AS href, anchors[CAST(i AS INT) + 1] AS anchor
      |  FROM (SELECT doc_id, url, hrefs, anchors, unnest(range(len(hrefs))) AS i FROM lx)),
      |lr AS (
      |  SELECT doc_id, url, link_pos, href,
      |    trim(regexp_replace(regexp_replace(anchor, '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')) AS anchor,
      |    lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS pscheme,
      |    lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS phost,
      |    regexp_replace(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)', 1), '/[^/]*$', '') AS pdir
      |  FROM li
      |  WHERE NOT (href = '' OR href LIKE '#%' OR regexp_matches(href, '^(?i)(javascript|mailto|tel):'))),
      |links AS (
      |  SELECT doc_id, url, link_pos, href, anchor,
      |    CASE WHEN regexp_matches(href, '^[a-zA-Z][a-zA-Z0-9+.-]*://') THEN href
      |         WHEN href LIKE '//%' THEN pscheme || ':' || href
      |         WHEN href LIKE '/%' THEN pscheme || '://' || phost || href
      |         ELSE pscheme || '://' || phost || pdir || '/' || href END AS abs_url
      |  FROM lr)""".stripMargin

  /** Shared input frame for the ns_links / ns_link_edges gates:
    * deterministic HTML-ish markup + page URL synthesized per document
    * from real corpus columns. Exercises every [[graft.ops.Web
    * .extractLinks]] path: absolute (mixed-case tag, nested markup +
    * newline in the anchor body), protocol-relative, conditional
    * root-relative (even ids only), doc-relative, and three dropped
    * non-navigational hrefs. [[linksGateCtes]] is the DuckDB twin.
    */
  private def linksGateInput(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val html = concat(
      lit("<p>intro</p><A class=\"nav\" HREF=\"https://ext"), pmod(col("doc_id"), lit(5)),
      lit(".example.org/p?q=1\">Ext <b>"), col("lang"), lit("</b>\n site</A>"),
      lit("<a href=\"//cdn"), pmod(col("doc_id"), lit(3)),
      lit(".example.net/lib.js\">proto rel</a>"),
      when(pmod(col("doc_id"), lit(2)) === 0,
        concat(lit("<a href=\"/abs/"), col("doc_id"), lit("\">abs path</a>")))
        .otherwise(lit("")),
      lit("<a href=\"rel"), pmod(col("doc_id"), lit(7)),
      lit(".html\">doc rel</a><a href=\"#top\">t</a>"),
      lit("<a href=\"mailto:a@b.c\">m</a><a href=\"javascript:void(0)\">j</a>"))
    val url = concat(lit("https://"), col("source"), lit(".example.com/dir/page"),
      col("doc_id"), lit(".html"))
    d.select(col("doc_id"), url.as("url"), html.as("text"))
  }

  /** DuckDB replay of [[graft.ops.TextAnalysis.stripMarkup]] over the same
    * scaffold — identical RE2-class patterns, every replace with the 'g'
    * flag (DuckDB replaces first-only by default; Spark replaces all).
    */
  private def stripMarkupSql: String = {
    val chain = Seq(
      "(?s)<!--.*?-->" -> " ",
      "(?is)<script\\b[^>]*>.*?</script>" -> " ",
      "(?is)<style\\b[^>]*>.*?</style>" -> " ",
      "<[^>]*>" -> " ",
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ",
      "&amp;" -> "&",
      "\\s+" -> " ")
    val expr = chain.foldLeft("h") { case (acc, (pat, rep)) =>
      val sqlRep = rep.replace("'", "''")
      s"regexp_replace($acc, '$pat', '$sqlRep', 'g')"
    }
    s"""WITH w AS (SELECT doc_id, '$htmlPrefix' || text || '$htmlSuffix' AS h FROM documents)
       |SELECT doc_id, trim($expr) AS clean FROM w""".stripMargin
  }

  /** Non-Latin injection for ns_script_profile, derived from ONE codepoint
    * list: the Spark side gets the literal string, the SQL side a chr()
    * chain (Spark's chr wraps at 256, so literals there; DuckDB's chr is
    * by codepoint, so chr() there survives any transport encoding).
    */
  private val scriptInjectCps: Seq[Int] =
    " привет 你好世界 αβ مرحبا カタ 가나 42"
      .codePoints.toArray.toSeq
  private def scriptInjectLit: Column =
    lit(new String(scriptInjectCps.toArray, 0, scriptInjectCps.length))
  private def scriptInjectSqlExpr: String =
    scriptInjectCps.map(c => s"chr($c)").mkString(" || ")

  /** DuckDB replay of [[graft.ops.TextAnalysis.scriptProfile]], generated
    * from the same ScriptClasses table (Java `\\uXXXX` range escapes become
    * RE2 `\\x{XXXX}`). Dominant = first name in alphabetical order hitting
    * the row max (the fold's strict-> keeps the earliest on ties).
    */
  private def scriptProfileSql: String = {
    val classes = graft.ops.TextAnalysis.ScriptClasses
    val names = classes.map(_._1) :+ "other"
    def re2(cls: String): String =
      cls.replaceAll("\\\\u([0-9A-Fa-f]{4})", "\\\\x{$1}")
    val countCols = classes.map { case (name, cls) =>
      s"CAST(len(regexp_extract_all(t, '${re2(cls)}')) AS BIGINT) AS n_$name"
    }
    val known = classes.map { case (n, _) => s"n_$n" }.mkString(" + ")
    val pmCols = names.map(n =>
      s"CAST((n_$n * 1000) // greatest(n_chars, 1) AS INT) AS pm_$n")
    val maxExpr = s"greatest(${names.map(n => s"n_$n").mkString(", ")})"
    val domCases = names.init.map(n => s"WHEN n_$n = __m THEN '$n'").mkString(" ")
    s"""WITH c AS (SELECT doc_id, text || $scriptInjectSqlExpr AS t FROM documents),
       |n AS (SELECT doc_id,
       |  ${countCols.mkString(",\n  ")},
       |  CAST(length(regexp_replace(t, '\\s', '', 'g')) AS BIGINT) AS n_chars FROM c),
       |o AS (SELECT *, n_chars - ($known) AS n_other FROM n),
       |m AS (SELECT *, $maxExpr AS __m FROM o)
       |SELECT doc_id, ${names.map(n => s"n_$n").mkString(", ")}, n_chars,
       |  ${pmCols.mkString(",\n  ")},
       |  CASE WHEN n_chars = 0 THEN 'other' $domCases ELSE 'other' END AS dominant_script
       |FROM m""".stripMargin
  }

  private def minhashSigCtes: String =
    s"""tk AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM documents
       |), gr AS (
       |  SELECT doc_id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
       |    ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END AS grams
       |  FROM tk
       |), hh AS (
       |  SELECT doc_id, list_transform(grams, g -> ('0x' || substr(md5(g), 1, 8))::UBIGINT & 2147483647) AS hs FROM gr
       |), sg AS (
       |  SELECT doc_id, $minhashSigSql AS sig FROM hh
       |)""".stripMargin

  /** est_jaccard + "some full band equal" over sg-aliased a/b — the pair
    * predicate both minhash oracles share.
    */
  private val minhashEstSql = "len(list_filter(range(1, 65), i -> a.sig[i] = b.sig[i])) / 64.0"
  private val minhashBandEqSql =
    """len(list_filter(range(0, 16), bb ->
      |        len(list_filter(range(1, 5), r -> a.sig[bb*4 + r] = b.sig[bb*4 + r])) = 4)) > 0""".stripMargin
  private val minhashPairPredSql =
    s"""$minhashBandEqSql
       |  AND $minhashEstSql >= 0.5""".stripMargin

  /** Exact cosine top-k oracle — shared by ns_embed_topk and by the ANN
    * queries (which run in provably-exhaustive probe mode, so their output
    * must equal exact top-k: brute force, LSH, and IVF are mutually gated).
    */
  private val exactTopKSql =
    """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 50),
      |     c AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id < 1000)
      |SELECT query_id, neighbor_id, rank FROM (
      |  SELECT q.qid AS query_id, c.nid AS neighbor_id,
      |         row_number() OVER (PARTITION BY q.qid
      |           ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.nid) AS rank
      |  FROM q JOIN c ON q.qid != c.nid)
      |WHERE rank <= 5""".stripMargin

  /** Integer-exact replay of MediaPHashExpr (60-bit perceptual hash) for
    * the media gate queries: per-position-class byte sums → strict
    * `60·acc > total` threshold bits. Gate data is ASCII, so
    * `ascii(substr(text, i+1, 1))` equals the payload byte.
    */
  private val phashCteSql =
    """WITH pos AS (
      |  SELECT doc_id, CAST(i % 60 AS INT) AS d,
      |         ascii(substr(text, CAST(i + 1 AS INT), 1))::BIGINT AS v
      |  FROM (SELECT doc_id, text, unnest(range(length(text))) AS i FROM documents)
      |), acc AS (
      |  SELECT doc_id, d, sum(v)::BIGINT AS s FROM pos GROUP BY 1, 2
      |), tot AS (
      |  SELECT doc_id, sum(s)::BIGINT AS t FROM acc GROUP BY 1
      |), bits0 AS (
      |  SELECT a.doc_id,
      |         sum(CASE WHEN 60 * a.s > t.t THEN (1::BIGINT << a.d) ELSE 0 END)::BIGINT AS phash
      |  FROM acc a JOIN tot t USING (doc_id) GROUP BY 1
      |), bits AS (
      |  SELECT d.doc_id, coalesce(b.phash, 0)::BIGINT AS phash
      |  FROM documents d LEFT JOIN bits0 b USING (doc_id)
      |)""".stripMargin

  /** DuckDB-equivalent SQL per query (same tables, same column names). */
  def oracleSql: Map[String, String] = {
    val base = oracleSqlBase
    // the funnel oracle is the disposition oracle wrapped in the audit
    // rollup — derived, so the two can never drift apart
    base + ("ns_pipeline_funnel" ->
      s"""WITH disp AS (
         |${base("ns_pipeline")}
         |)
         |SELECT coalesce(dropped_at, 'kept') AS stage, split, count(*)::BIGINT AS n
         |FROM disp GROUP BY 1, 2""".stripMargin)
  }

  private def oracleSqlBase: Map[String, String] = Map(
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
    "ns_url_templates" ->
      """WITH u AS (
        |  SELECT 'https://' || source || '.example.com/item/' || CAST(doc_id AS VARCHAR) ||
        |    CASE WHEN doc_id % 3 = 0 THEN '/rev/' || md5(text) ELSE '/view' END AS url
        |  FROM documents),
        |p AS (SELECT lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS host,
        |        regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path
        |      FROM u),
        |tt AS (SELECT host, array_to_string(list_transform(string_split(path, '/'), s ->
        |        CASE WHEN regexp_matches(s, '^[0-9]+$') THEN '{n}'
        |             WHEN regexp_matches(s, '^[0-9a-f]{8,}$') THEN '{hex}'
        |             WHEN length(s) >= 16 AND regexp_matches(s, '^[A-Za-z0-9_-]+$') THEN '{id}'
        |             ELSE s END), '/') AS template
        |      FROM p)
        |SELECT host, template, CAST(count(*) AS BIGINT) AS n_urls
        |FROM tt GROUP BY 1, 2""".stripMargin,
    "ns_url_canonical" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 0 THEN 'HTTP://WWW.' ELSE 'https://' END ||
        |    source || '.example.com' ||
        |    CASE doc_id % 4 WHEN 0 THEN ':80' WHEN 1 THEN ':443' WHEN 2 THEN ':8080' ELSE '' END ||
        |    CASE WHEN doc_id % 4 = 3 THEN '' ELSE '/docs/' || CAST(doc_id AS VARCHAR) END ||
        |    '?utm_source=track&z=' || lang || '&a=1' ||
        |    CASE WHEN doc_id % 4 = 1 THEN '&fbclid=f' ELSE '' END || '#frag' AS url
        |  FROM documents),
        |p AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(nf, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
        |    lower(regexp_extract(nf, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS host0,
        |    regexp_extract(nf, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path0,
        |    regexp_extract(nf, '\?([^#]*)', 1) AS q
        |  FROM (SELECT doc_id, regexp_replace(url, '#.*$', '') AS nf FROM u)),
        |n AS (
        |  SELECT doc_id, scheme,
        |    CASE WHEN scheme = 'http' THEN regexp_replace(h1, ':80$', '')
        |         WHEN scheme = 'https' THEN regexp_replace(h1, ':443$', '')
        |         ELSE h1 END AS host,
        |    CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
        |    array_to_string(list_sort(list_filter(string_split(q, '&'),
        |      pp -> pp <> '' AND NOT (
        |        list_contains(['gclid','fbclid','igshid','mc_cid','mc_eid','ref','ref_src','spm','yclid','msclkid'],
        |                      string_split(pp, '=')[1])
        |        OR starts_with(string_split(pp, '=')[1], 'utm_')))), '&') AS q2
        |  FROM (SELECT doc_id, scheme, regexp_replace(host0, '^www\.', '') AS h1, path0, q FROM p))
        |SELECT doc_id,
        |       scheme || '://' || host || path ||
        |       CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END AS canon
        |FROM n""".stripMargin,
    "ns_embed_pca" -> pcaOracleSql,
    "ns_quality_classifier" -> qualityOracleSql,
    "ns_salted_join" ->
      """SELECT e.event_type AS etype, e.event_id, e.user_id, b.etype_users
        |FROM events e
        |JOIN (SELECT event_type, count(DISTINCT user_id) AS etype_users
        |      FROM events GROUP BY 1) b ON e.event_type = b.event_type""".stripMargin,
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
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |       count(*) AS count_order, avg(l_quantity) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_orders" ->
      """SELECT o_orderkey, o_custkey, sum(l_quantity) AS total_qty, count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderkey, o_custkey
        |ORDER BY total_qty DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_nation_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_lines, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "w1_topn_per_user" ->
      """SELECT user_id, event_id,
        |       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |FROM events
        |QUALIFY rn <= 3""".stripMargin,
    "w2_windowed_agg" ->
      """SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
        |       time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS window_end,
        |       event_type, count(*) AS n, CAST(sum(user_id) AS BIGINT) AS total
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    "ns_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS dup_count
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "ns_ngram_jaccard" ->
      """WITH g AS (
        |  SELECT doc_id, list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS grams
        |  FROM documents WHERE doc_id < 100
        |)
        |SELECT a.doc_id AS idA, b.doc_id AS idB,
        |       len(list_intersect(a.grams, b.grams)) AS n_common,
        |       len(list_distinct(list_concat(a.grams, b.grams))) AS n_union
        |FROM g a JOIN g b ON a.doc_id < b.doc_id""".stripMargin,
    "ns_embed_topk" -> exactTopKSql,
    "ns_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS qid, label AS ql, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 50),
        |     c AS (SELECT vec_id AS nid, label AS nl, embedding::DOUBLE[] AS cv
        |           FROM embeddings WHERE vec_id < 1000)
        |SELECT query_id, neighbor_id, neg_label, rank FROM (
        |  SELECT q.qid AS query_id, c.nid AS neighbor_id, c.nl AS neg_label,
        |         row_number() OVER (PARTITION BY q.qid
        |           ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.nid) AS rank
        |  FROM q JOIN c ON q.qid != c.nid AND q.ql IS DISTINCT FROM c.nl)
        |WHERE rank <= 5""".stripMargin,
    "ns_ann_lsh" -> exactTopKSql,
    "ns_ann_ivf" -> exactTopKSql,
    "ns_dedup_embed" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings WHERE vec_id < 1000)
        |SELECT a.vec_id AS idA, b.vec_id AS idB
        |FROM v a JOIN v b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.vec, b.vec) >= 0.48""".stripMargin,
    // SemDeDup gate mode (nCentroids = 1): the operator's within-cell graph
    // is the exact pairwise ≥0.48 cosine graph, so the oracle recomputes
    // that graph and resolves connected components with a recursive
    // transitive closure (same construction as ns_dedup_cluster).
    "ns_semdedup" ->
      """WITH RECURSIVE v AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings WHERE vec_id < 1000
        |), prs AS (
        |  SELECT a.vec_id AS idA, b.vec_id AS idB
        |  FROM v a JOIN v b ON a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.vec, b.vec) >= 0.48
        |), und AS (
        |  SELECT idA AS a, idB AS b FROM prs UNION ALL SELECT idB, idA FROM prs
        |), reach AS (
        |  SELECT a, b FROM und
        |  UNION
        |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
        |)
        |SELECT e.vec_id AS id,
        |       CAST(coalesce(least(e.vec_id, m.minb), e.vec_id) AS BIGINT) AS cluster_id,
        |       coalesce(least(e.vec_id, m.minb), e.vec_id) = e.vec_id AS keep
        |FROM (SELECT vec_id FROM embeddings WHERE vec_id < 1000) e
        |LEFT JOIN (SELECT a, min(b) AS minb FROM reach GROUP BY a) m
        |  ON e.vec_id = m.a""".stripMargin,
    "ns_dedup_minhash" ->
      s"""WITH $minhashSigCtes
         |SELECT a.doc_id AS idA, b.doc_id AS idB,
         |       $minhashEstSql AS est_jaccard
         |FROM sg a JOIN sg b ON a.doc_id < b.doc_id
         |WHERE $minhashPairPredSql""".stripMargin,
    "ns_dedup_cluster" ->
      s"""WITH RECURSIVE $minhashSigCtes, prs AS (
         |  SELECT a.doc_id AS idA, b.doc_id AS idB
         |  FROM sg a JOIN sg b ON a.doc_id < b.doc_id
         |  WHERE $minhashPairPredSql
         |), und AS (
         |  SELECT idA AS a, idB AS b FROM prs UNION ALL SELECT idB, idA FROM prs
         |), reach AS (
         |  SELECT a, b FROM und
         |  UNION
         |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
         |)
         |SELECT d.doc_id,
         |       CAST(coalesce(least(d.doc_id, m.minb), d.doc_id) AS BIGINT) AS cluster_id
         |FROM documents d
         |LEFT JOIN (SELECT a, min(b) AS minb FROM reach GROUP BY a) m ON d.doc_id = m.a""".stripMargin,
    "ns_cluster_stats" ->
      """WITH asg AS (SELECT doc_id AS id, doc_id % 97 AS cluster_id FROM documents),
        |cs AS (SELECT cluster_id, count(*) AS sz FROM asg GROUP BY 1)
        |SELECT CAST(sz AS BIGINT) AS cluster_size,
        |       CAST(count(*) AS BIGINT) AS n_clusters,
        |       CAST(sum(sz) AS BIGINT) AS n_docs,
        |       CAST(sum(sz) - count(*) AS BIGINT) AS dup_mass
        |FROM cs GROUP BY 1""".stripMargin,
    "ns_keep_best" ->
      """WITH cl AS (
        |  SELECT doc_id,
        |         CAST(doc_id % 97 AS BIGINT) AS cluster_id,
        |         CAST(length(text) AS BIGINT) AS quality
        |  FROM documents
        |)
        |SELECT doc_id, cluster_id, quality,
        |       count(*) OVER (PARTITION BY cluster_id) AS n_members,
        |       row_number() OVER (PARTITION BY cluster_id ORDER BY quality DESC, doc_id) = 1 AS keep
        |FROM cl""".stripMargin,
    "ns_dedup_simhash" ->
      """WITH tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |hh AS (SELECT doc_id, list_transform(toks, t -> ('0x' || substr(md5(t), 1, 16))::UBIGINT) AS hs FROM tk),
        |bt AS (
        |  SELECT doc_id, list_transform(range(0, 64), i ->
        |    list_sum(list_transform(hs, h -> CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END)) > 0) AS bits
        |  FROM hh
        |)
        |SELECT a.doc_id AS idA, b.doc_id AS idB,
        |       CAST(len(list_filter(range(1, 65), i -> a.bits[i] != b.bits[i])) AS INT) AS hamming
        |FROM bt a JOIN bt b ON a.doc_id < b.doc_id
        |WHERE len(list_filter(range(1, 65), i -> a.bits[i] != b.bits[i])) <= 10
        |  AND len(list_filter(range(0, 4), c ->
        |        len(list_filter(range(1, 17), r -> a.bits[c*16 + r] != b.bits[c*16 + r])) = 0)) > 0""".stripMargin,
    "ns_incremental_simhash" ->
      """WITH tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |hh AS (SELECT doc_id, list_transform(toks, t -> ('0x' || substr(md5(t), 1, 16))::UBIGINT) AS hs FROM tk),
        |bt AS (
        |  SELECT doc_id, list_transform(range(0, 64), i ->
        |    list_sum(list_transform(hs, h -> CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END)) > 0) AS bits
        |  FROM hh
        |)
        |SELECT b.doc_id AS batch_id, a.doc_id AS corpus_id,
        |       CAST(len(list_filter(range(1, 65), i -> a.bits[i] != b.bits[i])) AS INT) AS hamming
        |FROM bt a JOIN bt b ON a.doc_id < 250 AND b.doc_id >= 250
        |WHERE len(list_filter(range(1, 65), i -> a.bits[i] != b.bits[i])) <= 10
        |  AND len(list_filter(range(0, 4), c ->
        |        len(list_filter(range(1, 17), r -> a.bits[c*16 + r] != b.bits[c*16 + r])) = 0)) > 0""".stripMargin,
    "ns_length_histogram" ->
      """WITH d AS (
        |  SELECT lang, CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n
        |  FROM documents)
        |SELECT lang, CAST(length(bin(n)) - 1 AS INT) AS bucket,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n) AS BIGINT) AS total_tokens,
        |       CAST(min(n) AS BIGINT) AS min_tokens,
        |       CAST(max(n) AS BIGINT) AS max_tokens
        |FROM d GROUP BY 1, 2""".stripMargin,
    "ns_audit_candidates" ->
      s"""WITH $minhashSigCtes, prs AS (
         |  SELECT a.doc_id AS idA, b.doc_id AS idB
         |  FROM sg a JOIN sg b ON a.doc_id < b.doc_id
         |  WHERE $minhashPairPredSql
         |), smp AS (
         |  SELECT idA, idB FROM prs
         |  WHERE (('0x' || substr(md5('graft-audit|' || idA || '|' || idB), 1, 8))::UBIGINT & 2147483647) % 1000 < 500
         |), g AS (
         |  SELECT doc_id, list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS grams
         |  FROM documents
         |), v AS (
         |  SELECT len(list_intersect(a.grams, b.grams)) AS n_common,
         |         len(list_distinct(list_concat(a.grams, b.grams))) AS n_union
         |  FROM smp s JOIN g a ON s.idA = a.doc_id JOIN g b ON s.idB = b.doc_id
         |)
         |SELECT CAST(count(*) AS BIGINT) AS n_sampled,
         |       CAST(sum(CASE WHEN 1000 * n_common >= 500 * n_union THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
         |       CAST((1000 * sum(CASE WHEN 1000 * n_common >= 500 * n_union THEN 1 ELSE 0 END)) // count(*) AS BIGINT) AS precision_permille
         |FROM v""".stripMargin,
    "ns_audit_recall" ->
      s"""WITH $minhashSigCtes, prs AS (
         |  SELECT a.doc_id AS idA, b.doc_id AS idB
         |  FROM sg a JOIN sg b ON a.doc_id < b.doc_id
         |  WHERE $minhashPairPredSql
         |), sd AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id <= 2000
         |    AND (('0x' || substr(md5('graft-recall|' || doc_id), 1, 8))::UBIGINT & 2147483647) % 1000 < 600
         |), stk AS (
         |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM sd
         |), g AS (
         |  SELECT doc_id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         |    ELSE list_distinct(list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))) END AS grams
         |  FROM stk
         |), tr AS (
         |  SELECT a.doc_id AS idA, b.doc_id AS idB
         |  FROM g a JOIN g b ON a.doc_id < b.doc_id
         |  WHERE 1000 * len(list_intersect(a.grams, b.grams))
         |        >= 500 * (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
         |), f AS (
         |  SELECT CASE WHEN p.idA IS NOT NULL THEN 1 ELSE 0 END AS hit
         |  FROM tr LEFT JOIN prs p ON tr.idA = p.idA AND tr.idB = p.idB
         |)
         |SELECT CAST(count(*) AS BIGINT) AS n_truth,
         |       CAST(sum(hit) AS BIGINT) AS n_found,
         |       CAST((1000 * sum(hit)) // greatest(count(*), 1) AS BIGINT) AS recall_permille
         |FROM f""".stripMargin,
    "ns_ranking_eval" ->
      s"""WITH pred AS ($exactTopKSql),
         |t AS (SELECT a.vec_id AS query_id, b.vec_id AS doc_id
         |      FROM embeddings a JOIN embeddings b
         |        ON a.label = b.label AND a.vec_id != b.vec_id
         |      WHERE a.vec_id < 50 AND b.vec_id < 1000),
         |j AS (SELECT t.query_id, t.doc_id, p.rank
         |      FROM t LEFT JOIN pred p
         |        ON t.query_id = p.query_id AND t.doc_id = p.neighbor_id)
         |SELECT query_id, CAST(count(*) AS BIGINT) AS n_relevant,
         |       CAST(sum(CASE WHEN rank <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_k,
         |       CAST((1000 * sum(CASE WHEN rank <= 5 THEN 1 ELSE 0 END)) // count(*) AS BIGINT) AS recall_at_k_permille,
         |       min(rank) AS first_hit_rank,
         |       CAST(coalesce(1000000 // min(rank), 0) AS BIGINT) AS rr_micro
         |FROM j GROUP BY 1""".stripMargin,
    "ns_embed_pool" ->
      """WITH q AS (
        |  SELECT label, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000000) AS BIGINT)) AS qe
        |  FROM embeddings WHERE len(embedding) = 64),
        |e AS (SELECT label, unnest(range(1, 65)) AS i, unnest(qe) AS x FROM q)
        |SELECT label, CAST(i - 1 AS INT) AS dim_idx,
        |       CAST(count(*) AS BIGINT) AS n_chunks,
        |       CAST(CAST(sum(x) AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT) AS mean_micro
        |FROM e GROUP BY 1, 2""".stripMargin,
    "ns_group_affinity" ->
      """WITH q AS (
        |  SELECT label, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000000) AS BIGINT)) AS qe
        |  FROM embeddings WHERE len(embedding) = 64),
        |e AS (SELECT label, unnest(range(1, 65)) AS i, unnest(qe) AS x FROM q),
        |p AS (SELECT label, i, CAST(CAST(sum(x) AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT) AS v
        |      FROM e GROUP BY 1, 2),
        |n AS (SELECT label, CAST(sum(v * v) AS BIGINT) AS nsq FROM p GROUP BY 1),
        |d AS (SELECT a.label AS ga, b.label AS gb, CAST(sum(a.v * b.v) AS BIGINT) AS dot
        |      FROM p a JOIN p b ON a.i = b.i AND a.label < b.label
        |      GROUP BY 1, 2)
        |SELECT d.ga AS group_a, d.gb AS group_b, d.dot AS dot,
        |       CASE WHEN na.nsq > 0 AND nb.nsq > 0
        |            THEN CAST(floor(1000.0 * CAST(d.dot AS DOUBLE) /
        |                 (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE)))) AS BIGINT)
        |            ELSE 0 END AS cos_permille
        |FROM d JOIN n na ON d.ga = na.label JOIN n nb ON d.gb = nb.label""".stripMargin,
    "ns_embed_outliers" ->
      """WITH q AS (
        |  SELECT vec_id, label, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000000) AS BIGINT)) AS qe
        |  FROM embeddings WHERE len(embedding) = 64),
        |e AS (SELECT label, unnest(range(1, 65)) AS i, unnest(qe) AS x FROM q),
        |p AS (SELECT label, i, CAST(CAST(sum(x) AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT) AS v
        |      FROM e GROUP BY 1, 2),
        |c AS (SELECT label, list(v ORDER BY i) AS cv FROM p GROUP BY 1),
        |d AS (SELECT q.vec_id AS id, q.label,
        |             CAST(list_sum(list_transform(range(1, 65),
        |               j -> (qe[CAST(j AS INT)] - cv[CAST(j AS INT)]) *
        |                    (qe[CAST(j AS INT)] - cv[CAST(j AS INT)]))) AS BIGINT) AS d2
        |      FROM q JOIN c ON q.label = c.label)
        |SELECT id, label, d2,
        |       CAST(row_number() OVER (PARTITION BY label ORDER BY d2 DESC, id) AS BIGINT) AS outlier_rank
        |FROM d""".stripMargin,
    "ns_embed_profile" ->
      """WITH q AS (
        |  SELECT list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000000) AS BIGINT)) AS qe
        |  FROM embeddings WHERE len(embedding) = 64),
        |e AS (SELECT unnest(range(1, 65)) AS i, unnest(qe) AS x FROM q)
        |SELECT CAST(i - 1 AS INT) AS dim_idx,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(x) AS BIGINT) AS sum_micro,
        |       CAST(CAST(sum(x) AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT) AS mean_micro,
        |       CAST(sum(x * x) AS BIGINT) AS sum_sq_micro2,
        |       CAST(min(x) AS BIGINT) AS min_micro,
        |       CAST(max(x) AS BIGINT) AS max_micro,
        |       (min(x) = max(x)) AS collapsed
        |FROM e GROUP BY 1""".stripMargin,
    "ns_embed_norms" ->
      """WITH q AS (
        |  SELECT list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000000) AS BIGINT)) AS qe
        |  FROM embeddings WHERE len(embedding) = 64),
        |n2 AS (SELECT CAST(list_sum(list_transform(qe, x -> x * x)) AS BIGINT) AS norm2 FROM q)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CASE WHEN norm2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |       CAST(min(norm2) AS BIGINT) AS min_norm2,
        |       CAST(max(norm2) AS BIGINT) AS max_norm2,
        |       CAST(CAST(sum(norm2) AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT) AS mean_norm2
        |FROM n2""".stripMargin,
    "ns_normalize" ->
      """SELECT doc_id, lower(trim(regexp_replace(regexp_replace(regexp_replace(
        |  chr(9) || text || '  ' || chr(160) || 'MiXeD  CASE' || chr(7) || chr(8232) || ' tail ',
        |  '[\x{0000}-\x{0008}\x{000E}-\x{001F}\x{007F}]', ' ', 'g'),
        |  '[\t\n\x{000B}\f\r\x{0085}\x{00A0}\x{1680}\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]', ' ', 'g'),
        |  ' {2,}', ' ', 'g'))) AS norm
        |FROM documents""".stripMargin,
    "ns_index_stats" ->
      s"""WITH $minhashSigCtes,
         |en AS (SELECT doc_id, bb AS band,
         |         array_to_string(sig[bb * 4 + 1 : bb * 4 + 4], ',') AS bucket
         |       FROM (SELECT doc_id, sig, unnest(range(0, 16)) AS bb FROM sg)),
         |b AS (SELECT band, bucket, count(*) AS sz FROM en GROUP BY 1, 2)
         |SELECT CAST(sz AS BIGINT) AS bucket_size,
         |       CAST(count(*) AS BIGINT) AS n_buckets,
         |       CAST(sum(sz) AS BIGINT) AS n_entries
         |FROM b GROUP BY 1""".stripMargin,
    "ns_incremental_embed" ->
      """WITH q AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000000) AS BIGINT)) AS v
        |           FROM embeddings WHERE len(embedding) = 64),
        |n AS (SELECT vec_id, v, CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS nsq FROM q),
        |s AS (SELECT a.vec_id AS batch_id, b.vec_id AS index_id,
        |        CASE WHEN a.nsq > 0 AND b.nsq > 0 THEN
        |          CAST(floor(1000.0 * CAST(list_sum(list_transform(range(1, 65),
        |                 j -> a.v[CAST(j AS INT)] * b.v[CAST(j AS INT)])) AS DOUBLE) /
        |               (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE)))) AS BIGINT)
        |        ELSE 0 END AS cos_permille
        |      FROM n a CROSS JOIN n b
        |      WHERE a.vec_id >= 100 AND a.vec_id < 1100 AND b.vec_id < 100)
        |SELECT batch_id, index_id, cos_permille FROM s WHERE cos_permille >= 400""".stripMargin,
    "ns_decontaminate_embed" ->
      """WITH cq AS (SELECT vec_id AS cid,
        |              list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000000) AS BIGINT)) AS v
        |            FROM embeddings WHERE len(embedding) = 64),
        |bq AS (SELECT vec_id AS bid,
        |         list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000000) AS BIGINT)) AS v
        |       FROM embeddings WHERE vec_id < 25 AND len(embedding) = 64),
        |cn AS (SELECT cid, v, CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS nsq FROM cq),
        |bn AS (SELECT bid, v, CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS nsq FROM bq),
        |s AS (SELECT cn.cid, bn.bid,
        |        CASE WHEN cn.nsq > 0 AND bn.nsq > 0 THEN
        |          CAST(floor(1000.0 * CAST(list_sum(list_transform(range(1, 65),
        |                 j -> cn.v[CAST(j AS INT)] * bn.v[CAST(j AS INT)])) AS DOUBLE) /
        |               (sqrt(CAST(cn.nsq AS DOUBLE)) * sqrt(CAST(bn.nsq AS DOUBLE)))) AS BIGINT)
        |        ELSE 0 END AS cos
        |      FROM cn CROSS JOIN bn)
        |SELECT cid AS vec_id, bid AS best_benchmark_id, cos AS max_cos_permille,
        |       cos >= 990 AS contaminated
        |FROM (SELECT cid, bid, cos,
        |        row_number() OVER (PARTITION BY cid ORDER BY cos DESC, bid) AS rn FROM s)
        |WHERE rn = 1""".stripMargin,
    "ns_decontaminate_neardup" ->
      s"""WITH $minhashSigCtes, hits AS (
         |  SELECT DISTINCT b.doc_id AS did
         |  FROM sg a JOIN sg b ON a.doc_id < 250 AND b.doc_id >= 250
         |  WHERE $minhashPairPredSql
         |)
         |SELECT d.doc_id, (h.did IS NOT NULL) AS contaminated
         |FROM documents d LEFT JOIN hits h ON d.doc_id = h.did
         |WHERE d.doc_id >= 250""".stripMargin,
    "ns_dataset_card" ->
      s"""WITH qf AS ($qualityFilterSql),
         |d AS (
         |  SELECT doc_id, lang, text,
         |         CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS n
         |  FROM documents),
         |b AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |             CAST(sum(n) AS BIGINT) AS total_tokens,
         |             CAST(sum(length(text)) AS BIGINT) AS n_chars,
         |             CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_docs
         |      FROM d GROUP BY 1),
         |r AS (SELECT lang, n, row_number() OVER (PARTITION BY lang ORDER BY n) AS rn,
         |             count(*) OVER (PARTITION BY lang) AS cnt FROM d),
         |q AS (SELECT lang,
         |        max(CASE WHEN rn = CAST(ceil(0.5 * cnt) AS BIGINT) THEN n END) AS p50_tokens,
         |        max(CASE WHEN rn = CAST(ceil(0.9 * cnt) AS BIGINT) THEN n END) AS p90_tokens
         |      FROM r GROUP BY 1),
         |tk AS (SELECT lang, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
         |       FROM documents),
         |dt AS (SELECT lang, CAST(count(DISTINCT tok) AS BIGINT) AS distinct_tokens
         |       FROM tk GROUP BY 1),
         |kp AS (SELECT d.lang, CAST(sum(CASE WHEN qf.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |       FROM d JOIN qf USING (doc_id) GROUP BY 1)
         |SELECT b.lang, n_docs, total_tokens, distinct_tokens, p50_tokens, p90_tokens,
         |       n_chars, n_distinct_docs,
         |       CAST((1000 * (n_docs - n_distinct_docs)) // n_docs AS BIGINT) AS dup_permille,
         |       n_kept, CAST((1000 * n_kept) // n_docs AS BIGINT) AS keep_permille
         |FROM b JOIN dt USING (lang) JOIN q USING (lang) JOIN kp USING (lang)""".stripMargin,
    "ns_correlation" ->
      """WITH v AS (SELECT CAST(o_orderkey AS HUGEINT) AS a, CAST(o_custkey AS HUGEINT) AS b,
        |                  CAST(round(o_totalprice * 100) AS HUGEINT) AS c FROM orders),
        |s AS (SELECT count(*) AS n, sum(a) AS sa, sum(b) AS sb, sum(c) AS sc,
        |             sum(a*a) AS qa, sum(b*b) AS qb, sum(c*c) AS qc,
        |             sum(a*b) AS xab, sum(a*c) AS xac, sum(b*c) AS xbc FROM v),
        |p AS (
        |  SELECT 'o_orderkey' AS col_x, 'o_custkey' AS col_y, n, sa AS sum_x, sb AS sum_y,
        |         qa AS sum_x2, qb AS sum_y2, xab AS sum_xy FROM s
        |  UNION ALL SELECT 'o_orderkey', 'cents', n, sa, sc, qa, qc, xac FROM s
        |  UNION ALL SELECT 'o_custkey', 'cents', n, sb, sc, qb, qc, xbc FROM s)
        |SELECT col_x, col_y, CAST(n AS BIGINT) AS n,
        |  CAST(sum_x AS VARCHAR) AS sum_x, CAST(sum_y AS VARCHAR) AS sum_y,
        |  CAST(sum_x2 AS VARCHAR) AS sum_x2, CAST(sum_y2 AS VARCHAR) AS sum_y2,
        |  CAST(sum_xy AS VARCHAR) AS sum_xy,
        |  CASE WHEN (n*sum_x2 - sum_x*sum_x) > 0 AND (n*sum_y2 - sum_y*sum_y) > 0 THEN
        |    CAST(round(1000.0 * CAST(n*sum_xy - sum_x*sum_y AS DOUBLE) /
        |      (sqrt(CAST(n*sum_x2 - sum_x*sum_x AS DOUBLE)) *
        |       sqrt(CAST(n*sum_y2 - sum_y*sum_y AS DOUBLE)))) AS BIGINT)
        |  END AS corr_permille
        |FROM p""".stripMargin,
    "ns_robust_outliers" ->
      """WITH e AS (SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
        |        count(*) OVER (PARTITION BY event_type) AS n FROM e),
        |m AS (SELECT event_type, max(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS med FROM r GROUP BY 1),
        |d AS (SELECT e.*, m.med, abs(e.cents - m.med) AS dev FROM e JOIN m USING (event_type)),
        |r2 AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
        |        count(*) OVER (PARTITION BY event_type) AS n FROM d),
        |md AS (SELECT event_type, max(CASE WHEN rn = (n + 1) // 2 THEN dev END) AS mad FROM r2 GROUP BY 1)
        |SELECT d.event_type, d.event_id, d.cents, d.med, md.mad, d.dev
        |FROM d JOIN md USING (event_type)
        |WHERE d.dev * 1000 > 3500 * md.mad""".stripMargin,
    "ns_integrity_audit" ->
      """WITH ck AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n_rows
        |            FROM orders GROUP BY 1),
        |pk AS (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_custkey <= 1000)
        |SELECT CAST(ck.k AS VARCHAR) AS orphan_key, ck.n_rows
        |FROM ck LEFT JOIN pk ON ck.k = pk.k
        |WHERE pk.k IS NULL OR ck.k IS NULL""".stripMargin,
    "ns_kanon_audit" ->
      """SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS class_size
        |FROM customer GROUP BY 1, 2 HAVING count(*) < 10""".stripMargin,
    "ns_kanon_suppress" ->
      """WITH ok AS (SELECT c_nationkey, c_mktsegment FROM customer
        |            GROUP BY 1, 2 HAVING count(*) >= 10)
        |SELECT c.c_custkey, c.c_nationkey, c.c_mktsegment
        |FROM customer c JOIN ok USING (c_nationkey, c_mktsegment)""".stripMargin,
    "ns_changelog_merge" ->
      """WITH snap AS (SELECT doc_id, text, lang FROM documents WHERE doc_id <= 3000),
        |base AS (SELECT doc_id, text, lang FROM documents WHERE doc_id <= 3600),
        |ch AS (
        |  SELECT doc_id, 'upsert' AS op, CAST(1 AS BIGINT) AS version,
        |         'v1:' || text AS text, lang FROM base WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, CASE WHEN doc_id % 8 = 0 THEN 'delete' ELSE 'upsert' END,
        |         2, 'v2:' || text, lang FROM base WHERE doc_id % 4 = 0
        |  UNION ALL
        |  SELECT doc_id, 'upsert', 2, 'v2b:' || text, lang FROM base WHERE doc_id % 16 = 0),
        |w AS (
        |  SELECT doc_id, op, text, lang,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY version DESC, (op = 'upsert') DESC) AS rn
        |  FROM ch),
        |win AS (SELECT doc_id, op, text, lang FROM w WHERE rn = 1)
        |SELECT COALESCE(s.doc_id, win.doc_id) AS doc_id,
        |  CASE WHEN win.doc_id IS NOT NULL THEN win.text ELSE s.text END AS text,
        |  CASE WHEN win.doc_id IS NOT NULL THEN win.lang ELSE s.lang END AS lang
        |FROM snap s FULL OUTER JOIN win ON s.doc_id = win.doc_id
        |WHERE win.doc_id IS NULL OR win.op = 'upsert'""".stripMargin,
    "ns_snapshot_diff" ->
      """WITH old AS (
        |  SELECT doc_id, md5(text) AS old_digest FROM documents WHERE doc_id < 400
        |), nw AS (
        |  SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN md5(text || ' v2') ELSE md5(text) END AS new_digest
        |  FROM documents WHERE doc_id >= 100
        |)
        |SELECT coalesce(old.doc_id, nw.doc_id) AS doc_id,
        |       CASE WHEN old_digest IS NULL THEN 'added'
        |            WHEN new_digest IS NULL THEN 'removed'
        |            WHEN old_digest = new_digest THEN 'unchanged'
        |            ELSE 'changed' END AS status,
        |       old_digest, new_digest
        |FROM old FULL OUTER JOIN nw ON old.doc_id = nw.doc_id""".stripMargin,
    "ns_corpus_overlap" ->
      s"""WITH $minhashSigCtes, ex AS (
         |  SELECT doc_id, CAST(t.i AS INT) AS hash_idx, sig[t.i + 1] AS v
         |  FROM sg CROSS JOIN range(0, 64) AS t(i)
         |), ma AS (
         |  SELECT hash_idx, CAST(min(v) AS BIGINT) AS min_a FROM ex WHERE doc_id < 250 GROUP BY 1
         |), mb AS (
         |  SELECT hash_idx, CAST(min(v) AS BIGINT) AS min_b FROM ex WHERE doc_id >= 250 GROUP BY 1
         |)
         |SELECT ma.hash_idx, ma.min_a, mb.min_b,
         |       CAST(CASE WHEN ma.min_a = mb.min_b THEN 1 ELSE 0 END AS INT) AS is_match
         |FROM ma JOIN mb USING (hash_idx)""".stripMargin,
    "ns_top_fraction" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rk,
        |         count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |WHERE rk * 1000 <= n * 300""".stripMargin,
    "ns_fingerprint" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CASE WHEN length(text) < 8 THEN []
        |         ELSE list_transform(range(1, length(text) - 6), i ->
        |           ('0x' || substr(md5(substr(text, i, 8)), 1, 8))::UBIGINT & 2147483647) END AS hs
        |  FROM documents
        |), f AS (
        |  SELECT doc_id, CASE WHEN len(hs) = 0 THEN []
        |    WHEN len(hs) <= 4 THEN [list_min(hs)]
        |    ELSE list_distinct(list_transform(range(1, len(hs) - 2), i -> list_min(hs[i:i+3]))) END AS fps
        |  FROM h
        |)
        |SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp, CAST(list_min(fps) AS BIGINT) AS fp_min,
        |       CAST(list_max(fps) AS BIGINT) AS fp_max, CAST(list_sum(fps) AS BIGINT) AS fp_sum
        |FROM f""".stripMargin,
    "ns_chunk" ->
      """WITH tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) <= 32 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(range(0, (len(toks) - 32 + 23) // 24 + 1),
        |           i -> array_to_string(toks[i*24 + 1 : least(i*24 + 32, len(toks))], ' ')) END AS chunks
        |  FROM tk)
        |SELECT doc_id, CAST(pos AS INT) AS chunk_idx, chunk,
        |       CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_chunk_tokens
        |FROM (SELECT doc_id, unnest(range(0, len(chunks))) AS pos, unnest(chunks) AS chunk FROM c)""".stripMargin,
    "ns_pack" ->
      """WITH RECURSIVE tk AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) <= 32 THEN [CAST(len(toks) AS BIGINT)]
        |         ELSE list_transform(range(0, (len(toks) - 32 + 23) // 24 + 1),
        |           i -> CAST(least(i*24 + 32, len(toks)) - i*24 AS BIGINT)) END AS lens
        |  FROM tk),
        |u AS (
        |  SELECT doc_id, CAST(pos AS INT) AS chunk_idx, l AS n_tokens
        |  FROM (SELECT doc_id, unnest(range(0, len(lens))) AS pos, unnest(lens) AS l FROM c)),
        |g AS (
        |  SELECT *, row_number() OVER (PARTITION BY pack_group ORDER BY doc_id, chunk_idx) AS rn
        |  FROM (SELECT doc_id, chunk_idx, n_tokens,
        |          CAST(('0x' || substr(md5('graft|' || concat_ws('|', doc_id, chunk_idx)), 1, 8))::UBIGINT
        |               & 2147483647 AS BIGINT) % 8 AS pack_group FROM u)),
        |p AS (
        |  SELECT pack_group, rn, doc_id, chunk_idx, n_tokens,
        |         CAST(0 AS BIGINT) AS bin_idx, CAST(0 AS BIGINT) AS bin_off, n_tokens AS acc
        |  FROM g WHERE rn = 1
        |  UNION ALL
        |  SELECT g.pack_group, g.rn, g.doc_id, g.chunk_idx, g.n_tokens,
        |    CASE WHEN p.acc + g.n_tokens <= 128 THEN p.bin_idx ELSE p.bin_idx + 1 END,
        |    CASE WHEN p.acc + g.n_tokens <= 128 THEN p.acc ELSE CAST(0 AS BIGINT) END,
        |    CASE WHEN p.acc + g.n_tokens <= 128 THEN p.acc + g.n_tokens ELSE g.n_tokens END
        |  FROM g JOIN p ON g.pack_group = p.pack_group AND g.rn = p.rn + 1)
        |SELECT pack_group, doc_id, chunk_idx, n_tokens, bin_idx, bin_off FROM p""".stripMargin,
    "ns_profile_grouped" ->
      """WITH d AS (
        |  SELECT lang, CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n
        |  FROM documents),
        |b AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |             CAST(sum(n) AS BIGINT) AS total_tokens FROM d GROUP BY 1),
        |r AS (SELECT lang, n, row_number() OVER (PARTITION BY lang ORDER BY n) AS rn,
        |             count(*) OVER (PARTITION BY lang) AS cnt FROM d),
        |q AS (SELECT lang,
        |        max(CASE WHEN rn = CAST(ceil(0.5 * cnt) AS BIGINT) THEN n END) AS p50_tokens,
        |        max(CASE WHEN rn = CAST(ceil(0.9 * cnt) AS BIGINT) THEN n END) AS p90_tokens
        |      FROM r GROUP BY 1),
        |tk AS (SELECT lang, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |       FROM documents),
        |dt AS (SELECT lang, CAST(count(DISTINCT tok) AS BIGINT) AS distinct_tokens
        |       FROM tk GROUP BY 1)
        |SELECT b.lang, n_docs, total_tokens, distinct_tokens, p50_tokens, p90_tokens
        |FROM b JOIN dt USING (lang) JOIN q USING (lang)""".stripMargin,
    "ns_profile_drift" ->
      s"""WITH ${profileSideCtes("x", "WHERE doc_id % 2 = 0")},
         |${profileSideCtes("y", "WHERE doc_id % 2 = 1")},
         |j AS (SELECT coalesce(xp.lang, yp.lang) AS lang,
         |        coalesce(xp.n_docs, 0) AS a_n_docs, coalesce(yp.n_docs, 0) AS b_n_docs,
         |        coalesce(xp.total_tokens, 0) AS a_tt, coalesce(yp.total_tokens, 0) AS b_tt,
         |        coalesce(xp.distinct_tokens, 0) AS a_dt, coalesce(yp.distinct_tokens, 0) AS b_dt,
         |        coalesce(xp.p50_tokens, 0) AS a_p50, coalesce(yp.p50_tokens, 0) AS b_p50,
         |        coalesce(xp.p90_tokens, 0) AS a_p90, coalesce(yp.p90_tokens, 0) AS b_p90
         |      FROM xp FULL OUTER JOIN yp ON xp.lang = yp.lang),
         |u AS (
         |  SELECT lang, 'n_docs' AS metric, a_n_docs AS v_a, b_n_docs AS v_b FROM j
         |  UNION ALL SELECT lang, 'total_tokens', a_tt, b_tt FROM j
         |  UNION ALL SELECT lang, 'distinct_tokens', a_dt, b_dt FROM j
         |  UNION ALL SELECT lang, 'p50_tokens', a_p50, b_p50 FROM j
         |  UNION ALL SELECT lang, 'p90_tokens', a_p90, b_p90 FROM j)
         |SELECT lang, metric, v_a, v_b, v_b - v_a AS delta,
         |       ((v_b - v_a) * 1000) // greatest(v_a, 1) AS delta_permille
         |FROM u""".stripMargin,
    "ns_neighbor_jaccard" ->
      """WITH l AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem WHERE l_orderkey <= 2000),
        |e0 AS (SELECT DISTINCT a.pk AS u, b.pk AS v FROM l a JOIN l b ON a.ok = b.ok AND a.pk < b.pk),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
        |        FROM (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0) GROUP BY 1),
        |nb AS (SELECT u AS n, v AS nb FROM e0 UNION ALL SELECT v, u FROM e0),
        |pairs AS (SELECT x.nb AS node_a, y.nb AS node_b, CAST(count(*) AS BIGINT) AS common
        |          FROM nb x JOIN nb y ON x.n = y.n AND x.nb < y.nb
        |          GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT p.node_a, p.node_b, p.common, da.deg AS deg_a, db.deg AS deg_b,
        |       CAST((1000 * p.common) // (da.deg + db.deg - p.common) AS BIGINT)
        |         AS jaccard_permille
        |FROM pairs p
        |JOIN deg da ON p.node_a = da.node
        |JOIN deg db ON p.node_b = db.node""".stripMargin,
    "ns_reciprocity" ->
      """WITH l AS (SELECT l_partkey AS pk, l_suppkey AS sk, l_linenumber AS ln
        |           FROM lineitem WHERE l_orderkey <= 2000),
        |e AS (SELECT DISTINCT CASE WHEN ln % 2 = 0 THEN pk ELSE sk END AS s,
        |             CASE WHEN ln % 2 = 0 THEN sk ELSE pk END AS d
        |      FROM l WHERE pk != sk),
        |r AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
        |rec AS (SELECT CAST(count(*) AS BIGINT) AS n_reciprocated FROM e a
        |        WHERE EXISTS (SELECT 1 FROM e b WHERE b.s = a.d AND b.d = a.s))
        |SELECT n_edges, n_reciprocated,
        |       CAST((n_reciprocated * 1000) // n_edges AS BIGINT) AS reciprocity_permille
        |FROM r, rec""".stripMargin,
    "ns_assortativity" ->
      """WITH l AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem WHERE l_orderkey <= 2000),
        |e0 AS (SELECT DISTINCT a.pk AS pa, b.pk AS pb FROM l a JOIN l b ON a.ok = b.ok AND a.pk < b.pk),
        |und AS (SELECT DISTINCT least(pa, pb) AS u, greatest(pa, pb) AS v FROM e0),
        |deg AS (SELECT node, COUNT(*) AS deg
        |        FROM (SELECT u AS node FROM und UNION ALL SELECT v FROM und) GROUP BY node),
        |bo AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
        |pr AS (SELECT CAST(ds.deg AS HUGEINT) AS x, CAST(dd.deg AS HUGEINT) AS y
        |       FROM bo JOIN deg ds ON bo.u = ds.node JOIN deg dd ON bo.v = dd.node),
        |s AS (SELECT count(*) AS n, sum(x) AS sum_x, sum(y) AS sum_y,
        |             sum(x*x) AS sum_x2, sum(y*y) AS sum_y2, sum(x*y) AS sum_xy FROM pr)
        |SELECT 'deg_src' AS col_x, 'deg_dst' AS col_y, CAST(n AS BIGINT) AS n,
        |  CAST(sum_x AS VARCHAR) AS sum_x, CAST(sum_y AS VARCHAR) AS sum_y,
        |  CAST(sum_x2 AS VARCHAR) AS sum_x2, CAST(sum_y2 AS VARCHAR) AS sum_y2,
        |  CAST(sum_xy AS VARCHAR) AS sum_xy,
        |  CASE WHEN (n*sum_x2 - sum_x*sum_x) > 0 AND (n*sum_y2 - sum_y*sum_y) > 0 THEN
        |    CAST(round(1000.0 * CAST(n*sum_xy - sum_x*sum_y AS DOUBLE) /
        |      (sqrt(CAST(n*sum_x2 - sum_x*sum_x AS DOUBLE)) *
        |       sqrt(CAST(n*sum_y2 - sum_y*sum_y AS DOUBLE)))) AS BIGINT)
        |  END AS corr_permille
        |FROM s""".stripMargin,
    "ns_label_prop" -> {
      // GENERATED 3-round sync-LPA unroll; winner = max (count, label)
      val rounds = (1 to 3).map { i =>
        s"""cnt$i AS MATERIALIZED (
           |  SELECT nb.n, l.label AS nbl, count(*) AS c
           |  FROM nbrs nb JOIN lab${i - 1} l ON nb.nb = l.node GROUP BY 1, 2),
           |win$i AS MATERIALIZED (
           |  SELECT n AS node, nbl AS label FROM (
           |    SELECT n, nbl, row_number() OVER (PARTITION BY n ORDER BY c DESC, nbl DESC) AS rn
           |    FROM cnt$i) WHERE rn = 1),
           |lab$i AS MATERIALIZED (
           |  SELECT l.node, COALESCE(w.label, l.label) AS label
           |  FROM lab${i - 1} l LEFT JOIN win$i w ON l.node = w.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH l AS MATERIALIZED (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem WHERE l_orderkey <= 2000),
         |e0 AS MATERIALIZED (SELECT DISTINCT a.pk AS pa, b.pk AS pb FROM l a JOIN l b ON a.ok = b.ok AND a.pk < b.pk),
         |und AS MATERIALIZED (SELECT DISTINCT least(pa, pb) AS u, greatest(pa, pb) AS v FROM e0),
         |nbrs AS MATERIALIZED (SELECT u AS n, v AS nb FROM und UNION ALL SELECT v, u FROM und),
         |lab0 AS MATERIALIZED (SELECT node, node AS label FROM (
         |  SELECT DISTINCT u AS node FROM und UNION SELECT DISTINCT v FROM und)),
         |$rounds
         |SELECT node, label FROM lab3""".stripMargin
    },
    "ns_kcore" -> {
      // GENERATED 6-round unroll of the peel loop; rounds past the fixed
      // point are identity, so the unroll equals Spark's run-to-convergence
      // MATERIALIZED: each round reads its predecessor several times —
      // unmaterialized CTEs would re-open the parquet per reference and
      // trip the process fd limit on the 6-round unroll
      val rounds = (1 to 6).map { i =>
        s"""d$i AS MATERIALIZED (SELECT node, count(*) AS d FROM (
           |  SELECT u AS node FROM r${i - 1} UNION ALL SELECT v FROM r${i - 1}) GROUP BY node),
           |k$i AS MATERIALIZED (SELECT node FROM d$i WHERE d >= 3),
           |r$i AS MATERIALIZED (SELECT u, v FROM r${i - 1}
           |        WHERE u IN (SELECT node FROM k$i) AND v IN (SELECT node FROM k$i))""".stripMargin
      }.mkString(",\n")
      s"""WITH l AS MATERIALIZED (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem WHERE l_orderkey <= 2000),
         |e0 AS MATERIALIZED (SELECT DISTINCT a.pk AS pa, b.pk AS pb FROM l a JOIN l b ON a.ok = b.ok AND a.pk < b.pk),
         |r0 AS MATERIALIZED (SELECT least(pa, pb) AS u, greatest(pa, pb) AS v FROM e0),
         |$rounds
         |SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
         |  SELECT u AS node FROM r6 UNION ALL SELECT v FROM r6) GROUP BY node""".stripMargin
    },
    "ns_triangles" ->
      """WITH l AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem WHERE l_orderkey <= 2000),
        |e0 AS (SELECT DISTINCT a.pk AS pa, b.pk AS pb FROM l a JOIN l b ON a.ok = b.ok AND a.pk < b.pk),
        |und AS (SELECT DISTINCT least(pa, pb) AS u, greatest(pa, pb) AS v FROM e0),
        |deg AS (SELECT node, COUNT(*) AS deg
        |        FROM (SELECT u AS node FROM und UNION ALL SELECT v FROM und) GROUP BY node),
        |wd AS (SELECT u, v, du.deg AS du, dv.deg AS dv
        |       FROM und JOIN deg du ON und.u = du.node JOIN deg dv ON und.v = dv.node),
        |fwd AS (SELECT CASE WHEN du <= dv THEN u ELSE v END AS s,
        |               CASE WHEN du <= dv THEN v ELSE u END AS t,
        |               CASE WHEN du <= dv THEN dv ELSE du END AS dt FROM wd),
        |wed AS (SELECT e1.s AS ws, e1.t AS wv, e2.t AS ww
        |        FROM fwd e1 JOIN fwd e2 ON e1.s = e2.s
        |        WHERE e1.dt < e2.dt OR (e1.dt = e2.dt AND e1.t < e2.t)),
        |tri AS (SELECT ws, wv, ww FROM wed JOIN fwd ON wed.wv = fwd.s AND wed.ww = fwd.t),
        |pn AS (SELECT node, COUNT(*) AS triangles
        |       FROM (SELECT ws AS node FROM tri UNION ALL SELECT wv FROM tri
        |             UNION ALL SELECT ww FROM tri) GROUP BY node)
        |SELECT deg.node, deg.deg,
        |  COALESCE(pn.triangles, 0) AS triangles,
        |  CASE WHEN deg.deg >= 2 THEN (2000 * COALESCE(pn.triangles, 0)) // (deg.deg * (deg.deg - 1))
        |       ELSE 0 END AS lcc_permille
        |FROM deg LEFT JOIN pn ON deg.node = pn.node""".stripMargin,
    "ns_pagerank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS cn,
        |                  's' || CAST(l_suppkey AS VARCHAR) AS sn
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT cn AS src, sn AS dst FROM pairs
        |      UNION ALL SELECT sn, cn FROM pairs),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
        |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM n),
        |c1 AS (SELECT e.dst AS node, sum(r.pr // d.outdeg) AS s
        |       FROM e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src GROUP BY 1),
        |r1 AS (SELECT n.node, CAST(150000 + (17 * coalesce(c1.s, 0)) // 20 AS BIGINT) AS pr
        |       FROM n LEFT JOIN c1 ON n.node = c1.node),
        |c2 AS (SELECT e.dst AS node, sum(r.pr // d.outdeg) AS s
        |       FROM e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src GROUP BY 1),
        |r2 AS (SELECT n.node, CAST(150000 + (17 * coalesce(c2.s, 0)) // 20 AS BIGINT) AS pr
        |       FROM n LEFT JOIN c2 ON n.node = c2.node),
        |c3 AS (SELECT e.dst AS node, sum(r.pr // d.outdeg) AS s
        |       FROM e JOIN r2 r ON e.src = r.node JOIN deg d ON e.src = d.src GROUP BY 1),
        |r3 AS (SELECT n.node, CAST(150000 + (17 * coalesce(c3.s, 0)) // 20 AS BIGINT) AS pr
        |       FROM n LEFT JOIN c3 ON n.node = c3.node)
        |SELECT node, pr FROM r3""".stripMargin,
    "ns_ppr" ->
      """WITH pairs AS (
        |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS cn,
        |                  's' || CAST(l_suppkey AS VARCHAR) AS sn
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT cn AS src, sn AS dst FROM pairs
        |      UNION ALL SELECT sn, cn FROM pairs),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
        |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |sd AS (SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node
        |       FROM supplier WHERE s_suppkey % 7 = 1),
        |ns AS (SELECT n.node,
        |              CASE WHEN sd.node IS NOT NULL THEN CAST(1 AS BIGINT)
        |                   ELSE CAST(0 AS BIGINT) END AS s
        |       FROM n LEFT JOIN sd ON n.node = sd.node),
        |r0 AS (SELECT node, CAST(s * 1000000 AS BIGINT) AS pr FROM ns),
        |c1 AS (SELECT e.dst AS node, sum(r.pr // d.outdeg) AS sc
        |       FROM e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src GROUP BY 1),
        |r1 AS (SELECT ns.node,
        |              CAST(ns.s * 150000 + (17 * coalesce(c1.sc, 0)) // 20 AS BIGINT) AS pr
        |       FROM ns LEFT JOIN c1 ON ns.node = c1.node),
        |c2 AS (SELECT e.dst AS node, sum(r.pr // d.outdeg) AS sc
        |       FROM e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src GROUP BY 1),
        |r2 AS (SELECT ns.node,
        |              CAST(ns.s * 150000 + (17 * coalesce(c2.sc, 0)) // 20 AS BIGINT) AS pr
        |       FROM ns LEFT JOIN c2 ON ns.node = c2.node)
        |SELECT node, pr FROM r2""".stripMargin,
    "ns_wpagerank" ->
      """WITH pairs AS (
        |  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS cn,
        |         's' || CAST(l_suppkey AS VARCHAR) AS sn,
        |         CAST(count(*) AS BIGINT) AS w
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1, 2),
        |e AS (SELECT cn AS src, sn AS dst, w FROM pairs
        |      UNION ALL SELECT sn, cn, w FROM pairs),
        |sw AS (SELECT src, CAST(sum(w) AS BIGINT) AS sumw FROM e GROUP BY 1),
        |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM n),
        |c1 AS (SELECT e.dst AS node, CAST(sum((r.pr * e.w) // s.sumw) AS BIGINT) AS sc
        |       FROM e JOIN r0 r ON e.src = r.node JOIN sw s ON e.src = s.src GROUP BY 1),
        |r1 AS (SELECT n.node, CAST(150000 + (17 * coalesce(c1.sc, 0)) // 20 AS BIGINT) AS pr
        |       FROM n LEFT JOIN c1 ON n.node = c1.node),
        |c2 AS (SELECT e.dst AS node, CAST(sum((r.pr * e.w) // s.sumw) AS BIGINT) AS sc
        |       FROM e JOIN r1 r ON e.src = r.node JOIN sw s ON e.src = s.src GROUP BY 1),
        |r2 AS (SELECT n.node, CAST(150000 + (17 * coalesce(c2.sc, 0)) // 20 AS BIGINT) AS pr
        |       FROM n LEFT JOIN c2 ON n.node = c2.node)
        |SELECT node, pr FROM r2""".stripMargin,
    "ns_seed_attribution" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS cn,
        |                  's' || CAST(l_suppkey AS VARCHAR) AS sn
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderkey % 8 = 1),
        |e AS (SELECT cn AS src, sn AS dst FROM pairs
        |      UNION ALL SELECT sn, cn FROM pairs),
        |sd AS (SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node
        |       FROM supplier WHERE s_suppkey % 7 = 1),
        |bfs(node, seed, hops) AS (
        |  SELECT node, node, CAST(0 AS BIGINT) AS hops FROM sd
        |  UNION
        |  SELECT e.dst, b.seed, b.hops + 1 FROM bfs b JOIN e ON e.src = b.node
        |  WHERE b.hops < 3),
        |m AS (SELECT node, min(hops) AS hops FROM bfs GROUP BY 1)
        |SELECT m.node, m.hops, min(b.seed) AS seed
        |FROM m JOIN bfs b ON b.node = m.node AND b.hops = m.hops
        |GROUP BY 1, 2""".stripMargin,
    "ns_seed_distance" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS cn,
        |                  's' || CAST(l_suppkey AS VARCHAR) AS sn
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderkey % 4 = 1),
        |e AS (SELECT cn AS src, sn AS dst FROM pairs
        |      UNION ALL SELECT sn, cn FROM pairs),
        |sd AS (SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node
        |       FROM supplier WHERE s_suppkey % 7 = 1),
        |bfs(node, hops) AS (
        |  SELECT node, CAST(0 AS BIGINT) AS hops FROM sd
        |  UNION
        |  SELECT e.dst, b.hops + 1 FROM bfs b JOIN e ON e.src = b.node
        |  WHERE b.hops < 3)
        |SELECT node, min(hops) AS hops FROM bfs GROUP BY node""".stripMargin,
    "ns_hits" ->
      """WITH e AS (
        |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
        |                  's' || CAST(l_suppkey AS VARCHAR) AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS h FROM n),
        |ar1 AS (SELECT e.dst AS node, CAST(sum(h.h) AS BIGINT) AS ar
        |        FROM e JOIN h0 h ON e.src = h.node GROUP BY 1),
        |am1 AS (SELECT greatest(CAST(coalesce(max(ar), 1) AS BIGINT), 1) AS m FROM ar1),
        |a1 AS (SELECT n.node, CAST((coalesce(ar.ar, 0) * 1000000) // (SELECT m FROM am1) AS BIGINT) AS a
        |       FROM n LEFT JOIN ar1 ar ON n.node = ar.node),
        |hr1 AS (SELECT e.src AS node, CAST(sum(a.a) AS BIGINT) AS hr
        |        FROM e JOIN a1 a ON e.dst = a.node GROUP BY 1),
        |hm1 AS (SELECT greatest(CAST(coalesce(max(hr), 1) AS BIGINT), 1) AS m FROM hr1),
        |h1 AS (SELECT n.node, CAST((coalesce(hr.hr, 0) * 1000000) // (SELECT m FROM hm1) AS BIGINT) AS h
        |       FROM n LEFT JOIN hr1 hr ON n.node = hr.node),
        |ar2 AS (SELECT e.dst AS node, CAST(sum(h.h) AS BIGINT) AS ar
        |        FROM e JOIN h1 h ON e.src = h.node GROUP BY 1),
        |am2 AS (SELECT greatest(CAST(coalesce(max(ar), 1) AS BIGINT), 1) AS m FROM ar2),
        |a2 AS (SELECT n.node, CAST((coalesce(ar.ar, 0) * 1000000) // (SELECT m FROM am2) AS BIGINT) AS a
        |       FROM n LEFT JOIN ar2 ar ON n.node = ar.node),
        |hr2 AS (SELECT e.src AS node, CAST(sum(a.a) AS BIGINT) AS hr
        |        FROM e JOIN a2 a ON e.dst = a.node GROUP BY 1),
        |hm2 AS (SELECT greatest(CAST(coalesce(max(hr), 1) AS BIGINT), 1) AS m FROM hr2),
        |h2 AS (SELECT n.node, CAST((coalesce(hr.hr, 0) * 1000000) // (SELECT m FROM hm2) AS BIGINT) AS h
        |       FROM n LEFT JOIN hr2 hr ON n.node = hr.node)
        |SELECT h2.node, h2.h AS hub, a2.a AS auth
        |FROM h2 JOIN a2 USING (node)""".stripMargin,
    "ns_pagerank_dangling" ->
      """WITH e AS (
        |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
        |                  's' || CAST(l_suppkey AS VARCHAR) AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
        |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM n),
        |dang AS (SELECT node FROM n WHERE node NOT IN (SELECT src FROM deg)),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM n),
        |s1 AS (SELECT CAST(coalesce(sum(r.pr), 0) AS BIGINT) // (SELECT c FROM nn) AS sh
        |       FROM r0 r JOIN dang USING (node)),
        |c1 AS (SELECT e.dst AS node, sum(r.pr // d.outdeg) AS s
        |       FROM e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src GROUP BY 1),
        |r1 AS (SELECT n.node, CAST(150000 + (17 * (coalesce(c1.s, 0) + (SELECT sh FROM s1))) // 20 AS BIGINT) AS pr
        |       FROM n LEFT JOIN c1 ON n.node = c1.node),
        |s2 AS (SELECT CAST(coalesce(sum(r.pr), 0) AS BIGINT) // (SELECT c FROM nn) AS sh
        |       FROM r1 r JOIN dang USING (node)),
        |c2 AS (SELECT e.dst AS node, sum(r.pr // d.outdeg) AS s
        |       FROM e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src GROUP BY 1),
        |r2 AS (SELECT n.node, CAST(150000 + (17 * (coalesce(c2.s, 0) + (SELECT sh FROM s2))) // 20 AS BIGINT) AS pr
        |       FROM n LEFT JOIN c2 ON n.node = c2.node),
        |s3 AS (SELECT CAST(coalesce(sum(r.pr), 0) AS BIGINT) // (SELECT c FROM nn) AS sh
        |       FROM r2 r JOIN dang USING (node)),
        |c3 AS (SELECT e.dst AS node, sum(r.pr // d.outdeg) AS s
        |       FROM e JOIN r2 r ON e.src = r.node JOIN deg d ON e.src = d.src GROUP BY 1),
        |r3 AS (SELECT n.node, CAST(150000 + (17 * (coalesce(c3.s, 0) + (SELECT sh FROM s3))) // 20 AS BIGINT) AS pr
        |       FROM n LEFT JOIN c3 ON n.node = c3.node)
        |SELECT node, pr FROM r3""".stripMargin,
    "ns_asof_join" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |                  event_id, event_type FROM events),
        |c AS (SELECT user_id, ts_us, event_id AS click_id FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts_us, min(event_id) AS purchase_id
        |      FROM e WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.user_id, c.ts_us, c.click_id,
        |       p.ts_us AS r_ts_us, p.purchase_id AS r_purchase_id
        |FROM c ASOF JOIN p ON c.user_id = p.user_id AND c.ts_us >= p.ts_us""".stripMargin,
    "ns_zorder" -> {
      val terms = (0 until 8).map(i =>
        s"(((pk >> $i) & 1) << ${2 * i}) + (((sk >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH b AS (SELECT l_orderkey, l_linenumber,
         |             CAST(l_partkey % 256 AS BIGINT) AS pk,
         |             CAST(l_suppkey % 256 AS BIGINT) AS sk
         |           FROM lineitem)
         |SELECT l_orderkey, l_linenumber, CAST($terms AS BIGINT) AS zval
         |FROM b""".stripMargin
    },
    "ns_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |           FROM events),
        |f AS (SELECT user_id, min(ts_us) AS ft FROM e GROUP BY 1)
        |SELECT CAST(ft // 86400000000 AS BIGINT) AS cohort,
        |       CAST((ts_us - ft) // 86400000000 AS BIGINT) AS period_idx,
        |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
        |FROM e JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "ns_funnel" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |                  event_type FROM events),
        |s1 AS (SELECT user_id,
        |         min(CASE WHEN event_type = 'signup' THEN ts_us END) AS t1
        |       FROM e GROUP BY 1),
        |s2 AS (SELECT e.user_id,
        |         min(CASE WHEN event_type = 'click' AND t1 IS NOT NULL
        |                       AND ts_us > t1 THEN ts_us END) AS t2
        |       FROM e JOIN s1 USING (user_id) GROUP BY 1),
        |s3 AS (SELECT e.user_id,
        |         min(CASE WHEN event_type = 'purchase' AND t2 IS NOT NULL
        |                       AND ts_us > t2 THEN ts_us END) AS t3
        |       FROM e JOIN s2 USING (user_id) GROUP BY 1)
        |SELECT s1.user_id, t1, t2, t3,
        |       CAST(CASE WHEN t3 IS NOT NULL THEN 3
        |                 WHEN t2 IS NOT NULL THEN 2
        |                 WHEN t1 IS NOT NULL THEN 1
        |                 ELSE 0 END AS BIGINT) AS depth
        |FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)""".stripMargin,
    "ns_rolling" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |                  event_id, CAST(round(value * 100) AS BIGINT) AS cents
        |           FROM events)
        |SELECT user_id, ts_us, event_id, cents,
        |       CAST(sum(cents) OVER w AS BIGINT) AS cents_wsum,
        |       CAST(count(*) OVER w AS BIGINT) AS w_n
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |                    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "ns_gaps" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |g AS (SELECT user_id,
        |             lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS gap_start,
        |             ts_us AS gap_end
        |      FROM e)
        |SELECT user_id, gap_start, gap_end, gap_end - gap_start AS gap
        |FROM g WHERE gap_end - gap_start > 21600000000""".stripMargin,
    "ns_ldiversity" ->
      """WITH c AS (SELECT o_custkey, o_orderstatus, count(*) AS n
        |           FROM orders GROUP BY 1, 2)
        |SELECT o_custkey, CAST(sum(n) AS BIGINT) AS class_size,
        |       CAST(count(*) AS BIGINT) AS sensitive_diversity
        |FROM c GROUP BY 1 HAVING count(*) < 3""".stripMargin,
    "ns_tcloseness" ->
      """WITH vc AS (SELECT o_orderpriority AS qp, o_orderstatus AS v, count(*) AS nvc
        |            FROM orders GROUP BY 1, 2),
        |c AS (SELECT qp, sum(nvc) AS nc FROM vc GROUP BY 1),
        |g AS (SELECT v, sum(nvc) AS nv FROM vc GROUP BY 1),
        |t AS (SELECT sum(nvc) AS n FROM vc),
        |p AS (SELECT c.qp, c.nc, g.v, g.nv FROM c CROSS JOIN g),
        |j AS (SELECT p.qp, p.nc, p.nv, coalesce(vc.nvc, 0) AS nvc
        |      FROM p LEFT JOIN vc ON p.qp = vc.qp AND p.v = vc.v)
        |SELECT qp AS o_orderpriority, CAST(max(nc) AS BIGINT) AS class_size,
        |       CAST((500 * sum(abs(nvc * (SELECT n FROM t) - nv * nc))) //
        |            (max(nc) * (SELECT n FROM t)) AS BIGINT) AS dist_permille
        |FROM j GROUP BY 1 HAVING CAST((500 * sum(abs(nvc * (SELECT n FROM t) - nv * nc))) //
        |            (max(nc) * (SELECT n FROM t)) AS BIGINT) > 5""".stripMargin,
    "ns_crosstab" ->
      """WITH c AS (SELECT lang, source, CAST(count(*) AS HUGEINT) AS n
        |           FROM documents GROUP BY 1, 2),
        |t AS (SELECT sum(n) AS total FROM c)
        |SELECT lang, source, CAST(n AS BIGINT) AS n,
        |  CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS n_a,
        |  CAST(sum(n) OVER (PARTITION BY source) AS BIGINT) AS n_b,
        |  CAST((1000000::HUGEINT * n * (SELECT total FROM t)) //
        |       (sum(n) OVER (PARTITION BY lang) * sum(n) OVER (PARTITION BY source)) AS BIGINT) AS lift_micro
        |FROM c""".stripMargin,
    "ns_fd" ->
      """SELECT 'o_orderkey' AS lhs, 'o_custkey' AS rhs,
        |       CAST(count(*) AS BIGINT) AS n_groups,
        |       CAST(sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_groups,
        |       sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) = 0 AS holds
        |FROM (SELECT l, count(*) AS nr FROM
        |      (SELECT DISTINCT o_orderkey AS l, o_custkey AS r FROM orders) GROUP BY 1)
        |UNION ALL
        |SELECT 'o_orderkey', 'o_orderpriority', CAST(count(*) AS BIGINT),
        |       CAST(sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |       sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) = 0
        |FROM (SELECT l, count(*) AS nr FROM
        |      (SELECT DISTINCT o_orderkey AS l, o_orderpriority AS r FROM orders) GROUP BY 1)
        |UNION ALL
        |SELECT 'o_custkey', 'o_orderkey', CAST(count(*) AS BIGINT),
        |       CAST(sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |       sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) = 0
        |FROM (SELECT l, count(*) AS nr FROM
        |      (SELECT DISTINCT o_custkey AS l, o_orderkey AS r FROM orders) GROUP BY 1)
        |UNION ALL
        |SELECT 'o_custkey', 'o_orderpriority', CAST(count(*) AS BIGINT),
        |       CAST(sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |       sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) = 0
        |FROM (SELECT l, count(*) AS nr FROM
        |      (SELECT DISTINCT o_custkey AS l, o_orderpriority AS r FROM orders) GROUP BY 1)
        |UNION ALL
        |SELECT 'o_orderpriority', 'o_orderkey', CAST(count(*) AS BIGINT),
        |       CAST(sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |       sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) = 0
        |FROM (SELECT l, count(*) AS nr FROM
        |      (SELECT DISTINCT o_orderpriority AS l, o_orderkey AS r FROM orders) GROUP BY 1)
        |UNION ALL
        |SELECT 'o_orderpriority', 'o_custkey', CAST(count(*) AS BIGINT),
        |       CAST(sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |       sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) = 0
        |FROM (SELECT l, count(*) AS nr FROM
        |      (SELECT DISTINCT o_orderpriority AS l, o_custkey AS r FROM orders) GROUP BY 1)""".stripMargin,
    "ns_file_stats" ->
      """SELECT 'lineitem.parquet' AS file, CAST(count(*) AS BIGINT) AS n_rows,
        |       min(l_orderkey) AS l_orderkey_min, max(l_orderkey) AS l_orderkey_max,
        |       CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS l_orderkey_nulls,
        |       min(l_returnflag) AS l_returnflag_min,
        |       max(l_returnflag) AS l_returnflag_max,
        |       CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS l_returnflag_nulls
        |FROM lineitem""".stripMargin,
    "ns_anomalies" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id,
        |                  CAST(round(value * 100) AS BIGINT) AS cents
        |           FROM events),
        |st AS (SELECT user_id, ts_us, event_id, cents,
        |              CAST(count(*) OVER w AS BIGINT) AS n_ref,
        |              CAST(coalesce(sum(cents) OVER w, 0) AS BIGINT) AS s,
        |              CAST(coalesce(sum(cents * cents) OVER w, 0) AS BIGINT) AS q
        |       FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |                           RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING))
        |SELECT user_id, ts_us, event_id, cents, n_ref,
        |       (n_ref >= 5 AND
        |        CAST(cents * n_ref - s AS HUGEINT) * CAST(cents * n_ref - s AS HUGEINT)
        |          * 1000000
        |          > 6250000 * CAST(n_ref * q - s * s AS HUGEINT)) AS is_anomaly
        |FROM st""".stripMargin,
    "ns_trending" ->
      """WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type FROM events),
        |c AS (SELECT (ts_us // 21600000000) * 21600000000 AS window_start,
        |             event_type AS item, CAST(count(*) AS BIGINT) AS cnt
        |      FROM e GROUP BY 1, 2),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY window_start
        |        ORDER BY cnt DESC, item) AS BIGINT) AS rank FROM c)
        |SELECT window_start, item, cnt, rank FROM r WHERE rank <= 3""".stripMargin,
    "ns_seasonality" ->
      """WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, user_id FROM events)
        |SELECT CAST(((ts_us // 86400000000) + 3) % 7 AS BIGINT) AS dow,
        |       CAST((ts_us // 3600000000) % 24 AS BIGINT) AS hour,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_actors
        |FROM e GROUP BY 1, 2""".stripMargin,
    "ns_active_users" ->
      """WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, user_id FROM events)
        |SELECT CAST((ts_us // 21600000000) * 21600000000 AS BIGINT) AS window_start,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_actors
        |FROM e GROUP BY 1""".stripMargin,
    "ns_transitions" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |                  event_id, event_type FROM events),
        |p AS (SELECT event_type AS from_type,
        |        lead(event_type) OVER (PARTITION BY user_id
        |          ORDER BY ts_us, event_id, event_type) AS to_type
        |      FROM e),
        |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |      FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |       CAST((n * 1000) // sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS permille_of_from
        |FROM c""".stripMargin,
    "ns_journey_match" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |                  event_id, event_type FROM events WHERE user_id <= 300)
        |SELECT user_id,
        |  string_agg(event_type, '>' ORDER BY ts_us, event_id, event_type) AS journey,
        |  regexp_matches(string_agg(event_type, '>' ORDER BY ts_us, event_id, event_type),
        |                 '.*click>purchase.*') AS is_match
        |FROM e GROUP BY 1""".stripMargin,
    "ns_resample" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |                  CAST(round(value * 100) AS BIGINT) AS cents
        |           FROM events WHERE user_id <= 200),
        |b0 AS (SELECT user_id, (ts_us // 21600000000) * 21600000000 AS tick, ts_us, cents FROM e),
        |bw AS (SELECT user_id, tick, cents,
        |         row_number() OVER (PARTITION BY user_id, tick ORDER BY ts_us DESC, cents DESC) AS rn,
        |         count(*) OVER (PARTITION BY user_id, tick) AS n_obs
        |       FROM b0),
        |b AS (SELECT user_id, tick, cents AS bv, CAST(n_obs AS BIGINT) AS n_obs FROM bw WHERE rn = 1),
        |sp AS (SELECT user_id, min(tick) AS lo, max(tick) AS hi FROM b GROUP BY 1),
        |g AS (SELECT user_id, unnest(range(lo, hi + 1, 21600000000)) AS tick FROM sp),
        |j AS (SELECT g.user_id, g.tick, b.bv, COALESCE(b.n_obs, 0) AS n_obs
        |      FROM g LEFT JOIN b ON g.user_id = b.user_id AND g.tick = b.tick)
        |SELECT user_id, tick,
        |  last_value(bv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY tick
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents,
        |  n_obs
        |FROM j""".stripMargin,
    "ns_interval_join" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |                  event_id, event_type FROM events),
        |p AS (SELECT user_id, ts_us AS ps, ts_us + 3600000000 AS pe,
        |             event_id AS purchase_id FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts_us AS cs, ts_us + 1800000000 AS ce,
        |             event_id AS click_id FROM e WHERE event_type = 'click')
        |SELECT p.user_id, ps, pe, purchase_id,
        |       cs AS r_cs, ce AS r_ce, click_id AS r_click_id
        |FROM p JOIN c ON p.user_id = c.user_id AND ps <= ce AND cs <= pe""".stripMargin,
    "ns_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |                  event_id FROM events),
        |b AS (SELECT user_id, ts_us, event_id,
        |        CASE WHEN lag(ts_us) OVER w IS NULL
        |                  OR ts_us - lag(ts_us) OVER w > 3600000000
        |             THEN 1 ELSE 0 END AS nb
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us))
        |SELECT user_id, ts_us, event_id,
        |       CAST(sum(nb) OVER (PARTITION BY user_id ORDER BY ts_us
        |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |FROM b""".stripMargin,
    "ns_session_stats" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |b AS (SELECT user_id, ts_us,
        |        CASE WHEN lag(ts_us) OVER w IS NULL
        |                  OR ts_us - lag(ts_us) OVER w > 3600000000
        |             THEN 1 ELSE 0 END AS nb
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
        |l AS (SELECT user_id, ts_us,
        |        CAST(sum(nb) OVER (PARTITION BY user_id ORDER BY ts_us
        |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |      FROM b)
        |SELECT user_id, session_seq, min(ts_us) AS session_start,
        |       max(ts_us) AS session_end, CAST(count(*) AS BIGINT) AS n_events
        |FROM l GROUP BY 1, 2""".stripMargin,
    "ns_trim_tokens" ->
      """WITH tk AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents)
        |SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
        |       CAST(least(len(t), 50) AS BIGINT) AS n_kept,
        |       len(t) > 50 AS truncated,
        |       array_to_string(t[1:50], ' ') AS text_trim
        |FROM tk""".stripMargin,
    "ns_range_join" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |                  event_id, event_type FROM events),
        |c AS (SELECT user_id, ts_us, event_id AS click_id FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts_us AS w_start, ts_us + 3600000000 AS w_end,
        |             event_id AS purchase_id FROM e WHERE event_type = 'purchase')
        |SELECT c.user_id, c.ts_us, c.click_id, w_start AS i_w_start,
        |       w_end AS i_w_end, purchase_id AS i_purchase_id
        |FROM c JOIN p ON c.user_id = p.user_id
        |             AND c.ts_us BETWEEN w_start AND w_end""".stripMargin,
    "ns_heavy_hitters" ->
      """WITH tk AS (
        |  SELECT lang, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |  FROM documents),
        |c AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt FROM tk GROUP BY 1, 2),
        |rk AS (SELECT lang, tok, cnt,
        |         CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tok) AS BIGINT) AS rank
        |       FROM c)
        |SELECT lang, tok, cnt, rank FROM rk WHERE rank <= 5""".stripMargin,
    "ns_analyze_table" -> {
      // GENERATED per orders column from the same type mapping the
      // operator applies (see Profile.analyzeColumns scaladoc) — the two
      // sides cannot drift independently of this list.
      def rows(c: String, kind: String): Seq[String] = {
        val base = Seq(
          s"SELECT '$c' AS col_name, 'n_null' AS metric, CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value FROM orders",
          s"SELECT '$c', 'n_distinct', CAST(COUNT(DISTINCT $c) AS BIGINT) FROM orders")
        val rng = kind match {
          case "long" => Seq(
            s"SELECT '$c', 'min_v', CAST(MIN($c) AS BIGINT) FROM orders",
            s"SELECT '$c', 'max_v', CAST(MAX($c) AS BIGINT) FROM orders")
          case "str" => Seq(
            s"SELECT '$c', 'min_v', CAST(MIN(length($c)) AS BIGINT) FROM orders",
            s"SELECT '$c', 'max_v', CAST(MAX(length($c)) AS BIGINT) FROM orders",
            s"SELECT '$c', 'len_total', CAST(SUM(length($c)) AS BIGINT) FROM orders")
          case "dbl" => Seq(
            s"SELECT '$c', 'min_v', CAST(FLOOR(MIN($c) * 1e6) AS BIGINT) FROM orders",
            s"SELECT '$c', 'max_v', CAST(FLOOR(MAX($c) * 1e6) AS BIGINT) FROM orders")
          case "ts" => Seq(
            s"SELECT '$c', 'min_v', epoch_us(MIN($c)) FROM orders",
            s"SELECT '$c', 'max_v', epoch_us(MAX($c)) FROM orders")
        }
        base ++ rng
      }
      (rows("o_orderkey", "long") ++ rows("o_custkey", "long") ++
        rows("o_orderstatus", "str") ++ rows("o_totalprice", "dbl") ++
        rows("o_orderdate", "ts") ++ rows("o_orderpriority", "str"))
        .mkString("\nUNION ALL ")
    },
    "ns_vocab" ->
      """WITH toks AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token FROM documents),
        |c AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1 HAVING count(*) >= 2),
        |k AS (SELECT token, cnt FROM c ORDER BY cnt DESC, token LIMIT 100)
        |SELECT token, cnt, CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rank
        |FROM k""".stripMargin,
    "ns_collocations" ->
      """WITH toks AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS tk FROM documents),
        |tot AS (SELECT CAST(sum(len(tk)) AS HUGEINT) AS u,
        |               CAST(sum(greatest(len(tk) - 1, 0)) AS HUGEINT) AS b FROM toks),
        |uni AS (SELECT unnest(tk) AS tok FROM toks),
        |cx AS (SELECT tok, count(*) AS c FROM uni GROUP BY 1),
        |prs AS (SELECT tk[CAST(i AS INT)] AS tok_a, tk[CAST(i + 1 AS INT)] AS tok_b
        |        FROM (SELECT tk, unnest(range(1, len(tk))) AS i FROM toks WHERE len(tk) >= 2)),
        |pc AS (SELECT tok_a, tok_b, count(*) AS pair_cnt FROM prs GROUP BY 1, 2 HAVING count(*) >= 5),
        |sc AS (SELECT pc.tok_a, pc.tok_b, pc.pair_cnt, ca.c AS cnt_a, cb.c AS cnt_b,
        |       CAST((1000000::HUGEINT * pc.pair_cnt * u * u) // (b * ca.c * cb.c) AS BIGINT) AS lift_micro
        |       FROM pc JOIN cx ca ON pc.tok_a = ca.tok JOIN cx cb ON pc.tok_b = cb.tok, tot),
        |k AS (SELECT * FROM sc ORDER BY lift_micro DESC, tok_a, tok_b LIMIT 50)
        |SELECT tok_a, tok_b, CAST(pair_cnt AS BIGINT) AS pair_cnt,
        |       CAST(cnt_a AS BIGINT) AS cnt_a, CAST(cnt_b AS BIGINT) AS cnt_b, lift_micro,
        |       CAST(row_number() OVER (ORDER BY lift_micro DESC, tok_a, tok_b) AS BIGINT) AS rank
        |FROM k""".stripMargin,
    "ns_split" ->
      """SELECT doc_id,
        |  CASE WHEN hv < 800 THEN 'train' WHEN hv < 900 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        (('0x' || substr(md5('graft-split|' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
        |         & 2147483647) % 1000 AS hv
        |      FROM documents)""".stripMargin,
    "ns_epoch_shuffle" ->
      """SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY hv, doc_id) - 1 AS BIGINT) AS shuffle_pos
        |FROM (SELECT doc_id,
        |        (('0x' || substr(md5('graft-shuffle-e1|' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
        |         & 2147483647) AS hv
        |      FROM documents)""".stripMargin,
    "ns_embed_int8" ->
      """SELECT id, vmin, vmax, CAST(i AS INT) AS pos,
        |  CASE WHEN vmax = vmin THEN 0
        |    ELSE CAST(least(greatest(round((vec[CAST(i + 1 AS INT)] - vmin) * 255.0 / (vmax - vmin)), 0), 255) AS INT) END AS code
        |FROM (SELECT vec_id AS id, embedding::DOUBLE[] AS vec,
        |        list_min(embedding::DOUBLE[]) AS vmin,
        |        list_max(embedding::DOUBLE[]) AS vmax,
        |        unnest(range(len(embedding))) AS i
        |      FROM embeddings)""".stripMargin,
    "ns_media_frames" ->
      """SELECT doc_id AS media_id, CAST(f AS INT) AS frame,
        |  CAST(('0x' || substr(md5(substr(text, CAST(f * 64 + 1 AS INT), 16)), 1, 8))::UBIGINT
        |       & 2147483647 AS BIGINT) AS fp
        |FROM (SELECT doc_id, text, unnest(range(8)) AS f FROM documents)
        |WHERE f * 64 + 16 <= length(text)""".stripMargin,
    "ns_media_keyframes" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |      repeat(substr(rpad(text, 192, 'x'), 1, 64), 3) ||
        |      repeat(substr(rpad(text, 192, 'x'), 65, 64), 2) AS p
        |    FROM documents),
        |fr AS (SELECT media_id, f AS frame,
        |      CAST(('0x' || substr(md5(substr(p, CAST(f * 64 + 1 AS INT), 16)), 1, 8))::UBIGINT
        |           & 2147483647 AS BIGINT) AS fp
        |    FROM (SELECT media_id, p, unnest(range(8)) AS f FROM m)
        |    WHERE f * 64 + 16 <= length(p)),
        |k AS (SELECT media_id, frame, fp,
        |        lag(fp) OVER (PARTITION BY media_id ORDER BY frame) AS prev FROM fr)
        |SELECT media_id, CAST(frame AS INT) AS keyframe, fp
        |FROM k WHERE prev IS NULL OR prev != fp""".stripMargin,
    "ns_media_frame_neardup" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, substr(text, 1, greatest(length(text) - 5, 0)) FROM documents
        |), fr AS (
        |  SELECT media_id, f AS frame,
        |    ('0x' || substr(md5(substr(text, CAST(f * 64 + 1 AS INT), 16)), 1, 8))::UBIGINT
        |      & 2147483647 AS fp
        |  FROM (SELECT media_id, text, unnest(range(8)) AS f FROM m)
        |  WHERE f * 64 + 16 <= length(text)
        |)
        |SELECT a.media_id AS idA, b.media_id AS idB, count(*)::BIGINT AS n_shared
        |FROM fr a JOIN fr b ON a.frame = b.frame AND a.fp = b.fp AND a.media_id < b.media_id
        |GROUP BY 1, 2 HAVING count(*) >= 4""".stripMargin,
    "ns_ngram_vocab" ->
      """WITH tk AS (
        |  SELECT string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |g AS (
        |  SELECT unnest(CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
        |    ELSE list_transform(range(1, len(toks)), i -> array_to_string(toks[i:i+1], ' ')) END) AS token
        |  FROM tk),
        |c AS (SELECT token, count(*) AS cnt FROM g GROUP BY 1 HAVING count(*) >= 2),
        |k AS (SELECT token, cnt FROM c ORDER BY cnt DESC, token LIMIT 100)
        |SELECT token, cnt, CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rank
        |FROM k""".stripMargin,
    "ns_domains" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://' || CASE WHEN doc_id % 7 = 0 THEN 'www.' ELSE '' END ||
        |    source || '.example.' || lang || '/doc/' || doc_id ||
        |    CASE WHEN doc_id % 3 = 0 THEN '?ref=' || lang ELSE '' END AS url
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, url,
        |    regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1) AS scheme,
        |    lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS host,
        |    regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path,
        |    regexp_extract(url, '\?([^#]*)', 1) AS query
        |  FROM u),
        |r AS (
        |  SELECT *,
        |    CASE WHEN len(string_split(host, '.')) >= 3
        |              AND array_to_string(string_split(host, '.')[-2:], '.')
        |                  IN ('example.en', 'example.de', 'example.es', 'example.fr', 'example.zh')
        |         THEN array_to_string(string_split(host, '.')[-3:], '.')
        |         WHEN len(string_split(host, '.')) >= 2
        |         THEN array_to_string(string_split(host, '.')[-2:], '.')
        |         ELSE host END AS reg_domain
        |  FROM p)
        |SELECT doc_id, url, scheme, host, path, query, reg_domain,
        |       reg_domain IN ('src1.example.en', 'src2.example.de', 'src3.example.zh') AS blocked
        |FROM r""".stripMargin,
    "ns_links" ->
      s"""WITH $linksGateCtes
         |SELECT doc_id, url, link_pos, href, anchor, abs_url FROM links""".stripMargin,
    "ns_link_edges" ->
      s"""WITH $linksGateCtes,
         |h AS (
         |  SELECT doc_id,
         |    lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS shost,
         |    lower(regexp_extract(abs_url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS dhost
         |  FROM links),
         |g AS (
         |  SELECT doc_id,
         |    ${regDomainSql("shost", Seq("example.org", "example.net", "example.com"))} AS src_domain,
         |    ${regDomainSql("dhost", Seq("example.org", "example.net", "example.com"))} AS dst_domain
         |  FROM h)
         |SELECT src_domain, dst_domain, count(*) AS n_links,
         |       count(DISTINCT doc_id) AS n_src_docs
         |FROM g GROUP BY 1, 2""".stripMargin,
    "ns_stream_monitor" ->
      """SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
        |       time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS window_end,
        |       event_type, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN len(trim(props)) = 0 THEN 0
        |                ELSE len(string_split_regex(trim(props), '\s+')) END) AS BIGINT) AS n_tokens,
        |       CAST(sum(CASE WHEN len(props) >= 9 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       CAST(sum(CASE WHEN len(trim(props)) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    "ns_key_profile" ->
      """WITH c AS (SELECT event_type, count(*) AS cnt FROM events GROUP BY 1),
        |s AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_rows, count(*) AS n_keys FROM c),
        |t3 AS (SELECT * FROM c ORDER BY cnt DESC, event_type LIMIT 3)
        |SELECT event_type, cnt, total_rows, n_keys,
        |  CAST(row_number() OVER (ORDER BY cnt DESC, event_type) AS BIGINT) AS key_rank,
        |  (cnt * 1000) // total_rows AS share_permille,
        |  (cnt * 1000) // greatest(total_rows // n_keys, 1) AS vs_mean_permille
        |FROM t3 CROSS JOIN s""".stripMargin,
    "ns_domain_filter" ->
      s"""WITH u AS (
         |  SELECT doc_id,
         |    'https://' || CASE WHEN doc_id % 7 = 0 THEN 'www.' ELSE '' END ||
         |    source || '.example.' || lang || '/doc/' || doc_id AS url
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, url,
         |    lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS host
         |  FROM u),
         |r AS (
         |  SELECT doc_id, url,
         |    ${regDomainSql("host", Seq("example.en", "example.de", "example.es",
                "example.fr", "example.zh"))} AS reg
         |  FROM p)
         |SELECT doc_id, url FROM r
         |WHERE reg NOT IN ('src1.example.en', 'src2.example.de', 'src3.example.zh')""".stripMargin,
    "ns_epoch_plan" ->
      """WITH st AS (
        |  SELECT lang AS stratum,
        |    CAST(sum(CASE WHEN len(trim(text)) = 0 THEN 0
        |             ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1),
        |tgt(stratum, permille) AS (VALUES ('en', 200), ('de', 450), ('es', 250), ('fr', 100)),
        |p AS (
        |  SELECT st.stratum, st.tokens, CAST(coalesce(tgt.permille, 0) AS BIGINT) AS permille
        |  FROM st LEFT JOIN tgt USING (stratum)),
        |e AS (SELECT *, (30000 * permille) // 1000 AS target_tokens FROM p),
        |f AS (SELECT *, least(CASE WHEN tokens > 0 THEN (target_tokens * 1000) // tokens
        |                           ELSE 0 END, 2500) AS epochs_milli FROM e),
        |g AS (SELECT *, (tokens * epochs_milli) // 1000 AS planned_tokens FROM f),
        |h AS (SELECT *, target_tokens - planned_tokens AS shortfall FROM g)
        |SELECT stratum, tokens, permille, target_tokens, epochs_milli, planned_tokens, shortfall,
        |  CASE WHEN (SELECT sum(planned_tokens) FROM h) > 0
        |       THEN (planned_tokens * 1000) // CAST((SELECT sum(planned_tokens) FROM h) AS BIGINT)
        |       ELSE 0 END AS achieved_permille
        |FROM h""".stripMargin,
    "ns_keywords" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |f AS (SELECT doc_id, term, count(*) AS tf FROM tk WHERE len(term) >= 3 GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS df FROM f GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |sc AS (
        |  SELECT f.doc_id, f.term, f.tf, dfq.df,
        |    f.tf * (((n.n_docs - dfq.df) * 1000) // n.n_docs) AS score
        |  FROM f JOIN dfq USING (term) CROSS JOIN n
        |  WHERE (dfq.df * 1000) // n.n_docs <= 790),
        |r AS (
        |  SELECT doc_id, term, tf, df, score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS kw_rank
        |  FROM sc)
        |SELECT doc_id, kw_rank, term, tf, df, score FROM r WHERE kw_rank <= 5""".stripMargin,
    "ns_boilerplate" ->
      """WITH t2 AS (SELECT doc_id,
        |        string_split(regexp_replace(lower(trim(text)), '((?:\S+ ){4}\S+) ', '\1' || chr(10), 'g'), chr(10)) AS lines
        |      FROM documents),
        |l AS (SELECT doc_id, unnest(range(1, len(lines) + 1)) AS pos, unnest(lines) AS line,
        |             len(lines) AS n_lines FROM t2),
        |s AS (SELECT *,
        |        len(string_split_regex(lower(trim(line)), '\s+')) AS n_words,
        |        len(list_filter(string_split_regex(lower(trim(line)), '\s+'),
        |          t -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as'], t))) AS stop_hits,
        |        len(regexp_extract_all(line, '(?:^| )(?:https?://|www\.)')) AS n_links
        |      FROM l)
        |SELECT doc_id, CAST(any_value(n_lines) AS BIGINT) AS n_lines, count(*) AS n_kept,
        |       string_agg(line, chr(10) ORDER BY pos) AS text_clean
        |FROM s
        |WHERE n_words >= 3 AND stop_hits * 1000 >= 100 * n_words AND n_links * 1000 <= 1000 * n_words
        |GROUP BY doc_id""".stripMargin,
    "ns_dsir" ->
      """WITH tk AS (
        |  SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |f AS (
        |  SELECT doc_id, lang,
        |    list_concat(toks, list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS grams
        |  FROM tk),
        |b AS (
        |  SELECT doc_id, lang,
        |    CAST((('0x' || substr(md5(g), 1, 8))::UBIGINT & 2147483647) % 1024 AS INT) AS bucket,
        |    count(*) AS c
        |  FROM (SELECT doc_id, lang, unnest(grams) AS g FROM f) GROUP BY 1, 2, 3),
        |tt AS (SELECT bucket, sum(c) AS tb FROM b WHERE lang = 'de' GROUP BY 1),
        |rr AS (SELECT bucket, sum(c) AS rb FROM b GROUP BY 1)
        |SELECT b.doc_id,
        |  CAST(sum(b.c) AS BIGINT) AS n_feats,
        |  CAST(sum(b.c * coalesce(tt.tb, 0)) AS BIGINT) AS t_hits,
        |  CAST(sum(b.c * rr.rb) AS BIGINT) AS r_hits
        |FROM b LEFT JOIN tt USING (bucket) JOIN rr USING (bucket)
        |GROUP BY 1""".stripMargin,
    "ns_lm_score" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |tr AS (SELECT toks FROM tk WHERE doc_id % 2 = 0),
        |uni AS (SELECT t AS tok, count(*) AS c
        |        FROM (SELECT unnest(toks) AS t FROM tr) GROUP BY 1),
        |big AS (SELECT p, t, count(*) AS c FROM (
        |          SELECT unnest(toks[1:len(toks)-1]) AS p,
        |                 unnest(toks[2:len(toks)]) AS t
        |          FROM tr WHERE len(toks) >= 2) GROUP BY 1, 2),
        |pos AS (SELECT doc_id, unnest(range(1, len(toks) + 1)) AS i,
        |               unnest(toks) AS tok, toks FROM tk),
        |pt AS (SELECT doc_id, i, tok,
        |              CASE WHEN i = 1 THEN NULL ELSE toks[i-1] END AS prev
        |       FROM pos),
        |j AS (SELECT pt.doc_id, pt.i, b.c AS cb, uw.c AS cw
        |      FROM pt
        |      LEFT JOIN big b ON pt.prev = b.p AND pt.tok = b.t
        |      LEFT JOIN uni uw ON pt.tok = uw.tok)
        |SELECT doc_id,
        |  count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN cw IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  CAST(sum(CASE WHEN i > 1 AND cb IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |  CAST(sum(CASE WHEN i > 1 THEN coalesce(cb, 0) ELSE 0 END) AS BIGINT) AS sum_cb,
        |  CAST(sum(coalesce(cw, 0)) AS BIGINT) AS sum_cw
        |FROM j GROUP BY 1""".stripMargin,
    "ns_margin_pairs" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec,
        |             list_min(embedding::DOUBLE[]) AS vmin,
        |             list_max(embedding::DOUBLE[]) AS vmax
        |           FROM embeddings WHERE vec_id < 1000),
        |cz AS (SELECT id, list_transform(vec, x -> CASE WHEN vmax = vmin THEN CAST(0 AS BIGINT)
        |        ELSE CAST(least(greatest(round((x - vmin) * 255.0 / (vmax - vmin)), 0), 255) AS BIGINT) END) AS q
        |      FROM e),
        |qs AS (SELECT id, q FROM cz WHERE id < 50),
        |d AS (SELECT qs.id AS query_id, cz.id AS neighbor_id,
        |        CAST(list_sum(list_transform(range(len(qs.q)),
        |          i -> qs.q[CAST(i+1 AS INT)] * cz.q[CAST(i+1 AS INT)])) AS BIGINT) AS dot
        |      FROM qs JOIN cz ON qs.id != cz.id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rank FROM d),
        |p AS (SELECT query_id,
        |        max(CASE WHEN rank = 1 THEN neighbor_id END) AS neighbor_id,
        |        max(CASE WHEN rank = 1 THEN dot END) AS dot,
        |        max(CASE WHEN rank = 2 THEN dot END) AS runner_up
        |      FROM r WHERE rank <= 2 GROUP BY query_id)
        |SELECT query_id, neighbor_id, dot, runner_up, dot - runner_up AS margin
        |FROM p WHERE runner_up IS NOT NULL AND dot - runner_up >= 30000""".stripMargin,
    "ns_kcenter" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec,
        |             list_min(embedding::DOUBLE[]) AS vmin,
        |             list_max(embedding::DOUBLE[]) AS vmax
        |           FROM embeddings WHERE vec_id < 500),
        |c AS (SELECT id, list_transform(vec, x -> CASE WHEN vmax = vmin THEN CAST(0 AS BIGINT)
        |        ELSE CAST(least(greatest(round((x - vmin) * 255.0 / (vmax - vmin)), 0), 255) AS BIGINT) END) AS q
        |      FROM e),
        |c0 AS (SELECT q AS cq0 FROM c WHERE id = 0),
        |d1 AS (SELECT c.id, c.q,
        |         CAST(list_sum(list_transform(range(len(c.q)),
        |           i -> (c.q[CAST(i+1 AS INT)] - c0.cq0[CAST(i+1 AS INT)])
        |              * (c.q[CAST(i+1 AS INT)] - c0.cq0[CAST(i+1 AS INT)]))) AS BIGINT) AS md
        |       FROM c, c0),
        |s1 AS (SELECT id AS sid1, q AS cq1, md AS r1 FROM d1 ORDER BY md DESC, id LIMIT 1),
        |d2 AS (SELECT d1.id, d1.q,
        |         least(d1.md, CAST(list_sum(list_transform(range(len(d1.q)),
        |           i -> (d1.q[CAST(i+1 AS INT)] - s1.cq1[CAST(i+1 AS INT)])
        |              * (d1.q[CAST(i+1 AS INT)] - s1.cq1[CAST(i+1 AS INT)]))) AS BIGINT)) AS md
        |       FROM d1, s1),
        |s2 AS (SELECT id AS sid2, q AS cq2, md AS r2 FROM d2 ORDER BY md DESC, id LIMIT 1),
        |d3 AS (SELECT d2.id, d2.q,
        |         least(d2.md, CAST(list_sum(list_transform(range(len(d2.q)),
        |           i -> (d2.q[CAST(i+1 AS INT)] - s2.cq2[CAST(i+1 AS INT)])
        |              * (d2.q[CAST(i+1 AS INT)] - s2.cq2[CAST(i+1 AS INT)]))) AS BIGINT)) AS md
        |       FROM d2, s2),
        |s3 AS (SELECT id AS sid3, md AS r3 FROM d3 ORDER BY md DESC, id LIMIT 1)
        |SELECT CAST(0 AS BIGINT) AS rank, CAST(0 AS BIGINT) AS id, CAST(0 AS BIGINT) AS radius_sq
        |UNION ALL SELECT 1, sid1, r1 FROM s1
        |UNION ALL SELECT 2, sid2, r2 FROM s2
        |UNION ALL SELECT 3, sid3, r3 FROM s3""".stripMargin,
    "ns_prototypes" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
        |c AS (SELECT * FROM (VALUES (0, 1), (1, 17), (2, 33), (3, 49)) AS t(cell, dim)),
        |s AS (SELECT vec_id, cell,
        |        vec[dim] / sqrt(list_sum(list_transform(vec, x -> x * x))) AS sim
        |      FROM v CROSS JOIN c),
        |a AS (SELECT vec_id, cell, sim,
        |        row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        |      FROM s),
        |r AS (SELECT vec_id AS id, cell, sim,
        |        row_number() OVER (PARTITION BY cell ORDER BY sim DESC, vec_id) AS rank,
        |        count(*) OVER (PARTITION BY cell) AS n_cell
        |      FROM a WHERE rn = 1)
        |SELECT id, CAST(cell AS BIGINT) AS cell, CAST(rank AS INT) AS rank,
        |       n_cell, rank > floor(0.3 * n_cell) AS keep
        |FROM r""".stripMargin,
    "ns_bm25" -> bm25PostingsOracleSql,
    "ns_bm25_indexed" -> bm25PostingsOracleSql,
    "ns_substring_candidates" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CASE WHEN length(text) < 8 THEN []
        |         ELSE list_transform(range(1, length(text) - 6), i ->
        |           ('0x' || substr(md5(substr(text, i, 8)), 1, 8))::UBIGINT & 2147483647) END AS hs
        |  FROM documents WHERE doc_id < 200
        |), f AS (
        |  SELECT doc_id, CASE WHEN len(hs) = 0 THEN []
        |    WHEN len(hs) <= 4 THEN [list_min(hs)]
        |    ELSE list_distinct(list_transform(range(1, len(hs) - 2), i -> list_min(hs[i:i+3]))) END AS fps
        |  FROM h
        |)
        |SELECT idA, idB, n_shared FROM (
        |  SELECT a.doc_id AS idA, b.doc_id AS idB,
        |         CAST(len(list_intersect(a.fps, b.fps)) AS BIGINT) AS n_shared
        |  FROM f a JOIN f b ON a.doc_id < b.doc_id)
        |WHERE n_shared >= 30""".stripMargin,
    "ns_bpe" -> bpeOracleSql,
    "ns_bpe_fertility" ->
      s"""WITH $bpeEncodeCtes,
         |tc AS (SELECT doc_id, CAST(sum(len(subs)) AS BIGINT) AS ntok FROM e GROUP BY 1),
         |d AS (SELECT doc_id, lang, strlen(text) AS nb FROM documents)
         |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(COALESCE(tc.ntok, 0)) AS BIGINT) AS n_tokens,
         |  CAST(sum(d.nb) AS BIGINT) AS n_bytes,
         |  CAST((1000 * sum(d.nb)) // greatest(sum(COALESCE(tc.ntok, 0)), 1) AS BIGINT) AS bytes_per_token_permille
         |FROM d LEFT JOIN tc ON d.doc_id = tc.doc_id GROUP BY 1""".stripMargin,
    "ns_substr_dedup" ->
      s"""WITH inj AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 3 = 0 THEN '$SubstrDedupTail' ELSE '' END ||
         |    CASE WHEN doc_id % 5 = 0 THEN '$SubstrDedupTail$SubstrDedupTail' ELSE '' END AS text
         |  FROM documents),
         |tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM inj),
         |tok AS (SELECT doc_id, len(toks) AS n, unnest(range(0, len(toks))) AS tpos,
         |               unnest(toks) AS tok FROM tk),
         |sh AS (SELECT doc_id, unnest(range(0, len(toks) - 7)) AS pos,
         |              unnest(list_transform(range(0, len(toks) - 7),
         |                i -> substr(md5('graft-ss|' || array_to_string(toks[i+1:i+8], ' ')), 1, 30))) AS k
         |       FROM tk WHERE len(toks) >= 8),
         |f AS (SELECT k, count(*) AS c, min(doc_id * 1000000 + pos) AS w
         |      FROM sh GROUP BY 1 HAVING count(*) >= 2),
         |m AS (SELECT sh.doc_id, sh.pos FROM sh JOIN f USING (k)
         |      WHERE sh.doc_id * 1000000 + sh.pos != f.w),
         |cov AS (SELECT doc_id, unnest(range(pos, pos + 8)) AS tpos FROM m),
         |kept AS (SELECT tok.* FROM tok ANTI JOIN cov USING (doc_id, tpos))
         |SELECT doc_id, CAST(any_value(n) AS BIGINT) AS n_tokens, count(*) AS n_kept,
         |       string_agg(tok, ' ' ORDER BY tpos) AS text_dedup
         |FROM kept GROUP BY doc_id""".stripMargin,
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
        |) AS t(cust, n, amount_cents)""".stripMargin,
    "ns_pii_redact" ->
      """WITH inj AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 2 = 0 THEN ' contact u' || CAST(doc_id AS VARCHAR) || '@ex.com' ELSE '' END ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' call +1-555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN ' card 4111' || lpad(CAST(doc_id AS VARCHAR), 12, '0') ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END
        |    AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\+\d{1,2}-\d{3}-\d{3}-\d{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(text, '\b\d{13,16}\b')) AS BIGINT) AS n_ccs,
        |  CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+\d{1,2}-\d{3}-\d{3}-\d{4}', '<PHONE>', 'g'),
        |    '\b\d{13,16}\b', '<CC>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted
        |FROM inj""".stripMargin,
    "ns_decontaminate" ->
      """WITH tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |g AS (SELECT doc_id, CASE WHEN len(toks) < 4 THEN [array_to_string(toks, ' ')]
        |       ELSE list_distinct(list_transform(range(1, len(toks) - 2), i -> array_to_string(toks[i:i+3], ' '))) END AS grams
        |      FROM tk),
        |bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 17 = 0),
        |hits AS (SELECT doc_id, count(*) AS n_hits
        |         FROM (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 17 != 0) cg
        |         JOIN bg USING (gram) GROUP BY doc_id)
        |SELECT g.doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
        |  CAST(coalesce(n_hits, 0) AS BIGINT) AS n_contaminated_grams,
        |  coalesce(n_hits, 0) >= 1 AS contaminated
        |FROM g LEFT JOIN hits ON g.doc_id = hits.doc_id
        |WHERE g.doc_id % 17 != 0""".stripMargin,
    "ns_split_by_cluster" ->
      """WITH cl AS (SELECT doc_id AS id, doc_id % 37 AS cluster_id FROM documents WHERE doc_id % 2 = 0),
        |j AS (SELECT d.doc_id, d.lang, COALESCE(cl.cluster_id, d.doc_id) AS k
        |      FROM documents d LEFT JOIN cl ON d.doc_id = cl.id),
        |h AS (SELECT doc_id, lang,
        |        (('0x' || substr(md5('graft-split|' || CAST(k AS VARCHAR)), 1, 8))::UBIGINT & 2147483647) % 1000 AS hv
        |      FROM j)
        |SELECT doc_id, lang,
        |  CASE WHEN hv < 800 THEN 'train' WHEN hv < 900 THEN 'val' ELSE 'test' END AS split
        |FROM h""".stripMargin,
    "ns_contamination_report" ->
      """WITH tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |g AS (SELECT doc_id, CASE WHEN len(toks) < 4 THEN [array_to_string(toks, ' ')]
        |       ELSE list_distinct(list_transform(range(1, len(toks) - 2), i -> array_to_string(toks[i:i+3], ' '))) END AS grams
        |      FROM tk),
        |bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 17 = 0),
        |hits AS (SELECT doc_id, count(*) AS n_hits
        |         FROM (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 17 != 0) cg
        |         JOIN bg USING (gram) GROUP BY doc_id),
        |per AS (SELECT g.doc_id, coalesce(n_hits, 0) >= 1 AS contaminated
        |        FROM g LEFT JOIN hits ON g.doc_id = hits.doc_id
        |        WHERE g.doc_id % 17 != 0)
        |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN per.contaminated THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
        |  CAST((1000 * sum(CASE WHEN per.contaminated THEN 1 ELSE 0 END)) // count(*) AS BIGINT) AS contaminated_permille
        |FROM per JOIN documents d ON per.doc_id = d.doc_id
        |GROUP BY 1""".stripMargin,
    "ns_badwords" ->
      """WITH terms AS (SELECT unnest(['big table', 'slow', 'a', 'nosuchterm']) AS term),
        |hits AS (
        |  SELECT d.doc_id, t.term,
        |         len(list_filter(range(1, length(lower(d.text)) - length(t.term) + 2),
        |             i -> lower(d.text)[i:i + length(t.term) - 1] = t.term)) AS n
        |  FROM documents d CROSS JOIN terms t)
        |SELECT doc_id,
        |       CAST(sum(n) AS BIGINT) AS n_matches,
        |       CAST(count(*) FILTER (WHERE n > 0) AS INT) AS n_distinct_terms,
        |       sum(n) >= 3 AS flagged
        |FROM hits GROUP BY doc_id""".stripMargin,
    "ns_decontaminate_bloom" ->
      """WITH tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |g AS (SELECT doc_id, CASE WHEN len(toks) < 4 THEN [array_to_string(toks, ' ')]
        |       ELSE list_distinct(list_transform(range(1, len(toks) - 2), i -> array_to_string(toks[i:i+3], ' '))) END AS grams
        |      FROM tk),
        |bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 17 = 0)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_contaminated_grams,
        |       count(*) >= 1 AS contaminated
        |FROM (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 17 != 0) cg
        |JOIN bg USING (gram)
        |GROUP BY doc_id""".stripMargin,
    "ns_quality_filter" -> qualityFilterSql,
    "ns_align_scores" ->
      """WITH refr AS (SELECT n_chars AS rv, row_number() OVER (ORDER BY n_chars) AS idx
        |              FROM documents WHERE doc_id < 100),
        |mm AS (SELECT count(*) AS m FROM documents WHERE doc_id < 100),
        |d AS (SELECT lang, doc_id, n_chars,
        |        row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS r,
        |        count(*) OVER (PARTITION BY lang) AS n
        |      FROM documents)
        |SELECT d.lang, d.doc_id, d.n_chars,
        |       CAST((d.r * 1000) // d.n AS BIGINT) AS pct_permille,
        |       refr.rv AS aligned_score
        |FROM d CROSS JOIN mm
        |JOIN refr ON refr.idx = (d.r * mm.m + d.n - 1) // d.n""".stripMargin,
    "ns_filter_funnel" ->
      """WITH a AS (SELECT count(*) AS n,
        |  sum(CASE WHEN NOT coalesce(n_chars >= 100, FALSE) THEN 1 ELSE 0 END) AS k1,
        |  sum(CASE WHEN coalesce(n_chars >= 100, FALSE)
        |            AND NOT coalesce(lang != 'zh', FALSE) THEN 1 ELSE 0 END) AS k2,
        |  sum(CASE WHEN coalesce(n_chars >= 100, FALSE) AND coalesce(lang != 'zh', FALSE)
        |            AND NOT coalesce(length(text) - length(replace(text, ' ', '')) + 1 >= 30, FALSE)
        |           THEN 1 ELSE 0 END) AS k3
        |  FROM documents)
        |SELECT CAST(1 AS BIGINT) AS stage, 'min_chars' AS rule, CAST(n AS BIGINT) AS n_in,
        |       CAST(k1 AS BIGINT) AS n_killed, CAST(n - k1 AS BIGINT) AS n_out,
        |       CAST((k1 * 1000) // n AS BIGINT) AS killed_permille FROM a
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'lang_ok', CAST(n - k1 AS BIGINT), CAST(k2 AS BIGINT),
        |       CAST(n - k1 - k2 AS BIGINT), CAST((k2 * 1000) // (n - k1) AS BIGINT) FROM a
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), 'min_words', CAST(n - k1 - k2 AS BIGINT), CAST(k3 AS BIGINT),
        |       CAST(n - k1 - k2 - k3 AS BIGINT), CAST((k3 * 1000) // (n - k1 - k2) AS BIGINT) FROM a""".stripMargin,
    "ns_repetition" -> repetitionSql,
    "ns_fuzzy_join" ->
      """WITH n AS (SELECT c_custkey AS id, c_name AS s FROM customer WHERE c_custkey <= 1000)
        |SELECT a.id AS idA, b.id AS idB, CAST(levenshtein(a.s, b.s) AS INT) AS dist
        |FROM n a JOIN n b ON a.id < b.id
        |WHERE levenshtein(a.s, b.s) <= 2""".stripMargin,
    "ns_jaccard_join" ->
      """WITH tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |            FROM documents WHERE doc_id <= 1000),
        |g AS (SELECT doc_id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |       ELSE list_distinct(list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))) END AS grams
        |      FROM tk),
        |p AS (SELECT a.doc_id AS idA, b.doc_id AS idB,
        |        len(list_intersect(a.grams, b.grams)) AS n_common,
        |        len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) AS n_union
        |      FROM g a JOIN g b ON a.doc_id < b.doc_id)
        |SELECT idA, idB, CAST(n_common AS INT) AS n_common, CAST(n_union AS INT) AS n_union
        |FROM p WHERE n_common * 1000 >= 500 * n_union""".stripMargin,
    "ns_containment_join" ->
      """WITH tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |            FROM documents WHERE doc_id <= 1000),
        |g AS (SELECT doc_id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |       ELSE list_distinct(list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))) END AS grams
        |      FROM tk)
        |SELECT a.doc_id AS idSub, b.doc_id AS idSup,
        |  CAST(len(list_intersect(a.grams, b.grams)) AS INT) AS n_common,
        |  CAST(len(a.grams) AS INT) AS n_sub
        |FROM g a JOIN g b ON a.doc_id <> b.doc_id
        |WHERE len(list_intersect(a.grams, b.grams)) * 1000 >= 700 * len(a.grams)""".stripMargin,
    "ns_jaro_winkler" ->
      """SELECT a.p_partkey AS id,
        |  CAST(floor(jaro_winkler_similarity(a.p_name, b.p_name) * 1e6) AS BIGINT) AS sim_ppm
        |FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1""".stripMargin,
    "ns_jw_join" ->
      """WITH n AS (SELECT p_partkey AS id, p_name AS s FROM part WHERE p_partkey <= 600)
        |SELECT a.id AS idA, b.id AS idB,
        |  CAST(floor(jaro_winkler_similarity(a.s, b.s) * 1e6) AS BIGINT) AS sim_ppm
        |FROM n a JOIN n b
        |  ON upper(substr(a.s, 1, 1)) = upper(substr(b.s, 1, 1)) AND a.id < b.id
        |WHERE jaro_winkler_similarity(a.s, b.s) >= 0.92""".stripMargin,
    "ns_entity_resolution" ->
      """WITH RECURSIVE n AS (SELECT p_partkey AS id, p_name AS s FROM part WHERE p_partkey <= 600),
        |prs AS (
        |  SELECT a.id AS idA, b.id AS idB FROM n a JOIN n b
        |  ON upper(substr(a.s, 1, 1)) = upper(substr(b.s, 1, 1)) AND a.id < b.id
        |  WHERE jaro_winkler_similarity(a.s, b.s) >= 0.92),
        |und AS (SELECT idA AS a, idB AS b FROM prs UNION ALL SELECT idB, idA FROM prs),
        |reach AS (
        |  SELECT a, b FROM und
        |  UNION
        |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a)
        |SELECT n.id,
        |  CAST(coalesce(least(n.id, m.minb), n.id) AS BIGINT) AS cluster_id,
        |  (n.id = coalesce(least(n.id, m.minb), n.id)) AS is_canonical
        |FROM n LEFT JOIN (SELECT a, min(b) AS minb FROM reach GROUP BY a) m ON n.id = m.a""".stripMargin,
    "ns_snm_join" ->
      """WITH r AS (SELECT c_custkey, c_name,
        |    CAST(row_number() OVER (ORDER BY c_name, c_custkey) - 1 AS BIGINT) AS pos
        |  FROM customer WHERE c_custkey <= 2000)
        |SELECT a.c_custkey AS idA, b.c_custkey AS idB, b.pos - a.pos AS dist
        |FROM r a JOIN r b ON b.pos > a.pos AND b.pos - a.pos < 5""".stripMargin,
    "ns_percentile_rank" ->
      """WITH s AS (SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS score FROM documents),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY score, doc_id) AS rk,
        |        count(*) OVER (PARTITION BY lang) AS n FROM s)
        |SELECT doc_id, lang, score,
        |  CAST(((rk - 1) * 1000) // greatest(n - 1, 1) AS INT) AS permille FROM r""".stripMargin,
    "ns_distinctive_terms" ->
      """WITH tk AS (SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |occ AS (SELECT lang, unnest(toks) AS tok FROM tk),
        |tf AS (SELECT lang, tok, count(*) AS tf FROM occ GROUP BY 1, 2),
        |dfq AS (SELECT tok, count(*) AS df FROM (SELECT DISTINCT doc_id, unnest(list_distinct(toks)) AS tok FROM tk) GROUP BY 1),
        |sc AS (SELECT lang, tok, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        |         (tf * 1000000) // df AS score FROM tf JOIN dfq USING (tok)),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY score DESC, tok) AS rank FROM sc)
        |SELECT lang, tok, tf, df, CAST(score AS BIGINT) AS score, CAST(rank AS INT) AS rank
        |FROM rk WHERE rank <= 10""".stripMargin,
    "ns_strip_markup" -> stripMarkupSql,
    "ns_script_profile" -> scriptProfileSql,
    "ns_cross_corpus" ->
      """WITH u AS (
        |  SELECT 'wiki' AS source, 0 AS pri, doc_id AS id, md5(text) AS dg
        |  FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT 'web', 1, doc_id, md5(text) FROM documents WHERE doc_id % 3 <> 0),
        |r AS (SELECT *, row_number() OVER (PARTITION BY dg ORDER BY pri, id) AS rn FROM u),
        |w AS (SELECT dg, source AS winner_source, id AS winner_id FROM r WHERE rn = 1)
        |SELECT u.source, u.id,
        |  (u.source = w.winner_source AND u.id = w.winner_id) AS keep,
        |  w.winner_source, w.winner_id
        |FROM u JOIN w USING (dg)""".stripMargin,
    "ns_token_drift" ->
      """WITH ta AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |            FROM documents WHERE doc_id % 2 = 0),
        |tb AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |       FROM documents WHERE doc_id % 2 = 1),
        |ca AS (SELECT tok, count(*) AS cnt_a FROM ta GROUP BY 1),
        |cb AS (SELECT tok, count(*) AS cnt_b FROM tb GROUP BY 1),
        |j AS (SELECT COALESCE(ca.tok, cb.tok) AS tok,
        |        COALESCE(cnt_a, 0) AS cnt_a, COALESCE(cnt_b, 0) AS cnt_b
        |      FROM ca FULL OUTER JOIN cb ON ca.tok = cb.tok),
        |t AS (SELECT greatest(CAST((SELECT sum(cnt_a) FROM j) AS BIGINT), 1) AS tta,
        |        greatest(CAST((SELECT sum(cnt_b) FROM j) AS BIGINT), 1) AS ttb),
        |f AS (SELECT tok, cnt_a, cnt_b,
        |        (cnt_a * 1000000) // tta AS freq_a,
        |        (cnt_b * 1000000) // ttb AS freq_b FROM j, t),
        |c AS (SELECT *, CASE WHEN freq_a + freq_b = 0 THEN 0
        |        ELSE ((freq_a - freq_b) * (freq_a - freq_b)) // (freq_a + freq_b) END AS contrib
        |      FROM f),
        |r AS (SELECT *, row_number() OVER (ORDER BY contrib DESC, tok) AS rank FROM c)
        |SELECT tok, cnt_a, cnt_b, freq_a, freq_b, CAST(contrib AS BIGINT) AS contrib,
        |  CAST(rank AS INT) AS rank
        |FROM r WHERE rank <= 50""".stripMargin,
    "ns_line_dedup" ->
      """WITH t2 AS (SELECT doc_id,
        |        string_split(regexp_replace(lower(trim(text)), '((?:\S+ ){4}\S+) ', '\1' || chr(10), 'g'), chr(10)) AS lines
        |      FROM documents),
        |l AS (SELECT doc_id, unnest(range(1, len(lines) + 1)) AS pos, unnest(lines) AS line,
        |             len(lines) AS n_lines FROM t2),
        |k AS (SELECT *, row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn FROM l)
        |SELECT doc_id, CAST(any_value(n_lines) AS BIGINT) AS n_lines, count(*) AS n_kept,
        |       string_agg(line, chr(10) ORDER BY pos) AS text_dedup
        |FROM k WHERE rn = 1 OR line = '' GROUP BY doc_id""".stripMargin,
    "ns_line_dedup_doc" ->
      """WITH s AS (SELECT doc_id,
        |        regexp_replace(lower(trim(text)), '((?:\S+ ){4}\S+) ', '\1' || chr(10), 'g') AS st
        |      FROM documents),
        |w AS (SELECT doc_id,
        |        string_split(st || chr(10) || split_part(st, chr(10), 1), chr(10)) AS ls
        |      FROM s),
        |k AS (SELECT doc_id, ls,
        |        list_filter(range(len(ls)),
        |          i -> ls[CAST(i + 1 AS INT)] = ''
        |               OR list_position(ls, ls[CAST(i + 1 AS INT)]) = i + 1) AS keep
        |      FROM w)
        |SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines,
        |       CAST(len(keep) AS BIGINT) AS n_kept,
        |       array_to_string(list_transform(keep, i -> ls[CAST(i + 1 AS INT)]), chr(10)) AS text_dedup
        |FROM k""".stripMargin,
    "ns_sample_stratified" ->
      """WITH h AS (SELECT doc_id, lang,
        |  (('0x' || substr(md5('graft|' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT & 2147483647) AS hv
        |  FROM documents)
        |SELECT 'rate' AS mode, doc_id, lang FROM h
        |WHERE hv % 1000 < CASE lang WHEN 'en' THEN 250 WHEN 'de' THEN 900 WHEN 'es' THEN 500
        |                            WHEN 'fr' THEN 750 WHEN 'zh' THEN 100 ELSE 0 END
        |UNION ALL
        |SELECT 'quota' AS mode, doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rk FROM h)
        |WHERE rk <= 20""".stripMargin,
    "ns_multimodal" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CAST(greatest(1, ((('0x'||substr(md5(text||'d'),1,8))::UBIGINT & 2147483647) % 600000) // 40000) AS INT) AS n_frames,
        |  16 AS feat_dim, CAST(least(length(text), 16) AS INT) AS n_nonzero
        |FROM documents""".stripMargin,
    "ns_ann_pq" -> exactTopKSql,
    "ns_incremental_exact" ->
      """WITH corpus AS (
        |  SELECT md5(text) AS digest, min(doc_id) AS corpus_id
        |  FROM documents WHERE doc_id < 250 GROUP BY 1
        |), b AS (
        |  SELECT doc_id AS id, md5(text) AS digest FROM documents WHERE doc_id >= 250
        |), f AS (
        |  SELECT digest, min(id) AS first_id FROM b GROUP BY 1
        |)
        |SELECT b.id, c.corpus_id AS dup_of_corpus,
        |       b.id = f.first_id AS first_in_batch,
        |       c.corpus_id IS NULL AND b.id = f.first_id AS keep
        |FROM b JOIN f USING (digest) LEFT JOIN corpus c USING (digest)""".stripMargin,
    "ns_incremental_neardup" ->
      s"""WITH $minhashSigCtes
         |SELECT b.doc_id AS batch_id, a.doc_id AS corpus_id,
         |       $minhashEstSql AS est_jaccard
         |FROM sg a JOIN sg b ON a.doc_id < 250 AND b.doc_id >= 250
         |WHERE $minhashBandEqSql""".stripMargin,
    "ns_hybrid" ->
      """WITH post AS (
        |  SELECT id, count(*) AS n_terms, sum(tf) AS tf_total FROM (
        |    SELECT doc_id AS id, term, count(*) AS tf FROM (
        |      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |      FROM documents
        |    ) WHERE term IN ('join', 'filter', 'data') GROUP BY 1, 2
        |  ) GROUP BY 1
        |), trank AS (
        |  SELECT id, rank FROM (
        |    SELECT id, row_number() OVER (ORDER BY n_terms DESC, tf_total DESC, id) AS rank
        |    FROM post) WHERE rank <= 100
        |), vrank AS (
        |  SELECT id, rank FROM (
        |    SELECT vec_id AS id, row_number() OVER (ORDER BY
        |      list_cosine_similarity(embedding::DOUBLE[],
        |        (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)) DESC,
        |      vec_id) AS rank
        |    FROM embeddings) WHERE rank <= 100
        |), u AS (
        |  SELECT id, 1000000000 // (60 + rank) AS c FROM trank
        |  UNION ALL
        |  SELECT id, 1000000000 // (60 + rank) AS c FROM vrank
        |), f AS (
        |  SELECT id, count(*) AS n_lists, sum(c)::BIGINT AS rrf_micro
        |  FROM u GROUP BY 1 ORDER BY rrf_micro DESC, id LIMIT 50
        |)
        |SELECT id, n_lists, rrf_micro,
        |       CAST(row_number() OVER (ORDER BY rrf_micro DESC, id) AS INT) AS rank
        |FROM f""".stripMargin,
    "ns_pipeline" ->
      """WITH tk AS (
        |  SELECT doc_id, text, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents
        |), lang AS (
        |  SELECT doc_id,
        |    CASE WHEN s_de = best AND best > 0 THEN 'de'
        |         WHEN s_en = best AND best > 0 THEN 'en'
        |         WHEN s_es = best AND best > 0 THEN 'es'
        |         WHEN s_fr = best AND best > 0 THEN 'fr'
        |         WHEN s_zh = best AND best > 0 THEN 'zh'
        |         ELSE 'und' END AS lang_pred
        |  FROM (
        |    SELECT doc_id,
        |      len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','mit'))) AS s_de,
        |      len(list_filter(toks, x -> x IN ('the','and','of','to','is','that','with'))) AS s_en,
        |      len(list_filter(toks, x -> x IN ('el','la','los','las','que','es','con'))) AS s_es,
        |      len(list_filter(toks, x -> x IN ('le','la','les','est','que','avec','pour'))) AS s_fr,
        |      len(list_filter(toks, x -> x IN ('的','是','了','在','我','不'))) AS s_zh,
        |      greatest(
        |        len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','mit'))),
        |        len(list_filter(toks, x -> x IN ('the','and','of','to','is','that','with'))),
        |        len(list_filter(toks, x -> x IN ('el','la','los','las','que','es','con'))),
        |        len(list_filter(toks, x -> x IN ('le','la','les','est','que','avec','pour'))),
        |        len(list_filter(toks, x -> x IN ('的','是','了','在','我','不')))) AS best
        |    FROM tk)
        |), q AS (
        |  SELECT doc_id,
        |    (len(toks) >= 30
        |     AND CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks) >= 4.0
        |     AND len(list_filter(toks, x -> x IN ('the','a','an','and','or','of','to','in','is','it','that','for','on','with','as'))) >= 2) AS q_keep
        |  FROM tk
        |), rep AS (
        |  SELECT coalesce(md5(text), '∅' || CAST(doc_id AS VARCHAR)) AS digest,
        |         min(doc_id) AS rep_id
        |  FROM documents GROUP BY 1
        |), d0 AS (
        |  SELECT d.doc_id,
        |    CASE WHEN d.doc_id != r.rep_id THEN 'dedup'
        |         WHEN l.lang_pred != 'en' THEN 'lang'
        |         WHEN NOT q.q_keep THEN 'quality' END AS dropped_at
        |  FROM documents d
        |  JOIN rep r ON coalesce(md5(d.text), '∅' || CAST(d.doc_id AS VARCHAR)) = r.digest
        |  JOIN lang l USING (doc_id) JOIN q USING (doc_id)
        |)
        |SELECT doc_id, dropped_at,
        |  CASE WHEN dropped_at IS NULL THEN
        |    CASE WHEN hv < 800 THEN 'train' WHEN hv < 900 THEN 'val' ELSE 'test' END
        |  END AS split
        |FROM (SELECT *,
        |        (('0x' || substr(md5('graft-split|' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
        |         & 2147483647) % 1000 AS hv
        |      FROM d0)""".stripMargin,
    "ns_media_phash" ->
      s"""$phashCteSql
        |SELECT doc_id AS media_id, phash FROM bits""".stripMargin,
    "ns_media_neardup" ->
      s"""$phashCteSql,
        |bands AS (
        |  SELECT doc_id, phash, CAST(b AS INT) AS band,
        |         (phash >> CAST(15 * b AS INT)) & 32767 AS chunk
        |  FROM (SELECT doc_id, phash, unnest(range(4)) AS b FROM bits))
        |SELECT DISTINCT a.doc_id AS idA, c.doc_id AS idB,
        |       bit_count(xor(a.phash, c.phash))::INT AS hamming
        |FROM bands a JOIN bands c USING (band, chunk)
        |WHERE a.doc_id < c.doc_id AND bit_count(xor(a.phash, c.phash)) <= 3""".stripMargin,
    "ns_sentiment" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(toks, x -> x IN ('good','great','excellent','fast','love','best','happy','win','nice','cool'))) AS BIGINT) AS pos_hits,
        |  CAST(len(list_filter(toks, x -> x IN ('bad','terrible','slow','hate','worst','sad','fail','poor','wrong','broken'))) AS BIGINT) AS neg_hits,
        |  CAST(len(list_filter(toks, x -> x IN ('good','great','excellent','fast','love','best','happy','win','nice','cool')))
        |     - len(list_filter(toks, x -> x IN ('bad','terrible','slow','hate','worst','sad','fail','poor','wrong','broken'))) AS DOUBLE)
        |    / greatest(len(toks), 1) AS score
        |FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents)""".stripMargin,
    "ns_dialog_audit" ->
      """WITH msg AS (
        |  SELECT user_id, event_id,
        |    CASE WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
        |    CASE WHEN event_id % 97 = 0 THEN ''
        |         WHEN event_id % 53 = 0 THEN event_type || ' <|endoftext|>'
        |         ELSE event_type END AS content
        |  FROM events WHERE user_id % 20 = 3),
        |w AS (
        |  SELECT user_id, event_id, role, content,
        |    lag(role) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_role
        |  FROM msg)
        |SELECT user_id,
        |  CAST(count(*) AS BIGINT) AS n_turns,
        |  arg_min(role, event_id) AS first_role,
        |  arg_max(role, event_id) AS last_role,
        |  CAST(sum(CASE WHEN role = prev_role THEN 1 ELSE 0 END) AS BIGINT) AS n_role_repeats,
        |  CAST(sum(CASE WHEN trim(content) = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
        |  CAST(sum(CASE WHEN regexp_matches(content, '<\|[A-Za-z_]+\|>') THEN 1 ELSE 0 END) AS BIGINT) AS n_special
        |FROM w GROUP BY user_id""".stripMargin,
    "ns_token_budget" ->
      """WITH d AS (SELECT source, doc_id, n_chars AS score,
        |             n_chars // 5 AS t FROM documents),
        |w AS (SELECT source, doc_id, score, CAST(t AS BIGINT) AS n_tokens,
        |        CAST(sum(t) OVER (PARTITION BY source ORDER BY score DESC, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |      FROM d)
        |SELECT source, doc_id, score, n_tokens, cum_tokens,
        |  CAST(CASE WHEN cum_tokens <= 3000 THEN 1 ELSE 0 END AS INT) AS selected
        |FROM w""".stripMargin,
    "ns_balance" ->
      """WITH b AS (
        |  SELECT CAST(event_id % 10 < 8 AS VARCHAR) AS split, event_type AS l
        |  FROM events),
        |cells AS (SELECT split, l, CAST(count(*) AS HUGEINT) AS c FROM b GROUP BY 1, 2),
        |r AS (SELECT split, sum(c) AS n, count(*) AS k, max(c) AS maj,
        |        sum(c * c) AS sq
        |      FROM cells GROUP BY 1)
        |SELECT split, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS n_labels,
        |  CAST((1000 * maj) // n AS BIGINT) AS majority_share_milli,
        |  CAST((1000 * n * n) // sq AS BIGINT) AS effective_labels_milli
        |FROM r""".stripMargin,
    "ns_confusion" ->
      """WITH pr AS (SELECT event_type AS g,
        |              CASE WHEN event_id % 5 = 0 THEN 'view' ELSE event_type END AS p
        |            FROM events),
        |cells AS (SELECT g, p, CAST(count(*) AS HUGEINT) AS n FROM pr GROUP BY 1, 2),
        |gold AS (SELECT g AS label, sum(n) AS n_gold,
        |           coalesce(sum(CASE WHEN g = p THEN n END), 0) AS tp
        |         FROM cells GROUP BY 1),
        |pred AS (SELECT p AS label, sum(n) AS n_pred FROM cells GROUP BY 1),
        |j AS (SELECT coalesce(gold.label, pred.label) AS label,
        |        coalesce(tp, 0) AS tp,
        |        coalesce(n_pred, 0) - coalesce(tp, 0) AS fp,
        |        coalesce(n_gold, 0) - coalesce(tp, 0) AS fn
        |      FROM gold FULL JOIN pred ON gold.label = pred.label)
        |SELECT label, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
        |  CAST(fn AS BIGINT) AS fn,
        |  CASE WHEN tp + fp = 0 THEN NULL
        |       ELSE CAST((1000 * tp) // (tp + fp) AS BIGINT) END AS precision_milli,
        |  CASE WHEN tp + fn = 0 THEN NULL
        |       ELSE CAST((1000 * tp) // (tp + fn) AS BIGINT) END AS recall_milli,
        |  CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
        |       ELSE CAST((2000 * tp) // (2 * tp + fp + fn) AS BIGINT) END AS f1_milli
        |FROM j""".stripMargin,
    "ns_kappa" ->
      """WITH p AS (
        |  SELECT event_type AS a,
        |    CASE WHEN event_id % 5 = 0 THEN 'view' ELSE event_type END AS b
        |  FROM events),
        |cells AS (SELECT a, b, CAST(count(*) AS HUGEINT) AS n FROM p GROUP BY 1, 2),
        |ra AS (SELECT a AS l, sum(n) AS r FROM cells GROUP BY 1),
        |cb AS (SELECT b AS l, sum(n) AS c FROM cells GROUP BY 1),
        |pe AS (SELECT coalesce(sum(r * c), 0) AS rc FROM ra JOIN cb USING (l)),
        |tot AS (SELECT sum(n) AS N,
        |          coalesce(sum(CASE WHEN a = b THEN n END), 0) AS diag
        |        FROM cells)
        |SELECT CAST(N AS BIGINT) AS n, CAST(diag AS BIGINT) AS n_agree,
        |  CASE WHEN N * N - rc = 0 THEN NULL
        |       ELSE CAST((1000 * (N * diag - rc)) // (N * N - rc) AS BIGINT)
        |  END AS kappa_milli
        |FROM tot, pe""".stripMargin,
    "ns_preference_audit" ->
      """WITH p AS (
        |  SELECT doc_id, text AS chosen,
        |    CASE WHEN doc_id % 7 = 0 THEN text
        |         WHEN doc_id % 11 = 0 THEN ''
        |         ELSE replace(text, 'value', 'worth') END AS rejected
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, chosen, rejected,
        |    CASE WHEN length(trim(chosen)) = 0 THEN CAST(0 AS BIGINT)
        |         ELSE CAST(len(string_split_regex(trim(chosen), '\s+')) AS BIGINT) END AS nc,
        |    CASE WHEN length(trim(rejected)) = 0 THEN CAST(0 AS BIGINT)
        |         ELSE CAST(len(string_split_regex(trim(rejected), '\s+')) AS BIGINT) END AS nr
        |  FROM p)
        |SELECT doc_id,
        |  CAST(CASE WHEN chosen = rejected THEN 1 ELSE 0 END AS INT) AS identical,
        |  CAST(CASE WHEN nc = 0 THEN 1 ELSE 0 END AS INT) AS chosen_empty,
        |  CAST(CASE WHEN nr = 0 THEN 1 ELSE 0 END AS INT) AS rejected_empty,
        |  nc AS n_tokens_chosen, nr AS n_tokens_rejected,
        |  CASE WHEN greatest(nc, nr) = 0 THEN CAST(1000 AS BIGINT)
        |       ELSE CAST((least(nc, nr) * 1000) // greatest(nc, nr) AS BIGINT) END AS len_ratio_permille
        |FROM c""".stripMargin,
    "ns_span_corrupt" ->
      """WITH RECURSIVE tk AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []
        |         ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |tn AS (SELECT doc_id, toks, len(toks) AS n FROM tk),
        |rec(doc_id, pos, nf, k, corr, tgt) AS (
        |  SELECT doc_id, -1, 0, 0, '', '' FROM tn
        |  UNION ALL
        |  SELECT r.doc_id, r.pos + 1,
        |    CASE WHEN opens THEN r.pos + 1 + 3 ELSE r.nf END,
        |    CASE WHEN opens THEN r.k + 1 ELSE r.k END,
        |    CASE WHEN opens THEN r.corr || CASE WHEN r.corr = '' THEN '' ELSE ' ' END || '<extra_id_' || CAST(r.k AS VARCHAR) || '>'
        |         WHEN inspan THEN r.corr
        |         ELSE r.corr || CASE WHEN r.corr = '' THEN '' ELSE ' ' END || t END,
        |    CASE WHEN opens THEN r.tgt || CASE WHEN r.tgt = '' THEN '' ELSE ' ' END || '<extra_id_' || CAST(r.k AS VARCHAR) || '>' || ' ' || t
        |         WHEN inspan THEN r.tgt || ' ' || t
        |         ELSE r.tgt END
        |  FROM (
        |    SELECT r0.*, tn.toks[r0.pos + 2] AS t, tn.n,
        |      (r0.pos + 1) < r0.nf AS inspan,
        |      (r0.pos + 1) >= r0.nf AND
        |        (('0x' || substr(md5('graft-span|' || CAST(r0.doc_id AS VARCHAR) || ':' || CAST(r0.pos + 1 AS VARCHAR)), 1, 8))::UBIGINT
        |          & 2147483647) % 1000 < 150 AS opens
        |    FROM rec r0 JOIN tn ON tn.doc_id = r0.doc_id
        |    WHERE r0.pos + 1 < tn.n) r)
        |SELECT r.doc_id, r.corr AS corrupted, r.tgt AS target,
        |  CAST(tn.n AS BIGINT) AS n_tokens, CAST(r.k AS BIGINT) AS n_spans
        |FROM rec r JOIN tn ON tn.doc_id = r.doc_id AND r.pos = tn.n - 1""".stripMargin,
    "ns_word_dropout" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []
        |         ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, toks,
        |    list_filter(toks, (x, i) ->
        |      (('0x' || substr(md5('graft-dropout|' || CAST(doc_id AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)), 1, 8))::UBIGINT
        |        & 2147483647) % 1000 >= 200) AS kept
        |  FROM tk)
        |SELECT doc_id, array_to_string(kept, ' ') AS text,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(kept) AS BIGINT) AS n_kept
        |FROM k""".stripMargin,
    "ns_dialog_pipeline" ->
      """WITH RECURSIVE msg AS (
        |  SELECT user_id, event_id,
        |    (CASE WHEN event_id % 97 = 0 THEN ''
        |          WHEN event_id % 53 = 0 THEN event_type || ' <|endoftext|>'
        |          ELSE event_type END) ||
        |    (CASE WHEN event_id % 3 = 0 THEN ' mail u' || CAST(event_id AS VARCHAR) || '@ex.com' ELSE '' END) AS content
        |  FROM events WHERE user_id % 20 = 3),
        |aud AS (SELECT user_id,
        |    sum(CASE WHEN trim(content) = '' THEN 1 ELSE 0 END) AS ne,
        |    sum(CASE WHEN regexp_matches(content, '<\|[A-Za-z_]+\|>') THEN 1 ELSE 0 END) AS ns
        |  FROM msg GROUP BY 1),
        |kept AS (SELECT user_id FROM aud WHERE ne = 0 AND ns <= 1),
        |red AS (SELECT m.user_id, m.event_id,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(m.content,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\+\d{1,2}-\d{3}-\d{3}-\d{4}', '<PHONE>', 'g'),
        |      '\b\d{13,16}\b', '<CC>', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS content
        |  FROM msg m JOIN kept USING (user_id)),
        |tok AS (SELECT user_id, event_id,
        |    CASE WHEN length(trim(content)) = 0 THEN CAST(0 AS BIGINT)
        |         ELSE CAST(len(string_split_regex(trim(content), '\s+')) AS BIGINT) END AS t,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS INT) AS pos
        |  FROM red),
        |rec(user_id, pos, cum, chunk) AS (
        |  SELECT user_id, pos, t, CAST(0 AS BIGINT) FROM tok WHERE pos = 0
        |  UNION ALL
        |  SELECT m.user_id, m.pos,
        |    CASE WHEN r.cum > 0 AND r.cum + m.t > 9 THEN m.t ELSE r.cum + m.t END,
        |    CASE WHEN r.cum > 0 AND r.cum + m.t > 9 THEN r.chunk + 1 ELSE r.chunk END
        |  FROM rec r JOIN tok m ON m.user_id = r.user_id AND m.pos = r.pos + 1)
        |SELECT r.user_id, r.pos, r.chunk AS chunk_idx, m.t AS n_tokens
        |FROM rec r JOIN tok m ON m.user_id = r.user_id AND m.pos = r.pos""".stripMargin,
    "ns_dialog_pack" ->
      """WITH RECURSIVE msg AS (
        |  SELECT user_id, event_id,
        |    CAST(event_id % 5 + 1 AS BIGINT) AS t,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS INT) AS pos
        |  FROM events WHERE user_id % 20 = 3),
        |rec(user_id, pos, cum, chunk) AS (
        |  SELECT user_id, pos, t, CAST(0 AS BIGINT) FROM msg WHERE pos = 0
        |  UNION ALL
        |  SELECT m.user_id, m.pos,
        |    CASE WHEN r.cum > 0 AND r.cum + m.t > 7 THEN m.t ELSE r.cum + m.t END,
        |    CASE WHEN r.cum > 0 AND r.cum + m.t > 7 THEN r.chunk + 1 ELSE r.chunk END
        |  FROM rec r JOIN msg m ON m.user_id = r.user_id AND m.pos = r.pos + 1)
        |SELECT r.user_id, r.pos, r.chunk AS chunk_idx, m.t AS n_tokens
        |FROM rec r JOIN msg m ON m.user_id = r.user_id AND m.pos = r.pos""".stripMargin,
    "ns_dialog_redact" ->
      """WITH msg AS (
        |  SELECT user_id, event_id,
        |    CASE WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
        |    event_type ||
        |      CASE WHEN event_id % 3 = 0 THEN ' mail u' || CAST(event_id AS VARCHAR) || '@ex.com' ELSE '' END ||
        |      CASE WHEN event_id % 5 = 0 THEN ' ip 10.0.0.' || CAST(event_id % 256 AS VARCHAR) ELSE '' END AS content
        |  FROM events WHERE user_id % 20 = 3)
        |SELECT user_id,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS INT) AS pos,
        |  role,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(content,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+\d{1,2}-\d{3}-\d{3}-\d{4}', '<PHONE>', 'g'),
        |    '\b\d{13,16}\b', '<CC>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS content
        |FROM msg""".stripMargin,
    "ns_gini" ->
      """WITH r AS (
        |  SELECT source, CAST(n_chars AS BIGINT) AS x,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM documents WHERE n_chars IS NOT NULL)
        |SELECT source, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(x) AS BIGINT) AS total,
        |  CASE WHEN sum(x) > 0
        |    THEN CAST((1000 * sum((2*rn - n - 1) * x)) // (count(*) * sum(x)) AS BIGINT)
        |    ELSE CAST(0 AS BIGINT) END AS gini_milli
        |FROM r GROUP BY source""".stripMargin,
    "ns_benford" ->
      """WITH v AS (
        |  SELECT 'o_totalprice' AS "column",
        |         CAST(floor(o_totalprice) AS BIGINT) AS v FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', CAST(floor(o_custkey) AS BIGINT) FROM orders),
        |d AS (SELECT "column", CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit
        |      FROM v WHERE v > 0),
        |c AS (SELECT "column", digit, CAST(count(*) AS BIGINT) AS n
        |      FROM d GROUP BY 1, 2),
        |t AS (SELECT "column", sum(n) AS tt FROM c GROUP BY 1),
        |e(digit, expected_milli) AS (VALUES
        |  (1, CAST(301 AS BIGINT)), (2, 176), (3, 125), (4, 97), (5, 79),
        |  (6, 67), (7, 58), (8, 51), (9, 46))
        |SELECT c."column", c.digit, c.n,
        |  CAST((c.n * 1000) // t.tt AS BIGINT) AS observed_milli,
        |  e.expected_milli,
        |  CAST((c.n * 1000) // t.tt - e.expected_milli AS BIGINT) AS dev_milli
        |FROM c JOIN t USING ("column") JOIN e USING (digit)""".stripMargin,
    "ns_code_signals" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    replace(replace(replace(text, ' table ', ';' || chr(10)),
        |            ' row ', chr(10) || '    '), 'fast', 'fastPath')
        |    || CASE WHEN doc_id % 3 = 0
        |            THEN chr(10) || '```' || chr(10) || 'code();' || chr(10) || '```'
        |            ELSE '' END AS text
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CASE WHEN length(text) = 0 THEN CAST(0 AS BIGINT)
        |         ELSE CAST(len(regexp_extract_all(text, '\n')) + 1 AS BIGINT)
        |    END AS n_lines,
        |    CAST(len(regexp_extract_all(text, '(?s)```.*?```')) AS BIGINT) AS fenced_blocks,
        |    CAST(len(regexp_extract_all(text, '(?m)^.*[;{}][ \t]*$')) AS BIGINT) AS semi_brace_lines,
        |    CAST(len(regexp_extract_all(text, '(?m)^(?:\t|    )')) AS BIGINT) AS indented_lines,
        |    CAST(len(regexp_extract_all(text, '[a-z][a-z0-9]*[A-Z]')) AS BIGINT) AS camel_idents
        |  FROM m)
        |SELECT doc_id, n_lines, fenced_blocks, semi_brace_lines,
        |  indented_lines, camel_idents,
        |  (semi_brace_lines * 1000) // greatest(n_lines, 1) AS semi_brace_permille,
        |  (indented_lines * 1000) // greatest(n_lines, 1) AS indent_permille
        |FROM c""".stripMargin,
    "ns_acf" ->
      """WITH c AS (SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 3600 AS BIGINT) AS bucket,
        |             CAST(count(*) AS BIGINT) AS x
        |           FROM events GROUP BY 1),
        |r AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM c),
        |d AS (SELECT gs.b AS bucket, coalesce(c.x, 0) AS x
        |      FROM (SELECT unnest(generate_series(lo, hi)) AS b FROM r) gs
        |      LEFT JOIN c ON c.bucket = gs.b),
        |pl AS (
        |  SELECT 1 AS lag, CAST(a.x AS HUGEINT) AS x, CAST(b.x AS HUGEINT) AS y
        |  FROM d a JOIN d b ON b.bucket = a.bucket + 1
        |  UNION ALL SELECT 2, CAST(a.x AS HUGEINT), CAST(b.x AS HUGEINT)
        |  FROM d a JOIN d b ON b.bucket = a.bucket + 2
        |  UNION ALL SELECT 24, CAST(a.x AS HUGEINT), CAST(b.x AS HUGEINT)
        |  FROM d a JOIN d b ON b.bucket = a.bucket + 24),
        |s AS (SELECT lag, count(*) AS n, sum(x) AS sum_x, sum(y) AS sum_y,
        |        sum(x*x) AS sum_x2, sum(y*y) AS sum_y2, sum(x*y) AS sum_xy
        |      FROM pl GROUP BY 1)
        |SELECT CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n,
        |  CASE WHEN (n*sum_x2 - sum_x*sum_x) > 0 AND (n*sum_y2 - sum_y*sum_y) > 0 THEN
        |    CAST(round(1000.0 * CAST(n*sum_xy - sum_x*sum_y AS DOUBLE) /
        |      (sqrt(CAST(n*sum_x2 - sum_x*sum_x AS DOUBLE)) *
        |       sqrt(CAST(n*sum_y2 - sum_y*sum_y AS DOUBLE)))) AS BIGINT)
        |  END AS corr_permille
        |FROM s""".stripMargin,
    "ns_sentences" ->
      """WITH m AS (SELECT doc_id, replace(text, ' value ', '. ') AS text FROM documents),
        |s AS (SELECT doc_id,
        |        list_filter(list_transform(regexp_extract_all(text, '[^.!?]+[.!?]*'),
        |          x -> trim(x)), x -> length(x) > 0) AS ss
        |      FROM m)
        |SELECT doc_id, CAST(i - 1 AS INT) AS pos, ss[CAST(i AS INT)] AS sentence
        |FROM (SELECT doc_id, ss, unnest(range(1, len(ss) + 1)) AS i FROM s)""".stripMargin,
    "ns_lexical_diversity" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN []
        |         ELSE string_split_regex(lower(trim(text)), '\s+') END AS toks
        |  FROM documents),
        |x AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS nt,
        |        CAST(len(list_distinct(toks)) AS BIGINT) AS ny,
        |        CAST(len(list_filter(list_distinct(toks),
        |          t -> len(list_filter(toks, u -> u = t)) = 1)) AS BIGINT) AS hp
        |      FROM tk)
        |SELECT doc_id, nt AS n_tokens, ny AS n_types,
        |  (ny * 1000) // greatest(nt, 1) AS ttr_permille,
        |  (hp * 1000) // greatest(nt, 1) AS hapax_permille
        |FROM x""".stripMargin,
    "ns_readability" ->
      """WITH m AS (
        |  SELECT doc_id, replace(text, ' value ', '. ') AS text FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS w,
        |    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS s,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS y
        |  FROM m)
        |SELECT doc_id, w AS n_words, s AS n_sentences, y AS n_syllables,
        |  CAST(206835 - (1015 * w) // greatest(s, 1)
        |              - (84600 * y) // greatest(w, 1) AS BIGINT) AS flesch_milli,
        |  CAST((390 * w) // greatest(s, 1)
        |     + (11800 * y) // greatest(w, 1) - 15590 AS BIGINT) AS fk_grade_milli
        |FROM c""".stripMargin,
    "ns_text_profile" ->
      """SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens_ws,
        |  len(regexp_extract_all(text, '[A-Za-z0-9]{1,4}'))
        |    + len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_tokens_bpe,
        |  length(text) AS n_chars,
        |  len(string_split_regex(lower(trim(text)), '\s+')) AS n_words,
        |  CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |    / len(string_split_regex(lower(trim(text)), '\s+')) AS mean_word_len,
        |  CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    x -> x IN ('the','a','an','and','or','of','to','in','is','it','that','for','on','with','as'))) AS DOUBLE)
        |    / len(string_split_regex(lower(trim(text)), '\s+')) AS stopword_ratio,
        |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / length(text) AS punct_ratio,
        |  s_en AS en_score,
        |  CASE WHEN s_de = best AND best > 0 THEN 'de'
        |       WHEN s_en = best AND best > 0 THEN 'en'
        |       WHEN s_es = best AND best > 0 THEN 'es'
        |       WHEN s_fr = best AND best > 0 THEN 'fr'
        |       WHEN s_zh = best AND best > 0 THEN 'zh'
        |       ELSE 'und' END AS lang_pred
        |FROM (
        |  SELECT *,
        |    len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','mit'))) AS s_de,
        |    len(list_filter(toks, x -> x IN ('the','and','of','to','is','that','with'))) AS s_en,
        |    len(list_filter(toks, x -> x IN ('el','la','los','las','que','es','con'))) AS s_es,
        |    len(list_filter(toks, x -> x IN ('le','la','les','est','que','avec','pour'))) AS s_fr,
        |    len(list_filter(toks, x -> x IN ('的','是','了','在','我','不'))) AS s_zh,
        |    greatest(
        |      len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','mit'))),
        |      len(list_filter(toks, x -> x IN ('the','and','of','to','is','that','with'))),
        |      len(list_filter(toks, x -> x IN ('el','la','los','las','que','es','con'))),
        |      len(list_filter(toks, x -> x IN ('le','la','les','est','que','avec','pour'))),
        |      len(list_filter(toks, x -> x IN ('的','是','了','在','我','不')))) AS best
        |  FROM (SELECT *, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents))""".stripMargin
  )
}
