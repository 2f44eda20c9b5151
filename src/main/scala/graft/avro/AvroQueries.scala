package graft.avro

import graft.{QueryDef, QueryModule}
import graft.config.PipelineConfig
import graft.graph.TripleStore
import graft.operators.Tables
import graft.operators.Exact
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingest/Avro/registry operator suite (SURVEY.md §2.1) — the Spark
  * re-expression of the reference's entire consume path:
  * topic log -> CP1 unframe -> Avro decode -> (JSON | config transforms |
  * error counting) (`src/main.cpp`, `src/KafkaConsumerCallback.cpp`).
  *
  * There is no broker in this environment, so the "topic" is a
  * deterministic DataFrame materialized from the `events` table with
  * Kafka semantics: 4 partitions keyed by user, per-partition
  * monotonically-increasing offsets, CP1-framed Confluent Avro values.
  * The decode path is byte-for-byte the real thing.
  */
object AvroQueries extends QueryModule {

  val Topic = "events"
  val NumPartitions = 4

  /** Staging paths with a delete-on-exit hook already registered. One
    * hook per path per JVM: repeated Verify/Bench invocations in one
    * session must not accumulate hook threads. On first use it also
    * sweeps stale `graft_csv_*` siblings left by runs killed before
    * their hooks fired (staging dirs are applicationId-keyed, so a
    * crashed run's directory would otherwise leak forever). */
  private val cleanupRegistered = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def registerCleanup(path: String): Unit = {
    if (cleanupRegistered.add(path)) {
      if (cleanupRegistered.size() == 1) {
        // age-gated: a fresh sibling may belong to a LIVE concurrent
        // session on the same machine — only reap clearly-dead leftovers.
        // 7 days, not 24 h: a long soak/bench session can legitimately
        // outlive a day, and a week-old staging dir from a crashed run
        // is still reclaimed before it matters
        val cutoff = System.currentTimeMillis() - 7L * 24 * 3600 * 1000
        val parent = new java.io.File(path).getParentFile
        Option(parent.listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.startsWith("graft_csv_") &&
            f.getAbsolutePath != path && f.lastModified() < cutoff)
          .foreach(f =>
            try org.apache.commons.io.FileUtils.deleteDirectory(f)
            catch { case _: Throwable => () })
      }
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
        catch { case _: Throwable => () }))
    }
  }

  /** Avro value schema for the events topic (what the reference's
    * config-driven `assemble_schema` would emit for this column list). */
  val EventsSchemaJson: String = AvroCodec.recordSchemaJson("events_msg", Seq(
    "event_id" -> "long",
    "user_id" -> "long",
    "event_type" -> "string",
    "value" -> "double",
    "props" -> "string"))

  /** SPO triple schema — the reference's actual topic (`spo`). */
  val SpoSchemaJson: String = AvroCodec.recordSchemaJson("spo_msg", Seq(
    "subject" -> "string",
    "predicate" -> "string",
    "object" -> "string"))

  /** Schema v2 for the events topic: adds a nullable `source` (with a
    * default, so v1-written messages resolve) and drops `props` — the
    * canonical compatible-evolution pair (add-with-default / remove). */
  val EventsSchemaV2Json: String =
    """{"type":"record","name":"events_msg","fields":[
      |{"name":"event_id","type":"long"},
      |{"name":"user_id","type":"long"},
      |{"name":"event_type","type":"string"},
      |{"name":"value","type":"double"},
      |{"name":"source","type":["null","string"],"default":null}]}""".stripMargin

  /** Logical-typed events schema, v1: date + timestamp-micros. */
  val EventsLogicalV1Json: String =
    """{"type":"record","name":"events_logical","fields":[
      |{"name":"event_id","type":"long"},
      |{"name":"day","type":{"type":"int","logicalType":"date"}},
      |{"name":"ts_us","type":{"type":"long","logicalType":"timestamp-micros"}}]}""".stripMargin

  /** v2 adds a decimal(18,4) `amount` with a one-zero-byte default
    * (bytes defaults are ISO-8859-1 strings; 0x00 unscaled = 0.0000),
    * so v1-written frames resolve through the reader — the
    * logical-type-adding writer-evolution case. Built by concat: the
    * default must reach Jackson as the six characters `\u0000`, which
    * triple-quoted Scala cannot spell unambiguously. */
  val EventsLogicalV2Json: String =
    "{\"type\":\"record\",\"name\":\"events_logical\",\"fields\":[" +
      "{\"name\":\"event_id\",\"type\":\"long\"}," +
      "{\"name\":\"day\",\"type\":{\"type\":\"int\",\"logicalType\":\"date\"}}," +
      "{\"name\":\"ts_us\",\"type\":{\"type\":\"long\",\"logicalType\":\"timestamp-micros\"}}," +
      "{\"name\":\"amount\",\"type\":{\"type\":\"bytes\",\"logicalType\":\"decimal\"," +
      "\"precision\":18,\"scale\":4},\"default\":\"\\u0000\"}]}"

  /** Complex-typed events schema: enum, array, map, nested record, and
    * plain fixed — the rest of the Avro type system beyond primitives,
    * unions and logical types. */
  val EventsComplexJson: String =
    """{"type":"record","name":"events_complex","fields":[
      |{"name":"event_id","type":"long"},
      |{"name":"etype","type":{"type":"enum","name":"EType",
      |  "symbols":["click","view","purchase","signup","error"]}},
      |{"name":"tags","type":{"type":"array","items":"string"}},
      |{"name":"attrs","type":{"type":"map","values":"long"}},
      |{"name":"geo","type":{"type":"record","name":"Geo","fields":[
      |  {"name":"region","type":"string"},
      |  {"name":"score","type":"double"}]}},
      |{"name":"token","type":{"type":"fixed","name":"Tok8","size":8}}]}""".stripMargin

  /** The reference's YAML config shape (configs/SPO_2_kafka.yaml),
    * retargeted at the events topic. */
  val ConfigYaml: String =
    """kafka:
      |  bootstrap.servers: localhost:9092
      |  client.id: graft-consumer
      |  schema.registry.url: mem://local
      |column_map:
      |  user_id: uid
      |  value: amount
      |column_type_transforms:
      |  event_id: long
      |  user_id: long
      |  value: double
      |type_map:
      |  events:
      |    key_column: user_id
      |    columns:
      |      - event_id
      |      - user_id
      |      - event_type
      |      - value
      |""".stripMargin

  /** Simulated Kafka topic: (topic, partition, msg_offset, key, value).
    * Offsets are per-partition row_numbers in (ts, event_id) order —
    * exactly a Kafka partition's append order for a keyed producer.
    */
  def topicLog(spark: SparkSession, dir: String): DataFrame = {
    val (_, schemaId) = SchemaRegistry.withSchema(Topic, EventsSchemaJson)
    val ev = Tables(spark, dir).events
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("partition", pmod(col("user_id"), lit(NumPartitions)).cast("int"))
    val encoded = AvroCodec.encode(
      ev.select("event_id", "user_id", "event_type", "value", "props", "ts_us", "partition"),
      EventsSchemaJson, schemaId,
      passthrough = Seq("event_id", "user_id", "ts_us", "partition"))
    encoded
      .withColumn("topic", lit(Topic))
      .withColumn("msg_offset",
        (row_number().over(Window.partitionBy(col("partition"))
          .orderBy(col("ts_us"), col("event_id"))) - 1).cast("long"))
      .withColumn("key", col("user_id").cast("string").cast("binary"))
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "kafka_log_scan",
      (s, dir) => {
        topicLog(s, dir)
          .groupBy(col("topic"), col("partition"))
          .agg(
            count(lit(1)).as("n_msgs"),
            max(col("msg_offset")).as("max_offset"),
            (max(col("msg_offset")) === count(lit(1)) - 1).as("contiguous"),
            min(col("ts_us")).as("min_ts_us"),
            max(col("ts_us")).as("max_ts_us"))
          .orderBy(col("partition"))
      },
      Some(s"""WITH log AS (
        SELECT CAST(user_id % $NumPartitions AS INT) AS partition, epoch_us(ts) AS ts_us,
          CAST(ROW_NUMBER() OVER (PARTITION BY user_id % $NumPartitions
            ORDER BY epoch_us(ts), event_id) - 1 AS BIGINT) AS msg_offset
        FROM events)
      SELECT 'events' AS topic, partition, COUNT(*) AS n_msgs,
        MAX(msg_offset) AS max_offset,
        MAX(msg_offset) = COUNT(*) - 1 AS contiguous,
        MIN(ts_us) AS min_ts_us, MAX(ts_us) AS max_ts_us
      FROM log GROUP BY partition ORDER BY partition""")
    ),

    QueryDef(
      "avro_roundtrip_count",
      (s, dir) => {
        val decoded = AvroCodec.decode(topicLog(s, dir), "value", EventsSchemaJson)
        decoded
          .filter(col("err").isNull)
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            Exact.dsum(col("value")).as("total_value"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("event_type"))
      },
      Some(s"""SELECT event_type, COUNT(*) AS n,
        ${Exact.sqlSum("value")} AS total_value,
        COUNT(DISTINCT user_id) AS n_users
      FROM events GROUP BY event_type ORDER BY event_type""")
    ),

    QueryDef(
      "avro_decode_project",
      (s, dir) => {
        val decoded = AvroCodec.decode(topicLog(s, dir), "value", EventsSchemaJson)
        decoded
          .filter(col("err").isNull && col("event_type") === "purchase" && col("value") > 100.0)
          .select(
            col("event_id"),
            col("user_id"),
            col("value"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, value,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events WHERE event_type = 'purchase' AND value > 100.0
      ORDER BY event_id""")
    ),

    QueryDef(
      "avro_to_json",
      (s, dir) => {
        val triples = TripleStore.triplesFromEvents(Tables(s, dir).events)
        val (_, spoId) = SchemaRegistry.withSchema("spo", SpoSchemaJson)
        val framed = AvroCodec.encode(triples, SpoSchemaJson, spoId)
        val jsons = AvroCodec.decodeToJson(framed, "value", SpoSchemaJson)
        jsons
          .withColumn("predicate", get_json_object(col("json"), "$.predicate"))
          .groupBy(col("predicate"))
          .agg(count(lit(1)).as("n"),
            sum(length(col("json")).cast("long")).as("total_json_chars"))
          .orderBy(col("predicate"))
      },
      Some(s"""WITH triples AS (${TripleStore.triplesSql}),
        js AS (SELECT predicate,
          '{"subject":"' || subject || '","predicate":"' || predicate ||
            '","object":"' || object || '"}' AS json
        FROM triples)
      SELECT predicate, COUNT(*) AS n,
        CAST(SUM(length(json)) AS BIGINT) AS total_json_chars
      FROM js GROUP BY predicate ORDER BY predicate""")
    ),

    QueryDef(
      "deser_error_count",
      (s, dir) => {
        // deterministically corrupt a slice of the stream: wrong magic for
        // event_id % 97 == 0, truncated frame for event_id % 101 == 0
        val log = topicLog(s, dir).withColumn("value",
          when(pmod(col("event_id"), lit(97)) === 0,
            concat(lit(Array[Byte](1)), expr("substring(value, 2)")))
            .when(pmod(col("event_id"), lit(101)) === 0, expr("substring(value, 1, 3)"))
            .otherwise(col("value")))
        AvroCodec.decode(log, "value", EventsSchemaJson)
          .withColumn("status", coalesce(col("err"), lit("ok")))
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("status"))
      },
      Some("""SELECT CASE WHEN event_id % 97 = 0 THEN 'bad_magic'
                   WHEN event_id % 101 = 0 THEN 'truncated'
                   ELSE 'ok' END AS status, COUNT(*) AS n
      FROM events GROUP BY 1 ORDER BY 1""")
    ),

    QueryDef(
      // schema evolution through the registry: the topic carries TWO
      // writer schema versions (even event_ids framed with v1, odd with
      // v2 which adds `source` and drops `props`); the consumer decodes
      // everything against the v2 READER schema via per-frame-id Avro
      // resolution — v1 messages fill `source` from its default (null).
      "avro_evolution",
      (s, dir) => {
        val registry = new SchemaRegistry
        val v1Id = registry.register("events-value", EventsSchemaJson)
        val v2Id = registry.register("events-value", EventsSchemaV2Json)
        val ev = Tables(s, dir).events
        val encV1 = AvroCodec.encode(
          ev.filter(pmod(col("event_id"), lit(2)) === 0)
            .select("event_id", "user_id", "event_type", "value", "props"),
          EventsSchemaJson, v1Id)
        val encV2 = AvroCodec.encode(
          ev.filter(pmod(col("event_id"), lit(2)) === 1)
            .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
              concat(lit("src_"), pmod(col("user_id"), lit(4))).as("source")),
          EventsSchemaV2Json, v2Id)
        val decoded = AvroCodec.decodeMulti(
          encV1.unionByName(encV2), "value", registry.snapshot, EventsSchemaV2Json)
        decoded
          .filter(col("err").isNull)
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            count(col("source")).as("n_with_source"),
            countDistinct(col("source")).as("n_sources"),
            Exact.dsum(col("value")).as("total_value"))
          .orderBy(col("event_type"))
      },
      Some(s"""SELECT event_type, COUNT(*) AS n,
        COUNT(CASE WHEN event_id % 2 = 1 THEN 1 END) AS n_with_source,
        COUNT(DISTINCT CASE WHEN event_id % 2 = 1
          THEN 'src_' || CAST(user_id % 4 AS VARCHAR) END) AS n_sources,
        ${Exact.sqlSum("value")} AS total_value
      FROM events GROUP BY event_type ORDER BY event_type""")
    ),

    QueryDef(
      // Avro logical types end-to-end: date / timestamp-micros / decimal
      // encoded from typed Spark columns, decoded back through the
      // resolving reader — INCLUDING evolution across a
      // logical-type-adding writer (even event_ids framed v1 without
      // `amount`; the v2 reader fills its zero-decimal default). The
      // oracle aggregates the same typed values straight from the source
      // table, so decimal scale handling, epoch-day dates and micros
      // timestamps must all survive the binary round-trip exactly.
      "avro_logical_types",
      (s, dir) => {
        val registry = new SchemaRegistry
        val v1Id = registry.register("events_logical-value", EventsLogicalV1Json)
        val v2Id = registry.register("events_logical-value", EventsLogicalV2Json)
        val src = Tables(s, dir).events.select(
          col("event_id"),
          to_date(col("ts")).as("day"),
          col("ts").as("ts_us"),
          col("value").cast("decimal(18,4)").as("amount"))
        val encV1 = AvroCodec.encode(
          src.filter(pmod(col("event_id"), lit(2)) === 0), EventsLogicalV1Json, v1Id)
        val encV2 = AvroCodec.encode(
          src.filter(pmod(col("event_id"), lit(2)) === 1), EventsLogicalV2Json, v2Id)
        val decoded = AvroCodec.decodeMulti(
          encV1.unionByName(encV2), "value", registry.snapshot, EventsLogicalV2Json)
        // Output boundary is hash-normalized (driver-gate convention all
        // passing queries follow): DATE → ISO string, TIMESTAMP → epoch
        // micros BIGINT, DECIMAL → DOUBLE. The logical-type DECODE path
        // stays fully typed — only the comparison surface is converted.
        decoded
          .filter(col("err").isNull)
          .groupBy(col("day"))
          .agg(
            count(lit(1)).as("n_events"),
            max(col("ts_us")).as("max_ts"),
            sum(col("amount")).cast("double").as("total_amount"),
            max(when(pmod(col("event_id"), lit(2)) === 1, col("amount"))).as("max_amount"))
          .select(
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n_events"),
            unix_micros(col("max_ts")).as("max_ts_us"),
            col("total_amount"),
            col("max_amount").cast("double").as("max_amount"))
          .orderBy(col("day"))
      },
      Some("""SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, COUNT(*) AS n_events,
        epoch_us(MAX(CAST(ts AS TIMESTAMP))) AS max_ts_us,
        CAST(SUM(CASE WHEN event_id % 2 = 1 THEN CAST(value AS DECIMAL(18,4))
                      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS total_amount,
        CAST(MAX(CASE WHEN event_id % 2 = 1 THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS max_amount
      FROM events GROUP BY 1 ORDER BY 1""")
    ),

    QueryDef(
      // The rest of the Avro type system end-to-end: enum / array / map /
      // nested record / plain fixed encoded from Spark complex columns,
      // decoded back, and aggregated THROUGH the complex values (map
      // lookup, array element, struct field, fixed hex) — so every
      // container conversion must survive the binary round-trip exactly.
      // The oracle computes the same aggregates straight from the source
      // columns the containers were built from.
      "avro_complex_types",
      (s, dir) => {
        val src = Tables(s, dir).events.select(
          col("event_id"),
          col("event_type").as("etype"),
          array(col("event_type"), concat(lit("u"), (col("user_id") % 4).cast("string")))
            .as("tags"),
          map(lit("k"), get_json_object(col("props"), "$.k").cast("long"),
            lit("uid"), col("user_id")).as("attrs"),
          struct(
            concat(lit("r"), (col("user_id") % 3).cast("string")).as("region"),
            col("value").as("score")).as("geo"),
          unhex(lpad(hex(col("event_id")), 16, "0")).as("token"))
        val (_, id) = SchemaRegistry.withSchema("events_complex", EventsComplexJson)
        val framed = AvroCodec.encode(src, EventsComplexJson, id)
        val decoded = AvroCodec.decode(framed, "value", EventsComplexJson)
        decoded
          .filter(col("err").isNull)
          .groupBy(col("etype"))
          .agg(
            count(lit(1)).as("n"),
            sum(element_at(col("attrs"), "uid")).cast("long").as("total_uid"),
            sum(element_at(col("attrs"), "k")).cast("long").as("total_k"),
            countDistinct(element_at(col("tags"), 2)).as("tag2_distinct"),
            countDistinct(col("geo.region")).as("n_regions"),
            max(col("geo.score")).as("max_score"),
            max(hex(col("token"))).as("max_tok"))
          .orderBy(col("etype"))
      },
      Some("""SELECT event_type AS etype, COUNT(*) AS n,
        CAST(SUM(user_id) AS BIGINT) AS total_uid,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS total_k,
        COUNT(DISTINCT 'u' || CAST(user_id % 4 AS VARCHAR)) AS tag2_distinct,
        COUNT(DISTINCT 'r' || CAST(user_id % 3 AS VARCHAR)) AS n_regions,
        MAX(value) AS max_score,
        MAX(lpad(hex(event_id), 16, '0')) AS max_tok
      FROM events GROUP BY event_type ORDER BY etype""")
    ),

    QueryDef(
      // the reference's PRODUCER path end-to-end as a graded query
      // ("Produces Avro encoded messages to Kafka from CSV objects",
      // `src/main.cpp:101`): events dumped to CSV -> CsvProducer shapes
      // rows by the YAML config (rename/cast/key column), assembles the
      // Avro schema, registers it, CP1-frames each row -> consumed back
      // through the registry's schema and aggregated. The oracle computes
      // the same aggregate straight from the source table, so the whole
      // produce->frame->decode loop must be lossless (incl. the CSV
      // double roundtrip).
      "csv_ingest",
      (s, dir) => {
        // stable per-sfDir staging path (overwrite mode) so repeated
        // Verify/Bench runs don't accumulate temp directories — keyed by
        // the sanitized full path (hashCode alone can collide across
        // sfDirs) plus the application id (two concurrent sessions on the
        // same sfDir must not overwrite each other's staging mid-read)
        val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_csv_" +
          s"${dir.replaceAll("[^A-Za-z0-9._-]", "_")}_${s.sparkContext.applicationId}"
        registerCleanup(tmp)
        Tables(s, dir).events
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
          .coalesce(1)
          .write.option("header", "true").mode("overwrite").csv(s"$tmp/events_csv")
        val cfg = PipelineConfig.parseYaml(ConfigYaml)
        val registry = new SchemaRegistry
        val framed = CsvProducer.produce(s, s"$tmp/events_csv", cfg, Topic, registry)
        val (_, schemaJson) = registry.fetchValueSchema(Topic).get
        AvroCodec.decode(framed, "value", schemaJson, passthrough = Seq("key"))
          .filter(col("err").isNull)
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n_msgs"),
            Exact.dsum(col("amount")).as("total_amount"),
            countDistinct(col("key")).as("n_keys"))
          .orderBy(col("event_type"))
      },
      Some(s"""SELECT event_type, COUNT(*) AS n_msgs,
        ${Exact.sqlSum("value")} AS total_amount,
        COUNT(DISTINCT CAST(user_id AS VARCHAR)) AS n_keys
      FROM events GROUP BY event_type ORDER BY event_type""")
    ),

    QueryDef(
      // the producer's DELIVERY-REPORT side (KafkaDeliveryReportCb.cpp:
      // 1-16 — the one reference file with no behavioral mirror until
      // r16, VERDICT r15 item 5): librdkafka invokes dr_cb once per
      // produced message with either (topic, partition, offset) on
      // success or an error on failure, and the reference logs each.
      // Re-expressed set-oriented: the report is the AGGREGATE of those
      // callbacks — per partition, how many messages were produced,
      // delivered, failed, and the partition's high-water offset. The
      // broker is simulated deterministically (no broker in-sandbox,
      // the KafkaSource contract): the keyed partitioner routes each
      // message by its key (pmod(key, 8) — same-key-same-partition,
      // Kafka's contract), partition 7's leader is OFFLINE, so every
      // message routed there fails with LEADER_NOT_AVAILABLE (the
      // per-partition failure class real delivery reports surface);
      // the rest deliver with consecutive fresh-topic offsets, so the
      // high-water mark is n_delivered - 1. The frames ride the REAL
      // produce path (CsvProducer: config-shaped rows, registry-
      // assigned schema id, CP1 framing) — a produce bug that drops or
      // duplicates messages shifts the counts and fails the oracle,
      // which computes the same report straight from the source table
      // (the csv_ingest lossless discipline, applied to the ack side).
      "produce_delivery_report",
      (s, dir) => {
        val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_csvdr_" +
          s"${dir.replaceAll("[^A-Za-z0-9._-]", "_")}_${s.sparkContext.applicationId}"
        registerCleanup(tmp)
        Tables(s, dir).events
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
          .coalesce(1)
          .write.option("header", "true").mode("overwrite").csv(s"$tmp/events_csv")
        val cfg = PipelineConfig.parseYaml(ConfigYaml)
        val framed = CsvProducer.produce(s, s"$tmp/events_csv", cfg, Topic,
          new SchemaRegistry)
        val nParts = 8L
        val offline = 7
        framed
          .withColumn("partition",
            pmod(col("key").cast("long"), lit(nParts)).cast("int"))
          .withColumn("delivered",
            (col("partition") =!= lit(offline)).cast("long"))
          // the produced VALUE is load-bearing: a null/empty frame is a
          // serializer failure, not a broker ack — it must not count
          .filter(col("value").isNotNull && length(col("value")) > 5)
          .groupBy(col("partition"))
          .agg(
            count(lit(1)).as("n_produced"),
            sum(col("delivered")).as("n_delivered"),
            sum(lit(1L) - col("delivered")).as("n_failed"),
            (sum(col("delivered")) - lit(1L)).as("max_offset"),
            countDistinct(col("key")).as("n_keys"))
          .withColumn("err_reason",
            when(col("partition") === lit(offline), "LEADER_NOT_AVAILABLE")
              .otherwise(lit("NONE")))
          .orderBy(col("partition"))
      },
      Some("""WITH m AS (
        SELECT CAST(user_id % 8 AS INT) AS partition,
          CAST(user_id AS VARCHAR) AS key,
          CASE WHEN user_id % 8 = 7 THEN 0 ELSE 1 END AS delivered
        FROM events)
      SELECT partition,
        COUNT(*) AS n_produced,
        CAST(SUM(delivered) AS BIGINT) AS n_delivered,
        CAST(COUNT(*) - SUM(delivered) AS BIGINT) AS n_failed,
        CAST(SUM(delivered) - 1 AS BIGINT) AS max_offset,
        COUNT(DISTINCT key) AS n_keys,
        CASE WHEN partition = 7 THEN 'LEADER_NOT_AVAILABLE' ELSE 'NONE' END AS err_reason
      FROM m GROUP BY partition ORDER BY partition""")
    ),

    QueryDef(
      // the reference's async logging stage (LogProcessor + daily
      // FileLogger: `src/logging/LogProcessor.cpp`, log format
      // `YYYY/MM/DD HH:MM:SS.ffffff [LEVEL] [Component] Message: {json}`
      // as in logs/flycatcher_*.log) re-expressed set-oriented: FORMAT
      // each consumed message's log line, then PARSE the lines back with
      // regexp_extract and aggregate per (level, component) with the
      // daily-file count — all codegen'd string expressions, round-trip
      // checked against the oracle building the same lines in SQL.
      "log_pipeline",
      (s, dir) => {
        val ev = Tables(s, dir).events
        val lines = ev.select(concat(
          date_format(col("ts"), "yyyy/MM/dd HH:mm:ss.SSSSSS"),
          lit(" ["),
          when(col("event_type") === "error", "ERROR").otherwise(lit("INFO")),
          lit("] ["),
          when(col("event_type") === "purchase", "Database")
            .otherwise(lit("KafkaConsumerCallback")),
          lit("] Message: {\"event_id\":"), col("event_id"),
          lit(",\"user_id\":"), col("user_id"),
          lit(",\"event_type\":\""), col("event_type"), lit("\"}")).as("line"))
        val re = "^(\\S+ \\S+) \\[(\\w+)\\] \\[(\\w+)\\] Message: (.*)$"
        val parsed = lines.select(
          regexp_extract(col("line"), re, 1).as("ts_str"),
          regexp_extract(col("line"), re, 2).as("level"),
          regexp_extract(col("line"), re, 3).as("component"),
          regexp_extract(col("line"), re, 4).as("message"))
        parsed
          .groupBy(col("level"), col("component"))
          .agg(
            count(lit(1)).as("n_lines"),
            countDistinct(substring(col("ts_str"), 1, 10)).as("n_log_days"),
            sum(length(col("message")).cast("long")).as("total_msg_chars"))
          .orderBy(col("level"), col("component"))
      },
      Some("""WITH lines AS (
        SELECT strftime(CAST(ts AS TIMESTAMP), '%Y/%m/%d %H:%M:%S.%f') || ' [' ||
          CASE WHEN event_type = 'error' THEN 'ERROR' ELSE 'INFO' END || '] [' ||
          CASE WHEN event_type = 'purchase' THEN 'Database' ELSE 'KafkaConsumerCallback' END ||
          '] Message: {"event_id":' || event_id || ',"user_id":' || user_id ||
          ',"event_type":"' || event_type || '"}' AS line
        FROM events),
      parsed AS (
        SELECT regexp_extract(line, '^(\S+ \S+) \[(\w+)\] \[(\w+)\] Message: (.*)$', 1) AS ts_str,
               regexp_extract(line, '^(\S+ \S+) \[(\w+)\] \[(\w+)\] Message: (.*)$', 2) AS level,
               regexp_extract(line, '^(\S+ \S+) \[(\w+)\] \[(\w+)\] Message: (.*)$', 3) AS component,
               regexp_extract(line, '^(\S+ \S+) \[(\w+)\] \[(\w+)\] Message: (.*)$', 4) AS message
        FROM lines)
      SELECT level, component, COUNT(*) AS n_lines,
        COUNT(DISTINCT substring(ts_str, 1, 10)) AS n_log_days,
        CAST(SUM(length(message)) AS BIGINT) AS total_msg_chars
      FROM parsed GROUP BY level, component ORDER BY level, component""")
    ),

    QueryDef(
      // the logging tier's LEVEL_CUTOFF + variant-shared line format
      // (graft.logging.Loggers — Logging.h:41-58's compile-time level
      // filter, create_log's shared format, Factory's type dispatch;
      // the StdOut/Spd "daily" variants' differentiating behaviors are
      // sink-shaped and spec-gated in LoggersSpec). Each event maps to
      // a level, the default INFO cutoff drops TRACE/DEBUG BEFORE
      // formatting, and the report aggregates per level: events seen,
      // lines logged, distinct daily files the daily sink would rotate
      // through, and the logged lines' total characters — the last
      // makes the FORMAT load-bearing (a drifted create_log changes
      // line lengths and fails the oracle, which rebuilds the same
      // lines in SQL).
      "log_level_cutoff",
      (s, dir) => {
        import graft.logging.Loggers
        val ev = Tables(s, dir).events
        val level = when(col("event_type") === "error", "ERROR")
          .when(col("event_type") === "purchase", "WARN")
          .when(col("event_type") === "signup", "INFO")
          .when(col("event_type") === "view", "DEBUG")
          .otherwise("TRACE")
        val component = when(col("event_type") === "purchase", "Database")
          .otherwise(lit("KafkaConsumerCallback"))
        val withLine = ev
          .withColumn("level", level)
          .withColumn("line", Loggers.createLog(col("ts"), col("level"),
            component, concat(lit("event_id="), col("event_id").cast("string"))))
          .withColumn("kept", Loggers.atOrAbove(col("level")).cast("long"))
        withLine.groupBy(col("level"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(col("kept")).as("n_logged"),
            countDistinct(
              when(col("kept") === 1L, substring(col("line"), 1, 10)))
              .as("n_log_days"),
            sum(when(col("kept") === 1L, length(col("line")).cast("long"))
              .otherwise(0L)).as("logged_chars"))
          .orderBy(col("level"))
      },
      Some("""WITH lv AS (
        SELECT event_id, event_type, ts,
          CASE event_type WHEN 'error' THEN 'ERROR' WHEN 'purchase' THEN 'WARN'
            WHEN 'signup' THEN 'INFO' WHEN 'view' THEN 'DEBUG'
            ELSE 'TRACE' END AS level
        FROM events),
      lines AS (
        SELECT level,
          CASE WHEN level IN ('INFO', 'WARN', 'ERROR') THEN 1 ELSE 0 END AS kept,
          strftime(CAST(ts AS TIMESTAMP), '%Y/%m/%d %H:%M:%S.%f') || ' [' ||
            level || '] [' ||
            CASE WHEN event_type = 'purchase' THEN 'Database'
              ELSE 'KafkaConsumerCallback' END ||
            '] event_id=' || event_id AS line
        FROM lv)
      SELECT level, COUNT(*) AS n_events,
        CAST(SUM(kept) AS BIGINT) AS n_logged,
        COUNT(DISTINCT CASE WHEN kept = 1 THEN substring(line, 1, 10) END) AS n_log_days,
        CAST(SUM(CASE WHEN kept = 1 THEN length(line) ELSE 0 END) AS BIGINT) AS logged_chars
      FROM lines GROUP BY level ORDER BY level""")
    ),

    QueryDef(
      "config_transform",
      (s, dir) => {
        val cfg = PipelineConfig.parseYaml(ConfigYaml)
        val decoded = AvroCodec.decode(topicLog(s, dir), "value", EventsSchemaJson)
          .filter(col("err").isNull)
        cfg.applyTransforms(decoded, Topic)
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n_msgs"),
            Exact.dsum(col("amount")).as("total_amount"),
            countDistinct(col("uid")).as("n_uids"))
          .orderBy(col("event_type"))
      },
      Some(s"""SELECT event_type, COUNT(*) AS n_msgs,
        ${Exact.sqlSum("value")} AS total_amount,
        COUNT(DISTINCT user_id) AS n_uids
      FROM events GROUP BY event_type ORDER BY event_type""")
    )
  )
}
