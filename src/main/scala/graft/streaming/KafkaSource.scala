package graft.streaming

import graft.config.PipelineConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kafka source adapter: the reference's consumer wiring
  * (`/root/reference/src/main.cpp:238-258` poll loop,
  * `/root/reference/src/KafkaPoller.cpp`) as a Structured Streaming
  * source feeding the SAME decode path the file-source stand-in uses.
  *
  * The sandbox has no broker and no kafka connector jar, so this module
  * is compile-complete and spec-proven up to the source lookup: config
  * mapping, wire-schema normalization, and decode identity are tested;
  * `open()` itself needs `spark-sql-kafka` on the classpath at runtime
  * (standard on any real cluster distro).
  */
object KafkaSource {

  /** Spark consumer options from the reference's `kafka:` config block
    * (`configs/SPO_2_kafka.yaml`): librdkafka properties map to
    * `kafka.`-prefixed datasource options; `schema.registry.url` is NOT
    * a consumer property (libserdes reads it) and is routed to
    * [[registryFromConfig]] instead.
    */
  def kafkaOptions(cfg: PipelineConfig): Map[String, String] =
    cfg.kafka.collect {
      case (k, v) if k != "schema.registry.url" => s"kafka.$k" -> v
    }

  /** The registry client the config points at — the Spark placement of
    * the reference's `SchemaRegistry::init(config.schema_registry_url)`:
    * constructed driver-side, snapshotted, broadcast. */
  def registryFromConfig(cfg: PipelineConfig): Option[graft.avro.RegistryClient] =
    cfg.kafka.get("schema.registry.url").map(url => new graft.avro.HttpSchemaRegistry(url))

  /** `readStream.format("kafka")` with the config's consumer options.
    * `startingOffsets=earliest` mirrors the reference's
    * `OFFSET_BEGINNING` start. */
  def open(spark: SparkSession, cfg: PipelineConfig, topic: String,
           startingOffsets: String = "earliest"): DataFrame =
    spark.readStream
      .format("kafka")
      .options(kafkaOptions(cfg))
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()

  /** Normalize a Kafka wire DataFrame (the connector's fixed schema:
    * key/value binary, topic, partition, offset, ...) to the shared
    * frame shape the file stand-in produces (`AvroQueries.topicLog`), so
    * one decode path serves both sources. */
  def normalizeWire(wire: DataFrame): DataFrame =
    wire.select(col("key"), col("value"), col("topic"),
      col("partition"), col("offset").as("msg_offset"))

  /** Wire rows → decoded rows via the SAME batch/streaming codec
    * (`AvroStream.decode` = `AvroCodec.decode`): CP1 unframe, schema-id
    * lookup, Avro decode, per-row error column. */
  def decode(wire: DataFrame, schemaJson: String): DataFrame =
    AvroStream.decode(normalizeWire(wire), "value", schemaJson,
      passthrough = Seq("key", "topic", "partition", "msg_offset"))
}

/** The reference's consumer-level (transport) error taxonomy —
  * `KafkaConsumerCallback::consume_message`'s switch
  * (`/root/reference/src/KafkaConsumerCallback.cpp:13-38`) — mapped to
  * Structured Streaming, where transport errors surface as stream
  * exceptions rather than per-message statuses. Deserialization-level
  * errors (bad magic / truncated / unknown schema id / decode failure)
  * are per-row `err` values from `AvroCodec.decode` and are NOT handled
  * here, exactly as the reference splits the two layers.
  */
object ConsumerErrors {

  sealed trait ConsumeAction
  /** Benign: keep polling (reference: ERR__TIMED_OUT, and
    * ERR__PARTITION_EOF when exit_eof is unset). */
  case object Continue extends ConsumeAction
  /** Clean end of input (ERR__PARTITION_EOF with exit_eof). */
  case object StopAtEof extends ConsumeAction
  /** Fatal: surface and stop (ERR__UNKNOWN_TOPIC/PARTITION, default). */
  case object Fail extends ConsumeAction

  /** librdkafka error-code names → action, the reference switch verbatim. */
  def classify(errName: String, exitEof: Boolean = false): ConsumeAction =
    errName match {
      case "TIMED_OUT" => Continue
      case "PARTITION_EOF" => if (exitEof) StopAtEof else Continue
      case "UNKNOWN_TOPIC" | "UNKNOWN_PARTITION" => Fail
      case _ => Fail
    }

  /** Streaming-side classification: map a failed stream's exception
    * chain onto the same taxonomy. Matched by class name so the module
    * compiles without kafka-clients on the classpath. */
  def classifyThrowable(t: Throwable, exitEof: Boolean = false): ConsumeAction = {
    val names = Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
      .map(_.getClass.getName).toSeq
    if (names.exists(_.contains("TimeoutException"))) classify("TIMED_OUT", exitEof)
    else if (names.exists(_.contains("UnknownTopicOrPartitionException"))) classify("UNKNOWN_TOPIC", exitEof)
    else Fail
  }
}
