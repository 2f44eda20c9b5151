package graft.avro

import graft.config.PipelineConfig
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's producer side: "Produces Avro encoded messages to
  * Kafka from CSV objects" (`src/main.cpp:101` usage text). CSV rows are
  * shaped by the YAML config (column order, renames, type transforms —
  * `ConfigParser::schema_configs`), serialized with the config-assembled
  * Avro schema, and CP1-framed with the registry-assigned schema id.
  */
object CsvProducer {

  /** Read a CSV and produce framed Avro messages for `topic`.
    * Output columns: `key` (the config's key_column, as string) and
    * `value` (CP1-framed Avro binary).
    */
  def produce(spark: SparkSession, csvPath: String, cfg: PipelineConfig,
              topic: String, registry: SchemaRegistry): DataFrame = {
    val sc = cfg.schemas(topic)
    val schemaJson = sc.avroSchemaJson
    val schemaId = registry.register(s"$topic-value", schemaJson)
    val raw = spark.read.option("header", "true").csv(csvPath)
    val shaped = cfg.applyTransforms(raw, topic)
      .withColumn("key", org.apache.spark.sql.functions.col(sc.mappedName(sc.keyColumn)).cast("string"))
    AvroCodec.encode(shaped, schemaJson, schemaId, passthrough = Seq("key"))
  }
}
