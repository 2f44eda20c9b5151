package graft.config

import graft.avro.AvroQueries
import org.scalatest.funsuite.AnyFunSuite

class PipelineConfigSpec extends AnyFunSuite {

  test("parses the reference-shaped YAML config") {
    val cfg = PipelineConfig.parseYaml(AvroQueries.ConfigYaml)
    assert(cfg.kafka("bootstrap.servers") == "localhost:9092")
    assert(cfg.kafka("client.id") == "graft-consumer")
    assert(cfg.kafka("schema.registry.url") == "mem://local")
    assert(cfg.columnMap == Map("user_id" -> "uid", "value" -> "amount"))
    val sc = cfg.schemas("events")
    assert(sc.keyColumn == "user_id")
    assert(sc.columns == Seq("event_id", "user_id", "event_type", "value"))
    assert(sc.avroType("value") == "double")
    assert(sc.avroType("event_type") == "string") // default
    assert(sc.mappedName("user_id") == "uid")
  }

  test("assembles the avro schema like the reference's assemble_schema") {
    val cfg = PipelineConfig.parseYaml(AvroQueries.ConfigYaml)
    val json = cfg.schemas("events").avroSchemaJson
    assert(json.contains(""""name":"events_msg""""))
    assert(json.contains(""""name":"uid","type":"long""""))
    assert(json.contains(""""name":"amount","type":"double""""))
    assert(json.contains(""""name":"event_type","type":"string""""))
  }

  test("rejects configs missing key_column or columns") {
    val noKey =
      """type_map:
        |  t:
        |    columns:
        |      - a
        |""".stripMargin
    assertThrows[IllegalArgumentException](PipelineConfig.parseYaml(noKey))
    val noCols =
      """type_map:
        |  t:
        |    key_column: a
        |""".stripMargin
    assertThrows[IllegalArgumentException](PipelineConfig.parseYaml(noCols))
    assertThrows[IllegalArgumentException](PipelineConfig.parseYaml("kafka:\n  a: b\n"))
  }
}
