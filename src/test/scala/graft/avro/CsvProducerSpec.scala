package graft.avro

import graft.SparkFixture
import graft.config.PipelineConfig
import org.scalatest.funsuite.AnyFunSuite

class CsvProducerSpec extends AnyFunSuite with SparkFixture {

  test("CSV -> config schema -> framed Avro -> decode roundtrip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv")
    val csv = dir.resolve("spo.csv")
    java.nio.file.Files.writeString(csv,
      """subject,predicate,object
        |Don Vito,Email,donvito@example.com
        |Don Vito,Underboss,Underboss Marco
        |Capo Salvatore,Cybercrime,2010
        |""".stripMargin)
    val yaml =
      """kafka:
        |  bootstrap.servers: localhost:9092
        |type_map:
        |  spo:
        |    key_column: subject
        |    columns:
        |      - subject
        |      - predicate
        |      - object
        |""".stripMargin
    val cfg = PipelineConfig.parseYaml(yaml)
    val registry = new SchemaRegistry
    val produced = CsvProducer.produce(spark, csv.toString, cfg, "spo", registry)
    val (id, schemaJson) = registry.fetchValueSchema("spo").get
    assert(schemaJson.contains(""""name":"spo_msg""""))

    // consumer path: unframe + decode with the registry schema
    val decoded = AvroCodec.decode(produced, "value", schemaJson, passthrough = Seq("key"))
      .collect().sortBy(_.getString(1))
    assert(decoded.forall(_.getAs[String]("err") == null))
    assert(decoded.map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSeq ==
      Seq(
        ("Capo Salvatore", "Capo Salvatore", "Cybercrime", "2010"),
        ("Don Vito", "Don Vito", "Email", "donvito@example.com"),
        ("Don Vito", "Don Vito", "Underboss", "Underboss Marco")))

    // frames carry the registry-assigned id
    val frame = produced.collect().head.getAs[Array[Byte]]("value")
    ConfluentFraming.unframe(frame) match {
      case ConfluentFraming.Framed(fid, _, _, _) => assert(fid == id)
      case other => fail(s"expected Framed, got $other")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
