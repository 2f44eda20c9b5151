package graft.avro

import graft.SparkFixture
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class AvroCodecSpec extends AnyFunSuite with SparkFixture {

  test("CP1 framing roundtrips and classifies errors") {
    val body = Array[Byte](1, 2, 3, 4, 5)
    val framed = ConfluentFraming.frame(123456, body)
    assert(framed.length == body.length + 5)
    ConfluentFraming.unframe(framed) match {
      case ConfluentFraming.Framed(id, b, off, len) =>
        assert(id == 123456)
        assert(java.util.Arrays.copyOfRange(b, off, off + len).sameElements(body))
      case other => fail(s"expected Framed, got $other")
    }
    framed(0) = 1
    assert(ConfluentFraming.unframe(framed) == ConfluentFraming.BadMagic)
    assert(ConfluentFraming.unframe(Array[Byte](0, 1)) == ConfluentFraming.Truncated)
    assert(ConfluentFraming.unframe(null) == ConfluentFraming.Truncated)
  }

  test("schema registry follows {topic}-value subject semantics") {
    val r = new SchemaRegistry
    val id = r.register("spo-value", AvroQueries.SpoSchemaJson)
    assert(r.register("spo-value", AvroQueries.SpoSchemaJson) == id) // idempotent
    assert(r.fetchValueSchema("spo").contains((id, AvroQueries.SpoSchemaJson)))
    assert(r.fetchValueSchema("nope").isEmpty)
    assert(r.fetchById(id).contains(AvroQueries.SpoSchemaJson))
  }

  test("avro schema -> StructType covers the reference's type menu") {
    val json = AvroCodec.recordSchemaJson("m", Seq(
      "s" -> "string", "i" -> "int", "l" -> "long", "f" -> "float", "d" -> "double"))
    assert(AvroCodec.toStructType(json) == StructType(Seq(
      StructField("s", StringType, nullable = false),
      StructField("i", IntegerType, nullable = false),
      StructField("l", LongType, nullable = false),
      StructField("f", FloatType, nullable = false),
      StructField("d", DoubleType, nullable = false))))
  }

  test("encode -> decode roundtrips values exactly (incl. doubles)") {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType), StructField("c", DoubleType)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, "x", 1.5), Row(2L, "y", math.Pi), Row(3L, "z", -0.0)),
      schema)
    val json = AvroCodec.recordSchemaJson("m", Seq("a" -> "long", "b" -> "string", "c" -> "double"))
    val encoded = AvroCodec.encode(df, json, 7)
    val decoded = AvroCodec.decode(encoded, "value", json).collect().sortBy(_.getLong(0))
    assert(decoded.forall(_.getAs[String]("err") == null))
    assert(decoded.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "x", 1.5), (2L, "y", math.Pi), (3L, "z", -0.0)))
  }

  test("encode -> decode roundtrips bytes fields (ByteBuffer <-> Array[Byte])") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType)))
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(1L, Array[Byte](0, 1, 2, -1)),
        Row(2L, Array.emptyByteArray),
        Row(3L, Array[Byte](127, -128))),
      schema)
    val json = AvroCodec.recordSchemaJson("m", Seq("id" -> "long", "payload" -> "bytes"))
    val decoded = AvroCodec.decode(AvroCodec.encode(df, json, 9), "value", json)
      .collect().sortBy(_.getLong(0))
    assert(decoded.forall(_.getAs[String]("err") == null))
    assert(decoded.map(r => (r.getLong(0), r.getAs[Array[Byte]]("payload").toSeq)) ===
      Array((1L, Seq[Byte](0, 1, 2, -1)), (2L, Seq.empty[Byte]), (3L, Seq[Byte](127, -128))))
  }

  test("decodeToJson emits canonical Avro JSON") {
    val schema = StructType(Seq(StructField("subject", StringType),
      StructField("predicate", StringType), StructField("object", StringType)))
    val df = spark.createDataFrame(
      java.util.List.of(Row("Don Vito", "Email", "donvito@example.com")), schema)
    val encoded = AvroCodec.encode(df, AvroQueries.SpoSchemaJson, 2)
    val json = AvroCodec.decodeToJson(encoded, "value", AvroQueries.SpoSchemaJson)
      .collect().head.getString(0)
    assert(json == """{"subject":"Don Vito","predicate":"Email","object":"donvito@example.com"}""")
  }

  test("decodeToJson fast path escapes like the avro jsonEncoder") {
    val schema = StructType(Seq(StructField("subject", StringType),
      StructField("predicate", StringType), StructField("object", StringType)))
    val df = spark.createDataFrame(
      java.util.List.of(Row("a\"b\\c", "x\ny\tz", "ctl\u0001end")), schema)
    val encoded = AvroCodec.encode(df, AvroQueries.SpoSchemaJson, 2)
    val json = AvroCodec.decodeToJson(encoded, "value", AvroQueries.SpoSchemaJson)
      .collect().head.getString(0)
    assert(json == "{\"subject\":\"a\\\"b\\\\c\",\"predicate\":\"x\\ny\\tz\",\"object\":\"ctl\\u0001end\"}")
  }
}
