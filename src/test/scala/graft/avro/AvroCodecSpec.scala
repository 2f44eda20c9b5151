package graft.avro

import graft.SparkFixture
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

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

  test("schema registry versions subjects; latest wins for the topic") {
    val r = new SchemaRegistry
    val v1 = r.register("events-value", AvroQueries.EventsSchemaJson)
    val v2 = r.register("events-value", AvroQueries.EventsSchemaV2Json)
    assert(v2 != v1)
    assert(r.fetchValueSchema("events").contains((v2, AvroQueries.EventsSchemaV2Json)))
    assert(r.fetchById(v1).contains(AvroQueries.EventsSchemaJson))
    assert(r.snapshot == Map(v1 -> AvroQueries.EventsSchemaJson, v2 -> AvroQueries.EventsSchemaV2Json))
  }

  test("logical types roundtrip: decimal scale/sign, epoch dates, micros timestamps") {
    val schemaJson = AvroCodec.recordSchemaJson("lt", Seq(
      "id" -> "long",
      "d" -> """{"type":"int","logicalType":"date"}""",
      "t" -> """{"type":"long","logicalType":"timestamp-micros"}""",
      "m" -> """{"type":"bytes","logicalType":"decimal","precision":18,"scale":4}"""))
    assert(AvroCodec.toStructType(schemaJson) == StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("d", DateType, nullable = false),
      StructField("t", TimestampType, nullable = false),
      StructField("m", DecimalType(18, 4), nullable = false))))
    def ts(us: Long) = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    val rows = Seq(
      Row(1L, java.sql.Date.valueOf("2024-02-29"), ts(1704067200123456L),
        new java.math.BigDecimal("12345.6789")),
      // negative decimal (two's-complement unscaled bytes) + pre-epoch date
      Row(2L, java.sql.Date.valueOf("1969-12-25"), ts(-42L),
        new java.math.BigDecimal("-0.0001")),
      Row(3L, java.sql.Date.valueOf("1970-01-01"), ts(0L),
        new java.math.BigDecimal("0.0000")))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](rows.asJava), AvroCodec.toStructType(schemaJson))
    val back = AvroCodec.decode(
        AvroCodec.encode(df, schemaJson, 7), "value", schemaJson)
      .orderBy("id").collect()
    assert(back.forall(_.getAs[String]("err") == null))
    assert(back.map(r => (r.getLong(0), r.getDate(1).toString,
        r.getTimestamp(2).getTime * 1000 + r.getTimestamp(2).getNanos / 1000 % 1000,
        r.getDecimal(3).toPlainString)).toSeq ==
      rows.map(r => (r.getLong(0), r.getDate(1).toString,
        r.getTimestamp(2).getTime * 1000 + r.getTimestamp(2).getNanos / 1000 % 1000,
        r.getDecimal(3).toPlainString)))
  }

  test("logical-type-adding evolution fills the zero-decimal default") {
    val v1 = AvroQueries.EventsLogicalV1Json
    val v2 = AvroQueries.EventsLogicalV2Json
    val v1Schema = AvroCodec.toStructType(v1)
    val row = Row(5L, java.sql.Date.valueOf("2024-01-02"),
      java.sql.Timestamp.valueOf("2024-01-02 03:04:05.678901"))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](Seq(row).asJava), v1Schema)
    val out = AvroCodec.decodeMulti(
      AvroCodec.encode(df, v1, 1), "value", Map(1 -> v1, 2 -> v2), v2).collect()
    assert(out.length == 1 && out.head.getAs[String]("err") == null)
    assert(out.head.getAs[java.math.BigDecimal]("amount").toPlainString == "0.0000")
    assert(out.head.getAs[java.sql.Date]("day").toString == "2024-01-02")
  }

  test("decodeMulti resolves per-frame writer schemas against the reader") {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("props", StringType)))
    val v1Rows = spark.createDataFrame(
      java.util.List.of(Row(2L, 7L, "view", 1.5, "{}")), schema)
    val v2Schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("source", StringType)))
    val v2Rows = spark.createDataFrame(
      java.util.List.of(Row(3L, 8L, "click", 2.5, "src_0")), v2Schema)
    val r = new SchemaRegistry
    val v1Id = r.register("events-value", AvroQueries.EventsSchemaJson)
    val v2Id = r.register("events-value", AvroQueries.EventsSchemaV2Json)
    val enc = AvroCodec.encode(v1Rows, AvroQueries.EventsSchemaJson, v1Id)
      .unionByName(AvroCodec.encode(v2Rows, AvroQueries.EventsSchemaV2Json, v2Id))
    val out = AvroCodec.decodeMulti(enc, "value", r.snapshot, AvroQueries.EventsSchemaV2Json)
      .collect().sortBy(_.getLong(0))
    assert(out.forall(_.getAs[String]("err") == null))
    // v1 message: source filled from the reader default (null), props dropped
    assert(out(0).getLong(0) == 2L && out(0).isNullAt(out(0).fieldIndex("source")))
    assert(out(1).getLong(0) == 3L && out(1).getAs[String]("source") == "src_0")
    assert(!out(0).schema.fieldNames.contains("props"))
    // unknown writer id -> classified error, not an exception
    val errs = AvroCodec.decodeMulti(enc, "value", Map(v1Id -> AvroQueries.EventsSchemaJson),
      AvroQueries.EventsSchemaV2Json)
      .select("err").collect().map(_.getString(0)).toSet
    assert(errs == Set(null, s"unknown_schema_id:$v2Id"))
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

  test("complex types roundtrip: enum, array, map, nested record, fixed, null unions") {
    // array elements and map values are nullable unions — the container
    // conversions must recurse through unwrapUnion on both paths
    val schemaJson =
      """{"type":"record","name":"cx","fields":[
        |{"name":"id","type":"long"},
        |{"name":"e","type":{"type":"enum","name":"E","symbols":["a","b","c"]}},
        |{"name":"arr","type":{"type":"array","items":["null","string"]}},
        |{"name":"m","type":{"type":"map","values":["null","long"]}},
        |{"name":"rec","type":{"type":"record","name":"Inner","fields":[
        |  {"name":"s","type":"string"},{"name":"x","type":"double"}]}},
        |{"name":"fx","type":{"type":"fixed","name":"F4","size":4}}]}""".stripMargin
    assert(AvroCodec.toStructType(schemaJson) == StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("e", StringType, nullable = false),
      StructField("arr", ArrayType(StringType, containsNull = true), nullable = false),
      StructField("m", MapType(StringType, LongType, valueContainsNull = true), nullable = false),
      StructField("rec", StructType(Seq(
        StructField("s", StringType, nullable = false),
        StructField("x", DoubleType, nullable = false))), nullable = false),
      StructField("fx", BinaryType, nullable = false))))
    val rows = Seq(
      Row(1L, "b", Seq("x", null, "y"), Map("k1" -> 7L, "k2" -> null),
        Row("inner", 2.5), Array[Byte](1, 2, 3, 4)),
      Row(2L, "a", Seq.empty[String], Map.empty[String, Long],
        Row("", -0.0), Array[Byte](-1, 0, 127, -128)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](rows.asJava), AvroCodec.toStructType(schemaJson))
    val back = AvroCodec.decode(
        AvroCodec.encode(df, schemaJson, 9), "value", schemaJson)
      .orderBy("id").collect()
    assert(back.forall(_.getAs[String]("err") == null))
    assert(back.map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2),
        r.getMap[String, Any](3), r.getStruct(4).toSeq,
        r.getAs[Array[Byte]](5).toSeq)).toSeq ==
      rows.map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2),
        scala.collection.Map(r.getMap[String, Any](3).toSeq: _*), r.getStruct(4).toSeq,
        r.getAs[Array[Byte]](5).toSeq)))
    // an unknown enum symbol on the encode path must fail loudly, not
    // silently write a wrong ordinal
    val bad = spark.createDataFrame(
      new java.util.ArrayList[Row](Seq(
        Row(3L, "zzz", Seq.empty[String], Map.empty[String, Long],
          Row("", 0.0), Array[Byte](0, 0, 0, 0))).asJava),
      AvroCodec.toStructType(schemaJson))
    val thrown = intercept[org.apache.spark.SparkException] {
      AvroCodec.encode(bad, schemaJson, 9).collect()
    }
    assert(thrown.getMessage != null)
  }
}
