package graft.avro

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro <-> Spark codec built directly on avro-java (the same library
  * family the reference uses through libserdes;
  * `src/KafkaConsumerCallback.cpp:70-116`).
  *
  * Spark-side shape: encode/decode run in `mapPartitions` with ONE
  * reader/writer + reused decoder/encoder/record per partition — the
  * per-record cost is pure (de)serialization, no allocation churn, and
  * the operation is embarrassingly parallel across a 1000-executor
  * cluster. mapPartitions (not a per-row UDF) is deliberate: an opaque
  * binary codec can't be expressed as a Catalyst expression tree, and
  * partition-level reuse is the fastest JVM shape for it.
  */
object AvroCodec {

  /** Avro record schema -> Spark StructType (types the reference's
    * `assemble_schema` emits + nullable unions + boolean/bytes). */
  def toStructType(schemaJson: String): StructType = {
    val schema = new Schema.Parser().parse(schemaJson)
    require(schema.getType == Schema.Type.RECORD, s"not a record schema: $schemaJson")
    StructType(schema.getFields.asScala.map { f =>
      val (dt, nullable) = fieldType(f.schema())
      StructField(f.name(), dt, nullable)
    }.toArray)
  }

  private def fieldType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.INT => (IntegerType, false)
    case Schema.Type.LONG => (LongType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.BYTES => (BinaryType, false)
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"unsupported union: $s")
      (fieldType(nonNull.head)._1, true)
    case other => throw new IllegalArgumentException(s"unsupported avro type: $other")
  }

  /** Build the Avro record schema JSON for (name, avroType) fields —
    * the mirror of the reference's config-driven `assemble_schema`
    * (`src/config/ConfigParser.cpp:137-166`). */
  def recordSchemaJson(name: String, fields: Seq[(String, String)]): String = {
    val fs = fields.map { case (n, t) => s"""{"name":"$n","type":"$t"}""" }.mkString(",")
    s"""{"type":"record","name":"$name","fields":[$fs]}"""
  }

  /** Encode selected columns of `df` into CP1-framed Confluent Avro
    * binary. Output schema: the passthrough columns + `value BINARY`.
    */
  def encode(df: DataFrame, schemaJson: String, schemaId: Int,
             passthrough: Seq[String] = Nil): DataFrame = {
    val avroFields = toStructType(schemaJson).fields.map(_.name).toSeq
    val inSchema = df.schema
    val fieldIdx = avroFields.map(inSchema.fieldIndex)
    val passIdx = passthrough.map(inSchema.fieldIndex)
    val outSchema = StructType(
      passthrough.map(inSchema(_)) :+ StructField("value", BinaryType, nullable = false))
    df.mapPartitions { iter =>
      val schema = new Schema.Parser().parse(schemaJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val out = new ByteArrayOutputStream(256)
      var encoder: BinaryEncoder = null
      val rec = new GenericData.Record(schema)
      iter.map { row =>
        out.reset()
        encoder = EncoderFactory.get().binaryEncoder(out, encoder)
        var i = 0
        while (i < fieldIdx.length) {
          rec.put(i, row.get(fieldIdx(i)) match {
            // avro-java represents BYTES as ByteBuffer; Spark rows carry Array[Byte]
            case a: Array[Byte] => java.nio.ByteBuffer.wrap(a)
            case v => v
          })
          i += 1
        }
        writer.write(rec, encoder)
        encoder.flush()
        val framed = ConfluentFraming.frame(schemaId, out.toByteArray)
        Row.fromSeq(passIdx.map(row.get) :+ framed)
      }
    }(Encoders.row(outSchema))
  }

  /** Decode a CP1-framed binary column into typed columns + an `err`
    * column (`null` on success; the reference counts these failures,
    * `src/main.cpp:247-251`). Passthrough columns are preserved.
    */
  def decode(df: DataFrame, valueCol: String, schemaJson: String,
             passthrough: Seq[String] = Nil): DataFrame = {
    val structType = toStructType(schemaJson)
    val inSchema = df.schema
    val valIdx = inSchema.fieldIndex(valueCol)
    val passIdx = passthrough.map(inSchema.fieldIndex)
    val outSchema = StructType(
      passthrough.map(inSchema(_)) ++
        structType.fields.map(_.copy(nullable = true)) :+
        StructField("err", StringType, nullable = true))
    val nFields = structType.fields.length
    df.mapPartitions { iter =>
      val schema = new Schema.Parser().parse(schemaJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      var decoder: BinaryDecoder = null
      var rec: GenericRecord = null
      iter.map { row =>
        val pass = passIdx.map(row.get)
        val bytes = row.getAs[Array[Byte]](valIdx)
        ConfluentFraming.unframe(bytes) match {
          case ConfluentFraming.Framed(_, b, off, len) =>
            try {
              decoder = DecoderFactory.get().binaryDecoder(b, off, len, decoder)
              rec = reader.read(rec, decoder)
              val vals = (0 until nFields).map { i =>
                rec.get(i) match {
                  case u: Utf8 => u.toString
                  case bb: java.nio.ByteBuffer =>
                    // avro-java returns ByteBuffer for BYTES; Spark needs
                    // Array[Byte] for BinaryType (copy — the record and its
                    // buffers are reused across rows)
                    val arr = new Array[Byte](bb.remaining())
                    bb.duplicate().get(arr)
                    arr
                  case v => v
                }
              }
              Row.fromSeq(pass ++ vals :+ null)
            } catch {
              case e: Exception =>
                Row.fromSeq(pass ++ Seq.fill[Any](nFields)(null) :+ s"decode_error:${e.getClass.getSimpleName}")
            }
          case ConfluentFraming.BadMagic =>
            Row.fromSeq(pass ++ Seq.fill[Any](nFields)(null) :+ "bad_magic")
          case ConfluentFraming.Truncated =>
            Row.fromSeq(pass ++ Seq.fill[Any](nFields)(null) :+ "truncated")
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Schema-evolution decode: each CP1 frame's id selects its WRITER
    * schema from `writerSchemas` (a registry snapshot — driver-fetched,
    * shipped with the closure, never a per-record network call), and all
    * records are resolved to the single `readerSchemaJson` via standard
    * Avro schema resolution: reader-added fields fill from defaults,
    * reader-dropped fields are skipped. Output schema is the READER's.
    * Frames with an id the snapshot doesn't know decode to
    * `err = unknown_schema_id:<id>` — the same per-error-class counting
    * discipline as the reference's consume loop.
    */
  def decodeMulti(df: DataFrame, valueCol: String,
                  writerSchemas: Map[Int, String], readerSchemaJson: String,
                  passthrough: Seq[String] = Nil): DataFrame = {
    val structType = toStructType(readerSchemaJson)
    val inSchema = df.schema
    val valIdx = inSchema.fieldIndex(valueCol)
    val passIdx = passthrough.map(inSchema.fieldIndex)
    val outSchema = StructType(
      passthrough.map(inSchema(_)) ++
        structType.fields.map(_.copy(nullable = true)) :+
        StructField("err", StringType, nullable = true))
    val nFields = structType.fields.length
    df.mapPartitions { iter =>
      val readerSchema = new Schema.Parser().parse(readerSchemaJson)
      // one resolving reader per writer id, built lazily per partition
      val readers = scala.collection.mutable.Map.empty[Int, GenericDatumReader[GenericRecord]]
      var decoder: BinaryDecoder = null
      var rec: GenericRecord = null
      iter.map { row =>
        val pass = passIdx.map(row.get)
        val bytes = row.getAs[Array[Byte]](valIdx)
        ConfluentFraming.unframe(bytes) match {
          case ConfluentFraming.Framed(id, b, off, len) =>
            writerSchemas.get(id) match {
              case None =>
                Row.fromSeq(pass ++ Seq.fill[Any](nFields)(null) :+ s"unknown_schema_id:$id")
              case Some(writerJson) =>
                try {
                  val reader = readers.getOrElseUpdate(id,
                    new GenericDatumReader[GenericRecord](
                      new Schema.Parser().parse(writerJson), readerSchema))
                  decoder = DecoderFactory.get().binaryDecoder(b, off, len, decoder)
                  rec = reader.read(rec, decoder)
                  val vals = (0 until nFields).map { i =>
                    rec.get(i) match {
                      case u: Utf8 => u.toString
                      case bb: java.nio.ByteBuffer =>
                        val arr = new Array[Byte](bb.remaining())
                        bb.duplicate().get(arr)
                        arr
                      case v => v
                    }
                  }
                  Row.fromSeq(pass ++ vals :+ null)
                } catch {
                  case e: Exception =>
                    Row.fromSeq(pass ++ Seq.fill[Any](nFields)(null) :+ s"decode_error:${e.getClass.getSimpleName}")
                }
            }
          case ConfluentFraming.BadMagic =>
            Row.fromSeq(pass ++ Seq.fill[Any](nFields)(null) :+ "bad_magic")
          case ConfluentFraming.Truncated =>
            Row.fromSeq(pass ++ Seq.fill[Any](nFields)(null) :+ "truncated")
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Avro binary -> canonical Avro JSON (mirror of `avro2json`,
    * `src/KafkaConsumerCallback.cpp:42-68`), emitted as a `json` string
    * column next to the decoded fields.
    *
    * Hot-path note: avro-java's `jsonEncoder` regenerates the full JSON
    * grammar on EVERY construction and cannot be re-targeted at a new
    * stream, so the generic path pays that per row. For flat records of
    * string/int/long/boolean fields (the reference's SPO shape) we emit
    * the identical canonical JSON from a reused StringBuilder with
    * Jackson-equivalent string escaping — same bytes, none of the
    * per-row grammar work.
    */
  def decodeToJson(df: DataFrame, valueCol: String, schemaJson: String,
                   passthrough: Seq[String] = Nil): DataFrame = {
    val inSchema = df.schema
    val valIdx = inSchema.fieldIndex(valueCol)
    val passIdx = passthrough.map(inSchema.fieldIndex)
    val outSchema = StructType(
      passthrough.map(inSchema(_)) :+ StructField("json", StringType, nullable = true))
    val parsed = new Schema.Parser().parse(schemaJson)
    val fastPath = parsed.getType == Schema.Type.RECORD &&
      parsed.getFields.asScala.forall { f =>
        f.schema().getType match {
          case Schema.Type.STRING | Schema.Type.INT | Schema.Type.LONG |
               Schema.Type.BOOLEAN => true
          case _ => false
        }
      }
    df.mapPartitions { iter =>
      val schema = new Schema.Parser().parse(schemaJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val fieldNames = schema.getFields.asScala.map(_.name()).toArray
      val isString = schema.getFields.asScala
        .map(_.schema().getType == Schema.Type.STRING).toArray
      var decoder: BinaryDecoder = null
      var rec: GenericRecord = null
      val sb = new java.lang.StringBuilder(256)
      iter.map { row =>
        val pass = passIdx.map(row.get)
        val bytes = row.getAs[Array[Byte]](valIdx)
        ConfluentFraming.unframe(bytes) match {
          case ConfluentFraming.Framed(_, b, off, len) =>
            try {
              decoder = DecoderFactory.get().binaryDecoder(b, off, len, decoder)
              rec = reader.read(rec, decoder)
              val json =
                if (fastPath) {
                  sb.setLength(0)
                  sb.append('{')
                  var i = 0
                  while (i < fieldNames.length) {
                    if (i > 0) sb.append(',')
                    sb.append('"').append(fieldNames(i)).append("\":")
                    if (isString(i)) appendJsonString(sb, rec.get(i).toString)
                    else sb.append(rec.get(i))
                    i += 1
                  }
                  sb.append('}')
                  sb.toString
                } else {
                  val out = new ByteArrayOutputStream(256)
                  val jsonEnc = EncoderFactory.get().jsonEncoder(schema, out)
                  writer.write(rec, jsonEnc)
                  jsonEnc.flush()
                  out.toString("UTF-8")
                }
              Row.fromSeq(pass :+ json)
            } catch {
              case _: Exception => Row.fromSeq(pass :+ null)
            }
          case _ => Row.fromSeq(pass :+ null)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Append `s` as a JSON string literal with Jackson-default escaping
    * (what avro's jsonEncoder emits): `"`, `\`, and control chars; the
    * common controls as short escapes, the rest as `\u00XX`. */
  private def appendJsonString(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\f' => sb.append("\\f")
        case '\r' => sb.append("\\r")
        case _ if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }
}
