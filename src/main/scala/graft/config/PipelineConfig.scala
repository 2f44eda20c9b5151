package graft.config

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Plain-old-data schema configuration, mirroring the reference's
  * `SchemaConfig` (`src/config/SchemaConfig.h`): topic name, key column,
  * ordered column list, rename map, and type-transform map.
  */
final case class SchemaConfig(
    name: String,
    keyColumn: String,
    columns: Seq[String],
    columnMap: Map[String, String],
    columnTypeTransforms: Map[String, String]) {

  def mappedName(c: String): String = columnMap.getOrElse(c, c)

  /** float/double/int/long, default string — the exact type menu of the
    * reference's `assemble_schema` (`src/config/ConfigParser.cpp:150-163`). */
  def avroType(c: String): String = columnTypeTransforms.get(c) match {
    case Some("float") => "float"
    case Some("double") => "double"
    case Some("int") => "int"
    case Some("long") => "long"
    case _ => "string"
  }

  def avroSchemaJson: String =
    graft.avro.AvroCodec.recordSchemaJson(s"${name}_msg",
      columns.map(c => mappedName(c) -> avroType(c)))
}

/** Config-driven pipeline setup, mirroring `ConfigParser`
  * (`src/config/ConfigParser.cpp`): a YAML config with `kafka:`,
  * `type_map:` (topic -> key_column + columns), `column_map:` (renames)
  * and `column_type_transforms:` (casts).
  *
  * The parser below handles the YAML subset those configs use
  * (nested maps by indentation, `- ` list items, scalar `k: v`) with no
  * external dependency.
  */
final case class PipelineConfig(
    kafka: Map[String, String],
    columnMap: Map[String, String],
    columnTypeTransforms: Map[String, String],
    schemas: Map[String, SchemaConfig]) {

  /** Apply the config's renames + casts to a decoded DataFrame — the
    * declarative version of the reference's per-message column mapping.
    * Emits `columns` in order, renamed via `column_map`, cast via
    * `column_type_transforms`.
    */
  def applyTransforms(df: DataFrame, topic: String): DataFrame = {
    val sc = schemas(topic)
    val cols: Seq[Column] = sc.columns.map { c =>
      val target = sc.avroType(c)
      col(c).cast(target).as(sc.mappedName(c))
    }
    df.select(cols: _*)
  }
}

object PipelineConfig {

  /** Parse the YAML subset used by the reference's configs
    * (`configs/SPO_2_kafka.yaml` shape). */
  def parseYaml(text: String): PipelineConfig = {
    val root = YamlLite.parse(text)
    def strMap(k: String): Map[String, String] = root.get(k) match {
      case Some(m: Map[String @unchecked, Any @unchecked]) =>
        m.collect { case (kk, v: String) => kk -> v }
      case _ => Map.empty
    }
    val kafka = strMap("kafka")
    val cm = strMap("column_map")
    val ctt = strMap("column_type_transforms")
    val schemas: Map[String, SchemaConfig] = root.get("type_map") match {
      case Some(tm: Map[String @unchecked, Any @unchecked]) =>
        tm.collect { case (topic, v: Map[String @unchecked, Any @unchecked]) =>
          val keyCol = v.get("key_column").collect { case s: String => s }
            .getOrElse(throw new IllegalArgumentException(s"Missing key_column for topic '$topic'"))
          val columns = v.get("columns").collect { case l: List[Any @unchecked] => l.collect { case s: String => s } }
            .getOrElse(Nil)
          if (columns.isEmpty) throw new IllegalArgumentException(s"No columns found for topic '$topic'")
          topic -> SchemaConfig(topic, keyCol, columns, cm, ctt)
        }
      case _ => throw new IllegalArgumentException("No schema configuration found")
    }
    PipelineConfig(kafka, cm, ctt, schemas)
  }
}

/** Minimal indentation-based YAML-subset parser: nested maps, `- ` list
  * items, and scalar leaves. Enough for the reference's config files;
  * not a general YAML implementation.
  */
object YamlLite {

  def parse(text: String): Map[String, Any] = {
    val lines = text.linesIterator
      .map(_.replaceAll("#.*$", ""))
      .filter(_.trim.nonEmpty)
      .toVector
    parseBlock(lines, 0, 0, indentOf(lines.headOption.getOrElse("")))._1
  }

  private def indentOf(l: String): Int = l.takeWhile(_ == ' ').length

  /** Parse lines[from..) at exactly `indent`, returning (map, nextIdx). */
  private def parseBlock(lines: Vector[String], from: Int, depth: Int, indent: Int): (Map[String, Any], Int) = {
    var i = from
    val out = scala.collection.mutable.LinkedHashMap[String, Any]()
    while (i < lines.length && indentOf(lines(i)) >= indent) {
      val line = lines(i)
      if (indentOf(line) > indent) throw new IllegalArgumentException(s"bad indent: '$line'")
      val t = line.trim
      val colon = t.indexOf(':')
      require(colon > 0, s"expected 'key:' in '$t'")
      val key = t.substring(0, colon).trim
      val rest = t.substring(colon + 1).trim
      if (rest.nonEmpty) {
        out(key) = stripQuotes(rest)
        i += 1
      } else {
        // nested block: map or list
        if (i + 1 < lines.length && indentOf(lines(i + 1)) > indent) {
          val childIndent = indentOf(lines(i + 1))
          if (lines(i + 1).trim.startsWith("- ")) {
            var j = i + 1
            val items = scala.collection.mutable.ListBuffer[Any]()
            while (j < lines.length && indentOf(lines(j)) == childIndent &&
              lines(j).trim.startsWith("- ")) {
              items += stripQuotes(lines(j).trim.substring(2).trim)
              j += 1
            }
            out(key) = items.toList
            i = j
          } else {
            val (m, next) = parseBlock(lines, i + 1, depth + 1, childIndent)
            out(key) = m
            i = next
          }
        } else {
          out(key) = ""
          i += 1
        }
      }
    }
    (out.toMap, i)
  }

  private def stripQuotes(s: String): String =
    if (s.length >= 2 && ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\''))) {
      s.substring(1, s.length - 1)
    } else s
}
