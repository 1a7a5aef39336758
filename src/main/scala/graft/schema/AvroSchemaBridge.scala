package graft.schema

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Bridge from the reference's Avro-style JSON schema strings to Spark
  * [[StructType]].
  *
  * The reference declares schemas as Avro-JSON config strings parsed by
  * `Schema.parseJson` (reference `MapRStreamConfig.java:81-87`,
  * `MapRDBJSONSink.java:321-327`). Its admissible type lattice is the sink's
  * type switch (`MapRDBJSONSink.java:154-296`): the seven primitives
  * boolean/int/long/float/double/bytes/string, one level of `array<T>`, and
  * unions used only to encode nullability (`MapRDBJSONSink.java:286-288`).
  *
  * Quirk resolutions (SURVEY.md §1.4): unlike the reference we support
  * `array<bytes>` correctly (quirk 3) and `array<nullable T>` keeps its
  * arrayness with nullable elements (quirk 4).
  *
  * `strict = true` mirrors the reference's surface exactly and rejects
  * enum/map/record/fixed with `IllegalArgumentException` (as
  * `MapRDBJSONSink.java:292-295` does); `strict = false` extends the bridge
  * with the natural Spark mappings (record→struct, map→map, enum→string,
  * fixed→binary) for engine use beyond parity.
  */
object AvroSchemaBridge {

  private val mapper = new ObjectMapper()

  /** Parse an Avro-JSON record schema into a StructType.
    * Returns None for a null/empty string — the reference treats an empty
    * schema as "raw payload" mode (`MapRStreamConfig.java:83`).
    */
  def structTypeFromAvroJson(json: String, strict: Boolean = true): Option[StructType] = {
    if (json == null || json.trim.isEmpty) return None
    val node = mapper.readTree(json)
    toDataType(node, strict) match {
      case (st: StructType, _) => Some(st)
      case (other, _) =>
        throw new IllegalArgumentException(
          s"Top-level schema must be a record, got $other")
    }
  }

  /** (DataType, nullable) for an Avro schema node. */
  private def toDataType(node: JsonNode, strict: Boolean): (DataType, Boolean) = {
    if (node.isTextual) (primitive(node.asText(), strict), false)
    else if (node.isArray) { // union
      val members = node.elements().asScala.toSeq
      val nulls = members.filter(m => m.isTextual && m.asText() == "null")
      val nonNull = members.filterNot(m => m.isTextual && m.asText() == "null")
      if (nonNull.size != 1)
        throw new IllegalArgumentException(
          "Only unions encoding nullability ([null, T]) are supported " +
            "(reference MapRDBJSONSink.java:286-288 uses getNonNullable only)")
      val (dt, _) = toDataType(nonNull.head, strict)
      (dt, nulls.nonEmpty)
    } else if (node.isObject) {
      node.get("type").asText() match {
        case "array" =>
          val (elem, elemNullable) = toDataType(node.get("items"), strict)
          (ArrayType(elem, containsNull = elemNullable), false)
        case "record" =>
          val fields = node.get("fields").elements().asScala.map { f =>
            val (dt, nullable) = toDataType(f.get("type"), strict)
            dt match {
              case _: StructType | _: MapType if strict =>
                throw new IllegalArgumentException(
                  s"unsupported type in strict mode: nested ${dt.typeName} " +
                    "(reference MapRDBJSONSink.java:292-295 rejects)")
              case _ =>
            }
            StructField(f.get("name").asText(), dt, nullable)
          }.toArray
          (StructType(fields), false)
        case "map" =>
          if (strict) throw new IllegalArgumentException(
            "unsupported type: map (reference MapRDBJSONSink.java:292-295)")
          val (v, vNullable) = toDataType(node.get("values"), strict)
          (MapType(StringType, v, valueContainsNull = vNullable), false)
        case "enum" =>
          if (strict) throw new IllegalArgumentException(
            "unsupported type: enum (reference MapRDBJSONSink.java:292-295)")
          (StringType, false)
        case "fixed" =>
          if (strict) throw new IllegalArgumentException(
            "unsupported type: fixed (reference MapRDBJSONSink.java:292-295)")
          (BinaryType, false)
        case other => (primitive(other, strict), false)
      }
    } else throw new IllegalArgumentException(s"Unrecognized schema node: $node")
  }

  private def primitive(name: String, strict: Boolean): DataType = name match {
    case "boolean" => BooleanType
    case "int"     => IntegerType
    case "long"    => LongType
    case "float"   => FloatType
    case "double"  => DoubleType
    case "bytes"   => BinaryType
    case "string"  => StringType
    case "null"    => NullType
    case other =>
      throw new IllegalArgumentException(
        s"unsupported type: $other (reference MapRDBJSONSink.java:292-295)")
  }

  /** Render a StructType back to an Avro-JSON schema string (inverse bridge,
    * used by tests for round-trip properties). */
  def avroJsonFromStructType(st: StructType, name: String = "rec"): String = {
    def tpe(dt: DataType, nullable: Boolean): String = {
      val base = dt match {
        case BooleanType => "\"boolean\""
        case IntegerType => "\"int\""
        case LongType    => "\"long\""
        case FloatType   => "\"float\""
        case DoubleType  => "\"double\""
        case BinaryType  => "\"bytes\""
        case StringType  => "\"string\""
        case ArrayType(e, n) => s"""{"type":"array","items":${tpe(e, n)}}"""
        case other => throw new IllegalArgumentException(s"no avro mapping for $other")
      }
      if (nullable) s"""["null",$base]""" else base
    }
    val fields = st.fields
      .map(f => s"""{"name":"${f.name}","type":${tpe(f.dataType, f.nullable)}}""")
      .mkString(",")
    s"""{"type":"record","name":"$name","fields":[$fields]}"""
  }
}
