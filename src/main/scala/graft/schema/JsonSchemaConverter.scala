package graft.schema

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.types._
import graft.core.{InvalidConfigException, SingerMessage}

/** JSON Schema (Singer SCHEMA message) -> Spark `StructType`.
  *
  * Type mapping mirrors what the reference inherits from target-parquet
  * (observable in its fixtures, reference tests/utils/test_hdfs.py:43):
  * integer -> LongType, string -> StringType, boolean -> BooleanType,
  * number -> DoubleType; nested objects become StructType (flattened later);
  * arrays become ArrayType (JSON-stringified later). `["X","null"]` unions
  * mark nullability. Unknown / missing types degrade to StringType, matching
  * the loader's "never drop data" posture.
  */
object JsonSchemaConverter {

  def toStructType(schemaJson: String): StructType =
    toStructType(SingerMessage.parseJson(schemaJson))

  /** Top-level `required` property names of a JSON schema (empty when the
    * schema declares none). `required` means *presence* — a present-but-null
    * value is valid when the property's type union admits "null". */
  def requiredFields(schemaJson: String): Seq[String] = {
    val node = SingerMessage.parseJson(schemaJson)
    Option(node.get("required")).filter(_.isArray)
      .map(r => (0 until r.size()).map(r.get(_).asText()))
      .getOrElse(Seq.empty)
  }

  def toStructType(node: JsonNode): StructType = {
    val props = Option(node.get("properties")).getOrElse(
      throw new InvalidConfigException("JSON schema has no 'properties'"))
    val out = scala.collection.mutable.ArrayBuffer.empty[StructField]
    val names = props.fieldNames()
    while (names.hasNext) {
      val name = names.next()
      val (dt, nullable) = toDataType(props.get(name))
      out += StructField(name, dt, nullable)
    }
    StructType(out.toSeq)
  }

  /** Returns (dataType, nullable). */
  def toDataType(node: JsonNode): (DataType, Boolean) = {
    val typeNode = Option(node.get("type"))
    val types: Seq[String] = typeNode match {
      case Some(t) if t.isArray => (0 until t.size()).map(t.get(_).asText())
      case Some(t)              => Seq(t.asText())
      case None                 => Seq.empty
    }
    val nullable = types.contains("null") || types.isEmpty
    val primary = types.filterNot(_ == "null").headOption.getOrElse("string")
    val dt = primary match {
      case "integer" => LongType
      case "number"  => DoubleType
      case "boolean" => BooleanType
      case "object" =>
        if (node.has("properties")) toStructType(node)
        // object with unspecified shape -> kept as JSON string
        else StringType
      case "array" =>
        Option(node.get("items")) match {
          case Some(items) =>
            val (et, en) = toDataType(items)
            ArrayType(et, en)
          case None => ArrayType(StringType, containsNull = true)
        }
      case "string" =>
        // singer "format": date-time stays StringType in loader-compat mode
        // (target-parquet v1.0.0 keeps date-times as strings); query-side
        // casts are applied explicitly where wanted.
        StringType
      case _ => StringType
    }
    (dt, nullable)
  }
}
