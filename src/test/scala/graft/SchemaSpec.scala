package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.schema.{Flattener, JsonSchemaConverter}

class SchemaSpec extends AnyFunSuite {

  // FIXTURES.md §1.1 — the reference's canonical 3-column stream
  val flatSchema =
    """{"type": "object", "properties": {
      |  "col1": {"type": ["integer", "null"]},
      |  "col2": {"type": ["string", "null"]},
      |  "col3": {"type": ["boolean", "null"]}}}""".stripMargin

  // FIXTURES.md §1.2 — nested + array stream
  val nestedSchema =
    """{"type": "object", "properties": {
      |  "id": {"type": "integer"},
      |  "user": {"type": "object", "properties": {
      |    "name": {"type": "string"},
      |    "address": {"type": "object", "properties": {
      |      "city": {"type": "string"}}}}},
      |  "tags": {"type": "array", "items": {"type": "string"}}}}""".stripMargin

  test("json schema → StructType maps integer/string/boolean (ref fixture)") {
    val st = JsonSchemaConverter.toStructType(flatSchema)
    assert(st === StructType(Seq(
      StructField("col1", LongType), StructField("col2", StringType),
      StructField("col3", BooleanType))))
  }

  test("json schema handles number, nested objects, arrays, unknown") {
    val st = JsonSchemaConverter.toStructType(nestedSchema)
    assert(st("id").dataType === LongType)
    assert(!st("id").nullable)
    val user = st("user").dataType.asInstanceOf[StructType]
    assert(user("address").dataType.asInstanceOf[StructType]("city").dataType === StringType)
    // items declared non-nullable ("string", not ["string","null"])
    assert(st("tags").dataType === ArrayType(StringType, containsNull = false))
  }

  test("flattened schema uses __ separator and stringifies arrays") {
    val flat = Flattener.flattenedSchema(JsonSchemaConverter.toStructType(nestedSchema))
    assert(flat.fieldNames.toSeq ===
      Seq("id", "user__name", "user__address__city", "tags"))
    assert(flat("tags").dataType === StringType)
  }

  test("flatten on data produces parent__child columns and JSON arrays") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = spark.read.schema(JsonSchemaConverter.toStructType(nestedSchema))
      .json(Seq("""{"id":1,"user":{"name":"ann","address":{"city":"lisbon"}},"tags":["x","y"]}""").toDS())
    val flat = Flattener.flatten(df)
    val row = flat.collect().head
    assert(flat.columns.toSeq === Seq("id", "user__name", "user__address__city", "tags"))
    assert(row.getString(1) === "ann")
    assert(row.getString(2) === "lisbon")
    assert(row.getString(3) === """["x","y"]""")
  }

  test("flatten depth bound JSON-stringifies deeper structs") {
    val flat = Flattener.flattenedSchema(
      JsonSchemaConverter.toStructType(nestedSchema), maxDepth = 1)
    assert(flat.fieldNames.toSeq === Seq("id", "user", "tags"))
    assert(flat("user").dataType === StringType)
  }
}
