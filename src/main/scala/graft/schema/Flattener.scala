package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Record flattening: nested structs become top-level `parent__child` columns
  * (separator `__`), bounded by `maxDepth`; structs beyond the depth bound,
  * arrays and maps are JSON-stringified. Semantics follow the Singer-SDK
  * `record-flattening` capability the reference declares
  * (reference: meltano.yml:19; flat output fixture tests/utils/test_hdfs.py:43).
  *
  * Implemented as a pure projection (`select` of Column expressions) so
  * Catalyst can prune/pushdown through it — no UDFs, no RDDs.
  */
object Flattener {
  val Separator = "__"

  /** Column projections flattening `schema`; apply as `df.select(cols: _*)`. */
  def flattenColumns(schema: StructType, maxDepth: Int = 10): Seq[Column] = {
    def walk(field: StructField, path: Seq[String], depth: Int): Seq[Column] = {
      val colRef = path.map(p => s"`$p`").mkString(".")
      val outName = path.mkString(Separator)
      field.dataType match {
        case st: StructType if depth < maxDepth =>
          st.fields.toSeq.flatMap(f => walk(f, path :+ f.name, depth + 1))
        case _: StructType | _: ArrayType | _: MapType =>
          // beyond depth bound, or non-struct container: JSON-stringify
          Seq(to_json(col(colRef)).as(outName))
        case _ =>
          Seq(col(colRef).as(outName))
      }
    }
    schema.fields.toSeq.flatMap(f => walk(f, Seq(f.name), 1))
  }

  def flatten(df: DataFrame, maxDepth: Int = 10): DataFrame =
    df.select(flattenColumns(df.schema, maxDepth): _*)

  /** The flat schema `flatten` would produce — used by the schema gate
    * without materializing data. */
  def flattenedSchema(schema: StructType, maxDepth: Int = 10): StructType = {
    def walk(field: StructField, path: Seq[String], depth: Int,
        nullable: Boolean): Seq[StructField] = {
      val outName = path.mkString(Separator)
      field.dataType match {
        case st: StructType if depth < maxDepth =>
          st.fields.toSeq.flatMap(f =>
            walk(f, path :+ f.name, depth + 1, nullable || f.nullable))
        case _: StructType | _: ArrayType | _: MapType =>
          Seq(StructField(outName, StringType, nullable = true))
        case dt =>
          Seq(StructField(outName, dt, nullable || field.nullable))
      }
    }
    StructType(schema.fields.toSeq.flatMap(f =>
      walk(f, Seq(f.name), 1, f.nullable)))
  }
}
