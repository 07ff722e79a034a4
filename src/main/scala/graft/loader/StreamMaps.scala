package graft.loader

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Singer-SDK-style stream maps (reference capability `stream-maps`,
  * meltano.yml:18): config-driven inline rename / filter / derive / drop of
  * stream properties, applied before the sink.
  *
  * Mapping format per stream:
  *   - `"__filter__" -> <boolean SQL expr>` keeps only matching records
  *   - `col -> null` drops the column
  *   - `col -> <SQL expr>` adds/replaces the column (plain rename is
  *     `new -> old_name`)
  *
  * Everything compiles to `filter`/`withColumn`/`drop` projections, so
  * Catalyst still prunes and pushes down through the mapped plan.
  *
  * Expressions are Spark SQL by default; Python/simpleeval-dialect
  * expressions from ported meltano configs (`record['a'] + '!'`,
  * `x if c else y`) are detected and translated by [[SimpleEvalShim]], so
  * the common reference-config forms run unmodified.
  */
object StreamMaps {
  val FilterKey = "__filter__"

  def apply(df: DataFrame, mapping: Map[String, Option[String]]): DataFrame = {
    // the frame's string-typed fields inform the shim's `+`-chain folding
    // (string + string concatenates in simpleeval; schema is re-read per
    // step so derived columns participate)
    def compile(cur: DataFrame, e: String) = {
      val strCols = cur.schema.fields.collect {
        case f if f.dataType == org.apache.spark.sql.types.StringType => f.name
      }.toSet
      expr(SimpleEvalShim.maybeTranslate(e, strCols))
    }
    val filtered = mapping.get(FilterKey).flatten match {
      case Some(cond) => df.filter(compile(df, cond))
      case None       => df
    }
    mapping.view.filterKeys(_ != FilterKey).toSeq.sortBy(_._1)
      .foldLeft(filtered) {
        case (acc, (name, Some(e))) => acc.withColumn(name, compile(acc, e))
        case (acc, (name, None))    => acc.drop(name)
      }
  }
}
