package graft.loader

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.schema.{Flattener, JsonSchemaConverter}

/** The Singer → partitioned-parquet dataflow, Spark-first (reference
  * pipeline: target_hdfs/target.py + sinks.py; see SURVEY §3.1).
  *
  * Control plane (SCHEMA / STATE / ACTIVATE_VERSION — a handful of lines)
  * is parsed on the driver; the record plane never leaves the executors:
  * records are routed by `get_json_object` on the raw line, parsed with
  * `from_json` against the stream's converted `StructType`, flattened and
  * projected as pure Catalyst expressions, and written by the parquet
  * writer. There is no per-record driver loop anywhere, so the same code
  * handles a 60-line fixture and a 100 TB replay: parallelism is the number
  * of input splits, and the only shuffle is the optional repartition by
  * `partition_cols` (which exists to produce one file per partition value
  * instead of files × tasks).
  *
  * The reference's count/size buffering knobs (`max_batch_size`,
  * `max_pyarrow_table_size` — A8/A10) bound *loader memory*, a concern
  * Spark's executor memory manager owns natively; their file-sizing effect
  * maps to `spark.sql.files.maxRecordsPerFile` if wanted.
  */
object SingerLoader {

  final case class LoadResult(
      streams: Seq[String],
      lastState: Option[String],
      activateVersions: Seq[ActivateVersionMessage])

  /** Load a Singer JSONL file (batch replay of a tap's output). */
  def loadFile(spark: SparkSession, path: String, config: GraftConfig): LoadResult =
    load(spark, spark.read.textFile(path), config)

  def load(spark: SparkSession, lines: Dataset[String],
      config: GraftConfig): LoadResult = {
    // ---- control plane: tiny, driver-side ----
    // (collect order = partition order = file offset order for text sources,
    // so SCHEMA/STATE sequencing is preserved)
    val control = lines.toDF("value")
      .filter(length(trim(col("value"))) > 0 &&
        get_json_object(col("value"), "$.type") =!= "RECORD")
      .collect()
      .map(r => SingerMessage.parse(r.getString(0)))

    val schemas = scala.collection.mutable.LinkedHashMap.empty[String, SchemaMessage]
    var lastState: Option[String] = None
    val activates = Seq.newBuilder[ActivateVersionMessage]
    control.foreach {
      case sm: SchemaMessage          => schemas(sm.stream) = sm
      case st: StateMessage           => lastState = Some(st.valueJson)
      case av: ActivateVersionMessage => activates += av
      case _                          =>
    }

    // ---- record plane: fully distributed per stream ----
    val routed = lines.toDF("value").select(
      get_json_object(col("value"), "$.type").as("t"),
      get_json_object(col("value"), "$.stream").as("stream"),
      get_json_object(col("value"), "$.record").as("record"))
      .filter(col("t") === "RECORD")

    // records for a stream with no SCHEMA are a protocol violation
    // (singer-sdk raises on RECORD-before-SCHEMA; so do we)
    val orphan = routed.select(col("stream")).distinct().collect()
      .map(_.getString(0)).filterNot(schemas.contains)
    if (orphan.nonEmpty)
      throw new InvalidConfigException(
        s"RECORD messages for streams with no SCHEMA: ${orphan.mkString(", ")}")

    schemas.values.foreach { sm =>
      val nested = JsonSchemaConverter.toStructType(sm.schemaJson)
      val records = routed.filter(col("stream") === sm.stream)
        .select(from_json(col("record"), nested,
          Map("mode" -> "FAILFAST")).as("r"))
        .select(col("r.*"))
      val transformed = transform(records, sm.stream, config)
      new ParquetSink(spark, config, sm.stream, transformed.schema)
        .write(transformed)
    }

    LoadResult(schemas.keys.toSeq, lastState, activates.result())
  }

  /** The per-stream projection pipeline: flatten → stream maps → extra
    * fields. Pure `select`s — Catalyst prunes/pushes through it. */
  def transform(records: DataFrame, stream: String,
      config: GraftConfig): DataFrame = {
    val flat = Flattener.flatten(records, config.flatteningMaxDepth)
    val mapped = config.streamMaps.get(stream)
      .map(m => StreamMaps(flat, m)).getOrElse(flat)
    config.parsedExtraFields.foldLeft(mapped) {
      case (df, (k, v, "integer")) => df.withColumn(k, lit(v.toLong))
      case (df, (k, v, _))         => df.withColumn(k, lit(v))
    }
  }
}
