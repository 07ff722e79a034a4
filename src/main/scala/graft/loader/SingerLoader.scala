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
  * records are routed by `get_json_object` on the raw line (one parse pass,
  * persisted so the per-stream writes re-read the routed cache instead of
  * rescanning raw input), parsed with `from_json` against the stream's
  * converted `StructType`, flattened and projected as pure Catalyst
  * expressions, and written by the parquet writer. No per-record driver
  * loop anywhere: parallelism is the number of input splits, and the only
  * shuffle is the optional repartition by `partition_cols`.
  *
  * Protocol strictness (singer-sdk parity): lines without a `type`, RECORDs
  * without a payload, RECORDs for undeclared streams, and conflicting
  * SCHEMAs for one stream within a batch all raise instead of dropping data.
  *
  * Ordering semantics for batch replay: Spark's file source packs splits by
  * size, not emission order, so "last STATE wins" is defined per-batch, not
  * per-line. That is safe for the at-least-once contract (an older state
  * only causes extra replay, never loss); in-batch schema evolution is
  * rejected loudly rather than resolved by an order guess.
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
      activateVersions: Seq[ActivateVersionMessage],
      schemas: Map[String, SchemaMessage])

  /** Load a Singer JSONL file (batch replay of a tap's output). */
  def loadFile(spark: SparkSession, path: String, config: GraftConfig): LoadResult =
    load(spark, spark.read.textFile(path), config)

  /** @param knownSchemas schemas carried over from earlier batches (the
    *                     streaming path: one SCHEMA message, then record-only
    *                     appends across triggers) */
  def load(spark: SparkSession, lines: Dataset[String], config: GraftConfig,
      knownSchemas: Map[String, SchemaMessage] = Map.empty): LoadResult = {
    // one parse pass over the input, cached for every consumer below —
    // json_tuple extracts all three routing fields from a SINGLE json parse
    // (three get_json_object calls would each re-parse the line)
    // NOT spread: unlike the parquet tables, text input is byte-range
    // splittable (openCost-floored), so the parse already parallelizes;
    // a repartition ahead of it was measured ~25% SLOWER at 100k rows —
    // shuffling the raw JSON strings costs more than the extra cores win.
    val routed = lines.toDF("value")
      .filter(length(trim(col("value"))) > 0)
      .select(col("value"),
        json_tuple(col("value"), "type", "stream", "record", "version",
          "time_extracted"))
      .toDF("value", "t", "stream", "record", "version", "te")
      .persist()
    // one wall-clock stamp per load, shared by every stream (singer-sdk's
    // sync_started_at); only meaningful when add_record_metadata is on
    val syncStartedAt = new java.sql.Timestamp(System.currentTimeMillis())
    try {
      // ---- protocol validation (one aggregation job) ----
      val knownTypes =
        Seq("RECORD", "SCHEMA", "STATE", "ACTIVATE_VERSION", "BATCH")
      val probe = routed.agg(
        max(when(col("t").isNull, col("value"))).as("untyped"),
        max(when(col("t") === "RECORD" && col("record").isNull, col("value")))
          .as("null_record"),
        max(when(!col("t").isin(knownTypes: _*), col("t")))
          .as("unknown_type")).collect().head
      if (probe.getString(0) != null)
        throw new InvalidConfigException(
          s"line without a Singer 'type': ${probe.getString(0).take(200)}")
      if (probe.getString(1) != null)
        throw new InvalidConfigException(
          s"RECORD message without a record payload: ${probe.getString(1).take(200)}")
      if (probe.getString(2) != null)
        throw new InvalidConfigException(
          s"unknown Singer message type: ${probe.getString(2)}")

      // ---- control plane: reduced to a BOUNDED set before collect ----
      val control = controlMessages(routed)

      val schemas = scala.collection.mutable.LinkedHashMap.empty[String, SchemaMessage]
      knownSchemas.foreach { case (k, v) => schemas(k) = v }
      var lastState: Option[String] = None
      val activates = Seq.newBuilder[ActivateVersionMessage]
      val batches = Seq.newBuilder[BatchMessage]
      control.foreach {
        case sm: SchemaMessage =>
          // in-batch schema evolution: reject loudly (file-split order is
          // size-based, so "which SCHEMA came last" is not well-defined)
          if (schemas.get(sm.stream).exists(_.schemaJson != sm.schemaJson))
            throw new SchemaChangedException(
              s"conflicting SCHEMA messages for stream '${sm.stream}' in one batch")
          schemas(sm.stream) = sm
        case st: StateMessage           => lastState = Some(st.valueJson)
        case av: ActivateVersionMessage => activates += av
        case bm: BatchMessage           => batches += bm
        case _                          =>
      }
      val batchesByStream = batches.result().groupBy(_.stream)
      val batchOrphans = batchesByStream.keys.filterNot(schemas.contains)
      if (batchOrphans.nonEmpty)
        throw new InvalidConfigException(
          s"BATCH messages for streams with no SCHEMA: ${batchOrphans.mkString(", ")}")

      // records for a stream with no SCHEMA are a protocol violation
      // (singer-sdk raises on RECORD-before-SCHEMA; so do we); the same
      // per-stream pass notes which streams carry RECORD-level `version`
      // stamps (full-table replication), so stamping below is data-driven
      val perStream = routed.filter(col("t") === "RECORD")
        .groupBy(col("stream"))
        .agg(max(col("version").isNotNull).as("versioned")).collect()
      val orphan = perStream.map(_.getString(0)).filterNot(schemas.contains)
      if (orphan.nonEmpty)
        throw new InvalidConfigException(
          s"RECORD messages for streams with no SCHEMA: ${orphan.mkString(", ")}")
      val versionedStreams =
        perStream.filter(_.getBoolean(1)).map(_.getString(0)).toSet

      // ---- record plane: fully distributed per stream ----
      // stream-level stream maps resolve each input stream to its output
      // name (aliasing) or to suppression (`__NULL__` / `__else__`
      // catch-all) BEFORE any record work — a suppressed stream costs
      // nothing beyond its control-plane entry
      schemas.values.foreach { sm =>
       config.resolveStream(sm.stream).foreach { outStream =>
        // JSON-Schema validation covers inline RECORDs; BATCH files are
        // tap-encoded bulk payloads and bypass per-record validation
        // (singer-sdk parity: batch mode skips record-level processing)
        if (config.validateRecords) validateStream(routed, sm)
        val nested = JsonSchemaConverter.toStructType(sm.schemaJson)
        val inline = routed
          .filter(col("t") === "RECORD" && col("stream") === sm.stream)
          .select(col("record"), col("version"), col("te"))
        // BATCH manifests: each referenced file is JSONL with one record
        // payload per line (gzip decoded by extension in Hadoop's text
        // source). Unioned BEFORE from_json so batch rows flow through the
        // identical parse → flatten → stream-maps → extra-fields path as
        // inline RECORDs (q69_batch_ingest asserts byte-identical output) —
        // batch rows just carry no message-level version/time_extracted.
        val raw = batchesByStream.get(sm.stream) match {
          case Some(bms) =>
            val files = bms.flatMap(_.manifest)
            if (files.isEmpty) inline
            else inline.unionByName(
              spark.read.textFile(files: _*).toDF("record")
                .filter(length(trim(col("record"))) > 0)
                .select(col("record"),
                  lit(null).cast("string").as("version"),
                  lit(null).cast("string").as("te")))
          case None => inline
        }
        // non-record columns stamped alongside the parsed payload:
        //  - `_sdc_table_version` when the stream is version-stamped
        //    (full-table replication; ACTIVATE_VERSION purges by it —
        //    singer-sdk inherited semantics, reference target.py:51-52)
        //  - the singer-sdk `add_record_metadata` family when configured:
        //    extracted_at comes from the message (deterministic),
        //    received/batched/sync_started are wall-clock lineage stamps,
        //    and the sequence is an opaque per-load monotonic id (the SDK
        //    uses consumption-time epoch-millis — equally opaque)
        val extras = Seq.newBuilder[(String, org.apache.spark.sql.Column)]
        if (versionedStreams(sm.stream))
          extras += VersionPurge.SdcTableVersionCol -> col("version").cast("long")
        if (config.addRecordMetadata) {
          extras += "_sdc_extracted_at" -> col("te").cast("timestamp")
          extras += "_sdc_received_at" -> current_timestamp()
          extras += "_sdc_batched_at" -> current_timestamp()
          extras += "_sdc_sync_started_at" -> lit(syncStartedAt)
          extras += "_sdc_sequence" -> monotonically_increasing_id()
          extras += "_sdc_deleted_at" ->
            get_json_object(col("record"), "$._sdc_deleted_at").cast("timestamp")
        }
        val extraCols = extras.result()
        // a tap may DECLARE loader-stamped columns in its schema (log-based
        // taps declare _sdc_deleted_at); the stamp wins — drop the parsed
        // twin from the record expansion or the write dies on a duplicate
        // column name
        val stamped = extraCols.map(_._1).toSet
        val recordFields = nested.fieldNames.toSeq.filterNot(stamped)
          .map(f => col(s"r.`$f`").as(f))
        val records = raw
          .select(from_json(col("record"), nested,
            Map("mode" -> "FAILFAST")).as("r") +:
            extraCols.map { case (n, c) => c.as(n) }: _*)
          .select(recordFields ++ extraCols.map(p => col(p._1)): _*)
        val transformed = transform(records, sm.stream, config)
        new ParquetSink(spark, config, outStream, transformed.schema)
          .write(transformed)
       }
      }

      // ACTIVATE_VERSION: after the batch's records are committed, purge
      // rows of superseded versions from each activated stream dir —
      // resolved through the same stream-level maps (an aliased stream's
      // data lives under its output name; a suppressed stream has none)
      val acts = activates.result()
      acts.foreach { av =>
        config.resolveStream(av.stream).foreach(out =>
          VersionPurge.activate(spark, config, out, av.version))
      }

      LoadResult(schemas.keys.toSeq, lastState, acts, schemas.toMap)
    } finally routed.unpersist()
  }

  /** Control-plane reduction to a BOUNDED collect. A protocol-conformant
    * tap emits a handful of control lines, but nothing stops one from
    * emitting STATE after every record (some do) — collecting every
    * non-RECORD line verbatim would OOM the driver on a large replay.
    * Reduce distributively first: STATE collapses to the single last
    * message in input order (`monotonically_increasing_id` follows the
    * partition order that already defines this batch's "last STATE wins"
    * semantics — see the ordering note in the class doc), and
    * SCHEMA / ACTIVATE_VERSION / BATCH collapse to their first-seen
    * DISTINCT lines (a tap re-emitting its SCHEMA before every record
    * collapses to one row per distinct schema; in-batch conflict detection
    * needs exactly the distinct set). Collected volume is
    * O(distinct control lines) + 1, independent of input length. */
  private[graft] def controlMessages(
      routed: DataFrame): Seq[SingerMessage] = {
    val ordered = routed.filter(col("t") =!= "RECORD")
      .select(col("value"), col("t"),
        monotonically_increasing_id().as("ord"))
    val lastState = ordered.filter(col("t") === "STATE")
      .agg(max_by(col("value"), col("ord")).as("value"))
      .collect().headOption.flatMap(r => Option(r.getString(0)))
    val rest = ordered.filter(col("t") =!= "STATE")
      .groupBy(col("value")).agg(min(col("ord")).as("ord"))
      .orderBy(col("ord")).select(col("value"))
      .collect().map(_.getString(0)).toSeq
    (rest ++ lastState).map(SingerMessage.parse)
  }

  /** JSON-Schema record validation (singer-sdk parity, reference standard
    * suite tests/test_core.py:26-33): every RECORD must *contain* each
    * `required` property (present-but-null is valid when the type union
    * admits "null" — `json_object_keys` gives exact presence semantics,
    * where a post-parse NULL check could not tell missing from null), and
    * every `key_properties` column must be non-NULL (it is the primary
    * key). One counting aggregation over the already-persisted routed
    * cache — streams that declare no constraints skip the pass entirely. */
  private def validateStream(routed: DataFrame, sm: SchemaMessage): Unit = {
    val required = JsonSchemaConverter.requiredFields(sm.schemaJson)
    val violations: Seq[org.apache.spark.sql.Column] =
      required.map(f =>
        !array_contains(expr("json_object_keys(record)"), lit(f))) ++
      sm.keyProperties.map(k => get_json_object(col("record"), s"$$['$k']").isNull)
    if (violations.isEmpty) return
    val bad = violations.reduce(_ || _)
    val v = routed
      .filter(col("t") === "RECORD" && col("stream") === sm.stream)
      .agg(count(when(bad, 1)).as("n"),
        max(when(bad, col("record"))).as("example")).collect().head
    if (v.getLong(0) > 0)
      throw new RecordValidationException(
        s"stream '${sm.stream}': ${v.getLong(0)} record(s) violate the " +
          s"declared schema (required: ${required.mkString(",")}; " +
          s"key_properties: ${sm.keyProperties.mkString(",")}); " +
          s"example: ${Option(v.getString(1)).getOrElse("").take(300)}")
  }

  /** The per-stream projection pipeline: flatten → stream maps → extra
    * fields. Pure `select`s — Catalyst prunes/pushes through it. */
  def transform(records: DataFrame, stream: String,
      config: GraftConfig): DataFrame = {
    val flat = Flattener.flatten(records, config.flatteningMaxDepth)
    val props = config.streamProperties(stream)
    val mapped = if (props.nonEmpty) StreamMaps(flat, props) else flat
    config.parsedExtraFields.foldLeft(mapped) {
      case (df, (k, v, "integer")) => df.withColumn(k, lit(v.toLong))
      case (df, (k, v, _))         => df.withColumn(k, lit(v))
    }
  }
}
