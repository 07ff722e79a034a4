package graft.core

import com.fasterxml.jackson.databind.ObjectMapper

/** Loader configuration. Mirrors the reference's config surface
  * (reference: target_hdfs/target.py:19-46, README.md:31-44):
  * the parent `destination_path` is replaced by `hdfs_destination_path`
  * (required), plus `hdfs_block_size_limit` and `skip_existing_files`.
  *
  * @param hdfsDestinationPath root output dir; each stream writes to
  *                            `{root}/{streamName}`
  * @param hdfsBlockSizeLimit  optional size string ("128M"); when absent the
  *                            append cutoff is 85% of `dfs.blocksize`
  * @param skipExistingFiles   disables the append-file preload
  * @param compressionMethod   gzip (default) | snappy | zstd | brotli
  *                            (reference parity: README.md:37; brotli needs
  *                            the brotli-codec jar on the cluster classpath —
  *                            validated here, resolved at write time)
  * @param maxBatchSize        records buffered per drain (default 10000)
  * @param maxTableSizeMb      max buffered MB before flush (default 800)
  * @param partitionCols       hive partition columns; when set, the append
  *                            preload is disabled (reference sinks.py:38)
  * @param extraFields         "k=v,..." constant columns appended to records
  * @param extraFieldsTypes    "k=string|integer,..." types for extraFields
  * @param maxRecordsPerFile   cap rows per written file (0 = writer default);
  *                            the Spark-native realization of the reference's
  *                            file-sizing intent behind max_batch_size /
  *                            max_pyarrow_table_size. Honored on every path
  *                            that may emit multiple files; a compaction
  *                            rewrite (append into a loaded small file) is
  *                            single-file by contract and ignores it
  * @param validateRecords     enforce JSON-Schema `required` properties and
  *                            non-null `key_properties` per RECORD (singer-sdk
  *                            record validation; default on, as in the SDK)
  * @param flatteningMaxDepth  nested-object flatten depth bound
  * @param addRecordMetadata   stamp the singer-sdk `_sdc_*` lineage columns
  *                            on every record (extracted_at from the
  *                            message, received/batched/sync_started wall
  *                            clocks, an opaque monotonic sequence, and
  *                            deleted_at passed through from the record)
  * @param streamMaps          per-stream mappings — property-level (rename /
  *                            derive / drop / filter, see
  *                            [[graft.loader.StreamMaps]]) or stream-level
  *                            (alias `"old": "new"`, suppression
  *                            `"old": "__NULL__"`, and `"__else__":
  *                            "__NULL__"` to drop unmapped streams —
  *                            singer-sdk stream-map semantics)
  */
final case class GraftConfig(
    hdfsDestinationPath: String,
    hdfsBlockSizeLimit: Option[String] = None,
    skipExistingFiles: Boolean = false,
    compressionMethod: String = "gzip",
    maxBatchSize: Int = 10000,
    maxTableSizeMb: Int = 800,
    partitionCols: Seq[String] = Seq.empty,
    maxRecordsPerFile: Long = 0,
    extraFields: Option[String] = None,
    extraFieldsTypes: Option[String] = None,
    validateRecords: Boolean = true,
    flatteningMaxDepth: Int = 10,
    addRecordMetadata: Boolean = false,
    streamMaps: Map[String, StreamMapSpec] = Map.empty) {

  require(Set("gzip", "snappy", "zstd", "brotli")(compressionMethod),
    s"unsupported compression: $compressionMethod")

  /** Resolve a stream's output disposition under the stream-level maps:
    * `Some(outputName)` to write (aliased when renamed), `None` when the
    * stream is suppressed — directly (`"__NULL__"`/null) or by an
    * `"__else__": "__NULL__"` catch-all that drops unmapped streams. */
  def resolveStream(stream: String): Option[String] =
    streamMaps.get(stream) match {
      case Some(StreamMapSpec.Suppress)      => None
      case Some(StreamMapSpec.Alias(n))      => Some(n)
      case Some(StreamMapSpec.Properties(m)) =>
        Some(m.get(GraftConfig.AliasKey).flatten.getOrElse(stream))
      case None => streamMaps.get(GraftConfig.ElseKey) match {
        case Some(StreamMapSpec.Suppress) => None
        case _                            => Some(stream)
      }
    }

  /** The property-level mapping for a stream (empty for stream-level-only
    * specs); the `__alias__` pseudo-property is resolution metadata, not a
    * column operation. */
  def streamProperties(stream: String): Map[String, Option[String]] =
    streamMaps.get(stream) match {
      case Some(StreamMapSpec.Properties(m)) => m - GraftConfig.AliasKey
      case _                                 => Map.empty
    }

  def blockSizeLimitBytes: Option[Long] =
    hdfsBlockSizeLimit.map(SizeParser.convertSizeToBytes)

  def streamDir(streamName: String): String =
    s"${hdfsDestinationPath.stripSuffix("/")}/$streamName"

  /** Parsed `extra_fields` with types applied from `extra_fields_types`.
    * Both must list the same keys (reference target-parquet semantics). */
  def parsedExtraFields: Seq[(String, String, String)] = {
    def kv(s: String): Seq[(String, String)] =
      s.split(",").filter(_.nonEmpty).toSeq.map { p =>
        val Array(k, v) = p.split("=", 2)
        (k, v)
      }
    val vals = extraFields.map(kv).getOrElse(Seq.empty)
    val types = extraFieldsTypes.map(kv).getOrElse(Seq.empty).toMap
    vals.map { case (k, v) =>
      val t = types.getOrElse(k,
        throw new InvalidConfigException(s"extra field '$k' has no declared type"))
      if (!Set("string", "integer")(t))
        throw new InvalidConfigException(s"unsupported extra field type: $t")
      (k, v, t)
    }
  }
}

/** One stream's entry in `stream_maps` (singer-sdk stream-map grammar):
  * an object of property operations, a bare string alias renaming the
  * stream, or suppression (`"__NULL__"` / JSON null) dropping it. */
sealed trait StreamMapSpec
object StreamMapSpec {
  /** Property-level operations (may carry `__alias__` to also rename). */
  final case class Properties(m: Map[String, Option[String]]) extends StreamMapSpec
  /** `"old_name": "new_name"` — same records, new output stream name. */
  final case class Alias(name: String) extends StreamMapSpec
  /** `"name": "__NULL__"` (or null) — drop the stream entirely. */
  case object Suppress extends StreamMapSpec
}

object GraftConfig {
  private val mapper = new ObjectMapper()

  /** `"__else__"` catch-all key: `"__NULL__"` drops every unmapped stream
    * (unmapped streams pass through when absent). */
  val ElseKey = "__else__"
  /** Suppression sentinel value. */
  val NullStream = "__NULL__"
  /** In-object rename pseudo-property. */
  val AliasKey = "__alias__"

  def fromJson(json: String): GraftConfig = {
    val n = mapper.readTree(json)
    def str(k: String): Option[String] =
      Option(n.get(k)).filterNot(_.isNull).map(_.asText())
    GraftConfig(
      hdfsDestinationPath = str("hdfs_destination_path").getOrElse(
        throw new InvalidConfigException("hdfs_destination_path is required")),
      hdfsBlockSizeLimit = str("hdfs_block_size_limit"),
      skipExistingFiles = str("skip_existing_files").exists(_.toBoolean),
      compressionMethod = str("compression_method").getOrElse("gzip"),
      maxBatchSize = str("max_batch_size").map(_.toInt).getOrElse(10000),
      maxTableSizeMb = str("max_pyarrow_table_size").map(_.toInt).getOrElse(800),
      maxRecordsPerFile = str("max_records_per_file").map(_.toLong).getOrElse(0L),
      partitionCols = Option(n.get("partition_cols")).filterNot(_.isNull)
        .map { pc =>
          if (pc.isArray) (0 until pc.size()).map(pc.get(_).asText())
          else pc.asText().split(",").filter(_.nonEmpty).toSeq
        }.getOrElse(Seq.empty),
      extraFields = str("extra_fields"),
      extraFieldsTypes = str("extra_fields_types"),
      validateRecords = str("validate_records").forall(_.toBoolean),
      flatteningMaxDepth =
        str("flattening_max_depth").map(_.toInt).getOrElse(10),
      addRecordMetadata = str("add_record_metadata").exists(_.toBoolean),
      streamMaps = Option(n.get("stream_maps")).filterNot(_.isNull).map { sm =>
        val out = scala.collection.mutable.Map.empty[String, StreamMapSpec]
        val streams = sm.fieldNames()
        while (streams.hasNext) {
          val st = streams.next()
          val m = sm.get(st)
          val spec: StreamMapSpec =
            if (m.isNull) StreamMapSpec.Suppress
            else if (m.isTextual) {
              val v = m.asText()
              if (v == NullStream) StreamMapSpec.Suppress
              else StreamMapSpec.Alias(v)
            } else if (m.isObject) {
              val inner = scala.collection.mutable.Map.empty[String, Option[String]]
              val cols = m.fieldNames()
              while (cols.hasNext) {
                val c = cols.next()
                val v = m.get(c)
                // singer-sdk accepts BOTH spellings of property removal:
                // null and the "__NULL__" sentinel string
                inner(c) =
                  if (v.isNull || (v.isTextual && v.asText() == NullStream)) None
                  else Some(v.asText())
              }
              StreamMapSpec.Properties(inner.toMap)
            } else throw new InvalidConfigException(
              s"stream_maps['$st'] must be an object, a stream alias " +
                s"string, '$NullStream', or null")
          if (st == ElseKey && spec != StreamMapSpec.Suppress)
            throw new InvalidConfigException(
              s"stream_maps['$ElseKey'] only supports '$NullStream'/null " +
                "(drop unmapped streams); omit it to pass them through")
          out(st) = spec
        }
        out.toMap
      }.getOrElse(Map.empty))
  }

  /** Env-var config naming prefix (singer-sdk convention: plugin name
    * uppercased; setting `hdfs_destination_path` is read from
    * `TARGET_HDFS_HDFS_DESTINATION_PATH`). */
  val EnvPrefix = "TARGET_HDFS_"

  /** Build config from `TARGET_HDFS_*`-prefixed environment variables —
    * the `--config=ENV` import (reference README.md:44-48: "will
    * automatically import any environment variables within the working
    * directory's `.env` if the `--config=ENV` is provided"). `.env`
    * entries fill in UNDER the process environment (dotenv semantics:
    * the terminal context wins). JSON-typed settings (`stream_maps`,
    * `partition_cols`) may be JSON-encoded in the variable value. */
  def fromEnv(env: Map[String, String],
      dotEnv: Map[String, String] = Map.empty): GraftConfig = {
    val node = mapper.createObjectNode()
    (dotEnv ++ env).foreach { case (k, v) =>
      if (k.startsWith(EnvPrefix)) {
        val setting = k.stripPrefix(EnvPrefix).toLowerCase
        val t = v.trim
        // a value shaped like JSON ('{'/'[') that fails to parse must fail
        // LOUDLY: degrading it to a plain string would make fromJson see a
        // TextNode, silently ignoring the whole setting (a malformed
        // TARGET_HDFS_STREAM_MAPS would drop every mapping) — the same
        // fail-loudly contract a missing required setting already has
        if (t.startsWith("{") || t.startsWith("["))
          try node.set[com.fasterxml.jackson.databind.JsonNode](
            setting, mapper.readTree(t))
          catch { case e: Exception =>
            throw new InvalidConfigException(
              s"$k looks like JSON but does not parse: ${e.getMessage}")
          }
        else node.put(setting, v)
      }
    }
    fromJson(node.toString)
  }

  /** Minimal `.env` parser: `KEY=VALUE` lines; blank lines and
    * `#`-comments ignored; optional `export ` prefix; optional matching
    * single/double quotes around the value. */
  def parseDotEnv(content: String): Map[String, String] =
    content.linesIterator.flatMap { raw =>
      val line = raw.trim
      if (line.isEmpty || line.startsWith("#") || !line.contains("=")) None
      else {
        val noExport =
          if (line.startsWith("export ")) line.stripPrefix("export ").trim
          else line
        val Array(k, v) = noExport.split("=", 2)
        val vv = v.trim
        val unquoted =
          if (vv.length >= 2 &&
              ((vv.head == '"' && vv.last == '"') ||
               (vv.head == '\'' && vv.last == '\'')))
            vv.substring(1, vv.length - 1)
          else vv
        Some(k.trim -> unquoted)
      }
    }.toMap

  /** `--about`-style config introspection (reference target.py:19-46): the
    * inherited `destination_path` is removed and the three HDFS properties
    * appended. */
  def aboutJson: String =
    """{
      |  "properties": {
      |    "hdfs_destination_path": {"type": "string", "required": true},
      |    "hdfs_block_size_limit": {"type": ["string", "null"]},
      |    "skip_existing_files": {"type": "boolean", "default": false},
      |    "compression_method": {"type": "string", "default": "gzip"},
      |    "max_pyarrow_table_size": {"type": "integer", "default": 800},
      |    "max_batch_size": {"type": "integer", "default": 10000},
      |    "max_records_per_file": {"type": "integer", "default": 0},
      |    "partition_cols": {"type": ["array", "string", "null"]},
      |    "extra_fields": {"type": ["string", "null"]},
      |    "extra_fields_types": {"type": ["string", "null"]},
      |    "validate_records": {"type": "boolean", "default": true},
      |    "flattening_max_depth": {"type": "integer", "default": 10},
      |    "add_record_metadata": {"type": "boolean", "default": false}
      |  }
      |}""".stripMargin
}
