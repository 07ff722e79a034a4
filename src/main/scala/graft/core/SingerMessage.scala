package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Singer message ADT — the loader's inbound protocol: JSONL on stdin with a
  * `type` tag (SCHEMA / RECORD / STATE / ACTIVATE_VERSION).
  * Protocol shape documented from the reference's Singer-SDK usage
  * (reference: target_hdfs/target.py:51-52; tests/test_core.py:26-33).
  *
  * Control messages (SCHEMA/STATE/ACTIVATE_VERSION) are tiny and handled on
  * the driver; RECORD payloads stay as raw JSON strings so the actual record
  * parsing can run distributed on executors (`from_json`), never through this
  * ADT.
  */
sealed trait SingerMessage { def messageType: String }

final case class SchemaMessage(
    stream: String,
    schemaJson: String,
    keyProperties: Seq[String]) extends SingerMessage {
  val messageType = "SCHEMA"
}

final case class RecordMessage(stream: String, recordJson: String)
    extends SingerMessage {
  val messageType = "RECORD"
}

final case class StateMessage(valueJson: String) extends SingerMessage {
  val messageType = "STATE"
}

final case class ActivateVersionMessage(stream: String, version: Long)
    extends SingerMessage {
  val messageType = "ACTIVATE_VERSION"
}

/** Singer-SDK `BATCH` message (SDK 0.35.x, inherited by the reference via
  * its singer-sdk dependency — reference pyproject.toml:15): instead of
  * inline RECORDs, the tap ships a manifest of already-encoded files. The
  * SDK's `Target` reads the manifest files and routes their rows through the
  * same per-stream sink path as RECORD messages.
  *
  * `encoding.format` is `jsonl` (one record-JSON per line);
  * `encoding.compression` `gzip` means the files carry a `.gz` suffix
  * (Hadoop's text source decodes by extension, so the loader needs no
  * special handling beyond validating the declared combination). */
final case class BatchMessage(
    stream: String,
    format: String,
    compression: String,
    manifest: Seq[String]) extends SingerMessage {
  val messageType = "BATCH"
}

object SingerMessage {
  private val mapper = new ObjectMapper()

  def parseJson(line: String): JsonNode = mapper.readTree(line)

  /** Driver-side parse of a single Singer line. Used for control-plane
    * dispatch and small fixtures; bulk RECORD parsing goes through Spark's
    * `from_json` instead.
    */
  def parse(line: String): SingerMessage = {
    val node = mapper.readTree(line)
    val tpe = Option(node.get("type")).map(_.asText())
      .getOrElse(throw new InvalidConfigException(s"missing message type: $line"))
    tpe match {
      case "SCHEMA" =>
        val keys = Option(node.get("key_properties")).map { kp =>
          (0 until kp.size()).map(kp.get(_).asText())
        }.getOrElse(Seq.empty)
        SchemaMessage(node.get("stream").asText(),
          node.get("schema").toString, keys)
      case "RECORD" =>
        RecordMessage(node.get("stream").asText(), node.get("record").toString)
      case "STATE" =>
        StateMessage(Option(node.get("value")).map(_.toString).getOrElse("{}"))
      case "ACTIVATE_VERSION" =>
        ActivateVersionMessage(node.get("stream").asText(),
          Option(node.get("version")).map(_.asLong()).getOrElse(0L))
      case "BATCH" =>
        val enc = Option(node.get("encoding"))
        val format = enc.flatMap(e => Option(e.get("format")))
          .map(_.asText()).getOrElse("jsonl")
        val compression = enc.flatMap(e => Option(e.get("compression")))
          .map(_.asText()).getOrElse("none")
        val manifest = Option(node.get("manifest")).map { m =>
          (0 until m.size()).map(m.get(_).asText())
        }.getOrElse(Seq.empty)
        if (format != "jsonl")
          throw new InvalidConfigException(
            s"unsupported BATCH encoding format '$format' (only jsonl)")
        if (compression != "none" && compression != "gzip")
          throw new InvalidConfigException(
            s"unsupported BATCH compression '$compression' (none | gzip)")
        BatchMessage(node.get("stream").asText(), format, compression, manifest)
      case other =>
        throw new InvalidConfigException(s"unknown Singer message type: $other")
    }
  }
}
