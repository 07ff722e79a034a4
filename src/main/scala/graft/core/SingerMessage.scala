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
      case other =>
        throw new InvalidConfigException(s"unknown Singer message type: $other")
    }
  }
}
