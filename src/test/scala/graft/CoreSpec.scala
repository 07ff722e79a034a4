package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

class CoreSpec extends AnyFunSuite {

  // size-parser semantics mirror reference utils/__init__.py:4-22
  test("size parser converts K/M/G case-insensitively") {
    assert(SizeParser.convertSizeToBytes("1K") === 1024L)
    assert(SizeParser.convertSizeToBytes("200m") === 200L * 1024 * 1024)
    assert(SizeParser.convertSizeToBytes("2G") === 2L * 1024 * 1024 * 1024)
  }

  test("size parser matches only the prefix (200MB parses as 200M)") {
    assert(SizeParser.convertSizeToBytes("200MB") === 200L * 1024 * 1024)
  }

  test("size parser rejects unitless and malformed strings") {
    intercept[InvalidConfigException](SizeParser.convertSizeToBytes("123"))
    intercept[InvalidConfigException](SizeParser.convertSizeToBytes("abc"))
  }

  test("config parses extra fields with declared types") {
    val cfg = GraftConfig(hdfsDestinationPath = "/x",
      extraFields = Some("a=1,b=two"),
      extraFieldsTypes = Some("a=integer,b=string"))
    assert(cfg.parsedExtraFields === Seq(("a", "1", "integer"), ("b", "two", "string")))
  }

  test("config rejects extra field without a type") {
    val cfg = GraftConfig(hdfsDestinationPath = "/x", extraFields = Some("a=1"))
    intercept[InvalidConfigException](cfg.parsedExtraFields)
  }

  test("config json parsing + stream maps") {
    val cfg = GraftConfig.fromJson(
      """{"hdfs_destination_path": "/out", "compression_method": "snappy",
         |"partition_cols": "lang,source",
         |"stream_maps": {"t": {"renamed": "col1", "col1": null, "__filter__": "col1 > 1"}}}""".stripMargin)
    assert(cfg.compressionMethod === "snappy")
    assert(cfg.partitionCols === Seq("lang", "source"))
    assert(cfg.streamProperties("t")("renamed") === Some("col1"))
    assert(cfg.streamProperties("t")("col1") === None)
    // property-level "__NULL__" is singer-sdk's alternate removal spelling
    val nullSpelling = GraftConfig.fromJson(
      """{"hdfs_destination_path": "/out",
         |"stream_maps": {"t": {"secret": "__NULL__"}}}""".stripMargin)
    assert(nullSpelling.streamProperties("t")("secret") === None)
  }

  test("--config=ENV builds config from TARGET_HDFS_* variables alone") {
    val cfg = GraftConfig.fromEnv(Map(
      "TARGET_HDFS_HDFS_DESTINATION_PATH" -> "/env-out",
      "TARGET_HDFS_COMPRESSION_METHOD" -> "zstd",
      "TARGET_HDFS_MAX_BATCH_SIZE" -> "500",
      "TARGET_HDFS_PARTITION_COLS" -> "lang,source",
      "TARGET_HDFS_STREAM_MAPS" ->
        """{"t": {"renamed": "col1", "col1": null}}""",
      "UNRELATED_VAR" -> "ignored"))
    assert(cfg.hdfsDestinationPath === "/env-out")
    assert(cfg.compressionMethod === "zstd")
    assert(cfg.maxBatchSize === 500)
    assert(cfg.partitionCols === Seq("lang", "source"))
    assert(cfg.streamProperties("t")("renamed") === Some("col1"))
    assert(cfg.streamProperties("t")("col1") === None)
  }

  test("--config=ENV: terminal environment beats the .env file") {
    val cfg = GraftConfig.fromEnv(
      env = Map("TARGET_HDFS_HDFS_DESTINATION_PATH" -> "/terminal"),
      dotEnv = Map(
        "TARGET_HDFS_HDFS_DESTINATION_PATH" -> "/dotenv",
        "TARGET_HDFS_COMPRESSION_METHOD" -> "snappy"))
    assert(cfg.hdfsDestinationPath === "/terminal") // env wins on conflict
    assert(cfg.compressionMethod === "snappy")      // .env fills the gap
  }

  test("--config=ENV: missing required setting still fails loudly") {
    intercept[InvalidConfigException](
      GraftConfig.fromEnv(Map("TARGET_HDFS_COMPRESSION_METHOD" -> "gzip")))
  }

  test("--config=ENV: malformed JSON-shaped value fails loudly, not as string") {
    // a '{'-shaped value that doesn't parse would otherwise become a
    // TextNode and the whole stream_maps setting would be silently ignored
    val e = intercept[InvalidConfigException](
      GraftConfig.fromEnv(Map(
        "TARGET_HDFS_HDFS_DESTINATION_PATH" -> "/out",
        "TARGET_HDFS_STREAM_MAPS" -> """{"t": {"renamed": "col1"""")))
    assert(e.getMessage.contains("TARGET_HDFS_STREAM_MAPS"))
  }

  test(".env parsing: comments, export prefix, quotes, blank lines") {
    val parsed = GraftConfig.parseDotEnv(
      """# comment line
        |TARGET_HDFS_HDFS_DESTINATION_PATH=/out
        |
        |export TARGET_HDFS_COMPRESSION_METHOD="snappy"
        |TARGET_HDFS_HDFS_BLOCK_SIZE_LIMIT='128M'
        |not a kv line
        |TARGET_HDFS_EXTRA_FIELDS=a=1,b=2
        |""".stripMargin)
    assert(parsed === Map(
      "TARGET_HDFS_HDFS_DESTINATION_PATH" -> "/out",
      "TARGET_HDFS_COMPRESSION_METHOD" -> "snappy",
      "TARGET_HDFS_HDFS_BLOCK_SIZE_LIMIT" -> "128M",
      // value keeps its own '=' signs: split on the FIRST '=' only
      "TARGET_HDFS_EXTRA_FIELDS" -> "a=1,b=2"))
  }

  test("--about exposes the config schema with hdfs properties") {
    val about = GraftConfig.aboutJson
    assert(about.contains("hdfs_destination_path"))
    assert(about.contains("hdfs_block_size_limit"))
    assert(about.contains("skip_existing_files"))
    assert(!about.contains("\"destination_path\"")) // parent key removed
    // must be valid JSON
    SingerMessage.parseJson(about)
  }

  test("singer message parse dispatches all four types") {
    assert(SingerMessage.parse("""{"type":"SCHEMA","stream":"s","schema":{"properties":{}},"key_properties":["a"]}""")
      .asInstanceOf[SchemaMessage].keyProperties === Seq("a"))
    assert(SingerMessage.parse("""{"type":"RECORD","stream":"s","record":{"a":1}}""")
      .asInstanceOf[RecordMessage].recordJson === """{"a":1}""")
    assert(SingerMessage.parse("""{"type":"STATE","value":{"x":2}}""")
      .asInstanceOf[StateMessage].valueJson === """{"x":2}""")
    assert(SingerMessage.parse("""{"type":"ACTIVATE_VERSION","stream":"s","version":7}""")
      .asInstanceOf[ActivateVersionMessage].version === 7L)
  }
}
