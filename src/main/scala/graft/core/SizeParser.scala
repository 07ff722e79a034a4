package graft.core

/** Size-string parsing: `"200M"` -> bytes. K/M/G, case-insensitive; a unit is
  * required (bare `"123"` is rejected). Only the *prefix* of the string is
  * matched, so `"200MB"` parses as 200 MiB.
  * Behavior documented from reference target_hdfs/utils/__init__.py:4-22.
  */
object SizeParser {
  private val Prefix = """^(\d+)([KkMmGg]?)""".r.unanchored

  def convertSizeToBytes(s: String): Long = {
    Prefix.findPrefixMatchOf(s) match {
      case Some(m) =>
        val n = m.group(1).toLong
        val mult = m.group(2).toUpperCase match {
          case "K" => 1024L
          case "M" => 1024L * 1024
          case "G" => 1024L * 1024 * 1024
          case "" =>
            throw new InvalidConfigException(
              s"size string '$s' requires a unit (K/M/G)")
        }
        n * mult
      case None =>
        throw new InvalidConfigException(s"invalid size string: '$s'")
    }
  }
}
