package graft.fs

/** Human-size formatting/parsing (reference H3/H4:
  * /root/reference/file_indexer/utils.py:6-19 `format_size` and
  * /root/reference/file_indexer/cli.py:11-42 `parse_size`).
  * Presentation/config helpers, not query operators — plain Scala. */
object SizeUtils {

  private val units = Seq("B", "KB", "MB", "GB", "TB")

  /** 1024-step, one-decimal formatting; caps at TB like the reference
    * (utils.py:11 has no PB unit — 2048 TB renders as "2048.0 TB"). */
  def formatSize(sizeBytes: Long): String = {
    if (sizeBytes == 0L) return "0 B"
    var size = sizeBytes.toDouble
    var i = 0
    while (size >= 1024 && i < units.length - 1) { size /= 1024; i += 1 }
    f"$size%.1f ${units(i)}"
  }

  private val multipliers: Map[String, Long] = Map(
    "B" -> 1L, "K" -> 1024L, "KB" -> 1024L,
    "M" -> 1024L * 1024, "MB" -> 1024L * 1024,
    "G" -> 1024L * 1024 * 1024, "GB" -> 1024L * 1024 * 1024,
    "T" -> 1024L * 1024 * 1024 * 1024, "TB" -> 1024L * 1024 * 1024 * 1024)

  private val pattern = """^(\d+(?:\.\d+)?)\s*([A-Z]*)?$""".r

  /** "100MB" → bytes; empty string → 0; invalid → IllegalArgumentException
    * (mirrors the reference's ValueError, cli.py:33,40). */
  def parseSize(sizeStr: String): Long = {
    if (sizeStr == null || sizeStr.isEmpty) return 0L
    val s = sizeStr.toUpperCase
    s match {
      case pattern(num, unit) =>
        val u = Option(unit).filter(_.nonEmpty).getOrElse("B")
        val mult = multipliers.getOrElse(u,
          throw new IllegalArgumentException(s"Unknown size unit: $u"))
        (num.toDouble * mult).toLong
      case _ => throw new IllegalArgumentException(s"Invalid size format: $sizeStr")
    }
  }
}
