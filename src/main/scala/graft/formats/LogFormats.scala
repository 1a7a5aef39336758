package graft.formats

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.bridge

import graft.functions.RegexGroupsExpr

/** Log-line decoders for the reference's clf / grok / syslog wire formats
  * (SURVEY.md §2.2 F7–F9; admissible formats listed in reference
  * `widgets/MapRStream-streamingsource.json:48-58`).
  *
  * All three decode through ONE `RegexGroupsExpr` per line — a single
  * regex execution per record shared by every extracted column via
  * whole-stage codegen's subexpression elimination (N separate
  * `regexp_extract(line, re, i)` trees would each re-run the regex). The
  * reference instead instantiated a reflective CDAP `RecordFormat` per
  * executor (`MapRStreamingSource.java:174-181`).
  */
object LogFormats {

  /** Apache Combined Log Format:
    * host ident authuser [ts] "request" status bytes "referer" "agent". */
  val ClfRegex: String =
    "^(\\S+) (\\S+) (\\S+) \\[([^\\]]+)\\] \"([^\"]*)\" (\\d{3}) (\\S+)" +
      "(?: \"([^\"]*)\" \"([^\"]*)\")?\\s*$"

  val ClfFields: Seq[(String, Int)] = Seq(
    "host" -> 1, "ident" -> 2, "authuser" -> 3, "ts" -> 4, "request" -> 5,
    "status" -> 6, "bytes" -> 7, "referer" -> 8, "agent" -> 9)

  private def groups(line: Column, regex: String, n: Int): Column =
    bridge.column(RegexGroupsExpr(bridge.expression(line), regex, n))

  /** Decode a CLF line into one column per field (status/bytes as strings;
    * callers cast). */
  def clf(line: Column): Seq[Column] = {
    val g = groups(line, ClfRegex, 9)
    ClfFields.map { case (n, i) => g.getItem(i - 1).as(n) }
  }

  /** RFC-3164 syslog: <pri>MMM dd HH:mm:ss host tag[pid]: msg. */
  val SyslogRegex: String =
    "^<(\\d+)>(\\w{3}\\s+\\d+ \\d{2}:\\d{2}:\\d{2}) (\\S+) " +
      "([^:\\[\\s]+)(?:\\[(\\d+)\\])?: (.*)$"

  def syslog(line: Column): Seq[Column] = {
    val g = groups(line, SyslogRegex, 6)
    Seq(
      (g.getItem(0).cast("int") / 8).cast("int").as("facility"),
      (g.getItem(0).cast("int") % 8).as("severity"),
      g.getItem(1).as("log_ts"),
      g.getItem(2).as("host"),
      g.getItem(3).as("tag"),
      g.getItem(4).as("pid"),
      g.getItem(5).as("msg"))
  }

  /** Minimal grok pattern library (the common subset; extend as needed).
    * Sub-patterns are non-capturing so group indices = order of `%{..}`. */
  val GrokPatterns: Map[String, String] = Map(
    "WORD" -> "\\w+",
    "NOTSPACE" -> "\\S+",
    "DATA" -> ".*?",
    "GREEDYDATA" -> ".*",
    "INT" -> "[+-]?\\d+",
    "NUMBER" -> "[+-]?(?:\\d+(?:\\.\\d+)?)",
    "IP" -> "(?:\\d{1,3}\\.){3}\\d{1,3}",
    "HOSTNAME" -> "(?:[A-Za-z0-9][A-Za-z0-9-]*)(?:\\.(?:[A-Za-z0-9][A-Za-z0-9-]*))*",
    "USER" -> "[A-Za-z0-9._-]+",
    "LOGLEVEL" -> "(?:TRACE|DEBUG|INFO|WARN|ERROR|FATAL)",
    "TIMESTAMP_ISO8601" ->
      "\\d{4}-\\d{2}-\\d{2}[T ]\\d{2}:\\d{2}:\\d{2}(?:\\.\\d+)?(?:Z|[+-]\\d{2}:?\\d{2})?")

  private val GrokRef = "%\\{(\\w+)(?::(\\w+))?\\}".r

  /** Compile a grok expression like `%{IP:client} %{WORD:method}` to
    * (java regex, ordered field names). Unnamed refs are matched but not
    * extracted. */
  def compileGrok(pattern: String): (String, Seq[String]) = {
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var last = 0
    for (m <- GrokRef.findAllMatchIn(pattern)) {
      sb.append(java.util.regex.Pattern.quote(pattern.substring(last, m.start)))
      val pat = GrokPatterns.getOrElse(
        m.group(1),
        throw new IllegalArgumentException(s"unknown grok pattern %{${m.group(1)}}"))
      if (m.group(2) != null) { names += m.group(2); sb.append(s"($pat)") }
      else sb.append(s"(?:$pat)")
      last = m.end
    }
    sb.append(java.util.regex.Pattern.quote(pattern.substring(last)))
    (sb.toString, names.toSeq)
  }

  /** Decode a line with a grok pattern: (name, column) per named capture —
    * pattern compiled ONCE (callers previously compiled again just for the
    * names). */
  def grokNamed(line: Column, pattern: String): Seq[(String, Column)] = {
    val (regex, names) = compileGrok(pattern)
    val g = groups(line, regex, names.length)
    names.zipWithIndex.map { case (n, i) => n -> g.getItem(i).as(n) }
  }
}
