package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `grok` processor (reference: docs/modules/components/pages/processors/
  * grok.adoc:26): `%{PATTERN:name}` templates compiled ONCE (driver-side)
  * to a single Java regex, then evaluated per row with codegen'd
  * `regexp_extract` — no per-row pattern interpretation.
  */
object Grok {

  /** Base pattern library (the standard grok core subset). */
  val patterns: Map[String, String] = Map(
    "WORD" -> "\\w+",
    "NOTSPACE" -> "\\S+",
    "DATA" -> ".*?",
    "GREEDYDATA" -> ".*",
    "INT" -> "[+-]?\\d+",
    "NUMBER" -> "[+-]?\\d+(?:\\.\\d+)?",
    "BASE16NUM" -> "[0-9A-Fa-f]+",
    "UUID" -> "[0-9A-Fa-f]{8}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{12}",
    "IP" -> "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}",
    "HOSTNAME" -> "[A-Za-z0-9._-]+",
    "USER" -> "[A-Za-z0-9._-]+",
    "LOGLEVEL" -> "TRACE|DEBUG|INFO|WARN|ERROR|FATAL",
    "TIMESTAMP_ISO8601" ->
      "\\d{4}-\\d{2}-\\d{2}[T ]\\d{2}:\\d{2}:\\d{2}(?:\\.\\d+)?(?:Z|[+-]\\d{2}:?\\d{2})?",
    "HTTPMETHOD" -> "GET|POST|PUT|DELETE|PATCH|HEAD|OPTIONS",
    "URIPATH" -> "/[^ ?]*",
    "QS" -> "\"[^\"]*\"")

  private val ref = java.util.regex.Pattern.compile("%\\{(\\w+)(?::(\\w+))?\\}")

  /** Compile a grok template → (java regex with numbered groups, field
    * names in group order). Unnamed pattern refs match without
    * capturing.
    */
  def compile(template: String): (String, Seq[String]) = {
    val fields = scala.collection.mutable.Buffer.empty[String]
    val sb = new StringBuilder
    val m = ref.matcher(template)
    var last = 0
    while (m.find()) {
      sb.append(java.util.regex.Pattern.quote(template.substring(last, m.start())))
      val pat = patterns.getOrElse(m.group(1),
        throw new IllegalArgumentException(s"unknown grok pattern %{${m.group(1)}}"))
      Option(m.group(2)) match {
        case Some(name) => fields += name; sb.append(s"($pat)")
        case None => sb.append(s"(?:$pat)")
      }
      last = m.end()
    }
    sb.append(java.util.regex.Pattern.quote(template.substring(last)))
    (sb.toString, fields.toSeq)
  }

  /** Parse `input` with the template: one output column per named
    * pattern (empty string when the line doesn't match — use
    * [[matches]] to route failures to the error channel).
    */
  def parse(df: DataFrame, input: Column, template: String): DataFrame = {
    val (regex, fields) = compile(template)
    fields.zipWithIndex.foldLeft(df) { case (acc, (name, i)) =>
      acc.withColumn(name, regexp_extract(input, regex, i + 1))
    }
  }

  def matches(input: Column, template: String): Column =
    input.rlike(compile(template)._1)
}
