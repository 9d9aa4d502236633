package graft.sinks

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Http

/** QuestDB output (internal/impl/questdb/output.go:513, timestamp.go —
  * contract only, no code ported: the reference wraps the official Go
  * LineSender; this encodes the PUBLIC InfluxDB line protocol the
  * sender speaks and POSTs it over ILP/HTTP `/write`).
  *
  * Field mapping mirrors the reference's config exactly: `table`,
  * `symbols` (ILP tags), `doubles` (force float even when the JSON
  * token is integral), `designated_timestamp_field` +
  * `designated_timestamp_unit` (nanos/micros/millis/seconds/auto with
  * the reference's auto-guess magnitude boundaries),
  * `timestamp_string_fields` + format. Values encode per the public
  * ILP rules: `42i` integers, bare floats, `t`/`f` booleans, quoted
  * strings, backslash escaping for measurement/tag/field-key tokens.
  *
  * Scale shape: lines assemble per partition and POST in `batchSize`
  * chunks through the pluggable [[Http.Client]] — executor-side
  * fan-out, no driver funnel (the reference's LineSenderPool).
  */
object QuestDb {

  /** The reference's auto-unit magnitude guess (timestamp.go:29). */
  def guessUnit(v: Long): String =
    if (v < 10000000000L) "seconds"
    else if (v < 10000000000000L) "millis"
    else if (v < 10000000000000000L) "micros"
    else "nanos"

  def toNanos(v: Long, unit: String): Long = unit match {
    case "nanos" => v
    case "micros" => v * 1000L
    case "millis" => v * 1000000L
    case "seconds" => v * 1000000000L
    case "auto" => toNanos(v, guessUnit(v))
    case other => throw new IllegalArgumentException(
      s"questdb: invalid designated_timestamp_unit '$other'")
  }

  private def escTag(s: String): String =
    s.replace("\\", "\\\\").replace(",", "\\,").replace("=", "\\=")
      .replace(" ", "\\ ")
  private def escMeasurement(s: String): String =
    s.replace("\\", "\\\\").replace(",", "\\,").replace(" ", "\\ ")
  private def escString(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  /** Encode one JSON document as an ILP line (None when the doc has no
    * payload fields — the reference's sender errors on empty rows).
    */
  def encodeLine(doc: JsonNode, table: String, symbols: Set[String],
                 doubles: Set[String], tsField: String, tsUnit: String,
                 tsStringFields: Set[String] = Set.empty,
                 tsStringFormat: String = ""): Option[String] = {
    val sb = new StringBuilder(escMeasurement(table))
    val fields = mutable.ArrayBuffer.empty[String]
    var tsNanos: Option[Long] = None
    doc.properties().forEach { e =>
      val (k, v) = (e.getKey, e.getValue)
      if (k == tsField && tsField.nonEmpty) {
        tsNanos = Some(toNanos(v.asLong, tsUnit))
      } else if (symbols.contains(k)) {
        sb.append(',').append(escTag(k)).append('=')
          .append(escTag(v.asText))
      } else if (tsStringFields.contains(k)) {
        val fmt = java.time.format.DateTimeFormatter.ofPattern(tsStringFormat)
        val inst = java.time.LocalDateTime.parse(v.asText, fmt)
          .toInstant(java.time.ZoneOffset.UTC)
        fields += s"${escTag(k)}=${inst.getEpochSecond * 1000000L +
          inst.getNano / 1000}t"
      } else if (v.isTextual) {
        fields += s"${escTag(k)}=${"\""}${escString(v.asText)}${"\""}"
      } else if (v.isBoolean) {
        fields += s"${escTag(k)}=${if (v.asBoolean) "t" else "f"}"
      } else if (v.isIntegralNumber && !doubles.contains(k)) {
        fields += s"${escTag(k)}=${v.asLong}i"
      } else if (v.isNumber) {
        fields += s"${escTag(k)}=${v.asDouble}"
      } // null / nested: skipped, same as the sender's unsupported types
    }
    if (fields.isEmpty) None
    else {
      sb.append(' ').append(fields.mkString(","))
      tsNanos.foreach(n => sb.append(' ').append(n))
      Some(sb.toString)
    }
  }

  /** JSON-envelope rows (`value` column) → ILP/HTTP POSTs. */
  def write(df: DataFrame, url: String, table: String,
            symbols: Set[String] = Set.empty,
            doubles: Set[String] = Set.empty,
            designatedTimestampField: String = "",
            designatedTimestampUnit: String = "auto",
            timestampStringFields: Set[String] = Set.empty,
            timestampStringFormat: String = "yyyy-MM-dd'T'HH:mm:ss",
            batchSize: Int = 1000,
            client: Http.Client = null): Unit =
    writeSharded(df, Seq(url), table, symbols, doubles,
      designatedTimestampField, designatedTimestampUnit,
      timestampStringFields, timestampStringFormat, batchSize, client)

  /** Sharded form: partitions fan out over `urls` round-robin
    * (partition id mod endpoint count) — the horizontal-scale shape
    * for a clustered ingest tier: each executor-side partition keeps
    * ONE endpoint, no driver funnel, and aggregate throughput divides
    * across shards once a single server's ILP intake saturates (the
    * sf3 ladder's 33 s reading — SCALE_NOTES.md). Row→shard mapping is
    * deterministic per partitioning but carries no semantic key: ILP
    * appends are order-free per QuestDB's dedup/ordering model.
    */
  def writeSharded(df: DataFrame, urls: Seq[String], table: String,
                   symbols: Set[String] = Set.empty,
                   doubles: Set[String] = Set.empty,
                   designatedTimestampField: String = "",
                   designatedTimestampUnit: String = "auto",
                   timestampStringFields: Set[String] = Set.empty,
                   timestampStringFormat: String = "yyyy-MM-dd'T'HH:mm:ss",
                   batchSize: Int = 1000,
                   client: Http.Client = null): Unit = {
    require(urls.nonEmpty, "questdb: at least one url")
    require(Set("nanos", "micros", "millis", "seconds", "auto")(
      designatedTimestampUnit), s"questdb: invalid unit")
    val endpoints = urls.map(_.stripSuffix("/") + "/write").toIndexedSeq
    val fixedClient = Option(client)
    df.select(col("value").cast("string")).rdd.foreachPartition { it =>
      val pid = Option(org.apache.spark.TaskContext.get())
        .map(_.partitionId()).getOrElse(0)
      val endpoint = endpoints(pid % endpoints.size)
      val resolved = fixedClient.getOrElse(
        resolveClient(urls(pid % endpoints.size)))
      val mapper = new ObjectMapper()
      it.grouped(batchSize).foreach { rows =>
        val lines = rows.flatMap { r =>
          encodeLine(mapper.readTree(r.getString(0)), table, symbols,
            doubles, designatedTimestampField, designatedTimestampUnit,
            timestampStringFields, timestampStringFormat)
        }
        if (lines.nonEmpty) {
          val resp = resolved(Seq(Http.Request(endpoint, "POST",
            Map("Content-Type" -> "text/plain; charset=utf-8"),
            lines.mkString("\n")))).head
          if (resp.status < 200 || resp.status > 299)
            throw new IllegalStateException(
              s"questdb write rejected (${resp.status}): ${resp.body.take(200)}")
        }
      }
    }
  }

  // ---- in-memory ILP endpoint (mem://name) ----

  /** Parses ILP lines back into typed rows — an INDEPENDENT decoder
    * (escape handling, `i`/`t`/`f` suffixes, trailing nanos), so the
    * gate verifies the encoder against a second implementation.
    */
  final class MemIlp {
    /** table → rows of (symbols ++ fields, designated ts nanos). */
    val tables: mutable.LinkedHashMap[String,
      mutable.ArrayBuffer[(Map[String, Any], Option[Long])]] =
      mutable.LinkedHashMap.empty

    def handle(q: Http.Request): Http.Response = {
      // decode OUTSIDE the lock: the mem:// client invokes this on the
      // calling executor thread, so concurrent writer partitions parse
      // in parallel and only the per-table append serializes — the
      // same shape as a real server's per-connection decode feeding a
      // shared WAL (this lock was the gate's single-threaded floor)
      try {
        val parsed = q.body.split('\n').filter(_.nonEmpty).map { line =>
          val (table, rest) = splitUnescaped(line, startAt = 0)
          val (tagsPart, afterTags) =
            if (rest.startsWith(",")) splitSection(rest.drop(1))
            else ("", rest)
          val (fieldsPart, tsPart) = splitTail(afterTags.trim)
          val values = mutable.LinkedHashMap.empty[String, Any]
          if (tagsPart.nonEmpty) splitEscaped(tagsPart, ',').foreach { kv =>
            val Array(k, v) = splitKv(kv)
            values(unescape(k)) = unescape(v)
          }
          splitEscaped(fieldsPart, ',').foreach { kv =>
            val Array(k, v) = splitKv(kv)
            values(unescape(k)) = parseFieldValue(v)
          }
          (unescape(table), (values.toMap, tsPart.map(_.toLong)))
        }
        synchronized {
          parsed.foreach { case (table, row) =>
            tables.getOrElseUpdate(table, mutable.ArrayBuffer.empty)
              .append(row)
          }
        }
        Http.Response(204, "")
      } catch {
        case e: Exception => Http.Response(400,
          s"""{"error":"${Option(e.getMessage).getOrElse("parse")}"}""")
      }
    }

    def rows(table: String): Seq[(Map[String, Any], Option[Long])] =
      synchronized { tables.getOrElse(table, mutable.ArrayBuffer.empty).toSeq }

    def rowCount(table: String): Int =
      synchronized { tables.get(table).map(_.size).getOrElse(0) }

    /** Copy only [from, until) of a table's rows — lets gate readers
      * fan the re-materialization over many tasks instead of one
      * driver-side flatMap of the whole table.
      */
    def rowsSlice(table: String, from: Int,
                  until: Int): Seq[(Map[String, Any], Option[Long])] =
      synchronized {
        tables.get(table) match {
          case Some(b) => b.slice(from, until).toSeq
          case None => Seq.empty
        }
      }

    // measurement ends at the first unescaped ',' or ' '
    private def splitUnescaped(s: String, startAt: Int): (String, String) = {
      var i = startAt
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\') i += 2
        else if (c == ',' || c == ' ') return (s.substring(0, i), s.substring(i))
        else i += 1
      }
      (s, "")
    }

    // tag section ends at the first unescaped ' '
    private def splitSection(s: String): (String, String) = {
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\') i += 2
        else if (c == ' ') return (s.substring(0, i), s.substring(i))
        else i += 1
      }
      (s, "")
    }

    // fields [+ optional trailing timestamp] — the split must respect
    // quoted strings
    private def splitTail(s: String): (String, Option[String]) = {
      var i = 0
      var inQuote = false
      var lastSpace = -1
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\') i += 1
        else if (c == '"') inQuote = !inQuote
        else if (c == ' ' && !inQuote) lastSpace = i
        i += 1
      }
      if (lastSpace < 0) (s, None)
      else {
        val tail = s.substring(lastSpace + 1)
        if (tail.nonEmpty && tail.forall(c => c.isDigit || c == '-'))
          (s.substring(0, lastSpace), Some(tail))
        else (s, None)
      }
    }

    private def splitEscaped(s: String, sep: Char): Seq[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      val sb = new StringBuilder
      var i = 0
      var inQuote = false
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) { sb.append(c).append(s.charAt(i + 1)); i += 2 }
        else {
          if (c == '"') inQuote = !inQuote
          if (c == sep && !inQuote) { out += sb.toString; sb.clear() }
          else sb.append(c)
          i += 1
        }
      }
      if (sb.nonEmpty) out += sb.toString
      out.toSeq
    }

    private def splitKv(kv: String): Array[String] = {
      var i = 0
      while (i < kv.length) {
        val c = kv.charAt(i)
        if (c == '\\') i += 2
        else if (c == '=') return Array(kv.substring(0, i), kv.substring(i + 1))
        else i += 1
      }
      throw new IllegalArgumentException(s"ILP: no '=' in '$kv'")
    }

    private def unescape(s: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) { sb.append(s.charAt(i + 1)); i += 2 }
        else { sb.append(c); i += 1 }
      }
      sb.toString
    }

    private def parseFieldValue(v: String): Any =
      if (v.startsWith("\"") && v.endsWith("\"") && v.length >= 2)
        unescape(v.substring(1, v.length - 1))
      else if (v == "t" || v == "true") true
      else if (v == "f" || v == "false") false
      else if (v.endsWith("i")) v.dropRight(1).toLong
      else if (v.endsWith("t")) v.dropRight(1).toLong // micros timestamp
      else v.toDouble
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MemIlp]()

  def named(name: String): MemIlp =
    registry.computeIfAbsent(name, _ => new MemIlp)
  def drop(name: String): Unit = registry.remove(name)

  def memClient(name: String): Http.Client =
    reqs => reqs.map(named(name).handle)

  def resolveClient(url: String): Http.Client =
    if (url.startsWith("mem://"))
      memClient(url.stripPrefix("mem://").takeWhile(_ != '/'))
    else Http.clientFor(url)
}
